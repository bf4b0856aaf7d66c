"""Flink 1.10 SQL DDL surface: CREATE TABLE ... WITH (connector
properties), DROP TABLE, and INSERT INTO, accepted verbatim and executed
on Spark.

Reference surface:

- ``flink-sql-parser/src/main/java/org/apache/flink/sql/parser/ddl/SqlCreateTable.java``
  — column list, computed columns, ``WATERMARK FOR ts AS ts - INTERVAL``
  (new in 1.10), and the WITH-properties clause;
- ``flink-table/flink-table-api-java/src/main/java/org/apache/flink/table/api/internal/TableEnvironmentImpl.java:483``
  (``sqlUpdate`` dispatching CREATE/DROP/INSERT);
- connector property keys from
  ``flink-table/flink-table-common/src/main/java/org/apache/flink/table/descriptors/ConnectorDescriptorValidator.java``
  (``connector.type``, ``connector.path``) and
  ``FormatDescriptorValidator.java`` (``format.type``).

Execution model (Spark-first): a filesystem table becomes a DataFrame
reader with an EXPLICIT schema (never inference — inference would scan
100 TB before planning) registered as a temp view; reads stay lazy, so
Catalyst pushdown/pruning apply to the underlying files exactly as for
any other scan.  ``INSERT INTO`` plans the SELECT on Spark and
append-writes through the table's format to its path.  The WATERMARK
clause is recorded per table and applied via ``withWatermark`` when the
table is opened as a stream (``as_stream``) — matching the reference,
where the same DDL table serves batch and streaming jobs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# Flink DDL type -> Spark SQL type (SqlCreateTable column list types,
# LogicalTypeParser.java names)
_TYPE_MAP = {
    "STRING": "string", "VARCHAR": "string", "CHAR": "string",
    "BOOLEAN": "boolean", "TINYINT": "tinyint", "SMALLINT": "smallint",
    "INT": "int", "INTEGER": "int", "BIGINT": "bigint",
    "FLOAT": "float", "DOUBLE": "double", "DATE": "date",
    "BYTES": "binary", "VARBINARY": "binary",
}


def _map_type(flink_type: str) -> str:
    t = flink_type.strip().upper()
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    m = re.match(r"DECIMAL\s*\((\d+)\s*,\s*(\d+)\)", t)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    m = re.match(r"(VARCHAR|CHAR)\s*\(\d+\)", t)
    if m:
        return "string"
    m = re.match(r"ARRAY\s*<(.+)>$", t)
    if m:
        return f"array<{_map_type(m.group(1))}>"
    if t in _TYPE_MAP:
        return _TYPE_MAP[t]
    raise ValueError(f"unsupported Flink DDL type: {flink_type!r}")


@dataclass
class DdlTable:
    name: str
    schema: str                      # Spark DDL schema string
    path: str
    fmt: str                         # csv | json | parquet | orc
    options: dict[str, str] = field(default_factory=dict)
    watermark_col: str | None = None
    watermark_delay: str | None = None  # Spark interval string, e.g. "5 seconds"


_CREATE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*\((?P<cols>.*)\)\s*"
    r"WITH\s*\((?P<props>.*)\)\s*$",
    re.IGNORECASE | re.DOTALL)
_DROP_RE = re.compile(
    r"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?([\w.]+)\s*$", re.IGNORECASE)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+(INTO|OVERWRITE)\s+([\w.]+)\s+(?P<select>SELECT\s+.*)$",
    re.IGNORECASE | re.DOTALL)
_CREATE_VIEW_RE = re.compile(
    r"^\s*CREATE\s+(?:TEMPORARY\s+)?VIEW\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)"
    r"\s+AS\s+(?P<query>SELECT\s+.*)$", re.IGNORECASE | re.DOTALL)
_DROP_VIEW_RE = re.compile(
    r"^\s*DROP\s+(?:TEMPORARY\s+)?VIEW\s+(?:IF\s+EXISTS\s+)?([\w.]+)\s*$",
    re.IGNORECASE)
_WATERMARK_RE = re.compile(
    r"WATERMARK\s+FOR\s+(\w+)\s+AS\s+\1\s*-\s*INTERVAL\s+'([\d.]+)'\s+(\w+)",
    re.IGNORECASE)
_PROP_RE = re.compile(r"'([^']+)'\s*=\s*'([^']*)'")

#: interval unit in the WATERMARK clause -> Spark withWatermark unit
_UNITS = {"SECOND": "seconds", "MINUTE": "minutes", "HOUR": "hours",
          "DAY": "days"}


def _split_top_level(s: str) -> list[str]:
    """Split a column list on commas not nested in (), <>, or quotes."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def parse_create_table(stmt: str) -> DdlTable:
    m = _CREATE_RE.match(stmt.strip().rstrip(";"))
    if not m:
        raise ValueError(f"not a CREATE TABLE ... WITH (...) statement: {stmt[:80]!r}")
    name = m.group(1)
    cols_src = m.group("cols")
    props = dict(_PROP_RE.findall(m.group("props")))

    wm_col = wm_delay = None
    fields = []
    for item in _split_top_level(cols_src):
        wm = _WATERMARK_RE.match(item)
        if wm:
            unit = wm.group(3).upper()
            if unit not in _UNITS:
                raise ValueError(f"unsupported watermark interval unit {unit}")
            wm_col = wm.group(1)
            wm_delay = f"{wm.group(2)} {_UNITS[unit]}"
            continue
        if re.match(r"(PRIMARY\s+KEY|UNIQUE|CONSTRAINT)\b", item, re.IGNORECASE):
            continue  # informational in the reference; Spark has no enforcement
        cm = re.match(r"(\w+)\s+(.+)$", item)
        if not cm:
            raise ValueError(f"cannot parse column definition {item!r}")
        fields.append(f"{cm.group(1)} {_map_type(cm.group(2))}")

    ctype = props.get("connector.type", props.get("connector", ""))
    if ctype.lower() != "filesystem":
        raise NotImplementedError(
            f"connector.type={ctype!r}: only 'filesystem' is supported here "
            "(kafka lives in sources/kafka.py)")
    path = props.get("connector.path", props.get("path"))
    if not path:
        raise ValueError("filesystem table needs 'connector.path'")
    fmt = props.get("format.type", props.get("format", "csv")).lower()
    if fmt not in ("csv", "json", "parquet", "orc"):
        raise NotImplementedError(f"format.type={fmt!r}")

    options = {}
    if fmt == "csv":
        # CsvValidator.java property names
        options["delimiter"] = props.get("format.field-delimiter", ",")
        options["header"] = props.get("format.write-header", "true")
    return DdlTable(name=name, schema=", ".join(fields), path=path, fmt=fmt,
                    options=options, watermark_col=wm_col,
                    watermark_delay=wm_delay)


class DdlCatalog:
    """Executes Flink-1.10-style DDL/DML against a SparkSession.

    Tables are registered as lazy temp views over their files; the
    catalog keeps the (path, format, watermark) metadata the view alone
    cannot carry, so INSERT INTO and streaming reads work later.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.tables: dict[str, DdlTable] = {}

    # -- statement dispatch (TableEnvironmentImpl.sqlUpdate:483) --------
    def execute(self, stmt: str) -> DataFrame | None:
        s = stmt.strip().rstrip(";")
        if _CREATE_RE.match(s):
            self._create(parse_create_table(s))
            return None
        vm = _CREATE_VIEW_RE.match(s)
        if vm:
            # Flink views are session-scoped catalog objects
            # (TableEnvironmentImpl view operations); temp views match
            self.spark.sql(vm.group("query")).createOrReplaceTempView(vm.group(1))
            return None
        dv = _DROP_VIEW_RE.match(s)
        if dv:
            self.spark.catalog.dropTempView(dv.group(1))
            return None
        dm = _DROP_RE.match(s)
        if dm:
            self._drop(dm.group(1))
            return None
        im = _INSERT_RE.match(s)
        if im:
            self._insert(im.group(2), im.group("select"),
                         overwrite=im.group(1).upper() == "OVERWRITE")
            return None
        return self.spark.sql(s)

    # -- operations ------------------------------------------------------
    def _reader(self, t: DdlTable):
        r = self.spark.read.schema(t.schema)
        if t.fmt == "csv":
            r = r.option("header", t.options.get("header", "true")) \
                 .option("delimiter", t.options.get("delimiter", ","))
        return r

    def _create(self, t: DdlTable) -> None:
        # the reference allows CREATE TABLE for a sink whose directory
        # does not exist yet; with an explicit schema an empty directory
        # reads as an empty table, so just materialize the directory
        import os
        if "://" not in t.path:
            os.makedirs(t.path, exist_ok=True)
        df = self._reader(t).format(t.fmt).load(t.path)
        df.createOrReplaceTempView(t.name)
        self.tables[t.name] = t

    def _drop(self, name: str) -> None:
        self.spark.catalog.dropTempView(name)
        self.tables.pop(name, None)

    def _insert(self, name: str, select: str, overwrite: bool = False) -> None:
        t = self.tables.get(name)
        if t is None:
            raise ValueError(f"unknown DDL table {name}; CREATE TABLE it first")
        out = self.spark.sql(select)
        w = out.write.mode("overwrite" if overwrite else "append")
        if t.fmt == "csv":
            w = w.option("header", t.options.get("header", "true")) \
                 .option("delimiter", t.options.get("delimiter", ","))
        w.format(t.fmt).save(t.path)
        # refresh the lazy view so subsequent reads see the new files
        self._create(t)

    def as_stream(self, name: str) -> DataFrame:
        """Open a DDL table as a stream, applying its WATERMARK clause —
        the 1.10 ``WATERMARK FOR`` DDL feeding event-time operators."""
        t = self.tables[name]
        df = (self.spark.readStream.schema(t.schema)
              .format(t.fmt).load(t.path))
        if t.watermark_col:
            df = df.withWatermark(t.watermark_col, t.watermark_delay)
        return df
