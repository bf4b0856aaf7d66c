"""Flink 1.10 temporal-join SQL surface: ``FOR SYSTEM_TIME AS OF`` lookup
joins and ``LATERAL TABLE (fn(t.rowtime))`` temporal table functions.

Reference surface:

- ``docs/dev/table/streaming/joins.md:299-342`` — the ``JOIN dim FOR
  SYSTEM_TIME AS OF t.proctime`` form: INNER and LEFT only, and the time
  attribute MUST be the left table's processing time ("Currently, only
  support INNER JOIN and LEFT JOIN. ... `proctime` is a processing time
  attribute of `table1`.");
- ``flink-table/flink-table-planner-blink/src/main/scala/org/apache/flink/
  table/planner/plan/rules/physical/common/CommonLookupJoinRule.scala:52-70``
  — the planner rule enforcing both constraints (LookupableTableSource +
  proctime-only) with loud TableExceptions, mirrored here as loud
  ``NotImplementedError``s;
- ``docs/dev/table/streaming/joins.md:109-186`` — the temporal table
  FUNCTION form ``orders o, LATERAL TABLE (Rates(o.rowtime)) r WHERE
  o.currency = r.currency``: event-time versions join each probe row with
  the latest version at-or-before the probe's rowtime (inner semantics),
  the proctime variant joins the current version;
- ``flink-table/flink-table-planner-blink/src/main/scala/org/apache/flink/
  table/planner/plan/rules/logical/
  LogicalCorrelateToJoinFromTemporalTableRule.scala`` — the reference
  rewrites the lateral correlate into a temporal join; this module performs
  the equivalent rewrite onto Spark primitives;
- ``flink-table/flink-table-api-java/src/main/java/org/apache/flink/table/
  functions/TemporalTableFunction.java`` — a temporal table function is
  (history table, time attribute, primary key), mirrored by
  :class:`TemporalTableFunction`.

Execution model (Spark-first):

- The lookup form reduces the versioned dimension to its CURRENT snapshot
  (latest version per primary key — the docs' ``LatestRates`` view) and
  rewrites the query to a plain equi-join against that snapshot view with a
  ``/*+ BROADCAST */`` hint: a lookup dimension is small by contract, so at
  100 TB the probe side never shuffles — identical to the reference's
  per-probe point lookups in aggregate effect, but expressed as one
  broadcast hash join Catalyst can see through (pushdown/pruning still
  apply to the probe scan).
- The lateral event-time form plans the existing union-and-carry-forward
  as-of join (:func:`operators.joins.asof_join` — one shuffle + one sort,
  no probe×versions explosion on hot keys), then evaluates the SELECT list
  over the joined view with alias-qualified references rewritten.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_release_1_10_0_spark.operators.joins import asof_join


@dataclass(frozen=True)
class LookupSource:
    """A versioned dimension usable as the build side of ``FOR
    SYSTEM_TIME AS OF`` (LookupableTableSource analog).

    ``version_cols`` orders versions per ``primary_key``; the snapshot
    keeps the row with the greatest (version_cols) tuple per key.  With no
    version_cols the frame is already a current snapshot and must be
    unique per key.
    """

    df: DataFrame
    primary_key: str
    version_cols: tuple[str, ...] = ()


@dataclass(frozen=True)
class TemporalTableFunction:
    """``Table.createTemporalTableFunction(timeAttribute, primaryKey)``
    analog (TemporalTableFunction.java): a history table plus the version
    time attribute and the primary key."""

    versions: DataFrame
    time_attr: str
    primary_key: str


_SYSTEM_TIME_RE = re.compile(
    r"(?P<jt>\b(?:LEFT|RIGHT|FULL)\s+(?:OUTER\s+)?)?\bJOIN\s+(?P<tbl>\w+)\s+"
    r"FOR\s+SYSTEM_TIME\s+AS\s+OF\s+(?P<la>\w+)\.(?P<col>\w+)"
    r"(?:\s+AS\s+(?P<ra>\w+))?",
    re.IGNORECASE)

_LATERAL_RE = re.compile(
    r",\s*LATERAL\s+TABLE\s*\(\s*(?P<fn>\w+)\s*\(\s*"
    r"(?P<la>\w+)\.(?P<tcol>\w+)\s*\)\s*\)\s*(?:AS\s+)?(?P<ra>\w+)",
    re.IGNORECASE)

_FROM_RE = re.compile(
    r"\bFROM\s+(?P<tbl>\w+)\s+(?:AS\s+)?(?P<la>\w+)\b", re.IGNORECASE)

_SQL_KEYWORDS = frozenset(
    "JOIN LEFT RIGHT FULL INNER CROSS OUTER WHERE GROUP ORDER HAVING "
    "LATERAL ON LIMIT UNION".split())


def parse_from_clause(sql: str) -> tuple[str, str] | None:
    """(table, alias) of the single FROM table; alias falls back to the
    table name when the next token is a keyword rather than an alias."""
    m = _FROM_RE.search(sql)
    if m is None:
        fm = re.search(r"\bFROM\s+(?P<tbl>\w+)", sql, re.IGNORECASE)
        return (fm.group("tbl"), fm.group("tbl")) if fm else None
    tbl, la = m.group("tbl"), m.group("la")
    if la.upper() in _SQL_KEYWORDS:
        return tbl, tbl
    return tbl, la


def _snapshot(src: LookupSource) -> DataFrame:
    """Latest version per primary key — the docs' ``LatestRates`` view."""
    if not src.version_cols:
        return src.df
    w = Window.partitionBy(src.primary_key).orderBy(
        *[F.col(c).desc() for c in src.version_cols])
    return (src.df.withColumn("__v_rn", F.row_number().over(w))
            .filter(F.col("__v_rn") == 1).drop("__v_rn"))


def execute_system_time_join_sql(
        spark: SparkSession, sql: str, tables: dict[str, DataFrame],
        lookup_sources: dict[str, LookupSource],
        proctime_attrs: dict[str, str] | None = None) -> DataFrame:
    """Run a ``JOIN dim FOR SYSTEM_TIME AS OF t.proctime`` query.

    ``proctime_attrs`` maps left-table alias (or name) -> its processing
    time attribute; referencing any other column in AS OF refuses exactly
    like CommonLookupJoinRule.scala:60.
    """
    m = _SYSTEM_TIME_RE.search(sql)
    if m is None:
        raise ValueError("no FOR SYSTEM_TIME AS OF clause found")
    jt = (m.group("jt") or "").strip().upper()
    if jt.startswith(("RIGHT", "FULL")):
        # joins.md:330 — "Currently, only support INNER JOIN and LEFT JOIN."
        raise NotImplementedError(
            "FOR SYSTEM_TIME AS OF supports INNER and LEFT JOIN only "
            "(reference docs/dev/table/streaming/joins.md:330); got "
            f"{jt} JOIN")
    la, col = m.group("la"), m.group("col")
    pt = (proctime_attrs or {}).get(la)
    if pt is None or pt.lower() != col.lower():
        # CommonLookupJoinRule.scala:60 — proctime-only temporal table join
        raise NotImplementedError(
            "Temporal table join currently only supports 'FOR SYSTEM_TIME "
            f"AS OF' left table's proctime field; {la}.{col} is not the "
            "declared proctime attribute "
            "(reference CommonLookupJoinRule.scala:60); event-time "
            "versions join via LATERAL TABLE "
            "(execute_temporal_function_sql)")
    tbl = m.group("tbl")
    if tbl not in lookup_sources:
        # CommonLookupJoinRule.scala:52 — build side must be lookupable
        raise NotImplementedError(
            f"Temporal table join only supports a LookupableTableSource "
            f"build side; {tbl!r} is not registered as a LookupSource "
            "(reference CommonLookupJoinRule.scala:52)")
    ra = m.group("ra") or tbl

    snap_view = f"__syst_snapshot_{tbl}"
    _snapshot(lookup_sources[tbl]).createOrReplaceTempView(snap_view)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)

    join_kw = "LEFT JOIN" if jt.startswith("LEFT") else "JOIN"
    rewritten = sql[:m.start()] + f"{join_kw} {snap_view} AS {ra}" + sql[m.end():]
    # lookup dims are small by contract -> broadcast the snapshot so the
    # probe side never shuffles (the reference performs per-probe point
    # lookups; one broadcast hash join is the batch-equivalent plan)
    rewritten = re.sub(r"^(\s*SELECT\b)", rf"\1 /*+ BROADCAST({ra}) */ ",
                       rewritten, count=1, flags=re.IGNORECASE)
    return spark.sql(rewritten)


def _split_top_level_and(expr: str) -> list[str]:
    parts, depth, cur = [], 0, []
    tokens = re.split(r"(\(|\)|\bAND\b)", expr, flags=re.IGNORECASE)
    for tok in tokens:
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0 and tok.strip().upper() == "AND":
            parts.append("".join(cur).strip())
            cur = []
            continue
        cur.append(tok)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def execute_temporal_function_sql(
        spark: SparkSession, sql: str, tables: dict[str, DataFrame],
        temporal_functions: dict[str, TemporalTableFunction],
        proctime_attrs: dict[str, str] | None = None) -> DataFrame:
    """Run a ``FROM t a, LATERAL TABLE (fn(a.time)) r WHERE a.k = r.pk``
    temporal table function join (joins.md:109-186).

    Event-time attribute -> as-of version join (inner: probe rows with no
    preceding version are dropped, joins.md:146).  Proctime attribute ->
    join against the current (latest) version per key.
    """
    lm = _LATERAL_RE.search(sql)
    if lm is None:
        raise ValueError("no LATERAL TABLE clause found")
    parsed = parse_from_clause(sql)
    if parsed is None:
        raise ValueError("could not parse FROM <table> <alias>")
    from_tbl, from_alias = parsed
    fn, la, tcol, ra = lm.group("fn"), lm.group("la"), lm.group("tcol"), lm.group("ra")
    if from_alias != la:
        raise NotImplementedError(
            "LATERAL TABLE time argument must reference the single FROM "
            f"table's alias; got {la}.{tcol} with FROM alias "
            f"{from_alias} (multi-way temporal correlates are not "
            "planned — reference rewrites exactly one correlate per join, "
            "LogicalCorrelateToJoinFromTemporalTableRule.scala)")
    if fn not in temporal_functions:
        raise ValueError(f"unknown temporal table function {fn!r}")
    ttf = temporal_functions[fn]
    left = tables[from_tbl]

    wm = re.search(r"\bWHERE\b(?P<w>.*)$", sql, re.IGNORECASE | re.DOTALL)
    if wm is None:
        raise NotImplementedError(
            "temporal table function join requires the primary-key "
            "equality in WHERE (joins.md:139-146: 'o.currency = "
            "r.currency'); query has no WHERE clause")
    conjuncts = _split_top_level_and(wm.group("w"))
    key_eq = re.compile(
        rf"^\s*(?:{la}\.(?P<lk1>\w+)\s*=\s*{ra}\.(?P<rk1>\w+)"
        rf"|{ra}\.(?P<rk2>\w+)\s*=\s*{la}\.(?P<lk2>\w+))\s*$",
        re.IGNORECASE)
    left_key = None
    residual = []
    for c in conjuncts:
        km = key_eq.match(c)
        if km and left_key is None:
            lk = km.group("lk1") or km.group("lk2")
            rk = km.group("rk1") or km.group("rk2")
            if rk.lower() != ttf.primary_key.lower():
                raise NotImplementedError(
                    f"temporal table function join key must be the "
                    f"function's primary key {ttf.primary_key!r}; got "
                    f"{ra}.{rk} (TemporalTableFunction.java contract)")
            left_key = lk
        else:
            residual.append(c.strip())
    if left_key is None:
        raise NotImplementedError(
            "temporal table function join requires exactly the primary-key "
            f"equality {la}.<key> = {ra}.{ttf.primary_key} in WHERE "
            "(joins.md:139-146)")

    # version columns surface as <ra>__<col>; reduce duplicate (key, time)
    # versions deterministically before the as-of (the reference keeps one
    # version per (key, version time) in its versioned state as well)
    vcols = [c for c in ttf.versions.columns
             if c not in (ttf.primary_key, ttf.time_attr)]
    build = ttf.versions.select(
        ttf.primary_key, ttf.time_attr,
        *[F.col(c).alias(f"{ra}__{c}") for c in vcols])

    pt = (proctime_attrs or {}).get(la)
    if pt is not None and pt.lower() == tcol.lower():
        # proctime variant (joins.md:171): join the CURRENT version
        snap = _snapshot(LookupSource(
            build, ttf.primary_key, (ttf.time_attr,)))
        joined = left.join(
            F.broadcast(snap.withColumnRenamed(ttf.primary_key, left_key)
                        .withColumnRenamed(ttf.time_attr, f"{ra}__{ttf.time_attr}")),
            on=left_key, how="inner")
    else:
        # inner semantics (joins.md:146): carry the matched version time so
        # probe rows with no preceding version can be dropped
        build_t = build.withColumn(f"{ra}__{ttf.time_attr}",
                                   F.col(ttf.time_attr))
        joined = asof_join(
            left, build_t, keys=[(left_key, ttf.primary_key)],
            probe_ts=tcol, build_ts=ttf.time_attr,
            build_cols=[f"{ra}__{c}" for c in vcols]
            + [f"{ra}__{ttf.time_attr}"])
        joined = joined.filter(F.col(f"{ra}__{ttf.time_attr}").isNotNull())

    view = f"__temporal_join_{fn}"
    joined.createOrReplaceTempView(view)

    def _rewrite(frag: str) -> str:
        frag = re.sub(rf"\b{ra}\.(\w+)", rf"{ra}__\1", frag)
        return re.sub(rf"\b{la}\.(\w+)", r"\1", frag)

    select_part = sql[:re.search(r"\bFROM\b", sql, re.IGNORECASE).start()]
    new_sql = _rewrite(select_part) + f"FROM {view}"
    if residual:
        new_sql += " WHERE " + " AND ".join(_rewrite(c) for c in residual)
    gm = re.search(r"\b(GROUP\s+BY|ORDER\s+BY|HAVING)\b.*$", sql,
                   re.IGNORECASE | re.DOTALL)
    if gm and wm and gm.start() > wm.start():
        # trailing clauses after WHERE were captured into conjuncts text;
        # keep the surface narrow and loud instead of mis-planning
        raise NotImplementedError(
            "GROUP BY / ORDER BY / HAVING after the temporal WHERE are not "
            "parsed by this front end; aggregate over the returned "
            "DataFrame instead")
    return spark.sql(new_sql)
