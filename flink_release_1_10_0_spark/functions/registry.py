"""Flink SQL function compatibility layer.

The reference's complete scalar-function surface is
``flink-table-planner-blink/.../functions/sql/FlinkSqlOperatorTable.java``
(1003 LoC) with runtime impls in ``runtime/functions/SqlFunctionUtils.java``
and ``SqlDateTimeUtils.java``.  Per SURVEY.md §2.8 almost everything maps
1:1 to a Spark built-in; this module registers the handful of
Flink-named functions Spark spells differently or lacks.

Implementation choice: **SQL-body temporary functions** (Spark 3.5+
``CREATE TEMPORARY FUNCTION ... RETURN <expr>``).  These are inlined into
the Catalyst plan at analysis time — whole-stage codegen applies, no
Python round-trip, so the compat layer costs nothing at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (params, return type, SQL body) ; bodies use only Spark built-ins
_SQL_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    # SPLIT_INDEX(str, delim, idx)  — SqlFunctionUtils.splitIndex (0-based)
    "split_index": (
        "s STRING, delim STRING, idx INT", "STRING",
        "element_at(split(s, delim), idx + 1)",
    ),
    # IS_DECIMAL / IS_DIGIT / IS_ALPHA — SqlFunctionUtils.isDecimal/isDigit/isAlpha
    "is_decimal": (
        "s STRING", "BOOLEAN",
        "s IS NOT NULL AND s rlike '^[+-]?([0-9]+(\\\\.[0-9]*)?|\\\\.[0-9]+)$'",
    ),
    "is_digit": ("s STRING", "BOOLEAN", "s IS NOT NULL AND s rlike '^[0-9]+$'"),
    "is_alpha": ("s STRING", "BOOLEAN", "s IS NOT NULL AND s rlike '^[a-zA-Z]+$'"),
    # HASH_CODE(str) — Flink's String.hashCode-based hash; we expose a stable
    # 32-bit hash (murmur3, Spark `hash`) under the Flink name.
    "hash_code": ("s STRING", "INT", "hash(s)"),
    # FROM_BASE64 / TO_BASE64 — Spark spells them unbase64/base64
    "from_base64": ("s STRING", "STRING", "cast(unbase64(s) AS STRING)"),
    "to_base64": ("s STRING", "STRING", "base64(cast(s AS BINARY))"),
    # CHR and REGEXP are Spark built-ins already (char/chr, regexp/rlike) —
    # not registered here to avoid shadowing.
    # LOG2 exists in Spark; DIVIDE_INTEGER -> div; TRUNCATE(n, d):
    "truncate": (
        "x DOUBLE, d INT", "DOUBLE",
        "CASE WHEN x >= 0 THEN floor(x * power(10, d)) / power(10, d) "
        "ELSE ceil(x * power(10, d)) / power(10, d) END",
    ),
    # SIMILAR TO (FlinkSqlOperatorTable SIMILAR_TO, SqlLikeUtils.similar):
    # SQL:2003 pattern -> anchored regex with % -> .* and _ -> . ; the
    # SIMILAR TO metacharacter set ((|), [], {}, *, +, ?) passes through
    # unchanged — those are quantifiers/groups in SQL:2003 SIMILAR TO just as
    # in Java regex.  '.' and '\' are ordinary literals in SIMILAR TO
    # (SqlLikeUtils.similar) but special in regex, so they are regex-escaped
    # BEFORE the %/_ translation.  '^'/'$' divergence (regex anchors vs
    # literal; '^' is still bracket-negation) and escape sequences are
    # documented narrowings.
    "similar_to": (
        "s STRING, p STRING", "BOOLEAN",
        "s rlike concat('^(?:', "
        "replace(replace(regexp_replace(p, '([.\\\\\\\\])', '\\\\\\\\$1'), "
        "'%', '.*'), '_', '.'), ')$')",
    ),
    # OVERLAPS (FlinkSqlOperatorTable OVERLAPS, Calcite semantics): each
    # period is normalized so start <= end, endpoints inclusive.
    "ts_overlaps": (
        "s1 TIMESTAMP, e1 TIMESTAMP, s2 TIMESTAMP, e2 TIMESTAMP", "BOOLEAN",
        "least(s1, e1) <= greatest(s2, e2) AND least(s2, e2) <= greatest(s1, e1)",
    ),
}


def register_flink_functions(spark: SparkSession) -> None:
    """Idempotently register the compat functions on this session."""
    for name, (params, ret, body) in _SQL_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) "
            f"RETURNS {ret} RETURN {body}"
        )
