"""Interval join and temporal/as-of join queries (SURVEY.md §2.3).

- Interval join: reference ``StreamExecWindowJoin.scala:53`` /
  ``TimeBoundedStreamJoin.java:52`` / ``KeyedStream.java:418``.
- As-of join: reference ``StreamExecTemporalJoin.scala:51`` /
  ``TemporalRowTimeJoinOperator.java:71``; DuckDB's native ASOF JOIN is
  the oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_release_1_10_0_spark.operators.joins import asof_join, interval_join
from flink_release_1_10_0_spark.queries import register
from flink_release_1_10_0_spark.queries.helpers import t

# --------------------------------------------------------------------------
# Interval join: clicks within 30 min before each purchase, same user
# --------------------------------------------------------------------------
_INTERVAL_ORACLE = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 30 MINUTE
 AND c.ts <= p.ts
"""


@register("interval_join_clicks_before_purchase", _INTERVAL_ORACLE)
def interval_join_clicks_before_purchase(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    joined = interval_join(
        purchases, clicks, keys=[("user_id", "user_id")],
        left_ts="ts", right_ts="ts",
        lower_expr="INTERVAL 30 MINUTES", upper_expr="INTERVAL 0 SECONDS")
    return joined.select(
        F.col("l.event_id").alias("purchase_id"),
        F.col("r.event_id").alias("click_id"),
        F.col("l.user_id").alias("user_id"),
        (F.unix_micros(F.col("l.ts")) - F.unix_micros(F.col("r.ts"))).alias("gap_us"))


# --------------------------------------------------------------------------
# As-of join: latest error at-or-before each purchase, per user
# --------------------------------------------------------------------------
_ASOF_ORACLE = """
SELECT p.event_id, p.user_id, p.ts,
       e.value AS last_error_value, e.ts AS last_error_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'error') e
  ON p.user_id = e.user_id AND p.ts >= e.ts
"""


@register("asof_join_last_error_before_purchase", _ASOF_ORACLE)
def asof_join_last_error_before_purchase(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts"))
    errors = (ev.filter(F.col("event_type") == "error")
              .select("user_id", F.col("ts").alias("ets"), F.col("value").alias("evalue")))
    out = asof_join(purchases, errors, keys=[("user_id", "user_id")],
                    probe_ts="ts", build_ts="ets",
                    build_cols=["evalue", "ets"])
    return out.select("event_id", "user_id", "ts",
                      F.col("evalue").alias("last_error_value"),
                      F.col("ets").alias("last_error_ts"))


# --------------------------------------------------------------------------
# FOR SYSTEM_TIME AS OF — the Flink 1.10 lookup-join SQL surface
# (docs/dev/table/streaming/joins.md:299-342, CommonLookupJoinRule.scala).
# The versioned rates dimension (error events keyed by user_id % 7) is
# reduced to its current snapshot and broadcast; purchases probe it on the
# proctime attribute exactly as the docs' LatestRates example.
# --------------------------------------------------------------------------


def _purchases(spark, sf_dir, with_proctime=True):
    p = (t(spark, sf_dir, "events")
         .filter(F.col("event_type") == "purchase")
         .select("event_id", "user_id",
                 (F.col("user_id") % 7).alias("currency"), "value"))
    if with_proctime:
        # processing-time attribute: a marker column per the reference's
        # proctime() — never compared against data time
        p = p.withColumn("proctime", F.current_timestamp())
    return p


def _rate_versions(spark, sf_dir, max_currency=7):
    return (t(spark, sf_dir, "events")
            .filter((F.col("event_type") == "error")
                    & (F.col("user_id") % 7 < max_currency))
            .select((F.col("user_id") % 7).alias("currency"),
                    "ts", "event_id", F.col("value").alias("rate")))


_SYSTEM_TIME_LOOKUP_ORACLE = """
WITH snap AS (
  SELECT user_id % 7 AS currency, value AS rate,
         row_number() OVER (PARTITION BY user_id % 7
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE event_type = 'error')
SELECT o.event_id, o.user_id, r.rate,
       ROUND(o.value * r.rate, 6) AS converted
FROM (SELECT event_id, user_id, user_id % 7 AS currency, value
      FROM events WHERE event_type = 'purchase') o
JOIN (SELECT currency, rate FROM snap WHERE rn = 1) r
  ON o.currency = r.currency
WHERE o.value > 50
"""


@register("flink_sql_system_time_lookup", _SYSTEM_TIME_LOOKUP_ORACLE)
def flink_sql_system_time_lookup(spark, sf_dir):
    from flink_release_1_10_0_spark.sql_temporal import (
        LookupSource, execute_system_time_join_sql)

    sql = """
    SELECT o.event_id AS event_id, o.user_id AS user_id, r.rate AS rate,
           ROUND(o.value * r.rate, 6) AS converted
    FROM purchases AS o
    JOIN rates FOR SYSTEM_TIME AS OF o.proctime AS r
      ON o.currency = r.currency
    WHERE o.value > 50
    """
    return execute_system_time_join_sql(
        spark, sql, tables={"purchases": _purchases(spark, sf_dir)},
        lookup_sources={"rates": LookupSource(
            _rate_versions(spark, sf_dir), primary_key="currency",
            version_cols=("ts", "event_id"))},
        proctime_attrs={"o": "proctime"})


_SYSTEM_TIME_LEFT_ORACLE = """
WITH snap AS (
  SELECT user_id % 7 AS currency, value AS rate,
         row_number() OVER (PARTITION BY user_id % 7
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE event_type = 'error' AND user_id % 7 < 4)
SELECT o.event_id, o.user_id, r.rate
FROM (SELECT event_id, user_id, user_id % 7 AS currency, value
      FROM events WHERE event_type = 'purchase') o
LEFT JOIN (SELECT currency, rate FROM snap WHERE rn = 1) r
  ON o.currency = r.currency
WHERE o.value > 80
"""


@register("flink_sql_system_time_left", _SYSTEM_TIME_LEFT_ORACLE)
def flink_sql_system_time_left(spark, sf_dir):
    """LEFT JOIN variant (joins.md:330 allows INNER and LEFT): currencies
    4-6 have no dimension row, so their purchases keep NULL rates."""
    from flink_release_1_10_0_spark.sql_temporal import (
        LookupSource, execute_system_time_join_sql)

    sql = """
    SELECT o.event_id AS event_id, o.user_id AS user_id, r.rate AS rate
    FROM purchases AS o
    LEFT JOIN rates FOR SYSTEM_TIME AS OF o.proctime AS r
      ON o.currency = r.currency
    WHERE o.value > 80
    """
    return execute_system_time_join_sql(
        spark, sql, tables={"purchases": _purchases(spark, sf_dir)},
        lookup_sources={"rates": LookupSource(
            _rate_versions(spark, sf_dir, max_currency=4),
            primary_key="currency", version_cols=("ts", "event_id"))},
        proctime_attrs={"o": "proctime"})


# --------------------------------------------------------------------------
# Temporal table FUNCTION (event time): orders join the rate version
# in effect at their rowtime — joins.md:109-146, executed as the
# union-and-carry-forward as-of join.  DuckDB's native ASOF JOIN is the
# oracle (inner: purchases before the first version are dropped).
# --------------------------------------------------------------------------
_TEMPORAL_FN_ORACLE = """
WITH v AS (
  SELECT user_id % 7 AS currency, ts, MAX(value) AS rate
  FROM events WHERE event_type = 'error' GROUP BY 1, 2),
p AS (
  SELECT event_id, user_id, user_id % 7 AS currency, ts, value
  FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id, v.rate,
       v.ts AS rate_ts, ROUND(p.value * v.rate, 6) AS converted
FROM p ASOF JOIN v ON p.currency = v.currency AND p.ts >= v.ts
WHERE p.value > 20
"""


@register("flink_sql_temporal_table_function", _TEMPORAL_FN_ORACLE)
def flink_sql_temporal_table_function(spark, sf_dir):
    from flink_release_1_10_0_spark.sql_temporal import (
        TemporalTableFunction, execute_temporal_function_sql)

    purchases = _purchases(spark, sf_dir, with_proctime=False) \
        .join(t(spark, sf_dir, "events").select("event_id", "ts"),
              on="event_id")
    versions = (_rate_versions(spark, sf_dir)
                .groupBy("currency", "ts")
                .agg(F.max("rate").alias("rate")))
    sql = """
    SELECT o.event_id AS event_id, o.user_id AS user_id, r.rate AS rate,
           r.ts AS rate_ts, ROUND(o.value * r.rate, 6) AS converted
    FROM purchases AS o,
      LATERAL TABLE (rates(o.ts)) AS r
    WHERE o.currency = r.currency AND o.value > 20
    """
    return execute_temporal_function_sql(
        spark, sql, tables={"purchases": purchases},
        temporal_functions={"rates": TemporalTableFunction(
            versions, time_attr="ts", primary_key="currency")})
