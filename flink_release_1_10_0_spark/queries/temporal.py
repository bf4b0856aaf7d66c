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
