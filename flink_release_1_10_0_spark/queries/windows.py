"""OVER aggregates, ranking, top-N, dedup, and time-window queries
(SURVEY.md §2.5).

References per query in docstrings; all use the reusable operators in
``flink_release_1_10_0_spark.operators``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_release_1_10_0_spark.operators.ranking import deduplicate, top_n
from flink_release_1_10_0_spark.operators.windows import (
    count_tumble, hop, hop_paned, session, tumble,
)
from flink_release_1_10_0_spark.queries import register
from flink_release_1_10_0_spark.queries.helpers import MONEY, t

_VAL = f"CAST(value AS DECIMAL(18,2))"

# --------------------------------------------------------------------------
# OVER aggregate, ROWS frame (BatchExecOverAggregate.scala:72;
# runtime/operators/over/frame/ RowsFrames)
# --------------------------------------------------------------------------
_OVER_ROWS_ORACLE = f"""
SELECT event_id, user_id,
       CAST(SUM({_VAL}) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum,
       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_n
FROM events
"""


@register("over_rows_running_sum", _OVER_ROWS_ORACLE)
def over_rows_running_sum(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    return ev.select(
        "event_id", "user_id",
        F.sum(F.col("value").cast(MONEY)).over(w).cast("double").alias("running_sum"),
        F.count("*").over(w).cast("bigint").alias("running_n"))


# --------------------------------------------------------------------------
# OVER aggregate, sliding ROWS frame (moving average over last 5 rows)
# --------------------------------------------------------------------------
_OVER_MOVING_ORACLE = f"""
SELECT event_id, user_id,
       CAST(SUM({_VAL}) OVER w AS DOUBLE)
         / CAST(COUNT(*) OVER w AS BIGINT) AS moving_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


@register("over_rows_moving_avg", _OVER_MOVING_ORACLE)
def over_rows_moving_avg(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-4, 0))
    return ev.select(
        "event_id", "user_id",
        (F.sum(F.col("value").cast(MONEY)).over(w).cast("double")
         / F.count("*").over(w).cast("bigint")).alias("moving_avg"))


# --------------------------------------------------------------------------
# OVER aggregate, RANGE frame (RowTimeRangeBoundedPrecedingFunction.java:60)
# --------------------------------------------------------------------------
_OVER_RANGE_ORACLE = f"""
SELECT event_id, user_id,
       CAST(SUM({_VAL}) OVER (PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_sum
FROM events
"""


@register("over_range_cumulative", _OVER_RANGE_ORACLE)
def over_range_cumulative(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts")
         .rangeBetween(Window.unboundedPreceding, 0))
    return ev.select(
        "event_id", "user_id",
        F.sum(F.col("value").cast(MONEY)).over(w).cast("double").alias("range_sum"))


# --------------------------------------------------------------------------
# Ranking functions (FlinkSqlOperatorTable RANK/DENSE_RANK/ROW_NUMBER)
# --------------------------------------------------------------------------
_RANKFN_ORACLE = """
SELECT event_id, event_type,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       CAST(row_number() OVER w AS BIGINT) AS rn
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
"""


@register("rank_dense_rank_row_number", _RANKFN_ORACLE)
def rank_dense_rank_row_number(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return ev.select(
        "event_id", "event_type",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.row_number().over(w).cast("bigint").alias("rn"))


# --------------------------------------------------------------------------
# LEAD / LAG (aggfunctions/LeadLagAggFunction.java)
# --------------------------------------------------------------------------
_LEADLAG_ORACLE = """
SELECT event_id, user_id,
       lead(value, 1) OVER w AS next_value,
       lag(event_type, 1) OVER w AS prev_type,
       lag(value, 2, -1.0) OVER w AS prev2_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("lead_lag", _LEADLAG_ORACLE)
def lead_lag(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id",
        F.lead("value", 1).over(w).alias("next_value"),
        F.lag("event_type", 1).over(w).alias("prev_type"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_value"))


# --------------------------------------------------------------------------
# Top-N per key (StreamExecRank.scala:53 / AppendOnlyTopNFunction.java:46)
# --------------------------------------------------------------------------
_TOPN_ORACLE = """
SELECT user_id, event_id, value, CAST(rn AS BIGINT) AS rn FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events) q
WHERE rn <= 3
"""


@register("topn_per_key", _TOPN_ORACLE)
def topn_per_key(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    out = top_n(ev, ["user_id"], [F.desc("value"), F.asc("event_id")], 3)
    return out.select("user_id", "event_id", "value", F.col("rn").cast("bigint").alias("rn"))


# --------------------------------------------------------------------------
# Dedup keep-first / keep-last (StreamExecDeduplicate.scala:50)
# --------------------------------------------------------------------------
_DEDUP_FIRST_ORACLE = """
SELECT user_id, event_id, event_type, value FROM (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events) q
WHERE rn = 1
"""


@register("dedup_keep_first", _DEDUP_FIRST_ORACLE)
def dedup_keep_first(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    out = deduplicate(ev, ["user_id", "event_type"], [F.col("ts"), F.col("event_id")], "first")
    return out.select("user_id", "event_id", "event_type", "value")


_DEDUP_LAST_ORACLE = """
SELECT user_id, event_id, event_type, value FROM (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) q
WHERE rn = 1
"""


@register("dedup_keep_last", _DEDUP_LAST_ORACLE)
def dedup_keep_last(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    out = deduplicate(ev, ["user_id", "event_type"], [F.col("ts"), F.col("event_id")], "last")
    return out.select("user_id", "event_id", "event_type", "value")


# --------------------------------------------------------------------------
# Tumbling window agg (TumblingWindowAssigner; WindowOperator.java:98)
# --------------------------------------------------------------------------
_TUMBLE_ORACLE = f"""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w_start,
       CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS w_end,
       event_type,
       COUNT(*) AS n,
       CAST(SUM({_VAL}) AS DOUBLE) AS total
FROM events
GROUP BY 1, 2, 3
"""


@register("window_tumble_1h", _TUMBLE_ORACLE)
def window_tumble_1h(spark, sf_dir):
    ev = tumble(t(spark, sf_dir, "events"), "ts", "1 hour")
    return (ev.groupBy("w_start", "w_end", "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("value").cast(MONEY)).cast("double").alias("total")))


# --------------------------------------------------------------------------
# Hopping window agg (SlidingWindowAssigner)
# --------------------------------------------------------------------------
_HOP_ORACLE = f"""
SELECT make_timestamp(CAST(((epoch_us(ts) // 1800000000) - j) * 1800000000 AS BIGINT)) AS w_start,
       COUNT(*) AS n,
       CAST(SUM({_VAL}) AS DOUBLE) AS total
FROM events CROSS JOIN (VALUES (0), (1)) AS offsets(j)
GROUP BY 1
"""


@register("window_hop_1h_30m", _HOP_ORACLE)
def window_hop_1h_30m(spark, sf_dir):
    ev = hop(t(spark, sf_dir, "events"), "ts", "1 hour", "30 minutes")
    return (ev.groupBy("w_start")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("value").cast(MONEY)).cast("double").alias("total")))


@register("window_hop_paned", _HOP_ORACLE)
def window_hop_paned(spark, sf_dir):
    """Same hopping aggregate, computed via pane decomposition — one pane
    agg per record instead of k window copies (PanedWindowAssigner)."""
    ev = t(spark, sf_dir, "events")
    return (hop_paned(ev, "ts", 3600, 1800, F.col("value").cast(MONEY))
            .select("w_start", "n", F.col("total_dec").cast("double").alias("total")))


# --------------------------------------------------------------------------
# Session window agg (SessionWindowAssigner; gap merging)
# --------------------------------------------------------------------------
_SESSION_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       CAST(min(ts) AS TIMESTAMP) AS w_start,
       CAST(max(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS w_end,
       COUNT(*) AS n
FROM numbered GROUP BY user_id, session_id
"""


@register("window_session_30m", _SESSION_ORACLE)
def window_session_30m(spark, sf_dir):
    ev = session(t(spark, sf_dir, "events"), "ts", "30 minutes", ["user_id"])
    return ev.select("user_id", "w_start", "w_end", F.col("n_rows").alias("n"))


# --------------------------------------------------------------------------
# Count tumbling window (CountTumblingWindowAssigner; KeyedStream
# countWindow at KeyedStream.java:652)
# --------------------------------------------------------------------------
_COUNT_WINDOW_ORACLE = f"""
SELECT user_id, w_id, COUNT(*) AS n, CAST(SUM({_VAL}) AS DOUBLE) AS total
FROM (
  SELECT user_id, value,
         CAST((row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) // 10 AS BIGINT) AS w_id
  FROM events) q
GROUP BY user_id, w_id
"""


@register("window_count_tumble_10", _COUNT_WINDOW_ORACLE)
def window_count_tumble_10(spark, sf_dir):
    ev = count_tumble(t(spark, sf_dir, "events"), ["user_id"],
                      [F.col("ts"), F.col("event_id")], 10)
    return (ev.groupBy("user_id", "w_id")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("value").cast(MONEY)).cast("double").alias("total")))


# --------------------------------------------------------------------------
# Session windows with DYNAMIC gap (DataStream session assigner
# "incl. dynamic-gap", flink-streaming-java/.../windowing/assigners/
# DynamicEventTimeSessionWindows): each event extends its session by a
# gap that depends on the event itself (errors keep sessions alive
# longer).  Sessions merge on overlap — equivalently, a new session
# starts when ts exceeds the running max of (prev ts + prev gap).
# --------------------------------------------------------------------------
_SESSION_DYN_ORACLE = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN event_type = 'error' THEN INTERVAL 60 MINUTE
              ELSE INTERVAL 15 MINUTE END AS gap
  FROM events),
marked AS (
  SELECT user_id, ts, gap,
         CASE WHEN MAX(ts + gap) OVER (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) >= ts
              THEN 0 ELSE 1 END AS new_session
  FROM g),
sessions AS (
  SELECT user_id, ts, gap,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked)
SELECT user_id, MIN(ts) AS w_start, MAX(ts + gap) AS w_end, COUNT(*) AS n
FROM sessions GROUP BY user_id, sid
"""


@register("window_session_dynamic_gap", _SESSION_DYN_ORACLE)
def window_session_dynamic_gap(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "error", F.lit("60 minutes")) \
           .otherwise(F.lit("15 minutes"))
    return (ev.groupBy(F.session_window("ts", gap), "user_id")
            .agg(F.count("*").alias("n"))
            .select("user_id",
                    F.col("session_window.start").alias("w_start"),
                    F.col("session_window.end").alias("w_end"), "n"))
