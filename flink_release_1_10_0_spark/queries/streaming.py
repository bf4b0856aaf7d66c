"""Structured-Streaming queries run to completion over bounded input
(SURVEY.md §2.5 / §2.9).  Each runs a REAL streaming query (readStream ->
transform -> memory sink, availableNow trigger); the oracle states the
equivalent batch semantics, which is exact because the bounded run
processes every record.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_release_1_10_0_spark.queries import register
from flink_release_1_10_0_spark.queries.helpers import MONEY
from flink_release_1_10_0_spark.streaming.core import read_stream_table, run_to_completion
from flink_release_1_10_0_spark.streaming import stateful

# --------------------------------------------------------------------------
# Streaming tumbling-window aggregate, complete mode
# (StreamExecGroupWindowAggregate + WindowOperator.java:98)
# --------------------------------------------------------------------------
_STREAM_TUMBLE_ORACLE = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM events GROUP BY 1, 2
"""


@register("stream_tumble_agg", _STREAM_TUMBLE_ORACLE)
def stream_tumble_agg(spark, sf_dir):
    ev = read_stream_table(spark, sf_dir, "events")
    agg = (ev.groupBy(F.window("ts", "1 hour"), "event_type")
           .agg(F.count("*").alias("n"),
                F.sum(F.col("value").cast(MONEY)).cast("double").alias("total"))
           .select(F.col("window.start").alias("w_start"), "event_type", "n", "total"))
    return run_to_completion(agg, "complete")


# --------------------------------------------------------------------------
# Streaming windowed agg with watermark, append mode: only windows whose
# end <= final watermark (max ts - delay) are emitted — late/open windows
# withheld, exactly the reference's event-time window firing semantics
# (WindowOperator + allowedLateness=0)
# --------------------------------------------------------------------------
_STREAM_WM_ORACLE = """
WITH wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events)
SELECT * FROM (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w_start, COUNT(*) AS n
  FROM events GROUP BY 1) q
WHERE w_start + INTERVAL 1 HOUR <= (SELECT w FROM wm)
"""


@register("stream_tumble_agg_watermarked", _STREAM_WM_ORACLE)
def stream_tumble_agg_watermarked(spark, sf_dir):
    ev = read_stream_table(spark, sf_dir, "events")
    agg = (ev.withWatermark("ts", "10 minutes")
           .groupBy(F.window("ts", "1 hour"))
           .agg(F.count("*").alias("n"))
           .select(F.col("window.start").alias("w_start"), "n"))
    return run_to_completion(agg, "append")


# --------------------------------------------------------------------------
# Stateful dedup keep-last (DeduplicateKeepLastRowFunction.java:34)
# --------------------------------------------------------------------------
_STREAM_DEDUP_ORACLE = """
SELECT user_id, event_id, event_type, value, ts FROM (
  SELECT user_id, event_id, event_type, value, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) q
WHERE rn = 1
"""


@register("stream_dedup_keep_last", _STREAM_DEDUP_ORACLE)
def stream_dedup_keep_last(spark, sf_dir):
    ev = read_stream_table(spark, sf_dir, "events")
    return run_to_completion(stateful.dedup_keep_last(ev), "update")


# --------------------------------------------------------------------------
# Stateful streaming top-N (AppendOnlyTopNFunction.java:46)
# --------------------------------------------------------------------------
_STREAM_TOPN_ORACLE = """
SELECT user_id, event_id, value, CAST(rn AS BIGINT) AS rn FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events) q
WHERE rn <= 3
"""


@register("stream_topn_per_key", _STREAM_TOPN_ORACLE)
def stream_topn_per_key(spark, sf_dir):
    ev = read_stream_table(spark, sf_dir, "events")
    return run_to_completion(stateful.topn_per_key(ev, n=3), "update")


# --------------------------------------------------------------------------
# CEP: error followed-by purchase within 30 min (NFA.java:85 subset)
# --------------------------------------------------------------------------
_STREAM_CEP_ORACLE = """
WITH a AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'error'),
b AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
cand AS (
  SELECT a.user_id, a.event_id AS first_id, b.event_id AS then_id,
         a.ts AS first_ts, b.ts AS then_ts,
         row_number() OVER (PARTITION BY a.user_id, a.event_id
                            ORDER BY b.ts, b.event_id) AS rn
  FROM a JOIN b ON a.user_id = b.user_id
   AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE)
SELECT user_id, first_id, then_id, first_ts, then_ts FROM cand WHERE rn = 1
"""


@register("stream_cep_error_then_purchase", _STREAM_CEP_ORACLE)
def stream_cep_error_then_purchase(spark, sf_dir):
    ev = read_stream_table(spark, sf_dir, "events")
    matched = stateful.cep_followed_by(ev, "error", "purchase", within_minutes=30)
    return run_to_completion(matched, "append")
