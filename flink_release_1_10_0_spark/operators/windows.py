"""Group-window assigners: tumble / hop / session / count windows.

Reference: ``runtime/operators/window/assigners/`` (TumblingWindowAssigner,
SlidingWindowAssigner, SessionWindowAssigner, CountTumblingWindowAssigner)
driven by ``StreamExecGroupWindowAggregate.scala``; DataStream surface
``KeyedStream.java:615`` (timeWindow) / ``:652`` (countWindow).

Batch + streaming: tumble/hop map to Spark ``window()``, session to
``session_window()`` — both native, watermark-compatible, and executed
JVM-side.  Count windows have no Spark equivalent; the batch form uses
row_number bucketing (one shuffle), the streaming form lives in
``streaming/``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumble(df: DataFrame, ts: str, size: str) -> DataFrame:
    """Add w_start/w_end tumbling-window columns (TumblingWindowAssigner)."""
    w = F.window(ts, size)
    return (df.withColumn("__w", w)
              .withColumn("w_start", F.col("__w.start"))
              .withColumn("w_end", F.col("__w.end"))
              .drop("__w"))


def hop(df: DataFrame, ts: str, size: str, slide: str) -> DataFrame:
    """Sliding/hopping windows (SlidingWindowAssigner) — one row per
    covering window."""
    w = F.window(ts, size, slide)
    return (df.withColumn("__w", w)
              .withColumn("w_start", F.col("__w.start"))
              .withColumn("w_end", F.col("__w.end"))
              .drop("__w"))


def session(df: DataFrame, ts: str, gap: str, keys: list[str]) -> DataFrame:
    """Session windows with static gap (SessionWindowAssigner).  Returns
    one row per (keys, session) with w_start = min ts and w_end =
    max ts + gap, ready for aggregation joins; callers typically use
    ``session_agg`` instead."""
    return (df.groupBy(F.session_window(F.col(ts), gap).alias("__w"), *keys)
              .agg(F.count("*").alias("n_rows"),
                   F.min(ts).alias("first_ts"), F.max(ts).alias("last_ts"))
              .withColumn("w_start", F.col("__w.start"))
              .withColumn("w_end", F.col("__w.end"))
              .drop("__w"))


def count_tumble(df: DataFrame, keys: list[str], order_by: list[Column],
                 size: int) -> DataFrame:
    """Count-based tumbling windows (CountTumblingWindowAssigner): bucket =
    floor(row_index / size) per key, with a deterministic ordering."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn(
        "w_id", ((F.row_number().over(w) - 1) / size).cast("bigint"))
