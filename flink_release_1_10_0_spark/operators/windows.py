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


def hop_paned(df: DataFrame, ts: str, size_sec: int, slide_sec: int,
              value_col: Column) -> DataFrame:
    """Pane-optimized sliding-window aggregation (PanedWindowAssigner,
    ``runtime/operators/window/assigners/SlidingWindowAssigner.java`` pane
    path + ``.../window/grouping/``): when ``slide`` divides ``size``,
    aggregate each record ONCE into its slide-sized pane, then combine
    each pane's partial into the ``size/slide`` covering windows.

    Scale rationale (the reason this operator exists at 100 TB): the
    naive plan replicates every record into k = size/slide windows before
    the shuffle; the paned plan shuffles one pre-aggregated row per
    (pane, key) — record-volume reduction of k× on the wire plus map-side
    combine, identical results.  Returns (w_start, n, total_cents).
    """
    assert size_sec % slide_sec == 0, "pane optimization needs slide | size"
    k = size_sec // slide_sec
    panes = (df.groupBy(F.window(ts, f"{slide_sec} seconds").alias("__pane"))
               .agg(F.count("*").alias("__pn"), F.sum(value_col).alias("__ps")))
    starts = F.array(*[
        F.col("__pane.start") - F.expr(f"INTERVAL {i * slide_sec} SECONDS")
        for i in range(k)])
    return (panes.select(F.explode(starts).alias("w_start"), "__pn", "__ps")
            .groupBy("w_start")
            .agg(F.sum("__pn").alias("n"), F.sum("__ps").alias("total_dec")))
