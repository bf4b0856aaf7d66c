"""Top-N and deduplication operators.

Reference semantics:
- Top-N: ``physical/stream/StreamExecRank.scala:53`` + runtime
  ``runtime/operators/rank/AppendOnlyTopNFunction.java:46`` — keep the N
  best rows per partition key by an ordering.
- Dedup: ``physical/stream/StreamExecDeduplicate.scala:50`` + runtime
  ``runtime/operators/deduplicate/DeduplicateKeepLastRowFunction.java:34``
  (and KeepFirstRow) — one row per key, first or last by an ordering.

Batch implementation: ``row_number()`` over a window + filter — Catalyst
plans this as a single shuffle on the partition key followed by a
partition-local sort; with AQE, skewed keys are split.  At 100 TB the
shuffle is on the dedup/rank key only (no data explosion), and the filter
``rn <= N`` is applied during the window evaluation (Spark's
WindowGroupLimit pushes the limit into the sort for rank functions).
Streaming variants live in ``flink_release_1_10_0_spark/streaming/``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n(df: DataFrame, partition_by: list[str | Column],
          order_by: list[Column], n: int,
          rank_function: str = "row_number",
          rank_col: str = "rn", keep_rank_col: bool = True) -> DataFrame:
    """Keep the top ``n`` rows per key.  ``rank_function`` is one of
    row_number | rank | dense_rank (the three RankType modes of
    ``StreamExecRank``)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[rank_function]
    out = df.withColumn(rank_col, fn().over(w)).filter(F.col(rank_col) <= n)
    return out if keep_rank_col else out.drop(rank_col)


def deduplicate(df: DataFrame, keys: list[str | Column],
                order_by: list[Column], keep: str = "first") -> DataFrame:
    """One row per key: ``keep='first'`` keeps the minimum of the ordering,
    ``keep='last'`` the maximum (DeduplicateKeepFirst/LastRowFunction)."""
    ordering = list(order_by) if keep == "first" else [c.desc() if isinstance(c, Column) else F.col(c).desc() for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1).drop("__rn"))
