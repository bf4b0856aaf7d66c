"""Skew-mitigation rewrites.

- ``split_distinct_agg``: the reference's ``SplitAggregateRule``
  (``FlinkStreamRuleSets.scala:329-340``, gated by
  ``TABLE_OPTIMIZER_DISTINCT_AGG_SPLIT_ENABLED``): rewrite
  ``COUNT(DISTINCT x) GROUP BY g`` into a two-level aggregation
  partitioned by ``(g, hash(x) % N)`` so one hot group key no longer
  lands on a single reducer.  Catalyst has AQE skew-join handling but no
  distinct-agg split — this is a genuine gap we fill.

- ``salted_join``: key-salting for skewed equi-joins — explode the
  small side N ways, salt the large side with ``rand(seed) % N``; the
  standard manual remedy when AQE's skew threshold is not met.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_distinct_agg(df: DataFrame, group_cols: list[str], distinct_col: str,
                       n_buckets: int = 32,
                       out_name: str = "n_distinct") -> DataFrame:
    """``COUNT(DISTINCT distinct_col) GROUP BY group_cols`` as a two-level
    agg: level 1 groups by (keys, hash bucket) and counts distinct within
    the bucket (bounded fan-in per reducer); level 2 sums bucket counts.
    Exact — buckets partition the value space, so distinct sets are
    disjoint across buckets.
    """
    bucket = (F.abs(F.hash(F.col(distinct_col))) % n_buckets).alias("__bucket")
    level1 = (df.groupBy(*group_cols, bucket)
              .agg(F.countDistinct(distinct_col).alias("__partial")))
    return (level1.groupBy(*group_cols)
            .agg(F.sum("__partial").cast("bigint").alias(out_name)))


def salted_join(large: DataFrame, small: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Skewed equi-join: replicate ``small`` across ``n_salts`` salt
    values and spread ``large``'s hot keys uniformly over them."""
    salted_large = large.withColumn(
        "__salt", (F.floor(F.rand(seed=42) * n_salts)).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    salted_small = small.select("*", salts)
    out = salted_large.join(salted_small,
                            [key, "__salt"], how)
    return out.drop("__salt")
