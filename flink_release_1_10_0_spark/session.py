"""SparkSession factory with scale-oriented defaults.

The reference engine's execution configuration surface
(``flink-table-api-java/.../config/ExecutionConfigOptions.java`` and
``OptimizerConfigOptions.java``) maps onto Spark SQL confs:

- ``table.optimizer.join.broadcast-threshold`` (1 MB default)
  -> ``spark.sql.autoBroadcastJoinThreshold``
- ``table.optimizer.join-reorder-enabled`` -> ``spark.sql.cbo.joinReorder.enabled``
- ``table.exec.shuffle-mode`` / blocking shuffle -> AQE handles it at runtime
- spill/sort tuning (``table.exec.sort.*``) -> Tungsten external sort (built-in)

AQE is on so skew joins / partition coalescing re-plan at runtime — the
100 TB story: partition counts below are LOCAL TEST defaults; on a real
cluster, AQE target sizes (64 MB advisory partitions) govern, not the
static number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "flink_release_1_10_0_spark",
              cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a session tuned for local testing, cluster-safe.

    Every conf here is also correct on a 1000-executor cluster except
    ``master``/``shuffle.partitions``, which a cluster deployment overrides
    via spark-submit; AQE coalescing makes the static shuffle-partition
    number mostly irrelevant at scale.
    """
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.cbo.joinReorder.enabled", "true")
        # reference broadcast threshold is 1 MB; 32 MB is the right call on
        # a modern cluster (dimension tables of TPC-H at 100 TB SF are GBs,
        # but region/nation/part subsets stay broadcastable)
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
