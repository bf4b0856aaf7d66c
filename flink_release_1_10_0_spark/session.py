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
        # AQE's coalesce floor defaults to 1 MB per partition.  Stages whose
        # shuffle input is small in BYTES but heavy in CPU-per-row (LSH
        # candidate verification: array_intersect per pair) get coalesced
        # onto 1-3 tasks and serialize a 32-core machine (measured: the
        # minhash head's verify stage ran as a 4.2s/3-task job; 64k floor →
        # 3.4s head total, 1.8x).  64k keeps small-byte stages parallel; at
        # cluster scale the max(total/parallelism, floor) term dominates the
        # floor, so this is inert at 100 TB (coalescing still targets
        # total/parallelism).
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
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
