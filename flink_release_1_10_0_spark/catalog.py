"""In-memory catalog over parquet tables.

Reference: Flink's ``GenericInMemoryCatalog``
(``flink-table/flink-table-api-java-bridge`` / catalog package,
``GenericInMemoryCatalog.java:52``) + the scan-source registration path
(``BatchExecTableSourceScan.scala``).  In Spark the catalog IS the session
catalog; registering a parquet-backed temp view gives Catalyst full
predicate pushdown / column pruning / partition pruning on the scan —
equivalent to the reference's ``ProjectableTableSource`` /
``FilterableTableSource`` pushdown interfaces for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def register_tables(spark: SparkSession, sf_dir: str,
                    tables: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Register every parquet table under ``sf_dir`` as a temp view.

    Returns name -> DataFrame.  Missing files are skipped so the same call
    works against partial datasets.
    """
    out: dict[str, DataFrame] = {}
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table as a DataFrame (no view registration).

    ``events.parquet`` stores ``ts`` as parquet INT64 TIMESTAMP(NANOS),
    which Spark's vectorized reader rejects; read it as raw nanos
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to microsecond
    timestamps — matching DuckDB's nanos->micros truncation.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)
