"""Unbounded sources and sinks (SURVEY.md §2.1 / §2.9).

Reference -> Spark mapping:

- custom SourceFunction / generateSequence
  (``StreamExecutionEnvironment.java:809/:1527``) -> ``rate`` source
  (monotonic ``timestamp, value`` rows at a configured rows/sec).
- socket source (``StreamExecutionEnvironment.java:1322``) ->
  ``readStream.format("socket")``.
- continuous file monitoring (``readFile`` with ``PROCESS_CONTINUOUSLY``,
  ``StreamExecutionEnvironment.java:1128``) -> directory-watching file
  stream source with schema + ``maxFilesPerTrigger``.
- StreamingFileSink (buckets, rolling, exactly-once;
  ``functions/sink/filesystem/StreamingFileSink.java:98``) ->
  ``writeStream.format("parquet")`` + checkpointing; ``partition_by``
  maps bucket assigners onto directory partitions; exactly-once comes
  from checkpoint + idempotent file manifest.
- print/collect test sinks (``DataStream.java:1005``) -> memory sink.
- multi-sink / side-output topologies -> ``foreachBatch`` writing the
  same micro-batch DataFrame to several destinations.

Kafka (``FlinkKafkaConsumer.java:73``) maps to
``readStream.format("kafka")`` — available in Spark when the kafka
package is on the classpath; no broker exists in this environment so it
is intentionally not wrapped here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def rate_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Monotonic (timestamp, value) stream — the SourceFunction analog."""
    return (spark.readStream.format("rate")
            .option("rowsPerSecond", str(rows_per_second)).load())


def socket_source(spark: SparkSession, host: str, port: int) -> DataFrame:
    return (spark.readStream.format("socket")
            .option("host", host).option("port", str(port)).load())


def file_monitor_source(spark: SparkSession, directory: str, schema,
                        fmt: str = "parquet",
                        max_files_per_trigger: int | None = None) -> DataFrame:
    """Continuously-monitored directory source (PROCESS_CONTINUOUSLY)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.format(fmt).load(directory)


def file_sink(df: DataFrame, path: str, checkpoint: str, fmt: str = "parquet",
              partition_by: list[str] | None = None,
              output_mode: str = "append",
              available_now: bool = False) -> StreamingQuery:
    """StreamingFileSink analog: checkpointed, partitioned file output.
    ``available_now=True`` drains the current input then stops (bounded
    backfill run); the checkpoint + sink commit log make re-runs
    exactly-once."""
    w = (df.writeStream.format(fmt)
         .option("path", path)
         .option("checkpointLocation", checkpoint)
         .outputMode(output_mode))
    if partition_by:
        w = w.partitionBy(*partition_by)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def memory_sink(df: DataFrame, name: str, checkpoint: str,
                output_mode: str = "append") -> StreamingQuery:
    return (df.writeStream.format("memory").queryName(name)
            .option("checkpointLocation", checkpoint)
            .outputMode(output_mode).start())


def foreach_batch_sink(df: DataFrame, checkpoint: str,
                       fn: Callable[[DataFrame, int], None]) -> StreamingQuery:
    """Multi-sink / side-output topologies: ``fn(batch_df, batch_id)``
    may persist+write the batch to several destinations (the reference's
    side outputs, ``SingleOutputStreamOperator.getSideOutput``)."""
    return (df.writeStream.foreachBatch(fn)
            .option("checkpointLocation", checkpoint).start())


def connect_with_broadcast_rules(stream_df: DataFrame, rules_path: str,
                                 on: str, out_path: str, checkpoint: str,
                                 fmt: str = "parquet") -> StreamingQuery:
    """Broadcast-state pattern (``DataStream.broadcast``,
    ``BroadcastProcessFunction.java:51``): a slowly-changing rules table
    re-read and broadcast at EVERY micro-batch, so rule updates take
    effect on the next batch — the per-batch-refresh layout Spark uses
    where the reference streams rule updates into broadcast state.
    """
    from pyspark.sql.functions import broadcast

    spark = stream_df.sparkSession

    def apply_rules(batch_df: DataFrame, batch_id: int) -> None:
        rules = spark.read.format(fmt).load(rules_path)
        (batch_df.join(broadcast(rules), on)
         .write.mode("append").format(fmt).save(out_path))

    return (stream_df.writeStream.foreachBatch(apply_rules)
            .option("checkpointLocation", checkpoint).start())
