"""Kafka source/sink wrappers (``flink-connectors/flink-connector-kafka/
.../FlinkKafkaConsumer.java:73`` / ``FlinkKafkaProducer``).

Maps the reference consumer's configuration surface onto Spark's kafka
connector options (``readStream.format("kafka")``):

- ``setStartFromEarliest()`` / ``setStartFromLatest()``
  -> ``startingOffsets`` = earliest / latest
- ``setStartFromSpecificOffsets(Map<TopicPartition, Long>)``
  -> ``startingOffsets`` = per-topic/partition JSON
- ``setStartFromTimestamp(ms)`` -> ``startingOffsetsByTimestamp``
- topic list / ``Pattern`` subscription -> ``subscribe`` /
  ``subscribePattern``
- ``properties[group.id]`` -> ``kafka.group.id`` (note: Spark manages
  its own offsets via checkpoints — the group id is for quota/ACLs, not
  progress tracking, exactly the difference documented in the Spark
  kafka integration guide)
- DeserializationSchema -> explicit column decoding (``decode_json_value``):
  kafka rows arrive as (key binary, value binary, topic, partition,
  offset, timestamp) and the payload schema is applied with from_json —
  the analog of ``JSONKeyValueDeserializationSchema``.

The option construction is pure (testable without a broker); ``load()``
only works when the spark-sql-kafka package is on the classpath, so
``kafka_source`` raises a clear error otherwise.

At scale: one kafka partition maps to one Spark task per micro-batch;
``minPartitions`` can oversubscribe (split) partitions for hot topics,
and ``maxOffsetsPerTrigger`` bounds per-batch intake (the reference's
rate limiting lives in the consumer's fetcher instead).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_options(bootstrap_servers: str,
                  topics: str | list[str] | None = None,
                  topic_pattern: str | None = None,
                  starting_offsets: str | dict = "latest",
                  starting_timestamp_ms: int | None = None,
                  group_id: str | None = None,
                  max_offsets_per_trigger: int | None = None,
                  min_partitions: int | None = None,
                  fail_on_data_loss: bool = True) -> dict[str, str]:
    """Build the Spark kafka reader option map from FlinkKafkaConsumer
    style settings.  Pure function — unit-testable without a broker."""
    if (topics is None) == (topic_pattern is None):
        raise ValueError("exactly one of topics / topic_pattern required")
    opts: dict[str, str] = {"kafka.bootstrap.servers": bootstrap_servers}
    if topic_pattern is not None:
        opts["subscribePattern"] = topic_pattern
    else:
        opts["subscribe"] = ",".join(
            [topics] if isinstance(topics, str) else list(topics))
    if starting_timestamp_ms is not None:
        # setStartFromTimestamp: same timestamp for every partition
        opts["startingOffsetsByTimestampStrategy"] = "latest"
        opts["startingTimestamp"] = str(starting_timestamp_ms)
    elif isinstance(starting_offsets, dict):
        # setStartFromSpecificOffsets: {topic: {partition: offset}}
        opts["startingOffsets"] = json.dumps(starting_offsets)
    else:
        if starting_offsets not in ("earliest", "latest"):
            raise ValueError(f"bad starting_offsets {starting_offsets!r}")
        opts["startingOffsets"] = starting_offsets
    if group_id is not None:
        opts["kafka.group.id"] = group_id
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if min_partitions is not None:
        opts["minPartitions"] = str(min_partitions)
    opts["failOnDataLoss"] = "true" if fail_on_data_loss else "false"
    return opts


def configure_kafka_reader(reader, **kwargs):
    """Apply the FlinkKafkaConsumer-style settings to a (stream) reader:
    ``format("kafka")`` + the full option map.  Separated from ``load()``
    so the reader construction is contract-testable without a broker or
    the kafka package on the classpath."""
    reader = reader.format("kafka")
    for k, v in kafka_options(**kwargs).items():
        reader = reader.option(k, v)
    return reader


def kafka_source(spark: SparkSession, **kwargs) -> DataFrame:
    """Streaming kafka scan.  Raises a clear error when the
    spark-sql-kafka package is not on the classpath (this sandbox)."""
    reader = configure_kafka_reader(spark.readStream, **kwargs)
    try:
        return reader.load()
    except Exception as e:  # pragma: no cover - classpath-dependent
        raise RuntimeError(
            "kafka connector not on the classpath; submit with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>"
        ) from e


def decode_json_value(kafka_df: DataFrame, value_schema: str,
                      include_metadata: bool = True) -> DataFrame:
    """JSONKeyValueDeserializationSchema analog: parse the binary
    ``value`` as JSON into typed columns; optionally keep the kafka
    metadata columns (topic/partition/offset/timestamp)."""
    parsed = kafka_df.withColumn(
        "__v", F.from_json(F.col("value").cast("string"), value_schema))
    meta = (["topic", "partition", "offset", "timestamp"]
            if include_metadata else [])
    return parsed.select(
        F.col("key").cast("string").alias("key"), "__v.*", *meta)


def kafka_sink_frame(df: DataFrame, key_col: str | None,
                     value_cols: list[str]) -> DataFrame:
    """FlinkKafkaProducer serialization analog: pack value columns into
    a JSON ``value`` (and an optional ``key``) — the frame shape the
    kafka sink requires.  Pure column ops, broker-free testable."""
    out = df.withColumn(
        "value", F.to_json(F.struct(*[F.col(c) for c in value_cols])))
    if key_col is not None:
        out = out.withColumn("key", F.col(key_col).cast("string"))
        return out.select("key", "value")
    return out.select("value")
