"""Kafka wrapper tests — option mapping and (de)serialization column
logic, broker-free (``sources/kafka.py``)."""

from __future__ import annotations

import json

import pytest

from flink_release_1_10_0_spark.sources.kafka import (
    decode_json_value, kafka_options, kafka_sink_frame)


def test_options_earliest_with_group():
    opts = kafka_options("k1:9092,k2:9092", topics=["orders", "events"],
                         starting_offsets="earliest", group_id="g7")
    assert opts["kafka.bootstrap.servers"] == "k1:9092,k2:9092"
    assert opts["subscribe"] == "orders,events"
    assert opts["startingOffsets"] == "earliest"
    assert opts["kafka.group.id"] == "g7"
    assert opts["failOnDataLoss"] == "true"


def test_options_specific_offsets_json():
    opts = kafka_options("k:9092", topics="orders",
                         starting_offsets={"orders": {"0": 42, "1": -1}})
    assert json.loads(opts["startingOffsets"]) == {"orders": {"0": 42, "1": -1}}


def test_options_timestamp_falls_back_to_latest():
    """setStartFromTimestamp: partitions with no record after the
    timestamp start from latest (Flink semantics)."""
    opts = kafka_options("k:9092", topic_pattern="orders-.*",
                         starting_timestamp_ms=1700000000000)
    assert opts["subscribePattern"] == "orders-.*"
    assert opts["startingTimestamp"] == "1700000000000"
    assert opts["startingOffsetsByTimestampStrategy"] == "latest"


def test_options_validation():
    with pytest.raises(ValueError):
        kafka_options("k:9092")  # neither topics nor pattern
    with pytest.raises(ValueError):
        kafka_options("k:9092", topics="a", topic_pattern="b")  # both
    with pytest.raises(ValueError):
        kafka_options("k:9092", topics="a", starting_offsets="yesterday")


def test_decode_json_value_roundtrip(spark):
    """Binary JSON value -> typed columns, like the reference's
    JSONKeyValueDeserializationSchema (batch DF stands in for the
    kafka frame — identical column logic)."""
    from pyspark.sql import functions as F

    frame = spark.createDataFrame(
        [("u1", '{"amount": 12.5, "item": "x"}', "orders", 0, 7)],
        "key string, value string, topic string, partition int, offset long",
    ).withColumn("value", F.col("value").cast("binary")) \
     .withColumn("timestamp", F.current_timestamp())
    out = decode_json_value(frame, "amount double, item string")
    row = out.collect()[0]
    assert (row.key, row.amount, row.item, row.topic, row.offset) == \
        ("u1", 12.5, "x", "orders", 7)


def test_kafka_sink_frame_packs_json(spark):
    df = spark.createDataFrame([(7, 1.5, "a")], "id bigint, v double, s string")
    out = kafka_sink_frame(df, key_col="id", value_cols=["v", "s"])
    row = out.collect()[0]
    assert row.key == "7"
    assert json.loads(row.value) == {"v": 1.5, "s": "a"}
    assert out.columns == ["key", "value"]


class _SpyReader:
    """Stand-in for DataStreamReader capturing exactly the format/option
    calls the kafka wiring would send to the JVM."""

    def __init__(self):
        self.fmt = None
        self.opts = {}

    def format(self, f):
        self.fmt = f
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self


def test_reader_construction_contract():
    """Contract test for the reader plan (no broker in this env): the
    FlinkKafkaConsumer-style config must reach the reader as the exact
    spark-kafka option set — format, subscribe, startingOffsets,
    rate limit, failOnDataLoss."""
    from flink_release_1_10_0_spark.sources.kafka import configure_kafka_reader

    spy = configure_kafka_reader(
        _SpyReader(), bootstrap_servers="k1:9092",
        topics=["orders", "events"], starting_offsets="earliest",
        group_id="g1", max_offsets_per_trigger=50_000,
        fail_on_data_loss=False)
    assert spy.fmt == "kafka"
    assert spy.opts == {
        "kafka.bootstrap.servers": "k1:9092",
        "subscribe": "orders,events",
        "startingOffsets": "earliest",
        "kafka.group.id": "g1",
        "maxOffsetsPerTrigger": "50000",
        "failOnDataLoss": "false",
    }


def test_kafka_source_raises_clear_error_without_package(spark):
    """In an env without the kafka package, kafka_source must fail with
    the actionable classpath message, not a raw AnalysisException."""
    import pytest

    from flink_release_1_10_0_spark.sources.kafka import kafka_source

    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka_source(spark, bootstrap_servers="k:9092", topics="t")
