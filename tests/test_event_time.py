"""Regression: events.ts must normalize to TimestampType on every load path.

The events parquet stores ts as INT64 TIMESTAMP(NANOS).  Spark surfaces
that as bigint (legacy conf honored) or timestamp_ntz (Spark 4.x native);
``withWatermark`` requires plain TIMESTAMP, so both batch and streaming
readers must coerce (CORRECTNESS_r02: all 6 driver failures were this).
"""

from flink_release_1_10_0_spark import catalog
from flink_release_1_10_0_spark.streaming.core import read_stream_table

SF_DIR = "/root/testdata/sf0.001"


def test_batch_load_ts_is_timestamp(spark):
    df = catalog.load(spark, SF_DIR, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_stream_read_ts_is_timestamp_and_watermarkable(spark):
    sdf = read_stream_table(spark, SF_DIR, "events")
    assert dict(sdf.dtypes)["ts"] == "timestamp"
    # withWatermark raised EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE pre-fix
    sdf.withWatermark("ts", "10 minutes")


def test_batch_and_stream_ts_values_agree(spark):
    batch = catalog.load(spark, SF_DIR, "events").select("event_id", "ts")
    from flink_release_1_10_0_spark.streaming.core import run_to_completion
    stream = run_to_completion(
        read_stream_table(spark, SF_DIR, "events").select("event_id", "ts"))
    b = {r.event_id: r.ts for r in batch.limit(50).collect()}
    s = {r.event_id: r.ts for r in stream.collect()}
    assert b and all(s[k] == v for k, v in b.items())
