"""Structured Streaming harness: run a stream to completion over bounded
input and return the result as a batch DataFrame.

Reference analog: the reference's ITCase harnesses feed bounded element
streams through the streaming runtime and collect the sink
(``StreamingTestBase`` / planner-blink ``runtime/stream/sql`` tests,
SURVEY.md §5.2-5.3).  Here: ``readStream`` over the parquet file,
``trigger(availableNow=True)`` (processes all available input, including
the watermark-flush no-data batch, then stops) into a memory sink.

In production the same pipeline definitions run unbounded — swap the
bounded source for kafka/file-monitor and the memory sink for
parquet/kafka + checkpointing; the transformation graph is identical.
"""

from __future__ import annotations

import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

_counter = itertools.count()


def read_stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Streaming scan of a testdata table (StreamExecTableSourceScan
    analog).  Handles the events table's INT64-nanos timestamp the same
    way the batch catalog does."""
    from ..catalog import normalize_event_time

    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    if os.path.isdir(path):
        # table stored as a directory of part files (e.g. the scale
        # sweep's synthesized tiers): stream the directory itself
        sdf = spark.readStream.schema(schema).parquet(path)
    else:
        # FileStreamSource needs a directory; select just this table's
        # single file out of the testdata dir
        sdf = (spark.readStream.schema(schema)
               .option("pathGlobFilter", f"{name}.parquet")
               .parquet(sf_dir))
    if name == "events":
        sdf = normalize_event_time(sdf)
    return sdf


def run_to_completion(result: DataFrame, output_mode: str = "append") -> DataFrame:
    """Execute a streaming DataFrame to completion into a memory sink;
    returns the collected sink as a batch DataFrame."""
    spark = result.sparkSession
    qname = f"_stream_sink_{next(_counter)}"
    ckpt = tempfile.mkdtemp(prefix="spark_graft_ckpt_")
    q = (result.writeStream
         .format("memory")
         .queryName(qname)
         .outputMode(output_mode)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(qname)
