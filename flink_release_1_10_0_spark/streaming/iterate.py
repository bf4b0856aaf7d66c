"""Streaming feedback-loop iteration (IterativeStream analog).

Reference: ``flink-streaming-java/.../api/datastream/IterativeStream
.java`` (via ``DataStream.java:214`` ``iterate()``): a feedback edge —
the loop body splits each round's rows into a feedback stream
(re-enters the loop head via ``closeWith``) and a forward output
stream.

The DataSet-side iteration facades (``DataSet.iterate`` bulk loops and
``DataSet.iterateDelta`` keyed solution-set updates) live in
``operators/iterate.py`` — this module adds only the feedback-split
shape the streaming API has and the batch API does not.

Spark-first shape: Spark has no cyclic dataflow, so the loop lives in
the driver while ALL data movement stays distributed — each round is a
normal DataFrame plan, ``localCheckpoint(eager=True)`` truncates the
otherwise-exponential lineage, and superseded round state is unpersisted
explicitly (same discipline as ``operators/iterate.py``).  The driver
holds only loop counters and an ``isEmpty()`` probe per round; at
100 TB each round is one distributed job and the feedback set is
whatever fraction of rows still circulates — the same per-superstep
cost model as the reference's feedback edge.
"""

from __future__ import annotations

from typing import Callable, Tuple

from pyspark.sql import DataFrame

from flink_release_1_10_0_spark.operators.iterate import (  # noqa: F401
    bulk_iterate,
    delta_iterate,
)


def iterate_feedback(
        df: DataFrame,
        step: Callable[[DataFrame], Tuple[DataFrame, DataFrame]],
        max_iterations: int = 1000) -> DataFrame:
    """IterativeStream analog: ``step(rows) -> (feedback, output)``.

    ``feedback`` re-enters the loop head (``closeWith``), ``output``
    leaves the loop; returns the union of every round's output.  Stops
    when the feedback edge is empty or after ``max_iterations`` (the
    analog of the iteration's idle-timeout shutdown).
    """
    if max_iterations < 1:
        raise ValueError(
            f"max_iterations must be >= 1, got {max_iterations}")
    outputs: list[DataFrame] = []
    cur = df.localCheckpoint(eager=True)
    for _ in range(max_iterations):
        feedback, out = step(cur)
        outputs.append(out.localCheckpoint(eager=True))
        feedback = feedback.localCheckpoint(eager=True)
        cur.unpersist()
        cur = feedback
        if feedback.isEmpty():
            break
    cur.unpersist()
    result = outputs[0]
    for o in outputs[1:]:
        result = result.unionByName(o)
    return result
