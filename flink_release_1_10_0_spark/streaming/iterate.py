"""Iteration analogs: BulkIteration, streaming feedback loops, DeltaIteration.

Reference:
- ``flink-streaming-java/.../api/datastream/IterativeStream.java`` (via
  ``DataStream.java:214`` ``iterate()``): a feedback edge — the loop
  body splits each round's rows into a feedback stream (re-enters the
  loop head via ``closeWith``) and a forward output stream.
- ``flink-java/.../operators/IterativeDataSet.java`` (``DataSet.iterate``)
  — BulkIteration: apply the step a fixed number of times (or until a
  termination criterion dataset is empty).
- ``flink-java/.../operators/DeltaIteration.java``
  (``DataSet.iterateDelta``) — a keyed *solution set* updated in place
  by each round's *delta*, plus a shrinking *workset*; terminates when
  the workset is empty.  Flink's canonical example is incremental
  single-source shortest paths.

Spark-first shape: Spark has no cyclic dataflow, so the loop lives in
the driver while ALL data movement stays distributed — each round is a
normal DataFrame plan, and ``localCheckpoint(eager=True)`` truncates the
otherwise-exponential lineage (the same guard ``operators/graph.py``
uses for pointer-doubling CC).  The driver holds only loop counters and
an ``isEmpty()`` probe per round (an O(1)-row existence check, not a
collect); at 100 TB each round is one distributed job and the feedback
set shrinks monotonically for delta iterations, so the pattern holds at
cluster scale exactly like Flink's own per-superstep barriers.
"""

from __future__ import annotations

from typing import Callable, Tuple

from pyspark.sql import DataFrame


def _pin(df: DataFrame) -> DataFrame:
    """Truncate lineage between rounds (exponential-plan hazard)."""
    return df.localCheckpoint(eager=True)


def iterate_bulk(df: DataFrame,
                 step: Callable[[DataFrame], DataFrame],
                 n_iterations: int) -> DataFrame:
    """BulkIteration (IterativeDataSet.java): ``step`` applied exactly
    ``n_iterations`` times."""
    cur = df
    for _ in range(n_iterations):
        cur = _pin(step(cur))
    return cur


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
    outputs: list[DataFrame] = []
    cur = df
    for _ in range(max_iterations):
        feedback, out = step(cur)
        outputs.append(_pin(out))
        feedback = _pin(feedback)
        if feedback.isEmpty():
            break
        cur = feedback
    result = outputs[0]
    for o in outputs[1:]:
        result = result.unionByName(o)
    return result


def iterate_delta(
        solution: DataFrame,
        workset: DataFrame,
        step: Callable[[DataFrame, DataFrame], Tuple[DataFrame, DataFrame]],
        key_cols: list[str],
        max_iterations: int = 1000) -> DataFrame:
    """DeltaIteration (DeltaIteration.java): ``step(solution, workset)
    -> (delta, next_workset)``.

    Each round the keyed ``delta`` replaces matching solution-set rows
    (join-on-key upsert — the solution set's "merge" contract); the
    loop ends when the workset is empty.  Only the delta and workset
    shuffle per round; the solution set is touched once per round by
    the keyed anti-join, matching the reference's partitioned
    solution-set state.
    """
    solution = _pin(solution)
    workset = _pin(workset)
    for _ in range(max_iterations):
        if workset.isEmpty():
            break
        delta, next_ws = step(solution, workset)
        delta = _pin(delta)
        solution = _pin(
            solution.join(delta.select(*key_cols), on=key_cols,
                          how="left_anti").unionByName(delta))
        workset = _pin(next_ws)
    return solution
