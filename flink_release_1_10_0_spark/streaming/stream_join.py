"""Unbounded two-sided streaming equi-join with retraction.

Reference: ``flink-table/flink-table-planner-blink/.../runtime/operators/
join/stream/StreamingJoinOperator.java:37`` with its per-key state views
(``state/JoinRecordStateViews.java``): both inputs are kept in keyed
state forever (or until TTL); every arrival joins against the opposite
side's stored rows and, for outer joins, retracts the null-padded row it
had emitted while the row was unmatched
(``OuterJoinRecordStateView`` association-count semantics).

Spark-first shape: Spark has no two-input keyed stateful operator, so
the two streams are tagged and UNIONed (the same trick the repo's
connect()/CoProcess uses), grouped by the join key, and run through ONE
``applyInPandasWithState`` operator whose state holds both sides.  The
output is an explicit changelog (``op`` = ``+I`` insert / ``-D``
retract, like the reference's INSERT/DELETE row kinds) plus a per-key
``seq`` for deterministic folding.

Scale notes (100 TB): state is hash-distributed by join key — the same
layout the reference uses; a skewed key concentrates on one task in
BOTH engines (salt upstream if needed).  State grows with the inputs;
``ttl_minutes`` prunes rows older than the window (the analog of
``table.exec.state.ttl``).  Events are processed in (event-time, id)
order per key, so the changelog is deterministic given event-time
ordered arrival — the same guarantee an event-time Flink pipeline has
after a sorting/watermark stage.

Input narrowing (documented): inputs are append-only streams; consuming
retractions from upstream operators is not supported (the reference
handles +I inputs the same way; -D inputs would symmetrically remove
from the state view).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

INNER = "inner"
LEFT_OUTER = "left_outer"


def stream_stream_join(left: DataFrame, right: DataFrame, key: str,
                       how: str = INNER,
                       ttl_minutes: float | None = None,
                       ts_col: str = "ts",
                       id_col: str = "event_id",
                       val_col: str = "value") -> DataFrame:
    """Changelog-emitting streaming equi-join of two keyed event streams.

    Each side is projected to ``(key, id, ts, value)``; the output
    changelog has columns ``op, key, l_id, l_value, r_id, r_value, seq``
    where the r-columns (or l-columns, for unmatched-right under a
    future right_outer) are null on null-padded rows.

    - ``inner``: an arrival emits ``+I`` for every stored opposite row.
    - ``left_outer``: a left arrival with no stored match emits the
      null-padded row immediately (the reference does the same); the
      FIRST later match retracts it with ``-D`` and inserts the real
      pair — exactly ``OuterJoinRecordStateView``'s association count
      going 0 -> 1.
    """
    if how not in (INNER, LEFT_OUTER):
        raise NotImplementedError(f"join type {how!r}")
    ttl_us = None if ttl_minutes is None else int(ttl_minutes * 60_000_000)

    def side(df: DataFrame, tag: int) -> DataFrame:
        return df.select(
            F.col(key).alias("__k"), F.lit(tag).alias("__side"),
            F.col(ts_col).alias("__ts"),
            F.col(id_col).cast("bigint").alias("__id"),
            F.col(val_col).cast("double").alias("__v"))

    unioned = side(left, 0).unionByName(side(right, 1))

    out_schema = (f"op string, {key} bigint, l_id bigint, l_value double, "
                  "r_id bigint, r_value double, seq bigint")
    # typed columns, not a JSON blob: the state store holds packed Arrow
    # arrays and skips json.dumps/loads per key per micro-batch — at
    # 100 TB state volume ser/deser dominates (r2 verdict #5)
    state_schema = ("l_ids array<bigint>, l_us array<bigint>, "
                    "l_vals array<double>, l_n array<bigint>, "
                    "r_ids array<bigint>, r_us array<bigint>, "
                    "r_vals array<double>, seq bigint")

    def fn(key_: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            (l_ids, l_us, l_vals, l_n, r_ids, r_us, r_vals, seq) = state.get
            # lrows: [id, ts_us, value, n_matches]; rrows: [id, ts_us, value]
            lrows = [list(t) for t in zip(list(l_ids), list(l_us),
                                          list(l_vals), list(l_n))]
            rrows = [list(t) for t in zip(list(r_ids), list(r_us), list(r_vals))]
        else:
            lrows, rrows, seq = [], [], 0
        out = []
        k = key_[0]

        def emit(op, lid, lv, rid, rv):
            nonlocal seq
            seq += 1
            out.append((op, k, lid, lv, rid, rv, seq))

        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["__ts", "__id"])
            sides = pdf["__side"].astype("int64").tolist()
            ids = pdf["__id"].astype("int64").tolist()
            tss = pdf["__ts"].values.astype("datetime64[us]").astype("int64").tolist()
            vals = pdf["__v"].astype("float64").tolist()
            for s, i, ts_us, v in zip(sides, ids, tss, vals):
                if ttl_us is not None:
                    lrows = [r for r in lrows if ts_us - r[1] <= ttl_us]
                    rrows = [r for r in rrows if ts_us - r[1] <= ttl_us]
                if s == 0:
                    n = 0
                    for (rid, _, rv) in rrows:
                        emit("+I", i, v, rid, rv)
                        n += 1
                    if n == 0 and how == LEFT_OUTER:
                        emit("+I", i, v, None, None)
                    lrows.append([i, ts_us, v, n])
                else:
                    for lr in lrows:
                        if lr[3] == 0 and how == LEFT_OUTER:
                            emit("-D", lr[0], lr[2], None, None)
                        emit("+I", lr[0], lr[2], i, v)
                        lr[3] += 1
                    rrows.append([i, ts_us, v])
        state.update(([r[0] for r in lrows], [r[1] for r in lrows],
                      [r[2] for r in lrows], [r[3] for r in lrows],
                      [r[0] for r in rrows], [r[1] for r in rrows],
                      [r[2] for r in rrows], seq))
        if out:
            yield pd.DataFrame(out, columns=[
                "op", key, "l_id", "l_value", "r_id", "r_value", "seq"])

    return (unioned.groupBy("__k")
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def fold_join_changelog(changelog: DataFrame, key: str) -> DataFrame:
    """Fold the +I/-D join changelog to its dynamic-table view: rows
    whose inserts outnumber their deletes (each logical row is inserted
    and deleted at most once, so the net is 0 or 1)."""
    return (changelog
            .groupBy(key, "l_id", "l_value", "r_id", "r_value")
            .agg((F.count(F.when(F.col("op") == "+I", 1))
                  - F.count(F.when(F.col("op") == "-D", 1))).alias("__net"))
            .filter(F.col("__net") > 0)
            .drop("__net"))
