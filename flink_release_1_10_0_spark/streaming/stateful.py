"""Arbitrary keyed-state streaming operators via ``applyInPandasWithState``.

These are the reference operators with NO declarative Spark equivalent
(SURVEY.md §7 step 5 — "the hard 20%"):

- dedup keep-last:  ``runtime/operators/deduplicate/
  DeduplicateKeepLastRowFunction.java:34`` — one latest row per key.
- streaming top-N:  ``runtime/operators/rank/AppendOnlyTopNFunction.java:46``
  — maintain the N best rows per key as events arrive.
- CEP A-followed-by-B: ``flink-libraries/flink-cep/.../nfa/NFA.java:85`` /
  ``CepOperator.java:82`` — a 2-state NFA (begin A -> followedBy B,
  within T), the core MATCH_RECOGNIZE pattern shape.

State is a compact per-key summary (the current winner set / pending
partial matches), never the full history — the same bounded-state
contract the reference's operators guarantee.  At scale, state lives in
the state store (RocksDB provider), partitioned by the group key.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout



def _prune(df: DataFrame, cols: list[str]) -> DataFrame:
    """Project to the columns the state function actually reads BEFORE
    the keyed shuffle.  Catalyst cannot prune columns through an opaque
    Python state function, so without this the full event payload
    (including wide text columns) rides the exchange."""
    want = [c for c in dict.fromkeys(cols) if c in df.columns]
    return df.select(*want)

def _ts_us(pdf: pd.DataFrame, col: str = "ts") -> list[int]:
    """Event-time column as integer microseconds, one plain Python list.

    Per-event logic is inherent to these operators (NFA edges, version
    lookups), but per-event *pandas* overhead is not: extract each column
    once per Arrow batch (``tolist``) and walk plain lists — the pattern
    nfa.py uses — instead of ``iterrows`` (~10-100x slower row boxing)."""
    return pdf[col].values.astype("datetime64[us]").astype("int64").tolist()


def _i64(pdf: pd.DataFrame, col: str) -> list[int]:
    return pdf[col].astype("int64").tolist()


def dedup_keep_last(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Latest event per key by (ts, event_id).  Emits the current winner
    every batch (update semantics)."""
    out_schema = "user_id bigint, event_id bigint, event_type string, value double, ts timestamp"
    state_schema = "event_id bigint, event_type string, value double, ts timestamp"

    def fn(key_: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        best = state.get if state.exists else None  # (event_id, type, value, ts_us)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            row = pdf.iloc[-1]
            cand = (int(row["event_id"]), str(row["event_type"]),
                    float(row["value"]), row["ts"])
            if best is None or (cand[3], cand[0]) > (best[3], best[0]):
                best = cand
        if best is not None:
            state.update(best)
            yield pd.DataFrame({
                "user_id": [key_[0]], "event_id": [best[0]],
                "event_type": [best[1]], "value": [best[2]], "ts": [best[3]]})

    return (_prune(events, [key, "ts", "event_id", "event_type", "value"]).groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


def topn_per_key(events: DataFrame, n: int = 3, key: str = "user_id") -> DataFrame:
    """Streaming top-N per key ordered by (value desc, event_id asc);
    emits the full current top-N set each batch."""
    out_schema = "user_id bigint, event_id bigint, value double, rn bigint"
    state_schema = "ids array<bigint>, vals array<double>"

    def fn(key_: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, vals = state.get
            entries = list(zip(list(ids), list(vals)))
        else:
            entries = []
        changed = False
        for pdf in pdfs:
            if len(pdf):
                # vectorized: extend with the whole Arrow batch at once —
                # never iterate rows in Python (hot keys make that the
                # slowest loop in the pipeline)
                entries.extend(zip(pdf["event_id"].astype("int64").tolist(),
                                   pdf["value"].astype("float64").tolist()))
                changed = True
        if changed or not state.exists:
            entries.sort(key=lambda e: (-e[1], e[0]))
            entries = entries[:n]
            state.update(([e[0] for e in entries], [e[1] for e in entries]))
            yield pd.DataFrame({
                "user_id": [key_[0]] * len(entries),
                "event_id": [e[0] for e in entries],
                "value": [e[1] for e in entries],
                "rn": list(range(1, len(entries) + 1))})

    return (_prune(events, [key, "event_id", "value"]).groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


def cep_followed_by(events: DataFrame, first_type: str, then_type: str,
                    within_minutes: float, key: str = "user_id") -> DataFrame:
    """CEP pattern ``begin(A).followedBy(B).within(T)`` per key
    (Pattern.java:50-542 subset): each A matches the first B with
    ``A.ts < B.ts <= A.ts + T``; a B can close multiple pending As
    (allowCombinations semantics); matched As are discarded
    (AFTER MATCH SKIP PAST A)."""
    out_schema = "user_id bigint, first_id bigint, then_id bigint, first_ts timestamp, then_ts timestamp"
    state_schema = "pending_ids array<bigint>, pending_us array<bigint>"
    within_us = int(within_minutes * 60_000_000)

    def fn(key_: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            pids, pus = state.get
            pending = list(zip(list(pids), list(pus)))  # (event_id, ts_micros)
        else:
            pending = []
        matches = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for et, eid, ts_us in zip(pdf["event_type"].tolist(),
                                      _i64(pdf, "event_id"), _ts_us(pdf)):
                if et == first_type:
                    # prune on A arrivals too: an expired A can never match
                    # a later B (event-time order), so state stays bounded
                    # by the window even when no B's flow
                    pending = [(aid, aus) for (aid, aus) in pending
                               if ts_us - aus <= within_us]
                    pending.append((eid, ts_us))
                elif et == then_type:
                    still = []
                    for (aid, aus) in pending:
                        if 0 < ts_us - aus <= within_us:
                            matches.append((key_[0], aid, eid, aus, ts_us))
                        elif ts_us - aus <= 0:
                            still.append((aid, aus))  # same-instant A: not expired
                    pending = still
        state.update(([p[0] for p in pending], [p[1] for p in pending]))
        if matches:
            yield pd.DataFrame({
                "user_id": [m[0] for m in matches],
                "first_id": [m[1] for m in matches],
                "then_id": [m[2] for m in matches],
                "first_ts": pd.to_datetime([m[3] for m in matches], unit="us"),
                "then_ts": pd.to_datetime([m[4] for m in matches], unit="us")})

    return (_prune(events, [key, "ts", "event_id", "event_type"]).groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def count_tumble_window(events: DataFrame, n: int = 10,
                        key: str = "user_id") -> DataFrame:
    """Count-based tumbling window per key (CountTumblingWindowAssigner +
    ``KeyedStream.java:652`` countWindow): emit one aggregate row each
    time ``n`` events have arrived for a key; the trailing partial window
    stays in state and is never emitted.

    Rows are ordered by (ts, event_id) within each micro-batch; money is
    accumulated as integer cents so the running sum is exact.
    """
    out_schema = "user_id bigint, w_id bigint, n_events bigint, sum_value double"
    state_schema = "next_w bigint, part_n bigint, part_cents bigint"

    def fn(key_: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        next_w, part_n, part_cents = state.get if state.exists else (0, 0, 0)
        out = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            for v in pdf["value"].astype("float64").tolist():
                part_n += 1
                part_cents += int(round(float(v) * 100))
                if part_n == n:
                    out.append((key_[0], next_w, n, part_cents / 100.0))
                    next_w += 1
                    part_n = part_cents = 0
        state.update((next_w, part_n, part_cents))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "w_id", "n_events", "sum_value"])

    return (_prune(events, [key, "ts", "event_id", "value"]).groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def changelog_count(events: DataFrame, key: str = "event_type") -> DataFrame:
    """Changelog/retraction emission for a streaming COUNT aggregate —
    the reference's update-as-retraction protocol (``BaseRow`` 1-byte
    header ``ACCUMULATE_MSG``/``RETRACT_MSG``,
    ``BaseRowUtil.java:34-39``; retraction inference
    ``StreamExecRetractionRules``).

    Emits an append-only changelog: ``+I`` on first value for a key,
    then ``-U`` (retract old) / ``+U`` (accumulate new) pairs as the
    count advances per micro-batch.  ``seq`` is a per-key monotonic
    sequence so a downstream materializer can fold the log back into a
    table (latest non-retract row per key wins).
    """
    out_schema = f"op string, {key} string, cnt bigint, seq bigint"
    state_schema = "cnt bigint, seq bigint"

    def fn(key_: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        old, seq = state.get if state.exists else (None, 0)
        added = sum(len(p) for p in pdfs)
        if added:
            new = (old or 0) + added
            rows = []
            if old is None:
                rows.append(("+I", key_[0], new, seq + 1))
                seq += 1
            else:
                rows.append(("-U", key_[0], old, seq + 1))
                rows.append(("+U", key_[0], new, seq + 2))
                seq += 2
            state.update((new, seq))
            yield pd.DataFrame(rows, columns=["op", key, "cnt", "seq"])

    return (_prune(events, [key]).groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def temporal_join(events: DataFrame, build_type: str, probe_type: str,
                  key: str = "user_id",
                  retention_minutes: float | None = None) -> DataFrame:
    """Streaming temporal / as-of join
    (``runtime/operators/join/temporal/TemporalRowTimeJoinOperator.java:71``,
    ``Table.java:139`` createTemporalTableFunction): rows of ``build_type``
    form a versioned table per key; each ``probe_type`` row joins the
    latest build version with ``version_ts <= probe_ts``.

    Both sides arrive on ONE keyed stream (the union-tagged layout); the
    operator keeps the version history per key in state, processes each
    micro-batch in event-time order, and emits probe matches eagerly.

    ``retention_minutes`` is the idle-state-retention analog
    (``CleanupState.java`` / the reference's watermark-driven version
    pruning): versions older than ``max_seen_ts - retention`` are
    dropped, always keeping the newest at-or-before the cutoff — for
    in-order probes the emitted results are identical, and per-key state
    is bounded by the retention window.
    """
    out_schema = ("user_id bigint, probe_id bigint, probe_ts timestamp, "
                  "version_id bigint, version_ts timestamp, version_value double")
    state_schema = "vids array<bigint>, vus array<bigint>, vvals array<double>"

    def fn(key_: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            vids, vus, vvals = state.get
            versions = sorted(zip(list(vus), list(vids), list(vvals)))
        else:
            versions = []  # (ts_us, event_id, value) ascending
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for et, eid, ts_us, val in zip(pdf["event_type"].tolist(),
                                           _i64(pdf, "event_id"), _ts_us(pdf),
                                           pdf["value"].astype("float64").tolist()):
                if et == build_type:
                    versions.append((ts_us, eid, val))
                    versions.sort()
                elif et == probe_type:
                    # latest version at-or-before the probe: rightmost <= ts
                    best = None
                    for v in versions:
                        if v[0] <= ts_us:
                            best = v
                        else:
                            break
                    if best is not None:
                        out.append((key_[0], eid, ts_us, best[1], best[0], best[2]))
        if retention_minutes is not None and versions:
            cutoff = versions[-1][0] - int(retention_minutes * 60_000_000)
            # newest version at-or-before the cutoff must survive: an
            # in-retention probe may still reference it
            idx = 0
            for i, v in enumerate(versions):
                if v[0] <= cutoff:
                    idx = i
            versions = versions[idx:]
        state.update(([v[1] for v in versions], [v[0] for v in versions],
                      [v[2] for v in versions]))
        if out:
            df = pd.DataFrame(out, columns=[
                "user_id", "probe_id", "probe_ts",
                "version_id", "version_ts", "version_value"])
            df["probe_ts"] = pd.to_datetime(df["probe_ts"], unit="us")
            df["version_ts"] = pd.to_datetime(df["version_ts"], unit="us")
            yield df

    return (_prune(events, [key, "ts", "event_id", "event_type", "value"])
            .filter(F.col("event_type").isin(build_type, probe_type))
            .groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def cep_one_or_more(events: DataFrame, first_type: str, then_type: str,
                    within_minutes: float, key: str = "user_id") -> DataFrame:
    """CEP ``begin(A).oneOrMore().followedBy(B).within(T)``
    (``Pattern.java`` oneOrMore/greedy + NFA SHARED_BUFFER semantics,
    scoped to the greedy match): when a B arrives, all pending A's within
    the window form ONE greedy match — emitted with the count of A's and
    the first/last A timestamps; matched A's are consumed
    (AFTER MATCH SKIP PAST LAST ROW).
    """
    out_schema = ("user_id bigint, then_id bigint, then_ts timestamp, "
                  "n_first bigint, first_ts timestamp, last_ts timestamp")
    state_schema = "pend_us array<bigint>"
    within_us = int(within_minutes * 60_000_000)

    def fn(key_: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        pending = sorted(state.get[0]) if state.exists else []  # A ts_us asc
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for et, eid, ts_us in zip(pdf["event_type"].tolist(),
                                      _i64(pdf, "event_id"), _ts_us(pdf)):
                if et == first_type:
                    # window-bounded state even with no B traffic
                    pending = [a for a in pending if ts_us - a <= within_us]
                    pending.append(ts_us)
                elif et == then_type:
                    pending = [a for a in pending if ts_us - a <= within_us]
                    in_win = [a for a in pending if 0 < ts_us - a <= within_us]
                    if in_win:
                        out.append((key_[0], eid, ts_us, len(in_win),
                                    min(in_win), max(in_win)))
                        pending = [a for a in pending if not (0 < ts_us - a <= within_us)]
        state.update((pending,))
        if out:
            df = pd.DataFrame(out, columns=[
                "user_id", "then_id", "then_ts", "n_first", "first_ts", "last_ts"])
            for c in ("then_ts", "first_ts", "last_ts"):
                df[c] = pd.to_datetime(df[c], unit="us")
            yield df

    return (_prune(events, [key, "ts", "event_id", "event_type"]).groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def over_running_agg(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Streaming OVER aggregate, unbounded-preceding ROWS frame
    (``StreamExecOverAggregate.scala:56``; runtime
    ``runtime/operators/over/`` RowTime*UnboundedPrecedingFunction):
    each arriving row is emitted once, annotated with the running
    SUM(value)/COUNT(*) over all rows of its key so far, in event-time
    order.  Money accumulates as integer cents — exact at any rescale.
    """
    out_schema = ("user_id bigint, event_id bigint, ts timestamp, "
                  "running_sum double, running_n bigint")
    state_schema = "cents bigint, n bigint"

    def fn(key_: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        cents, n = state.get if state.exists else (0, 0)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for eid, ts_us, val in zip(_i64(pdf, "event_id"), _ts_us(pdf),
                                       pdf["value"].astype("float64").tolist()):
                cents += int(round(val * 100))
                n += 1
                out.append((key_[0], eid, ts_us, cents / 100.0, n))
        state.update((cents, n))
        if out:
            df = pd.DataFrame(out, columns=[
                "user_id", "event_id", "ts", "running_sum", "running_n"])
            df["ts"] = pd.to_datetime(df["ts"], unit="us")
            yield df

    return (_prune(events, [key, "ts", "event_id", "value"]).groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def cep_not_followed_by(events: DataFrame, first_type: str, then_type: str,
                        within_minutes: float, key: str = "user_id",
                        watermark_delay: str = "10 minutes") -> DataFrame:
    """CEP absence detection: ``begin(A).notFollowedBy(B).within(T)``
    (``Pattern.java`` notFollowedBy + WITHIN; NFA pending-state timeout).

    An A row is emitted only when its window ``(A.ts, A.ts + T]`` closes
    — the event-time watermark passes the deadline — without a matching
    B for the same key.  Uses real event-time timers
    (``GroupStateTimeout.EventTimeTimeout`` + ``setTimeoutTimestamp``),
    the Spark analog of the reference's timer service
    (``KeyedProcessFunction`` timers / ``CepOperator`` NFA timeouts).
    """
    out_schema = "user_id bigint, first_id bigint, first_ts timestamp"
    state_schema = "pids array<bigint>, pus array<bigint>"
    within_us = int(within_minutes * 60_000_000)

    def fn(key_: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            pids, pus = state.get
            pending = sorted(zip(list(pus), list(pids)))  # (ts_us, id)
        else:
            pending = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                pdf = pdf.sort_values(["ts", "event_id"])
                for et, eid, ts_us in zip(pdf["event_type"].tolist(),
                                          _i64(pdf, "event_id"), _ts_us(pdf)):
                    if et == first_type:
                        pending.append((ts_us, eid))
                    elif et == then_type:
                        pending = [(aus, aid) for (aus, aid) in pending
                                   if not (0 < ts_us - aus <= within_us)]
        # emit every pending A whose deadline the watermark has passed
        wm_us = state.getCurrentWatermarkMs() * 1000
        expired = [(aus, aid) for (aus, aid) in pending if aus + within_us <= wm_us]
        pending = [(aus, aid) for (aus, aid) in pending if aus + within_us > wm_us]
        if pending:
            next_deadline_ms = min(aus + within_us for aus, _ in pending) // 1000
            state.update(([p[1] for p in pending], [p[0] for p in pending]))
            state.setTimeoutTimestamp(max(next_deadline_ms,
                                          state.getCurrentWatermarkMs() + 1))
        elif state.exists:
            state.remove()
        else:
            state.update(([], []))
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 60_000)
        if expired:
            yield pd.DataFrame({
                "user_id": [key_[0]] * len(expired),
                "first_id": [e[1] for e in expired],
                "first_ts": pd.to_datetime([e[0] for e in expired], unit="us")})

    return (_prune(events, [key, "ts", "event_id", "event_type"])
            .withWatermark("ts", watermark_delay)
            .groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.EventTimeTimeout))


def temporal_sort(events: DataFrame, key: str = "user_id",
                  watermark_delay: str = "10 minutes") -> DataFrame:
    """Event-time sorted emission (``StreamExecTemporalSort.scala`` /
    ``runtime/operators/sort/RowTimeSortOperator.java``): buffer arriving
    rows per key; once the watermark passes a row's timestamp, emit the
    buffered prefix in (ts, event_id) order, tagged with a per-key
    emission sequence number ``seq`` — the observable proof of ordered
    emission.  Rows beyond the final watermark stay buffered (never
    emitted), exactly the reference operator's contract.

    State is the out-of-order tail only (rows newer than the watermark),
    bounded by the watermark delay — not the full history.  Keyed, so it
    scales horizontally; the reference's *global* temporal sort is
    parallelism-1 by construction and maps to a single key here.
    """
    out_schema = "user_id bigint, event_id bigint, ts timestamp, seq bigint"
    state_schema = "emitted bigint, bids array<bigint>, bus array<bigint>"

    def fn(key_: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            emitted, bids, bus = state.get
            buf = list(zip(list(bus), list(bids)))  # (ts_us, event_id)
        else:
            emitted, buf = 0, []
        if not state.hasTimedOut:
            for pdf in pdfs:
                buf.extend(zip(_ts_us(pdf), _i64(pdf, "event_id")))
        buf.sort()
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000
        emit = [b for b in buf if b[0] <= wm_us]
        buf = [b for b in buf if b[0] > wm_us]
        out = []
        for ts_us, eid in emit:
            emitted += 1
            out.append((key_[0], eid, ts_us, emitted))
        state.update((emitted, [b[1] for b in buf], [b[0] for b in buf]))
        if buf:
            # fire once the watermark reaches the oldest buffered row's ms
            # (ceil: a row is emittable when wm_us >= ts_us); must arm
            # strictly beyond the current watermark
            deadline = max(-(-buf[0][0] // 1000) - 1, wm_ms + 1)
            state.setTimeoutTimestamp(deadline)
        if out:
            df = pd.DataFrame(out, columns=["user_id", "event_id", "ts", "seq"])
            df["ts"] = pd.to_datetime(df["ts"], unit="us")
            yield df

    return (_prune(events, [key, "ts", "event_id"])
            .withWatermark("ts", watermark_delay)
            .groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.EventTimeTimeout))


def count_sliding_window(events: DataFrame, size: int = 5, slide: int = 2,
                         key: str = "user_id") -> DataFrame:
    """Count-based sliding window per key (CountSlidingWindowAssigner +
    ``KeyedStream.java:668`` countWindow(size, slide)): fire every
    ``slide`` arrivals, aggregating the last ``min(seen, size)`` rows in
    (ts, event_id) order.  State = total arrival count + a ring buffer of
    the last ``size`` cent values — bounded regardless of stream length,
    the same contract as the reference's CountEvictor(size) +
    CountTrigger(slide) pair."""
    out_schema = "user_id bigint, fire_seq bigint, n_events bigint, sum_value double"
    state_schema = "n bigint, recent array<bigint>"

    def fn(key_: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, recent = state.get[0], list(state.get[1])
        else:
            n, recent = 0, []
        out = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            for v in pdf["value"].astype("float64").tolist():
                recent.append(int(round(float(v) * 100)))
                if len(recent) > size:
                    recent.pop(0)
                n += 1
                if n % slide == 0:
                    out.append((key_[0], n, len(recent), sum(recent) / 100.0))
        state.update((n, recent))
        if out:
            yield pd.DataFrame(out, columns=[
                "user_id", "fire_seq", "n_events", "sum_value"])

    return (_prune(events, [key, "ts", "event_id", "value"]).groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def over_rows_bounded(events: DataFrame, frame: int = 5,
                      key: str = "user_id") -> DataFrame:
    """Streaming OVER aggregate with a bounded ROWS frame
    (``runtime/operators/over/RowTimeRowsBoundedPrecedingFunction``):
    each row emits SUM/COUNT over the last ``frame`` rows of its key in
    event-time order.  State = a ring buffer of the last ``frame-1``
    cent values, the exact bounded-state contract of the reference
    operator."""
    out_schema = ("user_id bigint, event_id bigint, ts timestamp, "
                  "frame_sum double, frame_n bigint")
    state_schema = "recent array<bigint>"

    def fn(key_: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        recent = list(state.get[0]) if state.exists else []  # last cents, oldest first
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for eid, ts_us, val in zip(_i64(pdf, "event_id"), _ts_us(pdf),
                                       pdf["value"].astype("float64").tolist()):
                recent.append(int(round(val * 100)))
                if len(recent) > frame:
                    recent.pop(0)
                out.append((key_[0], eid, ts_us,
                            sum(recent) / 100.0, len(recent)))
        state.update((recent,))
        if out:
            df = pd.DataFrame(out, columns=[
                "user_id", "event_id", "ts", "frame_sum", "frame_n"])
            df["ts"] = pd.to_datetime(df["ts"], unit="us")
            yield df

    return (_prune(events, [key, "ts", "event_id", "value"]).groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def cep_times_consecutive(events: DataFrame, event_type: str = "click",
                          n: int = 3, key: str = "user_id") -> DataFrame:
    """CEP quantifier ``begin(A).times(n).consecutive()`` with
    AFTER MATCH SKIP PAST LAST ROW (``Pattern.java`` times/consecutive;
    match-skip ``flink-libraries/flink-cep/.../nfa/aftermatch/``): emit a
    match when ``n`` consecutive A-type events arrive for a key with no
    intervening other-type event; the run counter resets on a match (so
    runs of length L yield floor(L/n) non-overlapping matches) and on any
    non-A event.  State = one integer per key."""
    out_schema = "user_id bigint, last_id bigint, last_ts timestamp, run_n bigint"
    state_schema = "run bigint"

    def fn(key_: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        run = state.get[0] if state.exists else 0
        out = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            for et, eid, ts_us in zip(pdf["event_type"].tolist(),
                                      _i64(pdf, "event_id"), _ts_us(pdf)):
                if et == event_type:
                    run += 1
                    if run == n:
                        out.append((key_[0], eid, ts_us, n))
                        run = 0
                else:
                    run = 0
        state.update((run,))
        if out:
            df = pd.DataFrame(out, columns=["user_id", "last_id", "last_ts", "run_n"])
            df["last_ts"] = pd.to_datetime(df["last_ts"], unit="us")
            yield df

    return (_prune(events, [key, "ts", "event_id", "event_type"]).groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def cep_next(events: DataFrame, first_type: str, then_type: str,
             key: str = "user_id") -> DataFrame:
    """CEP strict contiguity ``begin(A).next(B)`` (``Pattern.java``
    next(): an NFA TAKE edge with no ignore self-loop): B matches only as
    the IMMEDIATELY following event of its key after an A — any
    intervening event of any type kills the partial match.  State = the
    previous event (type, id) per key; O(1) regardless of rate."""
    out_schema = "user_id bigint, a_id bigint, b_id bigint, b_ts timestamp"
    state_schema = "prev_type string, prev_id bigint"

    def fn(key_: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        prev_type, prev_id = state.get if state.exists else (None, None)
        out = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            for et, eid, ts_us in zip(pdf["event_type"].tolist(),
                                      _i64(pdf, "event_id"), _ts_us(pdf)):
                if et == then_type and prev_type == first_type:
                    out.append((key_[0], int(prev_id), eid, ts_us))
                prev_type, prev_id = et, eid
        state.update((prev_type, prev_id))
        if out:
            df = pd.DataFrame(out, columns=["user_id", "a_id", "b_id", "b_ts"])
            df["b_ts"] = pd.to_datetime(df["b_ts"], unit="us")
            yield df

    return (_prune(events, [key, "ts", "event_id", "event_type"]).groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def cep_followed_by_any(events: DataFrame, first_type: str, then_type: str,
                        within_minutes: float, key: str = "user_id") -> DataFrame:
    """CEP ``begin(A).followedByAny(B).within(T)`` with AFTER MATCH SKIP
    TO NEXT (no consumption): every in-window (A, B) pair is a match —
    the NFA keeps all partial runs alive (``followedByAny`` relaxed
    contiguity for non-deterministic runs).  State = in-window A's only;
    every arrival (A or B) prunes expired A's, so state is bounded by
    the window, not the history — including on B-starved keys."""
    out_schema = ("user_id bigint, first_id bigint, then_id bigint, "
                  "first_ts timestamp, then_ts timestamp")
    state_schema = "pending_ids array<bigint>, pending_us array<bigint>"
    within_us = int(within_minutes * 60_000_000)

    def fn(key_: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            pids, pus = state.get
            pending = list(zip(list(pids), list(pus)))
        else:
            pending = []
        out = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            for et, eid, ts_us in zip(pdf["event_type"].tolist(),
                                      _i64(pdf, "event_id"), _ts_us(pdf)):
                if et == first_type:
                    # prune on A arrivals too (not only under B traffic):
                    # expired A's can never match later — state stays
                    # window-bounded on B-starved keys
                    pending = [(aid, aus) for (aid, aus) in pending
                               if ts_us - aus <= within_us]
                    pending.append((eid, ts_us))
                elif et == then_type:
                    pending = [(aid, aus) for (aid, aus) in pending
                               if ts_us - aus <= within_us]
                    for (aid, aus) in pending:
                        if 0 < ts_us - aus:
                            out.append((key_[0], aid, eid, aus, ts_us))
        state.update(([p[0] for p in pending], [p[1] for p in pending]))
        if out:
            df = pd.DataFrame(out, columns=[
                "user_id", "first_id", "then_id", "first_ts", "then_ts"])
            df["first_ts"] = pd.to_datetime(df["first_ts"], unit="us")
            df["then_ts"] = pd.to_datetime(df["then_ts"], unit="us")
            yield df

    return (_prune(events, [key, "ts", "event_id", "event_type"]).groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def cep_optional_between(events: DataFrame, first_type: str, opt_type: str,
                         last_type: str, within_minutes: float,
                         key: str = "user_id") -> DataFrame:
    """CEP three-stage sequence with an optional middle stage:
    ``begin(A).followedBy(B).optional().followedBy(C).within(T)``
    (``Pattern.java`` optional()): each C closes all pending in-window
    A's (one match per A, AFTER MATCH SKIP PAST A), annotated with
    whether a B occurred strictly between the A and the C.  State =
    pending A's + in-window B timestamps (both pruned by the window)."""
    out_schema = ("user_id bigint, first_id bigint, then_id bigint, "
                  "first_ts timestamp, then_ts timestamp, had_opt boolean")
    state_schema = ("pending_ids array<bigint>, pending_us array<bigint>, "
                    "opt_us array<bigint>")
    within_us = int(within_minutes * 60_000_000)

    def fn(key_: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            pids, pus, ous = state.get
            pending = list(zip(list(pids), list(pus)))
            opts = list(ous)
        else:
            pending, opts = [], []
        out = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            for et, eid, ts_us in zip(pdf["event_type"].tolist(),
                                      _i64(pdf, "event_id"), _ts_us(pdf)):
                if et == first_type:
                    pending = [(aid, aus) for (aid, aus) in pending
                               if ts_us - aus <= within_us]
                    pending.append((eid, ts_us))
                elif et == opt_type:
                    opts.append(ts_us)
                    opts = [o for o in opts if ts_us - o <= within_us]
                elif et == last_type:
                    opts = [o for o in opts if ts_us - o <= within_us]
                    still = []
                    for (aid, aus) in pending:
                        if 0 < ts_us - aus <= within_us:
                            had = any(aus < o < ts_us for o in opts)
                            out.append((key_[0], aid, eid, aus, ts_us, had))
                        elif ts_us - aus <= 0:
                            # same-instant A: not yet matchable, keep; an
                            # EXPIRED A is dropped — it can never match
                            # again (event-time order), keeping it would
                            # grow state without bound
                            still.append((aid, aus))
                    pending = still
        state.update(([p[0] for p in pending], [p[1] for p in pending], opts))
        if out:
            df = pd.DataFrame(out, columns=[
                "user_id", "first_id", "then_id", "first_ts", "then_ts",
                "had_opt"])
            df["first_ts"] = pd.to_datetime(df["first_ts"], unit="us")
            df["then_ts"] = pd.to_datetime(df["then_ts"], unit="us")
            yield df

    return (_prune(events, [key, "ts", "event_id", "event_type"]).groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def updatable_topn(events: DataFrame, n: int = 3,
                   key: str = "event_type",
                   id_col: str = "user_id") -> DataFrame:
    """Updatable streaming top-N (``runtime/operators/rank/
    UpdatableTopNFunction.java`` + RetractableTopNFunction semantics):
    the input is an UPSERT stream — each row sets ``id_col``'s current
    value — and the operator maintains the top-N ids by current value
    per key, emitting a changelog: ``+I`` when an id enters the top-N,
    ``+U`` when a member's value changes, ``-D`` when it drops out.

    State = the current value per id (the same map the reference keeps)
    plus the previous top-N membership; emission is diff-based, so a
    quiet key emits nothing.  Values accumulate as integer cents --
    exact and order-independent.
    """
    out_schema = f"op string, {key} string, {id_col} bigint, val double, seq bigint"
    state_schema = ("ids array<bigint>, cents array<bigint>, "
                    "top_ids array<bigint>, top_cents array<bigint>, seq bigint")

    def fn(key_: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, cents, top_ids, top_cents, seq = state.get
            cur = dict(zip(list(ids), list(cents)))
            old_top = dict(zip(list(top_ids), list(top_cents)))
        else:
            cur, old_top, seq = {}, {}, 0
        changed = False
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            for uid, val in zip(_i64(pdf, id_col),
                                pdf["value"].astype("float64").tolist()):
                cur[uid] = int(round(val * 100))
                changed = True
        if not changed:
            return
        ranked = sorted(cur.items(), key=lambda kv: (-kv[1], kv[0]))[:n]
        new_top = dict(ranked)
        rows = []
        for uid, c in ranked:
            if uid not in old_top:
                seq += 1
                rows.append(("+I", key_[0], uid, c / 100.0, seq))
            elif old_top[uid] != c:
                seq += 1
                rows.append(("+U", key_[0], uid, c / 100.0, seq))
        for uid in old_top:
            if uid not in new_top:
                seq += 1
                rows.append(("-D", key_[0], uid, old_top[uid] / 100.0, seq))
        state.update((list(cur.keys()), list(cur.values()),
                      list(new_top.keys()), list(new_top.values()), seq))
        if rows:
            yield pd.DataFrame(rows, columns=["op", key, id_col, "val", "seq"])

    return (_prune(events, [key, id_col, "ts", "event_id", "value"]).groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def over_range_bounded(events: DataFrame, preceding_minutes: float = 5,
                       key: str = "user_id") -> DataFrame:
    """Streaming OVER aggregate, time-RANGE bounded-preceding frame
    (``runtime/operators/over/RowTimeRangeBoundedPrecedingFunction.java:60``):
    each row is emitted with SUM(value)/COUNT(*) over the key's rows in
    ``[ts - preceding, ts]``.  RANGE frames include equal-timestamp
    peers — the reference fires on watermark and processes all rows of a
    timestamp together; here each batch is processed timestamp-group by
    timestamp-group, which is identical for the bounded run.

    State = the in-window suffix of (ts, cents) pairs — pruned every
    emission, so it is bounded by the frame width, never the history.
    Money accumulates as integer cents (exact at any parallelism).
    """
    out_schema = (f"{key} bigint, event_id bigint, ts timestamp, "
                  "range_sum double, range_n bigint")
    state_schema = "buf_us array<bigint>, buf_cents array<bigint>"
    prec_us = int(preceding_minutes * 60_000_000)

    def fn(key_: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            us, cents = state.get
            buf = list(zip(list(us), list(cents)))  # (ts_us, cents) asc
        else:
            buf = []
        out = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            tss, ids = _ts_us(pdf), _i64(pdf, "event_id")
            vals = pdf["value"].astype("float64").tolist()
            # walk equal-timestamp runs (RANGE peers fire together)
            i = 0
            while i < len(tss):
                j = i
                while j < len(tss) and tss[j] == tss[i]:
                    j += 1
                ts_us = tss[i]
                for k in range(i, j):
                    buf.append((ts_us, int(round(vals[k] * 100))))
                buf = [(u, c) for (u, c) in buf if ts_us - u <= prec_us]
                s = sum(c for (_, c) in buf)
                n = len(buf)
                for k in range(i, j):
                    out.append((key_[0], ids[k], ts_us, s / 100.0, n))
                i = j
        state.update(([u for (u, _) in buf], [c for (_, c) in buf]))
        if out:
            df = pd.DataFrame(out, columns=[
                key, "event_id", "ts", "range_sum", "range_n"])
            df["ts"] = pd.to_datetime(df["ts"], unit="us")
            yield df

    return (_prune(events, [key, "ts", "event_id", "value"]).groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def cep_times_or_more(events: DataFrame, first_type: str, then_type: str,
                      n_min: int, within_minutes: float,
                      key: str = "user_id") -> DataFrame:
    """CEP ``begin(A).timesOrMore(n).followedBy(B).within(T)``
    (``Pattern.java`` timesOrMore): a B completes a greedy match only if
    at least ``n`` pending A's lie inside its window; on success all
    in-window A's are consumed (AFTER MATCH SKIP PAST LAST ROW), on
    failure nothing is consumed — the A's stay pending for a later B.

    State stays bounded: expired A's (older than any future B's window,
    since event time is processed in order) are pruned at each B.

    The oracle insight (used by the DuckDB side): because a successful B
    consumes exactly the A's older than itself and in-window, and
    expired A's can never re-enter a later window, the full pending-set
    evolution collapses to ONE value per key — the last successful B's
    timestamp; an A is eligible for B_k iff ``b_k.ts - T <= a.ts <
    b_k.ts`` and ``a.ts >= last_successful_b.ts``.
    """
    out_schema = ("user_id bigint, then_id bigint, then_ts timestamp, "
                  "n_first bigint, first_ts timestamp, last_ts timestamp")
    state_schema = "pend_us array<bigint>"
    within_us = int(within_minutes * 60_000_000)

    def fn(key_: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        pending = sorted(state.get[0]) if state.exists else []
        out = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            for et, eid, ts_us in zip(pdf["event_type"].tolist(),
                                      _i64(pdf, "event_id"), _ts_us(pdf)):
                if et == first_type:
                    pending = [a for a in pending if ts_us - a <= within_us]
                    pending.append(ts_us)
                elif et == then_type:
                    pending = [a for a in pending if ts_us - a <= within_us]
                    in_win = [a for a in pending if 0 < ts_us - a]
                    if len(in_win) >= n_min:
                        out.append((key_[0], eid, ts_us, len(in_win),
                                    min(in_win), max(in_win)))
                        pending = [a for a in pending if a >= ts_us]
        state.update((pending,))
        if out:
            df = pd.DataFrame(out, columns=[
                "user_id", "then_id", "then_ts", "n_first", "first_ts", "last_ts"])
            for c in ("then_ts", "first_ts", "last_ts"):
                df[c] = pd.to_datetime(df[c], unit="us")
            yield df

    return (_prune(events, [key, "ts", "event_id", "event_type"]).groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))


def late_data_split(events: DataFrame, delay_minutes: float,
                    allowed_lateness_minutes: float,
                    arrival_col: str = "__arrival",
                    key: str = "user_id") -> DataFrame:
    """allowedLateness + late-data side output
    (``WindowedStream.java:158-177`` allowedLateness/sideOutputLateData,
    ``WindowOperator.java:144-151`` isElementLate): rows are processed
    in ARRIVAL order per key; the per-key watermark is the running max
    event time minus ``delay``; a row whose timestamp is more than
    ``allowed_lateness`` behind that watermark is flagged late instead
    of being silently dropped — downstream splits the stream on the
    flag (``side_outputs``) and routes late rows to a recovery sink.

    ``arrival_col`` defines arrival order (a real pipeline has ingest
    order; bounded replays synthesize one).  State = one max-timestamp
    per key; the batch is processed with vectorized cummax, no Python
    row loop.
    """
    out_schema = (f"{key} bigint, event_id bigint, ts timestamp, "
                  "is_late boolean")
    state_schema = "max_us bigint"
    delay_us = int(delay_minutes * 60_000_000)
    late_us = int(allowed_lateness_minutes * 60_000_000)

    def fn(key_: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        max_us = state.get[0] if state.exists else None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(arrival_col)
            # force microsecond resolution regardless of the pandas
            # datetime unit the Arrow batch arrived with
            ts_us = pd.Series(
                pdf["ts"].values.astype("datetime64[us]").astype("int64"),
                index=pdf.index)
            prev_max = ts_us.cummax().shift(1)
            if max_us is not None:
                prev_max = prev_max.fillna(max_us).clip(lower=max_us)
            late = ts_us < prev_max - delay_us - late_us
            max_us = int(ts_us.max()) if max_us is None \
                else max(max_us, int(ts_us.max()))
            yield pd.DataFrame({
                key: pdf[key].astype("int64"),
                "event_id": pdf["event_id"].astype("int64"),
                "ts": pdf["ts"],
                "is_late": late.fillna(False).astype(bool)})
        if max_us is not None:
            state.update((max_us,))

    return (_prune(events, [key, arrival_col, "ts", "event_id"]).groupBy(key)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))
