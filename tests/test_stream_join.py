"""Stream-stream update join tests (``streaming/stream_join.py``):
retraction mechanics on a controlled interleaving, inner-join symmetry,
and TTL state pruning."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from flink_release_1_10_0_spark.streaming.core import run_to_completion
from flink_release_1_10_0_spark.streaming.stream_join import (
    INNER, LEFT_OUTER, fold_join_changelog, stream_stream_join)

_SCHEMA = ("event_id bigint, ts string, user_id bigint, "
           "event_type string, value double")


def _streams(spark, rows):
    """One bounded stream filtered two ways (left=purchase, right=error)."""
    df = (spark.createDataFrame(rows, _SCHEMA)
          .withColumn("ts", F.col("ts").cast("timestamp")))
    src = tempfile.mkdtemp(prefix="ssj_src_")
    df.coalesce(1).write.mode("append").parquet(src)
    sdf = spark.readStream.schema(df.schema).parquet(src)
    return (sdf.filter("event_type = 'purchase'"),
            sdf.filter("event_type = 'error'"))


def _ev(i, minute, etype, value, user=1):
    return (i, f"2024-01-01 10:{minute:02d}:00", user, etype, value)


def test_left_outer_retracts_null_row_on_first_match(spark):
    """l1 arrives unmatched (+I null-padded); r1 retracts it (-D) and
    inserts the pair; l2 arrives matched and never emits a null row."""
    rows = [_ev(1, 0, "purchase", 10.0), _ev(2, 1, "error", 5.0),
            _ev(3, 2, "purchase", 20.0)]
    left, right = _streams(spark, rows)
    clog = run_to_completion(
        stream_stream_join(left, right, "user_id", how=LEFT_OUTER), "append")
    got = [(r.op, r.l_id, r.r_id) for r in clog.orderBy("seq").collect()]
    assert got == [("+I", 1, None), ("-D", 1, None), ("+I", 1, 2),
                   ("+I", 3, 2)]


def test_fold_equals_batch_left_join(spark):
    rows = [_ev(1, 0, "purchase", 10.0), _ev(2, 1, "error", 5.0),
            _ev(3, 2, "purchase", 20.0), _ev(4, 3, "purchase", 30.0, user=2)]
    left, right = _streams(spark, rows)
    clog = run_to_completion(
        stream_stream_join(left, right, "user_id", how=LEFT_OUTER), "append")
    got = {(r.user_id, r.l_id, r.r_id)
           for r in fold_join_changelog(clog, "user_id").collect()}
    assert got == {(1, 1, 2), (1, 3, 2), (2, 4, None)}


def test_inner_join_emits_pairs_only(spark):
    rows = [_ev(1, 0, "purchase", 10.0), _ev(2, 1, "error", 5.0),
            _ev(3, 2, "purchase", 30.0, user=2)]
    left, right = _streams(spark, rows)
    clog = run_to_completion(
        stream_stream_join(left, right, "user_id", how=INNER), "append")
    got = [(r.op, r.l_id, r.r_id) for r in clog.collect()]
    assert got == [("+I", 1, 2)]


def test_ttl_prunes_expired_state(spark):
    """With a 10-minute TTL, a right row 30 minutes after the left row
    no longer joins (the left row aged out of state)."""
    rows = [_ev(1, 0, "purchase", 10.0), _ev(2, 30, "error", 5.0)]
    left, right = _streams(spark, rows)
    clog = run_to_completion(
        stream_stream_join(left, right, "user_id", how=INNER,
                           ttl_minutes=10), "append")
    assert clog.count() == 0


def test_ids_above_2_53_survive_exactly(spark):
    """Ids beyond float64's 2^53 integer range (snowflake-style) must
    round-trip exactly: the emission path keeps int64 arrays + null
    masks, never a float64 detour."""
    big = 2**53 + 1          # corrupts to 2^53 through float64
    big2 = 9_007_199_254_740_997  # 2^53 + 5, also unrepresentable
    rows = [_ev(big, 0, "purchase", 10.0), _ev(big2, 1, "error", 5.0)]
    left, right = _streams(spark, rows)
    clog = run_to_completion(
        stream_stream_join(left, right, "user_id", how=LEFT_OUTER), "append")
    got = [(r.op, r.l_id, r.r_id) for r in clog.orderBy("seq").collect()]
    assert got == [("+I", big, None), ("-D", big, None), ("+I", big, big2)]


def test_buf_out_of_order_append_still_expires():
    """A late row appended behind newer rows (input-contract violation)
    must still be TTL-expired: expire falls back to rescan+compaction
    instead of silently parking the row behind the prefix pointer."""
    import numpy as np

    from flink_release_1_10_0_spark.streaming.stream_join import _Buf

    I64, F64 = np.int64, np.float64
    b = _Buf([[], [], []], (I64, I64, F64))
    b.append(1, 100, 1.0)
    b.append(2, 300, 2.0)
    b.append(3, 150, 3.0)   # late: behind ts=300
    assert not b.sorted_
    b.expire(200)           # drops ts=100 AND the late ts=150
    assert b.live(0).tolist() == [2]
    b.append(4, 400, 4.0)
    b.expire(350)
    assert b.live(0).tolist() == [4]


def test_hot_key_large_state_completes_fast(spark):
    """Scale guard (r3 verdict #3): one key with 10^4 buffered left rows
    then a burst of right rows must complete in seconds — the per-event
    work against the left buffer is vectorized, not a Python list scan.
    Emits 10^4 retractions + 50*10^4 inserts."""
    import time

    n_left, n_right = 10_000, 50
    rows = [(i, f"2024-01-01 {i // 3600:02d}:{(i // 60) % 60:02d}:{i % 60:02d}",
             1, "purchase", float(i)) for i in range(n_left)]
    rows += [(n_left + j, f"2024-01-02 00:00:{j:02d}", 1, "error", 1.0)
             for j in range(n_right)]
    left, right = _streams(spark, rows)
    t0 = time.perf_counter()
    clog = run_to_completion(
        stream_stream_join(left, right, "user_id", how=LEFT_OUTER), "append")
    got = clog.groupBy("op").count().collect()
    elapsed = time.perf_counter() - t0
    counts = {r["op"]: r["count"] for r in got}
    assert counts["-D"] == n_left
    assert counts["+I"] == n_left + n_left * n_right
    assert elapsed < 60, f"hot-key join took {elapsed:.1f}s"


def test_table_config_idle_state_retention_wires_ttl(spark):
    """TableConfig.setIdleStateRetentionTime must flow into the
    env-built stream join as its TTL: with 5-minute retention, a left
    row older than the TTL at the right row's arrival never matches."""
    from flink_release_1_10_0_spark.environment import TableEnvironment
    env = TableEnvironment(spark)
    env.config.set_idle_state_retention_time(5)
    rows = [_ev(1, 0, "purchase", 10.0),   # expires before the error
            _ev(2, 30, "purchase", 20.0),  # fresh
            _ev(3, 31, "error", 5.0)]
    left, right = _streams(spark, rows)
    clog = run_to_completion(
        env.stream_join(left, right, "user_id", how=INNER), "append")
    pairs = {(r.l_id, r.r_id) for r in clog.filter("op = '+I'").collect()}
    assert pairs == {(2, 3)}
