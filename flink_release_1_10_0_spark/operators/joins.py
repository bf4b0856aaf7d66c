"""Join operators Spark lacks as single primitives: interval join and
temporal/as-of join.

Reference semantics:
- Interval join: ``physical/stream/StreamExecWindowJoin.scala:53`` +
  ``runtime/operators/join/TimeBoundedStreamJoin.java:52`` and DataStream
  ``KeyedStream.java:418`` (``intervalJoin``) — match pairs with
  ``r.ts BETWEEN l.ts + lower AND l.ts + upper`` on an equi-key.
- Temporal/as-of join: ``physical/stream/StreamExecTemporalJoin.scala:51``
  + ``runtime/operators/join/temporal/TemporalRowTimeJoinOperator.java:71``
  — each probe row joins the latest version of the build side with
  version-time <= probe-time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interval_join(left: DataFrame, right: DataFrame, keys: list[tuple[str, str]],
                  left_ts: str, right_ts: str,
                  lower_expr: str, upper_expr: str) -> DataFrame:
    """Equi-key join with a time-band predicate:
    ``right.ts BETWEEN left.ts - lower AND left.ts + upper``.

    Scale note: Catalyst plans the equi-part as a shuffled join on the key
    (band predicate evaluated post-match), so state never exceeds one
    key-group — same layout as the reference's per-key state buckets.
    lower_expr/upper_expr are SQL interval strings, e.g. "INTERVAL 10 MINUTES".
    """
    l = left.alias("l")
    r = right.alias("r")
    cond = None
    for lk, rk in keys:
        c = F.col(f"l.{lk}") == F.col(f"r.{rk}")
        cond = c if cond is None else (cond & c)
    band = (
        (F.col(f"r.{right_ts}") >= F.expr(f"l.{left_ts} - {lower_expr}"))
        & (F.col(f"r.{right_ts}") <= F.expr(f"l.{left_ts} + {upper_expr}"))
    )
    return l.join(r, cond & band)


def asof_join(probe: DataFrame, build: DataFrame, keys: list[tuple[str, str]],
              probe_ts: str, build_ts: str,
              build_cols: list[str]) -> DataFrame:
    """As-of join: attach the latest build row with build_ts <= probe_ts
    per key.  Null build columns when no version precedes the probe row.

    Implementation is the union-and-carry-forward pattern, NOT a
    probe×versions join: tag both sides, sort per key by (ts, side) and
    carry the last build values forward with ``last(..., ignorenulls)``.
    One shuffle + one sort, no row explosion — at 100 TB this is the only
    as-of strategy that doesn't quadratically blow up on hot keys.
    """
    probe_keys = [k for k, _ in keys]
    # normalize build to probe's key names
    b = build
    for pk, bk in keys:
        if pk != bk:
            b = b.withColumnRenamed(bk, pk)
    b = b.select(*probe_keys, F.col(build_ts).alias("__ts"),
                 *[F.col(c).alias(f"__b_{c}") for c in build_cols])
    b = b.withColumn("__side", F.lit(0))

    p = probe.withColumn("__ts", F.col(probe_ts)).withColumn("__side", F.lit(1))
    for c in build_cols:
        p = p.withColumn(f"__b_{c}", F.lit(None).cast(dict(b.dtypes)[f"__b_{c}"]))
    missing_probe_cols = [c for c in probe.columns if c not in b.columns]
    b_full = b
    for c in missing_probe_cols:
        b_full = b_full.withColumn(c, F.lit(None).cast(dict(probe.dtypes)[c]))
    unioned = p.select(*probe.columns, "__ts", "__side",
                       *[f"__b_{c}" for c in build_cols]) \
        .unionByName(b_full.select(*probe.columns, "__ts", "__side",
                                   *[f"__b_{c}" for c in build_cols]))

    # build rows (side=0) sort before probe rows at equal ts => "<=" semantics
    w = (Window.partitionBy(*probe_keys).orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, 0))
    out = unioned
    for c in build_cols:
        out = out.withColumn(f"__b_{c}", F.last(f"__b_{c}", ignorenulls=True).over(w))
    out = out.filter(F.col("__side") == 1)
    return out.select(*probe.columns,
                      *[F.col(f"__b_{c}").alias(c) for c in build_cols])
