"""Scale sweep: measure how the headline plans scale from sf0.01 to
sf0.1 to a synthesized ~sf1, and write SCALE_SWEEP_r{N}.md.

The sf1 tier is built by replicating sf0.1 facts 10x with key offsets:
- lineitem/orders: l_orderkey/o_orderkey offset per copy (new orders),
  o_custkey/l_partkey/l_suppkey unchanged — dimensions deliberately stay
  fixed, matching how fact tables outgrow dimensions in a real warehouse
  (and keeping the broadcast-ability the plans rely on honest);
- documents: doc_id offset per copy; each copy's text goes through a
  copy-specific letter rotation so the copies' vocabularies are
  disjoint — the corpus becomes 10x of the *same dup-cluster
  structure* (cluster widths unchanged), which is the linear-scaling
  regime.  Simply suffixing a tag would instead widen every near-dup
  cluster 10x and grow the PAIR OUTPUT quadratically — correct
  semantics for dup pairs, but it would measure output cardinality,
  not plan scaling.

A plan that is linear in the fact size should show ~10x wall-clock per
tier (modulo fixed overhead at the small end); anything super-linear
(all-pairs, unpartitioned windows, driver loops) shows up immediately.

Usage:  python tools/scale_sweep.py [out_md]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_release_1_10_0_spark.queries import all_queries
from flink_release_1_10_0_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
COPIES = 10
HEADS = [
    "tpch_q1_pricing_summary",      # scan-heavy agg
    "tpch_q3_shipping_priority",    # fact-fact join
    "tpch_q18_large_volume_customer",  # agg + semi join
    "tpcds_q_multi_fact_star",      # two pre-aggregated facts
    "minhash_lsh_dup_pairs_xxh",    # LSH dedup (the heavy head)
    "text_repetition_stats",        # explode + two-level agg
    "dedup_segment_boilerplate",    # segment freq join-back (round 5)
    "dedup_scrub_boilerplate",      # freq join-back + per-doc reassembly
]


def build_sf1(spark, base: str) -> str:
    out = os.path.join(base, "sf1")
    os.makedirs(out, exist_ok=True)
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    OFF = 1_000_000_000

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    (li.crossJoin(copies)
       .withColumn("l_orderkey", F.col("l_orderkey") + F.col("copy") * OFF)
       .drop("copy")
       .write.mode("overwrite").parquet(f"{out}/lineitem.parquet"))

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    (orders.crossJoin(copies)
       .withColumn("o_orderkey", F.col("o_orderkey") + F.col("copy") * OFF)
       .drop("copy")
       .write.mode("overwrite").parquet(f"{out}/orders.parquet"))

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    alpha = "abcdefghijklmnopqrstuvwxyz"
    rotated = F.col("text")
    for c in range(COPIES):
        rot = alpha[c:] + alpha[:c]
        rotated = F.when(F.col("copy") == c,
                         F.translate("text", alpha, rot)).otherwise(rotated)
    (docs.crossJoin(copies)
       .withColumn("doc_id", F.col("doc_id") + F.col("copy") * OFF)
       .withColumn("text", rotated)
       .drop("copy")
       .write.mode("overwrite").parquet(f"{out}/documents.parquet"))

    for tbl in ["customer", "supplier", "part", "nation", "region",
                "events", "embeddings"]:
        spark.read.parquet(f"{SRC}/{tbl}.parquet") \
             .write.mode("overwrite").parquet(f"{out}/{tbl}.parquet")
    return out


def time_head(spark, qs, name, sf_dir) -> float:
    def run():
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    run()  # warm
    t0 = time.perf_counter()
    run()
    return round(time.perf_counter() - t0, 3)


def main():
    out_md = sys.argv[1] if len(sys.argv) > 1 else "SCALE_SWEEP.md"
    spark = get_spark("scale_sweep")
    qs = all_queries()
    base = tempfile.mkdtemp(prefix="scale_sweep_")
    print("building sf1 tier...", flush=True)
    sf1 = build_sf1(spark, base)

    tiers = [("sf0.01", "/root/testdata/sf0.01"),
             ("sf0.1", SRC), ("sf1 (synth)", sf1)]
    results: dict[str, dict[str, float]] = {n: {} for n in HEADS}
    for tier_name, tier_dir in tiers:
        for name in HEADS:
            if name not in qs:
                continue
            secs = time_head(spark, qs, name, tier_dir)
            results[name][tier_name] = secs
            print(f"{tier_name:12s} {name:34s} {secs:8.3f}s", flush=True)

    lines = [
        "# Scale sweep",
        "",
        "Second (warmed) run per head per tier; the sf1 tier is sf0.1",
        "facts replicated 10x with offset keys (dimensions fixed — see",
        "tools/scale_sweep.py for the construction and why).",
        "",
        "| head | sf0.01 | sf0.1 | sf1 (synth) | sf0.1→sf1 ratio |",
        "|---|---|---|---|---|",
    ]
    for name in HEADS:
        r = results[name]
        if not r:
            continue
        ratio = (r["sf1 (synth)"] / r["sf0.1"]) if r.get("sf0.1") else float("nan")
        lines.append(
            f"| {name} | {r.get('sf0.01', '')} | {r.get('sf0.1', '')} "
            f"| {r.get('sf1 (synth)', '')} | {ratio:.1f}x |")
    lines += [
        "",
        "A plan linear in fact size shows ≈10x (minus fixed overhead",
        "amortized at the small end). Super-linear growth would flag an",
        "all-pairs/unpartitioned construct.",
    ]
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_md}")


if __name__ == "__main__":
    main()
