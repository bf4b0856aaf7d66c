"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_release_1_10_0_spark.queries import all_queries
from flink_release_1_10_0_spark.session import get_spark

# headline set: scan-heavy agg, multi-way joins (TPC-H heads), plus the
# engine's differentiating operators — LSH dedup, stateful streaming
# top-N, CEP NFA, iterative graph, partition-pruned ANN — so a perf
# regression in any family is visible round-over-round
HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q18_large_volume_customer",
    "minhash_lsh_dup_pairs",
    "minhash_lsh_dup_pairs_xxh",
    "tpcds_q_multi_fact_star",
    "text_repetition_stats",
    "dedup_segment_boilerplate",
    "stream_topn_per_key",
    "cep_nfa_four_stage",
    "graph_connected_components",
    "similarity_ivf_topk_pruned",
    # round-7 additions: one head per round-6 family so connector /
    # keyed-state / iteration regressions show up in the wall-clock
    "source_dbapi_roundtrip",
    "queryable_state_snapshot",
    "stream_iterate_feedback_halving",
    # round-7 families: the SQL MATCH_RECOGNIZE front end (parser +
    # NFA + declarative measures) and incremental new-batch dedup
    "flink_sql_match_recognize",
    "dedup_incremental_lsh",
    # round-9 family: DEFINE aggregates (per-run accumulators + held
    # start-order skip-strategy emission) — the new NFA hot path
    "flink_sql_mr_define_agg_avg",
    # round-10 families: SRP embedding near-dup (band joins + cosine
    # verify), the temporal-join SQL surface (as-of plan), and the ML
    # pipeline (scaler fit + broadcast-codebook k-means)
    "dedup_embedding_srp",
    "flink_sql_temporal_table_function",
    "ml_pipeline_scaler_kmeans",
    # round-11 addition: the incremental embedding path is the production
    # per-ingest shape (batch signed against a persisted index, corpus
    # never rescanned) — bench it like minhash's incremental equivalent
    "dedup_embedding_incremental",
    # round-11 addition: SemDeDup (cluster-pruned semantic dedup) — the
    # k-means fit + cid-keyed pair join; k is the pair-space lever
    "dedup_semantic_pairs",
    # round-12 additions: next-fit sequence packing (the Arrow-stateful
    # per-shard pass) and PQ ADC search (4x sub-space Lloyd + encode +
    # salted two-stage top-k) — the two new wave-3 hot paths
    "pack_sequences_next_fit",
    "similarity_pq_topk_recall",
    # round-13 additions: SemDeDup's per-ingest shape (batch assigned
    # against persisted centroids, cid-keyed join vs the index — the
    # semantic mirror of the two incremental heads above), BM25 ranked
    # retrieval (postings-pruned lexical search), and BFD packing (the
    # offline fill-ratio packer)
    "dedup_semantic_incremental",
    "ir_bm25_topk",
    "pack_sequences_best_fit",
    # round-14 additions: BPE tokenizer training (the 10-iteration
    # merge loop over the cached word dict — bench-visible loop cost)
    # and the SQ8 rerank cascade (int8 asymmetric scan + exact rescore)
    "text_bpe_train_merges",
    "similarity_sq8_rerank",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")
    qs = all_queries()
    names = [n for n in HEADLINE if n in qs]
    # materialize through the noop sink: every column is computed and every
    # row serialized, unlike .count() where Catalyst can prune the final
    # projection and flatter scan-heavy queries
    def run(df):
        df.write.format("noop").mode("overwrite").save()

    # one untimed warmup pass: JVM/codegen JIT + parquet footer cache, the
    # steady-state a long-running cluster session actually operates in
    for name in names:
        run(qs[name](spark, sf_dir))
    # median of 3 trials per query: the host is shared, so a single trial
    # can absorb an unrelated multi-second stall (GC / CPU contention);
    # the median reflects the plan's actual cost.  min/max are recorded
    # per head so a noisy run is visible IN the artifact (a reader can
    # tell host noise from a plan regression without re-running).
    times: dict[str, float] = {}
    spread: dict[str, dict[str, float]] = {}
    for name in names:
        trials = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(qs[name](spark, sf_dir))
            trials.append(time.perf_counter() - t0)
        times[name] = round(statistics.median(trials), 3)
        spread[name] = {"median": times[name],
                        "min": round(min(trials), 3),
                        "max": round(max(trials), 3)}
    total = round(sum(times.values()), 3)
    # The per-head min/max spread is written to a SIDECAR file, not stdout:
    # the driver captures only the tail of stdout and parses the LAST line
    # as JSON, so the headline line must stay compact (metric/value/sf +
    # per-query medians).  Round 8's inline spread made the line outgrow
    # the tail capture and the round lost its recorded bench value.
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_SPREAD.json")
    try:
        with open(sidecar, "w") as f:
            json.dump({"sf": sf, "spread": spread}, f, indent=1)
    except OSError:
        pass  # read-only checkout: the headline line below still prints
    print(json.dumps({
        "metric": "headline_queries_total_wallclock",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
