"""Wave-5 LLM operator tests: oracle comparisons at sf0.001 plus
semantic invariants (UniMax water-filling vs a brute-force reference,
BPE vs a pure-Python reference, cascade recall vs the exact scan)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import compare_query

WAVE5 = [
    "text_ccnet_ppl_buckets", "sample_unimax_allocation",
    "similarity_sq8_topk", "similarity_sq8_rerank",
    "similarity_matryoshka_topk", "dedup_cluster_quality_survivors",
    "text_bpe_train_merges", "text_bpe_encode_stats",
    "text_bpe_vocab", "text_bpe_model_roundtrip",
    "similarity_sq8_recall", "pipeline_bpe_pack",
]


@pytest.mark.parametrize("name", WAVE5)
def test_wave5_oracle(spark, duck, name):
    compare_query(spark, duck, name)


# ---------------------------------------------------------------------------
# UniMax: the window-function water-filling must equal the iterative
# reference (repeatedly give every live language an equal share of the
# remaining budget; languages whose cap is below the share get capped).
# ---------------------------------------------------------------------------


def _unimax_reference(caps: dict[str, int], budget: int) -> dict[str, float]:
    live = dict(caps)
    alloc = {}
    b = float(budget)
    while live:
        share = b / len(live)
        capped = {l: c for l, c in live.items() if c <= share}
        if not capped:
            for l in live:
                alloc[l] = share
            return alloc
        for l, c in capped.items():
            alloc[l] = float(c)
            b -= c
            del live[l]
    return alloc


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(counts=st.lists(st.integers(min_value=1, max_value=5000),
                       min_size=1, max_size=8),
       budget=st.integers(min_value=1, max_value=30000),
       cap=st.integers(min_value=1, max_value=3))
def test_unimax_matches_reference(spark, counts, budget, cap):
    from flink_release_1_10_0_spark.llm.text import unimax_allocation
    rows = [(f"l{i}", " ".join(["w"] * c)) for i, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "lang string, text string")
    got = {r["lang"]: r["alloc_tokens"]
           for r in unimax_allocation(df, budget=budget,
                                      epoch_cap=cap).collect()}
    want = _unimax_reference({f"l{i}": cap * c
                              for i, c in enumerate(counts)}, budget)
    assert set(got) == set(want)
    for l in want:
        assert got[l] == pytest.approx(want[l], abs=2e-6)


# ---------------------------------------------------------------------------
# BPE: the distributed merge loop must learn the same merge table as a
# pure-Python reference implementing the documented contract (word-dict
# pair counts, (count DESC, left, right) argmax, greedy left-to-right
# replace).
# ---------------------------------------------------------------------------


def _bpe_reference(words: list[str], n_merges: int):
    from collections import Counter
    freq = Counter(words)
    toks = {w: " ".join(list(w)) + " </w>" for w in freq}
    merges = []
    for rank in range(1, n_merges + 1):
        pc: Counter = Counter()
        for w, c in freq.items():
            a = toks[w].split(" ")
            for i in range(len(a) - 1):
                pc[(a[i], a[i + 1])] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        merges.append((rank, l, r, c))
        for w in toks:
            s = " " + toks[w] + " "
            toks[w] = s.replace(f" {l} {r} ", f" {l}{r} ").strip()
    return merges


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(words=st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=6),
    min_size=1, max_size=40))
def test_bpe_train_matches_reference(spark, words):
    from flink_release_1_10_0_spark.llm.bpe import bpe_train
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    got = [(r["rank"], r["merge_left"], r["merge_right"], r["pair_count"])
           for r in bpe_train(df, n_merges=5).orderBy("rank").collect()]
    assert got == _bpe_reference(words, 5)


def test_bpe_encode_compression_bounds(spark):
    """Token counts: merged never exceeds char-level, at least n_words."""
    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.bpe import bpe_encode_stats, bpe_train
    docs = load(spark, "/root/testdata/sf0.001", "documents")
    merges = bpe_train(docs, n_merges=6)
    stats = bpe_encode_stats(docs, merges)
    assert stats.filter("n_bpe_tokens > n_char_tokens").count() == 0
    assert stats.filter("n_bpe_tokens < n_words").count() == 0
    assert stats.filter("compression < 1.0").count() == 0


# ---------------------------------------------------------------------------
# Cascade recall: with r = corpus size both cascades ARE the exact scan.
# ---------------------------------------------------------------------------


def test_cascades_exact_when_r_covers_corpus(spark):
    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.similarity import (
        exact_l2_topk, matryoshka_topk, sq8_topk_rerank)
    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    n = emb.count()
    qs = emb.filter("vec_id in (0, 7)") \
            .selectExpr("vec_id as q_id", "embedding")
    exact = {(r["q_id"], r["rank"]): r["vec_id"]
             for r in exact_l2_topk(emb, qs, k=3).collect()}
    srr = {(r["q_id"], r["rank"]): r["vec_id"]
           for r in sq8_topk_rerank(emb, qs, k=3, r=n).collect()}
    mat = {(r["q_id"], r["rank"]): r["vec_id"]
           for r in matryoshka_topk(emb, qs, k=3, r=n).collect()}
    assert srr == exact
    assert mat == exact


def test_matryoshka_full_prefix_is_exact_coarse(spark):
    """prefix_dim = full dim -> stage-1 ordering already exact, so even
    r = k must reproduce the exact top-k."""
    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.similarity import (exact_l2_topk,
                                                           matryoshka_topk)
    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    qs = emb.filter("vec_id = 3").selectExpr("vec_id as q_id", "embedding")
    exact = {(r["q_id"], r["rank"]): r["vec_id"]
             for r in exact_l2_topk(emb, qs, k=4).collect()}
    mat = {(r["q_id"], r["rank"]): r["vec_id"]
           for r in matryoshka_topk(emb, qs, k=4, r=4,
                                    prefix_dim=64).collect()}
    assert mat == exact


# ---------------------------------------------------------------------------
# CCNet buckets / quality survivors invariants
# ---------------------------------------------------------------------------


def test_ccnet_bucket_ordering(spark):
    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.text import ccnet_ppl_buckets
    docs = load(spark, "/root/testdata/sf0.001", "documents")
    b = ccnet_ppl_buckets(docs).cache()
    try:
        # value-based cuts: max(head) <= min(middle) <= ... per lang
        agg = (b.groupBy("lang").pivot(
            "bucket", ["head", "middle", "tail"]).count().collect())
        stats = {}
        for r in b.groupBy("lang", "bucket").agg(
                {"ppl_r": "min"}).collect():
            stats[(r["lang"], r["bucket"])] = r["min(ppl_r)"]
        for r in b.groupBy("lang", "bucket").agg(
                {"ppl_r": "max"}).collect():
            stats[(r["lang"], r["bucket"], "max")] = r["max(ppl_r)"]
        for (lang,) in b.select("lang").distinct().collect():
            if (lang, "middle") in stats:
                assert stats[(lang, "head", "max")] \
                    <= stats[(lang, "middle")]
            if (lang, "tail") in stats and (lang, "middle") in stats:
                assert stats[(lang, "middle", "max")] \
                    <= stats[(lang, "tail")]
        # every scoreable doc is bucketed
        n_scoreable = docs.selectExpr(
            "size(filter(split(regexp_replace(lower(text), '[^a-z0-9 ]',"
            " ' '), ' +'), x -> x != '')) AS n").filter("n >= 2").count()
        assert b.count() == n_scoreable
    finally:
        b.unpersist()


def test_cluster_quality_keeper_is_argmax(spark, duck):
    from flink_release_1_10_0_spark.queries import all_queries
    out = all_queries()["dedup_cluster_quality_survivors"](
        spark, "/root/testdata/sf0.001").cache()
    try:
        rows = out.collect()
        by_cluster: dict = {}
        for r in rows:
            by_cluster.setdefault(r["cluster_id"], []).append(r)
        for cid, members in by_cluster.items():
            keepers = [m for m in members if m["is_keeper"] == 1]
            assert len(keepers) == 1
            k = keepers[0]
            best = min(members,
                       key=lambda m: (-m["n_words"], m["doc_id"]))
            assert (k["doc_id"], k["n_words"]) == \
                (best["doc_id"], best["n_words"])
            assert all(m["cluster_size"] == len(members) for m in members)
    finally:
        out.unpersist()


# ---------------------------------------------------------------------------
# BPE artifacts: vocab mass conservation + persisted-model format refusal
# ---------------------------------------------------------------------------


def test_bpe_vocab_mass_equals_encoded_tokens(spark):
    """Total vocab frequency mass == total encoded token count (both
    count every token emission over the corpus)."""
    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.bpe import (bpe_encode_stats,
                                                    bpe_train, bpe_vocab)
    docs = load(spark, "/root/testdata/sf0.001", "documents")
    vocab_mass = bpe_vocab(docs, n_merges=6) \
        .agg({"freq": "sum"}).first()[0]
    merges = bpe_train(docs, n_merges=6)
    enc_mass = bpe_encode_stats(docs, merges) \
        .agg({"n_bpe_tokens": "sum"}).first()[0]
    assert vocab_mass == enc_mass


def test_bpe_model_format_refusal(spark, tmp_path):
    """A model written under a different format marker must be refused
    loudly, not silently re-segmented."""
    import pytest as _pytest
    from pyspark.sql import functions as F
    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.bpe import (bpe_train,
                                                    read_bpe_model,
                                                    write_bpe_model)
    docs = load(spark, "/root/testdata/sf0.001", "documents")
    merges = bpe_train(docs, n_merges=3)
    path = str(tmp_path / "model")
    write_bpe_model(merges, path)
    assert read_bpe_model(spark, path).count() == 3
    # corrupt the marker -> loud refusal
    stale = spark.read.parquet(f"{path}/merges") \
        .withColumn("fmt", F.lit("bpe.v0"))
    stale.write.mode("overwrite").parquet(f"{path}2/merges")
    with _pytest.raises(ValueError, match="format"):
        read_bpe_model(spark, f"{path}2")


def test_nb_langid_invariants(spark):
    """Every eval doc with >=1 word gets exactly one prediction drawn
    from the train label set; rerun is bit-identical (determinism)."""
    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.text import nb_classifier_predict
    docs = load(spark, "/root/testdata/sf0.001", "documents")
    train = docs.filter("doc_id % 5 != 0")
    ev = docs.filter("doc_id % 5 = 0")
    p1 = nb_classifier_predict(train, ev)
    rows = p1.collect()
    n_eval = ev.selectExpr(
        "size(filter(split(regexp_replace(lower(text), '[^a-z0-9 ]', ' '),"
        " ' +'), x -> x != '')) AS n").filter("n >= 1").count()
    assert len(rows) == n_eval
    assert len({r["doc_id"] for r in rows}) == len(rows)
    train_labels = {r["lang"] for r in train.select("lang").distinct().collect()}
    assert {r["lang_pred"] for r in rows} <= train_labels
    rows2 = {(r["doc_id"], r["lang_pred"])
             for r in nb_classifier_predict(train, ev).collect()}
    assert rows2 == {(r["doc_id"], r["lang_pred"]) for r in rows}


def test_wave5c_oracles(spark, duck):
    for name in ("similarity_ivfsq8_topk", "sketch_hll_distinct_words"):
        compare_query(spark, duck, name)


def test_ivfsq8_equals_sq8_within_cell(spark):
    """IVF-SQ8 must equal the plain SQ8 scan restricted to the routed
    cell (routing only prunes, never rescores)."""
    from pyspark.sql import functions as F
    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.similarity import (ivfsq8_topk,
                                                           sq8_topk_adc)
    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter("vec_id = 1").selectExpr("vec_id as q_id", "embedding")
    got = ivfsq8_topk(emb, q, k=5).collect()
    assert len(got) == 5
    # the routed cell is the query's own label cell on this data iff
    # the label centroid is nearest; recompute via the returned ids
    cells = {r["label"] for r in
             emb.join(spark.createDataFrame(
                 [(r["vec_id"],) for r in got], "vec_id bigint"),
                 "vec_id").select("label").collect()}
    assert len(cells) == 1  # all hits from ONE cell
    cell = cells.pop()
    ref = sq8_topk_adc(emb.filter(F.col("label") == cell), q, k=5).collect()
    assert {(r["vec_id"], r["rank"]) for r in got} == \
        {(r["vec_id"], r["rank"]) for r in ref}


def test_hll_small_range_accuracy(spark):
    """At vocab << m the linear-counting correction applies and the
    estimate lands within 30% of exact (deterministically)."""
    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.text import hll_distinct_words
    docs = load(spark, "/root/testdata/sf0.001", "documents")
    for r in hll_distinct_words(docs).collect():
        assert r["rel_error_r"] <= 0.30, r
