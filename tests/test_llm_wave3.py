"""Wave-3 LLM pipeline operators: next-fit sequence packing, Gopher
quality rules, temperature mixture resampling, product quantization.
Oracle compares at sf0.001 plus property tests against brute-force
Python models."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, compare_query

WAVE3 = [
    "pack_sequences_next_fit", "pack_sequences_fill_stats",
    "text_gopher_quality", "sample_temperature_mixture",
    "similarity_pq_codebook", "similarity_pq_encode_hist",
    "similarity_pq_topk_recall", "similarity_ivfpq_topk",
    "text_bigram_perplexity", "pack_sequences_materialize",
    "pipeline_curation_pack_v2", "similarity_pq_index_topk",
    "pack_sequences_bucketed",
]


@pytest.mark.parametrize("name", WAVE3)
def test_wave3_oracle(spark, duck, name):
    compare_query(spark, duck, name)


def _load_docs(spark):
    from flink_release_1_10_0_spark.catalog import load
    return load(spark, SF_DIR, "documents")


def test_next_fit_matches_python_model(spark):
    """The distributed packer must reproduce a single-threaded next-fit
    reference over the same (md5(id), id) layout order."""
    import hashlib

    from flink_release_1_10_0_spark.llm.packing import pack_sequences_next_fit

    budget = 128
    docs = _load_docs(spark)
    plan = {(r["grp"], r["id"]): (r["seq_id"], r["offset"], r["n_tok"])
            for r in pack_sequences_next_fit(docs, budget=budget).collect()}

    rows = [(r["source"], r["doc_id"], len(r["text"].split(" ")))
            for r in docs.collect()]
    by_grp: dict[str, list[tuple[str, int, int]]] = {}
    for src, did, n in rows:
        h = hashlib.md5(str(did).encode()).hexdigest()
        by_grp.setdefault(src, []).append((h, did, n))
    expected = {}
    for src, items in by_grp.items():
        seq, fill, first = 0, 0, True
        for h, did, n in sorted(items):
            if not first and fill + n > budget:
                seq, fill = seq + 1, 0
            first = False
            expected[(src, did)] = (seq, fill, n)
            fill += n
    assert plan == expected


def test_next_fit_budget_invariant(spark):
    """No sequence exceeds the budget unless it holds exactly one
    (oversize) document; offsets tile each sequence contiguously."""
    from pyspark.sql import functions as F

    from flink_release_1_10_0_spark.llm.packing import pack_sequences_next_fit

    budget = 64
    plan = pack_sequences_next_fit(_load_docs(spark), budget=budget,
                                   n_buckets=4)
    per_seq = (plan.groupBy("grp", "bucket", "seq_id")
               .agg(F.sum("n_tok").alias("tot"),
                    F.count("*").alias("n"),
                    F.min("offset").alias("mn"),
                    F.expr("max(offset + n_tok)").alias("mx"))
               .collect())
    assert per_seq
    for r in per_seq:
        if r["n"] > 1:
            assert r["tot"] <= budget, r
        assert r["mn"] == 0 and r["mx"] == r["tot"], r


def test_gopher_rules_fire_individually(spark):
    """Hand-built docs trip exactly the intended rule."""
    from flink_release_1_10_0_spark.llm.text import gopher_quality_flags

    good = "the be to of and " + " ".join(f"word{i}" for i in range(50))
    docs = spark.createDataFrame(
        [(0, good),                                   # passes everything
         (1, "the of and short doc"),                 # fails word count
         (2, "the of " + " ".join(["supercalifragilistic"] * 60)),  # mean len
         (3, good + " " + "#" * 40),                  # symbol ratio
         (4, " ".join(["1234"] * 60) + " the of"),    # alpha words
         (5, " ".join(f"word{i}" for i in range(60)))],  # no stopwords
        "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in
           gopher_quality_flags(docs, min_words=25).collect()}
    assert out[0]["gopher_keep"]
    assert not out[1]["rule_word_count"] and not out[1]["gopher_keep"]
    assert not out[2]["rule_mean_word_len"]
    assert not out[3]["rule_symbol_ratio"]
    assert not out[4]["rule_alpha_words"]
    assert not out[5]["rule_stopwords"]


def test_temperature_alpha_one_keeps_everything(spark):
    """alpha=1 reproduces the natural mixture: every rate is 1e6 ppm,
    nothing is dropped."""
    from flink_release_1_10_0_spark.llm.text import sample_temperature

    docs = _load_docs(spark)
    kept = sample_temperature(docs, "doc_id", "source", alpha=1.0)
    assert kept.count() == docs.count()


def test_temperature_flattens_mixture(spark):
    """alpha=0.5 keeps a HIGHER fraction of smaller strata (that is the
    point of temperature flattening)."""
    from flink_release_1_10_0_spark.llm.text import sample_temperature

    from pyspark.sql import functions as F

    docs = _load_docs(spark).withColumn(
        "dom", (F.col("doc_id") % 10 < 8).cast("string"))
    # dom 'true' ~80%, dom 'false' ~20%
    kept = sample_temperature(docs, "doc_id", "dom", alpha=0.5)
    base = dict(docs.groupBy("dom").count().collect())
    after = dict(kept.groupBy("dom").count().collect())
    frac_big = after.get("true", 0) / base["true"]
    frac_small = after.get("false", 0) / base["false"]
    assert frac_small > frac_big


def test_pq_codes_shape_and_recall_floor(spark):
    """Every vector gets m in-range codes; the query vector itself
    (dist 0 uncompressed) stays in its own ADC top-10 — the minimal
    sanity bar for a usable quantizer — and exact_l2_topk rank 1 is the
    query itself at distance 0."""
    from pyspark.sql import functions as F

    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm import similarity as S

    emb = load(spark, SF_DIR, "embeddings")
    cb = S.pq_train(emb, m=4, k=8, iterations=2)
    codes = S.pq_encode(emb, cb, m=4)
    bad = codes.filter(
        "size(codes) != 4 OR exists(codes, c -> c < 0 OR c >= 8)")
    assert bad.count() == 0

    q = emb.filter("vec_id < 3").select(F.col("vec_id").alias("q_id"),
                                        "embedding")
    exact = S.exact_l2_topk(emb, q, k=10)
    r1 = {r["q_id"]: (r["vec_id"], r["dist_r"])
          for r in exact.filter("rank = 1").collect()}
    for qid, (vid, d) in r1.items():
        assert vid == qid and d == 0.0

    adc = S.pq_topk_adc(codes, cb, q, k=10, m=4)
    self_hits = adc.filter("q_id = vec_id").count()
    assert self_hits == 3


def test_minhash_v2_formula_matches_python_model(spark):
    """Format-v2 signatures (one digest per word, 4-lane universal-hash
    permutations mod 2^31-1) must match an independent Python
    evaluation — pins the persisted-index format against silent
    drift."""
    import hashlib

    from flink_release_1_10_0_spark.llm.dedup import (_PERM_C, _PERM_P,
                                                      minhash_signatures)

    texts = [(0, "alpha beta gamma"), (1, "delta epsilon"), (2, "alpha")]
    docs = spark.createDataFrame(texts, "doc_id bigint, text string")
    got = {r["doc_id"]: [r[f"m{i}"] for i in range(8)]
           for r in minhash_signatures(docs, "doc_id", k=8).collect()}

    def lanes(word):
        h = hashlib.md5(word.encode()).hexdigest()
        h1, h2 = int(h[:15], 16), int(h[16:30], 16)
        return [h1 % (1 << 30), h1 >> 30, h2 % (1 << 28), h2 >> 28]

    for did, text in texts:
        words = list(dict.fromkeys(text.split(" ")))
        us = [lanes(w) for w in words]
        expect = [min(sum((_PERM_C[4 * i + j] * u[j]) % _PERM_P
                          for j in range(4)) % _PERM_P for u in us)
                  for i in range(8)]
        assert got[did] == expect, did
