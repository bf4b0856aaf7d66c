"""LLM pipeline operator tests at sf0.001."""

from __future__ import annotations

import pytest

from tests.conftest import compare_query

LLM = [
    "text_quality_stats", "text_token_count", "text_language_id",
    "doc_fingerprint", "dedup_exact_md5", "dedup_wordset_groups",
    "minhash_signatures", "minhash_lsh_dup_pairs", "simhash_fingerprint",
    "ngram_jaccard_pairs", "similarity_cosine_topk", "similarity_ivf_assign",
    "similarity_ivf_topk", "embedding_near_dup_pairs", "embedding_lsh_near_dup",
    "multimodal_metadata_extract",
    "sample_by_hash_30pct", "pipeline_training_data_curation",
    "sample_stratified_by_lang", "dedup_jaccard_clusters",
    "text_repetition_stats", "embedding_quantize_int8",
    "embedding_quantized_topk_recall", "vocab_top_tokens",
    "contamination_5gram_vs_eval", "similarity_kmeans_fit",
]


@pytest.mark.parametrize("name", LLM)
def test_llm(spark, duck, name):
    compare_query(spark, duck, name)


def test_minhash_lsh_finds_known_dups(spark):
    """Exact word-set duplicates must surface as LSH pairs with jaccard=1."""
    from flink_release_1_10_0_spark.llm.dedup import minhash_lsh_pairs, wordset_dedup_groups
    from flink_release_1_10_0_spark.catalog import load
    docs = load(spark, "/root/testdata/sf0.001", "documents")
    groups = wordset_dedup_groups(docs, "doc_id").filter("n_dups > 1")
    pairs = minhash_lsh_pairs(docs, "doc_id", threshold=0.999)
    if groups.count() > 0:
        assert pairs.count() > 0
        assert pairs.filter("jaccard < 0.999").count() == 0


def test_minhash_lsh_xxhash64_mode_consistent(spark):
    """The xxhash64 production path must agree with the md5 oracle path:
    exact-duplicate (jaccard=1) pairs are identical (fp grouping is
    hash-family independent), shared near-dup pairs carry the SAME exact
    jaccard (verification is on true word sets), and overall pair
    overlap is high (candidate sets differ only at the LSH s-curve
    margin where the two hash families band differently)."""
    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.dedup import minhash_lsh_pairs

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    md5 = {(r.id_a, r.id_b): r.jaccard
           for r in minhash_lsh_pairs(docs, "doc_id", method="md5").collect()}
    xxh = {(r.id_a, r.id_b): r.jaccard
           for r in minhash_lsh_pairs(docs, "doc_id", method="xxhash64").collect()}
    md5_exact = {p for p, j in md5.items() if j == 1.0}
    xxh_exact = {p for p, j in xxh.items() if j == 1.0}
    assert md5_exact == xxh_exact
    common = set(md5) & set(xxh)
    assert all(md5[p] == xxh[p] for p in common)
    assert len(common) / max(len(md5), 1) > 0.7


def test_multimodal_decode_stub():
    from flink_release_1_10_0_spark.llm.multimodal import decode_image
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_multimodal_frame_sample_shape(spark):
    """Frame fan-out: one payload row -> N typed frame rows, Arrow-batched."""
    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.multimodal import frame_sample, with_binary_payload

    docs = with_binary_payload(load(spark, "/root/testdata/sf0.001", "documents")).limit(20)
    frames = frame_sample(docs, every_ms=100)
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"doc_id", "frame_idx", "frame_ts_ms", "frame_digest"}
    # fan-out: at least one doc yields multiple frames; idx/ts consistent
    per_doc = pdf.groupby("doc_id")["frame_idx"].max()
    assert (per_doc >= 0).all() and per_doc.max() >= 1
    assert (pdf["frame_ts_ms"] == pdf["frame_idx"] * 100).all()
    # deterministic digests
    pdf2 = frame_sample(docs, every_ms=100).toPandas()
    assert sorted(pdf["frame_digest"]) == sorted(pdf2["frame_digest"])


def test_multimodal_resize_plan_jvm_side(spark):
    """Resize planning preserves aspect ratio and stays within max_side."""
    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.multimodal import resize_plan, with_binary_payload

    docs = with_binary_payload(load(spark, "/root/testdata/sf0.001", "documents")).limit(50)
    plan = resize_plan(docs, max_side=512).toPandas()
    assert (plan["resized_width"] <= 512).all() and (plan["resized_height"] <= 512).all()
    unscaled = plan[plan["scale"] == 1.0]
    assert (unscaled["resized_width"] == unscaled["width"]).all()


def test_dedup_clusters_transitivity(spark):
    """A~B and B~C with no (A, C) pair must still land in ONE cluster."""
    from flink_release_1_10_0_spark.llm.dedup import dedup_clusters
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a bigint, id_b bigint")
    out = {r["doc_id"]: (r["cluster_id"], r["cluster_size"])
           for r in dedup_clusters(pairs).collect()}
    assert out == {1: (1, 3), 2: (1, 3), 3: (1, 3), 7: (7, 2), 8: (7, 2)}


def test_dedup_clusters_empty_pairs(spark):
    """CC over an empty edge set returns an empty cluster table."""
    from flink_release_1_10_0_spark.llm.dedup import dedup_clusters
    pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert dedup_clusters(pairs).count() == 0


def test_repetition_stats_skips_short_docs(spark):
    """Docs with <2 tokens carry no bigram and are excluded entirely."""
    from flink_release_1_10_0_spark.llm.text import repetition_stats
    df = spark.createDataFrame(
        [(1, "one"), (2, "two words here two words")],
        "doc_id bigint, text string")
    rows = {r.doc_id: r for r in repetition_stats(df, "doc_id").collect()}
    assert set(rows) == {2}
    # "two"/"words" appear twice in 5 words; "two words" bigram twice in 4
    assert rows[2].top_word_ratio == 0.4
    assert rows[2].top_bigram_ratio == 0.5


def test_quantize_int8_reconstruction_bound(spark):
    """Symmetric int8: |v - q*scale| <= scale/2 element-wise (+eps)."""
    from flink_release_1_10_0_spark.llm.similarity import quantize_int8
    from pyspark.sql import functions as F
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = quantize_int8(emb)
    bad = q.select(F.expr(
        "size(filter(zip_with(embedding, q, (x, qi) -> "
        "abs(cast(x as double) - qi * scale)), e -> e > scale / 2 + 1e-12))"
    ).alias("n")).agg(F.sum("n").alias("total")).first()["total"]
    assert bad == 0


def test_kmeans_matches_numpy_reference(spark):
    """3 Lloyd's iterations on a small slice must equal a numpy replay
    with the same init/tie-break conventions."""
    import numpy as np

    from flink_release_1_10_0_spark.llm.similarity import kmeans_fit_predict
    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .filter("vec_id < 60"))
    got = {r.vec_id: r.cid for r in
           kmeans_fit_predict(emb, k=3, iterations=3).collect()}
    rows = sorted((r.vec_id, np.array(r.embedding, dtype=np.float64))
                  for r in emb.collect())
    ids = [i for i, _ in rows]
    X = np.stack([v for _, v in rows])
    cents = X[:3].copy()
    for _ in range(3):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin takes the lowest cid on ties
        cents = np.stack([X[assign == c].mean(axis=0) for c in range(3)])
    want = {i: int(c) for i, c in zip(ids, assign)}
    assert got == want


def test_scrub_boilerplate_known_corpus(spark):
    """A segment shared by two docs is removed from both; unique
    segments and the trailing partial segment survive in order."""
    from flink_release_1_10_0_spark.queries import all_queries
    import tempfile, os
    shared = " ".join(f"s{i}" for i in range(8))         # dup segment
    uniq_a = " ".join(f"a{i}" for i in range(8))
    uniq_b = " ".join(f"b{i}" for i in range(8))
    rows = [(0, f"{shared} {uniq_a} tail0", "en", "s", 1),
            (1, f"{shared} {uniq_b}", "en", "s", 1),
            (2, "short doc", "en", "s", 1)]               # < one window
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars int")
    d = tempfile.mkdtemp(prefix="scrub_corpus_")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r for r in
           all_queries()["dedup_scrub_boilerplate"](spark, d).collect()}
    assert out[0].clean_text == f"{uniq_a} tail0"
    assert (out[0].n_segments, out[0].n_removed) == (2, 1)
    assert out[1].clean_text == uniq_b
    assert out[2].clean_text == "short doc"
    assert (out[2].n_segments, out[2].n_removed) == (0, 0)


def test_lsh_survivors_keep_min_id_per_cluster(spark):
    """Near-dup cluster keeps its minimum doc_id; unrelated docs all
    survive."""
    from flink_release_1_10_0_spark.queries import all_queries
    import tempfile, os
    base = " ".join(f"w{i}" for i in range(30))
    near = " ".join(f"w{i}" for i in range(29)) + " zz"   # jaccard ~0.94
    other = " ".join(f"x{i}" for i in range(30))
    rows = [(5, base, "en", "s", 1), (9, near, "en", "s", 1),
            (7, other, "en", "s", 1)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars int")
    d = tempfile.mkdtemp(prefix="surv_corpus_")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = sorted(r.doc_id for r in
                 all_queries()["dedup_lsh_survivors"](spark, d).collect())
    assert got == [5, 7]


def test_minhash_lsh_high_band_geometry(spark):
    """k=32/rows=2 (16 bands) must route through the explode+distinct
    candidate formulation (the first-matching-band join's predicate
    list grows quadratically in bands) and return exactly the
    brute-force exact-Jaccard pairs on a corpus whose near-dups sit far
    above the s-curve midpoint (t ~ (1/16)^(1/2) = 0.25), while the
    default geometry's pairs stay a sound subset."""
    from itertools import combinations

    from flink_release_1_10_0_spark.llm.dedup import minhash_lsh_pairs

    base = [f"w{i}" for i in range(20)]
    texts = {
        1: " ".join(base),                      # J(1,2)=1.0 exact dup
        2: " ".join(base),
        3: " ".join(base[:19] + ["zz"]),        # J(1,3)=19/21≈0.905
        4: " ".join(base[:10] + [f"q{i}" for i in range(10)]),  # J≈0.33
        5: "completely different tokens here nothing shared at all",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id bigint, text string")

    def jac(a, b):
        sa, sb = set(texts[a].split()), set(texts[b].split())
        return len(sa & sb) / len(sa | sb)

    expect = {(a, b) for a, b in combinations(sorted(texts), 2)
              if jac(a, b) >= 0.8}
    high = {(r.id_a, r.id_b)
            for r in minhash_lsh_pairs(docs, "doc_id", k=32, band_rows=2,
                                       threshold=0.8).collect()}
    assert high == expect
    default = {(r.id_a, r.id_b)
               for r in minhash_lsh_pairs(docs, "doc_id",
                                          threshold=0.8).collect()}
    # defaults: no false positives ever (exact verification), and the
    # identical-word-set cluster is found regardless of geometry
    assert default <= expect
    assert (1, 2) in default


def test_incremental_lsh_equals_full_cross_pairs(spark):
    """Incremental dedup (new batch vs the persisted index) must emit
    exactly the full pipeline's pairs restricted to old x new — same
    banding, same verification, no corpus rescan."""
    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.dedup import (
        lsh_incremental_pairs, minhash_index, minhash_lsh_pairs)

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    old = docs.filter("doc_id % 17 <> 0")
    new = docs.filter("doc_id % 17 = 0")
    idx = minhash_index(old, "doc_id").localCheckpoint()
    incr = {(r.old_id, r.new_id): r.jaccard
            for r in lsh_incremental_pairs(idx, new, "doc_id").collect()}

    full = minhash_lsh_pairs(docs, "doc_id", threshold=0.8).collect()
    cross = {}
    for r in full:
        a_new, b_new = r.id_a % 17 == 0, r.id_b % 17 == 0
        if a_new != b_new:   # exactly one side in the batch
            key = (r.id_b, r.id_a) if a_new else (r.id_a, r.id_b)
            cross[key] = r.jaccard
    assert incr == cross
    assert len(incr) > 0   # the synthetic corpus has cross dups


def test_write_minhash_index_roundtrip_bucketed(spark):
    """write_minhash_index persists the index bucketed by bk0 (the
    storage layout minhash_index's docstring prescribes); reading it
    back through the catalog feeds lsh_incremental_pairs unchanged —
    same pairs as the in-memory index — and the scan reports the
    bucket spec."""
    import tempfile

    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.dedup import (
        lsh_incremental_pairs, minhash_index, write_minhash_index)

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    old = docs.filter("doc_id % 17 <> 0")
    new = docs.filter("doc_id % 17 = 0")
    idx = minhash_index(old, "doc_id")
    path = tempfile.mkdtemp(prefix="mh_index_")
    name = write_minhash_index(idx, path, table="mh_idx_test", buckets=8)
    stored = spark.table(name)
    mem = sorted(map(tuple, lsh_incremental_pairs(idx, new, "doc_id")
                     .collect()))
    disk = sorted(map(tuple, lsh_incremental_pairs(stored, new, "doc_id")
                      .collect()))
    assert mem == disk and len(disk) > 0
    desc = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    txt = "\n".join(f"{r.col_name} {r.data_type}" for r in desc)
    assert "bk0" in txt and ("Num Buckets 8" in txt or "8 buckets" in txt)
    spark.sql(f"DROP TABLE {name}")


def test_incremental_prebuilt_index_overload(spark):
    """lsh_incremental_pairs(new_index_df=...) returns the same pairs
    as the new_df text path, and the composed survivors plan contains
    NO signature computation (both index frames are checkpointed once
    — array_min(transform(...)) must not appear downstream)."""
    import pytest as _pytest

    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.dedup import (
        lsh_incremental_pairs, minhash_index)

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    old = docs.filter("doc_id % 17 <> 0")
    new = docs.filter("doc_id % 17 = 0")
    idx = minhash_index(old, "doc_id").localCheckpoint()
    new_idx = minhash_index(new, "doc_id").localCheckpoint()
    via_text = sorted(map(tuple,
                          lsh_incremental_pairs(idx, new, "doc_id")
                          .collect()))
    via_index = sorted(map(tuple,
                           lsh_incremental_pairs(idx, None, "doc_id",
                                                 new_index_df=new_idx)
                           .collect()))
    assert via_text == via_index and len(via_index) > 0
    pairs = lsh_incremental_pairs(idx, None, "doc_id", new_index_df=new_idx)
    from pyspark.sql import functions as F
    survivors = new.join(pairs.select(F.col("new_id").alias("doc_id")),
                         "doc_id", "left_anti").select("doc_id")
    plan = survivors._jdf.queryExecution().executedPlan().toString()
    assert "array_min" not in plan  # signatures computed once, at checkpoint
    with _pytest.raises(ValueError, match="exactly one"):
        lsh_incremental_pairs(idx, new, "doc_id", new_index_df=new_idx)
    with _pytest.raises(ValueError, match="exactly one"):
        lsh_incremental_pairs(idx, None, "doc_id")


def test_incremental_lsh_format_gate(spark):
    """The persisted index carries a (method, formula-version) marker;
    lsh_incremental_pairs refuses an index whose marker is missing (a
    pre-v2 artifact) or written under a different method — the silent
    recall collapse the module header forbids must be a loud error."""
    import pytest as _pytest

    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.dedup import (
        lsh_incremental_pairs, minhash_index)

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    old = docs.filter("doc_id % 17 <> 0")
    new = docs.filter("doc_id % 17 = 0")
    idx = minhash_index(old, "doc_id").localCheckpoint()
    assert idx.select("fmt").first()[0] == "md5.v2"
    # a v1-era artifact has no fmt column at all
    with _pytest.raises(ValueError, match="format marker"):
        lsh_incremental_pairs(idx.drop("fmt"), new, "doc_id")
    # an xxhash64-written index must not join md5 batch signatures
    idx_xx = minhash_index(old, "doc_id",
                           method="xxhash64").localCheckpoint()
    with _pytest.raises(ValueError, match="written under format"):
        lsh_incremental_pairs(idx_xx, new, "doc_id", method="md5")
    # matching marker still flows
    assert lsh_incremental_pairs(idx_xx, new, "doc_id",
                                 method="xxhash64").count() > 0
    # same contract on the SRP and semantic index families
    from flink_release_1_10_0_spark.catalog import load as _load
    from flink_release_1_10_0_spark.llm.dedup import (
        semantic_incremental_pairs, semantic_index, srp_center_stats,
        srp_incremental_pairs, srp_index)

    emb = _load(spark, "/root/testdata/sf0.001", "embeddings")
    e_old = emb.filter("vec_id % 17 <> 0")
    e_new = emb.filter("vec_id % 17 = 0")
    stats = srp_center_stats(e_old).localCheckpoint()
    sidx = srp_index(e_old, stats=stats)
    assert sidx.select("fmt").first()[0] == "srp.v1"
    with _pytest.raises(ValueError, match="format marker"):
        srp_incremental_pairs(sidx.drop("fmt"), e_new, stats=stats)
    rows, cents = semantic_index(e_old, k=8)
    assert rows.select("fmt").first()[0] == "sem.v1"
    with _pytest.raises(ValueError, match="format marker"):
        semantic_incremental_pairs(rows.drop("fmt"), cents, e_new)


def test_pq_adc_survives_cid_gaps(spark):
    """pq_train drops empty clusters (duplicate seed vectors lose every
    tie to the smaller cid), leaving non-contiguous cids; the ADC LUT is
    keyed BY cid, so top-k distances stay exact — a positional LUT
    would silently read the wrong slot.  Crafted corpus: the two
    smallest ids share a vector, so one seed cluster starves."""
    from pyspark.sql import functions as F

    from flink_release_1_10_0_spark.llm.similarity import (
        pq_encode, pq_topk_adc, pq_train)

    dim, m, k = 8, 2, 3
    base = [float(i) for i in range(dim)]
    rows = [(1, base), (2, base)]  # duplicate seeds -> cid gap
    rows += [(i, [float((i * 7 + j * 3) % 11) for j in range(dim)])
             for i in range(3, 40)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cb = pq_train(emb, m=m, k=k, iterations=2, dim=dim)
    cids = sorted(r.cid for r in
                  cb.select("sub", "cid").filter("sub = 0").collect())
    assert cids != list(range(len(cids))), \
        "corpus must actually produce a cid gap for this test to bite"
    codes = pq_encode(emb, cb, m=m, dim=dim)
    q = emb.filter("vec_id = 5").select(
        F.col("vec_id").alias("q_id"), "embedding")
    got = pq_topk_adc(codes, cb, q, k=5, m=m, dim=dim).collect()
    assert len(got) == 5 and all(r.adc_r is not None for r in got)
    # ADC distance for a row must equal the exact L2 from the query
    # slice to that row's ASSIGNED sub-centroids (recompute in python)
    cents = {(r.sub, r.cid): list(r.cvec) for r in cb.collect()}
    code_map = {r.vec_id: list(r.codes) for r in codes.collect()}
    qv = [float(x) for x in
          emb.filter("vec_id = 5").first()["embedding"]]
    sd = dim // m
    for r in got:
        want = 0.0
        for s in range(m):
            cv = cents[(s, code_map[r.vec_id][s])]
            qs = qv[s * sd:(s + 1) * sd]
            want += sum((a - b) ** 2 for a, b in zip(qs, cv))
        assert abs(r.adc_r - round(want, 6)) < 1e-6


def test_winnow_fingerprint_coverage_guarantee(spark):
    """Winnowing's coverage guarantee (Schleimer et al., SIGMOD'03):
    two documents sharing a substring of length >= k + w - 1 share at
    least one fingerprint; unrelated documents of disjoint alphabets
    share none."""
    from flink_release_1_10_0_spark.llm.text import winnow_fingerprints

    shared = "the quick brown fox jumps!"          # 26 chars >= 8+16-1
    rows = [(1, "aaaa " + shared + " bbbb bbbb bbbb"),
            (2, "cccc cccc " + shared + " dddd dd"),
            (3, "zzzz yyyy xxxx wwww vvvv uuuu tttt")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    fps = winnow_fingerprints(df).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared substring must share a fp"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])


def test_winnow_short_doc_filtered(spark):
    """Documents shorter than k + w - 1 chars have no full window and
    are excluded (the sequence() count-down guard)."""
    from flink_release_1_10_0_spark.llm.text import winnow_fingerprints

    df = spark.createDataFrame([(1, "tiny text")],
                               "doc_id bigint, text string")
    assert winnow_fingerprints(df).count() == 0


# --------------------------------------------------------------------------
# Embedding-cosine near-dup: SRP LSH (llm/dedup.py embedding_srp_pairs)
# --------------------------------------------------------------------------

def test_embedding_srp_oracle(spark, duck):
    from tests.conftest import compare_query
    compare_query(spark, duck, "dedup_embedding_srp")
    compare_query(spark, duck, "dedup_embedding_cosine_exact")


def test_srp_candidates_subset_of_exact(spark):
    """Every SRP-emitted pair must appear in the exact quadratic baseline
    (same threshold): LSH affects recall, never precision."""
    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.dedup import (
        embedding_cosine_pairs_exact, embedding_srp_pairs)
    from tests.conftest import SF_DIR

    emb = load(spark, SF_DIR, "embeddings").filter("vec_id < 120")
    srp = {(r.id_a, r.id_b, r.cosine)
           for r in embedding_srp_pairs(emb, threshold=0.3).collect()}
    exact = {(r.id_a, r.id_b, r.cosine)
             for r in embedding_cosine_pairs_exact(
                 emb, threshold=0.3).collect()}
    assert srp <= exact
    assert len(exact) > 0


def test_srp_signature_determinism_and_range(spark):
    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.dedup import srp_signatures
    from tests.conftest import SF_DIR

    emb = load(spark, SF_DIR, "embeddings").filter("vec_id < 50")
    s1 = srp_signatures(emb, planes_per_band=4, n_bands=4).collect()
    s2 = srp_signatures(emb, planes_per_band=4, n_bands=4).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    for r in s1:
        for b in range(4):
            assert 0 <= r[f"sk{b}"] < 16


def test_srp_incremental_matches_full_restricted(spark):
    """Incremental old-vs-new pairs == the full pair set restricted to
    (old, new) when both sign against the SAME centroid (the index's —
    srp_index docstring); and always a subset of the exact quadratic
    pairs (precision is never approximate)."""
    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.dedup import (
        embedding_cosine_pairs_exact, embedding_srp_pairs,
        srp_center_stats, srp_incremental_pairs, srp_index)
    from tests.conftest import SF_DIR

    emb = load(spark, SF_DIR, "embeddings")
    old_stats = srp_center_stats(emb.filter("vec_id < 60"))
    idx = srp_index(emb.filter("vec_id < 60"))
    inc = {(r.old_id, r.new_id, r.cosine)
           for r in srp_incremental_pairs(
               idx, emb.filter("vec_id >= 60"), threshold=0.3).collect()}
    full = {(r.id_a, r.id_b, r.cosine)
            for r in embedding_srp_pairs(emb, threshold=0.3,
                                         stats=old_stats).collect()
            if r.id_a < 60 <= r.id_b}
    assert inc == full
    exact = {(r.id_a, r.id_b, r.cosine)
             for r in embedding_cosine_pairs_exact(
                 emb, threshold=0.3).collect()
             if r.id_a < 60 <= r.id_b}
    assert inc <= exact


def test_dsir_importance_enriches_target_class(spark, duck):
    """DSIR resampling keeps the target class at a higher rate than the
    rest, deterministically (llm/text.py dsir_log_ratio)."""
    from tests.conftest import SF_DIR, compare_query
    compare_query(spark, duck, "sample_dsir_importance")

    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.queries import all_queries
    docs = load(spark, SF_DIR, "documents").select("doc_id", "lang")
    kept = all_queries()["sample_dsir_importance"](spark, SF_DIR) \
        .join(docs, "doc_id")
    rates = {r.lang: r.rate for r in
             kept.groupBy("lang").count()
             .join(docs.groupBy("lang").count()
                   .withColumnRenamed("count", "total"), "lang")
             .selectExpr("lang", "count / total AS rate").collect()}
    assert rates.get("de", 0) >= max(
        v for k, v in rates.items() if k != "de")
    # deterministic: second run keeps the identical set
    a = {r.doc_id for r in
         all_queries()["sample_dsir_importance"](spark, SF_DIR).collect()}
    b = {r.doc_id for r in
         all_queries()["sample_dsir_importance"](spark, SF_DIR).collect()}
    assert a == b


def test_bloom_contamination_equals_exact(spark):
    """The Bloom bitmap only PREFILTERS: output must equal the exact
    gram-join operator row-for-row, and the prefilter must actually
    prune the corpus gram stream."""
    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.text import (
        ngram_contamination, ngram_contamination_bloom)
    from tests.conftest import SF_DIR

    docs = load(spark, SF_DIR, "documents")
    train = docs.filter("source <> 'src0'")
    ev = docs.filter("source = 'src0'")
    exact = {tuple(r) for r in ngram_contamination(train, ev, n=5).collect()}
    bloom = {tuple(r) for r in
             ngram_contamination_bloom(train, ev, n=5).collect()}
    assert bloom == exact
    # tiny filter (few bits) must still be exact — FP rate near 1,
    # pruning near 0, output unchanged
    tiny = {tuple(r) for r in
            ngram_contamination_bloom(train, ev, n=5, m_bits=256,
                                      k_hashes=2).collect()}
    assert tiny == exact


def test_semantic_dedup_subset_of_exact(spark):
    """SemDeDup pairs are cluster-pruned exact-cosine pairs: every
    emitted pair appears in the quadratic exact set with the identical
    cosine (pruning loses pairs, never invents or perturbs them), and
    the plan never goes cartesian or Python-side."""
    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.dedup import (
        embedding_cosine_pairs_exact, semantic_dedup_pairs)
    from tests.conftest import SF_DIR

    emb = load(spark, SF_DIR, "embeddings")
    sem = semantic_dedup_pairs(emb, k=8, iterations=2, threshold=0.3)
    exact = {(r.id_a, r.id_b): r.cosine
             for r in embedding_cosine_pairs_exact(
                 emb, threshold=0.3).collect()}
    got = {(r.id_a, r.id_b): r.cosine for r in sem.collect()}
    assert got and all(exact.get(p) == c for p, c in got.items())
    plan = sem._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_scrub_duplicate_spans_keeper_and_short_docs(spark):
    """ExactSubstr scrub invariants on a crafted corpus: the global
    first occurrence of a shared span survives, later occurrences are
    removed, a span repeated only WITHIN one doc is kept, and docs
    shorter than n tokens pass through whole."""
    from flink_release_1_10_0_spark.llm.dedup import scrub_duplicate_spans

    span = "one two three four"
    docs = spark.createDataFrame(
        [(1, f"intro {span} outro"),
         (2, f"start {span} end"),          # later occurrence -> scrubbed
         (3, f"{span} mid {span}"),         # also shares the span -> scrubbed
         (4, "tiny doc")],                  # < n tokens -> untouched
        "doc_id bigint, text string")
    out = {r.doc_id: r for r in
           scrub_duplicate_spans(docs, n=4).collect()}
    assert out[1].scrubbed_text == f"intro {span} outro"
    assert out[1].kept_tokens == 6 and out[1].total_tokens == 6
    # doc 2: the 4 span tokens scrubbed, neighbors kept
    assert out[2].scrubbed_text == "start end"
    assert out[2].kept_tokens == 2
    # doc 3: BOTH its occurrences are non-keepers (doc 1 owns the
    # keeper), and the rolling windows bridging 'mid' are unique to
    # doc 3 — only tokens covered by the shared span's occurrences go
    assert out[3].scrubbed_text == "mid"
    assert out[4].scrubbed_text == "tiny doc"
    assert out[4].kept_tokens == 2 and out[4].total_tokens == 2


def test_semantic_dedup_target_cluster_size(spark):
    """The scale-invariant lever IS the default: with neither k nor
    target_cluster_size given, k derives from target_cluster_size=250
    (the scale-safe geometry) — fixed-k and derived-k agree when they
    resolve to the same k, and passing both refuses loudly."""
    import pytest

    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.dedup import semantic_dedup_pairs
    from tests.conftest import SF_DIR

    emb = load(spark, SF_DIR, "embeddings")
    n = emb.count()
    target = -(-n // 8)           # ceil(n/8) -> derived k == 8
    fixed = {(r.id_a, r.id_b, r.cosine)
             for r in semantic_dedup_pairs(emb, k=8, threshold=0.3).collect()}
    derived = {(r.id_a, r.id_b, r.cosine)
               for r in semantic_dedup_pairs(
                   emb, k=None, target_cluster_size=target,
                   threshold=0.3).collect()}
    assert fixed == derived
    # the bare default is the derived-k shape at target=250
    k_default = max(1, -(-n // 250))
    dflt = {(r.id_a, r.id_b, r.cosine)
            for r in semantic_dedup_pairs(emb, threshold=0.3).collect()}
    explicit = {(r.id_a, r.id_b, r.cosine)
                for r in semantic_dedup_pairs(
                    emb, k=k_default, threshold=0.3).collect()}
    assert dflt == explicit
    with pytest.raises(ValueError, match="exactly one"):
        semantic_dedup_pairs(emb, k=8, target_cluster_size=100)


def test_semantic_index_incremental_and_roundtrip(spark):
    """semantic_incremental_pairs: (1) every emitted pair is an exact
    old-x-new cosine pair (cluster pruning loses pairs, never invents
    or perturbs them); (2) both ids share the persisted-centroid
    cluster; (3) the write/read round-trip returns identical pairs and
    the table is bucketed by cid."""
    import tempfile

    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.dedup import (
        embedding_cosine_pairs_exact, read_semantic_index,
        semantic_incremental_pairs, semantic_index, write_semantic_index)
    from flink_release_1_10_0_spark.llm.similarity import kmeans_assign
    from tests.conftest import SF_DIR

    emb = load(spark, SF_DIR, "embeddings")
    old = emb.filter("vec_id % 17 <> 0")
    new = emb.filter("vec_id % 17 = 0")
    rows, cents = semantic_index(old, k=8, iterations=2)
    got = {(r.old_id, r.new_id): r.cosine
           for r in semantic_incremental_pairs(rows, cents, new,
                                               threshold=0.3).collect()}
    assert got, "synthetic corpus must produce cross pairs"
    exact = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b)): r.cosine
             for r in embedding_cosine_pairs_exact(
                 emb, threshold=0.3).collect()}
    for (o, n), c in got.items():
        assert exact.get((min(o, n), max(o, n))) == c
    # same-cluster invariant under the PERSISTED centroids
    cid = {r.vec_id: r.cid
           for r in kmeans_assign(emb, cents).select("vec_id",
                                                     "cid").collect()}
    assert all(cid[o] == cid[n] for o, n in got)
    # persisted round-trip
    path = tempfile.mkdtemp(prefix="sem_idx_test_")
    name = write_semantic_index(rows, cents, path,
                                table="sem_idx_test", buckets=8)
    stored, pcents = read_semantic_index(spark, path, name)
    disk = {(r.old_id, r.new_id): r.cosine
            for r in semantic_incremental_pairs(stored, pcents, new,
                                                threshold=0.3).collect()}
    assert disk == got
    desc = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    txt = "\n".join(f"{r.col_name} {r.data_type}" for r in desc)
    assert "cid" in txt and ("Num Buckets 8" in txt or "8 buckets" in txt)
    spark.sql(f"DROP TABLE {name}")


def test_srp_index_writer_roundtrip(spark):
    """write_srp_index persists rows bucketed by sk0 + the centroid
    sidecar; incremental pairs off the read-back artifact equal the
    in-memory path exactly."""
    import tempfile

    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.dedup import (
        read_srp_index, srp_center_stats, srp_incremental_pairs,
        srp_index, write_srp_index)
    from tests.conftest import SF_DIR

    emb = load(spark, SF_DIR, "embeddings")
    old, new = emb.filter("vec_id < 60"), emb.filter("vec_id >= 60")
    stats = srp_center_stats(old)
    idx = srp_index(old, stats=stats)
    path = tempfile.mkdtemp(prefix="srp_idx_") + "/idx"
    name = write_srp_index(idx, stats, path)
    back, back_stats = read_srp_index(spark, path, name)
    mem = {(r.old_id, r.new_id, r.cosine)
           for r in srp_incremental_pairs(idx, new, threshold=0.3).collect()}
    # production path: sign the batch against the PERSISTED centroid
    # (stats=back_stats) — no index rescan, keys align with stored ones
    disk = {(r.old_id, r.new_id, r.cosine)
            for r in srp_incremental_pairs(back, new, threshold=0.3,
                                           stats=back_stats).collect()}
    assert mem == disk and len(back_stats.first()["__qs"]) == 64
    # an index grown by an appended batch still matches when signed with
    # the ORIGINAL stats (the contract the stats parameter exists for)
    grown = back.unionByName(srp_index(new, stats=back_stats))
    more = {(r.old_id, r.new_id)
            for r in srp_incremental_pairs(
                grown, new.limit(0).unionByName(new), threshold=0.3,
                stats=back_stats).collect()}
    assert {(a, b) for a, b, _ in disk} <= more


def test_tfidf_cosine_identical_and_disjoint_docs(spark):
    """TF-IDF cosine invariants on a crafted corpus: identical docs
    cosine 1.0, docs sharing no term emit no pair, and a stop word
    above max_df_ratio is dropped from the vectors (its exclusive pair
    disappears)."""
    from flink_release_1_10_0_spark.llm.ir import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"),
         (3, "delta epsilon zeta"),
         (4, "common only here"), (5, "common other words"),
         (6, "common third doc")],
        "doc_id bigint, text string")
    got = {(r.id_a, r.id_b): r.cosine
           for r in tfidf_cosine_pairs(docs, threshold=0.0).collect()}
    assert got[(1, 2)] == 1.0
    assert not any({a, b} == {1, 3} or {a, b} == {2, 3} for a, b in got)
    # 'common' (df=3) links 4 and 5; a max_df of 2/6 drops it from the
    # vectors while alpha/beta/gamma (df=2) survive
    assert (4, 5) in got
    pruned = {(r.id_a, r.id_b)
              for r in tfidf_cosine_pairs(docs, threshold=0.0,
                                          max_df_ratio=0.4).collect()}
    assert (4, 5) not in pruned and (1, 2) in pruned


def test_bm25_favors_tf_and_rare_terms(spark):
    """BM25 sanity: a doc with more query-term occurrences outranks one
    with fewer (same length), and a doc matching a RARE query term
    outranks one matching only the common term."""
    from flink_release_1_10_0_spark.llm.ir import bm25_topk

    docs = spark.createDataFrame(
        [(1, "spark spark spark pad pad pad pad pad"),
         (2, "spark pad pad pad pad pad pad pad"),
         (3, "rareword pad pad pad pad pad pad pad"),
         (4, "common pad pad pad pad pad pad pad"),
         (5, "common filler lines here pad pad pad pad"),
         (6, "common more filler here pad pad pad pad")],
        "doc_id bigint, text string")
    r = {row.id: row.rank for row in
         bm25_topk(docs, ["spark"], k=3).collect()}
    assert r[1] < r[2]
    r2 = {row.id: row.score_r for row in
          bm25_topk(docs, ["rareword", "common"], k=6).collect()}
    assert r2[3] > r2[4]  # rare term beats common term at equal tf/dl


def test_best_fit_decreasing_beats_next_fit_fill(spark):
    """BFD invariants: no sequence exceeds the budget (except isolated
    oversize docs), every doc appears exactly once, and BFD needs no
    more sequences than next-fit on the same corpus."""
    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.packing import (
        pack_sequences_best_fit, pack_sequences_next_fit)

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    bfd = pack_sequences_best_fit(docs, budget=512, n_buckets=1).collect()
    nf = pack_sequences_next_fit(docs, budget=512, n_buckets=1).collect()
    assert len(bfd) == len(nf) == docs.count()
    fills = {}
    for r in bfd:
        key = (r.grp, r.bucket, r.seq_id)
        fills[key] = fills.get(key, 0) + r.n_tok
        assert r.offset + r.n_tok <= 512 or r.offset == 0  # oversize isolated
    n_seq_bfd = len(fills)
    n_seq_nf = len({(r.grp, r.bucket, r.seq_id) for r in nf})
    assert n_seq_bfd <= n_seq_nf


def test_pq_append_preserves_old_rows_and_codes(spark):
    """pq_append_to_index: old partitions are untouched, appended rows
    carry exactly the codes the persisted codebooks produce, and each
    appended row lands in its nearest-centroid cell."""
    import shutil
    import tempfile

    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.similarity import (
        pq_append_to_index, pq_encode, pq_train, write_pq_index)

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    old = emb.filter("vec_id % 17 <> 0")
    new = emb.filter("vec_id % 17 = 0")
    cb = pq_train(old, m=4, k=8, iterations=2)
    codes = pq_encode(old, cb, m=4)
    path = tempfile.mkdtemp(prefix="pq_append_test_")
    shutil.rmtree(path)
    write_pq_index(old, codes, cb, path)
    before = {r.vec_id: (list(r.codes), r.label)
              for r in spark.read.parquet(path).collect()}
    pq_append_to_index(spark, path, new, m=4)
    after = {r.vec_id: (list(r.codes), r.label)
             for r in spark.read.parquet(path).collect()}
    assert all(after[v] == before[v] for v in before)  # old untouched
    appended = {v for v in after if v not in before}
    assert appended == {r.vec_id for r in new.select("vec_id").collect()}
    want = {r.vec_id: list(r.codes)
            for r in pq_encode(new, cb, m=4).collect()}
    assert all(after[v][0] == want[v] for v in appended)
    shutil.rmtree(path, ignore_errors=True)


def test_bm25_batch_matches_single_query(spark):
    """bm25_topk_batch must rank exactly like the single-query path for
    the same query — the two surfaces share the determinism contract."""
    from pyspark.sql import functions as F

    from flink_release_1_10_0_spark.catalog import load
    from flink_release_1_10_0_spark.llm.ir import bm25_topk, bm25_topk_batch

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    terms = ["spark", "window", "merge"]
    single = [(r.id, r.score_r, r.rank)
              for r in bm25_topk(docs, terms, k=10).collect()]
    q = spark.createDataFrame([(0, terms)],
                              "q_id bigint, terms array<string>")
    batch = [(r.id, r.score_r, r.rank)
             for r in sorted(bm25_topk_batch(docs, q, k=10).collect(),
                             key=lambda r: r.rank)]
    assert batch == sorted(single, key=lambda x: x[2])
