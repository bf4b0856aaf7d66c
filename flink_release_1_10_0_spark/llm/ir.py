"""Sparse lexical retrieval / similarity: TF-IDF vectors, exact sparse
cosine pairs over an inverted-index join, and BM25 ranked retrieval.

The dense-embedding families (llm/dedup.py SRP/SemDeDup, llm/similarity.py
IVF/PQ) cover vector search; this module covers the LEXICAL side a
training-data pipeline needs — near-dup candidates where no embeddings
exist yet, and query-driven retrieval for contamination/decontamination
audits (find the training docs that best match an eval question).

Determinism contract (the repo's oracle convention): IDF and BM25
components are pure double expressions of integer statistics (tf, df,
doc length, N) — identical expression shape on both engines gives
bit-identical doubles; every SUM whose addend order an engine could
permute runs over integer-quantized weights (TF-IDF: floor(w * 1e6)
BIGINT, summed as DECIMAL(38,0)) or DECIMAL(28,12)-cast components
(BM25), so cross-engine value hashes match exactly.

Reference: Flink 1.10 ships no IR operators — this extends the engine
per the brief's LLM-pipeline mandate (same tier as llm/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_release_1_10_0_spark.llm.text import (ensure_min_parallelism,
                                                 words_expr)

#: weight quantization scale: floor(tfidf * 1e6) — integer weights make
#: every downstream SUM order-independent (engine-portable), and 1e-6
#: resolution is far below any threshold anyone filters on
_WQ_SCALE = 1_000_000


def tfidf_weights(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  max_df_ratio: float = 1.0) -> DataFrame:
    """Quantized TF-IDF weights, one row per (doc, term):
    ``(id, word, tf, df_t, wq)`` with ``wq = floor(tf * idf * 1e6)``
    and the sklearn smooth idf ``ln((N + 1) / (df + 1)) + 1``.

    ``max_df_ratio`` is stop-word removal: terms present in more than
    that fraction of the corpus are dropped from the VECTORS entirely
    (the standard IR move — and the scale lever: a term's inverted
    list is what downstream self-joins square).  N is read once at
    plan-build time (one count action, the semantic_index pattern).

    Plan: one explode + (id, word) count for tf, one word-keyed count
    for df, one equi-join to attach idf — two shuffles on uniform keys,
    everything else map-side."""
    n = df.count()
    max_df = int(max_df_ratio * n)
    # guide §2.5: tokenize+explode is the corpus hot loop; a 1-split
    # scan runs it serially (identity at scale).  Applied to the
    # explode input ONLY — the count() above stays on the raw scan
    # (measured: a repartition under the count turned a metadata-cheap
    # action into a full shuffle, 0.5 -> 2.0 s on this head)
    tf = (ensure_min_parallelism(df)
          .select(F.col(id_col).alias("id"),
                    F.explode(F.expr(words_expr(text_col))).alias("word"))
          .groupBy("id", "word")
          .agg(F.count(F.lit(1)).alias("tf")))
    dfreq = (tf.groupBy("word")
             .agg(F.count(F.lit(1)).alias("df_t"))
             .filter(F.col("df_t") <= max_df))
    idf = f"ln(({n} + 1) / (df_t + 1)) + 1"
    return (tf.join(dfreq, "word")
            .select("id", "word", "tf", "df_t",
                    F.expr(f"CAST(FLOOR(tf * ({idf}) * {_WQ_SCALE}) "
                           "AS BIGINT)").alias("wq")))


def tfidf_cosine_pairs(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", threshold: float = 0.5,
                       max_df_ratio: float = 1.0,
                       id_limit: int | None = None) -> DataFrame:
    """Exact TF-IDF cosine over all document pairs sharing a term:
    inverted-index self-join per term, pair-keyed dot aggregation,
    norms attached once.  Returns (id_a, id_b, cosine), id_a < id_b,
    cosine >= threshold, cosine exact over the (stop-word-pruned)
    vectors.

    Scale posture — be honest about the regime: the per-term join is
    O(df^2), so the corpus this is EXACT and cheap on is one whose
    vocabulary is large relative to its size (df small per term — real
    text).  On a degenerate corpus where every term is a stop word
    (the synthetic tables: 31 words, median df ~0.8N) there is no
    sparse structure to exploit and this is the quadratic baseline —
    ``id_limit`` fences it exactly like ngram_jaccard_pairs /
    embedding_cosine_pairs_exact, and ``max_df_ratio`` is the
    production lever (drop terms whose inverted lists square too big;
    they carry near-zero idf weight anyway).  For approximate
    at-scale near-dup over text use the MinHash path; this op is the
    lexical EXACT yardstick plus the retrieval building block."""
    d = df
    if id_limit is not None:
        d = d.filter(F.col(id_col) < id_limit)
    w = tfidf_weights(d, id_col, text_col, max_df_ratio).localCheckpoint(eager=False)
    norms = (w.groupBy("id")
             .agg(F.expr("CAST(SUM(CAST(wq * wq AS DECIMAL(38,0))) "
                         "AS DOUBLE)").alias("n2")))
    # df_t >= 2: a term in one document cannot contribute to any pair
    wa = (w.filter("df_t >= 2")
          .select(F.col("id").alias("id_a"), "word",
                  F.col("wq").alias("wa")))
    wb = (w.filter("df_t >= 2")
          .select(F.col("id").alias("id_b"), "word",
                  F.col("wq").alias("wb")))
    dots = (wa.join(wb, "word")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.expr("CAST(SUM(CAST(wa * wb AS DECIMAL(38,0))) "
                        "AS DOUBLE)").alias("dot")))
    return (dots
            .join(norms.select(F.col("id").alias("id_a"),
                               F.col("n2").alias("n2_a")), "id_a")
            .join(norms.select(F.col("id").alias("id_b"),
                               F.col("n2").alias("n2_b")), "id_b")
            .select("id_a", "id_b",
                    F.expr("round(dot / (sqrt(n2_a) * sqrt(n2_b)), 6)")
                    .alias("cosine"))
            .filter(F.col("cosine") >= threshold))


def bm25_topk_batch(df: DataFrame, queries: DataFrame, k: int = 10,
                    id_col: str = "doc_id", text_col: str = "text",
                    query_id_col: str = "q_id",
                    query_terms_col: str = "terms",
                    k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """BM25 for a BATCH of queries — the decontamination-audit shape
    (every eval question retrieves its best-matching training docs in
    one job).  ``queries`` is (q_id, terms array<string>); returns
    (q_id, id, score_r, rank), top-k per query, ties on id.

    Plan: the query table explodes to (q_id, word) and BROADCASTS into
    the postings join, so corpus-wide work stays one explode + one
    (id, word) count regardless of how many queries ride along; df/idf
    is computed per term ONCE over the union of query vocabularies.
    Top-k per query is a SALTED two-stage aggregate (k per (q_id,
    hash-salt) group, then merge n_salts*k survivors) — never a global
    row_number window that would funnel the scored corpus into
    #queries partitions.  Same determinism contract as
    :func:`bm25_topk` (DECIMAL-cast components, rounded scores); the
    two paths must rank identically for a single query."""
    stats = (df.select(F.expr(f"size({words_expr(text_col)})")
                       .cast("bigint").alias("dl"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.avg("dl").alias("avgdl")).first())
    n, avgdl = int(stats["n"]), float(stats["avgdl"])
    qterms = (queries.select(F.col(query_id_col).alias("q_id"),
                             F.explode(query_terms_col).alias("word"))
              .distinct())
    vocab = qterms.select("word").distinct()
    # guide §2.5: the tokenize+explode postings pass is the corpus hot
    # loop; rebalance it only (the scalar stats pass above stays on the
    # raw scan — see tfidf_weights note), identity at scale
    toks = (ensure_min_parallelism(df)
            .select(F.col(id_col).alias("id"),
                      F.expr(words_expr(text_col)).alias("__ws"))
            .select("id", F.expr("size(__ws)").cast("bigint").alias("dl"),
                    F.explode("__ws").alias("word"))
            .join(F.broadcast(vocab), "word"))
    tf = (toks.groupBy("id", "word")
          .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df_t"))
    idf = f"ln(1 + ({n} - df_t + 0.5) / (df_t + 0.5))"
    comp = (f"({idf}) * tf * ({k1} + 1) / "
            f"(tf + {k1} * (1 - {b} + {b} * dl / {avgdl!r}))")
    scored = (tf.join(dfreq, "word")
              .join(F.broadcast(qterms), "word")
              .select("q_id", "id", F.expr(comp).cast("decimal(28,12)")
                      .alias("c"))
              .groupBy("q_id", "id")
              .agg(F.expr("round(CAST(SUM(c) AS DOUBLE), 6)")
                   .alias("score_r")))
    n_salts = 32
    local = (scored
             .groupBy("q_id", F.pmod(F.xxhash64("id"), F.lit(n_salts))
                      .alias("__salt"))
             .agg(F.expr(
                 f"slice(array_sort(collect_list(named_struct("
                 f"'ns', -score_r, 'i', id))), 1, {k})").alias("top")))
    merged = (local.groupBy("q_id")
              .agg(F.expr(
                  f"slice(array_sort(flatten(collect_list(top))), 1, {k})")
                  .alias("top")))
    return (merged
            .select("q_id", F.posexplode("top").alias("__p", "__t"))
            .select("q_id", F.col("__t.i").alias("id"),
                    (-F.col("__t.ns")).alias("score_r"),
                    (F.col("__p") + 1).cast("int").alias("rank")))


def bm25_topk(df: DataFrame, query_terms: list[str], k: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """BM25 ranked retrieval for one query: ``(id, score_r, rank)``,
    top-k by score desc (ties on id asc).

    score = sum over query terms of
    ``idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))``
    with the standard ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))``.

    100 TB design: the query-term list is a literal broadcast filter,
    so only postings of the query's terms ever materialize (the
    inverted-index access path, expressed relationally); corpus-wide
    work is one explode + (id, word) count and one (N, avgdl) scalar
    agg read at plan-build.  Per-term score components are
    DECIMAL(28,12)-cast before the per-doc SUM (order-independent, the
    repo's oracle convention), final score rounded to 6dp.  Top-k is
    TakeOrderedAndProject — never a global window."""
    if not query_terms:
        raise ValueError("query_terms must be a non-empty list")
    qlit = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    stats = (df.select(F.expr(f"size({words_expr(text_col)})")
                       .cast("bigint").alias("dl"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.avg("dl").alias("avgdl")).first())
    n, avgdl = int(stats["n"]), float(stats["avgdl"])
    # guide §2.5: rebalance the postings pass only (see tfidf_weights
    # note on keeping scalar stats on the raw scan), identity at scale
    toks = (ensure_min_parallelism(df)
            .select(F.col(id_col).alias("id"),
                    F.expr(words_expr(text_col)).alias("__ws"))
            .select("id", F.expr("size(__ws)").cast("bigint").alias("dl"),
                    F.explode("__ws").alias("word"))
            .filter(F.expr(f"word IN ({qlit})")))
    tf = (toks.groupBy("id", "word")
          .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df_t"))
    idf = f"ln(1 + ({n} - df_t + 0.5) / (df_t + 0.5))"
    comp = (f"({idf}) * tf * ({k1} + 1) / "
            f"(tf + {k1} * (1 - {b} + {b} * dl / {avgdl!r}))")
    scored = (tf.join(dfreq, "word")
              .select("id", F.expr(comp).cast("decimal(28,12)")
                      .alias("c"))
              .groupBy("id")
              .agg(F.expr("round(CAST(SUM(c) AS DOUBLE), 6)")
                   .alias("score_r")))
    from pyspark.sql import Window
    topk = (scored.orderBy(F.desc("score_r"), F.asc("id")).limit(k))
    w = Window.partitionBy(F.pmod(F.col("id"), F.lit(1))) \
        .orderBy(F.desc("score_r"), F.asc("id"))
    return (topk.withColumn("rank",
                            F.row_number().over(w).cast("int"))
            .select("id", "score_r", "rank"))
