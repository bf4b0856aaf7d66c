"""LLM training-data curation queries, wave 2 — segment-level
boilerplate detection, per-source quota sampling, and token-budget shard
packing.  All three are pure DataFrame/SQL plans (no Python row path)
and shuffle only on uniform keys, so they hold at corpus scale.

These extend the reference beyond its own operator set per the brief's
LLM-pipeline mandate (same tier as llm/dedup.py, llm/text.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_release_1_10_0_spark.queries import register
from flink_release_1_10_0_spark.queries.helpers import t

# --------------------------------------------------------------------------
# Segment-level boilerplate: CCNet-style cross-document duplicate-passage
# detection, adapted to the corpus (no newlines, so "paragraph" = each
# complete 8-token window).  Per doc: how many of its segments appear in
# at least one OTHER document.  Plan: tokenize map-side, explode to
# (doc, segment), one shuffle keyed on the segment string (uniform:
# segments are near-unique), shuffle join back, per-doc re-aggregate.
# The frequency table is O(distinct segments) — never driver-collected.
# --------------------------------------------------------------------------
_SEGMENT_W = 8

_BOILERPLATE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS ord
  FROM documents
), seg AS (
  SELECT doc_id, CAST(FLOOR((ord - 1) / {_SEGMENT_W}.0) AS BIGINT) AS seg_no,
         string_agg(tok, ' ' ORDER BY ord) AS segment
  FROM toks GROUP BY doc_id, seg_no
  HAVING COUNT(*) = {_SEGMENT_W}
), freq AS (
  SELECT segment, COUNT(DISTINCT doc_id) AS n_docs FROM seg GROUP BY segment
)
SELECT seg.doc_id AS doc_id,
       COUNT(*) AS n_segments,
       CAST(SUM(CASE WHEN freq.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_segments,
       ROUND(CAST(SUM(CASE WHEN freq.n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS boilerplate_ratio
FROM seg JOIN freq ON seg.segment = freq.segment
GROUP BY seg.doc_id
"""


@register("dedup_segment_boilerplate", _BOILERPLATE_ORACLE)
def dedup_segment_boilerplate(spark, sf_dir):
    from flink_release_1_10_0_spark.llm.text import ensure_min_parallelism
    # guide §2.5: the split+window-slice+explode map side runs TWICE
    # (freq build + join probe) off the raw scan; a 1-split source
    # serializes both (identity at scale)
    docs = ensure_min_parallelism(t(spark, sf_dir, "documents"))
    w = _SEGMENT_W
    # complete w-token windows only; the guard CASE avoids sequence(0,-1)
    # flipping into a descending range on docs shorter than one window
    segs = (docs
            .select("doc_id", F.split("text", " ").alias("toks"))
            .select("doc_id", F.expr(
                f"CASE WHEN size(toks) >= {w} THEN "
                f"transform(sequence(0, int(floor(size(toks)/{w})) - 1), "
                f"          i -> concat_ws(' ', slice(toks, i*{w}+1, {w}))) "
                f"ELSE array() END").alias("segs"))
            .select("doc_id", F.explode("segs").alias("segment")))
    freq = (segs.groupBy("segment")
            .agg(F.countDistinct("doc_id").alias("n_docs")))
    joined = segs.join(freq, "segment")
    dup = F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).cast("bigint")
    return (joined.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_segments"),
                 dup.alias("dup_segments"))
            .select("doc_id", "n_segments", "dup_segments",
                    F.round(F.col("dup_segments").cast("double")
                            / F.col("n_segments").cast("double"), 6)
                    .alias("boilerplate_ratio")))


# --------------------------------------------------------------------------
# Per-source quota sampling: cap every source at K documents, chosen by
# deterministic hash order (reproducible across runs/engines, unlike
# rand()).  The standard over-represented-domain cap in pretraining
# mixes.  One shuffle keyed on source; the window is per-source, never
# global.  Skew note: a single giant source makes one fat partition —
# at real scale pre-filter with sample_by_hash to ~K' >> K per source
# first (documented here, same pattern as llm/text.py sampling).
# --------------------------------------------------------------------------
_QUOTA_K = 10

_QUOTA_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT doc_id, source, rn FROM ranked WHERE rn <= {_QUOTA_K}
"""


@register("sample_quota_per_source", _QUOTA_ORACLE)
def sample_quota_per_source(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    w = (Window.partitionBy("source")
         .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id"))
    return (docs.withColumn("rn", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rn") <= _QUOTA_K)
            .select("doc_id", "source", "rn"))


# --------------------------------------------------------------------------
# Token-budget shard packing: assign documents to fixed-token-budget
# shards per source (sequence-packing planning for pretraining).  Docs
# are laid out in deterministic hash order; a running token sum places
# each doc in shard floor(tokens_before_doc / budget).  Cumulative sum
# is a per-source window (partitioned, merge-sort within partition);
# output is one row per (source, shard) — tiny.
# --------------------------------------------------------------------------
_SHARD_BUDGET = 512

_PACK_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tok,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), cum AS (
  SELECT source, n_tok,
         SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM tok
)
SELECT source,
       CAST(FLOOR((cum - n_tok) / {_SHARD_BUDGET}.0) AS BIGINT) AS shard_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS shard_tokens
FROM cum GROUP BY source, shard_id
"""


@register("pack_token_budget_shards", _PACK_ORACLE)
def pack_token_budget_shards(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        # packing-family token contract: NON-EMPTY whitespace tokens
        # (see llm/packing.py — empties/doubled spaces carry no budget)
        F.expr("size(filter(split(text, ' '), t -> t <> ''))")
        .cast("bigint").alias("n_tok"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        "doc_id")
    w = (Window.partitionBy("source").orderBy("h", "doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = tok.withColumn("cum", F.sum("n_tok").over(w))
    shard = F.floor((F.col("cum") - F.col("n_tok"))
                    / F.lit(float(_SHARD_BUDGET))).cast("bigint")
    return (cum.groupBy("source", shard.alias("shard_id"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").cast("bigint").alias("shard_tokens")))


# --------------------------------------------------------------------------
# PII scrub audit: the synthetic corpus carries no PII, so the query
# plants deterministic identifiers (an email on every doc_id % 7 == 0,
# a phone on every doc_id % 11 == 0) IDENTICALLY on both engines, runs
# the scrubber, and reports per-source found/redacted counts plus a
# zero post-scrub-hit invariant.  Everything is regexp expressions —
# JVM-side in Spark, RE2 in DuckDB, patterns restricted to the common
# dialect (character classes + bounded quantifiers).
# --------------------------------------------------------------------------
_EMAIL_PAT = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_PAT = "\\+?[0-9][0-9 ()-]{7,13}[0-9]"

_PII_AUDIT_ORACLE = f"""
WITH planted AS (
  SELECT source,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
              ELSE text END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' call +1 415 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                 ELSE '' END AS text
  FROM documents
), counted AS (
  SELECT source,
         len(regexp_extract_all(text, '{_EMAIL_PAT}')) AS n_email,
         len(regexp_extract_all(text, '{_PHONE_PAT}')) AS n_phone,
         regexp_replace(regexp_replace(text, '{_EMAIL_PAT}', '<EMAIL>', 'g'),
                        '{_PHONE_PAT}', '<PHONE>', 'g') AS scrubbed
  FROM planted
)
SELECT source,
       CAST(SUM(n_email) AS BIGINT) AS emails_found,
       CAST(SUM(n_phone) AS BIGINT) AS phones_found,
       CAST(SUM(len(regexp_extract_all(scrubbed, '{_EMAIL_PAT}'))
                + len(regexp_extract_all(scrubbed, '{_PHONE_PAT}'))) AS BIGINT)
         AS post_scrub_hits
FROM counted GROUP BY source
"""


@register("pii_scrub_audit", _PII_AUDIT_ORACLE)
def pii_scrub_audit(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    email = F.concat(F.col("text"), F.lit(" contact user"),
                     F.col("doc_id").cast("string"), F.lit("@example.com"))
    phone = F.concat(F.lit(" call +1 415 555-01"),
                     F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"))
    planted = docs.select(
        "source",
        F.concat(F.when(F.col("doc_id") % 7 == 0, email)
                 .otherwise(F.col("text")),
                 F.when(F.col("doc_id") % 11 == 0, phone)
                 .otherwise(F.lit(""))).alias("text"))
    hits = lambda c, p: F.size(F.regexp_extract_all(c, F.lit(p), F.lit(0)))  # noqa: E731
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_PAT, "<EMAIL>"),
        _PHONE_PAT, "<PHONE>")
    counted = planted.select(
        "source",
        hits(F.col("text"), _EMAIL_PAT).alias("n_email"),
        hits(F.col("text"), _PHONE_PAT).alias("n_phone"),
        scrubbed.alias("scrubbed"))
    return (counted.groupBy("source")
            .agg(F.sum("n_email").cast("bigint").alias("emails_found"),
                 F.sum("n_phone").cast("bigint").alias("phones_found"),
                 F.sum(hits(F.col("scrubbed"), _EMAIL_PAT)
                       + hits(F.col("scrubbed"), _PHONE_PAT))
                 .cast("bigint").alias("post_scrub_hits")))


# --------------------------------------------------------------------------
# Boilerplate SCRUB: the removal counterpart of dedup_segment_boilerplate.
# Drops every complete 8-token segment that appears in more than one
# document (cross-corpus duplicated passage), keeps the trailing partial
# segment verbatim (it is not a complete window, so it never enters the
# frequency table), and reassembles the cleaned text in segment order.
# CCNet-style paragraph scrubbing adapted to the corpus.
#
# Plan shape: tokenize map-side, one shuffle keyed on the segment string
# for the frequency table (uniform — segments are near-unique), join
# back, per-doc re-aggregate with an array_sort on (seg_no, segment)
# structs — no window function, no Python, no driver collect.  The
# frequency table is O(distinct segments) and the reassembly shuffle is
# keyed on doc_id; both hold at corpus scale.
# --------------------------------------------------------------------------
_SCRUB_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS ord
  FROM documents
), stats AS (
  SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id
), seg AS (
  SELECT doc_id, CAST(FLOOR((ord - 1) / {_SEGMENT_W}.0) AS BIGINT) AS seg_no,
         string_agg(tok, ' ' ORDER BY ord) AS segment
  FROM toks GROUP BY doc_id, seg_no
  HAVING COUNT(*) = {_SEGMENT_W}
), freq AS (
  SELECT segment, COUNT(DISTINCT doc_id) AS n_docs FROM seg GROUP BY segment
), det AS (
  SELECT seg.doc_id, COUNT(*) AS n_segments,
         SUM(CASE WHEN freq.n_docs > 1 THEN 1 ELSE 0 END) AS n_removed
  FROM seg JOIN freq ON seg.segment = freq.segment
  GROUP BY seg.doc_id
), keptfull AS (
  SELECT seg.doc_id, seg.seg_no, seg.segment
  FROM seg JOIN freq ON seg.segment = freq.segment
  WHERE freq.n_docs = 1
), rem AS (
  SELECT t.doc_id, CAST(s.n // {_SEGMENT_W} AS BIGINT) AS seg_no,
         string_agg(t.tok, ' ' ORDER BY t.ord) AS segment
  FROM toks t JOIN stats s ON t.doc_id = s.doc_id
  WHERE t.ord > (s.n // {_SEGMENT_W}) * {_SEGMENT_W}
  GROUP BY t.doc_id, s.n
), clean AS (
  SELECT doc_id, string_agg(segment, ' ' ORDER BY seg_no) AS clean_text
  FROM (SELECT * FROM keptfull UNION ALL SELECT * FROM rem) u
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(det.n_segments, 0) AS BIGINT) AS n_segments,
       CAST(COALESCE(det.n_removed, 0) AS BIGINT) AS n_removed,
       COALESCE(clean.clean_text, '') AS clean_text
FROM documents d
LEFT JOIN det ON d.doc_id = det.doc_id
LEFT JOIN clean ON d.doc_id = clean.doc_id
"""


@register("dedup_scrub_boilerplate", _SCRUB_ORACLE)
def dedup_scrub_boilerplate(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    w = _SEGMENT_W
    base = (docs
            .select("doc_id", F.split("text", " ").alias("toks"))
            .withColumn("n", F.size("toks"))
            .withColumn("f", F.floor(F.col("n") / w).cast("int")))
    full = (base
            .select("doc_id", F.posexplode(F.expr(
                f"CASE WHEN n >= {w} THEN "
                f"transform(sequence(0, f - 1), "
                f"          i -> concat_ws(' ', slice(toks, i*{w}+1, {w}))) "
                f"ELSE array() END")).alias("seg_no", "segment")))
    rem = (base.filter(F.col("n") % w > 0)
           .select("doc_id", F.col("f").alias("seg_no"),
                   F.expr(f"concat_ws(' ', slice(toks, f*{w}+1, n - f*{w}))")
                   .alias("segment")))
    freq = full.groupBy("segment").agg(
        F.countDistinct("doc_id").alias("n_docs"))
    joined = full.join(freq, "segment")
    det = (joined.groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_segments"),
                F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
                .alias("n_removed")))
    kept = (joined.filter(F.col("n_docs") == 1)
            .select("doc_id", "seg_no", "segment")
            .unionByName(rem))
    clean = (kept.groupBy("doc_id")
             .agg(F.array_sort(F.collect_list(F.struct("seg_no", "segment")))
                  .alias("ordered"))
             .select("doc_id", F.expr(
                 "concat_ws(' ', transform(ordered, x -> x.segment))")
                 .alias("clean_text")))
    return (docs.select("doc_id")
            .join(det, "doc_id", "left").join(clean, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(F.col("n_segments"), F.lit(0)).cast("bigint")
                    .alias("n_segments"),
                    F.coalesce(F.col("n_removed"), F.lit(0)).cast("bigint")
                    .alias("n_removed"),
                    F.coalesce(F.col("clean_text"), F.lit(""))
                    .alias("clean_text")))


# --------------------------------------------------------------------------
# Cluster-level quality curation (DataComp/SemDeDup-style): assign every
# document's embedding to its nearest label centroid (the IVF routing
# already oracle-verified in similarity_ivf_assign), join the per-doc
# text-quality stats across the modality boundary (vec_id == doc_id),
# and aggregate quality per cluster — the table a curation pipeline
# uses to drop entire low-quality semantic clusters rather than
# filtering doc-by-doc.
#
# Plan: centroids are a tiny broadcast; assignment is map-side zip_with
# math; the cross-modal join and the cluster aggregate shuffle on
# uniform keys (doc_id, then cluster label).  Averages go through exact
# decimal sums so they are order-independent on both engines.
# --------------------------------------------------------------------------
_CLUSTER_QUALITY_ORACLE = """
WITH ex AS (SELECT label, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS v
            FROM embeddings),
cent AS (SELECT label, pos,
                CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS c
         FROM ex GROUP BY label, pos),
cvec AS (SELECT label AS c_label, list(c ORDER BY pos) AS cv FROM cent GROUP BY label),
scored AS (
  SELECT vec_id, c_label,
         round(sqrt(list_sum(list_transform(range(1, 65), i ->
           (CAST(embedding[i] AS DOUBLE) - cv[i]) * (CAST(embedding[i] AS DOUBLE) - cv[i])))), 6) AS dist
  FROM embeddings CROSS JOIN cvec),
assign AS (
  SELECT vec_id, assigned_label FROM (
    SELECT vec_id, c_label AS assigned_label,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, c_label) AS rn
    FROM scored) q
  WHERE rn = 1
), stats AS (
  SELECT doc_id,
         round(CAST(len(list_distinct(words)) AS DOUBLE) / CAST(len(words) AS DOUBLE), 6) AS distinct_ratio,
         round(CAST(len(list_filter(words, x -> x IN ('the','a','of','and','to','in','is','it','for','on'))) AS DOUBLE)
               / CAST(len(words) AS DOUBLE), 6) AS stopword_ratio
  FROM (SELECT doc_id,
               list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
                           x -> x <> '') AS words
        FROM documents) w
)
SELECT a.assigned_label AS cluster, COUNT(*) AS n_docs,
       round(CAST(SUM(CAST(s.distinct_ratio AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS avg_distinct_ratio,
       round(CAST(SUM(CAST(s.stopword_ratio AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS avg_stopword_ratio,
       CAST(SUM(CASE WHEN s.distinct_ratio < 0.55 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low_quality
FROM assign a JOIN stats s ON a.vec_id = s.doc_id
GROUP BY a.assigned_label
"""


@register("curation_cluster_quality", _CLUSTER_QUALITY_ORACLE)
def curation_cluster_quality(spark, sf_dir):
    from flink_release_1_10_0_spark.llm import similarity as S
    from flink_release_1_10_0_spark.llm.text import with_text_stats
    emb = t(spark, sf_dir, "embeddings")
    docs = t(spark, sf_dir, "documents")
    assign = S.ivf_assign(emb)
    stats = (with_text_stats(docs)
             .select("doc_id", "distinct_ratio", "stopword_ratio"))
    joined = assign.join(stats, assign.vec_id == stats.doc_id)
    return (joined.groupBy(F.col("assigned_label").alias("cluster"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.sum(F.col("distinct_ratio").cast("decimal(18,6)"))
                         .cast("double") / F.count(F.lit(1)), 6)
                 .alias("avg_distinct_ratio"),
                 F.round(F.sum(F.col("stopword_ratio").cast("decimal(18,6)"))
                         .cast("double") / F.count(F.lit(1)), 6)
                 .alias("avg_stopword_ratio"),
                 F.sum(F.when(F.col("distinct_ratio") < 0.55, 1).otherwise(0))
                 .cast("bigint").alias("n_low_quality")))


# --------------------------------------------------------------------------
# Quality-weighted sampling: keep each document with probability equal
# to its quality score, DETERMINISTICALLY — the acceptance test is
# hash(doc_id) scaled into [0, 1) against the score, so the same corpus
# always yields the same sample (reproducible mixes, unlike rand()),
# and acceptance is embarrassingly parallel map-side work.  The soft
# alternative to a hard quality cutoff in pretraining-mix construction.
# --------------------------------------------------------------------------
_QWEIGHT_ORACLE = """
WITH stats AS (
  SELECT doc_id, source,
         round(CAST(len(list_distinct(words)) AS DOUBLE) / CAST(len(words) AS DOUBLE), 6) AS quality
  FROM (SELECT doc_id, source,
               list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
                           x -> x <> '') AS words
        FROM documents) w
)
SELECT doc_id, source, quality
FROM stats
WHERE CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) % 1000000 AS DOUBLE)
      < quality * 1000000.0
"""


@register("sample_quality_weighted", _QWEIGHT_ORACLE)
def sample_quality_weighted(spark, sf_dir):
    from flink_release_1_10_0_spark.llm.text import with_text_stats
    docs = t(spark, sf_dir, "documents")
    stats = (with_text_stats(docs)
             .select("doc_id", "source",
                     F.col("distinct_ratio").alias("quality")))
    h = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                16, 10).cast("bigint") % 1000000).cast("double")
    return stats.filter(h < F.col("quality") * 1000000.0)


# --------------------------------------------------------------------------
# Unigram log-probability scoring (CCNet-style perplexity proxy): score
# each document by the average negative log-probability of its tokens
# under the corpus's own unigram distribution — fluent/common-word text
# scores low, gibberish and rare-token noise scores high, which is the
# standard statistical quality screen before an expensive model-based
# filter.  Plan: one explode, one corpus-frequency aggregate keyed on
# the token (uniform shuffle), one join back, one per-doc aggregate.
# The corpus total rides along as a broadcast scalar.  Determinism:
# the ln inputs are identical integers on both engines so per-token
# terms agree to the ulp; the avg's accumulation ORDER differs across
# engines, but reordering ~100 terms of magnitude ~5 perturbs the mean
# by ~1e-13, far inside the 6dp rounding — verified hash-exact at
# sf0.001/0.01/0.1.
# --------------------------------------------------------------------------
_ULOGPROB_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(
           regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
           x -> x <> '')) AS w
  FROM documents
), vocab AS (
  SELECT w, COUNT(*) AS c FROM tok GROUP BY w
), n AS (SELECT COUNT(*) AS total FROM tok)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       round(AVG(ln(CAST(n.total AS DOUBLE)) - ln(CAST(v.c AS DOUBLE))), 6)
         AS avg_neg_logprob
FROM tok t JOIN vocab v ON t.w = v.w CROSS JOIN n
GROUP BY t.doc_id
"""


@register("text_unigram_logprob", _ULOGPROB_ORACLE)
def text_unigram_logprob(spark, sf_dir):
    from flink_release_1_10_0_spark.llm.text import words_expr
    docs = t(spark, sf_dir, "documents")
    tok = (docs.select("doc_id", F.expr(words_expr("text")).alias("words"))
           .select("doc_id", F.explode("words").alias("w")))
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = tok.groupBy().agg(F.count(F.lit(1)).alias("total"))
    joined = tok.join(vocab, "w").crossJoin(F.broadcast(total))
    return (joined.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.avg(F.log(F.col("total").cast("double"))
                               - F.log(F.col("c").cast("double"))), 6)
                 .alias("avg_neg_logprob")))


# --------------------------------------------------------------------------
# DSIR importance resampling (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): weight every document by
# the likelihood ratio of Laplace-smoothed unigram models — TARGET
# (German docs — the 14% minority class, so the ratio has real selectivity) over SOURCE (full corpus) — and keep it with
# probability min(exp(doc log-likelihood ratio), 1), DETERMINISTICALLY via the
# hash-acceptance test (same reproducible-mix construction as
# sample_quality_weighted).  Both the weight and the acceptance operate
# on 6dp-rounded values so the engine and the oracle compare identical
# grid points, never raw accumulator noise.
# --------------------------------------------------------------------------
_DSIR_ORACLE = """
WITH tok AS (
  SELECT doc_id, lang = 'de' AS is_t,
         unnest(list_filter(string_split_regex(
           regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +'),
           x -> x <> '')) AS w
  FROM documents
), vocab AS (
  SELECT w, COUNT(*) AS c_s,
         CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS c_t
  FROM tok GROUP BY w
), consts AS (
  SELECT SUM(c_s) AS total_s, SUM(c_t) AS total_t, COUNT(*) AS v
  FROM vocab
), lr AS (
  SELECT t.doc_id, COUNT(*) AS n_tokens,
         round(SUM((ln(CAST(v.c_t + 1 AS DOUBLE))
                    - ln(CAST(c.total_t + c.v AS DOUBLE)))
                 - (ln(CAST(v.c_s + 1 AS DOUBLE))
                    - ln(CAST(c.total_s + c.v AS DOUBLE)))), 6)
           AS log_ratio_r
  FROM tok t JOIN vocab v ON t.w = v.w CROSS JOIN consts c
  GROUP BY t.doc_id
), wtd AS (
  SELECT doc_id, n_tokens, log_ratio_r,
         round(least(exp(log_ratio_r), 1.0), 6) AS weight_r
  FROM lr)
SELECT doc_id, n_tokens, log_ratio_r, weight_r
FROM wtd
WHERE CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
           AS UBIGINT) % 1000000 AS DOUBLE) < weight_r * 1000000.0
"""


@register("sample_dsir_importance", _DSIR_ORACLE)
def sample_dsir_importance(spark, sf_dir):
    from flink_release_1_10_0_spark.llm.text import dsir_log_ratio

    docs = (t(spark, sf_dir, "documents")
            .withColumn("is_target", F.col("lang") == "de"))
    lr = dsir_log_ratio(docs, target_col="is_target")
    wtd = (lr.withColumn("log_ratio_r", F.round("log_ratio", 6))
           .withColumn("weight_r",
                       F.round(F.least(F.exp(F.col("log_ratio_r")),
                                       F.lit(1.0)), 6)))
    h = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                16, 10).cast("bigint") % 1000000).cast("double")
    return (wtd.filter(h < F.col("weight_r") * 1000000.0)
            .select("doc_id", "n_tokens", "log_ratio_r", "weight_r"))
