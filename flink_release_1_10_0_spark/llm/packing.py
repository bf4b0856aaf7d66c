"""Training-sequence packing: lay documents out into fixed token-budget
sequences WITHOUT splitting a document (GPT-style sample packing with
document boundaries respected).

This is the planning step every pretraining data pipeline runs after
curation: given N tokenized documents and a context length B, decide
which documents share a training sequence.  The existing
``pack_token_budget_shards`` query is the *block* layout (a running sum
chunked at exact budget multiples — documents may straddle a boundary);
this module is the *next-fit* layout: a document that does not fit in
the current sequence's remaining budget starts a new sequence.  Next-fit
is the standard streaming packer (one pass, no reordering beyond the
deterministic shuffle order) and its fill ratio is the usual packing
metric reported for pretraining runs.

Scale design (100 TB): next-fit is inherently sequential *within* a
pack group, so the parallel unit is the group — ``(group_col, bucket)``
where ``bucket = hash(id) % n_buckets``.  Each group is packed
independently by one task via Arrow-batched ``applyInPandas`` (a single
O(n) numpy pass over the group's rows — no Python per-row overhead
beyond the loop, no shuffle beyond the one groupBy).  Choosing
``n_buckets`` so a group is a few hundred MB keeps every task bounded
regardless of corpus size; sequences never cross buckets by design
(equivalent to sharding the corpus before packing, which is exactly
what production packers do).

The sequential-vs-parallel trade is honest: bin packing across an
entire 100 TB corpus in one ordered stream is not a thing anyone does —
real packers shard first, pack within shards.  The bucketing here IS
that sharding, made explicit and deterministic.

Reference: the reference engine (Flink 1.10) has no packing operator —
this extends it per the brief's LLM-pipeline mandate, same tier as
llm/dedup.py.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences_next_fit(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", budget: int = 512,
                            group_col: str = "source",
                            n_buckets: int | None = None,
                            bucket_hash: str = "xxhash64",
                            target_docs_per_bucket: int = 100_000,
                            n_tok_expr: str | None = None) -> DataFrame:
    """Per-document packing plan: ``(group, bucket, id, n_tok, seq_id,
    offset)`` where ``seq_id`` counts sequences within the
    (group, bucket) shard and ``offset`` is the token position of the
    document inside its sequence.

    Deterministic layout order inside a shard: ``(md5(id), id)`` — the
    same order both engines (and any rerun) produce.  A document longer
    than ``budget`` gets a sequence of its own (next-fit overflows it
    into a fresh sequence; the following document overflows again), so
    oversized docs are isolated, never silently truncated.

    Token-count contract (the packing family's, shared with
    ``pack_token_budget_shards`` and mirrored by every oracle):
    NON-EMPTY whitespace tokens — a raw ``split(text, ' ')`` counts an
    empty document as 1 token and each doubled space as a phantom
    token, so empties are filtered out; an empty document is 0 tokens
    and consumes no budget.  This is deliberately NOT ``words_expr``
    (which lowercases and strips punctuation for dedup/quality):
    packing budgets approximate a tokenizer's whitespace pre-split, so
    punctuation and case must keep their cost.

    ``n_buckets=None`` (the default) DERIVES the shard count from one
    cheap count of the largest group — ceil(max_group_rows /
    target_docs_per_bucket) — so a naive caller on a big corpus never
    packs a whole group on one task (the docstring's few-hundred-MB-
    per-shard rule at ~kB documents); small corpora derive 1 bucket and
    keep the single-stream layout.  Pass an explicit ``n_buckets`` to
    pin the shard geometry (the oracle-gated queries do).

    ``n_tok_expr`` overrides the whitespace token count with any SQL
    expression over the input columns — e.g. a precomputed
    ``n_bpe_tokens`` column when packing by REAL tokenizer cost (the
    ``pipeline_bpe_pack`` composition) instead of the whitespace
    approximation.
    """
    if n_buckets is None:
        biggest = (df.groupBy(group_col).count()
                   .agg(F.max("count")).first()[0]) or 0
        n_buckets = max(1, -(-int(biggest) // target_docs_per_bucket))
    if n_buckets <= 1:
        bucket = F.lit(0)
    elif bucket_hash == "md5":
        # engine-portable bucket assignment (a DuckDB oracle can replay
        # it); xxhash64 is the JVM-native default for production shards
        bucket = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")),
                                     1, 15), 16, 10).cast("bigint")
                  % n_buckets)
    else:
        bucket = F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                        F.lit(n_buckets))
    toks = df.select(
        F.col(group_col).alias("grp"),
        bucket.cast("bigint").alias("bucket"),
        F.col(id_col).alias("id"),
        F.expr(n_tok_expr
               or f"size(filter(split({text_col}, ' '), t -> t <> ''))")
        .cast("bigint").alias("n_tok"),
        F.md5(F.col(id_col).cast("string")).alias("h"))

    schema = ("grp string, bucket bigint, id bigint, n_tok bigint, "
              "seq_id bigint, offset bigint")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["h", "id"], kind="mergesort")
        seq_ids, offsets = [], []
        seq, fill = 0, 0
        first = True
        for n in pdf["n_tok"]:
            n = int(n)
            if not first and fill + n > budget:
                seq += 1
                fill = 0
            first = False
            seq_ids.append(seq)
            offsets.append(fill)
            fill += n
        out = pdf[["grp", "bucket", "id", "n_tok"]].copy()
        out["seq_id"] = pd.Series(seq_ids, index=pdf.index, dtype="int64")
        out["offset"] = pd.Series(offsets, index=pdf.index, dtype="int64")
        return out

    return toks.groupBy("grp", "bucket").applyInPandas(pack, schema)


def pack_sequences_best_fit(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", budget: int = 512,
                            group_col: str = "source",
                            n_buckets: int | None = None,
                            bucket_hash: str = "xxhash64",
                            target_docs_per_bucket: int = 100_000,
                            n_tok_expr: str | None = None) -> DataFrame:
    """Best-fit-decreasing packing plan — same output schema and shard
    contract as :func:`pack_sequences_next_fit`, different layout rule:
    documents are laid out LARGEST FIRST (order ``(n_tok DESC, md5(id),
    id)``) and each goes into the TIGHTEST open sequence that still
    fits (ties -> lowest sequence id); only when none fits does a new
    sequence open.  BFD is the classic offline bin-packing heuristic
    (≤ 11/9 OPT + 4): it trades next-fit's strict one-pass streaming
    for measurably higher fill ratios — use it when the shard is
    materialized anyway (the ``applyInPandas`` group already is), keep
    next-fit for true streaming ingest.  Same token-count contract and
    derived-``n_buckets`` rule as next-fit; within a shard the pass is
    O(n * open_bins) over a numpy frame — bounded by the same
    few-hundred-MB shard rule."""
    if n_buckets is None:
        biggest = (df.groupBy(group_col).count()
                   .agg(F.max("count")).first()[0]) or 0
        n_buckets = max(1, -(-int(biggest) // target_docs_per_bucket))
    if n_buckets <= 1:
        bucket = F.lit(0)
    elif bucket_hash == "md5":
        bucket = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")),
                                     1, 15), 16, 10).cast("bigint")
                  % n_buckets)
    else:
        bucket = F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                        F.lit(n_buckets))
    toks = df.select(
        F.col(group_col).alias("grp"),
        bucket.cast("bigint").alias("bucket"),
        F.col(id_col).alias("id"),
        F.expr(n_tok_expr
               or f"size(filter(split({text_col}, ' '), t -> t <> ''))")
        .cast("bigint").alias("n_tok"),
        F.md5(F.col(id_col).cast("string")).alias("h"))

    schema = ("grp string, bucket bigint, id bigint, n_tok bigint, "
              "seq_id bigint, offset bigint")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import bisect

        pdf = pdf.sort_values(["n_tok", "h", "id"],
                              ascending=[False, True, True],
                              kind="mergesort")
        # open bins as a SORTED list of (remaining, bin_index): the
        # tightest fitting bin = first entry with remaining >= n
        # (smallest remaining, ties -> lowest index — exactly the
        # oracle's list_max + list_position rule).  bisect makes the
        # choice O(log b) per doc instead of an O(b) scan, so a
        # 100k-doc shard at the derived-bucket bound stays cheap
        # (the naive scan is O(n*b) ~ 1e9 ops there).
        open_bins: list[tuple[int, int]] = []  # (remaining, idx), sorted
        fills: list[int] = []
        seq_ids, offsets = [], []
        for n in pdf["n_tok"]:
            n = int(n)
            pos = bisect.bisect_left(open_bins, (n, -1))
            if pos < len(open_bins):
                rem, best = open_bins.pop(pos)
                offsets.append(budget - rem)
                open_bins_insert = (rem - n, best)
            else:
                best = len(fills)
                fills.append(0)
                offsets.append(0)
                open_bins_insert = (budget - n, best)
            seq_ids.append(best)
            fills[best] += n
            bisect.insort(open_bins, open_bins_insert)
        out = pdf[["grp", "bucket", "id", "n_tok"]].copy()
        out["seq_id"] = pd.Series(seq_ids, index=pdf.index, dtype="int64")
        out["offset"] = pd.Series(offsets, index=pdf.index, dtype="int64")
        return out

    return toks.groupBy("grp", "bucket").applyInPandas(pack, schema)


def packing_stats(plan: DataFrame, budget: int = 512) -> DataFrame:
    """Fill-ratio report per (group, bucket): sequences, docs, tokens,
    mean fill ratio (sequence tokens / budget, oversize clipped to the
    real token count so the ratio can exceed 1 for isolated long docs).
    Tiny output — one row per shard."""
    per_seq = (plan.groupBy("grp", "bucket", "seq_id")
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_tok").alias("seq_tokens")))
    return (per_seq.groupBy("grp", "bucket")
            .agg(F.count(F.lit(1)).alias("n_sequences"),
                 F.sum("n_docs").cast("bigint").alias("n_docs"),
                 F.sum("seq_tokens").cast("bigint").alias("total_tokens"),
                 F.round(F.avg(F.col("seq_tokens").cast("double")
                               / F.lit(float(budget))), 6)
                 .alias("mean_fill_ratio")))


def materialize_sequences(plan: DataFrame, docs: DataFrame,
                          id_col: str = "doc_id", text_col: str = "text",
                          sep: str = "<|eos|>") -> DataFrame:
    """Assemble the physical training sequences from a packing plan:
    one row per (grp, bucket, seq_id) with the member documents'
    texts concatenated in offset order, separated by ``sep`` (the EOS
    marker a tokenizer would insert at document boundaries).

    Plan: join the plan to the docs on id (both sides hash-shuffled on
    the uniform id key), then ONE aggregation keyed on the sequence —
    sort_array over collect_list(struct(offset, text)) reassembles
    order without a window.  Output is one row per sequence, the shard
    a writer would emit."""
    joined = (plan.join(docs.select(F.col(id_col).alias("id"), text_col),
                        "id")
              .select("grp", "bucket", "seq_id", "offset", text_col))
    return (joined.groupBy("grp", "bucket", "seq_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.expr(
                     f"concat_ws('{sep}', transform(array_sort("
                     f"collect_list(struct(offset, {text_col}))), "
                     "s -> s.text))").alias("seq_text")))
