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


def test_multimodal_decode_stub():
    from flink_release_1_10_0_spark.llm.multimodal import decode_image
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
