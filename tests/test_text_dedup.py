"""Text-analysis + dedup queries vs DuckDB oracle (SURVEY.md §7 M6)."""

import pytest

from image_indexing_and_retrival_with_qdrant_spark.registry import REGISTRY

from .oracle import compare

TEXT = ["text_token_stats", "text_quality", "text_langid", "text_fingerprint"]
DEDUP = [
    "dedup_exact_groups",
    "dedup_rerun_semantics",
    "dedup_minhash_signatures",
    "dedup_minhash_candidates",
    "dedup_simhash",
    "dedup_simhash_near_pairs",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
]


@pytest.mark.parametrize("name", TEXT + DEDUP)
def test_text_dedup_oracle(spark, sf_smoke, name):
    compare(spark, REGISTRY[name], sf_smoke, name)
