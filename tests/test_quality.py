"""Data-quality / robustness queries vs DuckDB oracle."""

import pytest

from image_indexing_and_retrival_with_qdrant_spark.registry import REGISTRY

from .oracle import compare

NAMES = [
    "ingest_failure_stats",
    "customer_window_showcase",
    "part_name_fuzzy_pairs",
    "events_profile",
]


@pytest.mark.parametrize("name", NAMES)
def test_quality_oracle(spark, sf_smoke, name):
    compare(spark, REGISTRY[name], sf_smoke, name)


def test_colbert_text_search_oracle(spark, sf_smoke):
    compare(spark, REGISTRY["colbert_text_search_top5"], sf_smoke,
            "colbert_text_search_top5")


def test_bm25_search_oracle(spark, sf_smoke):
    compare(spark, REGISTRY["bm25_search_top10"], sf_smoke,
            "bm25_search_top10")


def test_bm25_oracle_sf001(spark, sf_oracle):
    compare(spark, REGISTRY["bm25_search_top10"], sf_oracle,
            "bm25_search_top10")


def test_hybrid_search_oracle(spark, sf_smoke):
    compare(spark, REGISTRY["hybrid_search_rrf_top10"], sf_smoke,
            "hybrid_search_rrf_top10")


def test_bm25_repeated_query_term_counts_twice(spark, sf_smoke):
    """BM25 sums over query terms with multiplicity: repeating a term
    doubles exactly that term's contribution."""
    from pyspark.sql import functions as F

    from image_indexing_and_retrival_with_qdrant_spark.operators.bm25 import bm25_rank
    from image_indexing_and_retrival_with_qdrant_spark.tables import load

    docs = load(spark, sf_smoke, "documents")
    n = docs.count()  # k >= corpus size: nothing truncated
    single = {r.doc_id: r.score
              for r in bm25_rank(docs, ["join"], k=n,
                                 round_digits=None).collect()}
    double = {r.doc_id: r.score
              for r in bm25_rank(docs, ["join", "join"], k=n,
                                 round_digits=None).collect()}
    assert set(single) == set(double)
    for d, s in single.items():
        assert double[d] == pytest.approx(2.0 * s)
