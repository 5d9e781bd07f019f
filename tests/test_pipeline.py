"""Training-data pipeline queries vs DuckDB oracle (quality filters,
chunking, scrubbing, reduced-dimension retrieval)."""

import pytest
from pyspark.sql import functions as F

from image_indexing_and_retrival_with_qdrant_spark.registry import REGISTRY

from .oracle import compare

NAMES = [
    "docs_repetition_stats",
    "docs_gopher_filter",
    "docs_chunk_sliding",
    "docs_scrub_pii",
    "emb_matryoshka_top5",
    "emb_random_projection_top5",
    "emb_pca_top5",
    "emb_pca_ivf_top5",
    "docs_pack_sequences",
    "docs_stratified_split",
    "docs_source_mixture",
    "docs_source_profile",
    "docs_unigram_perplexity",
    "docs_dsir_select",
]


@pytest.mark.parametrize("name", NAMES)
def test_pipeline_oracle(spark, sf_smoke, name):
    compare(spark, REGISTRY[name], sf_smoke, name)


def test_chunks_reassemble_and_overlap(spark, sf_smoke):
    """Chunk windows must cover every token (stride < size ⇒ no gaps)
    and consecutive chunks share size-stride tokens."""
    df = REGISTRY["docs_chunk_sliding"].builder(spark, sf_smoke)
    rows = df.filter(F.col("doc_id") == 1).orderBy("chunk_idx").collect()
    assert rows, "doc 1 must produce chunks"
    toks = [t for r in [rows[0]] for t in r.chunk.split(" ")]
    for prev, cur in zip(rows, rows[1:]):
        p, c = prev.chunk.split(" "), cur.chunk.split(" ")
        overlap = len(p) - 24
        assert p[24:] == c[:overlap]  # shared suffix/prefix
        toks.extend(c[overlap:])
    from image_indexing_and_retrival_with_qdrant_spark.tables import load

    full = load(spark, sf_smoke, "documents").filter(F.col("doc_id") == 1)
    expected = full.select(
        F.regexp_extract_all("text", F.lit(r"\w+"), 0).alias("t")
    ).collect()[0].t
    assert toks == list(expected)


def test_scrub_redacts_injected_pii(spark, sf_smoke):
    df = REGISTRY["docs_scrub_pii"].builder(spark, sf_smoke)
    hit = df.filter(F.col("doc_id") % 7 == 0)
    miss = df.filter(F.col("doc_id") % 7 != 0)
    assert hit.filter((F.col("n_emails") != 1) | (F.col("n_urls") != 1)).count() == 0
    assert miss.filter((F.col("n_emails") != 0) | (F.col("n_urls") != 0)).count() == 0


def test_matryoshka_self_hit(spark, sf_smoke):
    rows = REGISTRY["emb_matryoshka_top5"].builder(spark, sf_smoke).collect()
    assert rows[0].vec_id == 7 and rows[0].score == 1.0


def test_pca_self_hit_and_variance_order(spark, sf_smoke):
    """The query point ranks itself first at cosine 1.0, and the
    trained components come out in descending-eigenvalue order with
    the sign convention applied (largest-|x| entry positive)."""
    import numpy as np

    from image_indexing_and_retrival_with_qdrant_spark.queries.pipeline import (
        _np_pca,
    )

    rows = REGISTRY["emb_pca_top5"].builder(spark, sf_smoke).collect()
    assert rows[0].vec_id == 7 and rows[0].score == 1.0
    mu, W = _np_pca(sf_smoke)
    assert len(mu) == 64 and len(W) == 8
    Wn = np.asarray(W)
    # orthonormal rows, sign-fixed
    assert np.allclose(Wn @ Wn.T, np.eye(8), atol=1e-9)
    for row in Wn:
        assert row[int(np.argmax(np.abs(row)))] > 0.0


def test_pca_ivf_probe_is_subset_and_recall(spark, sf_smoke):
    """The probed result is a subset of cells (assignment real) and
    finds the query point itself (cell containing vec 7 is always the
    nearest probe)."""
    rows = REGISTRY["emb_pca_ivf_top5"].builder(spark, sf_smoke).collect()
    assert rows[0].vec_id == 7 and rows[0].score == 1.0
    from image_indexing_and_retrival_with_qdrant_spark.queries.pipeline import (
        _np_pca_probe,
    )

    probe = _np_pca_probe(sf_smoke)
    assert len(probe) == 4 and len(set(probe)) == 4
