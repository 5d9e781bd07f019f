"""OPQ (learned rotation before PQ, Ge et al. CVPR'13): the rotation
is orthonormal and bit-deterministic, it does not increase (and on
correlated data decreases) quantization error vs raw PQ at the same
code budget, and the registered tier hash-matches its DuckDB oracle.
recall_curve.py / BASELINE.md §opq carry the recall-at-equal-bytes
measurement on the clustered corpus."""

import numpy as np
import pytest

from image_indexing_and_retrival_with_qdrant_spark.operators.opq import (
    opq_encode_np,
    opq_train_np,
    rotate_np,
)
from image_indexing_and_retrival_with_qdrant_spark.queries.ann import (
    _np_opq,
    _opq_w,
)
from image_indexing_and_retrival_with_qdrant_spark.registry import REGISTRY

from .oracle import compare


def _clustered(n=2000, d=64, n_clusters=10, sigma=0.18, seed=13):
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, n_clusters, size=n)
    return centers[labels] + sigma * rng.standard_normal((n, d))


def _recon_err(X, R, codebooks):
    """Mean squared reconstruction error ||XR − q(XR)||² — the OPQ
    training objective."""
    Xr = rotate_np(X, np.asarray(R))
    codes = opq_encode_np(Xr, codebooks)
    subdim = len(codebooks[0][0])
    err = 0.0
    for b, cb in enumerate(codebooks):
        sub = Xr[:, b * subdim:(b + 1) * subdim]
        err += float(((sub - np.asarray(cb)[codes[:, b]]) ** 2).sum())
    return err / len(X)


def test_opq_rotation_orthonormal_and_deterministic():
    X = _clustered()
    R1, cb1 = opq_train_np(X, n_blocks=8, k_codes=16)
    R2, cb2 = opq_train_np(X, n_blocks=8, k_codes=16)
    Rm = np.asarray(R1)
    assert float(np.abs(Rm.T @ Rm - np.eye(64)).max()) < 1e-9
    # bit-identical re-train (the property the oracle factory needs)
    assert R1 == R2 and cb1 == cb2


def test_opq_not_worse_than_pq_same_budget():
    """The learned rotation must not increase reconstruction error vs
    raw PQ (identity rotation) at the same 8×16 budget — OPQ's
    alternating minimization shares PQ's objective, so the trained
    point should dominate the identity point (small slack for the
    approximate kmeans inner step)."""
    X = _clustered()
    R, cbs = opq_train_np(X, n_blocks=8, k_codes=16)
    # identity-rotation baseline = plain PQ trained by the same
    # kmeans_np at the same budget
    R0, cbs0 = opq_train_np(X, n_blocks=8, k_codes=16, n_iters=0)
    assert np.allclose(np.asarray(R0), np.eye(64))
    err_opq = _recon_err(X, R, cbs)
    err_pq = _recon_err(X, R0, cbs0)
    assert err_opq <= err_pq * 1.001, (err_opq, err_pq)


def test_opq_rotation_preserves_norms():
    """Orthonormal rotation ⇒ distances/norms preserved: ADC in the
    rotated space approximates the same inner products."""
    X = _clustered(n=200)
    R, _ = opq_train_np(X[:500], n_blocks=8, k_codes=16, n_iters=2)
    Xr = rotate_np(X, np.asarray(R))
    assert np.allclose(np.linalg.norm(Xr, axis=1),
                       np.linalg.norm(X, axis=1), atol=1e-9)


def test_ann_opq_top5_oracle_parity(spark, sf_smoke):
    compare(spark, REGISTRY["ann_opq_top5"], sf_smoke, "ann_opq_top5")


def test_opq_shared_trainer_cached(sf_smoke):
    """Builder and oracle factory must share literal-identical
    (R, codebooks): the module-level cache returns the same object,
    and a fresh re-train of the same prefix reproduces it bitwise."""
    import os

    from image_indexing_and_retrival_with_qdrant_spark.operators.ann import (
        read_vectors_np,
    )
    from image_indexing_and_retrival_with_qdrant_spark.operators.pca import (
        PCA_TRAIN_CAP,
    )

    R, cbs = _np_opq(sf_smoke)
    assert _np_opq(sf_smoke)[0] is R
    X = read_vectors_np(os.path.join(sf_smoke, "embeddings.parquet"))
    R2, cbs2 = opq_train_np(X[:PCA_TRAIN_CAP], n_blocks=8, k_codes=16)
    assert R == R2 and cbs == cbs2


def test_opq_w_is_transpose():
    R = [[1.0, 2.0], [3.0, 4.0]]
    assert _opq_w(R) == [[1.0, 3.0], [2.0, 4.0]]


def test_opq_bad_blocks_raise():
    with pytest.raises(ValueError):
        opq_train_np(_clustered(n=100), n_blocks=7)
