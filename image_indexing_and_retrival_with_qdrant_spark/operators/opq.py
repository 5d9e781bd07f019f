"""OPQ — Optimized Product Quantization (learned orthonormal rotation
before PQ; Ge et al., "Optimized Product Quantization", CVPR 2013;
the FAISS ``OPQ8,PQ8`` index-factory recipe).

PQ's quantization error depends on how the d dimensions are split
into blocks: correlated dimensions landing in different blocks waste
codebook capacity (each block's KMeans must re-model variance another
block already captured). OPQ trains an orthonormal rotation ``R``
minimizing the reconstruction error ``||XR − q(XR)||²`` by
alternating (1) per-block codebook training on the rotated data with
(2) the orthogonal-Procrustes update ``R ← polar(Xᵀ·X̂)`` — then
searches exactly like PQ in the rotated coordinates: rotate the query
driver-side, ADC over the rotated codes. Same code budget as raw PQ,
strictly better (or equal) coordinates.

Determinism (the kmeans_np / pca_train_np discipline, so a query
builder and its DuckDB oracle factory re-derive bit-identical
``(R, codebooks)`` in any process):

- no BLAS GEMM in any reduction whose order could vary with thread
  count — rotations, the d×d cross-covariance ``XᵀX̂``, and the d×d
  products inside the polar decomposition are all per-column pairwise
  ``np.sum`` reductions;
- Procrustes via the polar decomposition ``R = M·(MᵀM)^{−1/2}``
  computed with ``eigh``: the ``V·f(Λ)·Vᵀ`` form is invariant to
  eigenvector sign (and to basis choice inside a degenerate
  eigenspace), the ambiguities eigh has — unlike an SVD's separate
  U/V factors;
- codebooks are ``kmeans_np`` (seeded-permutation init, first-min
  argmin, pairwise means) on the rotated id-ordered bounded prefix.

Reference parity: the reference delegates its compression tier to the
qdrant server's quantization config
(`/root/reference/with_colpali_v1.3/incremental_indexing_colpali_with_qdrant.py`
collection setup); OPQ is the engine-native upgrade of the PQ point
on that memory/recall curve.
"""

from __future__ import annotations

import numpy as np

from .ann import kmeans_np

__all__ = ["opq_train_np", "rotate_np", "opq_encode_np"]


def _mm(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Deterministic ``A @ B``: each output column is a pairwise
    ``np.sum`` along the shared axis — no GEMM, so the reduction
    order (hence the float result) is independent of BLAS threading."""
    return np.stack(
        [np.sum(A * B[:, j], axis=1) for j in range(B.shape[1])], axis=1)


def _xtb(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Deterministic ``Aᵀ @ B`` for (n,d)-shaped operands: column j is
    ``Σ_n A[n,:]·B[n,j]`` as one pairwise ``np.sum`` over rows."""
    return np.stack(
        [np.sum(A * B[:, j:j + 1], axis=0) for j in range(B.shape[1])],
        axis=1)


def _polar(M: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    """Orthogonal factor of M's polar decomposition — the orthogonal-
    Procrustes maximizer of ``tr(RᵀM)``: ``R = M·(MᵀM)^{−1/2}`` via
    eigh of the symmetric d×d Gram matrix (sign/basis-invariant in the
    ``V·f(Λ)·Vᵀ`` form). Eigenvalues are clamped at ``eps`` so a
    rank-deficient cross-covariance (degenerate training data) cannot
    produce infinities."""
    S = _xtb(M, M)  # MᵀM, deterministic
    w, V = np.linalg.eigh(S)
    inv_sqrt = _mm(V * np.clip(w, eps, None) ** -0.5,
                   np.ascontiguousarray(V.T))
    return _mm(M, inv_sqrt)


def rotate_np(X: np.ndarray, R: np.ndarray) -> np.ndarray:
    """Deterministic ``X @ R`` (rotate rows into OPQ coordinates)."""
    return _mm(np.asarray(X, dtype=np.float64),
               np.asarray(R, dtype=np.float64))


def opq_encode_np(Xr: np.ndarray, codebooks: list) -> np.ndarray:
    """Per-block nearest-codeword codes over ROTATED vectors —
    kmeans_np's distance shape ((x−c)² pairwise-summed per centroid,
    first-min argmin), so training-time assignment matches what the
    unrolled Spark expression computes over the same rotated floats."""
    n_blocks = len(codebooks)
    subdim = len(codebooks[0][0])
    codes = np.empty((Xr.shape[0], n_blocks), dtype=np.int64)
    for b, cb in enumerate(codebooks):
        sub = Xr[:, b * subdim:(b + 1) * subdim]
        d = np.stack([((sub - np.asarray(c)) ** 2).sum(axis=1)
                      for c in cb], axis=1)
        codes[:, b] = np.argmin(d, axis=1)
    return codes


def opq_train_np(X, n_blocks: int = 8, k_codes: int = 16,
                 n_iters: int = 3, seed: int = 42):
    """Alternating OPQ training (non-parametric variant, Ge et al.
    §4.2) on a driver-side sample:

    1. rotate the training set by the current ``R`` (identity at
       start — iteration 1 trains plain PQ);
    2. train per-block ``kmeans_np`` codebooks on the rotated data;
    3. encode + reconstruct → ``X̂``; update
       ``R ← polar(Xᵀ·X̂)`` (the orthogonal-Procrustes solution);
    4. after the last update, retrain codebooks against the FINAL
       rotation so the returned pair is self-consistent.

    Returns ``(R, codebooks)`` as plain float lists: ``R`` is d×d
    (rotated = x @ R, i.e. component j is ``Σ_i x_i·R[i][j]``),
    ``codebooks[b]`` is k_codes×(d/n_blocks). Every float op is
    deterministic (module docstring), so oracle factories re-derive
    the same literals.
    """
    X = np.asarray(X, dtype=np.float64)
    n, d = X.shape
    if d % n_blocks:
        raise ValueError(f"dim {d} not divisible by n_blocks {n_blocks}")
    subdim = d // n_blocks

    def train_codebooks(Xr):
        return [kmeans_np(Xr[:, b * subdim:(b + 1) * subdim], k_codes,
                          seed=seed + b)
                for b in range(n_blocks)]

    R = np.eye(d)
    for _ in range(n_iters):
        Xr = rotate_np(X, R)
        codebooks = train_codebooks(Xr)
        codes = opq_encode_np(Xr, codebooks)
        Xhat = np.empty_like(Xr)
        for b, cb in enumerate(codebooks):
            Xhat[:, b * subdim:(b + 1) * subdim] = \
                np.asarray(cb)[codes[:, b]]
        R = _polar(_xtb(X, Xhat))
    codebooks = train_codebooks(rotate_np(X, R))
    return ([[float(x) for x in row] for row in R], codebooks)
