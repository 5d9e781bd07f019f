"""Recall-target routing: the measured recall curves as engine behavior.

`Collection.search(recall_target=0.95)` picks the search tier and its
knobs (exact / nprobe / oversampling / two-stage rescore depth) from
the curves RECORDED in BASELINE.md instead of making the caller
translate a recall requirement into index internals. This is the
engine's HNSW-substitution story made operational (VERDICT r4 item 6):
Qdrant callers tune `hnsw_ef` against recall; here the recall target
IS the API and the engine owns the mapping.

The target is BEST-EFFORT from measured curves, not a proof: every
curve was taken on a specific synthetic corpus (clustered
mixture-of-Gaussians, recall_curve.py) at a specific scale, and recall
at the same knobs varies with the data distribution. The engine is
conservative in three ways — (1) exactness (target ≥ 0.999) always
routes to the exact scan, (2) each approximate knob is trusted only up
to a ceiling at-or-below its measured point, (3) extrapolating IVF
beyond the measured cell count adds probes (see below) — but a caller
who needs a recall GUARANTEE must pass ``exact=True``.

Curve provenance (all measured, recall_curve.py, clustered corpora —
BASELINE.md §"ANN recall on clustered vectors" and §"quantized
oversampling→recall"):

- IVF, 16 centroids, recall@10: nprobe=1 → 0.77, nprobe=2 → 0.995
  (1.0 at 50k rows), nprobe=4 → 1.0. Encoded as FRACTIONS of
  k_centroids (1/16, 2/16, 4/16) so collections with more cells scale
  the probe width with the partition count, which holds the probed
  FRACTION constant as cells shrink. Fragmentation caveat: smaller
  cells split neighbor sets across more boundaries, so a constant
  fraction is not recall-invariant in general; beyond the measured
  16 cells the router adds one probe per doubling of k_centroids
  (``+ceil(log2(kc/16))``) as a margin until per-cell-count curves
  are measured.
- SQ (int8) prefetch + exact rescore, 50k clustered corpus
  (recall_curve.py --quant): oversampling 1× → 0.99, 2× → 1.0
  (1.0 through 16×). int8 on unit vectors is near-lossless, so the
  trusted ceilings sit well under the measured 1.0 points: 2× up to
  0.95, 4× up to 0.99, 10× up to 0.998.
- BQ (1-bit) prefetch + exact rescore, same corpus: 4× → 0.30,
  10× → 0.425, 16× → 0.48. Binarized Hamming cannot rank WITHIN a
  tight cluster (sign patterns collide at 64-d), so on clustered data
  BQ is a low-recall tier no matter the oversampling — the router
  trusts it only up to 0.45 and routes higher targets to the exact
  scan. (On decorrelated high-dim embeddings BQ measures far better —
  Qdrant's own guidance gates BQ on ≥~1024-d — but the router follows
  the recorded adversarial curve, not the optimistic one.)
- Multivector two-stage (pooled-cosine stage 1 → exact MaxSim on the
  shortlist), 20k-doc 8×32 corpora (recall_curve.py --maxsim), two
  regimes: ``faithful`` (one center per doc, the realistic
  late-interaction shape: 50 → 0.847, 100 → 0.947, 200 → 0.98,
  400 → 1.0; stress.py measured the same shape at 100k×1030×128:
  rescore=200 → 1.0) and ``topic10`` (10 shared topic centers:
  pooled vectors tie within a topic and recall at fixed depth decays
  with the confusable-set size — 200 → 0.52, 800 → 0.887 — the
  documented failure mode, SCALE.md §MaxSim). Routing maps targets
  from the FAITHFUL curve and scales depth with k (curves are
  recall@10); near-duplicate-heavy corpora should dedup first or
  pass ``exact=True``.
- Exactness (recall 1.0) is only GUARANTEED by the exact scan, so a
  target ≥ 0.999 always routes to exact — measured 1.0 points remain
  measurements, not proofs.

Below `indexing_threshold` (no layout built) search is already exact —
Qdrant's own deferred-index behavior — so any target is satisfied.
"""

from __future__ import annotations

import math

__all__ = ["route_for_recall", "IVF_NPROBE_FRACTION_RECALL"]

# (fraction of k_centroids probed, measured recall@10) — BASELINE.md
# §ANN-recall, 16-centroid clustered corpus, ascending.
IVF_NPROBE_FRACTION_RECALL: list[tuple[float, float]] = [
    (1 / 16, 0.77),
    (2 / 16, 0.995),
    (4 / 16, 1.0),
]

# measured curve cells: 16. Extrapolating to more cells keeps the
# probed fraction AND adds log2(kc/16) probes against fragmentation.
_IVF_MEASURED_CELLS = 16

# per-kind (oversampling, recall ceiling it is trusted for) — 50k
# clustered sweep, BASELINE.md §quantized-oversampling; ceilings are
# at-or-below the measured recall at that oversampling.
_QUANT_OVERSAMPLING: dict[str, list[tuple[float, float]]] = {
    "sq": [(2.0, 0.95), (4.0, 0.99), (10.0, 0.998)],
    "bq": [(4.0, 0.25), (10.0, 0.40), (16.0, 0.45)],
    # pq/opq at the collection defaults (8 blocks × 16 codes, 32×),
    # measured on the clustered 20k corpus (recall_curve.py --quant,
    # BASELINE.md §pq-oversampling: os4 0.315/0.315, os10 0.47/0.435,
    # os16 0.55/0.55); ceilings at-or-below the measured points, the
    # BQ convention. At this code budget the rotation is ~neutral on
    # the normalized clustered corpus — OPQ's measured win is at
    # larger codebooks (§opq: +24 % at 8×128).
    "pq": [(4.0, 0.30), (10.0, 0.45), (16.0, 0.50)],
    "opq": [(4.0, 0.30), (10.0, 0.42), (16.0, 0.50)],
}

# ((nprobe fraction of k_centroids, beam ef), recall@10 ceiling) —
# the COMPOSED graph tier measured through the real Collection.search
# (recall_curve.py --hnswindex, 20k clustered rows × 16 cells:
# (2/16, 16) → 0.815, (2/16, 32) → 0.89, (4/16, 32) → 0.94,
# (4/16, 64) → 0.975, (16/16, 64) → 0.985); ceilings at-or-below.
# Measured COMPOSED on purpose: the first cut split the miss budget
# across the per-stage curves (the quantizer pattern), but the beam
# curve was measured on id-mod segments and does NOT transfer to
# cluster-COHERENT cells (within a dense cell every point looks
# alike and the walk misses more — delivered 0.815 at a 0.9 target).
# Stage curves compose only when the stages are independent; these
# aren't, so the router trusts the joint measurement. The router
# scales ef to cover k; ascending so the first fit is the cheapest.
_HNSW_COMPOSED: list[tuple[tuple[float, int], float]] = [
    ((2 / 16, 16), 0.80),
    ((2 / 16, 32), 0.85),
    ((4 / 16, 32), 0.90),
    ((4 / 16, 64), 0.95),
    ((1.0, 64), 0.97),
]

# ((nprobe fraction, beam ef), recall@10 ceiling) — the SQ-quantized
# graph tier (hnsw_config × quantization="sq"): the code-graph walk
# measured THROUGH Collection.search on the 20k/16-cell clustered
# corpus over TWO independent 20-query draws (seeds 13/101 — a single
# draw swings ±0.05, which bit the first pin of this table at 0.88
# vs a 0.9 ceiling): np4/ef32 → 0.91/0.88, np4/ef64 → 0.96/0.945,
# np8/ef128 → 0.975/0.975 (np8 ≡ np16 at every ef — the residual is
# beam/quantization-bound, the §hnsw-catalog-stress finding again).
# Ceilings sit at-or-below the MIN across draws with margin. SQ ONLY:
# pq/opq/bq decode geometries are coarse and unmeasured — those route
# composed/index-only. Above these ceilings the sq collection falls
# through to the composed codes-scan tier (trusted to 0.998 via
# oversampling).
_HNSW_SQ_COMPOSED: list[tuple[tuple[float, int], float]] = [
    ((4 / 16, 32), 0.85),
    ((4 / 16, 64), 0.90),
    ((8 / 16, 128), 0.95),
]

# (rescore depth, recall@10 ceiling) — multivector two-stage on the
# pooling-FAITHFUL regime, measured at 20k docs × 8×32
# (recall_curve.py --maxsim: 50 → 0.847, 100 → 0.947, 200 → 0.98,
# 400 → 1.0). Ceilings sit at-or-below the measured points. Wider
# documents pool tighter (noise/√n_vecs): the same two-stage measured
# 1.0 at rescore=200 on 100k docs × 1030×128 (stress.py), so these
# 8-subvector ceilings are the conservative end. Depths scale with k
# below (curves are recall@10).
_MAXSIM_RESCORE: list[tuple[int, float]] = [
    (50, 0.84),
    (100, 0.94),
    (200, 0.97),
    (400, 0.998),
]

# measurements are not proofs: at/above this target, route to exact
_EXACT_CUTOVER = 0.999


def route_for_recall(recall_target: float, *, indexed: bool,
                     quantization: str | None = None,
                     k_centroids: int = 16,
                     multivector: bool = False,
                     k: int | None = None,
                     hnsw: bool = False) -> dict:
    """Map a recall target to search knobs for the collection state.

    Returns ``{"exact": bool, "nprobe": int | None,
    "oversampling": float | None, "rescore": int | None,
    "hnsw_ef": int | None}`` — exactly one tier's knobs are set.
    Callers overlay explicit user knobs on top (an explicit
    ``nprobe=``/``exact=``/``rescore=`` always wins; the target fills
    the unset ones). Best-effort from measured curves — see the
    module docstring; a recall GUARANTEE needs ``exact=True``."""
    if not (0.0 < recall_target <= 1.0):
        raise ValueError(
            f"recall_target must be in (0, 1], got {recall_target!r}")
    out: dict = {"exact": False, "nprobe": None, "oversampling": None,
                 "rescore": None, "hnsw_ef": None}
    if recall_target >= _EXACT_CUTOVER:
        out["exact"] = True
        return out
    if indexed and hnsw and not multivector \
            and quantization in (None, "sq"):
        # QUANTIZED collections' graphs walk the decoded-code space
        # (hnsw_config × quantization). The SQ walk is MEASURED
        # (_HNSW_SQ_COMPOSED — within 0.005 of the full-vector graph
        # at equal knobs) and routes onto its own trusted grid;
        # pq/opq/bq decode geometries are coarse and unmeasured, so
        # targets route those onto the measured composed-quantizer
        # curve below instead (the multivector-exclusion discipline).
        # An explicit hnsw_ef= still walks any code graph.
        # graph tier over probed cells (hnsw_config): knobs come from
        # the JOINT measured curve (_HNSW_COMPOSED — see its comment
        # for why the stages don't compose independently here). Above
        # every trusted ceiling → fall through to index-only at the
        # full target (exact scoring within probed cells — the search
        # path honors the fallback by skipping the graph branch when
        # the router sets no ef). MULTIVECTOR collections are excluded
        # on purpose: _HNSW_COMPOSED was measured on dense vectors,
        # and the pooled-graph stage inherits the pooled-prefilter
        # regime whose recall decays on confusable corpora (the
        # topic10 failure mode) — no multivector graph curve has been
        # measured, so a target routes those index-only (exact MaxSim
        # within probed cells), never onto an unmeasured tier.
        grid = (_HNSW_COMPOSED if quantization is None
                else _HNSW_SQ_COMPOSED)
        for (frac, ef), ceiling in grid:
            if recall_target <= ceiling:
                nprobe = max(1, math.ceil(frac * k_centroids))
                if k_centroids > _IVF_MEASURED_CELLS:
                    nprobe += math.ceil(math.log2(
                        k_centroids / _IVF_MEASURED_CELLS))
                    # beyond the measured 16 cells the binding miss is
                    # the BEAM, not the probe set: the 1M/64-cell
                    # calibration grid (BASELINE.md
                    # §hnsw-catalog-stress) measured recall FLAT in
                    # nprobe (0.88 at np 18/24/32, ef32) and moved by
                    # ef alone (0.96 at ef64, every nprobe) — chunked
                    # cells spread a cell's neighbor mass over
                    # max_segment_size sub-graphs and the per-segment
                    # beam is what covers it. Double ef as the
                    # fragmentation margin (the measured direction;
                    # the 20k kc-sweep shows the probe fractions
                    # already over-deliver at small cells, §hnsw-cells)
                    ef = min(2 * ef, 256)
                out["nprobe"] = min(nprobe, k_centroids)
                # curves are recall@10 — the beam must at least
                # cover a deeper result list
                out["hnsw_ef"] = max(ef, k or 10)
                return out
    if indexed and quantization:
        # composed tier (IVF cells + quantized prefetch + exact
        # rescore — Qdrant's index-over-quantized-vectors): either
        # stage can drop a true neighbor, so recall composes no worse
        # than the union bound 1 - r ≤ (1 - r_ivf) + (1 - r_q). Split
        # the miss budget evenly and pick each knob at the HALVED
        # budget; if the quantizer has no trusted ceiling there (BQ
        # never does at composed sub-targets), fall through to the
        # index-only tier at the full target — exact scan within
        # probed cells, the conservative default.
        sub = 1.0 - (1.0 - recall_target) / 2.0
        if sub < _EXACT_CUTOVER:
            q_over = next(
                (os_ for os_, ceiling in
                 _QUANT_OVERSAMPLING.get(quantization, [])
                 if sub <= ceiling), None)
            if q_over is not None:
                for frac, recall in IVF_NPROBE_FRACTION_RECALL:
                    if sub <= recall:
                        nprobe = max(1, math.ceil(frac * k_centroids))
                        if k_centroids > _IVF_MEASURED_CELLS:
                            nprobe += math.ceil(math.log2(
                                k_centroids / _IVF_MEASURED_CELLS))
                        out["nprobe"] = min(nprobe, k_centroids)
                        out["oversampling"] = q_over
                        return out
    if indexed:
        for frac, recall in IVF_NPROBE_FRACTION_RECALL:
            if recall_target <= recall:
                nprobe = max(1, math.ceil(frac * k_centroids))
                if k_centroids > _IVF_MEASURED_CELLS:
                    # fragmentation margin beyond the measured curve
                    nprobe += math.ceil(
                        math.log2(k_centroids / _IVF_MEASURED_CELLS))
                out["nprobe"] = min(nprobe, k_centroids)
                return out
        out["exact"] = True  # target above every measured point
        return out
    if multivector:
        for depth, ceiling in _MAXSIM_RESCORE:
            if recall_target <= ceiling:
                # curves are recall@10 — scale the depth with k so a
                # deeper result list keeps the same cover ratio
                out["rescore"] = depth * max(1, math.ceil((k or 10) / 10))
                return out
        out["exact"] = True
        return out
    if quantization:
        for oversampling, ceiling in _QUANT_OVERSAMPLING.get(
                quantization, []):
            if recall_target <= ceiling:
                out["oversampling"] = oversampling
                return out
        out["exact"] = True
        return out
    # no index, no quantization: the scan is already exact
    out["exact"] = True
    return out
