"""Recall-target routing: the measured recall curves as engine behavior.

`Collection.search(recall_target=0.95)` picks the search tier and its
knobs (exact / nprobe / oversampling) from the curves RECORDED in
BASELINE.md instead of making the caller translate a recall
requirement into index internals. This is the engine's
HNSW-substitution story made operational (VERDICT r4 item 6): Qdrant
callers tune `hnsw_ef` against recall; here the recall target IS the
API and the engine owns the mapping.

Curve provenance (all measured, recall_curve.py, clustered corpora —
BASELINE.md §"ANN recall on clustered vectors"):

- IVF, 16 centroids, recall@10: nprobe=1 → 0.77, nprobe=2 → 0.995
  (1.0 at 50k rows), nprobe=4 → 1.0. Encoded as FRACTIONS of
  k_centroids (1/16, 2/16, 4/16) so collections with more cells scale
  the probe width with the partition count, which is what holds the
  probed-fraction (and therefore the recall floor) constant as cells
  shrink.
- Quantized (SQ/BQ) prefetch + exact rescore: the value-oracled
  shipped configuration (`ann_bq_rescore_top5`) oversamples 10×; the
  engine default is 4×. No full oversampling→recall sweep is recorded
  yet, so the quantized mapping is deliberately conservative: default
  4× below 0.9, the proven 10× point up to 0.999, exact above.
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

# (oversampling, recall ceiling it is trusted for) — see module
# docstring; conservative until a full sweep is recorded.
_QUANT_OVERSAMPLING: list[tuple[float, float]] = [
    (4.0, 0.90),
    (10.0, 0.999),
]

# measurements are not proofs: at/above this target, route to exact
_EXACT_CUTOVER = 0.999


def route_for_recall(recall_target: float, *, indexed: bool,
                     quantization: str | None = None,
                     k_centroids: int = 16) -> dict:
    """Map a recall target to search knobs for the collection state.

    Returns ``{"exact": bool, "nprobe": int | None,
    "oversampling": float | None}`` — exactly one tier's knobs are
    set. Callers overlay explicit user knobs on top (an explicit
    ``nprobe=``/``exact=`` always wins; the target fills the unset
    ones)."""
    if not (0.0 < recall_target <= 1.0):
        raise ValueError(
            f"recall_target must be in (0, 1], got {recall_target!r}")
    out: dict = {"exact": False, "nprobe": None, "oversampling": None}
    if recall_target >= _EXACT_CUTOVER:
        out["exact"] = True
        return out
    if indexed:
        for frac, recall in IVF_NPROBE_FRACTION_RECALL:
            if recall_target <= recall:
                out["nprobe"] = max(1, math.ceil(frac * k_centroids))
                return out
        out["exact"] = True  # target above every measured point
        return out
    if quantization:
        for oversampling, ceiling in _QUANT_OVERSAMPLING:
            if recall_target <= ceiling:
                out["oversampling"] = oversampling
                return out
        out["exact"] = True
        return out
    # no index, no quantization: the scan is already exact
    out["exact"] = True
    return out
