"""k-NN join: for EVERY left row, its top-k right neighbors — the
batch shape behind embedding near-dup, recommendation backfills, and
semantic blocking (each of N documents wants its neighbors, so the
query side is corpus-sized and ``dense_knn_batch``'s broadcast-the-
queries plan no longer applies).

The all-pairs form is O(N·M) — 2.5×10¹⁹ pairs at 100 TB. This
operator localizes it with the IVF coarse quantizer: right rows live
in their nearest cell, left rows probe their ``nprobe`` nearest cells
(an in-expression sorted slice — no Python, no extra scan), and
scoring happens inside matched cells only: Σ_cells |L_c|·|R_c| pairs,
a ``k_centroids/nprobe``-fold reduction with uniform cells.

Plan: both sides shuffle once on ``cell`` (at scale the right side is
already ``partitionBy(cell)`` — only the probe copies move), the join
is a plain shuffled hash join on a small-int key, and the per-left
top-k is the windowed rank with the map-side pre-prune. Skewed cells
(dense regions) split under AQE skew-join handling; the per-batch
prune caps the rank shuffle regardless.

``nprobe = k_centroids`` probes every cell ⇒ EXACT k-NN join (every
(left, right) pair scored) — which is what makes the operator
oracle-checkable; approximation is an explicit smaller ``nprobe``
(recall pinned in tests/test_knnjoin.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vector import cosine_unrolled, dot_unrolled
from .topk import grouped_topk

__all__ = ["probe_cells", "knn_join"]


def probe_cells(centroids: list[list[float]], vec_col: Column | str,
                nprobe: int) -> Column:
    """Array of the ``nprobe`` nearest centroid ids — squared-euclid
    ranking with centroid-id tie-break, as one codegen'd sorted-slice
    expression (same metric as ``assign_centroids``, so a row's own
    cell is always its first probe).

    Pass a column NAME for the one-SQL-string build (~ms instead of
    ~k·d·5 py4j round trips of driver time — the functions/vector.py
    operand discipline; tree is value-identical)."""
    if isinstance(vec_col, str):
        from .ann import _centroid_structs_loop_sql

        structs = _centroid_structs_loop_sql(centroids, f"`{vec_col}`")
        return F.expr(
            f"transform(slice(sort_array({structs}), 1, {int(nprobe)}),"
            " s -> s.i)")
    entries = []
    for cid, c in enumerate(centroids):
        d = None
        for j, cj in enumerate(c):
            diff = F.element_at(vec_col, j + 1).cast("double") - F.lit(float(cj))
            term = diff * diff
            d = term if d is None else d + term
        entries.append(F.struct(d.alias("d"), F.lit(cid).alias("i")))
    ranked = F.sort_array(F.array(*entries))  # (d, i) lexicographic
    return F.transform(F.slice(ranked, 1, nprobe), lambda s: s["i"])


def knn_join(
    left: DataFrame,
    right: DataFrame,
    centroids: list[list[float]],
    k: int = 3,
    nprobe: int | None = None,
    dim: int | None = None,
    left_id: str = "qid",
    right_id: str = "vec_id",
    left_vec: str = "query_vec",
    right_vec: str = "embedding",
    prenormalized: bool = False,
    round_digits: int | None = 6,
    local_prune: bool = True,
) -> DataFrame:
    """Top-k right neighbors for every left row, scored by cosine (or
    dot if ``prenormalized``). ``nprobe=None`` probes every cell —
    exact. Output: (left_id, right_id, score, rank)."""
    np_ = len(centroids) if nprobe is None else nprobe
    from .ann import assign_centroids

    r = right.select(
        F.col(right_id), F.col(right_vec).alias("__rv")
    ).withColumn("cell", assign_centroids(centroids, "__rv"))
    l = left.select(
        F.col(left_id), F.col(left_vec).alias("__lv")
    ).withColumn(
        "cell", F.explode(probe_cells(centroids, "__lv", np_))
    )
    if dim is not None:
        score = (dot_unrolled("__lv", "__rv", dim)
                 if prenormalized else
                 cosine_unrolled("__lv", "__rv", dim))
    else:
        from ..functions.vector import cosine, dot
        score = (dot(F.col("__lv"), F.col("__rv")) if prenormalized
                 else cosine(F.col("__lv"), F.col("__rv")))
    if round_digits is not None:
        score = F.round(score, round_digits)
    pairs = l.join(r, on="cell").withColumn("score", score).select(
        left_id, right_id, "score")
    return grouped_topk(
        pairs, [left_id], [("score", False), (right_id, True)], k,
        local_prune=local_prune,
    )
