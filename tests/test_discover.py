"""Discovery / context search + distance matrix (Qdrant Discovery &
matrix API analogs): zone ranking, context scoring, metric dispatch,
filter threading, and the sample-bounded matrix join."""

import pytest
from pyspark.sql import functions as F

from image_indexing_and_retrival_with_qdrant_spark.catalog import create_collection
from image_indexing_and_retrival_with_qdrant_spark.operators.discover import (
    context_search,
    discovery_search,
)
from image_indexing_and_retrival_with_qdrant_spark.operators.matrix import (
    distance_matrix_pairs,
)


def _corpus(spark):
    # 1D-ish geometry on the x axis, euclid: easy to reason about zones.
    return spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(10)],
        "vec_id int, embedding array<double>",
    )


def test_discovery_rank_and_tiebreak(spark):
    # pair (8⊕, 0⊖): positive zone is x > 4 -> +1 there, -1 below.
    # target 6: within each zone, closest-to-6 first.
    hits = discovery_search(
        _corpus(spark), target=[6.0, 0.0],
        context=[([8.0, 0.0], [0.0, 0.0])],
        k=4, dim=2, metric="euclid",
    ).collect()
    assert [r.vec_id for r in hits] == [6, 5, 7, 8]
    assert [r.rank for r in hits] == [1, 1, 1, 1]
    assert hits[0].score == 0.0


def test_discovery_two_pairs_rank_sum(spark):
    # pairs (8⊕,0⊖) and (0⊕,8⊖) contradict: every point gets rank 0
    # except the boundary x=4 (closer-to-positive is strict).
    hits = discovery_search(
        _corpus(spark), target=[0.0, 0.0],
        context=[([8.0, 0.0], [0.0, 0.0]), ([0.0, 0.0], [8.0, 0.0])],
        k=10, dim=2, metric="euclid",
    ).collect()
    ranks = {r.vec_id: r.rank for r in hits}
    assert ranks[4] == -2          # equidistant: strict test fails both
    assert all(ranks[i] == 0 for i in range(10) if i != 4)
    # within rank 0, target (x=0) distance orders ascending
    assert [r.vec_id for r in hits if r.rank == 0][:3] == [0, 1, 2]


def test_context_search_zero_is_best(spark):
    # context (0⊕, 9⊖): score 0 iff strictly closer to 0 than to 9.
    hits = context_search(
        _corpus(spark), [([0.0, 0.0], [9.0, 0.0])],
        k=10, dim=2, metric="euclid",
    ).collect()
    best = [r.vec_id for r in hits if r.score == 0.0]
    assert set(best) == {0, 1, 2, 3, 4}
    worst = hits[-1]
    assert worst.vec_id == 9 and worst.score == -9.0


def test_discovery_requires_context(spark):
    with pytest.raises(ValueError, match="context pair"):
        discovery_search(_corpus(spark), [0.0, 0.0], [], k=3)
    with pytest.raises(ValueError, match="context pair"):
        context_search(_corpus(spark), [], k=3)


def _coll(spark, tmp_path):
    coll = create_collection(str(tmp_path), "disc", dim=2, metric="euclid")
    coll.upsert(spark, spark.createDataFrame(
        [(i, [float(i), 0.0], "even" if i % 2 == 0 else "odd")
         for i in range(10)],
        "id int, embedding array<double>, parity string",
    ))
    return coll


def test_collection_discover_resolves_ids(spark, tmp_path):
    coll = _coll(spark, tmp_path)
    # ids instead of raw vectors: target=6, pair (8⊕, 0⊖)
    hits = coll.discover(spark, context=[(8, 0)], target=6, k=4).collect()
    assert [r.id for r in hits] == [6, 5, 7, 8]
    with pytest.raises(ValueError, match="not found"):
        coll.discover(spark, context=[(8, 99)], target=6)


def test_collection_discover_context_only_with_filter(spark, tmp_path):
    coll = _coll(spark, tmp_path)
    hits = coll.discover(
        spark, context=[(0, 9)], target=None, k=10,
        query_filter=F.col("parity") == "even",
    ).collect()
    assert {r.id for r in hits} == {0, 2, 4, 6, 8}
    assert [r.score for r in hits if r.id in (0, 2, 4)] == [0.0, 0.0, 0.0]


def test_matrix_pairs_excludes_self_and_ranks(spark):
    sample = _corpus(spark).filter(F.col("vec_id") < 4)
    pairs = distance_matrix_pairs(
        sample, k=2, dim=2, metric="euclid").collect()
    assert len(pairs) == 8  # 4 points x top-2
    by_a = {}
    for r in pairs:
        assert r.id_a != r.id_b
        by_a.setdefault(r.id_a, []).append((r.rank, r.id_b, r.score))
    assert sorted(by_a[0]) == [(1, 1, 1.0), (2, 2, 2.0)]
    assert sorted(by_a[2]) == [(1, 1, 1.0), (2, 3, 1.0)]  # id tie-break


def test_collection_search_matrix_sample_bound(spark, tmp_path):
    coll = _coll(spark, tmp_path)
    pairs = coll.search_matrix(spark, sample=5, k=2).collect()
    assert len(pairs) == 10  # 5 sampled x top-2
    ids = {r.id_a for r in pairs} | {r.id_b for r in pairs}
    assert len({r.id_a for r in pairs}) == 5 and ids <= set(range(10))
    # deterministic: same sample every run
    again = coll.search_matrix(spark, sample=5, k=2).collect()
    assert sorted(map(tuple, pairs)) == sorted(map(tuple, again))


def test_discover_batch(spark, tmp_path):
    """Many discovery requests, one tagged result frame; context-only
    and targeted requests mix."""
    from image_indexing_and_retrival_with_qdrant_spark.catalog import (
        create_collection,
    )

    coll = create_collection(str(tmp_path), "db", dim=2,
                             normalize=False, metric="dot")
    pts = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.8, 0.2]), (3, [0.0, 1.0]),
         (4, [0.2, 0.8])],
        "id int, embedding array<double>")
    coll.upsert(spark, pts)
    out = coll.discover_batch(
        spark,
        [([(1, 3)], 2),        # targeted: like 2, zone toward 1 vs 3
         [(3, 1)]],            # context-only: toward 3
        k=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_idx, []).append(r)
    assert set(by_q) == {0, 1}
    # q0's zone (closer to 1 than 3) is satisfied by the +x points:
    # top-2 are ids 1 and 2 (1 first — dot with the target favors it)
    assert [r.id for r in sorted(by_q[0], key=lambda r: r.rank)] == [1, 2]
    ids_q1 = [r.id for r in by_q[1]]
    assert 3 in ids_q1 or 4 in ids_q1   # +y zone dominates
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one request"):
        coll.discover_batch(spark, [])


def test_search_matrix_offsets_matches_pairs(spark, tmp_path):
    """The offsets serialization (Qdrant search_matrix_offsets) must
    be a pure re-shaping of the pairs result: same sampled points,
    same neighbors, offsets indexing into the ids list."""
    coll = _coll(spark, tmp_path)
    pairs = coll.search_matrix(spark, sample=5, k=2).collect()
    off = coll.search_matrix_offsets(spark, sample=5, k=2)
    assert len(off["scores"]) == len(pairs) == 10
    assert sorted(off["ids"]) == off["ids"]
    got = {(off["ids"][r], off["ids"][c], s)
           for r, c, s in zip(off["offsets_row"], off["offsets_col"],
                              off["scores"])}
    assert got == {(p.id_a, p.id_b, p.score) for p in pairs}
    # per-row neighbor order follows the rank column
    by_row = {}
    for r, s in zip(off["offsets_row"], off["scores"]):
        by_row.setdefault(r, []).append(s)
    ranked = {(p.id_a): None for p in pairs}
    for a in ranked:
        want = [p.score for p in sorted(
            (p for p in pairs if p.id_a == a), key=lambda p: p.rank)]
        assert by_row[off["ids"].index(a)] == want
