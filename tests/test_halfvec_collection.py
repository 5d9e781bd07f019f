"""fp16 multivector collections (Qdrant ``Datatype.FLOAT16`` parity,
round 5): vectors stored as packed fp16 bytes via the halfvec codec —
half the scan bytes; the MaxSim scorers decode natively and score in
float64. Fixture values are exactly representable in fp16 (small
integers / halves), so every search result must EQUAL the fp32 twin's
bit-for-bit — isolating the plumbing from the storage rounding."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from image_indexing_and_retrival_with_qdrant_spark.catalog import create_collection

_ROWS = [(i, [[float(i % 5 + 1), 0.5 * (i % 3)],
              [0.25 * (i % 7), float(i % 4)]])
         for i in range(40)]
_SCHEMA = "id int, embedding array<array<double>>"


def _twin(spark, tmp_path, **extra):
    f32 = create_collection(str(tmp_path), "f32", dim=2, multivector=True,
                            normalize=False, **extra)
    f16 = create_collection(str(tmp_path), "f16", dim=2, multivector=True,
                            normalize=False, datatype="float16", **extra)
    pts = spark.createDataFrame(_ROWS, _SCHEMA)
    f32.upsert(spark, pts)
    f16.upsert(spark, pts)
    return f32, f16


def test_validation():
    with pytest.raises(ValueError, match="multivector"):
        create_collection("/tmp/x_no", "d16", dim=4, datatype="float16")
    with pytest.raises(ValueError, match="float32"):
        create_collection("/tmp/x_no", "d8", dim=4, multivector=True,
                          datatype="float8")


def test_storage_is_binary_with_sidecars(spark, tmp_path):
    _, f16 = _twin(spark, tmp_path)
    t = f16.read(spark)
    assert isinstance(t.schema["embedding"].dataType, BinaryType)
    assert set(t.columns) == {"id", "embedding", "n_vecs",
                              "embedding__pooled"}
    row = {r.id: r for r in t.collect()}
    assert len(bytes(row[1].embedding)) == 2 * 2 * 2  # n*dim*2 bytes
    assert row[1].n_vecs == 2


def test_search_equals_fp32_twin(spark, tmp_path):
    f32, f16 = _twin(spark, tmp_path)
    q = [[1.0, 0.5]]
    want = [(r.id, r.score) for r in f32.search(spark, q, k=7).collect()]
    got = [(r.id, r.score) for r in f16.search(spark, q, k=7).collect()]
    assert got == want
    # two-stage over the pooled sidecar
    want2 = [(r.id, r.score) for r in
             f32.search(spark, q, k=5, rescore=40).collect()]
    got2 = [(r.id, r.score) for r in
            f16.search(spark, q, k=5, rescore=40).collect()]
    assert got2 == want2 == want[:5]
    # threshold + batch
    thr = want[2][1]
    got3 = {r.id for r in
            f16.search(spark, q, k=None, score_threshold=thr).collect()}
    assert got3 == {i for i, s in want if s >= thr}
    b32 = {(r.query_idx, r.id, r.score) for r in
           f32.search_batch(spark, [q, [[0.0, 1.0]]], k=3).collect()}
    b16 = {(r.query_idx, r.id, r.score) for r in
           f16.search_batch(spark, [q, [[0.0, 1.0]]], k=3).collect()}
    assert b16 == b32


def test_indexed_f16_routes(spark, tmp_path):
    f32, f16 = _twin(spark, tmp_path, indexing_threshold=1, k_centroids=4)
    assert f16.has_index()
    q = [[2.0, 0.0]]
    exact = [(r.id, r.score) for r in
             f16.search(spark, q, k=5, exact=True).collect()]
    routed = [(r.id, r.score) for r in f16.search(spark, q, k=5).collect()]
    assert routed == exact  # default exhaustive probe ≡ exact
    assert routed == [(r.id, r.score) for r in
                      f32.search(spark, q, k=5, exact=True).collect()]


def test_point_ops_on_f16(spark, tmp_path):
    _, f16 = _twin(spark, tmp_path)
    upd = spark.createDataFrame([(3, [[8.0, 0.0]])], _SCHEMA)
    assert f16.update_vectors(spark, upd) == 1
    row = {r.id: r for r in f16.read(spark).collect()}
    import numpy as np
    dec = np.frombuffer(bytes(row[3].embedding), dtype=np.float16)
    assert list(dec.astype(float)) == [8.0, 0.0]
    assert row[3].n_vecs == 1
    assert list(row[3].embedding__pooled) == [8.0, 0.0]
    hits = f16.search(spark, [[1.0, 0.0]], k=1).collect()
    assert hits[0].id == 3 and hits[0].score == 8.0
    assert f16.delete_vectors(spark, ["embedding"], F.col("id") == 3) == 1
    row = {r.id: r for r in f16.read(spark).collect()}
    assert row[3].embedding is None and row[3].embedding__pooled is None
    # merge upsert: replaced point carries fresh fp16 bytes
    pts = spark.createDataFrame([(5, [[0.0, 16.0]])], _SCHEMA)
    f16.upsert(spark, pts, mode="merge")
    hits = f16.search(spark, [[0.0, 1.0]], k=1).collect()
    assert hits[0].id == 5 and hits[0].score == 16.0


def test_append_missing_sidecars_refused(spark, tmp_path):
    # round-6 (ADVICE r5): a batch of raw fp16 binary points that rides
    # `_prep_vec`'s BinaryType early-return WITHOUT the __pooled/n_vecs
    # sidecars must be refused, not appended as part-table schema whose
    # rows read NULL in stage 1 of search(rescore=)
    _, f16 = _twin(spark, tmp_path)
    bad = f16.read(spark).drop("embedding__pooled", "n_vecs").limit(3)
    with pytest.raises(ValueError, match="sidecar"):
        f16.upsert(spark, bad)
    # the legitimate re-upsert (sidecars travel with the rows) still works
    full = f16.read(spark).limit(3)
    before = f16.count(spark)
    f16.upsert(spark, full)
    assert f16.count(spark) == before + 3
