"""MaxSim (Q2) vs DuckDB oracle; UDF and relational paths must agree."""

import pytest

from image_indexing_and_retrival_with_qdrant_spark.registry import REGISTRY

from .oracle import compare


@pytest.mark.parametrize("name", ["maxsim_top5", "maxsim_exact_top5",
                                  "maxsim_filtered_top5",
                                  "maxsim_indexed_top5"])
def test_maxsim_oracle(spark, sf_smoke, name):
    compare(spark, REGISTRY[name], sf_smoke, name)


def test_maxsim_paths_agree(spark, sf_oracle):
    a = REGISTRY["maxsim_top5"].builder(spark, sf_oracle).collect()
    b = REGISTRY["maxsim_exact_top5"].builder(spark, sf_oracle).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_two_stage_rescore_matches_exact(spark, sf_oracle, tmp_path):
    """Collection.search(rescore=N): the opt-in two-stage MaxSim path
    (mean-pooled prefilter → exact rescore of the survivors) must
    reproduce the exact scan's top-k whenever the prefilter depth
    covers the true hits. On the isotropic-random fixture the pooled
    ranking is weak — the measured cover depth at sf0.01 is 391/500 —
    which is exactly why rescore is opt-in, not the default; real
    late-interaction embeddings (PLAID's premise) cover at tiny
    depths. Also pins that query_filter composes (filter before
    stage 1 → full depth inside the slice)."""
    from pyspark.sql import functions as F

    from image_indexing_and_retrival_with_qdrant_spark.catalog import create_collection
    from image_indexing_and_retrival_with_qdrant_spark.operators.maxsim import (
        as_multivector,
    )
    from image_indexing_and_retrival_with_qdrant_spark.tables import load

    emb = load(spark, sf_oracle, "embeddings")
    pts = emb.select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("label"),
        as_multivector(F.col("embedding"), 8, 8).alias("embedding"),
    )
    qv = [list(v) for v in pts.filter(F.col("id") == "0").collect()[0].embedding]
    coll = create_collection(str(tmp_path / "colls"), "mv2s", dim=8,
                             multivector=True, normalize=False)
    coll.upsert(spark, pts, mode="append")
    n = coll.count(spark)

    exact = [(r.id, r.score) for r in
             coll.search(spark, qv, k=5, exact=True).select("id", "score").collect()]
    two_stage = [(r.id, r.score) for r in
                 coll.search(spark, qv, k=5, rescore=n).select("id", "score").collect()]
    assert two_stage == exact  # full depth ≡ exact, through the 2-stage plan

    covered = [(r.id, r.score) for r in
               coll.search(spark, qv, k=5, rescore=400).select("id", "score").collect()]
    assert covered == exact  # measured cover depth (391) suffices

    flt = F.col("label") == 7
    exact_f = [(r.id, r.score) for r in
               coll.search(spark, qv, k=5, exact=True, query_filter=flt)
               .select("id", "score").collect()]
    two_f = [(r.id, r.score) for r in
             coll.search(spark, qv, k=5, rescore=n, query_filter=flt)
             .select("id", "score").collect()]
    assert two_f == exact_f


def test_two_stage_uses_pooled_sidecar_and_stays_exact(spark, tmp_path):
    """Round-5 pooled sidecar: search(rescore=N) results are identical
    with the write-time `{vec}__pooled` column and with the
    compute-at-read fallback (sidecar dropped on disk) — same stage-1
    expression either way; and full-depth rescore equals exact."""
    from image_indexing_and_retrival_with_qdrant_spark.catalog import create_collection

    rows = [(i, [[float(i % 5 + 1), 0.0], [0.0, float(i % 3 + 1)]])
            for i in range(40)]
    coll = create_collection(str(tmp_path), "ts", dim=2, multivector=True,
                             normalize=False)
    coll.upsert(spark, spark.createDataFrame(
        rows, "id int, embedding array<array<double>>"))
    assert "embedding__pooled" in coll.read(spark).columns
    q = [[1.0, 0.0]]
    exact = [(r.id, r.score) for r in
             coll.search(spark, q, k=5, exact=True).collect()]
    with_sidecar = [(r.id, r.score) for r in
                    coll.search(spark, q, k=5, rescore=40).collect()]
    assert with_sidecar == exact  # full-depth two-stage ≡ exact

    # drop the sidecar on disk -> fallback path, same results
    import shutil
    t = coll.read(spark).drop("embedding__pooled")
    rewrite = str(tmp_path / "bare")
    t.write.parquet(rewrite)
    shutil.rmtree(coll.path)
    shutil.move(rewrite, coll.path)
    assert "embedding__pooled" not in coll.read(spark).columns
    fallback = [(r.id, r.score) for r in
                coll.search(spark, q, k=5, rescore=40).collect()]
    assert fallback == exact


def test_pooled_sidecar_maintained_by_point_ops(spark, tmp_path):
    """update_vectors refreshes the pooled sidecar; delete_vectors
    nulls it with the space."""
    from pyspark.sql import functions as F

    from image_indexing_and_retrival_with_qdrant_spark.catalog import create_collection

    coll = create_collection(str(tmp_path), "ps", dim=2, multivector=True,
                             normalize=False)
    coll.upsert(spark, spark.createDataFrame(
        [(1, [[1.0, 0.0]]), (2, [[0.0, 2.0], [2.0, 0.0]])],
        "id int, embedding array<array<double>>"))
    upd = spark.createDataFrame([(1, [[4.0, 0.0], [0.0, 8.0]])],
                                "id int, embedding array<array<double>>")
    assert coll.update_vectors(spark, upd) == 1
    row = {r.id: r for r in coll.read(spark).collect()}
    assert list(row[1].embedding__pooled) == [2.0, 4.0]  # refreshed
    assert list(row[2].embedding__pooled) == [1.0, 1.0]  # untouched
    assert coll.delete_vectors(spark, ["embedding"], F.col("id") == 2) == 1
    row = {r.id: r for r in coll.read(spark).collect()}
    assert row[2].embedding is None and row[2].embedding__pooled is None
    assert row[2].n_vecs is None


def test_append_to_pre_sidecar_collection_stays_uniform(spark, tmp_path):
    """Appending to a collection written BEFORE the pooled sidecar
    existed must not create part-table schemas: new files drop the
    sidecar too (old rows would read NULL-pooled and silently vanish
    from stage 1); the compute-at-read fallback stays correct."""
    import os
    import shutil

    from image_indexing_and_retrival_with_qdrant_spark.catalog import create_collection

    coll = create_collection(str(tmp_path), "pre", dim=2, multivector=True,
                             normalize=False)
    coll.upsert(spark, spark.createDataFrame(
        [(i, [[float(i + 1), 0.0]]) for i in range(10)],
        "id int, embedding array<array<double>>"))
    # simulate a pre-round-5 layout: strip the sidecar on disk
    bare = coll.read(spark).drop("embedding__pooled")
    tmp = str(tmp_path / "bare")
    bare.write.parquet(tmp)
    shutil.rmtree(coll.path)
    os.rename(tmp, coll.path)
    # append new points: schema must stay uniform (no sidecar)
    coll.upsert(spark, spark.createDataFrame(
        [(99, [[50.0, 0.0]])], "id int, embedding array<array<double>>"))
    t = coll.read(spark)
    assert "embedding__pooled" not in t.columns
    assert t.count() == 11
    # two-stage fallback sees ALL rows, old and new
    got = [r.id for r in
           coll.search(spark, [[1.0, 0.0]], k=2, rescore=11).collect()]
    assert got == [99, 9]
