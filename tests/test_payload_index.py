"""Payload indexes (Qdrant ``create_payload_index`` analog): the
partitioned layout, pruning in the physical plan, layout survival
across upsert/merge/delete, and result parity with the unindexed
collection."""

import os

import pytest
from pyspark.sql import functions as F

from image_indexing_and_retrival_with_qdrant_spark.catalog import create_collection
from image_indexing_and_retrival_with_qdrant_spark.plans.explain import formatted_plan


def _mk(spark, tmp_path, name="pidx"):
    coll = create_collection(str(tmp_path), name, dim=3, metric="euclid")
    pts = spark.createDataFrame(
        [(i, [float(i), 0.0, 0.0], ["red", "green", "blue"][i % 3])
         for i in range(12)],
        "id int, embedding array<double>, color string",
    )
    coll.upsert(spark, pts)
    return coll


def test_index_partitions_layout_and_prunes(spark, tmp_path):
    coll = _mk(spark, tmp_path)
    before = {(r.id, r.color) for r in
              coll.search(spark, [0.0, 0.0, 0.0], k=4,
                          query_filter=F.col("color") == "red").collect()}
    coll.create_payload_index(spark, "color")
    # Hive-style directories exist
    assert {d for d in os.listdir(coll.path) if d.startswith("color=")} == \
        {"color=red", "color=green", "color=blue"}
    # same results after the rewrite
    hits = coll.search(spark, [0.0, 0.0, 0.0], k=4,
                       query_filter=F.col("color") == "red")
    assert {(r.id, r.color) for r in hits.collect()} == before
    # and the filter prunes partitions in the scan
    plan = formatted_plan(hits)
    assert "PartitionFilters" in plan and "color" in plan.split(
        "PartitionFilters", 1)[1][:200]


def test_index_survives_append_and_merge(spark, tmp_path):
    coll = _mk(spark, tmp_path)
    coll.create_payload_index(spark, "color")
    more = spark.createDataFrame(
        [(100, [50.0, 0.0, 0.0], "red")],
        "id int, embedding array<double>, color string")
    coll.upsert(spark, more)                      # append path
    coll.upsert(spark, more.withColumn(           # merge/replace path
        "embedding", F.array(F.lit(51.0), F.lit(0.0), F.lit(0.0))),
        mode="merge")
    rows = {r.id: r.color for r in coll.read(spark).collect()}
    assert rows[100] == "red" and len(rows) == 13
    stored = coll.read(spark).filter(F.col("id") == 100).collect()[0]
    assert list(stored.embedding) == [51.0, 0.0, 0.0]
    assert coll.delete(spark, F.col("color") == "blue") == 4
    assert {r.color for r in coll.read(spark).collect()} == {"red", "green"}


def test_index_validation_and_drop(spark, tmp_path):
    coll = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="reserved"):
        coll.create_payload_index(spark, "embedding")
    with pytest.raises(ValueError, match="unknown payload field"):
        coll.create_payload_index(spark, "nope")
    # the failed create must not leave 'nope' in the meta
    assert coll.meta.get("payload_indexes") == []
    coll.create_payload_index(spark, "color")
    coll.create_payload_index(spark, "color")  # idempotent
    assert coll.meta["payload_indexes"] == ["color"]
    coll.drop_payload_index(spark, "color")
    assert coll.meta["payload_indexes"] == []
    assert not any(d.startswith("color=") for d in os.listdir(coll.path))
    assert coll.count(spark) == 12


def test_merge_conflict_rewrite_is_file_scoped(spark, tmp_path):
    """A conflicting merge upsert must rewrite ONLY the files holding
    conflicting ids: every other data file stays byte-identical
    (round-4 scoped rewrite; the old path rewrote the whole table)."""
    import hashlib
    import os

    from pyspark.sql import functions as F

    from image_indexing_and_retrival_with_qdrant_spark.catalog import create_collection

    coll = create_collection(str(tmp_path), "scoped", dim=2,
                             metric="euclid", normalize=False)
    coll.upsert(spark, spark.createDataFrame(
        [(i, [float(i), 0.0], "en" if i < 10 else "de")
         for i in range(20)],
        "id int, embedding array<double>, lang string"))
    coll.create_payload_index(spark, "lang")

    def snapshot():
        out = {}
        for root, _d, files in os.walk(coll.path):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[os.path.relpath(p, coll.path)] = hashlib.md5(
                        open(p, "rb").read()).hexdigest()
        return out

    before = snapshot()
    de_files = {k for k in before if "lang=de" in k}
    assert de_files, "expected a lang=de partition"
    # conflict only with en ids
    coll.upsert(spark, spark.createDataFrame(
        [(3, [30.0, 0.0], "en"), (99, [99.0, 0.0], "de")],
        "id int, embedding array<double>, lang string"), mode="merge")
    after = snapshot()
    for k in de_files:  # untouched partition files byte-identical
        assert after[k] == before[k]
    rows = {r.id: r for r in coll.read(spark).collect()}
    assert len(rows) == 21
    assert list(rows[3].embedding) == [30.0, 0.0]   # replaced
    assert list(rows[99].embedding) == [99.0, 0.0]  # appended
    assert list(rows[4].embedding) == [4.0, 0.0]    # kept
    assert rows[15].lang == "de"
