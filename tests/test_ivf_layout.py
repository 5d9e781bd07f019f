"""IVF on-disk layout: partitionBy(centroid_id) + probe filter ⇒
Catalyst partition pruning reads only nprobe partitions (SCALE.md ANN
tier — the 100 TB path)."""

from pyspark.sql import functions as F

from image_indexing_and_retrival_with_qdrant_spark.operators.ann import ivf_build
from image_indexing_and_retrival_with_qdrant_spark.plans.explain import formatted_plan
from image_indexing_and_retrival_with_qdrant_spark.tables import load


def test_ivf_partition_pruning(spark, sf_smoke, tmp_path):
    emb = load(spark, sf_smoke, "embeddings")
    assigned, _ = ivf_build(emb, k_centroids=8, seed=42)
    layout = str(tmp_path / "ivf")
    assigned.write.partitionBy("centroid_id").parquet(layout)

    table = spark.read.parquet(layout)
    probed = table.filter(F.col("centroid_id").isin(1, 3))
    plan = formatted_plan(probed)

    # the probe predicate must be a partition filter (pruned at
    # planning), not a post-scan data filter
    assert "PartitionFilters" in plan
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("centroid_id" in l and "[]" not in l for l in pf_lines)

    # pruning is effective: only the two probed partitions' rows load
    per_part = {r.centroid_id: r["count"] for r in
                assigned.groupBy("centroid_id").count().collect()}
    assert probed.count() == per_part[1] + per_part[3]
