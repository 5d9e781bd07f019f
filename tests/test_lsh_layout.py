"""LSH on-disk layout: the band frame persisted
partitionBy(band_idx, band_sig) + the literal bucket predicate ⇒
Catalyst partition pruning opens only the probed bucket directories
(SCALE.md §ANN LSH — the on-disk analog of the cached band frame that
`ann_lsh_top5` probes in memory)."""

from pyspark.sql import functions as F

from image_indexing_and_retrival_with_qdrant_spark.operators.ann import (
    lsh_band_frame,
    lsh_probe,
    lsh_probe_literal,
    lsh_query_signature,
)
from image_indexing_and_retrival_with_qdrant_spark.plans.explain import (
    formatted_plan,
)
from image_indexing_and_retrival_with_qdrant_spark.tables import load


def test_lsh_bucket_layout_prunes_partitions(spark, sf_smoke, tmp_path):
    emb = load(spark, sf_smoke, "embeddings")
    stack = lsh_band_frame(emb, 64, carry_cols=("vec_id", "embedding"))
    layout = str(tmp_path / "lsh")
    stack.write.partitionBy("band_idx", "band_sig").parquet(layout)

    table = spark.read.parquet(layout)
    qvec = list(emb.filter(F.col("vec_id") == 0).collect()[0].embedding)

    probed = lsh_probe_literal(table, qvec, dim=64, k=5)
    plan = formatted_plan(probed)
    # the literal bucket predicate must prune at planning time, not
    # filter after the scan
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf_lines and any(
        "band_sig" in l and "[]" not in l for l in pf_lines)

    # identical results to the in-memory probe of the same band frame
    mem = [(r.vec_id, r.score)
           for r in lsh_probe_literal(stack, qvec, dim=64, k=5).collect()]
    disk = [(r.vec_id, r.score) for r in probed.collect()]
    assert mem == disk

    # the scan reads only the two probed buckets' rows
    sigs = lsh_query_signature(qvec, 64)
    per_bucket = {(r.band_idx, r.band_sig): r["count"] for r in
                  stack.groupBy("band_idx", "band_sig").count().collect()}
    expected = sum(per_bucket.get((b, s), 0) for b, s in enumerate(sigs))
    pred = None
    for b, s in enumerate(sigs):
        term = (F.col("band_idx") == b) & (F.col("band_sig") == s)
        pred = term if pred is None else (pred | term)
    assert table.filter(pred).count() == expected


def test_lsh_expression_probe_matches_on_disk_layout(spark, sf_smoke,
                                                     tmp_path):
    """The DataFrame-valued expression probe (lsh_probe) over the
    persisted layout also agrees — multi-probe included."""
    emb = load(spark, sf_smoke, "embeddings")
    stack = lsh_band_frame(emb, 64, carry_cols=("vec_id", "embedding"))
    layout = str(tmp_path / "lsh2")
    stack.write.partitionBy("band_idx", "band_sig").parquet(layout)
    table = spark.read.parquet(layout)
    q = emb.filter(F.col("vec_id") == 7).select(
        F.col("embedding").alias("query_vec"))
    for m in (0, 1):
        mem = [(r.vec_id, r.score)
               for r in lsh_probe(stack, q, dim=64, k=8,
                                  multiprobe=m).collect()]
        disk = [(r.vec_id, r.score)
                for r in lsh_probe(table, q, dim=64, k=8,
                                   multiprobe=m).collect()]
        assert mem == disk
