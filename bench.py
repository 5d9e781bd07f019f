"""BENCH harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized through the noop sink (full execution, no
driver-side result transfer) except tiny top-k results, which are
collected. A warmup query runs first so JVM/codegen startup isn't
billed to the first headline entry.
"""

from __future__ import annotations

import json
import os
import re
import time

from image_indexing_and_retrival_with_qdrant_spark import bench_phases
from image_indexing_and_retrival_with_qdrant_spark.registry import REGISTRY
from image_indexing_and_retrival_with_qdrant_spark.session import get_spark

# Headline set: the reference-surface operators (KNN/MaxSim/ingest)
# plus the scale-relevant generalized operators. Pairwise-explosive
# queries (ngram jaccard at 5k docs) are excluded by design — their
# scale path is the MinHash/SimHash tier, which is included.
HEADLINE = [
    "knn_dense_top5",
    "knn_batch_top3",
    "knn_filtered_top5",
    "maxsim_top5",
    "ingest_search_e2e",
    "ingest_embed_stub",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "nation_revenue",
    "top_customers_per_nation",
    "events_tumbling_5min",
    "events_sessionization",
    "events_json_payload",
    "text_quality",
    "text_token_stats",
    "dedup_exact_groups",
    "dedup_minhash_signatures",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_ivf_top5",
    "ann_lsh_top5",
    "maxsim_two_stage_top5",
    "knn_batch_pruned_top3",
    "events_asof_purchase_view",
    "events_salted_agg",
    "events_moving_avg",
    "lineitem_price_stats",
    "text_rolling_hash",
    "colbert_text_search_top5",
    "scd2_corpus_refresh",
    "events_click_purchase_band",
    "events_profile",
    "bm25_search_top10",
    "hybrid_search_rrf_top10",
    # round 2: training-data pipeline family (BASELINE.md §round-2)
    "docs_repetition_stats",
    "docs_gopher_filter",
    "docs_chunk_sliding",
    "docs_scrub_pii",
    "emb_matryoshka_top5",
    "emb_random_projection_top5",
    "emb_pca_top5",
    "emb_pca_ivf_top5",
    "ann_sq_top5",
    "ann_bq_rescore_top5",
    # discovery API family (scan-local literal-folded passes)
    "knn_discover_top5",
    "matrix_pairs_top3",
    "docs_decontaminate",
    # round 3: dataset assembly + oracle-checked streaming
    "docs_stratified_split",
    "docs_source_mixture",
    "docs_source_profile",
    "stream_tumbling_5min",
    # round 4: stateful streaming paths (each pays the structural
    # Structured-Streaming drain — source listing + state store +
    # memory-sink collect — on top of plan cost; batch twins measure
    # the plan alone, see BASELINE.md §streaming) + value-oracled IVF
    # read path + multi-probe LSH on the cached band layout
    "stream_session_windows",
    "stream_stateful_dedup",
    "ann_ivf_exhaustive_top5",
    "ann_lsh_multiprobe_top5",
    # round 4 (cont.): formula rescoring (shortlist-bounded), exact-
    # substring dedup (2 uniform shuffles), unigram LM quality
    "knn_formula_boost_top5",
    "docs_formula_boost_top10",
    "dedup_exact_substrings",
    "docs_unigram_perplexity",
    # round 4 (cont.): deterministic sample-trained tiers (centroid
    # train warmed above — build-outside-the-timer policy) + the
    # cluster data card over the same centroids
    "ann_ivf_det_top5",
    "emb_cluster_profile",
    "tpch_q5_local_supplier",
    "ann_pq_det_top5",
    # round 5: the headline approximate tiers re-pointed at the
    # deterministic builders (now FULL value oracles); ann_ivf_top5
    # above measures the det nprobe=2 probe since this round
    "ann_pq_top5",
    "ann_ivfpq_top5",
    # round 6: recall-target routing over the two-stage multivector
    # read path (lifecycle + routed search; oracle mirrors stage 1)
    # and the batched two-stage (one pooled pass for all queries)
    "maxsim_recall_routed_top5",
    "maxsim_batch_two_stage_top3",
    # round 6: composed IVF + quantization (cells codes layout:
    # probe -> partition-pruned int8 ranking -> exact rescore),
    # its batched form (one codes pass for all queries), and
    # per-space quantization on a named collection
    "ingest_quantized_index_search",
    "ingest_quantized_batch_search",
    "ingest_named_quantized_search",
    # round 6: sparse IDF (BM42 weighting) and multi-stage prefetch
    "sparse_idf_knn_top10",
    "knn_multistage_prefetch_top5",
    # round 7: extended filter DSL (nested/min_should/values_count —
    # one scan predicate), datetime-range filter, tenant-defrag
    # lifecycle (upsert + clustered rewrite + footer audit), and
    # query-by-id (stored-vector fetch + self-excluded search)
    "docs_extended_filter_dsl",
    "events_datetime_filter_dsl",
    "ingest_tenant_defrag",
    "ingest_query_by_id",
    # round 7: SemDeDup — embedding near-dup blocked by learned IVF
    # cells (partition-local pair join over the centroid layout) and
    # its full resolution (components + farthest-from-centroid keep)
    "dedup_semantic_cells",
    "dedup_semantic_keep",
    # round 7: DSIR importance weights (two map passes + B-bounded agg)
    "docs_dsir_select",
    # round 7: sparse space through the collection lifecycle (write +
    # IDF-modified posting-pruned search + payload-off projection)
    "ingest_sparse_space_search",
    # round 7: mixed-space hybrid through the universal query API
    "ingest_hybrid_query",
    # round 8: production-width dense KNN (768-d, the width-gated HOF
    # scorer — every other KNN entry runs ≤64-d unrolled; a codegen
    # regression at real embedding width shows up here, VERDICT r7 #3)
    "knn_wide_dense_top5",
    # round 8: SemDeDup soft top-2 blocking (boundary-miss fix,
    # VERDICT r7 #5 — candidate volume ~4x hard cells, same n²/k bound)
    "dedup_semantic_soft_pairs",
    # round 8: persisted sparse posting layout (build = vocab + encode
    # + upsert + postings write; search = bucket/row-group-pruned
    # probe + candidate filter join) and Bloom incremental dedup
    # (one history scan into a broadcastable filter, map-side probe)
    "ingest_sparse_postings_search",
    "dedup_bloom_incremental",
    # round 8: the exchange-free bucketed soft-membership layout
    # (build = explode+normalize+bucketed write; search = the
    # zero-shuffle pair join — BASELINE.md §round-8 calibration)
    "dedup_semantic_soft_layout_pairs",
    # round 8: BQ shortlist -> exact rescore at production width
    # (768-d -> 24 packed words; sign-diverse dimension-mixed tiles)
    "ann_bq_wide_rescore_top5",
    # round 9: PCA as collection config (transform="pca") — lifecycle
    # build (train + projected cell-partitioned sidecar) + routed
    # compressed-space search with full-width rescore
    "ingest_pca_space_search",
    # round 9: OPQ — learned rotation before PQ at ann_pq_det_top5's
    # exact code budget (8×16, 32×); ADC probe over the cached
    # rotated-code table (build warmed outside the timer, like every
    # det tier)
    "ann_opq_top5",
    # round 9: product quantization as collection config (Qdrant
    # ProductQuantization parity; lifecycle by construction — the
    # components split shows build vs ADC+rescore read path)
    "ingest_pq_quantized_search",
    "ingest_opq_quantized_search",
    # round 9: QuantizationSearchParams(rescore=False) — the read
    # path is ONLY the codes sidecar (no full-vector stage)
    "ingest_quantized_noscore_search",
    # round 9: the full FAISS OPQ,IVF,PQ recipe through the catalog
    # (rotated cells-partitioned codes + probe + ADC + exact rescore)
    "ingest_opq_composed_search",
    # round 9 continuation: segment-sharded HNSW (the reference's
    # actual server-side index) — per-segment beam + literal-IN
    # rescore on the warmed graph layout, and the IVF-routed
    # composition probing nprobe cells' graphs only
    "ann_hnsw_top5",
    "ann_hnsw_routed_top5",
    # batched form: one deserialize+normalize per segment shared by
    # the whole query batch (the batch-shares-one-pass discipline)
    "ann_hnsw_batch_top3",
    # hnsw_config as collection config (Qdrant HnswConfigDiff — the
    # reference backend's actual index): lifecycle by construction,
    # components split shows cells+graphs build vs the graph-walk
    # read path
    "ingest_hnsw_index_search",
    # the reference's OWN configuration: multivector points behind
    # the server index — pooled-graph beam stage 1, exact MaxSim
    # rescore of the bounded candidates
    "ingest_hnsw_multivector_search",
    # max_segment_size: the bounded-segment rule as config (chunked
    # per-cell graphs, footer-expanded probes)
    "ingest_hnsw_segmented_search",
    # round 10: HNSW over quantized vectors — graphs over the int8
    # codes sidecar, decoded walk, exact full-width rescore (the
    # components split keeps the one-time build out of the tracked
    # SEARCH number, per the r9 verdict's lifecycle-domination note)
    "ingest_hnsw_quantized_search",
]

SMALL_RESULT = re.compile(r"top\d*|_top|lifecycle|candidates|near_pairs")


def materialize(df, name: str) -> None:
    if SMALL_RESULT.search(name):
        df.collect()
    else:
        df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark(app_name="bench", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))

    # warmup: JVM + python worker pool spin-up; the IVF warmup also
    # builds+persists the index, so its timed entry measures search on
    # a built index (the Qdrant-comparable number — HNSW build is
    # likewise one-time, outside the reference's search timer); the
    # maxsim warmup spins the Arrow/pandas-UDF worker pool so the
    # first UDF-bearing entry isn't billed the one-time startup
    REGISTRY["knn_dense_top5"].builder(spark, sf_dir).collect()
    REGISTRY["ann_ivf_top5"].builder(spark, sf_dir).collect()
    # ann_ivf_top5 warms the DETERMINISTIC layout since round 5; the
    # exhaustive twin still probes the Spark-ML-trained index — build
    # it outside the timer too (one-time cost policy, as before)
    REGISTRY["ann_ivf_exhaustive_top5"].builder(spark, sf_dir).collect()
    REGISTRY["ann_lsh_top5"].builder(spark, sf_dir).collect()
    REGISTRY["ann_sq_top5"].builder(spark, sf_dir).collect()
    REGISTRY["ann_bq_rescore_top5"].builder(spark, sf_dir).collect()
    REGISTRY["ann_bq_wide_rescore_top5"].builder(spark, sf_dir).collect()
    # pca-ivf: projected+assigned layout checkpoint (one-time build)
    REGISTRY["emb_pca_ivf_top5"].builder(spark, sf_dir).collect()
    REGISTRY["maxsim_top5"].builder(spark, sf_dir).collect()
    # det tiers: kmeans_np train + cached assignment/code frames are
    # the one-time index builds (same policy as the IVF warmup above);
    # ann_pq_top5 (4-block) builds its own code table, ann_ivfpq_top5
    # composes the two frames the first two warmups build
    REGISTRY["ann_ivf_det_top5"].builder(spark, sf_dir).collect()
    REGISTRY["ann_pq_det_top5"].builder(spark, sf_dir).collect()
    REGISTRY["ann_pq_top5"].builder(spark, sf_dir).collect()
    REGISTRY["ann_opq_top5"].builder(spark, sf_dir).collect()
    # sharded-HNSW graph layouts (plain + routed) are one-time builds
    REGISTRY["ann_hnsw_top5"].builder(spark, sf_dir).collect()
    REGISTRY["ann_hnsw_routed_top5"].builder(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    components: dict[str, dict[str, float]] = {}
    total = 0.0
    for name in HEADLINE:
        bench_phases.reset()
        t0 = time.perf_counter()
        materialize(REGISTRY[name].builder(spark, sf_dir), name)
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt
        # lifecycle entries mark their read path (phase "search") or,
        # for lazily-returned results, their eagerly-materialized
        # index build (phase "build"); the other component is the
        # remainder — so a read-path regression is attributable
        # instead of hiding inside create/upsert/train noise.
        marks = bench_phases.snapshot()
        if "search" in marks:
            s = round(min(marks["search"], dt), 3)
            components[name] = {"build": round(dt - s, 3), "search": s}
        elif "build" in marks:
            b = round(min(marks["build"], dt), 3)
            components[name] = {"build": b, "search": round(dt - b, 3)}

    # Emission layout for the driver's ~2000-char stdout TAIL (r8
    # verdict #6: the one giant per-query line kept only the last ~40
    # numbers in BENCH_r8's artifact). Order: full record line first
    # (local logs; truncated away in the artifact), then the
    # components map, then per-query timings as SHORT compact chunk
    # lines (10 queries each, stable HEADLINE order, ~290 chars/line
    # so a tail cut mid-line loses ≤9 numbers), then ONE short
    # parseable headline_total line LAST — the tail always carries
    # headline_total plus the final ~60 per-query numbers.
    record = {
        "metric": "headline_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "components": components,
        "sf": sf,
    }
    print(json.dumps(record))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_last.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({"bench_components": components},
                     separators=(",", ":")))
    items = list(timings.items())
    n_parts = -(-len(items) // 10)
    for i in range(0, len(items), 10):
        print(json.dumps({"p": f"{i // 10 + 1}/{n_parts}",
                          "q": dict(items[i:i + 10])},
                         separators=(",", ":")))
    # ONE compact per-query line the driver's ~2000-char stdout tail
    # always captures (r11 verdict #2 / PERF_r11 per_query empty): the
    # chunked lines above overflow the tail, so emit every timing as a
    # single ~700-char array — 2-dp floats in stable HEADLINE order —
    # immediately before the final headline_total line. Addition-only:
    # every pre-existing line is unchanged, so cross-round comparisons
    # stay valid.
    print(json.dumps({"t": [round(timings[n], 2) for n in HEADLINE]},
                     separators=(",", ":")))
    print(json.dumps({
        "metric": "headline_total",
        "value": round(total, 3),
        "unit": "sec",
        "n_queries": len(timings),
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
