"""ANN recall curve on *clustered* vectors (the corpus shape ANN is
for). The driver fixture's vectors are uniform-random — no cluster
structure (within-label mean cosine ≈ 0.02) — so recall measured there
is the floor any method hits, not a quality signal. This harness
generates a seeded mixture-of-Gaussians corpus (the standard synthetic
for ANN evaluation) and reports recall@10 vs the exact scan for every
tier: IVF across nprobe, sign-LSH, PQ (ADC over 32×-compressed codes),
and composed IVF→PQ→exact-rerank.

Run: ``python recall_curve.py [n_rows] [n_queries]`` → one JSON line.
Numbers are recorded in BASELINE.md §recall; tests/test_ann_clustered.py
pins the same setup at smaller n with thresholds just under these.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
from pyspark.sql import functions as F

from image_indexing_and_retrival_with_qdrant_spark.operators.ann import (
    ivf_build,
    ivf_search,
    lsh_band_frame,
    lsh_candidates,
    lsh_probe,
)
from image_indexing_and_retrival_with_qdrant_spark.operators.knn import dense_knn
from image_indexing_and_retrival_with_qdrant_spark.operators.pq import (
    ivfpq_search,
    pq_build,
    pq_search,
)
from image_indexing_and_retrival_with_qdrant_spark.session import get_spark

DIM = 64
N_CLUSTERS = 10
SIGMA = 0.18  # cluster tightness: within-cluster cosine ≈ 0.9


def clustered_corpus(spark, n: int, seed: int = 13):
    """Seeded mixture of Gaussians: centers uniform on the unit
    sphere, points = center + N(0, SIGMA²) — resembling an embedding
    corpus where semantically-close items cluster."""
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, N_CLUSTERS, size=n)
    pts = centers[labels] + SIGMA * rng.standard_normal((n, DIM))
    rows = [(int(i), [float(x) for x in pts[i]], int(labels[i]))
            for i in range(n)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).repartition(8).cache()


def recall(approx_ids: set, exact_ids: set) -> float:
    return len(approx_ids & exact_ids) / len(exact_ids)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    k = 10
    spark = get_spark("recall", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    corpus = clustered_corpus(spark, n)
    corpus.count()

    rng = np.random.RandomState(99)
    qids = sorted(int(i) for i in rng.choice(n, size=n_q, replace=False))
    qvecs = {r.vec_id: r.embedding for r in
             corpus.filter(F.col("vec_id").isin(qids)).collect()}

    def qdf(qid):
        return spark.createDataFrame([(qvecs[qid],)],
                                     "query_vec array<double>")

    exact = {}
    for qid in qids:
        exact[qid] = {r.vec_id for r in
                      dense_knn(corpus, qdf(qid), k=k, dim=DIM).collect()}

    out = {"n": n, "dim": DIM, "clusters": N_CLUSTERS, "sigma": SIGMA,
           "k": k, "n_queries": n_q}
    t0 = time.time()

    assigned, centroids = ivf_build(corpus, k_centroids=16, seed=42)
    assigned = assigned.cache()
    assigned.count()
    for nprobe in (1, 2, 4, 8):
        r = [recall({x.vec_id for x in
                     ivf_search(assigned, centroids, qdf(q), k=k,
                                nprobe=nprobe).collect()}, exact[q])
             for q in qids]
        out[f"ivf_recall@10_nprobe{nprobe}"] = round(float(np.mean(r)), 3)

    # one-time band layout (the cached/persisted index form); every
    # probe variant below reuses it — build outside the timer, like
    # Qdrant's HNSW build
    c_stack = lsh_band_frame(corpus, DIM, carry_cols=("vec_id", "embedding"),
                             n_planes=16, n_bands=4).cache()
    c_stack.count()
    for m in (0, 1, 2):
        r, cands = [], []
        for q in qids:
            r.append(recall(
                {x.vec_id for x in
                 lsh_probe(c_stack, qdf(q), dim=DIM, k=k, n_planes=16,
                           n_bands=4, multiprobe=m).collect()}, exact[q]))
            cands.append(lsh_candidates(
                c_stack, qdf(q), dim=DIM, n_planes=16, n_bands=4,
                multiprobe=m).count())
        tag = "" if m == 0 else f"_multiprobe{m}"
        out[f"lsh_recall@10_16planes_4bands{tag}"] = round(float(np.mean(r)), 3)
        out[f"lsh_candidates{tag}"] = int(np.mean(cands))
    c_stack.unpersist()

    # the recall≥0.9-at-≤2×-cost configuration (BASELINE.md §recall):
    # 6-bit bands are selective enough that Hamming-1 expansion lands
    # under 2× the plain 16/4 candidate count
    c_stack = lsh_band_frame(corpus, DIM, carry_cols=("vec_id", "embedding"),
                             n_planes=24, n_bands=4).cache()
    c_stack.count()
    r, cands = [], []
    for q in qids:
        r.append(recall(
            {x.vec_id for x in
             lsh_probe(c_stack, qdf(q), dim=DIM, k=k, n_planes=24,
                       n_bands=4, multiprobe=1).collect()}, exact[q]))
        cands.append(lsh_candidates(
            c_stack, qdf(q), dim=DIM, n_planes=24, n_bands=4,
            multiprobe=1).count())
    out["lsh_recall@10_24planes_4bands_multiprobe1"] = round(
        float(np.mean(r)), 3)
    out["lsh_candidates_24planes_multiprobe1"] = int(np.mean(cands))
    c_stack.unpersist()

    # 8 blocks × 128 codewords: the large-codebook regime (Arrow-batched
    # numpy assignment — the unrolled expression dies past ~64 codes)
    codes, codebooks = pq_build(corpus, dim=DIM, n_blocks=8, k_codes=128)
    codes = codes.cache()
    codes.count()
    r = [recall({x.vec_id for x in
                 pq_search(codes, codebooks, qvecs[q], k=k).collect()},
                exact[q])
         for q in qids]
    out["pq_recall@10_8x128"] = round(float(np.mean(r)), 3)

    acodes = codes.join(assigned.select("vec_id", "centroid_id"),
                        on="vec_id").cache()
    acodes.count()
    for nprobe, rescore in ((2, 100), (4, 100), (4, 200)):
        r = [recall({x.vec_id for x in
                     ivfpq_search(acodes, centroids, codebooks, corpus,
                                  qvecs[q], k=k, nprobe=nprobe,
                                  rescore=rescore).collect()}, exact[q])
             for q in qids]
        out[f"ivfpq_recall@10_nprobe{nprobe}_rescore{rescore}"] = round(
            float(np.mean(r)), 3)

    out["wall_sec"] = round(time.time() - t0, 1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
