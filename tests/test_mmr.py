"""MMR re-ranking: λ=1 reduces to relevance order, diversity actually
diversifies on clustered vectors, tie-break and k-bounding."""

from pyspark.sql import functions as F

from image_indexing_and_retrival_with_qdrant_spark.operators.mmr import mmr_rerank


def _clustered(spark):
    # cluster A hugs the query; cluster B sits on the other side of
    # the query (still relevant, far from A) so rel - maxsim favors it
    rows = [
        (1, [0.95, 0.31, 0.0]), (2, [0.952, 0.306, 0.0]),
        (3, [0.954, 0.3, 0.0]), (4, [0.956, 0.295, 0.0]),
        (10, [0.7, -0.714, 0.0]), (11, [0.71, -0.705, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def _q(spark):
    return spark.createDataFrame([([1.0, 0.0, 0.0],)],
                                 "query_vec array<double>")


def test_mmr_lambda1_is_relevance_order(spark):
    picks = mmr_rerank(spark, _clustered(spark), _q(spark), k=4,
                       lambda_=1.0, fetch_k=6, dim=3).collect()
    # pure relevance order: flattest vectors (largest x/norm) first
    assert [r.vec_id for r in picks] == [4, 3, 2, 1]
    assert [r.pick for r in picks] == [1, 2, 3, 4]
    # first pick's mmr IS its relevance
    assert picks[0].mmr_score == picks[0].relevance


def test_mmr_diversifies_clusters(spark):
    # λ=0.5: after taking the best of cluster A, the near-duplicates
    # of A score worse than the distinct cluster B
    picks = [r.vec_id for r in
             mmr_rerank(spark, _clustered(spark), _q(spark), k=2,
                        lambda_=0.5, fetch_k=6, dim=3).collect()]
    assert picks[0] == 4
    assert picks[1] in (10, 11)  # not 1/2/3 (near-dups of pick 1)


def test_mmr_k_bounded_by_corpus(spark):
    small = _clustered(spark).filter(F.col("vec_id") <= 2)
    picks = mmr_rerank(spark, small, _q(spark), k=10, fetch_k=50,
                       dim=3).collect()
    assert len(picks) == 2
