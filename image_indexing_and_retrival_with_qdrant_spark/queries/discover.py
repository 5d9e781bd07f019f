"""Discovery / context search + distance matrix queries.

Qdrant client surface beyond the reference's own calls (SURVEY.md
§2.4 — the reference stops at ``query_points``): ``discover``,
context-only search, and ``search_matrix_pairs``.

Oracle discipline (registry.py docstring): pair scores are rounded to
6 dp on BOTH engines *before* any comparison/difference, so zone
membership, ranks, and context sums are bit-stable given the
established round-match invariant of the cosine shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hash64
from ..operators.discover import context_search, discovery_search
from ..operators.matrix import distance_matrix_pairs
from ..registry import register
from ..tables import load

# Same DuckDB cosine fragment as queries/knn.py (proven round-match).
_COS = (
    "list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[]))))"
)


def _rcos(a: str, b: str) -> str:
    return f"ROUND({_COS.format(a=a, b=b)}, 6)"


def _vecs(spark: SparkSession, sf_dir: str, ids: list[int]) -> dict:
    emb = load(spark, sf_dir, "embeddings")
    rows = emb.filter(F.col("vec_id").isin(ids)).select(
        "vec_id", "embedding").collect()
    return {r.vec_id: [float(x) for x in r.embedding] for r in rows}


# CTEs binding the example vectors; the Spark side fetches the same
# rows driver-side (O(#examples), like knn_recommend_top5).
_CTX_CTES = """
    t  AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0),
    p1 AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 1),
    n1 AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 2),
    p2 AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 3),
    n2 AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 4)
"""


@register(
    "knn_discover_top5",
    f"""
    WITH {_CTX_CTES}
    SELECT e.vec_id,
           CAST((CASE WHEN {_rcos('e.embedding', 'p1.v')} > {_rcos('e.embedding', 'n1.v')}
                      THEN 1 ELSE -1 END)
              + (CASE WHEN {_rcos('e.embedding', 'p2.v')} > {_rcos('e.embedding', 'n2.v')}
                      THEN 1 ELSE -1 END) AS INTEGER) AS rank,
           {_rcos('e.embedding', 't.v')} AS score
    FROM embeddings e
    CROSS JOIN t CROSS JOIN p1 CROSS JOIN n1 CROSS JOIN p2 CROSS JOIN n2
    ORDER BY rank DESC, score DESC, e.vec_id
    LIMIT 5
    """,
)
def knn_discover_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discovery search (Qdrant Discovery API): target = vector 0,
    context pairs (1⊕, 2⊖) and (3⊕, 4⊖). Rank = zones satisfied
    (+1/−1 per pair), ties broken by target cosine. Single scan-local
    pass — the pairs are literals folded into the projection."""
    v = _vecs(spark, sf_dir, [0, 1, 2, 3, 4])
    emb = load(spark, sf_dir, "embeddings")
    return discovery_search(
        emb, v[0], [(v[1], v[2]), (v[3], v[4])], k=5, dim=64)


@register(
    "knn_context_top5",
    f"""
    WITH {_CTX_CTES}
    SELECT e.vec_id,
           LEAST(0.0, {_rcos('e.embedding', 'p1.v')} - {_rcos('e.embedding', 'n1.v')})
         + LEAST(0.0, {_rcos('e.embedding', 'p2.v')} - {_rcos('e.embedding', 'n2.v')})
           AS score
    FROM embeddings e
    CROSS JOIN p1 CROSS JOIN n1 CROSS JOIN p2 CROSS JOIN n2
    ORDER BY score DESC, e.vec_id
    LIMIT 5
    """,
)
def knn_context_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-only search: score = Σ min(0, s⊕ − s⊖) over the same
    pairs — 0 means inside every positive zone; ties broken by id
    (Qdrant leaves intra-score order unspecified)."""
    v = _vecs(spark, sf_dir, [1, 2, 3, 4])
    emb = load(spark, sf_dir, "embeddings")
    return context_search(emb, [(v[1], v[2]), (v[3], v[4])], k=5, dim=64)


@register(
    "matrix_pairs_top3",
    f"""
    WITH s AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
      ORDER BY CAST(('0x' || substr(md5('matrix:' || CAST(vec_id AS VARCHAR)), 1, 15))
                    AS BIGINT), vec_id
      LIMIT 20
    ),
    scored AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_rcos('a.v', 'b.v')} AS score
      FROM s a JOIN s b ON a.vec_id <> b.vec_id
    )
    SELECT id_a, id_b, score,
           CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT id_a, id_b, score,
             row_number() OVER (PARTITION BY id_a
                                ORDER BY score DESC, id_b) AS rank
      FROM scored
    )
    WHERE rank <= 3
    """,
)
def matrix_pairs_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance matrix (Qdrant ``search_matrix_pairs``): deterministic
    content-hash sample of 20 vectors, each scored against the other
    19, top-3 kept. The all-pairs join is sample-sized — a broadcast of
    20 rows — never corpus-sized."""
    emb = load(spark, sf_dir, "embeddings")
    picked = (
        emb.select("vec_id", "embedding")
        .withColumn("__h", hash64(
            F.concat(F.lit("matrix:"), F.col("vec_id").cast("string"))))
        .orderBy("__h", "vec_id").limit(20).drop("__h")
    )
    return distance_matrix_pairs(picked, k=3, dim=64)


# ---------------------------------------------------------------------------
# Geo polygon filter (Qdrant GeoPolygon condition, oracle-checked)
# ---------------------------------------------------------------------------

from ..filters import FieldCondition, Filter  # noqa: E402

# Pentagon over the mid-latitudes with a triangular hole; both the
# Column and the SQL predicate compile from this ONE tree, so the
# ray-casting semantics themselves are oracle-checked.
_POLY = Filter(must=[FieldCondition("loc", geo_polygon={
    "exterior": [
        {"lat": 70.0, "lon": -150.0}, {"lat": 75.0, "lon": 20.0},
        {"lat": 10.0, "lon": 170.0}, {"lat": -55.0, "lon": 60.0},
        {"lat": -40.0, "lon": -120.0},
    ],
    "interiors": [[
        {"lat": 40.0, "lon": -60.0}, {"lat": 50.0, "lon": 40.0},
        {"lat": -10.0, "lon": -10.0},
    ]],
})])

# lat/lon synthesized from doc_id with exact integer arithmetic, then
# identical double ops on both engines — bit-stable coordinates.
_LOC_SQL = """
  SELECT doc_id,
         {'lat': (doc_id * 7) % 1800 / 10.0 - 90.0,
          'lon': (doc_id * 13) % 3600 / 10.0 - 180.0} AS loc
  FROM documents
"""


@register(
    "docs_geo_polygon",
    f"""
    WITH pts AS ({_LOC_SQL})
    SELECT doc_id, loc.lat AS lat, loc.lon AS lon
    FROM pts
    WHERE {_POLY.to_sql()}
    """,
)
def docs_geo_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeoPolygon payload filter (Qdrant ``FieldCondition.geo_polygon``):
    even-odd ray casting with a hole, folded into the scan as a plain
    Catalyst predicate — pushdown-eligible like every DSL filter, no
    join, no shuffle."""
    d = load(spark, sf_dir, "documents")
    pts = d.select(
        "doc_id",
        F.struct(
            ((F.col("doc_id") * 7) % 1800 / 10.0 - 90.0).alias("lat"),
            ((F.col("doc_id") * 13) % 3600 / 10.0 - 180.0).alias("lon"),
        ).alias("loc"),
    )
    return (pts.filter(_POLY.to_column())
            .select("doc_id", F.col("loc.lat").alias("lat"),
                    F.col("loc.lon").alias("lon")))


# ---------------------------------------------------------------------------
# MMR diversified re-ranking (Qdrant universal-query `mmr` option)
# ---------------------------------------------------------------------------

def _mmr_oracle(k: int = 5, fetch_k: int = 50, lam: float = 0.5) -> str:
    """Greedy MMR unrolled to ``k`` chained CTEs — an *independent*
    SQL implementation of the same recurrence (argmax per step over
    the shortlist, diversity term = greatest rounded cosine to the
    already-picked set)."""
    def rcos(a: str, b: str) -> str:
        return _rcos(a, b)

    ctes = [
        "q AS (SELECT CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings WHERE vec_id = 0)",
        f"""cand AS (
          SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v,
                 {rcos('e.embedding', 'q.v')} AS rel
          FROM embeddings e CROSS JOIN q
          ORDER BY rel DESC, e.vec_id LIMIT {fetch_k})""",
        "s1 AS (SELECT vec_id, v, rel, rel AS mmr FROM cand "
        "ORDER BY rel DESC, vec_id LIMIT 1)",
    ]
    for i in range(2, k + 1):
        prev = [f"s{j}" for j in range(1, i)]
        sims = [rcos("c.v", f"{p}.v") for p in prev]
        maxsim = sims[0] if len(sims) == 1 else f"GREATEST({', '.join(sims)})"
        joins = " ".join(f"CROSS JOIN {p}" for p in prev)
        excl = ", ".join(f"{p}.vec_id" for p in prev)
        ctes.append(f"""s{i} AS (
          SELECT c.vec_id, c.v, c.rel,
                 ROUND({lam!r} * c.rel - {1.0 - lam!r} * {maxsim}, 6) AS mmr
          FROM cand c {joins}
          WHERE c.vec_id NOT IN ({excl})
          ORDER BY mmr DESC, c.vec_id LIMIT 1)""")
    unions = "\nUNION ALL ".join(
        f"SELECT {i} AS pick, vec_id, rel AS relevance, mmr AS mmr_score "
        f"FROM s{i}" for i in range(1, k + 1))
    return "WITH " + ",\n".join(ctes) + "\n" + unions


@register("knn_mmr_top5", _mmr_oracle())
def knn_mmr_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified top-5 (λ=0.5, shortlist 50, query = vector 0).
    The shortlist is the distributed scan-local dense pass; the greedy
    selection is sequential by definition and runs driver-side over
    the O(fetch_k) collected rows — Qdrant's own rescoring envelope.
    The oracle re-implements the recurrence as chained SQL CTEs."""
    from ..operators.mmr import mmr_rerank

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_vec"))
    return mmr_rerank(spark, emb, q, k=5, lambda_=0.5, fetch_k=50, dim=64)
