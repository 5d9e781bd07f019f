"""Collection catalog (SURVEY.md §1.1, §2.1 S7–S9).

A *collection* is the reference's unit of storage: a named set of
points with a declared vector configuration
(``client.create_collection(vectors_config=...)``,
``incremental_indexing_colpali_with_qdrant.py:116-141``). Here a
collection is a parquet table at ``<root>/<name>`` plus a JSON
sidecar holding the vector config (dim, metric, comparator,
normalize-at-write) — the table-properties analog.

Write modes (SURVEY.md §1.4):
- ``append`` — reproduces reference behavior exactly: every upsert
  adds rows, re-indexing duplicates points (fresh ``uuid4`` ids,
  ``incremental_indexing_colpali_with_qdrant.py:258``).
- ``merge`` — the honest upsert: deterministic content-keyed ids, a
  left-anti join drops rows whose id is already stored, then append.
  (With Delta/Iceberg on the classpath this becomes MERGE INTO; the
  anti-join formulation needs no extra jars and shuffles only the id
  column of the existing table.)

For COSINE collections vectors are L2-normalized at write
(``normalize=True``), so query-time scoring is a plain dot product —
Qdrant does exactly this server-side for ``Distance.COSINE``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.vector import as_double, l2_normalize

__all__ = ["Collection", "create_collection", "collection_exists"]


class Collection:
    def __init__(self, root: str, name: str):
        self.path = os.path.join(root, name)
        self.meta_path = os.path.join(root, f"{name}.meta.json")
        with open(self.meta_path) as f:
            self.meta = json.load(f)

    # -- S8: upsert -------------------------------------------------------

    def upsert(self, spark: SparkSession, points: DataFrame,
               mode: str = "append", id_col: str = "id",
               vec_col: str = "embedding") -> None:
        if self.meta.get("normalize") and vec_col in points.columns:
            points = points.withColumn(
                vec_col, l2_normalize(as_double(F.col(vec_col)))
            )
        dim = self.meta.get("dim")
        if dim and vec_col in points.columns and not self.meta.get("multivector"):
            # dimension check at write (schema discipline, SURVEY.md §1.3)
            bad = points.filter(F.size(F.col(vec_col)) != dim).limit(1).count()
            if bad:
                raise ValueError(
                    f"vector dimension mismatch: expected {dim} "
                    f"(collection {self.path})"
                )
        if mode == "merge" and self._has_data(spark):
            existing_ids = spark.read.parquet(self.path).select(id_col)
            points = points.join(existing_ids, on=id_col, how="left_anti")
        points.write.mode("append").parquet(self.path)

    def _has_data(self, spark: SparkSession) -> bool:
        try:
            spark.read.parquet(self.path).schema
            return True
        except Exception:
            return False

    # -- query_points analog ---------------------------------------------

    def search(self, spark: SparkSession, query_vector: list,
               k: int = 5, query_filter=None, score_threshold=None,
               id_col: str = "id", vec_col: str = "embedding"):
        """The engine's ``client.query_points``
        (``with_vdr-2b-multi-v1/query_vdr_2b_multi_v1.py:78-83``):
        top-k by the collection's declared metric/comparator, with the
        optional payload filter Qdrant declares but the reference never
        uses (F4), and score_threshold. Dispatches on the collection
        config: dense cosine (dot if normalize-at-write is on) vs
        multivector MaxSim."""
        from pyspark.sql import functions as F

        from .operators.knn import dense_knn
        from .operators.maxsim import maxsim_knn

        corpus = self.read(spark)
        if self.meta.get("multivector"):
            qdf = spark.createDataFrame(
                [(query_vector,)], f"query_vectors array<array<double>>"
            )
            return maxsim_knn(corpus, qdf, k=k, id_col=id_col, mv_col=vec_col)
        qdf = spark.createDataFrame([(query_vector,)], "query_vec array<double>")
        payload = [c for c in corpus.columns if c not in (id_col, vec_col)]
        return dense_knn(
            corpus, qdf, k=k, id_col=id_col, vec_col=vec_col,
            payload_cols=payload, prefilter=query_filter,
            score_threshold=score_threshold,
            prenormalized=bool(self.meta.get("normalize")),
            dim=self.meta.get("dim"),
        )

    # -- S9: stats --------------------------------------------------------

    def count(self, spark: SparkSession) -> int:
        if not self._has_data(spark):
            return 0
        return spark.read.parquet(self.path).count()

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)


def collection_exists(root: str, name: str) -> bool:
    return os.path.exists(os.path.join(root, f"{name}.meta.json"))


def create_collection(root: str, name: str, dim: int,
                      metric: str = "cosine", multivector: bool = False,
                      comparator: str | None = None,
                      normalize: bool | None = None) -> Collection:
    """S7: create-if-not-exists DDL
    (``ensure_collection_exists``,
    ``incremental_indexing_colpali_with_qdrant.py:116-141``).
    Idempotent: an existing collection is returned unchanged."""
    os.makedirs(root, exist_ok=True)
    if not collection_exists(root, name):
        if normalize is None:
            normalize = metric == "cosine"
        meta = {
            "dim": dim,
            "metric": metric,
            "multivector": multivector,
            "comparator": comparator or ("max_sim" if multivector else None),
            "normalize": normalize,
        }
        with open(os.path.join(root, f"{name}.meta.json"), "w") as f:
            json.dump(meta, f)
    return Collection(root, name)
