"""File-corpus scans (SURVEY.md §2.1 S1–S6).

The reference walks folders with ``rglob`` + suffix filters
(``incremental_indexing_colpali_with_qdrant.py:143-163``,
``shared/get_all_folder_details.py:57-78``) and decodes images
eagerly. Spark-first: one ``binaryFile`` scan with
``recursiveFileLookup`` replaces the whole S3/S4 family; the extension
predicate is a ``pathGlobFilter`` (pushed to the file index, never
reads excluded bytes); decode happens lazily inside the embedding UDF.

At 100 TB the file listing itself is driver-side — for huge corpora
prefer fewer, larger container files (tar/parquet of bytes); these
helpers accept either (a directory of loose files or a parquet of
``(path, content)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["scan_binary_files", "scan_images", "scan_pdfs", "read_json_documents",
           "with_path_parts"]

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png")  # incremental_indexing_colpali_with_qdrant.py:146


def scan_binary_files(spark: SparkSession, root: str,
                      glob: str | None = None) -> DataFrame:
    """Recursive binaryFile scan → (path, modificationTime, length,
    content)."""
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(root)


def scan_images(spark: SparkSession, root: str) -> DataFrame:
    """S4: recursive image scan with the reference's case-insensitive
    {.jpg,.jpeg,.png} predicate."""
    df = scan_binary_files(spark, root)
    pattern = r"(?i)\.(jpe?g|png)$"
    return df.filter(F.col("path").rlike(pattern))


def scan_pdfs(spark: SparkSession, root: str) -> DataFrame:
    """S1: PDF listing (rasterization is in multimodal.py)."""
    return scan_binary_files(spark, root, glob="*.pdf")


def read_json_documents(spark: SparkSession, path: str) -> DataFrame:
    """S6: JSON array of {id,title,content} records
    (``jina_v4_text_indexer.py:148-157``)."""
    return spark.read.option("multiLine", "true").json(path)


def with_path_parts(df: DataFrame, base_path: str,
                    path_col: str = "path") -> DataFrame:
    """P2: filename / relative_path / folder decomposition as string
    expressions (``incremental_indexing_colpali_with_qdrant.py:253,261-264``)."""
    p = F.col(path_col)
    # binaryFile paths carry a file: scheme; strip it for relativization
    clean = F.regexp_replace(p, "^file:", "")
    base = base_path.rstrip("/")
    return (
        df.withColumn("full_path", clean)
        .withColumn("filename", F.element_at(F.split(clean, "/"), -1))
        .withColumn(
            "relative_path",
            F.regexp_replace(clean, "^" + base + "/", ""),
        )
        .withColumn(
            "folder",
            F.element_at(F.split(clean, "/"), -2),
        )
    )
