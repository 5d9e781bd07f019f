"""Ingestion pipeline: S/P/E operators (SURVEY.md §2.1-§2.2, §2.6)."""

import os

import pytest
from pyspark.sql import functions as F

from image_indexing_and_retrival_with_qdrant_spark.catalog import create_collection
from image_indexing_and_retrival_with_qdrant_spark.registry import REGISTRY
from image_indexing_and_retrival_with_qdrant_spark.sources.embedder import (
    HashEmbedder,
    PandasHashEmbedder,
)
from image_indexing_and_retrival_with_qdrant_spark.sources.files import (
    scan_images,
    with_path_parts,
)
from image_indexing_and_retrival_with_qdrant_spark.tables import load

from .oracle import compare

INGEST = [
    "ingest_build_points",
    "ingest_embed_stub",
    "ingest_search_e2e",
    "ingest_collection_lifecycle",
    "ingest_payload_index",
    "ingest_snapshot_restore",
    "ingest_sharded_search",
    "ingest_merge_overwrite",
    "ingest_tenant_defrag",
    "ingest_query_by_id",
    "ingest_image_pipeline_e2e",
]

# 1x1 valid PNG + JPEG magic bytes (plumbing test; decode is stubbed)
_PNG = bytes.fromhex(
    "89504e470d0a1a0a0000000d49484452000000010000000108060000001f15c489"
    "0000000d49444154789c626001000000ffff03000006000557bfabd40000000049454e44ae426082"
)


@pytest.mark.parametrize("name", INGEST)
def test_ingest_oracle(spark, sf_smoke, name):
    compare(spark, REGISTRY[name], sf_smoke, name)


def test_hash_embedders_agree(spark, sf_smoke):
    """The Catalyst-expression stub and the mapInPandas stub must
    produce bit-identical vectors (same md5-derived math)."""
    docs = load(spark, sf_smoke, "documents").limit(50)
    a = HashEmbedder(dim=8).embed(docs).select("doc_id", "embedding")
    b = PandasHashEmbedder(dim=8).embed(docs).select("doc_id", "embedding")
    ra = {r.doc_id: r.embedding for r in a.collect()}
    rb = {r.doc_id: r.embedding for r in b.collect()}
    assert ra == rb


def test_scan_images_extension_filter(spark, tmp_path):
    """S4: {.jpg,.jpeg,.png} case-insensitive filter; folder layout
    pins convert_pdf_to_image.py:41-49 ({pdf}/{pdf}_page_{n}.png)."""
    root = tmp_path / "corpus"
    (root / "docA").mkdir(parents=True)
    (root / "docB").mkdir()
    (root / "docA" / "docA_page_1.png").write_bytes(_PNG)
    (root / "docA" / "docA_page_2.PNG").write_bytes(_PNG)
    (root / "docB" / "docB_page_1.JpEg").write_bytes(_PNG)
    (root / "docB" / "notes.txt").write_bytes(b"not an image")
    (root / "docB" / "docB.pdf").write_bytes(b"%PDF-fake")

    df = scan_images(spark, str(root))
    paths = sorted(r.path for r in df.select("path").collect())
    assert len(paths) == 3
    assert all(p.lower().endswith((".png", ".jpeg")) for p in paths)

    parts = with_path_parts(df, str(root))
    row = {r.filename: r for r in parts.collect()}
    assert row["docA_page_1.png"].folder == "docA"
    assert row["docA_page_1.png"].relative_path == "docA/docA_page_1.png"
    assert not row["docA_page_1.png"].full_path.startswith("file:")


def test_collection_dimension_check(spark, tmp_path):
    coll = create_collection(str(tmp_path), "c1", dim=4, metric="cosine")
    good = spark.createDataFrame(
        [("a", [1.0, 0.0, 0.0, 0.0])], "id string, embedding array<double>"
    )
    coll.upsert(spark, good)
    assert coll.count(spark) == 1
    bad = spark.createDataFrame(
        [("b", [1.0, 0.0])], "id string, embedding array<double>"
    )
    with pytest.raises(ValueError, match="dimension mismatch"):
        coll.upsert(spark, bad)


def test_dimension_check_deferred_and_eager_paths(spark, tmp_path):
    """The dim check rides the write on atomic paths (fresh
    collection / plain append — an in-row raise_error guard, no
    separate validation pass) and stays an eager pre-write check on
    merge-into-existing-data; both must surface the same ValueError
    and leave the collection unchanged."""
    coll = create_collection(str(tmp_path), "cd", dim=3, metric="dot")
    bad = spark.createDataFrame(
        [("b", [1.0, 0.0])], "id string, embedding array<double>")
    # deferred path: fresh collection, append mode
    with pytest.raises(ValueError, match="dimension mismatch"):
        coll.upsert(spark, bad)
    assert coll.count(spark) == 0
    good = spark.createDataFrame(
        [("a", [1.0, 0.0, 0.0])], "id string, embedding array<double>")
    coll.upsert(spark, good)
    # eager path: merge into existing data (pre-write, atomic)
    with pytest.raises(ValueError, match="dimension mismatch"):
        coll.upsert(spark, bad, mode="merge")
    assert coll.count(spark) == 1
    # deferred path on a nested-multivector collection
    mcoll = create_collection(str(tmp_path), "cm", dim=2,
                              multivector=True)
    mv_bad = spark.createDataFrame(
        [("x", [[1.0, 0.0], [1.0]])],
        "id string, embedding array<array<double>>")
    with pytest.raises(ValueError, match="dimension mismatch"):
        mcoll.upsert(spark, mv_bad)
    assert mcoll.count(spark) == 0


def test_collection_normalizes_on_write(spark, tmp_path):
    coll = create_collection(str(tmp_path), "c2", dim=2, metric="cosine")
    pts = spark.createDataFrame(
        [("a", [3.0, 4.0])], "id string, embedding array<double>"
    )
    coll.upsert(spark, pts)
    [row] = coll.read(spark).collect()
    assert row.embedding == pytest.approx([0.6, 0.8])


def test_merge_replaces_on_conflict(spark, tmp_path):
    """merge = Qdrant upsert semantics: a re-delivered id takes the
    NEW row (vector/payload refresh), it is not silently ignored."""
    coll = create_collection(str(tmp_path), "m", dim=2, metric="cosine",
                             normalize=False)
    v1 = spark.createDataFrame(
        [("a", [1.0, 0.0], "old")],
        "id string, embedding array<double>, tag string",
    )
    coll.upsert(spark, v1, mode="merge")
    v2 = spark.createDataFrame(
        [("a", [0.0, 1.0], "new"), ("b", [1.0, 1.0], "fresh")],
        "id string, embedding array<double>, tag string",
    )
    coll.upsert(spark, v2, mode="merge")
    rows = {r.id: r for r in coll.read(spark).collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"].tag == "new" and rows["a"].embedding == [0.0, 1.0]
    # idempotent re-delivery of identical rows keeps the count stable
    coll.upsert(spark, v2, mode="merge")
    assert coll.count(spark) == 2


def test_search_normalizes_query_vector(spark, tmp_path):
    """For cosine (normalize-at-write) collections the query vector is
    normalized at search time too, so scores are true cosine — an
    unnormalized query must score exactly like its normalized self."""
    coll = create_collection(str(tmp_path), "nq", dim=2, metric="cosine")
    pts = spark.createDataFrame(
        [("a", [3.0, 4.0]), ("b", [1.0, 0.0])],
        "id string, embedding array<double>",
    )
    coll.upsert(spark, pts)
    scaled = coll.search(spark, [30.0, 40.0], k=2).collect()
    unit = coll.search(spark, [0.6, 0.8], k=2).collect()
    assert [(r.id, r.score) for r in scaled] == [(r.id, r.score) for r in unit]
    assert scaled[0].id == "a" and scaled[0].score == 1.0


def test_point_id_uuid_mode(spark, sf_smoke):
    """P1 reference mode: uuid4 per row — unique across re-runs
    (append-duplication semantics, SURVEY.md §1.4)."""
    from image_indexing_and_retrival_with_qdrant_spark.sources.ingest import build_points

    docs = load(spark, sf_smoke, "documents").limit(20).withColumn(
        "embedding", F.array(F.lit(0.0))
    )
    # Two indexing runs = two plans (Spark seeds uuid() per plan, so
    # re-collecting one plan repeats ids; a new run gets fresh ones).
    run1 = build_points(docs, id_key=None, with_timestamp=True)
    run2 = build_points(docs, id_key=None, with_timestamp=True)
    ids = [r.id for r in run1.select("id").collect()] + [
        r.id for r in run2.select("id").collect()
    ]
    assert len(set(ids)) == len(ids)  # append-duplication: all distinct ids
    assert run1.schema["indexed_at"].dataType.typeName() == "timestamp"


def test_hf_embedder_gated(spark, sf_smoke):
    """E1-E6 adapter: clear gate when torch/transformers are absent
    (mirrors the reference's local_files_only offline requirement)."""
    from image_indexing_and_retrival_with_qdrant_spark.sources.embedder import (
        HuggingFaceEmbedder,
    )

    emb = HuggingFaceEmbedder("some/model", multivector=True)
    docs = load(spark, sf_smoke, "documents").limit(2)
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="torch/transformers"):
            emb.embed(docs)


def test_collection_search_api(spark, sf_smoke, tmp_path):
    """Collection.search = the client.query_points analog: dense path
    honors normalize-at-write + filters; multivector path MaxSims."""
    from image_indexing_and_retrival_with_qdrant_spark.sources.embedder import (
        HashEmbedder,
    )
    from image_indexing_and_retrival_with_qdrant_spark.sources.ingest import (
        build_points,
    )

    docs = load(spark, sf_smoke, "documents").limit(100)
    pts = build_points(
        HashEmbedder(dim=8).embed(docs),
        id_key=F.col("text"),
        payload={"doc_id": F.col("doc_id"), "lang": F.col("lang")},
        with_timestamp=False,
    )
    coll = create_collection(str(tmp_path), "s", dim=8, metric="cosine")
    coll.upsert(spark, pts)

    qvec = [float(x) for x in
            coll.read(spark).limit(1).collect()[0].embedding]
    hits = coll.search(spark, qvec, k=3).collect()
    assert len(hits) == 3 and hits[0].score == 1.0  # self-match

    only_de = coll.search(spark, qvec, k=5,
                          query_filter=F.col("lang") == "de").collect()
    assert all(r.lang == "de" for r in only_de)

    thr = coll.search(spark, qvec, k=None, score_threshold=0.99).collect()
    assert all(r.score >= 0.99 for r in thr)


def test_payload_facet_oracle(spark, sf_smoke):
    compare(spark, REGISTRY["ingest_payload_facet"], sf_smoke,
            "ingest_payload_facet")


def test_embed_local_bit_parity(spark):
    """embed_local (driver-side md5 twin, no Spark job) must produce
    the EXACT float64 bits of the Catalyst expr path for both prompt
    modes and under normalize=True — the query paths build literal
    IN/array expressions from these values, so one ulp of drift would
    flip oracle hashes."""
    texts = ["what is the meaning of life", "", "Ünïcode § text",
             "a" * 500, "tab\tand\nnewline"]
    for normalize in (False, True):
        emb = HashEmbedder(dim=8, normalize=normalize)
        for mode in ("passage", "query"):
            df = spark.createDataFrame([(t,) for t in texts],
                                       "text string").coalesce(1)
            via_spark = [list(r.embedding)
                         for r in emb.embed(df, mode=mode).collect()]
            via_local = emb.embed_local(texts, mode=mode)
            assert via_spark == via_local, (normalize, mode)
