"""Command-line entry points mirroring the reference's script surface.

The reference ships runnable scripts per pipeline stage:
- ``shared/convert_pdf_to_image.py`` (PDF → page PNGs)
- ``with_*/incremental_indexing_*.py`` (index a folder tree)
- ``with_*/qdrant_query_*.py`` / ``*_retrieval.py`` (search + display)

Engine equivalents (stub embedder by default; set ENGINE_MODEL_PATH
for the gated HF adapter):

    python -m image_indexing_and_retrival_with_qdrant_spark.cli convert --pdf-folder X --output Y
    python -m image_indexing_and_retrival_with_qdrant_spark.cli index-images --root X --collection C
    python -m image_indexing_and_retrival_with_qdrant_spark.cli index-docs --json X --collection C
    python -m image_indexing_and_retrival_with_qdrant_spark.cli query "text" --collection C --top-k 5
    python -m image_indexing_and_retrival_with_qdrant_spark.cli stats --collection C
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F

from .catalog import (Collection, collection_exists, create_collection,
                      delete_collection, list_collections)
from .config import EngineConfig
from .session import get_spark
from .sources.embedder import HashEmbedder
from .sources.files import read_json_documents, scan_images, with_path_parts
from .sources.ingest import build_points


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--collection", default=None)
    p.add_argument("--root", dest="collection_root", default=None)


def cmd_convert(cfg: EngineConfig, args) -> int:
    spark = get_spark("convert")
    from .sources.files import scan_pdfs
    from .sources.multimodal import rasterize_pdfs

    pages = rasterize_pdfs(scan_pdfs(spark, args.pdf_folder))
    (pages.filter(F.col("ok"))
     .write.mode("overwrite").partitionBy("doc_name").parquet(args.output))
    print(f"rasterized to {args.output}")
    return 0


def _get_collection(cfg: EngineConfig, args, dim: int) -> Collection:
    root = args.collection_root or cfg.collection_root
    name = args.collection or cfg.collection_name
    return create_collection(root, name, dim=dim, metric="cosine")


def cmd_index_images(cfg: EngineConfig, args) -> int:
    """Image-folder indexing (§3.1): scan → embed → points → upsert.
    The stub embedder hashes the file path+length (decode/model stage
    plugs in via ENGINE_MODEL_PATH)."""
    spark = get_spark("index-images")
    imgs = with_path_parts(scan_images(spark, args.folder), args.folder)
    # stub embeds a deterministic surrogate of the content
    surrogate = F.concat(F.col("filename"), F.lit(":"), F.col("length"))
    emb = HashEmbedder(dim=cfg.embed_dim).expr(surrogate)
    points = build_points(
        imgs.withColumn("embedding", emb),
        id_key=F.col("full_path") if not args.append else None,
        payload={
            "filename": F.col("filename"),
            "relative_path": F.col("relative_path"),
            "full_path": F.col("full_path"),
            "folder": F.col("folder"),
        },
    )
    coll = _get_collection(cfg, args, cfg.embed_dim)
    coll.upsert(spark, points, mode="append" if args.append else "merge")
    print(f"indexed; collection now has {coll.count(spark)} points")
    return 0


def cmd_index_docs(cfg: EngineConfig, args) -> int:
    """JSON text indexing (``jina_v4_text_indexer.py:148-157``)."""
    spark = get_spark("index-docs")
    docs = read_json_documents(spark, args.json)
    embedder = cfg.embedder()
    embedded = embedder.embed(docs, text_col="content", mode="passage")
    points = build_points(
        embedded,
        id_key=None if args.append else F.col("content"),
        payload={
            "content": F.col("content"),
            "title": F.col("title"),
            "source_id": F.col("id"),
        },
    )
    coll = _get_collection(cfg, args, cfg.embed_dim)
    coll.upsert(spark, points, mode="append" if args.append else "merge")
    print(f"indexed; collection now has {coll.count(spark)} points")
    return 0


def cmd_query(cfg: EngineConfig, args) -> int:
    """Text query → embed (query mode) → cosine top-k → projected
    results with 'Unknown' defaults (``format_results``,
    ``query_vdr_2b_multi_v1.py:91-127``)."""
    spark = get_spark("query")
    root = args.collection_root or cfg.collection_root
    name = args.collection or cfg.collection_name
    if not collection_exists(root, name):
        print(f"collection {name} not found under {root}", file=sys.stderr)
        return 1
    coll = Collection(root, name)
    embedder = cfg.embedder()
    qvec = embedder.embed(
        spark.createDataFrame([(args.text,)], "text string"),
        text_col="text", mode="query",
    ).collect()[0].embedding
    # Collection.search normalizes the query for cosine collections
    # (the stub embedder's output is not unit-norm) and projects the
    # payload columns with the collection's declared scoring.
    hits = coll.search(spark, list(qvec), k=args.top_k,
                       formula=getattr(args, "formula", None))
    payload = [c for c in ("content", "title", "filename", "relative_path")
               if c in hits.columns]
    for i, row in enumerate(hits.collect(), 1):
        label = next((row[c] for c in payload if row[c] is not None), "Unknown")
        print(f"{i}. score={row.score:.4f} id={row.id[:12]}… {str(label)[:60]}")
    return 0


def cmd_stats(cfg: EngineConfig, args) -> int:
    spark = get_spark("stats")
    root = args.collection_root or cfg.collection_root
    name = args.collection or cfg.collection_name
    if not collection_exists(root, name):
        print(f"collection {name} not found under {root}", file=sys.stderr)
        return 1
    coll = Collection(root, name)
    print(f"{name}: {coll.count(spark)} points, config={coll.meta}")
    return 0


def cmd_facet(cfg: EngineConfig, args) -> int:
    """Payload value counts (Qdrant facet endpoint)."""
    spark = get_spark("facet")
    root = args.collection_root or cfg.collection_root
    name = args.collection or cfg.collection_name
    if not collection_exists(root, name):
        print(f"collection {name} not found under {root}", file=sys.stderr)
        return 1
    coll = Collection(root, name)
    for row in coll.facet(spark, args.key, limit=args.limit).collect():
        print(f"{row.value}\t{row['count']}")
    return 0


def cmd_scroll(cfg: EngineConfig, args) -> int:
    """Page through a collection (keyset or order_by pagination)."""
    spark = get_spark("scroll")
    root = args.collection_root or cfg.collection_root
    name = args.collection or cfg.collection_name
    if not collection_exists(root, name):
        print(f"collection {name} not found under {root}", file=sys.stderr)
        return 1
    coll = Collection(root, name)
    page = coll.scroll(spark, limit=args.limit, after_id=args.after,
                       order_by=args.order_by).collect()
    for row in page:
        print(row.asDict())
    return 0


def cmd_discover(cfg: EngineConfig, args) -> int:
    """Discovery/context search by example point ids (Qdrant
    ``discover``): ``--context POS:NEG`` pairs, optional ``--target``."""
    spark = get_spark("discover")
    root = args.collection_root or cfg.collection_root
    name = args.collection or cfg.collection_name
    if not collection_exists(root, name):
        print(f"collection {name} not found under {root}", file=sys.stderr)
        return 1
    coll = Collection(root, name)
    try:
        pairs = [tuple(p.split(":", 1)) for p in args.context]
        pairs = [(_id_arg(a), _id_arg(b)) for a, b in pairs]
    except ValueError:
        print("--context expects POS:NEG id pairs", file=sys.stderr)
        return 1
    target = _id_arg(args.target) if args.target is not None else None
    hits = coll.discover(spark, context=pairs, target=target, k=args.top_k)
    for i, row in enumerate(hits.collect(), 1):
        rank = f" rank={row.rank}" if "rank" in hits.columns else ""
        print(f"{i}. score={row.score:.4f}{rank} id={row.id}")
    return 0


def cmd_matrix(cfg: EngineConfig, args) -> int:
    """Distance matrix over a deterministic sample
    (Qdrant ``search_matrix_pairs``)."""
    spark = get_spark("matrix")
    root = args.collection_root or cfg.collection_root
    name = args.collection or cfg.collection_name
    if not collection_exists(root, name):
        print(f"collection {name} not found under {root}", file=sys.stderr)
        return 1
    coll = Collection(root, name)
    pairs = coll.search_matrix(spark, sample=args.sample, k=args.top_k)
    for row in pairs.collect():
        print(f"{row.id_a}\t{row.id_b}\t{row.score:.4f}\t{row.rank}")
    return 0


def cmd_collections(cfg: EngineConfig, args) -> int:
    """List collections under the root (Qdrant ``get_collections``).
    Pure directory listing — no SparkSession spin-up."""
    root = args.collection_root or cfg.collection_root
    for name in list_collections(root):
        print(name)
    return 0


def cmd_drop(cfg: EngineConfig, args) -> int:
    """Delete a collection and all derived state (Qdrant
    ``delete_collection``). Refuses without ``--yes``."""
    root = args.collection_root or cfg.collection_root
    name = args.collection or cfg.collection_name
    if not args.yes:
        print(f"refusing to delete {name!r} without --yes", file=sys.stderr)
        return 1
    if not delete_collection(root, name):
        print(f"collection {name} not found under {root}", file=sys.stderr)
        return 1
    print(f"deleted {name}")
    return 0


def _id_arg(s):
    """Point ids on the CLI: int if it parses, else the raw string."""
    try:
        return int(s)
    except (TypeError, ValueError):
        return s


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="spark-vector-engine")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("convert")
    p.add_argument("--pdf-folder", required=True)
    p.add_argument("--output", required=True)

    p = sub.add_parser("index-images")
    p.add_argument("--folder", required=True)
    p.add_argument("--append", action="store_true",
                   help="reference semantics: duplicate on re-run")
    _add_common(p)

    p = sub.add_parser("index-docs")
    p.add_argument("--json", required=True)
    p.add_argument("--append", action="store_true")
    _add_common(p)

    p = sub.add_parser("query")
    p.add_argument("text")
    p.add_argument("--top-k", type=int, default=None)
    p.add_argument("--formula", default=None,
                   help="score-boost formula over `score` + payload "
                        "columns (Qdrant FormulaQuery), e.g. "
                        "'0.7 * score + 0.3 * popularity'")
    _add_common(p)

    p = sub.add_parser("stats")
    _add_common(p)

    p = sub.add_parser("facet")
    p.add_argument("key")
    p.add_argument("--limit", type=int, default=10)
    _add_common(p)

    p = sub.add_parser("scroll")
    p.add_argument("--limit", type=int, default=10)
    p.add_argument("--after", default=None)
    p.add_argument("--order-by", default=None)
    _add_common(p)

    p = sub.add_parser("discover")
    p.add_argument("--context", action="append", required=True,
                   metavar="POS:NEG", help="context pair of point ids")
    p.add_argument("--target", default=None)
    p.add_argument("--top-k", type=int, default=5)
    _add_common(p)

    p = sub.add_parser("matrix")
    p.add_argument("--sample", type=int, default=10)
    p.add_argument("--top-k", type=int, default=3)
    _add_common(p)

    p = sub.add_parser("collections")
    _add_common(p)

    p = sub.add_parser("drop")
    p.add_argument("--yes", action="store_true",
                   help="confirm deletion (refused otherwise)")
    _add_common(p)

    args = parser.parse_args(argv)
    cfg = EngineConfig()
    if getattr(args, "top_k", None) is None and args.cmd == "query":
        args.top_k = cfg.top_k
    return {
        "convert": cmd_convert,
        "index-images": cmd_index_images,
        "index-docs": cmd_index_docs,
        "query": cmd_query,
        "stats": cmd_stats,
        "facet": cmd_facet,
        "scroll": cmd_scroll,
        "discover": cmd_discover,
        "matrix": cmd_matrix,
        "collections": cmd_collections,
        "drop": cmd_drop,
    }[args.cmd](cfg, args)


if __name__ == "__main__":
    sys.exit(main())
