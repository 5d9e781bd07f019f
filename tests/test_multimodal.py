"""Multimodal binary-column plumbing (S2/S5 + F2/A1 failure stats)."""

import struct

import pytest

from image_indexing_and_retrival_with_qdrant_spark.sources.files import scan_images
from image_indexing_and_retrival_with_qdrant_spark.sources.multimodal import (
    decode_images,
    failure_stats,
    image_metadata,
    rasterize_pdfs,
)

_PNG = bytes.fromhex(
    "89504e470d0a1a0a0000000d49484452000000010000000108060000001f15c489"
    "0000000d49444154789c626001000000ffff03000006000557bfabd40000000049454e44ae426082"
)


def _jpeg(w, h):
    # minimal JPEG: SOI + SOF0 with dimensions (header-sniff target)
    sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x01\x11\x00"
    return b"\xff\xd8" + sof + b"\xff\xd9"


def test_image_metadata_and_failure_stats(spark, tmp_path):
    root = tmp_path / "imgs"
    (root / "doc").mkdir(parents=True)
    (root / "doc" / "a.png").write_bytes(_PNG)
    (root / "doc" / "b.jpg").write_bytes(_jpeg(640, 480))
    (root / "doc" / "corrupt.png").write_bytes(b"not a png at all")

    meta = image_metadata(scan_images(spark, str(root)))
    rows = {r.path.rsplit("/", 1)[-1]: r for r in meta.collect()}
    assert rows["a.png"].format == "png" and rows["a.png"].width == 1
    assert rows["b.jpg"].format == "jpeg" and rows["b.jpg"].width == 640
    assert rows["b.jpg"].height == 480
    assert rows["corrupt.png"].ok is False  # skip-and-count, never fail

    [stats] = failure_stats(meta).collect()
    assert (stats.total, stats.processed, stats.failed) == (3, 2, 1)


def test_pixel_tiers_gated_not_broken(spark, tmp_path):
    """Decode/rasterize raise a clear NotImplementedError when the
    optional lib is missing (and would run if present)."""
    root = tmp_path / "one"
    root.mkdir()
    (root / "x.png").write_bytes(_PNG)
    df = scan_images(spark, str(root))
    try:
        import PIL  # noqa: F401
        decode_images(df).collect()  # lib present: must actually work
    except ImportError:
        with pytest.raises(NotImplementedError, match="pillow"):
            decode_images(df)
    try:
        import pdf2image  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="pdf2image"):
            rasterize_pdfs(df)
