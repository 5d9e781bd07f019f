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
            "audio_metadata", "audio_features",
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


AUDIO_META_SCHEMA = (
    "path string, format string, sample_rate int, channels int, "
    "bits int, n_samples long, duration_sec double, ok boolean"
)


def _sniff_wav(content: bytes):
    """RIFF/WAVE header parse → (sample_rate, channels, bits,
    n_samples, data_offset, data_len). Pure byte parsing, no audio
    library — PCM WAV is a struct, like PNG headers."""
    try:
        if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
            return None
        i, fmt, data = 12, None, None
        while i + 8 <= len(content):
            cid = content[i:i + 4]
            clen = struct.unpack("<I", content[i + 4:i + 8])[0]
            if cid == b"fmt ":
                audio_fmt, ch, sr = struct.unpack("<HHI", content[i + 8:i + 16])
                bits = struct.unpack("<H", content[i + 22:i + 24])[0]
                if audio_fmt != 1:  # PCM only
                    return None
                fmt = (sr, ch, bits)
            elif cid == b"data":
                data = (i + 8, clen)
            i += 8 + clen + (clen & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            return None
        sr, ch, bits = fmt
        off, dlen = data
        dlen = min(dlen, len(content) - off)
        n_samples = dlen // (ch * (bits // 8))
        return sr, ch, bits, n_samples, off, dlen
    except Exception:
        return None


def audio_metadata(binary_df: DataFrame, path_col: str = "path",
                   content_col: str = "content") -> DataFrame:
    """Audio metadata tier (multimodal north-star): typed
    (sample_rate, channels, bits, duration) from PCM-WAV binary
    columns — real header parsing, no audio library. Corrupt /
    non-WAV bytes → ok=false row, counted by ``failure_stats``,
    never a job failure (the reference's decode-failure semantics,
    ``incremental_indexing_colpali_with_qdrant.py:165-173``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                meta = _sniff_wav(bytes(content)) if content is not None else None
                if meta:
                    sr, ch, bits, n, _, _ = meta
                    rows.append((path, "wav", sr, ch, bits, n,
                                 n / sr if sr else None, True))
                else:
                    rows.append((path, None, None, None, None, None,
                                 None, False))
            yield pd.DataFrame(
                rows, columns=["path", "format", "sample_rate", "channels",
                               "bits", "n_samples", "duration_sec", "ok"],
            )

    return binary_df.mapInPandas(run, schema=AUDIO_META_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "path string, window_idx int, t_start double, rms double, "
    "zcr double, centroid_hz double"
)


def audio_features(binary_df: DataFrame, window_sec: float = 0.05,
                   path_col: str = "path",
                   content_col: str = "content") -> DataFrame:
    """Windowed audio feature extraction over PCM16 WAV binaries →
    one row per window: RMS energy, zero-crossing rate, spectral
    centroid (Hz, via rfft). Real numpy DSP inside Arrow-batched
    mapInPandas — no audio library needed for PCM; swap the decode
    step for soundfile/librosa to accept compressed formats.

    Scale shape: scan-local explode (rows multiply by
    duration/window_sec inside the scan stage, like chunking);
    feature math is BLAS/FFT-bound per batch, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                meta = _sniff_wav(bytes(content)) if content is not None else None
                if not meta:
                    continue  # failures surface via audio_metadata
                sr, ch, bits, n, off, dlen = meta
                if bits != 16 or n == 0:
                    continue
                pcm = np.frombuffer(bytes(content), dtype="<i2",
                                    count=n * ch, offset=off)
                mono = pcm.reshape(-1, ch).mean(axis=1) / 32768.0
                win = max(int(sr * window_sec), 1)
                freqs = np.fft.rfftfreq(win, d=1.0 / sr)
                for w in range(len(mono) // win):
                    seg = mono[w * win:(w + 1) * win]
                    rms = float(np.sqrt(np.mean(seg * seg)))
                    zcr = float(np.mean(np.abs(np.diff(np.sign(seg))) > 0))
                    mag = np.abs(np.fft.rfft(seg))
                    tot = mag.sum()
                    cent = float((freqs * mag).sum() / tot) if tot > 0 else 0.0
                    rows.append((path, w, w * win / sr, rms, zcr, cent))
            yield pd.DataFrame(
                rows, columns=["path", "window_idx", "t_start", "rms",
                               "zcr", "centroid_hz"],
            )

    return binary_df.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


VIDEO_FRAME_SCHEMA = (
    "path string, frame_idx int, ts_sec double, frame binary, ok boolean"
)


def sample_video_frames(video_df: DataFrame, every_n_seconds: float = 1.0,
                        path_col: str = "path",
                        content_col: str = "content",
                        decoder: str = "auto") -> DataFrame:
    """Frame sampling for video binaries → one row per sampled frame
    ``(path, frame_idx, ts_sec, frame, ok)``.

    ``decoder='auto'`` uses pyav/ffmpeg (absent in this container —
    gated, like the reference's poppler gate). ``decoder='fake'`` is
    the deterministic stand-in the tests run: duration is derived from
    the byte length (1000 bytes/s), frame payloads are md5-derived —
    it executes the identical mapInPandas body (batching, per-row
    explode, failure rows), so the Spark-side plumbing is real and the
    pixel step is the only swap for production."""
    if decoder == "auto":
        try:
            import av  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "video frame sampling requires pyav/ffmpeg (optional "
                "dependency); decoder='fake' runs the full plumbing "
                "with a deterministic stand-in decoder"
            ) from e

    def decode_fake(content: bytes):
        import hashlib

        duration = len(content) / 1000.0
        t, idx = 0.0, 0
        while t <= duration:
            payload = hashlib.md5(
                content[:64] + idx.to_bytes(4, "big")).digest()
            yield idx, t, payload
            idx += 1
            t += every_n_seconds

    def decode_av(content: bytes):  # pragma: no cover - av not in container
        import io

        import av

        with av.open(io.BytesIO(content)) as container:
            stream = container.streams.video[0]
            next_t, idx = 0.0, 0
            for frame in container.decode(stream):
                if frame.time is None or frame.time < next_t:
                    continue
                yield idx, float(frame.time), frame.to_image().tobytes()
                idx += 1
                next_t += every_n_seconds

    decode = decode_fake if decoder == "fake" else decode_av

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                try:
                    if content is None:
                        raise ValueError("null content")
                    for idx, ts, frame in decode(bytes(content)):
                        rows.append((path, idx, ts, frame, True))
                except Exception:
                    rows.append((path, None, None, None, False))
            yield pd.DataFrame(
                rows, columns=["path", "frame_idx", "ts_sec", "frame", "ok"],
            )

    return video_df.mapInPandas(run, schema=VIDEO_FRAME_SCHEMA)


def failure_stats(df: DataFrame, ok_col: str = "ok") -> DataFrame:
    """A1 processing counters: processed/failed from the ok flag
    (``self.stats``, ``incremental_indexing_colpali_with_qdrant.py:113``)."""
    return df.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col(ok_col), 1).otherwise(0)).cast("long").alias("processed"),
        F.sum(F.when(~F.col(ok_col), 1).otherwise(0)).cast("long").alias("failed"),
    )
