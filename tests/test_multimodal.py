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


# --- audio (real PCM-WAV parsing + numpy DSP, no audio library) -----------

def _wav(sr=8000, freq=440.0, seconds=0.5, channels=1, amp=0.5):
    import numpy as np

    t = np.arange(int(sr * seconds)) / sr
    mono = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    pcm = np.repeat(mono, channels).tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, sr,
                                 sr * channels * 2, channels * 2, 16)
    hdr += b"data" + struct.pack("<I", len(pcm))
    return hdr + pcm


def test_audio_metadata_and_failure_stats(spark):
    from image_indexing_and_retrival_with_qdrant_spark.sources.multimodal import (
        audio_metadata,
    )

    df = spark.createDataFrame(
        [("a.wav", _wav(sr=8000, seconds=0.5)),
         ("b.wav", _wav(sr=16000, seconds=0.25, channels=2)),
         ("bad.wav", b"not audio")],
        "path string, content binary",
    )
    rows = {r.path: r for r in audio_metadata(df).collect()}
    assert rows["a.wav"].sample_rate == 8000 and rows["a.wav"].channels == 1
    assert rows["a.wav"].n_samples == 4000
    assert abs(rows["a.wav"].duration_sec - 0.5) < 1e-9
    assert rows["b.wav"].sample_rate == 16000 and rows["b.wav"].channels == 2
    assert rows["bad.wav"].ok is False
    stats = failure_stats(audio_metadata(df)).collect()[0]
    assert (stats.total, stats.processed, stats.failed) == (3, 2, 1)


def test_audio_features_windows_and_spectra(spark):
    """Real DSP assertions: window count = duration/window, RMS tracks
    amplitude (sine RMS = amp/√2), spectral centroid tracks the sine
    frequency."""
    from image_indexing_and_retrival_with_qdrant_spark.sources.multimodal import (
        audio_features,
    )

    df = spark.createDataFrame(
        [("low.wav", _wav(sr=8000, freq=440.0, seconds=0.5, amp=0.5)),
         ("high.wav", _wav(sr=8000, freq=3000.0, seconds=0.5, amp=0.25)),
         ("bad.wav", b"junk")],
        "path string, content binary",
    )
    rows = audio_features(df, window_sec=0.05).collect()
    by_path = {}
    for r in rows:
        by_path.setdefault(r.path, []).append(r)
    assert set(by_path) == {"low.wav", "high.wav"}  # bad.wav skipped
    assert len(by_path["low.wav"]) == 10  # 0.5s / 0.05s windows
    import math

    low = by_path["low.wav"][3]
    high = by_path["high.wav"][3]
    assert abs(low.rms - 0.5 / math.sqrt(2)) < 0.01
    assert abs(high.rms - 0.25 / math.sqrt(2)) < 0.01
    assert abs(low.centroid_hz - 440) < 60
    assert abs(high.centroid_hz - 3000) < 60
    assert high.zcr > low.zcr  # higher frequency crosses zero more


# --- video (deterministic fake decoder through the real plumbing) ---------

def test_video_frame_sampling_fake_decoder(spark):
    from image_indexing_and_retrival_with_qdrant_spark.sources.multimodal import (
        sample_video_frames,
    )

    df = spark.createDataFrame(
        [("clip.mp4", b"\x00" * 3500), ("null.mp4", None)],
        "path string, content binary",
    )
    rows = sample_video_frames(df, every_n_seconds=1.0,
                               decoder="fake").collect()
    clip = sorted([r for r in rows if r.path == "clip.mp4"],
                  key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in clip] == [0, 1, 2, 3]  # 3.5s @ 1 fps
    assert [r.ts_sec for r in clip] == [0.0, 1.0, 2.0, 3.0]
    assert all(r.ok and len(r.frame) == 16 for r in clip)
    assert len({bytes(r.frame) for r in clip}) == 4  # per-frame payloads
    bad = [r for r in rows if r.path == "null.mp4"]
    assert len(bad) == 1 and bad[0].ok is False


def test_video_auto_decoder_gated(spark):
    from image_indexing_and_retrival_with_qdrant_spark.sources.multimodal import (
        sample_video_frames,
    )

    df = spark.createDataFrame([("c.mp4", b"x")], "path string, content binary")
    with pytest.raises(NotImplementedError):
        sample_video_frames(df)  # pyav absent in this container
