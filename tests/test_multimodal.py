"""Multimodal decode seam: the real PIL-backed decoder (skipped where
Pillow is absent) and the loud failure when it's missing — so the
stub→real swap-in point is proven wherever the dependency exists and
diagnosable everywhere else."""

import pytest


def _png_rows(spark):
    """(id, content) frame: a real 2x3 RGB PNG, a corrupt blob, a null."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (2, 3), (255, 0, 0)).save(buf, format="PNG")
    return spark.createDataFrame(
        [(1, bytearray(buf.getvalue())), (2, bytearray(b"not an image")), (3, None)],
        "img_id long, content binary",
    )


def test_decode_images_real_pil(spark):
    pytest.importorskip("PIL")
    from southpaw_spark.operators.multimodal import (
        decode_image_stub,
        decode_images,
    )

    df = _png_rows(spark)
    out = decode_images(df, "content", "img_id")
    rows = {r["img_id"]: r for r in out.collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["mode"]) == (2, 3, "RGB")
    # poison inputs yield null metadata, never a task failure
    assert rows[2]["width"] is None and rows[3]["width"] is None
    # drop-in contract: identical output schema to the stub
    assert out.schema == decode_image_stub(df, "content", "img_id").schema


def test_decode_images_missing_pil_fails_loudly(spark):
    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed — loud-failure path not reachable")
    except ImportError:
        pass
    from southpaw_spark.operators.multimodal import decode_images

    df = spark.createDataFrame([(1, bytearray(b"x"))], "img_id long, content binary")
    with pytest.raises(ImportError, match="Pillow"):
        decode_images(df, "content", "img_id")


def test_sample_frames_real_imageio(spark):
    """Real video decode behind importorskip (mirror of the PIL image
    path): a tiny generated clip round-trips through the fan-out plan —
    even sampling, true frame count, decoded dimensions."""
    iio = pytest.importorskip("imageio.v3")
    import numpy as np

    from southpaw_spark.operators.multimodal import sample_frames

    frames = [np.full((8, 6, 3), i * 30, dtype=np.uint8) for i in range(6)]
    data = None
    for ext in (".gif", ".mp4"):  # take whichever codec backend exists
        try:
            data = iio.imwrite("<bytes>", frames, extension=ext)
            break
        except Exception:
            continue
    if data is None:
        pytest.skip("imageio present but no gif/mp4 codec backend")
    df = spark.createDataFrame(
        [
            (1, bytearray(data)),
            (2, bytearray(b"not a video")),  # poison → zero rows
            (3, None),
        ],
        "video_id long, content binary",
    )
    rows = sample_frames(df, "content", "video_id", max_frames=4).collect()
    assert {r["video_id"] for r in rows} == {1}
    assert len(rows) == 4
    idxs = sorted(r["frame_idx"] for r in rows)
    assert idxs[0] == 0 and idxs[-1] == 5  # first/last always sampled
    for r in rows:
        assert r["n_frames"] == 6
        assert (r["width"], r["height"]) == (6, 8)
        assert len(r["frame_md5"]) == 32


def test_sample_frames_missing_imageio_fails_loudly(spark):
    try:
        import imageio  # noqa: F401

        pytest.skip("imageio installed — loud-failure path not reachable")
    except ImportError:
        pass
    from southpaw_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, bytearray(b"x"))], "video_id long, content binary"
    )
    with pytest.raises(ImportError, match="imageio"):
        sample_frames(df, "content", "video_id")


def _wav_bytes(sr=8000, seconds=0.25, freq=440.0, channels=1, amp=0.5):
    import io
    import math
    import struct
    import wave

    n = int(sr * seconds)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        frames = bytearray()
        for i in range(n):
            v = int(amp * 32767 * math.sin(2 * math.pi * freq * i / sr))
            frames += struct.pack("<h", v) * channels
        w.writeframes(bytes(frames))
    return buf.getvalue()


def test_decode_audio_real_wav(spark):
    """Real audio decode with zero external deps (stdlib wave): metadata
    from actual RIFF parsing; poison/null bytes yield null metadata."""
    from southpaw_spark.operators.multimodal import decode_audio

    df = spark.createDataFrame(
        [
            (1, bytearray(_wav_bytes(sr=8000, seconds=0.25))),
            (2, bytearray(_wav_bytes(sr=16000, seconds=0.5, channels=2))),
            (3, bytearray(b"not audio")),
            (4, None),
        ],
        "clip_id long, content binary",
    )
    rows = {r["clip_id"]: r for r in decode_audio(df, "content", "clip_id").collect()}
    assert (rows[1]["sample_rate"], rows[1]["n_channels"]) == (8000, 1)
    assert rows[1]["n_frames"] == 2000 and abs(rows[1]["duration_s"] - 0.25) < 1e-9
    assert (rows[2]["sample_rate"], rows[2]["n_channels"]) == (16000, 2)
    assert rows[3]["sample_rate"] is None and rows[4]["sample_rate"] is None


def test_audio_rms_windows_fanout(spark):
    """Windowed RMS fan-out: a 0.25s sine at amplitude 0.5 has RMS
    ≈ 0.5·32767/√2 in every full window; silence is ~0; poison rows
    contribute zero output rows."""
    from southpaw_spark.operators.multimodal import audio_rms_windows

    loud = _wav_bytes(sr=8000, seconds=0.25, amp=0.5)
    silent = _wav_bytes(sr=8000, seconds=0.3, amp=0.0)
    df = spark.createDataFrame(
        [(1, bytearray(loud)), (2, bytearray(silent)), (3, bytearray(b"x"))],
        "clip_id long, content binary",
    )
    rows = audio_rms_windows(df, "content", "clip_id", window_s=0.1).collect()
    by_clip = {}
    for r in rows:
        by_clip.setdefault(r["clip_id"], []).append(r)
    assert set(by_clip) == {1, 2}
    # 0.25s at 0.1s windows → 3 windows (last partial)
    assert sorted(r["window_idx"] for r in by_clip[1]) == [0, 1, 2]
    assert all(r["n_windows"] == 3 for r in by_clip[1])
    expected = 0.5 * 32767 / (2 ** 0.5)
    full = [r for r in by_clip[1] if r["window_idx"] < 2]
    for r in full:
        assert abs(r["rms"] - expected) / expected < 0.02, r
    assert all(r["rms"] < 1.0 for r in by_clip[2])
