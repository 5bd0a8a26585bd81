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


def test_image_ahash_fake_path_and_near_dup(spark):
    """m04 fake (PIL-less) path: deterministic md5-derived int64,
    nulls pass through, byte-identical copies pair at hamming 0,
    carry columns survive, and the plan is mapInPandas + the banded
    equi-join (no cross product)."""
    import hashlib

    from southpaw_spark.operators.multimodal import (
        image_ahash,
        image_near_duplicates,
    )

    rows = [
        (1, b"image-bytes-aaaa", "x"),
        (2, b"image-bytes-aaaa", "y"),   # byte-identical copy
        (3, b"other-bytes-bbbb", "z"),
        (4, None, "w"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, content binary, tag string"
    )
    hashed = {
        r["doc_id"]: r["ahash"]
        for r in image_ahash(df, "content", "doc_id",
                             carry_cols=("tag",)).collect()
    }
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        want = int.from_bytes(
            hashlib.md5(b"image-bytes-aaaa").digest()[:8],
            "big", signed=True,
        )
        assert hashed[1] == hashed[2] == want
        assert hashed[3] != want
    assert hashed[4] is None
    out = image_near_duplicates(df, "content", "doc_id", max_hamming=3)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
    assert pairs.get((1, 2)) == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "mapInPandas" in plan or "MapInPandas" in plan



def test_image_ahash_real_path(spark):
    """Real decoder seam: with PIL installed, near-identical images
    (same picture, one pixel perturbed) land within a few aHash bits
    while a different picture lands far away."""
    PIL = pytest.importorskip("PIL")  # noqa: N806
    import io

    from PIL import Image

    from southpaw_spark.operators.multimodal import image_ahash

    def png(seed, tweak=0):
        img = Image.new("L", (32, 32))
        img.putdata(
            [(x * 7 + y * 13 + seed * 31 + (tweak if x == y == 0 else 0))
             % 256 for y in range(32) for x in range(32)]
        )
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    df = spark.createDataFrame(
        [(1, png(0)), (2, png(0, tweak=3)), (3, png(9))],
        "doc_id long, content binary",
    )
    h = {
        r["doc_id"]: r["ahash"]
        for r in image_ahash(df, "content", "doc_id").collect()
    }

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(h[1], h[2]) <= 4          # near-identical
    assert ham(h[1], h[3]) > ham(h[1], h[2])


def _png_chunk(t, d):
    import binascii
    import struct

    return (
        struct.pack(">I", len(d)) + t + d
        + struct.pack(">I", binascii.crc32(t + d) & 0xFFFFFFFF)
    )


def _png_gray(pixels, filt=0):
    import struct
    import zlib

    h, w = len(pixels), len(pixels[0])
    if filt == 0:
        raw = b"".join(b"\x00" + bytes(r) for r in pixels)
    else:  # Up-filter encoding (type 2)
        raws, prev = [], [0] * w
        for r in pixels:
            raws.append(
                b"\x02" + bytes((r[i] - prev[i]) & 0xFF for i in range(w))
            )
            prev = r
        raw = b"".join(raws)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")
    )


def _png_rgb(pixels):
    import struct
    import zlib

    h, w = len(pixels), len(pixels[0])
    raw = b"".join(
        b"\x00" + bytes(v for p in r for v in (p, p, p)) for r in pixels
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")
    )


_TEST_PX = [
    [
        (x * 7 + y * 5) % 256
        if (x // 8 + y // 8) % 2 == 0
        else (255 - (x * 3 + y * 11) % 256)
        for x in range(32)
    ]
    for y in range(32)
]


def test_stdlib_png_decode_and_pinned_ahash():
    """Round-9: the REAL 8×8 mean-hash executes without PIL — the
    stdlib PNG decoder (zlib inflate + filter reconstruction) feeds
    _gray_ahash. Pins: exact pixel recovery under filter 0 AND the
    Up filter; RGB (v,v,v) luma equals grayscale; the generated test
    image's aHash is the pinned value."""
    from southpaw_spark.operators.multimodal import (
        _decode_png_gray,
        _gray_ahash,
    )

    g0 = _decode_png_gray(_png_gray(_TEST_PX, 0))
    assert [list(r) for r in g0] == _TEST_PX
    assert _decode_png_gray(_png_gray(_TEST_PX, 2)) == g0
    assert _decode_png_gray(_png_rgb(_TEST_PX)) == g0
    assert _gray_ahash(g0) == 3980217876467154160  # pinned
    # out-of-envelope inputs return None, never raise
    assert _decode_png_gray(b"\x89PNG\r\n\x1a\njunk") is None
    assert _decode_png_gray(b"not a png") is None


def test_image_near_duplicates_perceptual_without_pil(spark):
    """m04's 'perceptual' claim, executable in THIS sandbox: a noised
    PNG copy (seeded ±2/pixel — different bytes, different md5) lands
    at hamming ≤ 3 of the original through the full Spark operator,
    while a different picture does not pair. Skipped when PIL exists
    (the PIL rung then takes the seam; its own test covers it)."""
    import random

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present — stdlib rung not reachable")
    except ImportError:
        pass

    from southpaw_spark.operators.multimodal import image_near_duplicates

    rng = random.Random(90915)
    noised = [
        [max(0, min(255, v + rng.randint(-2, 2))) for v in row]
        for row in _TEST_PX
    ]
    other = [
        [(x * 13 + y * 17 + 31) % 256 for x in range(32)] for y in range(32)
    ]
    df = spark.createDataFrame(
        [
            (1, _png_gray(_TEST_PX)),
            (2, _png_gray(noised)),
            (3, _png_gray(other)),
        ],
        "doc_id long, content binary",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_duplicates(
            df, "content", "doc_id", max_hamming=3
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert not any(3 in p for p in pairs)


def _pcm_wav(samples):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_audio_fingerprint_synth_roundtrip(spark):
    """synth_wav bytes decoded by audio_fingerprint must equal the
    fingerprint computed directly from the sample formula — the same
    first-principles check the m05 DuckDB oracle performs."""
    from southpaw_spark.operators.multimodal import (
        audio_fingerprint,
        synth_wav,
    )

    ids = spark.range(8).withColumnRenamed("id", "doc_id")
    got = {
        r["doc_id"]: r["afp"]
        for r in audio_fingerprint(
            synth_wav(ids, "doc_id"), "content", "doc_id"
        ).collect()
    }
    for i in range(8):
        smp = [((i * 31 + k * 7) % 211) - 105 for k in range(1040)]
        en = [
            sum(s * s for s in smp[w * 16: (w + 1) * 16])
            for w in range(65)
        ]
        bits = 0
        for j in range(64):
            if en[j + 1] > en[j]:
                bits |= 1 << j
        want = bits - (1 << 64) if bits >= (1 << 63) else bits
        assert got[i] == want


def test_audio_near_duplicates_noised_copy(spark):
    """A mildly noised copy (+8 on every 2nd sample — measured hamming
    2-3) must pair within max_hamming=3; an unrelated clip must not
    (cross-clip distances are ~19+ bits). Non-WAV bytes fall back to
    the md5 fake and only pair on byte identity."""
    from southpaw_spark.operators.multimodal import audio_near_duplicates

    base = [((1 * 31 + k * 7) % 211) - 105 for k in range(1040)]
    noised = [v + (8 if k % 2 == 0 else 0) for k, v in enumerate(base)]
    other = [((2 * 31 + k * 7) % 211) - 105 for k in range(1040)]
    df = spark.createDataFrame(
        [
            (1, _pcm_wav(base)),
            (2, _pcm_wav(noised)),
            (3, _pcm_wav(other)),
            (4, b"not a wav"),
            (5, b"not a wav"),
        ],
        "doc_id long, content binary",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_near_duplicates(
            df, "content", "doc_id", max_hamming=3
        ).collect()
    }
    assert (1, 2) in pairs and 0 < pairs[(1, 2)] <= 3
    assert pairs.get((4, 5)) == 0  # fake-hash byte identity
    assert not any(3 in p for p in pairs)


def test_synth_png_roundtrip_and_stdlib_ahash(spark):
    """synth_png bytes must decode through the stdlib PNG decoder to
    the exact formula pixels, and image_ahash(decoder='stdlib') must
    equal the box-mean hash computed directly from those pixels — the
    same first-principles check the m06 DuckDB oracle performs."""
    from southpaw_spark.operators.multimodal import (
        _decode_png_gray,
        image_ahash,
        synth_png,
    )

    ids = spark.range(5).withColumnRenamed("id", "doc_id")
    pngs = {r["doc_id"]: bytes(r["content"])
            for r in synth_png(ids, "doc_id").collect()}
    got = {
        r["doc_id"]: r["ahash"]
        for r in image_ahash(
            synth_png(ids, "doc_id"), "content", "doc_id",
            decoder="stdlib",
        ).collect()
    }
    for i in range(5):
        want_px = [
            [(i * 7 + y * 31 + x * 13) % 256 for x in range(16)]
            for y in range(16)
        ]
        assert _decode_png_gray(pngs[i]) == [
            bytearray(row) for row in want_px
        ] or _decode_png_gray(pngs[i]) == want_px
        cells = [
            sum(
                want_px[y][x]
                for y in range(2 * by, 2 * by + 2)
                for x in range(2 * bx, 2 * bx + 2)
            ) / 4
            for by in range(8)
            for bx in range(8)
        ]
        mean = sum(cells) / 64.0
        bits = 0
        for v in cells:
            bits = (bits << 1) | (1 if v >= mean else 0)
        want = bits - (1 << 64) if bits >= (1 << 63) else bits
        assert got[i] == want


def test_image_ahash_decoder_validation(spark):
    from southpaw_spark.operators.multimodal import image_ahash

    df = spark.createDataFrame([(1, b"x")], "doc_id long, content binary")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="decoder"):
        image_ahash(df, "content", "doc_id", decoder="bogus")


def test_video_frame_hashes_and_near_duplicates(spark):
    """m07: the container round-trips (synth → parse → sampled frame
    hashes match per-frame synth_png hashes); a noised copy pairs with
    its original at high match_frac while an unrelated video does
    not; truncated containers and foreign bytes parse leniently; bad
    stride raises."""
    import struct

    import pytest as _pytest

    from southpaw_spark.operators.multimodal import (
        _SVID_MAGIC,
        _decode_png_gray,
        _gray_ahash,
        _png_bytes,
        iter_video_frames,
        synth_video,
        video_frame_hashes,
        video_near_duplicates,
    )

    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    vids = synth_video(docs, "doc_id", n_frames=6)
    got = {
        (r["doc_id"], r["frame_idx"]): r["ahash"]
        for r in video_frame_hashes(
            vids, "content", "doc_id", frame_stride=2
        ).collect()
    }
    assert set(got) == {(i, f) for i in (1, 2) for f in (0, 2, 4)}
    for (i, f), h in got.items():
        expect = _gray_ahash(_decode_png_gray(_png_bytes(i * 7 + f * 101)))
        assert h == expect

    def container(frames):
        return (
            _SVID_MAGIC
            + struct.pack(">I", len(frames))
            + b"".join(struct.pack(">I", len(p)) + p for p in frames)
        )

    def noisy_png(seed):
        # flip low bits of the seed term: pixels shift by 1, the
        # box-mean hash moves at most a few bits
        return _png_bytes(seed + 1)

    base_frames = [_png_bytes(1000 + f * 101) for f in range(6)]
    near_frames = [noisy_png(1000 + f * 101) for f in range(6)]
    far_frames = [_png_bytes(999_999 + f * 757) for f in range(6)]
    custom = spark.createDataFrame(
        [
            (10, container(base_frames)),
            (11, container(near_frames)),
            (12, container(far_frames)),
        ],
        "doc_id long, content binary",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["match_frac"]
        for r in video_near_duplicates(
            custom, "content", "doc_id",
            max_hamming=8, min_match_frac=0.5, frame_stride=2,
        ).collect()
    }
    assert (10, 11) in pairs and pairs[(10, 11)] >= 0.5
    assert all({a, b} != {10, 12} and {a, b} != {11, 12} for a, b in pairs)

    # lenient parsing: foreign bytes -> no frames; truncated -> prefix
    assert list(iter_video_frames(b"not a video")) == []
    trunc = container(base_frames[:2])[:-5]
    assert len(list(iter_video_frames(trunc))) == 1
    with _pytest.raises(ValueError, match="frame_stride"):
        video_frame_hashes(custom, "content", "doc_id", frame_stride=0)


def test_video_near_dup_bands_lossless_above_hamming_3(spark):
    """r10-ADVICE regression: bands must size as max_hamming+1 (the
    hamming_near_pairs rule), not a hard-coded 4 — otherwise a pair at
    max_hamming >= 4 whose differing bits hit ALL FOUR 16-bit bands is
    silently dropped.  Seeds 0 and 7 produce frame hashes differing in
    exactly such a spread; the pair MUST surface, and max_hamming out
    of [0, 64) must raise."""
    import struct

    import pytest as _pytest

    from southpaw_spark.operators.multimodal import (
        _SVID_MAGIC,
        _decode_png_gray,
        _gray_ahash,
        _png_bytes,
        video_near_duplicates,
    )

    pa, pb = _png_bytes(0), _png_bytes(7)
    ha = _gray_ahash(_decode_png_gray(pa))
    hb = _gray_ahash(_decode_png_gray(pb))
    x = (ha ^ hb) & ((1 << 64) - 1)
    d = bin(x).count("1")
    assert d >= 4
    # precondition: every old 16-bit band differs -> the old 4-band
    # join had NO identical band and would have missed this pair
    assert all((x >> (16 * b)) & 0xFFFF for b in range(4))

    def container(frames):
        return (
            _SVID_MAGIC
            + struct.pack(">I", len(frames))
            + b"".join(struct.pack(">I", len(p)) + p for p in frames)
        )

    df = spark.createDataFrame(
        [(1, container([pa])), (2, container([pb]))],
        "doc_id long, content binary",
    )
    pairs = video_near_duplicates(
        df, "content", "doc_id",
        max_hamming=d, min_match_frac=1.0, frame_stride=1,
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["n_matching_frames"] == 1
    for bad in (-1, 64, 80):
        with _pytest.raises(ValueError, match="max_hamming"):
            video_near_duplicates(
                df, "content", "doc_id", max_hamming=bad
            ).collect()
    # r11-ADVICE regression: max_hamming=0 is legal (exact-hash match
    # only) — bands=1 makes the single band the FULL 64-bit signature,
    # which must not build a (1<<64)-1 literal (long overflow at plan
    # time). Identical clips pair; the d-bit-distant clip does not.
    df0 = spark.createDataFrame(
        [(1, container([pa])), (2, container([pa])), (3, container([pb]))],
        "doc_id long, content binary",
    )
    exact = video_near_duplicates(
        df0, "content", "doc_id",
        max_hamming=0, min_match_frac=1.0, frame_stride=1,
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in exact] == [(1, 2)]
