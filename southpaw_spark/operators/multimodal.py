"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side machinery (schemas, partitioning, batch iteration, UDF
signatures, fan-out) is real and tested; the actual media decode is a
deterministic fake (digest-derived dimensions/frames) because the
image/audio libraries are not in this container. Swapping the fake for
PIL/torchaudio/ffmpeg is a localized change inside the pandas function —
the distributed plan is unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binary_metadata(
    df: DataFrame, content_col: str, id_col: str, keep_content: bool = False
) -> DataFrame:
    """Extract byte length + content digest from an opaque binary column.

    Arrow-batched mapInPandas: each partition streams pandas batches, so
    per-row Python overhead is amortized and memory stays bounded by the
    Arrow batch size regardless of blob sizes.

    ``keep_content=True`` passes the binary column through so a decode
    stage can chain directly after metadata extraction — one scan, no
    join — the shape a production media pipeline actually uses.
    """
    schema = f"{id_col} long, n_bytes long, content_md5 string"
    if keep_content:
        schema += f", {content_col} binary"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf[content_col]
            out = {
                id_col: pdf[id_col],
                "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                "content_md5": content.map(
                    lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                ),
            }
            if keep_content:
                out[content_col] = content
            yield pd.DataFrame(out)

    return df.select(id_col, content_col).mapInPandas(extract, schema)


def decode_image_stub(
    df: DataFrame,
    content_col: str,
    id_col: str,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Image decode plumbing with a deterministic fake decoder.

    Real deployment replaces ``fake_decode`` with PIL/turbojpeg; the
    output schema (width/height/mode) and the mapInPandas batch shape are
    what production code relies on and are exercised by tests.

    ``carry_cols`` names input columns passed through unchanged (types
    taken from the input schema) so upstream metadata survives the decode
    without a self-join.
    """
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    carried = [df.schema[c] for c in carry_cols]
    schema = StructType(
        [df.schema[id_col]]
        + [StructField(f.name, f.dataType, True) for f in carried]
        + [
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("mode", StringType(), True),
        ]
    )

    def fake_decode(b: bytes | None):
        if b is None:
            return None, None, None
        # Deterministic fake: dimensions derived from the content digest.
        h = hashlib.md5(b).digest()
        return 16 + h[0] % 240, 16 + h[1] % 240, "RGB"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [fake_decode(b) for b in pdf[content_col]]
            out = {id_col: pdf[id_col]}
            for c in carry_cols:
                out[c] = pdf[c]
            out["width"] = [d[0] for d in decoded]
            out["height"] = [d[1] for d in decoded]
            out["mode"] = [d[2] for d in decoded]
            yield pd.DataFrame(out)

    cols = [id_col, *carry_cols, content_col]
    return df.select(*cols).mapInPandas(decode, schema)


def decode_images(
    df: DataFrame,
    content_col: str,
    id_col: str,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """REAL image decode (PIL) — the production swap-in for
    :func:`decode_image_stub`: identical output schema
    (id, carried..., width, height, mode) and identical Arrow
    mapInPandas batch shape, but dimensions/mode come from actually
    parsing the image bytes. Undecodable or null bytes yield null
    metadata (a poison image must not kill a 100 TB scan).

    Requires Pillow on driver AND executors; checked eagerly driver-side
    so a missing dependency fails at plan-build time with a clear
    message, not mid-job on an executor."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "decode_images needs Pillow (pip install Pillow) on the "
            "driver and every executor; use decode_image_stub for "
            "plumbing tests without it"
        ) from e

    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    carried = [df.schema[c] for c in carry_cols]
    schema = StructType(
        [df.schema[id_col]]
        + [StructField(f.name, f.dataType, True) for f in carried]
        + [
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("mode", StringType(), True),
        ]
    )

    def real_decode(b):
        if b is None:
            return None, None, None
        import io

        from PIL import Image

        try:
            with Image.open(io.BytesIO(bytes(b))) as im:
                return im.width, im.height, im.mode
        except Exception:
            return None, None, None

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [real_decode(b) for b in pdf[content_col]]
            out = {id_col: pdf[id_col]}
            for c in carry_cols:
                out[c] = pdf[c]
            out["width"] = [d[0] for d in decoded]
            out["height"] = [d[1] for d in decoded]
            out["mode"] = [d[2] for d in decoded]
            yield pd.DataFrame(out)

    cols = [id_col, *carry_cols, content_col]
    return df.select(*cols).mapInPandas(decode, schema)


def frame_sample_stub(
    df: DataFrame, content_col: str, id_col: str, max_frames: int = 4
) -> DataFrame:
    """Video frame-sampling plumbing: 1 binary row in → N frame rows out,
    the genuine fan-out batch shape (output pandas frames need not align
    1:1 with input batches). Decode is a deterministic fake — frame count
    and per-frame digests derive from the content digest — so the full
    distributed path (binary column → Arrow batches → fan-out →
    typed frame rows) is value-checked by an oracle reproducing the
    digest arithmetic. Real deployment swaps ``fake_frames`` for
    ffmpeg/PyAV; the plan, schema, and batch shape are unchanged.
    """
    schema = f"{id_col} long, frame_idx int, n_frames int, frame_md5 string"

    def fake_frames(b: bytes | None):
        if b is None:
            return []
        n = 1 + hashlib.md5(b).digest()[2] % max_frames
        return [
            (i, n, hashlib.md5(b + f"#{i}".encode()).hexdigest())
            for i in range(n)
        ]

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, digests = [], [], [], []
            for doc_id, b in zip(pdf[id_col], pdf[content_col]):
                for i, n, d in fake_frames(b):
                    ids.append(doc_id)
                    idxs.append(i)
                    ns.append(n)
                    digests.append(d)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_frames": pd.Series(ns, dtype="int32"),
                    "frame_md5": pd.Series(digests, dtype="object"),
                }
            )

    return df.select(id_col, content_col).mapInPandas(sample, schema)


def decode_audio(
    df: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """REAL audio decode (stdlib ``wave`` — RIFF/WAV, no external
    dependency): (id, sample_rate, n_channels, sample_width,
    n_frames, duration_s). Null or undecodable bytes yield null
    metadata, never a task failure — same poison contract as
    :func:`decode_images`. Arrow mapInPandas, schema and batch shape
    identical in spirit to the image/video seams; compressed codecs
    (mp3/flac/ogg) swap a soundfile/torchaudio call into
    ``real_decode`` without touching the distributed plan."""
    schema = (
        f"{id_col} long, sample_rate int, n_channels int, "
        "sample_width int, n_frames long, duration_s double"
    )

    def real_decode(b):
        if b is None:
            return (None,) * 5
        import io
        import wave

        try:
            with wave.open(io.BytesIO(bytes(b)), "rb") as w:
                sr = w.getframerate()
                nf = w.getnframes()
                return (
                    sr, w.getnchannels(), w.getsampwidth(), nf,
                    round(nf / sr, 6) if sr else None,
                )
        except Exception:
            return (None,) * 5

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [real_decode(b) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sample_rate": [d[0] for d in decoded],
                    "n_channels": [d[1] for d in decoded],
                    "sample_width": [d[2] for d in decoded],
                    "n_frames": [d[3] for d in decoded],
                    "duration_s": [d[4] for d in decoded],
                }
            )

    return df.select(id_col, content_col).mapInPandas(decode, schema)


def audio_rms_windows(
    df: DataFrame,
    content_col: str,
    id_col: str,
    window_s: float = 0.5,
) -> DataFrame:
    """Windowed RMS energy over WAV PCM — the audio analog of video
    frame sampling: 1 clip row in → one row per ``window_s`` window out
    (id, window_idx, n_windows, rms). The fan-out shape feeds
    silence-trimming / segment-selection stages in a speech-data
    pipeline. Pure stdlib decode (16-bit PCM via ``wave`` +
    ``numpy``); poison/null clips yield zero rows."""
    schema = (
        f"{id_col} long, window_idx int, n_windows int, rms double"
    )

    def windows(b):
        if b is None:
            return []
        import io
        import wave

        import numpy as np

        try:
            with wave.open(io.BytesIO(bytes(b)), "rb") as w:
                if w.getsampwidth() != 2:  # 16-bit PCM only (stdlib path)
                    return []
                sr = w.getframerate()
                raw = w.readframes(w.getnframes())
                nch = w.getnchannels()
        except Exception:
            return []
        if not sr or not raw:
            return []
        pcm = np.frombuffer(raw, dtype="<i2").astype(np.float64)
        if nch > 1:  # mixdown: mean across channels
            pcm = pcm[: len(pcm) - len(pcm) % nch].reshape(-1, nch).mean(axis=1)
        step = max(1, int(sr * window_s))
        n_win = (len(pcm) + step - 1) // step
        out = []
        for i in range(n_win):
            seg = pcm[i * step: (i + 1) * step]
            out.append(
                (i, n_win, round(float(np.sqrt(np.mean(seg * seg))), 6))
            )
        return out

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, rms = [], [], [], []
            for doc_id, b in zip(pdf[id_col], pdf[content_col]):
                for i, n, r in windows(b):
                    ids.append(doc_id)
                    idxs.append(i)
                    ns.append(n)
                    rms.append(r)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(idxs, dtype="int32"),
                    "n_windows": pd.Series(ns, dtype="int32"),
                    "rms": pd.Series(rms, dtype="float64"),
                }
            )

    return df.select(id_col, content_col).mapInPandas(sample, schema)


def sample_frames(
    df: DataFrame,
    content_col: str,
    id_col: str,
    max_frames: int = 4,
) -> DataFrame:
    """REAL video frame sampling (imageio) — the production swap-in for
    :func:`frame_sample_stub`: identical fan-out plan (1 binary row in →
    ≤ ``max_frames`` frame rows out via Arrow mapInPandas) but frames
    come from actually decoding the clip bytes. Output schema adds the
    decoded dimensions: (id, frame_idx, n_frames, width, height,
    frame_md5) where ``frame_idx`` is the sampled frame's index within
    the clip, ``n_frames`` the clip's total decoded frame count, and
    ``frame_md5`` the digest of the decoded RGB buffer. Frames are
    sampled evenly across the clip (first/last always included when
    ``max_frames ≥ 2``). Null or undecodable bytes yield ZERO rows —
    a poison clip must not kill a 100 TB scan (mirrors the stub's
    null contract; failures are droppable, not nullable, because the
    output grain is frames, not clips).

    Requires ``imageio`` (plus a codec backend such as imageio-ffmpeg
    or Pillow, matching the container formats you feed it) on driver
    AND executors; checked eagerly driver-side so a missing dependency
    fails at plan-build time, not mid-job on an executor.
    """
    try:
        import imageio.v3  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "sample_frames needs imageio (pip install imageio "
            "imageio-ffmpeg) on the driver and every executor; use "
            "frame_sample_stub for plumbing tests without it"
        ) from e

    schema = (
        f"{id_col} long, frame_idx int, n_frames int, "
        "width int, height int, frame_md5 string"
    )

    def real_frames(b):
        if b is None:
            return []
        import io

        import imageio.v3 as iio

        try:
            frames = list(iio.imiter(io.BytesIO(bytes(b))))
        except Exception:
            return []
        n = len(frames)
        if n == 0:
            return []
        if max_frames >= n:
            idxs = list(range(n))
        elif max_frames == 1:
            idxs = [0]
        else:
            step = (n - 1) / (max_frames - 1)
            idxs = sorted({round(i * step) for i in range(max_frames)})
        out = []
        for i in idxs:
            fr = frames[i]
            h, w = fr.shape[0], fr.shape[1]
            out.append(
                (i, n, w, h, hashlib.md5(fr.tobytes()).hexdigest())
            )
        return out

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, ws, hs, digests = [], [], [], [], [], []
            for doc_id, b in zip(pdf[id_col], pdf[content_col]):
                for i, n, w, h, d in real_frames(b):
                    ids.append(doc_id)
                    idxs.append(i)
                    ns.append(n)
                    ws.append(w)
                    hs.append(h)
                    digests.append(d)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_frames": pd.Series(ns, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "frame_md5": pd.Series(digests, dtype="object"),
                }
            )

    return df.select(id_col, content_col).mapInPandas(sample, schema)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png_gray(b: bytes):
    """Pure-STDLIB PNG decode → list of grayscale rows (0–255 ints), or
    None when the file is outside the supported envelope. Supports
    8-bit, non-interlaced gray(0) / RGB(2) / palette(3) /
    gray+alpha(4) / RGBA(6) — the overwhelming share of real PNGs —
    with full filter support (None/Sub/Up/Average/Paeth per the PNG
    spec §9, public). zlib is stdlib, so this runs in sandboxes with no
    PIL; per-pixel Python loops are the accepted fallback cost (the
    PIL path takes over wherever PIL exists)."""
    import struct
    import zlib

    if not b.startswith(_PNG_SIG):
        return None
    pos, width, idat, plte = 8, None, b"", None
    height = bitdepth = ctype = interlace = 0
    while pos + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[pos:pos + 4])
        typ = b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            width, height, bitdepth, ctype, _c, _f, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if not width or bitdepth != 8 or interlace != 0 or channels is None:
        return None
    try:
        raw = zlib.decompress(idat)
    except zlib.error:
        return None
    stride = width * channels
    if len(raw) < height * (stride + 1):
        return None
    rows, prev, p = [], bytearray(stride), 0
    for _y in range(height):
        f = raw[p]
        line = bytearray(raw[p + 1:p + 1 + stride])
        p += 1 + stride
        if f == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                up = prev[i]
                pth = a + up - c
                pa, pb, pc = abs(pth - a), abs(pth - up), abs(pth - c)
                pr = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif f != 0:
            return None
        rows.append(line)
        prev = line
    gray = []
    for line in rows:
        out_row = []
        for x in range(width):
            o = x * channels
            if ctype in (0, 4):
                v = line[o]
            elif ctype in (2, 6):
                v = (line[o] * 299 + line[o + 1] * 587 + line[o + 2] * 114) // 1000
            else:  # palette
                if plte is None:
                    return None
                pi = line[o] * 3
                v = (plte[pi] * 299 + plte[pi + 1] * 587 + plte[pi + 2] * 114) // 1000
            out_row.append(v)
        gray.append(out_row)
    return gray


def _gray_ahash(gray) -> int | None:
    """8×8 box-mean aHash over a grayscale pixel grid: per-cell mean via
    exact integer sums, threshold by the global mean of the 64 cell
    means, packed row-major MSB-first into a signed int64 — the same
    bit layout as the PIL path."""
    h, w = len(gray), len(gray[0]) if gray else 0
    if h < 1 or w < 1:
        return None
    cells = []
    for by in range(8):
        y0, y1 = (by * h) // 8, ((by + 1) * h) // 8
        y1 = max(y1, y0 + 1)
        for bx in range(8):
            x0, x1 = (bx * w) // 8, ((bx + 1) * w) // 8
            x1 = max(x1, x0 + 1)
            s = n = 0
            for y in range(y0, min(y1, h)):
                row = gray[y]
                for x in range(x0, min(x1, w)):
                    s += row[x]
                    n += 1
            cells.append(s / n)
    mean = sum(cells) / 64.0
    bits = 0
    for v in cells:
        bits = (bits << 1) | (1 if v >= mean else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def image_ahash(
    df: DataFrame,
    content_col: str,
    id_col: str,
    carry_cols: tuple[str, ...] = (),
    decoder: str = "auto",
) -> DataFrame:
    """64-bit average-hash (aHash) per image — the classic perceptual
    fingerprint (downscale to 8×8 grayscale, threshold each pixel by
    the mean, pack row-major into a signed int64). Near-identical
    images (recompression, minor crops/noise) land within a few bits,
    so the banded-Hamming join finds them without any pair scan.

    Decode chain (PIL → stdlib PNG → fake), same discipline as
    :func:`decode_images` but with a middle rung so the REAL perceptual
    hash executes even in a PIL-less sandbox: with PIL available the
    PIL decoder runs (Image.open → L-mode 8×8 resize → mean
    threshold); otherwise PNG bytes (magic-gated) go through the
    pure-stdlib decoder (:func:`_decode_png_gray` — zlib inflate +
    full filter reconstruction + luma) and an 8×8 box-mean hash
    (:func:`_gray_ahash`); only non-PNG content falls back to the
    deterministic fake (first 8 md5 bytes as a signed big-endian
    int64 — avalanche, so only byte-identical content collides;
    DuckDB-expressible, which is what the m04 oracle row checks on its
    text-byte corpus). The Spark shape is identical on every rung: one
    Arrow ``mapInPandas`` stage appending ``ahash long``.

    ``decoder="stdlib"`` pins the stdlib-PNG rung even when PIL is
    installed — the engine-reproducible variant (PIL's 8×8 ``resize``
    uses a resampling kernel, not the exact 2×2 box mean, so its bits
    are not SQL-recomputable; the stdlib box-mean hash is pure integer
    comparisons: ``64·cell_sum ≥ total``). The m06 oracle row uses
    this to engine-check the REAL perceptual path end to end."""
    from pyspark.sql.types import LongType, StructField, StructType

    if decoder not in ("auto", "stdlib"):
        raise ValueError(f"decoder must be 'auto' or 'stdlib'; got {decoder!r}")
    try:
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    carried = [df.schema[c] for c in carry_cols]
    schema = StructType(
        [df.schema[id_col]]
        + [StructField(f.name, f.dataType, True) for f in carried]
        + [StructField("ahash", LongType(), True)]
    )

    def real_hash(b: bytes | None):
        if b is None:
            return None
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(b)).convert("L").resize((8, 8))
        px = list(img.getdata())
        mean = sum(px) / 64.0
        bits = 0
        for p in px:  # row-major MSB-first
            bits = (bits << 1) | (1 if p >= mean else 0)
        return bits - (1 << 64) if bits >= (1 << 63) else bits

    def fake_hash(b: bytes | None):
        if b is None:
            return None
        return int.from_bytes(
            hashlib.md5(b).digest()[:8], "big", signed=True
        )

    def stdlib_hash(b: bytes | None):
        if b is None:
            return None
        if b.startswith(_PNG_SIG):
            gray = _decode_png_gray(b)
            if gray is not None:
                return _gray_ahash(gray)
        return fake_hash(b)

    hash_one = (
        stdlib_hash
        if (decoder == "stdlib" or not have_pil)
        else real_hash
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: pdf[id_col]}
            for c in carry_cols:
                out[c] = pdf[c]
            out["ahash"] = pd.array(
                [hash_one(b) for b in pdf[content_col]], dtype="Int64"
            )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema)


def image_near_duplicates(
    df: DataFrame,
    content_col: str,
    id_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Perceptual image dedup: :func:`image_ahash` fingerprints + the
    d09 banded-Hamming equi-join
    (:func:`southpaw_spark.operators.dedup.hamming_near_pairs`) —
    EXACT pairs within ``max_hamming`` bits, never a pair scan. With
    the fake (PIL-less) hash only byte-identical images pair
    (hamming 0); real aHash distances need the real decoder."""
    from southpaw_spark.operators.dedup import hamming_near_pairs

    sigs = image_ahash(df, content_col, id_col).where(
        F.col("ahash").isNotNull()
    )
    return hamming_near_pairs(
        sigs, id_col, sig_col="ahash", bits=64, max_hamming=max_hamming
    )


def audio_fingerprint(
    df: DataFrame,
    content_col: str,
    id_col: str,
    n_windows: int = 65,
) -> DataFrame:
    """64-bit energy-delta fingerprint per audio clip — the audio
    analog of :func:`image_ahash` (the simplest member of the
    chromaprint/Shazam family): decode WAV PCM (stdlib ``wave``,
    REAL decode, no external deps), split the samples into
    ``n_windows`` equal windows, compute each window's EXACT integer
    energy (sum of squared 16-bit samples), and set bit ``j`` iff
    ``energy[j+1] > energy[j]``. Energy *deltas* survive mild
    amplitude noise and re-encoding, so near-identical clips land a
    few Hamming bits apart and the d09 banded-Hamming join finds them
    without a pair scan.

    All-integer arithmetic end to end (no float windowing), so the
    fingerprint is bit-reproducible across partitionings and engines —
    the m05 oracle recomputes it from first principles in SQL against
    the same synthesized samples, checking the full WAV
    encode→decode→window→pack path. Non-WAV / truncated content falls
    back to the deterministic md5 fake (byte-identity only), the same
    last rung as :func:`image_ahash`. ONE Arrow ``mapInPandas`` stage
    appending ``afp long``; clips shorter than ``n_windows`` samples
    yield null."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [df.schema[id_col], StructField("afp", LongType(), True)]
    )
    n_bits = n_windows - 1
    if not (1 <= n_bits <= 64):
        raise ValueError(f"n_windows must be in [2, 65]; got {n_windows}")

    def fingerprint(b) -> int | None:
        if b is None:
            return None
        import io
        import struct
        import wave

        b = bytes(b)
        try:
            with wave.open(io.BytesIO(b), "rb") as w:
                if w.getsampwidth() != 2 or w.getnchannels() != 1:
                    raise ValueError("16-bit mono PCM only")
                raw = w.readframes(w.getnframes())
            smp = struct.unpack(f"<{len(raw) // 2}h", raw)
        except Exception:
            return int.from_bytes(
                hashlib.md5(b).digest()[:8], "big", signed=True
            )
        win = len(smp) // n_windows
        if win < 1:
            return None
        en = [
            sum(s * s for s in smp[w * win: (w + 1) * win])
            for w in range(n_windows)
        ]
        bits = 0
        for j in range(n_bits):
            if en[j + 1] > en[j]:
                bits |= 1 << j
        return bits - (1 << 64) if bits >= (1 << 63) else bits

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "afp": pd.array(
                        [fingerprint(b) for b in pdf[content_col]],
                        dtype="Int64",
                    ),
                }
            )

    return df.select(id_col, content_col).mapInPandas(run, schema)


def audio_near_duplicates(
    df: DataFrame,
    content_col: str,
    id_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Perceptual audio dedup: :func:`audio_fingerprint` + the d09
    banded-Hamming equi-join — EXACT pairs within ``max_hamming``
    bits of the 64-bit energy-delta fingerprint, never a pair scan.
    Completes the multimodal dedup story (text d02–d19 / image m04 /
    audio here) on the same blocking machinery."""
    from southpaw_spark.operators.dedup import hamming_near_pairs

    sigs = audio_fingerprint(df, content_col, id_col).where(
        F.col("afp").isNotNull()
    )
    return hamming_near_pairs(
        sigs, id_col, sig_col="afp", bits=64, max_hamming=max_hamming
    )


def synth_wav(
    df: DataFrame,
    id_col: str,
    n_samples: int = 1040,
    framerate: int = 8000,
) -> DataFrame:
    """Deterministic WAV synthesis for tests/oracles: per row, 16-bit
    mono PCM whose sample ``k`` is ``((id*31 + k*7) % 211) - 105`` —
    a pure function of the id, so an independent engine can recompute
    the EXACT samples (and anything derived from them) without parsing
    RIFF. Real ``wave`` encoding: the bytes round-trip through any
    WAV reader."""
    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = StructType(
        [df.schema[id_col], StructField("content", BinaryType(), True)]
    )

    def make(i: int) -> bytes:
        import io
        import struct
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(framerate)
            w.writeframes(
                struct.pack(
                    f"<{n_samples}h",
                    *(
                        ((i * 31 + k * 7) % 211) - 105
                        for k in range(n_samples)
                    ),
                )
            )
        return buf.getvalue()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "content": [make(int(i)) for i in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(run, schema)


def synth_png(
    df: DataFrame,
    id_col: str,
    width: int = 16,
    height: int = 16,
) -> DataFrame:
    """Deterministic PNG synthesis for tests/oracles — the image twin
    of :func:`synth_wav`: per row, a REAL 8-bit grayscale PNG (zlib
    deflate, CRC'd IHDR/IDAT/IEND, filter-0 scanlines) whose pixel
    ``(y, x)`` is ``(id*7 + y*31 + x*13) % 256`` — a pure function of
    the id, so an independent engine can recompute every pixel (and
    the box-mean aHash derived from them) without parsing PNG. The
    bytes round-trip through any PNG reader (PIL included)."""
    import struct
    import zlib

    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = StructType(
        [df.schema[id_col], StructField("content", BinaryType(), True)]
    )

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    def make(i: int) -> bytes:
        raw = b"".join(
            b"\x00"
            + bytes((i * 7 + y * 31 + x * 13) % 256 for x in range(width))
            for y in range(height)
        )
        ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
        return (
            _PNG_SIG
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "content": [make(int(i)) for i in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(run, schema)


_SVID_MAGIC = b"SVID"


def _png_bytes(seed: int, width: int = 16, height: int = 16) -> bytes:
    """One real 8-bit grayscale PNG whose pixel ``(y, x)`` is
    ``(seed + y*31 + x*13) % 256`` — the :func:`synth_png` formula
    with the id term factored out so video frames can reuse it with a
    per-frame seed. Zlib deflate, CRC'd chunks; round-trips through
    any PNG reader."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    raw = b"".join(
        b"\x00"
        + bytes((seed + y * 31 + x * 13) % 256 for x in range(width))
        for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def synth_video(
    df: DataFrame,
    id_col: str,
    n_frames: int = 8,
    width: int = 16,
    height: int = 16,
) -> DataFrame:
    """Deterministic VIDEO synthesis completing the modality quartet
    (m04/m06 image, m05 audio, m07 video): per row a real container of
    PNG frames — ``SVID`` magic, u32 frame count, then per frame a u32
    length prefix + the PNG bytes. Frame ``f``'s pixel ``(y, x)`` is
    ``(id*7 + f*101 + y*31 + x*13) % 256`` — a pure function of
    (id, f), so an independent engine recomputes every sampled frame's
    aHash from the formula without parsing any binary (the m05/m06
    oracle discipline). The container is intentionally trivial — the
    point is the Spark-side plumbing (binary column, frame sampling,
    per-frame fingerprints); swap a PyAV/ffmpeg decoder in at
    production via :func:`video_frame_hashes`'s ``decoder`` seam."""
    import struct

    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = StructType(
        [df.schema[id_col], StructField("content", BinaryType(), True)]
    )

    def make(i: int) -> bytes:
        frames = [
            _png_bytes(i * 7 + f * 101, width, height)
            for f in range(n_frames)
        ]
        return (
            _SVID_MAGIC
            + struct.pack(">I", len(frames))
            + b"".join(struct.pack(">I", len(p)) + p for p in frames)
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "content": [make(int(i)) for i in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(run, schema)


def iter_video_frames(b: bytes):
    """Parse the :func:`synth_video` container → yield frame byte
    strings. Lenient: returns nothing for foreign bytes (no magic),
    stops at a truncated frame."""
    import struct

    if b is None or not b.startswith(_SVID_MAGIC):
        return
    if len(b) < 8:
        return
    (n,) = struct.unpack(">I", b[4:8])
    off = 8
    for _ in range(n):
        if off + 4 > len(b):
            return
        (ln,) = struct.unpack(">I", b[off:off + 4])
        off += 4
        if off + ln > len(b):
            return
        yield b[off:off + ln]
        off += ln


def video_frame_hashes(
    df: DataFrame,
    content_col: str,
    id_col: str,
    frame_stride: int = 2,
) -> DataFrame:
    """Per-frame perceptual fingerprints for video near-dup blocking
    (m07): sample every ``frame_stride``-th frame from the container,
    decode (stdlib PNG rung — :func:`_decode_png_gray`) and aHash each
    sampled frame. Output ``(id, frame_idx, ahash)`` — 8 bytes per
    sampled frame, after which video dedup is the d09 banded-Hamming
    join per frame slot, never a pair scan over pixels.

    Scale: decode cost is linear in sampled frames and embarrassingly
    parallel (the m05/m06 argument); stride is the knob trading recall
    for decode wall. One Arrow ``mapInPandas`` stage, zero shuffles."""
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    if frame_stride < 1:
        raise ValueError(f"frame_stride must be >= 1; got {frame_stride}")
    schema = StructType(
        [
            df.schema[id_col],
            StructField("frame_idx", IntegerType(), True),
            StructField("ahash", LongType(), True),
        ]
    )

    def hash_frame(p: bytes):
        if p.startswith(_PNG_SIG):
            gray = _decode_png_gray(p)
            if gray is not None:
                return _gray_ahash(gray)
        return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for i, b in zip(pdf[id_col], pdf[content_col]):
                for f, frame in enumerate(
                    iter_video_frames(bytes(b) if b is not None else None)
                ):
                    if f % frame_stride:
                        continue
                    h = hash_frame(frame)
                    if h is None:
                        continue
                    ids.append(i)
                    idxs.append(f)
                    hashes.append(h)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": pd.array(idxs, dtype="Int32"),
                    "ahash": pd.array(hashes, dtype="Int64"),
                }
            )

    return df.mapInPandas(run, schema)


def video_near_duplicates(
    df: DataFrame,
    content_col: str,
    id_col: str,
    max_hamming: int = 3,
    min_match_frac: float = 0.5,
    frame_stride: int = 2,
) -> DataFrame:
    """Video near-dup pairs: two videos pair when ≥ ``min_match_frac``
    of their ALIGNED sampled frames are within ``max_hamming`` bits
    (the same-slot comparison catches re-encodes/watermarks; shifted
    clips need a sequence alignment upstream). Frame matching is the
    d09 banded-Hamming equi-join with ``frame_idx`` folded into the
    band key, so candidates stay ∝ true collisions at any corpus
    size."""
    sigs = video_frame_hashes(
        df, content_col, id_col, frame_stride=frame_stride
    )
    if not 0 <= max_hamming < 64:
        raise ValueError(
            f"max_hamming must be in [0, 64), got {max_hamming}"
        )
    n_frames = sigs.groupBy(id_col).agg(F.count("*").alias("__nf"))
    # banded-Hamming candidates WITHIN each frame slot (frame_idx is
    # part of the equi-join key): exact by pigeonhole — ≤ max_hamming
    # differing bits over max_hamming+1 bands means ≥ 1 identical band
    # (same sizing rule as dedup.hamming_near_pairs; the last band
    # absorbs the remainder bits so the split always covers all 64)
    a = sigs.select(
        F.col(id_col).alias("id_a"), "frame_idx",
        F.col("ahash").alias("__ha"),
    )
    b = sigs.select(
        F.col(id_col).alias("id_b"), "frame_idx",
        F.col("ahash").alias("__hb"),
    )
    bands = max_hamming + 1
    base = 64 // bands

    def band_val(col, k):
        width = base if k < bands - 1 else 64 - base * (bands - 1)
        if width >= 64:  # bands == 1: (1<<64)-1 overflows a long; the
            return col.cast("long")  # whole signature IS the band
        mask = (1 << width) - 1
        return F.shiftrightunsigned(col.cast("long"), k * base).bitwiseAND(
            F.lit(mask).cast("long")
        )

    cands = None
    for k in range(bands):
        part = (
            a.withColumn("__bv", band_val(F.col("__ha"), k))
            .join(
                b.withColumn("__bv", band_val(F.col("__hb"), k)),
                ["frame_idx", "__bv"],
            )
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "frame_idx", "__ha", "__hb")
        )
        cands = part if cands is None else cands.unionByName(part)
    matched = (
        cands.distinct()
        .withColumn(
            "__d", F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
        )
        .where(F.col("__d") <= max_hamming)
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_matching_frames"))
    )
    return (
        matched.join(
            n_frames.select(
                F.col(id_col).alias("id_a"), F.col("__nf").alias("__na")
            ),
            "id_a",
        )
        .join(
            n_frames.select(
                F.col(id_col).alias("id_b"), F.col("__nf").alias("__nb")
            ),
            "id_b",
        )
        .withColumn(
            "match_frac",
            F.round(
                F.col("n_matching_frames")
                / F.greatest("__na", "__nb").cast("double"),
                6,
            ),
        )
        .where(F.col("match_frac") >= min_match_frac)
        .select("id_a", "id_b", "n_matching_frames", "match_frac")
    )
