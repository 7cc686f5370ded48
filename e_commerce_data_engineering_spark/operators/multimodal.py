"""Multimodal (image/audio/video) column plumbing (SURVEY §2.11).

Assets are opaque ``binary`` columns with a typed metadata struct —
the layout a 100 TB training-data lake uses (content-addressed bytes +
sidecar metadata, partitioned by modality). Heavy per-asset work runs
as Arrow-batched ``mapInPandas`` so bytes never round-trip through
Python row-at-a-time.

Decode tiers (this container has no Pillow/ffmpeg):

* REAL, stdlib-only: PNG (IHDR dimensions, bit depth), JPEG (SOF-scan
  dimensions), WAV (header + frame count via ``wave`` — sample rate,
  duration), AVI (RIFF chunk walk — dimensions, frame rate, frame
  count). These are genuine decoders over genuine bytes.
* FAKE: the deterministic synthetic payload, kept only as a
  plumbing-test path — gated by ``fake=True``.
* Pixel-level work is REAL for images AND video: PNG via a full
  stdlib decoder (zlib inflate + scanline unfilter for all five PNG
  filter types), JPEG via the baseline codec in ``operators/jpeg.py``
  (Huffman entropy decode + IDCT + chroma upsampling; encoder with the
  Annex K tables), video via MJPEG-in-AVI (``operators/avi.py``:
  container parse + per-frame baseline-JPEG decode). Non-baseline
  JPEG (progressive/arithmetic) and non-MJPEG video raise
  ``ValueError`` — loudly, never a silent passthrough.
"""

from __future__ import annotations

import io
import math
import struct
import wave
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The mapInPandas closures below call module-level helpers
# (parse_asset_bytes, png_decode, ...). By default cloudpickle ships a
# closure by value but its module-global references by NAME, so the
# Python worker must be able to `import e_commerce_data_engineering_spark`
# — true when the driver runs from the repo root, false when the repo
# was put on sys.path at runtime (workers inherit PYTHONPATH/cwd, not
# driver sys.path mutations). Registering this module for by-value
# pickling makes the decode operators work under ANY deployment; pandas/
# numpy stay by-reference (they exist on every worker).
_sys_mod = __import__("sys").modules
try:  # the serializer pyspark actually uses for UDFs
    from pyspark import cloudpickle as _cp
except ImportError:  # pragma: no cover - fallback for standalone use
    import cloudpickle as _cp
_cp.register_pickle_by_value(_sys_mod[__name__])
from . import avi as _avi_mod  # noqa: E402  (after the pickle hook)
from . import jpeg as _jpeg_mod  # noqa: E402
from .avi import avi_bytes, avi_decode_frame, avi_frame_ms, avi_parse  # noqa: E402
from .jpeg import jpeg_bytes, jpeg_decode, jpeg_encode  # noqa: E402

_cp.register_pickle_by_value(_jpeg_mod)
_cp.register_pickle_by_value(_avi_mod)

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("checksum", T.LongType(), False),
    ]
)


# ---------------------------------------------------------------------------
# Real stdlib encoders/decoders (no Pillow/ffmpeg required)
# ---------------------------------------------------------------------------

def png_bytes(w: int, h: int, seed: int = 0) -> bytes:
    """A VALID deterministic RGBA PNG (stdlib zlib + crc32)."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)  # 8-bit RGBA
    raw = b"".join(
        b"\x00"
        + bytes(
            v
            for x in range(w)
            for v in ((x * 7 + y * 13 + seed) % 256, (x * 31 + seed) % 256, (y * 17) % 256, 255)
        )
        for y in range(h)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def png_decode(b: bytes):
    """REAL stdlib PNG decode → numpy (h, w, 4) uint8 array. Supports
    8-bit RGBA (the profile ``png_bytes`` emits) with the full filter
    spec: scanlines may use any of None/Sub/Up/Average/Paeth, so this
    reads PNGs from any conforming encoder, not just our own."""
    import numpy as np

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, w = 8, b"", 0
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if typ == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", data[:10])
            if depth != 8 or color != 6:
                raise ValueError(f"unsupported PNG profile depth={depth} color={color}")
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride, bpp = w * 4, 4
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1)
        cur = line.astype(np.int32)
        if ftype == 1:  # Sub
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                bb = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, 4)


def resize_nearest(arr, new_w: int, new_h: int):
    """Nearest-neighbor resample of an (h, w, c) array: pure numpy
    index mapping (pixel-center sampling), no interpolation libs."""
    import numpy as np

    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(new_h) + 0.5) * h / new_h, h - 1).astype(np.int64)
    xs = np.minimum((np.arange(new_w) + 0.5) * w / new_w, w - 1).astype(np.int64)
    return arr[ys][:, xs]


def png_encode(arr) -> bytes:
    """(h, w, 4) uint8 array → valid RGBA PNG (filter 0 scanlines)."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def wav_bytes(sample_rate: int, duration_ms: int, freq_hz: float, amp: float = 0.5) -> bytes:
    """A VALID mono 16-bit PCM WAV sine tone (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        n = sample_rate * duration_ms // 1000
        w.writeframes(
            b"".join(
                struct.pack("<h", int(32767 * amp * math.sin(2 * math.pi * freq_hz * i / sample_rate)))
                for i in range(n)
            )
        )
    return buf.getvalue()


def parse_asset_bytes(b: bytes) -> tuple[str, int | None, int | None, int | None, int | None]:
    """(format, width, height, sample_rate, duration_ms) from real
    container headers — PNG IHDR, JPEG SOF marker scan, WAV/RIFF via
    the wave module. Unknown payloads classify as 'unknown' (quarantine
    downstream) rather than failing the batch."""
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", b[16:24])
        return ("png", w, h, None, None)
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(b) and b[i] == 0xFF:
            marker, seglen = b[i + 1], struct.unpack(">H", b[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return ("jpeg", w, h, None, None)
            i += 2 + seglen
        return ("jpeg", None, None, None, None)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        with wave.open(io.BytesIO(b)) as w:
            sr = w.getframerate()
            return ("wav", None, None, sr, int(w.getnframes() * 1000 / sr))
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        info = avi_parse(b)
        return ("avi", info["width"], info["height"], None, info["duration_ms"])
    return ("unknown", None, None, None, None)

FEATURE_DIM = 16
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

_MAGIC = b"FAKE"


def make_fake_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic assets: payload = b'FAKE' + packed
    (w, h, seed, asset_id) + filler bytes. Stands in for real media so
    the distributed plumbing is exercised end-to-end."""
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        w, h = 64 + (i * 7) % 512, 64 + (i * 13) % 512
        payload = _MAGIC + struct.pack("<iiqq", w, h, seed, i) + bytes((i + j) % 251 for j in range(128))
        rows.append(
            (
                i,
                modality,
                payload,
                ("fake", w, h, 16000 if modality == "audio" else None, 1000 + i, ),
            )
        )
    # partition count proportional to data size: a tiny demo frame must
    # not fan out to defaultParallelism Arrow workers (worker startup
    # would dwarf the work); a real asset table arrives pre-split.
    n_parts = max(1, min(spark.sparkContext.defaultParallelism, n // 32))
    return spark.createDataFrame(rows, ASSET_SCHEMA).coalesce(n_parts)


def make_real_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Mixed-modality assets with GENUINE container bytes: images
    alternate valid PNGs and valid baseline JPEGs (operators/jpeg.py),
    audio is valid 16-bit PCM WAV, video is valid MJPEG-in-AVI
    (operators/avi.py — every frame a real baseline JPEG). JPEGs are
    sized past the usual resize bounds so the resize pipeline genuinely
    rescales them. Deterministic per (n, seed)."""
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        if modality == "image" and (i // 3) % 2 == 1:
            w, h = 48 + (i * 11) % 80, 40 + (i * 7) % 72
            payload = jpeg_bytes(w, h, seed + i)
            meta = ("jpeg", w, h, None, None)
        elif modality == "image":
            w, h = 4 + i % 13, 3 + i % 9
            payload = png_bytes(w, h, seed + i)
            meta = ("png", w, h, None, None)
        elif modality == "audio":
            sr = 8000 if i % 2 else 16000
            dur = 50 + (i % 5) * 10
            payload = wav_bytes(sr, dur, 220.0 + 5 * i)
            meta = ("wav", None, None, sr, dur)
        else:
            # duration varies per video (i // 3 walks 0,1,2,... across
            # the corpus while i % 3 is fixed at 2 for video rows)
            w, h = 16 + (i * 8) % 32, 12 + (i * 4) % 24
            n_frames, fps = 2 + (i // 3) % 5, 4
            payload = avi_bytes(w, h, n_frames=n_frames, fps=fps, seed=seed + i)
            meta = ("avi", w, h, None, n_frames * 1000 // fps)
        rows.append((i, modality, payload, meta))
    n_parts = max(1, min(spark.sparkContext.defaultParallelism, n // 32))
    return spark.createDataFrame(rows, ASSET_SCHEMA).coalesce(n_parts)


def decode_asset(assets: DataFrame, fake: bool = False) -> DataFrame:
    """Decode binary → structural info via mapInPandas (Arrow batches).

    PNG/JPEG/WAV payloads are decoded for REAL (stdlib header parsers,
    parse_asset_bytes) — no codec library needed for container-level
    structure. ``fake=True`` additionally accepts the synthetic FAKE
    payload (the stand-in for formats whose pixel/AV decode would need
    Pillow/ffmpeg); anything unrecognized classifies as 'unknown'.
    """

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, modality, content in zip(
                pdf["asset_id"], pdf["modality"], pdf["content"]
            ):
                b = bytes(content)
                if fake and b[:4] == _MAGIC:
                    w, h, _seed, _i = struct.unpack("<iiqq", b[4:28])
                    fmt, sr, dur = "fake", None, None
                else:
                    fmt, w, h, sr, dur = parse_asset_bytes(b)
                checksum = 0
                for byte in b:
                    checksum = (checksum * 31 + byte) % (1 << 61)
                out.append((asset_id, modality, fmt, w, h, sr, dur, len(b), checksum))
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id", "modality", "format", "width", "height",
                    "sample_rate", "duration_ms", "n_bytes", "checksum",
                ],
            )

    return assets.mapInPandas(_decode_batch, DECODED_SCHEMA)


def extract_features(assets: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Bytes → fixed-dim float feature vector via mapInPandas. The
    arithmetic is a deterministic stand-in (byte-histogram folding);
    the batching/schema/shuffle shape is exactly what a real CLIP/VGGish
    featurizer would use."""

    def _feat_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                vec = [0.0] * dim
                for j, byte in enumerate(b):
                    vec[j % dim] += byte / 255.0
                norm = sum(v * v for v in vec) ** 0.5 or 1.0
                out.append((asset_id, [float(v / norm) for v in vec]))
            yield pd.DataFrame(out, columns=["asset_id", "feature"])

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("feature", T.ArrayType(T.FloatType()), False),
        ]
    )
    return assets.mapInPandas(_feat_batch, schema)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zero_crossings", T.IntegerType(), True),
        T.StructField("peak", T.DoubleType(), True),
    ]
)


def extract_audio_features(assets: DataFrame) -> DataFrame:
    """REAL PCM analysis of WAV assets (stdlib wave + numpy over Arrow
    batches): RMS level, zero-crossing count, and peak amplitude — the
    signal-hygiene stats an audio curation pipeline filters on
    (silence/clipping detection). Non-WAV rows yield nulls (quarantine
    downstream); no codec library involved for 16-bit PCM."""

    def _audio_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    with wave.open(io.BytesIO(b)) as w:
                        sr, width, n = w.getframerate(), w.getsampwidth(), w.getnframes()
                        frames = w.readframes(n)
                    if width == 2:
                        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
                        rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
                        zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
                        peak = float(np.max(np.abs(x))) if len(x) else 0.0
                        out.append((asset_id, sr, len(x), rms, zc, peak))
                        continue
                out.append((asset_id, None, None, None, None, None))
            yield pd.DataFrame(
                out,
                columns=["asset_id", "sample_rate", "n_samples", "rms", "zero_crossings", "peak"],
            )

    return assets.mapInPandas(_audio_batch, AUDIO_FEATURE_SCHEMA)


AUDIO_MOMENT_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("sum_sq", T.LongType(), True),
        T.StructField("zero_crossings", T.IntegerType(), True),
        T.StructField("peak_abs", T.IntegerType(), True),
    ]
)


def audio_pcm_moments(assets: DataFrame) -> DataFrame:
    """INTEGER PCM moments of WAV assets — the hash-checkable twin of
    ``extract_audio_features`` (m15's discipline brought to audio):
    sum of squared int16 samples (exact bigint), zero-crossing count
    (signbit flips: v<0 vs v>=0, matching numpy signbit on the float
    samples), and peak |sample|. Because every output is an integer
    over the RAW int16 grid (no /32768 float normalization), a SQL
    oracle that regenerates the generator's closed-form samples
    arithmetically must agree bit-for-bit — one sample decoded wrong
    flips sum_sq. Downstream queries derive RMS as sqrt(sum_sq/n)
    (IEEE sqrt is correctly rounded, so both engines agree). Non-WAV
    rows yield nulls. Bound: sum_sq <= n * 32767^2 — int64-safe to
    ~8.6e9 samples (~3 days of 16 kHz mono) per asset."""

    def _moments_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    with wave.open(io.BytesIO(b)) as w:
                        sr, width, n = w.getframerate(), w.getsampwidth(), w.getnframes()
                        frames = w.readframes(n)
                    if width == 2:
                        v = np.frombuffer(frames, dtype="<i2").astype(np.int64)
                        sum_sq = int(np.sum(v * v))
                        zc = int(np.count_nonzero((v[1:] < 0) != (v[:-1] < 0)))
                        peak = int(np.max(np.abs(v))) if len(v) else 0
                        out.append((asset_id, sr, len(v), sum_sq, zc, peak))
                        continue
                out.append((asset_id, None, None, None, None, None))
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id", "sample_rate", "n_samples",
                    "sum_sq", "zero_crossings", "peak_abs",
                ],
            )

    return assets.mapInPandas(_moments_batch, AUDIO_MOMENT_SCHEMA)


def corrupt_assets(assets: DataFrame, mod: int = 5, flip_rem: int = 2, trunc_rem: int = 3) -> DataFrame:
    """Deterministic corruption injector for integrity testing: assets
    with ``asset_id % mod == flip_rem`` get ONE byte XOR-flipped (for
    PNG at offset 45 — provably inside the IDAT payload for every
    generated size, so the chunk CRC must catch it; for other formats
    at len-10, inside checksum-free payload), and assets with
    ``asset_id % mod == trunc_rem`` lose their last 7 bytes (kills
    PNG's IEND, JPEG's EOI, and the RIFF size invariant). Everything
    else passes through untouched. The pattern is pure arithmetic on
    asset_id, so an oracle can enumerate the expected damage without
    seeing the bytes."""

    def _corrupt_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            contents = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                r = asset_id % mod
                if r == flip_rem and len(b) > 55:
                    pos = 45 if b[:8] == b"\x89PNG\r\n\x1a\n" else len(b) - 10
                    b = b[:pos] + bytes([b[pos] ^ 0xFF]) + b[pos + 1:]
                elif r == trunc_rem and len(b) > 7:
                    b = b[:-7]
                contents.append(b)
            out["content"] = contents
            yield out

    return assets.mapInPandas(_corrupt_batch, assets.schema)


INTEGRITY_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("verdict", T.StringType(), False),
    ]
)


def asset_integrity(assets: DataFrame) -> DataFrame:
    """REAL structural/checksum validation per asset — the pre-decode
    screen a 100 TB multimodal ingest runs to quarantine damaged blobs
    before paying decode cost: PNG walks every chunk and verifies each
    zlib.crc32 (one flipped payload byte => 'crc_mismatch'; missing/
    mangled IEND or an over-running length => 'truncated'); JPEG
    checks SOI..EOI framing; WAV/AVI check the RIFF size invariant
    (size field == len-8). The verdicts also DOCUMENT the formats'
    blind spots: a flipped byte inside WAV/AVI/JPEG payload is
    structurally invisible (no checksum in the container) — exactly
    why content-level hashes ride beside container checks in a real
    pipeline. Narrow Arrow map, three columns out per asset."""

    def _check(b: bytes) -> tuple[str, str]:
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            pos, saw_iend = 8, False
            while pos + 8 <= len(b):
                (ln,) = struct.unpack(">I", b[pos:pos + 4])
                typ = b[pos + 4:pos + 8]
                end = pos + 8 + ln + 4
                if end > len(b):
                    return "png", "truncated"
                data = b[pos + 8:pos + 8 + ln]
                (crc,) = struct.unpack(">I", b[pos + 8 + ln:end])
                if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
                    return "png", "crc_mismatch"
                if typ == b"IEND":
                    saw_iend = True
                    break
                pos = end
            return "png", "ok" if saw_iend else "truncated"
        if b[:2] == b"\xff\xd8":
            return "jpeg", "ok" if b[-2:] == b"\xff\xd9" else "truncated"
        if b[:4] == b"RIFF":
            fmt = "wav" if b[8:12] == b"WAVE" else "avi"
            (sz,) = struct.unpack("<I", b[4:8])
            return fmt, "ok" if sz == len(b) - 8 else "truncated"
        return "unknown", "malformed"

    def _integrity_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                fmt, verdict = _check(bytes(content))
                rows.append((asset_id, fmt, verdict))
            yield pd.DataFrame(rows, columns=["asset_id", "fmt", "verdict"])

    return assets.mapInPandas(_integrity_batch, INTEGRITY_SCHEMA)


AUDIO_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("j", T.IntegerType(), False),
        T.StructField("v", T.IntegerType(), False),
    ]
)


def audio_pcm_samples(assets: DataFrame) -> DataFrame:
    """REAL WAV decode to SAMPLE GRAIN: (asset_id, sample_rate, j, v)
    with v the raw int16 PCM value at frame j — decode is the ONLY
    Python step; every analysis over the samples (silence runs,
    clipping censuses, envelope stats) stays JVM-side as windows and
    aggregates, which is the Spark-first division of labor for
    multimodal columns: Arrow-batch the codec, express the analytics
    declaratively. Non-WAV / non-int16 rows are dropped (audio-only
    consumers filter upstream anyway). The fan-out is bounded and
    known (sample_rate x duration rows per asset); at 100 TB the same
    map runs per asset-partition with no shuffle — sample rows carry
    their asset key, so downstream windows partition on it.
    """

    def _samples_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, srs, js, vs = [], [], [], []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    continue
                with wave.open(io.BytesIO(b)) as w:
                    sr, width, n = w.getframerate(), w.getsampwidth(), w.getnframes()
                    frames = w.readframes(n)
                if width != 2:
                    continue
                v = np.frombuffer(frames, dtype="<i2").astype(np.int32)
                ids.append(np.full(len(v), asset_id, dtype=np.int64))
                srs.append(np.full(len(v), sr, dtype=np.int32))
                js.append(np.arange(len(v), dtype=np.int32))
                vs.append(v)
            if ids:
                yield pd.DataFrame(
                    {
                        "asset_id": np.concatenate(ids),
                        "sample_rate": np.concatenate(srs),
                        "j": np.concatenate(js),
                        "v": np.concatenate(vs),
                    }
                )

    return assets.mapInPandas(_samples_batch, AUDIO_SAMPLE_SCHEMA)


DQT_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("table_id", T.IntegerType(), False),
        T.StructField("n_entries", T.IntegerType(), False),
        T.StructField("sum_q", T.LongType(), False),
        T.StructField("checksum", T.LongType(), False),
    ]
)


def jpeg_dqt_stats(assets: DataFrame) -> DataFrame:
    """REAL JPEG DQT (quantization table) marker parse — header-only,
    no entropy decode: walk the marker stream to SOS, extract every
    8-bit quantization table in its STORED (zigzag) order, and emit
    integer digests per (asset, table): entry count, sum of the 64
    values, and the position-weighted checksum sum((i+1)*q[i]) — one
    byte read wrong anywhere in the SOI->SOS chain moves the checksum.
    This is the metadata pass an image-curation pipeline runs to
    estimate compression quality WITHOUT decoding pixels (the qtable
    is the quality fingerprint; libjpeg/ImageMagick estimate quality
    from exactly these sums). Non-JPEG rows emit nothing."""

    def _dqt_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                if b[:2] != b"\xff\xd8":
                    continue
                pos = 2
                while pos + 4 <= len(b):
                    if b[pos] != 0xFF:
                        break
                    marker = b[pos + 1]
                    if marker in (0xD9, 0xDA):  # EOI / SOS: tables done
                        break
                    seglen = int.from_bytes(b[pos + 2 : pos + 4], "big")
                    data = b[pos + 4 : pos + 2 + seglen]
                    if marker == 0xDB:
                        i = 0
                        while i + 65 <= len(data) + 1 and i < len(data):
                            prec, tid = data[i] >> 4, data[i] & 15
                            if prec != 0:
                                raise ValueError("16-bit qtable: not baseline")
                            vals = data[i + 1 : i + 65]
                            out.append(
                                (
                                    asset_id,
                                    tid,
                                    len(vals),
                                    sum(vals),
                                    sum((j + 1) * v for j, v in enumerate(vals)),
                                )
                            )
                            i += 65
                    pos += 2 + seglen
            yield pd.DataFrame(
                out,
                columns=["asset_id", "table_id", "n_entries", "sum_q", "checksum"],
            )

    return assets.mapInPandas(_dqt_batch, DQT_SCHEMA)


SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("dominant_freq_hz", T.DoubleType(), True),
        T.StructField("mean_centroid_hz", T.DoubleType(), True),
        T.StructField("bandwidth_hz", T.DoubleType(), True),
    ]
)


def extract_audio_spectral(
    assets: DataFrame, frame: int = 256, hop: int = 128
) -> DataFrame:
    """REAL frequency-domain analysis of WAV assets: Hann-windowed STFT
    (numpy rfft) over Arrow batches → per-asset dominant frequency
    (peak bin of the mean magnitude spectrum), mean spectral centroid,
    and bandwidth (magnitude-weighted std around the centroid) — the
    tone/noise/bandwidth hygiene screen complementing m02's time-domain
    stats. Non-WAV rows yield nulls (quarantine downstream). Frequency
    resolution is sample_rate/frame; the unit test recovers each test
    tone's known frequency within one bin."""

    def _spec_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        win = None
        for pdf in batches:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                if not (b[:4] == b"RIFF" and b[8:12] == b"WAVE"):
                    out.append((asset_id, None, None, None, None, None))
                    continue
                with wave.open(io.BytesIO(b)) as w:
                    sr, width, n = w.getframerate(), w.getsampwidth(), w.getnframes()
                    frames_pcm = w.readframes(n)
                if width != 2:
                    out.append((asset_id, sr, None, None, None, None))
                    continue
                x = np.frombuffer(frames_pcm, dtype="<i2").astype(np.float64) / 32768.0
                if len(x) < frame:
                    x = np.pad(x, (0, frame - len(x)))
                if win is None or len(win) != frame:
                    win = np.hanning(frame)
                n_fr = 1 + (len(x) - frame) // hop
                starts = np.arange(n_fr) * hop
                segs = np.stack([x[s : s + frame] * win for s in starts])
                mag = np.abs(np.fft.rfft(segs, axis=1))
                freqs = np.fft.rfftfreq(frame, d=1.0 / sr)
                mean_mag = mag.mean(axis=0)
                dom = float(freqs[int(mean_mag.argmax())])
                tot = mag.sum(axis=1)
                tot[tot == 0] = 1.0
                centroids = (mag * freqs).sum(axis=1) / tot
                mean_c = float(centroids.mean())
                bw = float(
                    np.sqrt(
                        ((freqs - mean_c) ** 2 * mean_mag).sum() / mean_mag.sum()
                    )
                )
                out.append((asset_id, sr, n_fr, dom, mean_c, bw))
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id", "sample_rate", "n_frames",
                    "dominant_freq_hz", "mean_centroid_hz", "bandwidth_hz",
                ],
            )

    auds = assets.filter(F.col("modality") == "audio").select("asset_id", "content")
    return auds.mapInPandas(_spec_batch, SPECTRAL_SCHEMA)


def sample_video_frames(assets: DataFrame, every_ms: int = 250) -> DataFrame:
    """Frame-sampling PLAN: one output row per sampled frame offset
    (timestamps from meta.duration_ms — no decode needed for planning).
    ``extract_video_frames`` is the execution half that actually
    decodes the sampled frames' pixels."""
    frames = assets.filter(F.col("modality") == "video").select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ms"),
    )
    return frames


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ms", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_luma", T.DoubleType(), False),
    ]
)


def sampled_frame_indices(info: dict, every_ms: int) -> list[int]:
    """Ordered, deduplicated frame indices sampled every ``every_ms``
    from a parsed AVI's timeline (a timestamp past the last frame
    clamps to it). SHARED by ``extract_video_frames`` and
    ``video_frame_phash`` — m14's shot-boundary premise is that both
    operators decode IDENTICAL frames, so the selection rule lives in
    exactly one place (ADVICE r10: the copy-paste twin could drift)."""
    frame_dur_ms = 1000 * info["scale"] / info["rate"]
    wanted: list[int] = []
    seen: set[int] = set()
    for ts in range(0, info["duration_ms"] + 1, every_ms):
        idx = min(int(ts / frame_dur_ms), info["n_frames"] - 1)
        if idx not in seen:
            seen.add(idx)
            wanted.append(idx)
    return wanted


def extract_video_frames(assets: DataFrame, every_ms: int = 250) -> DataFrame:
    """REAL video pixel decode via mapInPandas: MJPEG-in-AVI container
    parse (operators/avi.py) + per-frame baseline-JPEG decode, sampling
    the frame at each ``every_ms`` timestamp (dedup'd by frame index —
    a timestamp past the last frame clamps to it). Emits per-frame
    dimensions and mean luma (ITU-R BT.601 weights over the decoded
    RGB), the shot-boundary / black-frame signal a video curation
    pipeline filters on. Non-AVI video rows (or non-MJPEG streams)
    raise ``ValueError`` loudly — decode gaps must not be silent.

    Scale shape: one Arrow batch in, one decoded-stats batch out —
    a narrow map with no shuffle; at 100 TB the asset table arrives
    partitioned and each worker decodes only its partition's bytes."""

    def _frames_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                info = avi_parse(bytes(content))
                for idx in sampled_frame_indices(info, every_ms):
                    px = avi_decode_frame(info, idx)
                    luma = (
                        0.299 * px[:, :, 0].astype(np.float64)
                        + 0.587 * px[:, :, 1]
                        + 0.114 * px[:, :, 2]
                    )
                    out.append(
                        (
                            asset_id,
                            idx,
                            avi_frame_ms(info, idx),
                            px.shape[1],
                            px.shape[0],
                            float(luma.mean()),
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id", "frame_idx", "frame_ms", "width", "height", "mean_luma",
                ],
            )

    vids = assets.filter(F.col("modality") == "video").select("asset_id", "content")
    return vids.mapInPandas(_frames_batch, VIDEO_FRAME_SCHEMA)


VIDEO_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ms", T.IntegerType(), False),
        T.StructField("phash_bits", T.StringType(), False),
        T.StructField("n_set_bits", T.IntegerType(), False),
    ]
)


def video_frame_phash(assets: DataFrame, every_ms: int = 250) -> DataFrame:
    """Per-FRAME perceptual DCT hash over real video decode: the same
    MJPEG-in-AVI parse + baseline-JPEG frame decode as
    ``extract_video_frames``, feeding each decoded frame's pixels
    through ``phash_from_pixels`` (m12's integer-exact 63-bit spectral
    hash). One 63-bit row per sampled frame — the signature stream a
    shot-boundary detector (m14) or cross-video frame-dedup runs on;
    pHash is the right hash here because JPEG blocking noise perturbs
    point-sampled ahash/dhash bits but barely moves the low-frequency
    spectrum. Non-AVI/non-MJPEG video rows raise loudly (the
    extract_video_frames discipline). Scale shape: shuffle-free narrow
    Arrow map over asset-partitioned bytes; output rows are bounded by
    total video duration / every_ms."""
    from .avi import avi_decode_frame, avi_frame_ms, avi_parse

    def _phash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                info = avi_parse(bytes(content))
                for idx in sampled_frame_indices(info, every_ms):
                    px = avi_decode_frame(info, idx)
                    bits, pop = phash_from_pixels(px)
                    out.append(
                        (int(asset_id), idx, avi_frame_ms(info, idx), bits, pop)
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id", "frame_idx", "frame_ms", "phash_bits", "n_set_bits",
                ],
            )

    vids = assets.filter(F.col("modality") == "video").select("asset_id", "content")
    return vids.mapInPandas(_phash_batch, VIDEO_PHASH_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), False),
    ]
)


def resize_image(assets: DataFrame, max_side: int = 256, fake: bool = False) -> DataFrame:
    """Image resize via mapInPandas: bytes in → resized bytes out,
    aspect ratio preserved, only rows exceeding ``max_side``
    rewritten. The real path is a GENUINE pixel pipeline for both
    formats: PNG via stdlib decode (``png_decode``, all five scanline
    filters) → numpy nearest-neighbor resample → PNG re-encode; JPEG
    via the baseline codec (``operators/jpeg.py`` Huffman+IDCT decode,
    Annex-K re-encode). An oversized JPEG that can't be decoded
    (progressive/arithmetic stream) raises rather than passing through
    silently. ``fake=True`` keeps the synthetic-payload header-rewrite
    path for plumbing tests.
    """

    def _new_dims(w: int, h: int) -> tuple[int, int]:
        scale = max_side / max(w, h) if max(w, h) > max_side else 1.0
        return max(1, int(w * scale)), max(1, int(h * scale))

    def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                if fake and b[:4] == _MAGIC:
                    w, h, seed, i = struct.unpack("<iiqq", b[4:28])
                    nw, nh = _new_dims(w, h)
                    b = _MAGIC + struct.pack("<iiqq", nw, nh, seed, i) + b[28:]
                    out.append((asset_id, nw, nh, b))
                    continue
                fmt, w, h, _, _ = parse_asset_bytes(b)
                if fmt == "png" and max(w, h) > max_side:
                    nw, nh = _new_dims(w, h)
                    b = png_encode(resize_nearest(png_decode(b), nw, nh))
                    out.append((asset_id, nw, nh, b))
                elif fmt == "jpeg" and max(w, h) > max_side:
                    nw, nh = _new_dims(w, h)
                    b = jpeg_encode(resize_nearest(jpeg_decode(b), nw, nh))
                    out.append((asset_id, nw, nh, b))
                else:
                    out.append((asset_id, w, h, b))
            yield pd.DataFrame(out, columns=["asset_id", "width", "height", "content"])

    imgs = assets.filter(F.col("modality") == "image").select("asset_id", "content")
    return imgs.mapInPandas(_resize_batch, RESIZED_SCHEMA)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("ahash_bits", T.StringType(), False),
        T.StructField("n_set_bits", T.LongType(), False),
    ]
)

AHASH_GRID = 8  # 8×8 cells → 64-bit fingerprint


def ahash_from_pixels(px, grid: int = AHASH_GRID) -> tuple[str, int]:
    """64-bit average-hash from an (h, w, ≥3) uint8 pixel array, as a
    bit string (cell-major, row by row) plus its popcount.

    Integer-exact by construction so independent implementations agree
    bit-for-bit: each grid cell samples ONE pixel nearest-neighbor
    style at (cx·w//grid, cy·h//grid) — defined for any image size,
    including images smaller than the grid — takes its BT.601 luma
    scaled ×1000 as an int (299R + 587G + 114B), and sets the bit when
    cell_luma·grid² exceeds the sum of all cell lumas (the mean
    comparison cross-multiplied so no division ever happens). No
    floats anywhere. This is a deterministic, re-encode-stable
    fingerprint — lossless re-encodes and exact nearest-neighbor
    rescales land on the same 64 bits, which is exactly what byte-hash
    dedup misses. It is NOT noise-tolerant: each cell point-samples a
    single pixel, so flipping one sampled pixel flips a bit (averaging
    all pixels per cell with exact integer sums would buy that, at the
    same division-free discipline, if a corpus needs it)."""
    h, w = px.shape[0], px.shape[1]
    lumas = []
    for cy in range(grid):
        for cx in range(grid):
            x, y = cx * w // grid, cy * h // grid
            r, g, b = int(px[y, x, 0]), int(px[y, x, 1]), int(px[y, x, 2])
            lumas.append(299 * r + 587 * g + 114 * b)
    total = sum(lumas)
    n = grid * grid
    bits = ["1" if v * n > total else "0" for v in lumas]
    return "".join(bits), bits.count("1")


def image_ahash(assets: DataFrame, grid: int = AHASH_GRID) -> DataFrame:
    """Perceptual average-hash fingerprints for every PNG asset: REAL
    stdlib PNG decode (``png_decode`` — zlib inflate + full filter
    reconstruction) inside Arrow ``mapInPandas`` batches, then the
    integer-exact ``ahash_from_pixels`` grid. JPEG payloads are skipped
    here — lossy decode output is codec-exact but not *generator*-
    reproducible, so they get no oracle row (their decode parity is
    pinned separately in tests).

    Scale shape: shuffle-free narrow map over asset-partitioned bytes,
    one output row per image; downstream near-dup joins run on the
    64-bit fingerprints (SimHash-style band blocking, d02/d10), never
    on pixels."""

    def _ahash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                if b[:8] != b"\x89PNG\r\n\x1a\n":
                    continue
                px = png_decode(b)
                bits, popcount = ahash_from_pixels(px, grid)
                out.append(
                    (int(asset_id), px.shape[1], px.shape[0], bits, popcount)
                )
            yield pd.DataFrame(
                out,
                columns=["asset_id", "width", "height", "ahash_bits", "n_set_bits"],
            )

    imgs = assets.filter(F.col("modality") == "image")
    return imgs.mapInPandas(_ahash_batch, AHASH_SCHEMA)


def upscale_assets(
    assets: DataFrame, factor: int = 2, id_offset: int = 1000
) -> DataFrame:
    """Integer-factor nearest-neighbor upscale of every PNG asset,
    re-encoded as a genuine PNG, emitted as a NEW asset row at
    ``asset_id + id_offset`` (ASSET_SCHEMA, so it unions back onto the
    original corpus). The whole decode → resample → encode loop runs
    distributed inside Arrow ``mapInPandas`` — no driver-side pixels.

    This is the near-duplicate factory for perceptual-hash dedup
    (m08): an exact ×k nearest-neighbor upscale samples the SAME
    source pixel at every ahash grid cell — with w' = k·w the cell
    sample is floor(floor(cx·k·w/g)/k) = floor(cx·w/g) by the nested-
    floor identity — so the variant's 64-bit ahash equals the
    original's EXACTLY while its bytes (and byte-hash) are completely
    different. Non-PNG rows are dropped (JPEG re-encode is lossy, so
    its upscale is pinned by decode-parity tests instead; see m03)."""

    def _upscale_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                if b[:8] != b"\x89PNG\r\n\x1a\n":
                    continue
                px = png_decode(b)
                h, w = px.shape[0], px.shape[1]
                nw, nh = w * factor, h * factor
                nb = png_encode(resize_nearest(px, nw, nh))
                out.append(
                    (
                        int(asset_id) + id_offset,
                        "image",
                        nb,
                        {
                            "format": "png",
                            "width": nw,
                            "height": nh,
                            "sample_rate": None,
                            "duration_ms": None,
                        },
                    )
                )
            yield pd.DataFrame(
                out, columns=["asset_id", "modality", "content", "meta"]
            )

    imgs = assets.filter(F.col("modality") == "image").select(
        "asset_id", "modality", "content", "meta"
    )
    return imgs.mapInPandas(_upscale_batch, ASSET_SCHEMA)


FINGERPRINT_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("fp_hash", T.LongType(), False),
    ]
)

FP_BANDS = 4  # log-ish frequency bands, one peak landmark per band/frame
FP_FAN = 3  # pair each landmark with peaks up to this many frames ahead


def audio_fingerprint(
    assets: DataFrame, frame: int = 256, hop: int = 48
) -> DataFrame:
    """Landmark audio fingerprinting (the Shazam scheme, Wang 2003):
    Hann-windowed STFT over Arrow batches, ONE peak bin per frequency
    band per frame (the constellation), each landmark paired with the
    same band's peaks up to FP_FAN frames ahead, and every pair packed
    into one int64 hash (band | bin1 | bin2 | dt). Peak BINS are
    amplitude-invariant — a volume-rescaled copy of a clip emits the
    IDENTICAL hash set, which is what makes hash-intersection a
    near-dup detector where byte/exact-hash dedup sees two different
    files. Non-WAV / non-16-bit rows are skipped (quarantine
    upstream). Scale: a shuffle-free narrow map emitting a few dozen
    8-byte hashes per clip; the downstream pair join is an equi-join
    on fp_hash (m08's band-bucket discipline — never all-pairs)."""

    def _fp_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        win = np.hanning(frame)
        n_bins = frame // 2 + 1
        # FP_BANDS geometric band edges over the positive-frequency bins
        edges = [1]
        for b in range(1, FP_BANDS + 1):
            edges.append(max(edges[-1] + 1, int(round(n_bins ** (b / FP_BANDS)))))
        for pdf in batches:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                if not (b[:4] == b"RIFF" and b[8:12] == b"WAVE"):
                    continue
                with wave.open(io.BytesIO(b)) as w:
                    width, n = w.getsampwidth(), w.getnframes()
                    pcm = w.readframes(n)
                if width != 2:
                    continue
                x = np.frombuffer(pcm, dtype="<i2").astype(np.float64) / 32768.0
                if len(x) < frame:
                    x = np.pad(x, (0, frame - len(x)))
                n_fr = 1 + (len(x) - frame) // hop
                starts = np.arange(n_fr) * hop
                segs = np.stack([x[s : s + frame] * win for s in starts])
                mag = np.abs(np.fft.rfft(segs, axis=1))
                # landmark gate: a band peak only counts if it carries
                # real energy (>= 1% of the frame's global peak) — in
                # noise-floor bands the argmax is int16 quantization
                # noise and flips under a volume re-encode, which would
                # break the invariance the fingerprint exists for
                frame_peak = mag.max(axis=1)
                # constellation: per frame, the argmax bin inside each band
                for band in range(FP_BANDS):
                    lo_e, hi_e = edges[band], min(edges[band + 1], n_bins)
                    if hi_e <= lo_e:
                        continue
                    band_mag = mag[:, lo_e:hi_e]
                    peaks = lo_e + band_mag.argmax(axis=1)
                    strong = band_mag.max(axis=1) >= 0.01 * frame_peak
                    for t in range(n_fr):
                        if not strong[t]:
                            continue
                        for dt in range(1, FP_FAN + 1):
                            if t + dt >= n_fr:
                                break
                            if not strong[t + dt]:
                                continue
                            h = (
                                (band << 40)
                                | (int(peaks[t]) << 24)
                                | (int(peaks[t + dt]) << 8)
                                | dt
                            )
                            out.append((asset_id, h))
            yield pd.DataFrame(out, columns=["asset_id", "fp_hash"])

    auds = assets.filter(F.col("modality") == "audio").select("asset_id", "content")
    return auds.mapInPandas(_fp_batch, FINGERPRINT_SCHEMA)


def rescale_audio(
    assets: DataFrame, gain: float = 0.4, id_offset: int = 0
) -> DataFrame:
    """Re-encode WAV assets at a different volume (REAL PCM rescale +
    re-encode through the stdlib wave writer): the byte stream changes
    completely — exact-hash dedup goes blind — while the spectral peak
    constellation is untouched, which is exactly the invariance
    ``audio_fingerprint`` exists to exploit."""

    def _rescale_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for asset_id, modality, content, meta in zip(
                pdf["asset_id"], pdf["modality"], pdf["content"], pdf["meta"]
            ):
                b = bytes(content)
                if not (b[:4] == b"RIFF" and b[8:12] == b"WAVE"):
                    continue
                with wave.open(io.BytesIO(b)) as w:
                    sr, width, n = w.getframerate(), w.getsampwidth(), w.getnframes()
                    pcm = w.readframes(n)
                if width != 2:
                    continue
                x = np.frombuffer(pcm, dtype="<i2").astype(np.float64)
                y = np.clip(x * gain, -32768, 32767).astype("<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sr)
                    w.writeframes(y.tobytes())
                out.append((asset_id + id_offset, modality, buf.getvalue(), meta))
            yield pd.DataFrame(
                out, columns=["asset_id", "modality", "content", "meta"]
            )

    auds = assets.filter(F.col("modality") == "audio")
    return auds.mapInPandas(_rescale_batch, assets.schema)


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("dhash_bits", T.StringType(), False),
        T.StructField("n_set_bits", T.LongType(), False),
    ]
)

DHASH_GRID = 8  # 8 rows x (8+1) sample columns -> 64 gradient bits


def dhash_from_pixels(px, grid: int = DHASH_GRID) -> tuple[str, int]:
    """64-bit difference-hash from an (h, w, >=3) uint8 pixel array:
    per row, sample ``grid + 1`` luma points nearest-neighbor style at
    (cx·w//(grid+1), cy·h//grid) and set the bit when the left sample's
    BT.601 luma (x1000 int, same scaling as ``ahash_from_pixels``)
    strictly exceeds its right neighbour — the HORIZONTAL-GRADIENT
    fingerprint (dHash): invariant to global brightness/contrast
    shifts that flip ahash bits wholesale, because only the SIGN of
    each local gradient survives. Integer-exact, division-free,
    defined for any image size (narrow images repeat sample columns,
    giving deterministic 0 bits at the duplicates)."""
    h, w = px.shape[0], px.shape[1]
    bits = []
    for cy in range(grid):
        y = cy * h // grid
        row = []
        for cx in range(grid + 1):
            x = cx * w // (grid + 1)
            r, g, b = int(px[y, x, 0]), int(px[y, x, 1]), int(px[y, x, 2])
            row.append(299 * r + 587 * g + 114 * b)
        bits.extend("1" if row[cx] > row[cx + 1] else "0" for cx in range(grid))
    s = "".join(bits)
    return s, s.count("1")


def image_dhash(assets: DataFrame, grid: int = DHASH_GRID) -> DataFrame:
    """Difference-hash fingerprints for every PNG asset — the gradient
    companion to ``image_ahash``, same REAL stdlib decode inside Arrow
    ``mapInPandas``, same shuffle-free narrow-map scale shape, same
    JPEG exclusion (lossy decode is codec-exact but not
    generator-reproducible)."""

    def _dhash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                if b[:8] != b"\x89PNG\r\n\x1a\n":
                    continue
                px = png_decode(b)
                bits, popcount = dhash_from_pixels(px, grid)
                out.append(
                    (int(asset_id), px.shape[1], px.shape[0], bits, popcount)
                )
            yield pd.DataFrame(
                out,
                columns=["asset_id", "width", "height", "dhash_bits", "n_set_bits"],
            )

    imgs = assets.filter(F.col("modality") == "image")
    return imgs.mapInPandas(_dhash_batch, DHASH_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("phash_bits", T.StringType(), False),
        T.StructField("n_set_bits", T.LongType(), False),
    ]
)

PHASH_N = 16  # luma sample grid (N x N) feeding the DCT
PHASH_LOW = 8  # keep the top-left LOW x LOW DCT block (63 AC bits)

# DCT-II basis rows k = 0..7 over t = 0..15, QUANTIZED to integers:
# round(cos(pi * (2t+1) * k / (2N)) * 10^4). The quantized table — not
# libm cos at runtime — IS the definition, embedded verbatim here and
# in the m12 oracle SQL, so the fingerprint is integer-exact and
# engine-independent (libm cos may differ in the last ulp across
# platforms; a table of ints cannot). Magnitudes stay inside int64:
# |C[u][v]| <= max_luma * (sum|B_u|) * (sum|B_v|) <= 2.55e5 * (1.6e5)^2
# = 6.6e15, and the 63-way mean cross-multiplication 63*C vs S adds
# another factor 63 -> 4.2e17, still < 2^63.
PHASH_BASIS: tuple[tuple[int, ...], ...] = (
    (10000, 10000, 10000, 10000, 10000, 10000, 10000, 10000,
     10000, 10000, 10000, 10000, 10000, 10000, 10000, 10000),
    (9952, 9569, 8819, 7730, 6344, 4714, 2903, 980,
     -980, -2903, -4714, -6344, -7730, -8819, -9569, -9952),
    (9808, 8315, 5556, 1951, -1951, -5556, -8315, -9808,
     -9808, -8315, -5556, -1951, 1951, 5556, 8315, 9808),
    (9569, 6344, 980, -4714, -8819, -9952, -7730, -2903,
     2903, 7730, 9952, 8819, 4714, -980, -6344, -9569),
    (9239, 3827, -3827, -9239, -9239, -3827, 3827, 9239,
     9239, 3827, -3827, -9239, -9239, -3827, 3827, 9239),
    (8819, 980, -7730, -9569, -2903, 6344, 9952, 4714,
     -4714, -9952, -6344, 2903, 9569, 7730, -980, -8819),
    (8315, -1951, -9808, -5556, 5556, 9808, 1951, -8315,
     -8315, 1951, 9808, 5556, -5556, -9808, -1951, 8315),
    (7730, -4714, -9569, 980, 9952, 2903, -8819, -6344,
     6344, 8819, -2903, -9952, -980, 9569, 4714, -7730),
)


def phash_from_pixels(px) -> tuple[str, int]:
    """63-bit perceptual DCT hash (pHash) from an (h, w, >=3) uint8
    pixel array, integer-exact end to end:

    1. sample an N x N (16 x 16) luma grid nearest-neighbor style at
       (cx*w//N, cy*h//N), luma = 299R + 587G + 114B (x1000 int — the
       same scaling as ahash/dhash);
    2. 2-D DCT-II restricted to the top-left 8 x 8 block via the
       QUANTIZED integer basis: C = B · L · Bᵀ (all int64);
    3. drop the DC term C[0][0]; bit(u,v) = 1 iff 63·C[u][v] > S where
       S = sum of the 63 AC coefficients (the mean comparison
       cross-multiplied, so no division, no floats — the pHash.org
       "mean of the low block excluding DC" rule made exact).

    Bits are emitted u-major ((0,1), (0,2), .., (7,7)) as a 63-char
    string. Captures the coarse spectral shape, so it survives
    brightness shifts that flip many ahash bits and smooth resampling
    that perturbs point-sampled dhash gradients."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    n = PHASH_N
    lum = np.empty((n, n), dtype=np.int64)
    for cy in range(n):
        y = cy * h // n
        for cx in range(n):
            x = cx * w // n
            lum[cy, cx] = (
                299 * int(px[y, x, 0])
                + 587 * int(px[y, x, 1])
                + 114 * int(px[y, x, 2])
            )
    basis = np.asarray(PHASH_BASIS, dtype=np.int64)  # (8, 16)
    # C[u][v] = sum_{x,y} L[y][x] * B[u][x] * B[v][y]; rows of `lum`
    # are y, columns x, so C = (B @ L.T) @ B.T with exact int64.
    coef = (basis @ lum.T) @ basis.T  # (8, 8), coef[u][v]
    flat = coef.reshape(-1)[1:]  # drop DC, u-major order
    s = int(flat.sum())
    bits = "".join("1" if 63 * int(c) > s else "0" for c in flat)
    return bits, bits.count("1")


def image_phash(assets: DataFrame) -> DataFrame:
    """Perceptual DCT-hash fingerprints for every PNG asset — the
    spectral member of the hash triptych (m07 ahash = global mean,
    m11 dhash = local gradient, m12 phash = low-frequency spectrum).
    Same REAL stdlib PNG decode inside Arrow ``mapInPandas``, same
    shuffle-free narrow-map scale shape (one 63-bit row per image),
    same JPEG exclusion (lossy decode is codec-exact but not
    generator-reproducible)."""

    def _phash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                if b[:8] != b"\x89PNG\r\n\x1a\n":
                    continue
                px = png_decode(b)
                bits, popcount = phash_from_pixels(px)
                out.append(
                    (int(asset_id), px.shape[1], px.shape[0], bits, popcount)
                )
            yield pd.DataFrame(
                out,
                columns=["asset_id", "width", "height", "phash_bits", "n_set_bits"],
            )

    imgs = assets.filter(F.col("modality") == "image")
    return imgs.mapInPandas(_phash_batch, PHASH_SCHEMA)


PIXEL_LUMA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("luma_x1000", T.LongType(), False),
    ]
)


def png_pixel_lumas(assets: DataFrame) -> DataFrame:
    """Per-PIXEL integer luma rows from REAL PNG decode: every PNG
    asset's bytes go through ``png_decode`` (zlib inflate + full filter
    reconstruction) inside Arrow ``mapInPandas`` batches, emitting one
    (asset_id, luma_x1000) row per pixel with luma_x1000 = 299R + 587G
    + 114B — the ITU-R BT.601 weights kept as EXACT integers (x1000)
    so every downstream statistic (histogram bins, entropy terms) is
    engine-reproducible against the generator's closed-form pixels.
    JPEG assets are skipped (lossy decode is codec-exact but not
    generator-reproducible — the m07/image_ahash rule).

    Scale shape: shuffle-free narrow map; the pixel fan-out is bounded
    by image area, and everything after it (histogram groupBy, entropy
    fold) stays JVM-side — the Python stays decode-only."""

    def _luma_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids = []
            lumas = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content)
                if b[:8] != b"\x89PNG\r\n\x1a\n":
                    continue
                px = png_decode(b).astype(np.int64)
                lu = (
                    299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
                ).ravel()
                ids.append(np.full(lu.size, int(asset_id), dtype=np.int64))
                lumas.append(lu)
            if ids:
                yield pd.DataFrame(
                    {
                        "asset_id": np.concatenate(ids),
                        "luma_x1000": np.concatenate(lumas),
                    }
                )
            else:
                yield pd.DataFrame({"asset_id": [], "luma_x1000": []}).astype(
                    {"asset_id": "int64", "luma_x1000": "int64"}
                )

    pngs = assets.filter(F.col("modality") == "image").select("asset_id", "content")
    return pngs.mapInPandas(_luma_batch, PIXEL_LUMA_SCHEMA)
