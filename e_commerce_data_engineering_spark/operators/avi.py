"""Minimal MJPEG-in-AVI container codec (stdlib struct only).

Motion-JPEG stores every video frame as an independent baseline JPEG
inside a RIFF/AVI container, so the round-4 JPEG codec
(``operators/jpeg.py``) gives us REAL video pixel decode with zero new
entropy-coding work: this module only reads/writes the container
framing (RIFF chunk walk, ``avih``/``strh``/``strf`` headers, ``movi``
frame chunks, ``idx1`` index) per the public AVI/RIFF layout
(msdn AVIMAINHEADER/AVISTREAMHEADER; RIFF spec).

Anything that is not MJPEG — a different ``strf`` compression fourcc,
a non-AVI RIFF, a truncated chunk — raises ``ValueError`` loudly
(repo convention, cf. non-baseline JPEG): never a silent passthrough.
"""

from __future__ import annotations

import struct

from .jpeg import jpeg_bytes, jpeg_decode


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, data: bytes) -> bytes:
    return _chunk(b"LIST", list_type + data)


def avi_bytes(
    w: int,
    h: int,
    n_frames: int = 4,
    fps: int = 4,
    seed: int = 0,
    quality: int = 90,
) -> bytes:
    """A VALID deterministic MJPEG AVI: ``n_frames`` baseline JPEGs
    (frame i = ``jpeg_bytes(w, h, seed + i)``) in ``00dc`` chunks with
    a conforming header pair and ``idx1`` index."""
    frames = [jpeg_bytes(w, h, seed + i, quality=quality) for i in range(n_frames)]
    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n_frames,
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids",
        b"MJPG",
        0,  # dwFlags
        0,  # wPriority
        0,  # wLanguage
        0,  # dwInitialFrames
        1,  # dwScale
        fps,  # dwRate (fps = rate/scale)
        0,  # dwStart
        n_frames,  # dwLength
        max_bytes,  # dwSuggestedBufferSize
        0xFFFFFFFF,  # dwQuality (-1: default)
        0,  # dwSampleSize (0: variable-size frames)
        0, 0, w, h,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        w * h * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks = [_chunk(b"00dc", f) for f in frames]
    movi = _list(b"movi", b"".join(movi_chunks))
    # idx1 offsets are relative to the start of the 'movi' list type
    idx_entries, off = [], 4
    for i, f in enumerate(frames):
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def avi_parse(b: bytes) -> dict:
    """Container-level parse → ``{width, height, scale, rate, n_frames,
    duration_ms, frames}`` with ``frames`` the raw JPEG byte payloads
    in stream order. Raises ``ValueError`` for non-AVI bytes, a
    non-MJPEG video stream, or truncated chunks."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    width = height = None
    scale, rate = 1, 0
    handler = compression = None
    in_video_stream = False
    frames: list[bytes] = []

    def walk(data: bytes, pos: int, end: int) -> None:
        nonlocal width, height, scale, rate, handler, compression, in_video_stream
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            if body_start + size > end:
                raise ValueError(f"truncated AVI chunk {fourcc!r}")
            if fourcc == b"LIST":
                list_type = data[body_start : body_start + 4]
                if list_type in (b"hdrl", b"strl", b"movi"):
                    walk(data, body_start + 4, body_start + size)
            elif fourcc == b"avih":
                width, height = struct.unpack(
                    "<II", data[body_start + 32 : body_start + 40]
                )
            elif fourcc == b"strh":
                # the following strf belongs to THIS stream: only the
                # 'vids' stream's format block names the video codec
                # (an audio-first AVI must not satisfy the MJPG check)
                in_video_stream = data[body_start : body_start + 4] == b"vids"
                if in_video_stream:
                    handler = data[body_start + 4 : body_start + 8]
                    scale, rate = struct.unpack(
                        "<II", data[body_start + 20 : body_start + 28]
                    )
            elif fourcc == b"strf" and in_video_stream and size >= 20:
                compression = data[body_start + 16 : body_start + 20]
            elif fourcc in (b"00dc", b"00db"):
                frames.append(data[body_start : body_start + size])
            pos = body_start + size + (size % 2)

    walk(b, 12, len(b))
    # strf's biCompression is authoritative when present: a stream whose
    # strh handler says MJPG but whose format block names another codec
    # must fail HERE, not later inside jpeg_decode. The strh handler
    # fourcc is only a fallback for AVIs with a missing/short strf.
    codec_ok = compression == b"MJPG" if compression is not None else handler == b"MJPG"
    if not codec_ok:
        raise ValueError(
            f"unsupported video codec {compression!r}/{handler!r}: only MJPEG "
            "streams decode here (no entropy codec exists for others)"
        )
    if not frames:
        raise ValueError("AVI has no video frame chunks")
    if not rate:
        raise ValueError("AVI stream header missing frame rate")
    return {
        "width": width,
        "height": height,
        "scale": scale,
        "rate": rate,
        "n_frames": len(frames),
        "duration_ms": len(frames) * 1000 * scale // rate,
        "frames": frames,
    }


def avi_frame_ms(info: dict, idx: int) -> int:
    """Presentation timestamp (ms) of frame ``idx``."""
    return idx * 1000 * info["scale"] // info["rate"]


def avi_decode_frame(info: dict, idx: int):
    """REAL pixel decode of frame ``idx`` → (h, w, 3) uint8 RGB via the
    baseline-JPEG codec. Raises for non-baseline frame streams."""
    return jpeg_decode(info["frames"][idx])
