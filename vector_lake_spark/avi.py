"""Minimal RIFF/AVI container codec for MJPEG video — pure stdlib
struct parsing, frames decoded by this repo's own baseline-JPEG codec
(``jpeg.py``), so VIDEO decode is now real end-to-end with zero
external dependencies.

MJPEG-in-AVI is the simplest genuinely-used video format (every frame
is an independent baseline JPEG '00dc' chunk inside the 'movi' LIST —
webcams, capture cards, and OpenCV's default writer all emit it), and
it is exactly the right first video codec here because frame
independence makes distributed frame sampling embarrassingly parallel:
a sampled frame decodes without touching any other frame, unlike
interframe codecs (H.264 etc.) where a sample needs its GOP.

A matching writer (``encode_avi_mjpeg``) exists for the same reason
``jpeg.py`` carries an encoder: exactness becomes provable —
quality-100 constant-color frames round-trip EXACTLY through
container + codec (tests/test_avi.py).

Remaining video gates are named: Matroska and interframe codecs raise
``NotImplementedError`` at the dispatch, not silent stubs (the MP4
container decodes for real since r07 — ``mp4.py``, photo-JPEG samples
through the same JPEG codec).

Layout written/parsed (all little-endian, sizes exclude the 8-byte
chunk header; chunks pad to even length):

    RIFF <sz> 'AVI '
      LIST <sz> 'hdrl'
        'avih' <56>  main header (usec/frame, total frames, w, h, ...)
        LIST <sz> 'strl'
          'strh' <56>  stream header ('vids'/'MJPG', scale, rate, len)
          'strf' <40>  BITMAPINFOHEADER (w, h, 24bpp, 'MJPG')
      LIST <sz> 'movi'
        '00dc' <n> <jpeg bytes> ...
"""

from __future__ import annotations

import struct
from collections.abc import Sequence


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(frames: list[bytes], fps: int, width: int, height: int) -> bytes:
    """Assemble already-encoded JPEG frames into an MJPEG AVI."""
    if not frames:
        raise ValueError("need at least one frame")
    if fps <= 0:
        raise ValueError("fps must be positive")
    usec_per_frame = int(round(1_000_000 / fps))
    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        usec_per_frame,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags — no AVIF_HASINDEX (0x10): we write no idx1 chunk,
        #     so advertising one would break index-trusting readers
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate  (rate/scale = fps)
            0,  # dwStart
            len(frames),  # dwLength
            max_bytes,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality
            0,  # dwSampleSize
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)


def _walk(payload: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) for chunks in [pos, end).
    A declared size past the buffer end raises — a truncated payload
    (partial upload, corrupt object) must fail with a NAMED container
    error at probe time, not a cryptic codec error mid-decode."""
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"truncated AVI: chunk {fourcc!r} declares {size} bytes "
                f"but only {end - body} remain"
            )
        yield fourcc, body, size
        pos = body + size + (size % 2)  # chunks pad to even


def probe_avi(payload: bytes) -> dict:
    """Parse container structure WITHOUT decoding any frame: header
    info + the (offset, length) of every video frame chunk. This is the
    cheap metadata pass a 100 TB pipeline runs first — frame payloads
    are sliced only for the frames a sampler actually selects."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (RIFF/'AVI ' header missing)")
    info: dict = {}
    chunks: list[tuple[bytes, int, int]] = []
    handler = None
    vids_stream = None
    stream_no = 0  # strh chunks appear in stream order

    def walk_list(pos: int, end: int) -> None:
        nonlocal handler, vids_stream, stream_no
        for fourcc, body, size in _walk(payload, pos, end):
            if fourcc == b"LIST":
                walk_list(body + 4, body + size)
            elif fourcc == b"avih" and size >= 56:
                (
                    usec,
                    _mbps,
                    _pad,
                    _flags,
                    total,
                    _init,
                    _streams,
                    _buf,
                    w,
                    h,
                ) = struct.unpack_from("<10I", payload, body)
                info.update(
                    usec_per_frame=usec,
                    total_frames=total,
                    width=w,
                    height=h,
                )
            elif fourcc == b"strh" and size >= 48:
                if (
                    payload[body : body + 4] == b"vids"
                    and vids_stream is None
                ):
                    handler = payload[body + 4 : body + 8]
                    vids_stream = stream_no
                    scale, rate = struct.unpack_from(
                        "<II", payload, body + 20
                    )
                    if scale and rate:
                        info["fps"] = rate / scale
                stream_no += 1
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                chunks.append((fourcc, body, size))

    walk_list(12, len(payload))
    if vids_stream is None:
        raise NotImplementedError(
            "AVI without a 'vids' stream header — cannot validate the "
            "video codec, refusing to decode frames blind"
        )
    if handler not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"AVI video handler {handler!r} not supported (MJPG only — "
            "interframe codecs need their GOP; out of scope by design)"
        )
    # frame table pinned to the VALIDATED video stream only: a second
    # stream's 'NNdc' chunks (audio-in-dc, a second codec) must never
    # interleave into the frame numbering or reach the JPEG decoder
    prefix = b"%02d" % vids_stream
    info["frames"] = [
        (body, size) for fourcc, body, size in chunks
        if fourcc[:2] == prefix
    ]
    if "fps" not in info and info.get("usec_per_frame"):
        info["fps"] = 1_000_000 / info["usec_per_frame"]
    info["n_frames"] = len(info["frames"])
    dur = (
        int(info["n_frames"] * 1000 / info["fps"])
        if info.get("fps")
        else 0
    )
    info["duration_ms"] = dur
    return info


def decode_avi_frames(
    payload: bytes, frame_indices: Sequence[int] | None = None
):
    """Decode selected frames (all if None) to uint8 pixel arrays via
    the native JPEG codec. Returns (probe_info, [(frame_no, pixels)])."""
    from vector_lake_spark.jpeg import decode_jpeg_pixels

    info = probe_avi(payload)
    frames = info["frames"]
    idx = range(len(frames)) if frame_indices is None else frame_indices
    out = []
    for i in idx:
        if not 0 <= i < len(frames):
            raise IndexError(f"frame {i} out of range 0..{len(frames)-1}")
        off, size = frames[i]
        out.append((i, decode_jpeg_pixels(payload[off : off + size])))
    return info, out
