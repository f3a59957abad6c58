"""WebP metadata probe — pure stdlib parsing of the public RIFF/WebP
container and the VP8 / VP8L / VP8X header layouts.

WebP is the most common image format this repo does not decode (its
payloads are VP8 intra frames / VP8L entropy streams — real codec work,
gated by name like the other interframe formats). What a 100 TB crawl
pipeline needs FIRST is the metadata pass, and that is fully
spec-implementable in a few header reads:

- ``VP8 `` (lossy): 3-byte frame tag, 0x9D012A start code, then two
  little-endian 14-bit dimensions.
- ``VP8L`` (lossless): 0x2F signature byte, then 14-bit width-1 and
  14-bit height-1 packed LSB-first, 1 alpha bit, 3 version bits.
- ``VP8X`` (extended): feature flags byte + 24-bit canvas width-1 /
  height-1 (animation/EXIF/alpha flags reported).

``probe_webp`` reports (format, width, height, has_alpha, animated)
without touching entropy data; ``decode_webp`` raises by name. The
probe also rides ``multimodal._decode_image``'s gate so an unrecognized
WebP fails with its REAL identity named instead of "unrecognized".
"""

from __future__ import annotations

import struct

import numpy as np


def is_webp(payload: bytes) -> bool:
    return (
        len(payload) >= 16
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WEBP"
    )


def probe_webp(payload: bytes) -> dict:
    """Header-only metadata: variant, canvas dimensions, alpha/animation
    flags. No entropy data is read."""
    if not is_webp(payload):
        raise ValueError("not a WebP payload (RIFF....WEBP header missing)")
    fourcc = payload[12:16]
    body = 20
    if fourcc == b"VP8 ":  # lossy: frame tag + start code + 14-bit dims
        if len(payload) < body + 10:
            raise ValueError("corrupt WebP: truncated VP8 header")
        if payload[body + 3 : body + 6] != b"\x9d\x01\x2a":
            raise ValueError("corrupt WebP: VP8 start code missing")
        w_raw, h_raw = struct.unpack_from("<HH", payload, body + 6)
        return {
            "format": "vp8",
            "width": w_raw & 0x3FFF,
            "height": h_raw & 0x3FFF,
            "has_alpha": False,
            "animated": False,
        }
    if fourcc == b"VP8L":  # lossless: sig + packed 14-bit dims
        if len(payload) < body + 5:
            raise ValueError("corrupt WebP: truncated VP8L header")
        if payload[body] != 0x2F:
            raise ValueError("corrupt WebP: VP8L signature missing")
        bits = int.from_bytes(payload[body + 1 : body + 5], "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        alpha = bool((bits >> 28) & 1)
        return {
            "format": "vp8l",
            "width": w,
            "height": h,
            "has_alpha": alpha,
            "animated": False,
        }
    if fourcc == b"VP8X":  # extended: flags + 24-bit canvas dims
        if len(payload) < body + 10:
            raise ValueError("corrupt WebP: truncated VP8X header")
        flags = payload[body]
        w = int.from_bytes(payload[body + 4 : body + 7], "little") + 1
        h = int.from_bytes(payload[body + 7 : body + 10], "little") + 1
        return {
            "format": "vp8x",
            "width": w,
            "height": h,
            "has_alpha": bool(flags & 0x10),
            "animated": bool(flags & 0x02),
        }
    raise ValueError(f"corrupt WebP: unknown first chunk {fourcc!r}")


def walk_webp_chunks(payload: bytes):
    """Yield (fourcc, body_start, body_end) for every RIFF chunk after
    the WEBP form type — the extended-format (VP8X) chunk sequence
    walk: ICCP/ANIM/ANMF/ALPH/VP8 /VP8L/EXIF/XMP in file order."""
    if not is_webp(payload):
        raise ValueError("not a WebP payload (RIFF....WEBP header missing)")
    pos = 12
    end = len(payload)
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"corrupt WebP: chunk {fourcc!r} overruns the container"
            )
        yield fourcc, body, body + size
        pos = body + size + (size & 1)  # chunks pad to even offsets


def decode_webp(payload: bytes) -> dict:
    """Stats-shaped decode (the ``multimodal._decode_image`` contract).

    LOSSLESS WebP (VP8L) decodes for real — full prefix-code + LZ77 +
    transform inversion in ``vp8l.py`` (r08) — both as a simple-format
    file and wrapped in an extended (VP8X) container (the chunk walk
    finds the VP8L still). Lossy VP8 (a boolean-coder intra video
    frame + loop filter) and VP8X animations (ANIM/ANMF frame
    composition) stay gated by name."""
    from vector_lake_spark.vp8l import decode_vp8l

    info = probe_webp(payload)
    chunk = None
    if info["format"] == "vp8l":
        for fourcc, s, e in walk_webp_chunks(payload):
            if fourcc == b"VP8L":
                chunk = payload[s:e]
                break
    elif info["format"] == "vp8x":
        if info["animated"]:
            raise NotImplementedError(
                f"WebP animation decode unsupported (vp8x/ANIM, "
                f"{info['width']}x{info['height']}) — ANMF frame "
                f"composition is gated; the probe reads the canvas "
                f"metadata"
            )
        for fourcc, s, e in walk_webp_chunks(payload):
            if fourcc == b"VP8L":
                chunk = payload[s:e]
                break
    if chunk is not None:
        px = decode_vp8l(chunk)["pixels"].astype(np.float64)
        h, w = px.shape[:2]
        return {
            "width": int(w),
            "height": int(h),
            "mean_r": round(float(px[:, :, 0].mean()), 6),
            "mean_g": round(float(px[:, :, 1].mean()), 6),
            "mean_b": round(float(px[:, :, 2].mean()), 6),
        }
    raise NotImplementedError(
        f"WebP pixel decode unsupported ({info['format']}, "
        f"{info['width']}x{info['height']}) — lossless VP8L decodes "
        f"natively (vp8l.py), simple or VP8X-wrapped; VP8 needs a "
        f"boolean-coder intra decoder; the metadata probe (probe_webp) "
        f"reads all three"
    )
