"""WebP container — probe, lossless decode dispatch, and animation.

The RIFF/WebP layer: header probes for all three variants, the
extended-container (VP8X) chunk walk, and ANIM/ANMF animation mux +
composition. The VP8L entropy codec itself lives in ``vp8l.py`` (r08 —
lossless WebP decodes for real); lossy VP8 (a boolean-coder intra
video frame + loop filter) remains a named gate.

Header layouts (public spec):

- ``VP8 `` (lossy): 3-byte frame tag, 0x9D012A start code, then two
  little-endian 14-bit dimensions.
- ``VP8L`` (lossless): 0x2F signature byte, then 14-bit width-1 and
  14-bit height-1 packed LSB-first, 1 alpha bit, 3 version bits.
- ``VP8X`` (extended): feature flags byte + 24-bit canvas width-1 /
  height-1; animations carry ANIM (background + loop count) and one
  ANMF per frame (halved 24-bit offsets, dims-1, duration,
  blend/dispose flags, then the frame's own image chunks).

``probe_webp`` reports (format, width, height, has_alpha, animated,
n_frames) touching only chunk headers; ``decode_webp`` decodes VP8L
(simple, VP8X-wrapped, or the first composed animation frame) and
gates VP8 by name. ``decode_webp_frames`` composes animation frames
per spec (both blending methods, dispose-to-background). The probe
also rides ``multimodal._decode_image``'s dispatch so a lossy WebP
fails with its REAL identity named instead of "unrecognized".
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
            "n_frames": 1,
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
            "n_frames": 1,
        }
    if fourcc == b"VP8X":  # extended: flags + 24-bit canvas dims
        if len(payload) < body + 10:
            raise ValueError("corrupt WebP: truncated VP8X header")
        flags = payload[body]
        w = int.from_bytes(payload[body + 4 : body + 7], "little") + 1
        h = int.from_bytes(payload[body + 7 : body + 10], "little") + 1
        n_frames = 1
        if flags & 0x02:  # count ANMF chunk headers; no entropy read
            n_frames = sum(
                1 for fc, _, _ in walk_webp_chunks(payload) if fc == b"ANMF"
            )
        return {
            "format": "vp8x",
            "width": w,
            "height": h,
            "has_alpha": bool(flags & 0x10),
            "animated": bool(flags & 0x02),
            "n_frames": n_frames,
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
    transform inversion in ``vp8l.py`` (r08) — as a simple-format file,
    wrapped in an extended (VP8X) container (the chunk walk finds the
    VP8L still), or ANIMATED with VP8L frames (stats over the first
    COMPOSED frame, the `decode_gif` stance). Lossy VP8 (a boolean-
    coder intra video frame + loop filter) stays gated by name."""
    from vector_lake_spark.vp8l import decode_vp8l

    info = probe_webp(payload)
    px = None
    if info["format"] == "vp8x" and info["animated"]:
        _, frames = decode_webp_frames(payload, [0])
        px = frames[0][1]
    elif info["format"] in ("vp8l", "vp8x"):
        for fourcc, s, e in walk_webp_chunks(payload):
            if fourcc == b"VP8L":
                px = decode_vp8l(payload[s:e])["pixels"]
                break
    if px is not None:
        px = px.astype(np.float64)
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


# ---------------------------------------------------------------------------
# Animated WebP (VP8X + ANIM/ANMF) — lossless frames compose for real
# ---------------------------------------------------------------------------


def _u24(v: int) -> bytes:
    return int(v).to_bytes(3, "little")


def encode_webp_animation(
    frames,
    durations,
    *,
    offsets=None,
    blends=None,
    disposals=None,
    bg=(255, 255, 255, 255),
    loop=0,
    canvas_size=None,
) -> bytes:
    """Assemble (h, w, 3|4) uint8 RGBA frames into an animated WebP
    (VP8X + ANIM + one ANMF per frame, each carrying a real VP8L
    lossless stream). ``offsets`` are (x, y) canvas positions and must
    be even (the ANMF fields store them halved); ``blends[i]`` True
    means alpha-blend onto the canvas (ANMF B=0), False overwrite;
    ``disposals[i]`` True means dispose-to-background after the frame.
    ``bg`` is the ANIM background color as (r, g, b, a). Counterpart of
    ``encode_mkv_mjpeg``/``encode_gif`` for animation-oracle entries;
    not a general-purpose muxer."""
    import numpy as np

    from vector_lake_spark.vp8l import encode_vp8l

    n = len(frames)
    if n == 0:
        raise ValueError("need at least one frame")
    offsets = offsets or [(0, 0)] * n
    blends = [True] * n if blends is None else blends
    disposals = [False] * n if disposals is None else disposals
    for name, seq in [
        ("durations", durations), ("offsets", offsets),
        ("blends", blends), ("disposals", disposals),
    ]:
        if len(seq) != n:  # zip() would silently drop frames
            raise ValueError(
                f"{name} has {len(seq)} entries for {n} frames"
            )
    if canvas_size is None:
        cw = max(x + np.asarray(f).shape[1] for (x, _), f in zip(offsets, frames))
        ch_ = max(y + np.asarray(f).shape[0] for (_, y), f in zip(offsets, frames))
    else:
        cw, ch_ = canvas_size

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        out = fourcc + struct.pack("<I", len(body)) + body
        return out + (b"\x00" if len(body) % 2 else b"")

    anmf = b""
    any_alpha = False
    for f, d, (x, y), blend, disp in zip(
        frames, durations, offsets, blends, disposals
    ):
        f = np.asarray(f, dtype=np.uint8)
        fh, fw = f.shape[:2]
        if f.ndim == 3 and f.shape[2] == 4 and bool((f[:, :, 3] != 255).any()):
            any_alpha = True
        if x % 2 or y % 2:
            raise ValueError("ANMF frame offsets must be even (stored /2)")
        if x + fw > cw or y + fh > ch_:
            raise ValueError("frame rectangle exceeds the canvas")
        flags = (0 if blend else 0x02) | (0x01 if disp else 0)
        body = (
            _u24(x // 2) + _u24(y // 2) + _u24(fw - 1) + _u24(fh - 1)
            + _u24(d) + bytes([flags])
            + chunk(b"VP8L", encode_vp8l(f))
        )
        anmf += chunk(b"ANMF", body)
    vp8x_flags = 0x02 | (0x10 if any_alpha else 0)  # spec: set when any
    # frame carries transparency, so probe-based routing sees it
    vp8x = bytes([vp8x_flags]) + b"\x00\x00\x00" + _u24(cw - 1) + _u24(ch_ - 1)
    r, g, b, a = bg
    anim = bytes([b, g, r, a]) + struct.pack("<H", loop)
    body = b"WEBP" + chunk(b"VP8X", vp8x) + chunk(b"ANIM", anim) + anmf
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_webp_frames(payload: bytes, frame_indices=None):
    """Decode an animated WebP's frames to composed (h, w, 4) uint8
    RGBA canvases, honoring ANMF placement, the two blending methods
    (alpha-blend / overwrite) and the two disposal methods (none /
    dispose-to-ANIM-background). Like GIF, frames are deltas against
    the canvas: decoding frame k composes frames 0..k, skipping only
    the OUTPUT of unsampled frames. Fractional alpha blending follows
    the spec formula with round-half-up to integers. Non-animated
    files return their single still as frame 0. Lossy (VP8) frame
    payloads gate by name; VP8L frames decode for real."""
    import numpy as np

    from vector_lake_spark.vp8l import decode_vp8l

    info = probe_webp(payload)
    if info["format"] != "vp8x" or not info["animated"]:
        # one decode, not decode_webp-for-stats plus a second for pixels
        px = None
        for fourcc, s, e in walk_webp_chunks(payload):
            if fourcc == b"VP8L":
                px = decode_vp8l(payload[s:e])["pixels"]
                break
        if px is None:
            raise NotImplementedError(
                f"WebP still frame undecodable ({info['format']}, "
                f"{info['width']}x{info['height']}) — only VP8L stills "
                f"decode natively"
            )
        meta = {
            "width": int(px.shape[1]), "height": int(px.shape[0]),
            "n_frames": 1, "loop_count": 0,
        }
        want = {0} if frame_indices is None else set(frame_indices)
        if want - {0}:
            raise IndexError("still image has only frame 0")
        return meta, [(0, px)]
    cw, ch_ = info["width"], info["height"]
    bg = np.zeros(4, dtype=np.uint8)
    loop = 0
    anmf = []
    for fourcc, s, e in walk_webp_chunks(payload):
        if fourcc == b"ANIM":
            b_, g_, r_, a_ = payload[s : s + 4]
            bg = np.array([r_, g_, b_, a_], dtype=np.uint8)
            loop = int.from_bytes(payload[s + 4 : s + 6], "little")
        elif fourcc == b"ANMF":
            anmf.append((s, e))
    n = len(anmf)
    if n == 0:
        # keeps the module's corrupt-input contract: _decode_image
        # dispatch expects ValueError/NotImplementedError, never a bare
        # IndexError from frames[0] downstream (r08 advice)
        raise ValueError("corrupt WebP: animated file with no ANMF frames")
    want = set(range(n)) if frame_indices is None else set(frame_indices)
    for i in want:
        if not 0 <= i < n:
            raise IndexError(f"frame {i} out of range 0..{n - 1}")
    canvas = np.zeros((ch_, cw, 4), dtype=np.uint8)
    out = []
    last_wanted = max(want) if want else -1
    for i, (s, e) in enumerate(anmf):
        if i > last_wanted:
            break  # later frames can never affect earlier canvases
        if e - s < 16:
            raise ValueError("corrupt WebP: truncated ANMF header")
        x = int.from_bytes(payload[s : s + 3], "little") * 2
        y = int.from_bytes(payload[s + 3 : s + 6], "little") * 2
        fw = int.from_bytes(payload[s + 6 : s + 9], "little") + 1
        fh = int.from_bytes(payload[s + 9 : s + 12], "little") + 1
        flags = payload[s + 15]
        blend = not (flags & 0x02)
        dispose_bg = bool(flags & 0x01)
        if x + fw > cw or y + fh > ch_:
            raise ValueError("corrupt WebP: ANMF rectangle exceeds canvas")
        frame_px = None
        for fourcc, fs, fe in walk_webp_chunks(
            b"RIFF\x00\x00\x00\x00WEBP" + payload[s + 16 : e]
        ):
            if fourcc == b"VP8L":
                sub = payload[s + 16 + fs - 12 : s + 16 + fe - 12]
                frame_px = decode_vp8l(sub)["pixels"]
            elif fourcc == b"VP8 ":
                raise NotImplementedError(
                    "animated WebP frame uses lossy VP8 — only VP8L "
                    "frames decode natively"
                )
        if frame_px is None:
            raise ValueError("corrupt WebP: ANMF without image data")
        if frame_px.shape[:2] != (fh, fw):
            raise ValueError(
                "corrupt WebP: ANMF dims disagree with the VP8L stream"
            )
        region = canvas[y : y + fh, x : x + fw].astype(np.float64)
        src = frame_px.astype(np.float64)
        if blend:
            a_s = src[:, :, 3:4] / 255.0
            a_d = region[:, :, 3:4] / 255.0
            a_o = a_s + a_d * (1.0 - a_s)
            rgb = np.where(
                a_o > 0,
                (src[:, :, :3] * a_s + region[:, :, :3] * a_d * (1.0 - a_s))
                / np.where(a_o > 0, a_o, 1.0),
                0.0,
            )
            composed = np.concatenate([rgb, a_o * 255.0], axis=2)
            canvas[y : y + fh, x : x + fw] = np.floor(composed + 0.5).astype(
                np.uint8
            )
        else:
            canvas[y : y + fh, x : x + fw] = frame_px
        if i in want:
            out.append((i, canvas.copy()))
        if dispose_bg:
            canvas[y : y + fh, x : x + fw] = bg
    meta = {
        "width": cw, "height": ch_, "n_frames": n, "loop_count": loop,
        "background": tuple(int(v) for v in bg),
    }
    return meta, out
