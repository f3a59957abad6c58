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

INTERFRAME video decodes for real since r09 via Microsoft RLE8
(BI_RLE8, fccHandler 'MRLE' — the classic documented delta codec):
8-bit palettized frames where end-of-line / delta-offset opcodes SKIP
pixels, leaving the previous frame's content in place, so every frame
after the first is a true delta against its predecessor and sampled
decode must replay the chain from frame 0 (``decode_avi_frames`` does
exactly that for RLE8 while MJPEG frames stay independently seekable
— the cost model difference between intra- and interframe codecs,
live in one module). A matching delta-emitting writer
(``encode_avi_rle8``) makes round trips provable — RLE8 is lossless.

Remaining video gates are named: Matroska block codecs and
motion-compensated codecs (H.264 etc.) raise ``NotImplementedError``
at the dispatch, not silent stubs (the MP4 container decodes for real
since r07 — ``mp4.py``, photo-JPEG samples through the same JPEG
codec).

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

import numpy as np


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def _avi_container(
    frames: list[bytes], fps: int, width: int, height: int,
    handler: bytes, strf: bytes,
) -> bytes:
    """Shared RIFF assembly for both writers: headers + 'movi' frames."""
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
        + handler
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
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)


def encode_avi_mjpeg(frames: list[bytes], fps: int, width: int, height: int) -> bytes:
    """Assemble already-encoded JPEG frames into an MJPEG AVI."""
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
    return _avi_container(frames, fps, width, height, b"MJPG", strf)


# ---------------------------------------------------------------------------
# Microsoft RLE8 (BI_RLE8) — the documented interframe delta codec
# ---------------------------------------------------------------------------


def _rle8_encode_frame(
    cur: np.ndarray, prev: np.ndarray | None
) -> bytes:
    """One BI_RLE8 frame, bottom-up DIB row order. ``prev=None`` means
    keyframe (every pixel written); otherwise unchanged rows are
    skipped with bare EOLs and unchanged row prefixes with delta moves
    — the skipped pixels KEEP the previous frame's content, which is
    what makes this an interframe codec."""
    h, w = cur.shape
    out = bytearray()
    # find the last (bottom-up) changed row: everything after it is
    # covered by end-of-bitmap persistence. r13 (guide §4.2): ONE
    # vectorized frame comparison replaces the per-row np.array_equal
    # calls — same rows classified changed/unchanged, byte-identical
    # emission (pinned in tests/test_avi.py).
    if prev is not None:
        neq = cur != prev
        row_changed = neq.any(axis=1)
        ys = np.flatnonzero(row_changed)
        last_dib = (h - 1 - int(ys[0])) if ys.size else -1
    else:
        row_changed = None
        last_dib = h - 1
    for dib_y in range(last_dib + 1):
        y = h - 1 - dib_y
        row = cur[y]
        x = 0
        if prev is not None and not row_changed[y]:
            out += b"\x00\x00"  # EOL: whole row persists
            continue
        if prev is not None:
            # delta-skip the unchanged prefix (opcode 00 02 dx dy)
            diff = np.flatnonzero(neq[y])
            skip = int(diff[0]) if diff.size else 0
            while skip >= 4:  # a delta op costs 4 bytes; skip ≥ 4 wins
                dx = min(skip, 255)
                out += bytes((0, 2, dx, 0))
                x += dx
                skip -= dx
        while x < w:
            run = 1
            while x + run < w and run < 255 and row[x + run] == row[x]:
                run += 1
            if run >= 3 or x + run >= w:
                out += bytes((run, int(row[x])))
                x += run
                continue
            # literal span: collect until a run of >= 3 starts
            lit_start = x
            while x < w and x - lit_start < 254:
                run = 1
                while x + run < w and run < 255 and row[x + run] == row[x]:
                    run += 1
                if run >= 3:
                    break
                x += run
            n = x - lit_start
            if n < 3:  # absolute mode needs n >= 3: emit tiny runs
                for xi in range(lit_start, x):
                    out += bytes((1, int(row[xi])))
                continue
            out += bytes((0, n)) + row[lit_start:x].tobytes()
            if n % 2:
                out += b"\x00"  # absolute runs pad to word boundary
        out += b"\x00\x00"  # EOL
    out += b"\x00\x01"  # end of bitmap: remaining rows persist
    return bytes(out)


def encode_avi_rle8(
    frames: list[np.ndarray], palette: np.ndarray, fps: int
) -> bytes:
    """Encode (h, w) uint8 palette-index frames as a Microsoft RLE8
    AVI: frame 0 is a keyframe, every later frame a delta against its
    predecessor. Lossless, so round trips are exact."""
    if not frames:
        raise ValueError("need at least one frame")
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= 256:
        raise ValueError("palette must be (1..256, 3) uint8")
    h, w = frames[0].shape
    encoded = []
    prev = None
    for f in frames:
        f = np.asarray(f)
        if f.dtype != np.uint8 or f.shape != (h, w):
            raise ValueError("frames must be same-shape (h, w) uint8")
        if f.max(initial=0) >= pal.shape[0]:
            raise ValueError("palette index exceeds palette length")
        encoded.append(_rle8_encode_frame(f, prev))
        prev = f
    ncolors = pal.shape[0]
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        8,  # biBitCount
        struct.pack("<I", 1),  # biCompression = BI_RLE8
        w * h,  # biSizeImage (upper bound)
        0, 0,
        ncolors,  # biClrUsed
        0,
    )
    # RGBQUAD palette: blue, green, red, reserved — one vectorized
    # BGR0 gather instead of a per-entry genexpr (r13; half this
    # muxer's profile was the 256-entry genexpr)
    quad = np.zeros((ncolors, 4), dtype=np.uint8)
    quad[:, 0] = pal[:, 2]
    quad[:, 1] = pal[:, 1]
    quad[:, 2] = pal[:, 0]
    strf += quad.tobytes()
    return _avi_container(encoded, fps, w, h, b"MRLE", strf)


def _rle8_decode_frame(data: bytes, canvas: np.ndarray) -> None:
    """Apply one BI_RLE8 frame IN PLACE over the previous frame's
    canvas (top-down numpy array; DIB rows are bottom-up)."""
    h, w = canvas.shape
    x = 0
    dib_y = 0
    pos = 0
    n = len(data)
    while pos + 2 <= n:
        count, val = data[pos], data[pos + 1]
        pos += 2
        if count > 0:  # run
            if dib_y >= h or x + count > w:
                raise ValueError("corrupt RLE8: run past frame bounds")
            y = h - 1 - dib_y
            canvas[y, x : x + count] = val
            x += count
            continue
        if val == 0:  # end of line
            x = 0
            dib_y += 1
            continue
        if val == 1:  # end of bitmap
            return
        if val == 2:  # delta: skipped pixels persist
            if pos + 2 > n:
                raise ValueError("corrupt RLE8: truncated delta")
            dx, dy = data[pos], data[pos + 1]
            pos += 2
            x += dx
            dib_y += dy
            if x > w or dib_y > h:
                raise ValueError("corrupt RLE8: delta past frame bounds")
            continue
        # absolute mode: val literal bytes, padded to word boundary
        end = pos + val
        if end > n:
            raise ValueError("corrupt RLE8: truncated absolute run")
        if dib_y >= h or x + val > w:
            raise ValueError("corrupt RLE8: absolute run past bounds")
        y = h - 1 - dib_y
        canvas[y, x : x + val] = np.frombuffer(data[pos:end], np.uint8)
        x += val
        pos = end + (val % 2)
    raise ValueError("corrupt RLE8: stream ended without end-of-bitmap")


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
    await_vids_strf = False  # strf follows its stream's strh inside strl

    def walk_list(pos: int, end: int) -> None:
        nonlocal handler, vids_stream, stream_no, await_vids_strf
        for fourcc, body, size in _walk(payload, pos, end):
            if fourcc == b"LIST":
                walk_list(body + 4, body + size)
            elif fourcc == b"strf" and await_vids_strf and size >= 40:
                await_vids_strf = False
                bpp, = struct.unpack_from("<H", payload, body + 14)
                compression = payload[body + 16 : body + 20]
                clr_used, = struct.unpack_from("<I", payload, body + 32)
                info["bits_per_pixel"] = bpp
                info["bi_compression"] = compression
                if struct.unpack("<I", compression)[0] == 1 and bpp == 8:
                    ncolors = clr_used or 256
                    quads = payload[body + 40 : body + 40 + 4 * ncolors]
                    if len(quads) < 4 * ncolors:
                        raise ValueError("truncated AVI: RLE8 palette")
                    q = np.frombuffer(quads, np.uint8).reshape(-1, 4)
                    info["palette"] = q[:, [2, 1, 0]]  # BGR0 -> RGB
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
                    await_vids_strf = True
                    scale, rate = struct.unpack_from(
                        "<II", payload, body + 20
                    )
                    if scale and rate:
                        info["fps"] = rate / scale
                else:
                    await_vids_strf = False
                stream_no += 1
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                chunks.append((fourcc, body, size))

    walk_list(12, len(payload))
    if vids_stream is None:
        raise NotImplementedError(
            "AVI without a 'vids' stream header — cannot validate the "
            "video codec, refusing to decode frames blind"
        )
    if handler in (b"MRLE", b"mrle") or (
        struct.unpack("<I", info.get("bi_compression", b"\xff\xff\xff\xff"))[0]
        == 1
        and info.get("bits_per_pixel") == 8
    ):
        if "palette" not in info:
            raise ValueError("RLE8 AVI without an 8-bit palette strf")
        info["codec"] = "MRLE"
    elif handler in (b"MJPG", b"mjpg"):
        info["codec"] = "MJPG"
    else:
        raise NotImplementedError(
            f"AVI video handler {handler!r} not supported (MJPG and MRLE "
            "decode; motion-compensated codecs are out of scope by design)"
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
    """Decode selected frames (all if None) to uint8 pixel arrays —
    MJPEG frames through the native JPEG codec (each independently
    seekable), RLE8 frames by replaying the delta chain from frame 0
    up to the last requested index (the interframe cost model: a
    sample needs its predecessors). Returns
    (probe_info, [(frame_no, pixels)])."""
    info = probe_avi(payload)
    frames = info["frames"]
    idx = list(range(len(frames))) if frame_indices is None else list(frame_indices)
    for i in idx:
        if not 0 <= i < len(frames):
            raise IndexError(f"frame {i} out of range 0..{len(frames)-1}")
    if info.get("codec") == "MRLE":
        h, w = info["height"], info["width"]
        pal = info["palette"]
        canvas = np.zeros((h, w), dtype=np.uint8)  # index-0 start canvas
        wanted = set(idx)
        decoded: dict[int, np.ndarray] = {}
        for i in range(max(wanted) + 1 if wanted else 0):
            off, size = frames[i]
            _rle8_decode_frame(payload[off : off + size], canvas)
            if i in wanted:
                decoded[i] = pal[canvas]  # palette lookup -> (h, w, 3)
        return info, [(i, decoded[i]) for i in idx]
    from vector_lake_spark.jpeg import decode_jpeg_pixels

    out = []
    for i in idx:
        off, size = frames[i]
        out.append((i, decode_jpeg_pixels(payload[off : off + size])))
    return info, out
