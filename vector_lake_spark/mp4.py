"""ISO base media file format (MP4/QuickTime) container codec — pure
stdlib struct parsing, following the public ISO/IEC 14496-12 box layout.

The container arc so far is RIFF/AVI (``avi.py``); MP4 is the container
the other 95% of crawled video ships in, so a 100 TB pipeline needs at
minimum the METADATA pass over it: brand, duration, per-track codec
fourcc, dimensions, sample count — enough to route, filter, and budget
without touching sample data. ``probe_mp4`` is exactly that: a box walk
(ftyp / moov / mvhd / trak / tkhd / mdia / mdhd / hdlr / stbl with the
full sample-table math — stsd, stts, stsc, stsz, stco/co64) that never
reads a byte of ``mdat`` beyond computing offsets into it.

DECODE is real for one codec: motion-JPEG samples (QuickTime
photo-JPEG, sample-entry fourcc ``jpeg`` — what ffmpeg's ``-c:v
mjpeg -f mp4`` emits), where every sample is an independent baseline
JPEG handed to this repo's own decoder (``jpeg.py``). Frame
independence keeps distributed sampling embarrassingly parallel, same
as MJPEG-AVI. Interframe codecs (``avc1``/``hev1``/``vp09``) and audio
raise ``NotImplementedError`` BY NAME at the dispatch — an honest gate,
not a silent stub: H.264 entropy decode is out of scope, the container
math here is not.

A matching muxer (``encode_mp4_mjpeg``) exists for the same reason
``jpeg.py`` and ``avi.py`` carry encoders: exactness becomes provable —
quality-100 constant frames round-trip EXACTLY through container +
codec, and the sample-table math (stsc chunk grouping, co64, stts
timing) is pinned against hand-assembled spec-derived boxes in
tests/test_mp4.py rather than only against this muxer's output.

Box layout notes (all sizes big-endian; a size of 1 means a 64-bit
largesize follows the type; 0 means "to end of enclosing box"):

    ftyp                      major/minor brand + compatibles
    mdat                      concatenated sample bytes
    moov
      mvhd                    movie timescale + duration
      trak
        tkhd                  track id, 16.16 fixed-point w/h
        mdia
          mdhd                media timescale + duration + language
          hdlr                handler type ('vide'/'soun')
          minf > stbl
            stsd              sample entries (codec fourcc, w, h)
            stts              (count, delta) run-length sample timing
            stsc              chunk → samples-per-chunk runs
            stsz              per-sample sizes (or uniform)
            stco / co64       chunk offsets (32 / 64 bit)

At 100 TB both probe and decode run inside the same Arrow
``mapInPandas`` operator shape as every other codec here: payloads are
an opaque binary column, the scan projects (media_id, payload), and
only sampled frames are ever entropy-decoded.
"""

from __future__ import annotations

import struct
from collections.abc import Sequence

import numpy as np

FTYP_MAGIC = b"ftyp"


def is_mp4(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[4:8] == FTYP_MAGIC


# ---------------------------------------------------------------------------
# Box walk
# ---------------------------------------------------------------------------


def _boxes(payload: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [pos, end)."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError("corrupt MP4: truncated box header")
        size, fourcc = struct.unpack_from(">I4s", payload, pos)
        hdr = 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", payload, pos + 8)
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(
                f"corrupt MP4: box {fourcc!r} size {size} overruns container"
            )
        yield fourcc, pos + hdr, pos + size
        pos += size


def _find(payload: bytes, pos: int, end: int, fourcc: bytes):
    for fc, s, e in _boxes(payload, pos, end):
        if fc == fourcc:
            return s, e
    return None


def _require(payload: bytes, pos: int, end: int, fourcc: bytes):
    """_find, but a missing box is a named ValueError — the module's
    corrupt-input contract — instead of a TypeError at the call site."""
    found = _find(payload, pos, end, fourcc)
    if found is None:
        raise ValueError(
            f"corrupt MP4: no {fourcc.decode('latin-1')} box"
        )
    return found


def _full_box(payload: bytes, pos: int) -> tuple[int, int]:
    """(version, flags) of a full box; body fields start at pos+4."""
    v = payload[pos]
    flags = int.from_bytes(payload[pos + 1 : pos + 4], "big")
    return v, flags


def _parse_mvhd(payload: bytes, s: int) -> tuple[int, int]:
    v, _ = _full_box(payload, s)
    if v == 1:
        timescale, duration = struct.unpack_from(">IQ", payload, s + 4 + 16)
    else:
        timescale, duration = struct.unpack_from(">II", payload, s + 4 + 8)
    return timescale, duration


def _parse_tkhd(payload: bytes, s: int) -> tuple[int, float, float]:
    v, _ = _full_box(payload, s)
    if v == 1:
        (track_id,) = struct.unpack_from(">I", payload, s + 4 + 16)
        rest = s + 4 + 16 + 4 + 4 + 8
    else:
        (track_id,) = struct.unpack_from(">I", payload, s + 4 + 8)
        rest = s + 4 + 8 + 4 + 4 + 4
    # rest → 2x16 reserved? layout: after duration: 8 reserved, 2 layer,
    # 2 alt group, 2 volume, 2 reserved, 36 matrix, 4 width, 4 height
    wh = rest + 8 + 2 + 2 + 2 + 2 + 36
    w, h = struct.unpack_from(">II", payload, wh)
    return track_id, w / 65536.0, h / 65536.0


def _parse_mdhd(payload: bytes, s: int) -> tuple[int, int, str]:
    v, _ = _full_box(payload, s)
    if v == 1:
        timescale, duration = struct.unpack_from(">IQ", payload, s + 4 + 16)
        lang_off = s + 4 + 16 + 4 + 8
    else:
        timescale, duration = struct.unpack_from(">II", payload, s + 4 + 8)
        lang_off = s + 4 + 8 + 4 + 4
    (packed,) = struct.unpack_from(">H", payload, lang_off)
    lang = "".join(chr(((packed >> sh) & 0x1F) + 0x60) for sh in (10, 5, 0))
    return timescale, duration, lang


def _parse_stts(payload: bytes, s: int) -> list[tuple[int, int]]:
    (n,) = struct.unpack_from(">I", payload, s + 4)
    return [
        struct.unpack_from(">II", payload, s + 8 + 8 * i) for i in range(n)
    ]


def _parse_stsc(payload: bytes, s: int) -> list[tuple[int, int, int]]:
    (n,) = struct.unpack_from(">I", payload, s + 4)
    return [
        struct.unpack_from(">III", payload, s + 8 + 12 * i) for i in range(n)
    ]


def _parse_stsz(payload: bytes, s: int) -> list[int]:
    uniform, n = struct.unpack_from(">II", payload, s + 4)
    if uniform:
        return [uniform] * n
    return list(struct.unpack_from(f">{n}I", payload, s + 12))


def _parse_stco(payload: bytes, s: int, wide: bool) -> list[int]:
    (n,) = struct.unpack_from(">I", payload, s + 4)
    fmt = ">%d%s" % (n, "Q" if wide else "I")
    return list(struct.unpack_from(fmt, payload, s + 8))


def _parse_stsd(payload: bytes, s: int, visual: bool) -> tuple[str, int, int]:
    """First sample entry: (codec fourcc, width, height) — width/height
    are 0 for non-visual entries. The w/h offsets are only meaningful
    for a VisualSampleEntry, so the handler gate is explicit: an
    AudioSampleEntry is exactly 36 bytes and its bytes at the visual
    w/h offsets are the 16.16 samplerate halves (r07 review)."""
    (n,) = struct.unpack_from(">I", payload, s + 4)
    if n < 1:
        raise ValueError("corrupt MP4: empty stsd")
    entry = s + 8
    size, fourcc = struct.unpack_from(">I4s", payload, entry)
    codec = fourcc.decode("latin-1")
    w = h = 0
    if visual and size >= 86:  # VisualSampleEntry minimum
        w, h = struct.unpack_from(">HH", payload, entry + 8 + 8 + 16)
    return codec, w, h


def _sample_table(
    sizes: list[int],
    chunk_offsets: list[int],
    stsc: list[tuple[int, int, int]],
) -> list[tuple[int, int]]:
    """Resolve stsz/stsc/stco into per-sample (offset, size) — the core
    sample-table math of 14496-12 §8.7: stsc runs say how many samples
    each chunk holds; samples are contiguous within a chunk."""
    out: list[tuple[int, int]] = []
    si = 0
    n_chunks = len(chunk_offsets)
    for run_idx, (first_chunk, per_chunk, _desc) in enumerate(stsc):
        last_chunk = (
            stsc[run_idx + 1][0] - 1 if run_idx + 1 < len(stsc) else n_chunks
        )
        for c in range(first_chunk, last_chunk + 1):
            off = chunk_offsets[c - 1]
            for _ in range(per_chunk):
                if si >= len(sizes):
                    return out
                out.append((off, sizes[si]))
                off += sizes[si]
                si += 1
    if si != len(sizes):
        raise ValueError(
            f"corrupt MP4: sample table resolves {si} of {len(sizes)} samples"
        )
    return out


def probe_mp4(payload: bytes) -> dict:
    """Container metadata WITHOUT touching sample data: brand, movie
    duration, per-track codec/dims/timing and the resolved per-sample
    (offset, size) table. The cheap first pass of a media pipeline."""
    if not is_mp4(payload):
        raise ValueError("not an MP4 payload ('ftyp' box missing)")
    end = len(payload)
    fs, fe = _require(payload, 0, end, b"ftyp")
    brand = payload[fs : fs + 4].decode("latin-1")
    compat = [
        payload[i : i + 4].decode("latin-1") for i in range(fs + 8, fe, 4)
    ]
    ms, me = _require(payload, 0, end, b"moov")
    mvhd = _require(payload, ms, me, b"mvhd")
    timescale, duration = _parse_mvhd(payload, mvhd[0])
    tracks = []
    for fc, ts_, te_ in _boxes(payload, ms, me):
        if fc != b"trak":
            continue
        tkhd = _require(payload, ts_, te_, b"tkhd")
        track_id, tw, th = _parse_tkhd(payload, tkhd[0])
        mdia = _require(payload, ts_, te_, b"mdia")
        mdhd = _require(payload, mdia[0], mdia[1], b"mdhd")
        m_timescale, m_duration, lang = _parse_mdhd(payload, mdhd[0])
        hdlr = _require(payload, mdia[0], mdia[1], b"hdlr")
        handler = payload[hdlr[0] + 8 : hdlr[0] + 12].decode("latin-1")
        minf = _require(payload, mdia[0], mdia[1], b"minf")
        stbl = _require(payload, minf[0], minf[1], b"stbl")
        stsd = _require(payload, stbl[0], stbl[1], b"stsd")
        codec, cw, ch = _parse_stsd(payload, stsd[0], handler == "vide")
        stsz = _require(payload, stbl[0], stbl[1], b"stsz")
        sizes = _parse_stsz(payload, stsz[0])
        stco = _find(payload, stbl[0], stbl[1], b"stco")
        wide = False
        if stco is None:
            stco = _find(payload, stbl[0], stbl[1], b"co64")
            wide = True
        offsets = _parse_stco(payload, stco[0], wide) if stco else []
        stsc = _find(payload, stbl[0], stbl[1], b"stsc")
        runs = _parse_stsc(payload, stsc[0]) if stsc else []
        stts = _find(payload, stbl[0], stbl[1], b"stts")
        timing = _parse_stts(payload, stts[0]) if stts else []
        samples = _sample_table(sizes, offsets, runs)
        tracks.append(
            {
                "track_id": track_id,
                "handler": handler,
                "codec": codec,
                "width": int(cw or tw),
                "height": int(ch or th),
                "timescale": m_timescale,
                "duration_ms": (
                    int(m_duration * 1000 // m_timescale)
                    if m_timescale
                    else 0
                ),
                "language": lang,
                "n_samples": len(sizes),
                "timing": timing,
                "samples": samples,
            }
        )
    return {
        "brand": brand,
        "compatible_brands": compat,
        "timescale": timescale,
        "duration_ms": int(duration * 1000 // timescale) if timescale else 0,
        "n_tracks": len(tracks),
        "tracks": tracks,
    }


# ---------------------------------------------------------------------------
# Decode (photo-JPEG samples only — everything else gates by name)
# ---------------------------------------------------------------------------

_DECODABLE = {"jpeg", "mjpa"}


def decode_mp4_frames(
    payload: bytes, frame_indices: Sequence[int] | None = None
) -> tuple[dict, list[tuple[int, np.ndarray]]]:
    """Decode selected video frames of a photo-JPEG MP4 to (h, w[, 3])
    uint8 arrays via the repo's own baseline-JPEG codec. Samples are
    independent, so ONLY the requested frames' bytes are entropy-decoded
    (the distributed-sampling contract shared with ``avi.py``)."""
    from vector_lake_spark.jpeg import decode_jpeg_pixels

    info = probe_mp4(payload)
    video = [t for t in info["tracks"] if t["handler"] == "vide"]
    if not video:
        raise ValueError("MP4 has no video track")
    track = video[0]
    if track["codec"] not in _DECODABLE:
        raise NotImplementedError(
            f"MP4 video codec {track['codec']!r} unsupported — only "
            f"photo-JPEG ('jpeg') samples decode natively; interframe "
            f"codecs (avc1/hev1/vp09) need a GOP-aware decoder"
        )
    samples = track["samples"]
    idx = (
        list(range(len(samples)))
        if frame_indices is None
        else list(frame_indices)
    )
    out = []
    for i in idx:
        if not 0 <= i < len(samples):
            raise IndexError(f"frame {i} out of range 0..{len(samples)-1}")
        off, size = samples[i]
        out.append((i, decode_jpeg_pixels(payload[off : off + size])))
    return info, out


# ---------------------------------------------------------------------------
# Muxer (photo-JPEG) — exists so exactness is provable
# ---------------------------------------------------------------------------


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(body), fourcc) + body


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(
        fourcc, bytes([version]) + flags.to_bytes(3, "big") + body
    )


def encode_mp4_mjpeg(
    frames: list[bytes], fps: int, width: int, height: int
) -> bytes:
    """Mux independent baseline-JPEG frames into a minimal valid MP4
    (ftyp + mdat + moov), one chunk per sample, media timescale = fps
    so every sample delta is exactly 1 — integer-exact timing."""
    if not frames:
        raise ValueError("need at least one frame")
    if fps <= 0:
        raise ValueError("fps must be positive")
    n = len(frames)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_body = b"".join(frames)
    mdat = _box(b"mdat", mdat_body)
    # sample offsets are absolute within the file: ftyp + mdat header
    base = len(ftyp) + 8
    offsets = []
    pos = base
    for f in frames:
        offsets.append(pos)
        pos += len(f)

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, fps, n)  # created, modified, scale, dur
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)  # rate, volume, rsvd
        + b"\x00" * 8
        + struct.pack(
            ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, n)  # created, mod, id, rsvd, dur
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer, group, volume, rsvd
        + struct.pack(
            ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, fps, n)
        + struct.pack(">HH", 0x55C4, 0),  # 'und' language
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    # VisualSampleEntry 'jpeg': 78-byte body after the 8-byte entry header
    entry = struct.pack(">I4s", 86, b"jpeg") + (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data reference index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame count per sample
        + b"\x00" * 32  # compressor name
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + struct.pack(f">{n}I", *(len(f) for f in frames)),
    )
    stco = _full(
        b"stco", 0, 0,
        struct.pack(">I", n) + struct.pack(f">{n}I", *offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(
        b"dref", 0, 0,
        struct.pack(">I", 1) + _full(b"url ", 0, 1, b""),
    )
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
