"""Matroska/WebM metadata probe — pure stdlib EBML parsing (RFC 8794 +
the public Matroska element registry), no external demuxer.

Matroska was the last NAMED container gate (``avi.py`` r06, ``mp4.py``
r07). This module closes it at the level a 100 TB pipeline needs first:
the METADATA pass — docType (matroska/webm), segment duration, per-track
codec id / dimensions / audio params, and cluster/block counts (total
and per track) — all without touching a byte of frame payload. Since
late r09, intraframe **V_MJPEG tracks DECODE for real** too
(``decode_mkv_frames``: (Simple)Block payloads are whole JPEG frames
through the native codec — the same sampled-decode economics as
MJPEG-in-AVI), and since r10 that includes **laced blocks** (Xiph/
EBML/fixed size tables parsed in both the counting pass and the
frame slicer — lacing is ubiquitous in real WebM); Matroska's common
codecs (V_VP8/VP9/AV1,
V_MPEG4/ISO/AVC, A_OPUS, A_VORBIS) stay gated BY NAME — they are
interframe/entropy codecs outside this repo's real-decode set, and an
honest NotImplementedError beats a fake.

EBML structure (RFC 8794): every element is

    <VINT id> <VINT size> <payload>

where a VINT's leading-zero count in the FIRST byte gives its total
byte length (1xxxxxxx = 1 byte, 01xxxxxx = 2 bytes, ...); element IDs
keep the marker bit, sizes strip it. An all-ones size VINT means
"unknown size" (streamed files) — handled for Segment and Cluster by
walking children until a sibling-level id appears.

Elements parsed (ids from the public registry):

    1A45DFA3 EBML header      4282 DocType
    18538067 Segment
      1549A966 Info           2AD7B1 TimestampScale, 4489 Duration
      1654AE6B Tracks
        AE TrackEntry         D7 TrackNumber, 83 TrackType, 86 CodecID
          E0 Video            B0 PixelWidth, BA PixelHeight
          E1 Audio            B5 SamplingFrequency, 9F Channels
      1F43B675 Cluster        E7 Timestamp, A3 SimpleBlock,
                             A0 BlockGroup > A1 Block (counted per track)

At 100 TB the probe runs inside the same Arrow ``mapInPandas`` operator
shape as the other containers: payloads are an opaque binary column and
only (media_id, payload) crosses to Python.
"""

from __future__ import annotations

import struct

EBML_MAGIC = b"\x1a\x45\xdf\xa3"


def is_mkv(payload: bytes) -> bool:
    return payload[:4] == EBML_MAGIC


def _read_vint(
    payload: bytes, pos: int, keep_marker: bool
) -> tuple[int, int, int]:
    """Decode one EBML variable-length integer at ``pos``; returns
    (value, next_pos, byte_length). IDs keep the length-marker bit,
    sizes strip it."""
    first = payload[pos]
    if first == 0:
        raise ValueError("corrupt EBML: VINT with >8-byte length")
    length = 8 - first.bit_length() + 1
    if pos + length > len(payload):
        raise ValueError("corrupt EBML: truncated VINT")
    value = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        value = (value << 8) | payload[pos + i]
    return value, pos + length, length


# children of the two master elements that streamed files commonly write
# with unknown size (RFC 8794 §6.2: an unknown-size element ends when an
# element NOT a valid child appears at its level). Segment children per
# the Matroska registry; Cluster children are Timestamp/SimpleBlock/
# BlockGroup/Position/PrevSize/SilentTracks.
_CHILD_IDS = {
    0x18538067: {  # Segment
        0x114D9B74, 0x1549A966, 0x1654AE6B, 0x1F43B675,
        0x1C53BB6B, 0x1941A469, 0x1043A770, 0x1254C367, 0xEC,
    },
    0x1F43B675: {  # Cluster
        0xE7, 0xA3, 0xA0, 0xA7, 0xAB, 0x5854, 0xEC,
    },
}


def _unknown_end(payload: bytes, eid: int, pos: int, end: int) -> int:
    """End of an unknown-size master element: scan sibling-level element
    headers until an id that is not a valid child of ``eid`` (RFC 8794
    §6.2); unknown ids terminate too, which is the conservative choice
    for a probe."""
    children = _CHILD_IDS.get(eid)
    if children is None:
        return end  # only Segment/Cluster stream with unknown size
    while pos < end:
        cid, p, _ = _read_vint(payload, pos, keep_marker=True)
        if cid not in children:
            return pos
        size, p, slen = _read_vint(payload, p, keep_marker=False)
        if size == (1 << (7 * slen)) - 1:
            pos = _unknown_end(payload, cid, p, end)
        else:
            pos = p + size
    return end


def _elements(payload: bytes, pos: int, end: int):
    """Yield (id, body_start, body_end) for EBML elements in [pos, end).
    Unknown-size elements (all data bits ones — RFC 8794 §6, streamed
    Segments/Clusters) end at the first non-child id at their level."""
    while pos < end:
        eid, p, _ = _read_vint(payload, pos, keep_marker=True)
        size, p, slen = _read_vint(payload, p, keep_marker=False)
        if size == (1 << (7 * slen)) - 1:  # unknown size
            body_end = _unknown_end(payload, eid, p, end)
        else:
            body_end = p + size
        if body_end > end:
            raise ValueError(
                f"corrupt EBML: element 0x{eid:X} overruns container"
            )
        yield eid, p, body_end
        pos = body_end


def _block_frame_slices(
    payload: bytes, p: int, be: int, flags: int
) -> list[tuple[int, int]]:
    """Frame (start, end) slices of one (Simple)Block body whose
    timestamp/flags header ends at ``p``. Un-laced blocks are one frame;
    laced blocks (Matroska §"Lacing": flags bits 0x06 — 0x02 Xiph,
    0x04 fixed, 0x06 EBML) carry a lace count byte (frames − 1) and a
    size table for all frames but the last:

    - **Xiph**: each size is a run of 0xFF bytes plus a final byte <255
      (the values sum) — the Ogg lacing scheme.
    - **EBML**: the first size is a plain unsigned VINT; each later one
      is a SIGNED-VINT delta against the previous size (bias
      2^(7·len−1) − 1, RFC 8794 §4).
    - **fixed**: no table; the remaining bytes divide evenly.

    The last frame always takes the remainder. Closed in r10 (was a
    named gate): lacing is ubiquitous in real WebM audio tracks, and
    the arithmetic is pure VINT/byte work."""
    if not flags & 0x06:
        return [(p, be)]
    if p >= be:
        raise ValueError("corrupt Matroska: laced block missing lace count")
    n_frames = payload[p] + 1
    p += 1
    mode = flags & 0x06
    sizes: list[int] = []
    if mode == 0x02:  # Xiph lacing
        for _ in range(n_frames - 1):
            size = 0
            while True:
                if p >= be:
                    raise ValueError(
                        "corrupt Matroska: truncated Xiph lace size table"
                    )
                b = payload[p]
                p += 1
                size += b
                if b < 255:
                    break
            sizes.append(size)
    elif mode == 0x06:  # EBML lacing
        if n_frames >= 2:
            if p >= be:
                raise ValueError(
                    "corrupt Matroska: truncated EBML lace size table"
                )
            first, p, _ = _read_vint(payload, p, keep_marker=False)
            prev = first
            sizes.append(first)
            for _ in range(n_frames - 2):
                if p >= be:
                    raise ValueError(
                        "corrupt Matroska: truncated EBML lace size table"
                    )
                raw, p, ln = _read_vint(payload, p, keep_marker=False)
                prev += raw - ((1 << (7 * ln - 1)) - 1)  # signed-VINT bias
                if prev < 0:
                    raise ValueError(
                        "corrupt Matroska: negative EBML lace size"
                    )
                sizes.append(prev)
            if p > be:
                raise ValueError(
                    "corrupt Matroska: EBML lace table overruns block"
                )
    else:  # 0x04 fixed-size lacing: no table
        total = be - p
        if total % n_frames:
            raise ValueError(
                "corrupt Matroska: fixed lacing does not divide the "
                f"block payload ({total} bytes / {n_frames} frames)"
            )
        sizes = [total // n_frames] * (n_frames - 1)
    out: list[tuple[int, int]] = []
    for sz in sizes:
        if p + sz > be:
            raise ValueError("corrupt Matroska: lace size overruns block")
        out.append((p, p + sz))
        p += sz
    out.append((p, be))
    return out


def _block_track_and_frames(
    payload: bytes, bs: int, be: int
) -> tuple[int, int, int, int]:
    """(track_number, n_frames, body_pos, flags) of a (Simple)Block at
    [bs, be): the VINT track number, then int16 relative timestamp,
    then the flags byte whose lacing bits determine the frame count
    (laced blocks carry frames−1 in the next byte — r09 advice: the
    counting pass must not report a laced block as one frame)."""
    tno, p, _ = _read_vint(payload, bs, keep_marker=False)
    if p + 3 > be:
        raise ValueError(
            "corrupt Matroska: block body ends before its "
            "timestamp/flags header"
        )
    flags = payload[p + 2]
    if flags & 0x06:
        if p + 4 > be:
            raise ValueError(
                "corrupt Matroska: laced block missing lace count"
            )
        return tno, payload[p + 3] + 1, p + 3, flags
    return tno, 1, p + 3, flags


def _uint(payload: bytes, s: int, e: int) -> int:
    v = 0
    for i in range(s, e):
        v = (v << 8) | payload[i]
    return v


def _float(payload: bytes, s: int, e: int) -> float:
    n = e - s
    if n == 4:
        return struct.unpack(">f", payload[s:e])[0]
    if n == 8:
        return struct.unpack(">d", payload[s:e])[0]
    if n == 0:
        return 0.0
    raise ValueError(f"corrupt EBML: float of width {n}")


def probe_mkv(payload: bytes) -> dict:
    """Container metadata WITHOUT touching block payloads: docType,
    duration, per-track (codec, dims / audio params), cluster and
    SimpleBlock counts. The cheap first pass of a media pipeline."""
    if not is_mkv(payload):
        raise ValueError("not a Matroska payload (EBML magic missing)")
    doc_type = None
    timescale = 1_000_000  # ns per tick, Matroska default
    duration_ticks = 0.0
    tracks: list[dict] = []
    n_clusters = 0
    n_blocks = 0
    blocks_by_track: dict[int, int] = {}
    for eid, s, e in _elements(payload, 0, len(payload)):
        if eid == 0x1A45DFA3:  # EBML header
            for hid, hs, he in _elements(payload, s, e):
                if hid == 0x4282:  # DocType
                    doc_type = payload[hs:he].decode("ascii").rstrip("\x00")
        elif eid == 0x18538067:  # Segment
            for sid, ss, se in _elements(payload, s, e):
                if sid == 0x1549A966:  # Info
                    for iid, is_, ie in _elements(payload, ss, se):
                        if iid == 0x2AD7B1:
                            timescale = _uint(payload, is_, ie)
                        elif iid == 0x4489:
                            duration_ticks = _float(payload, is_, ie)
                elif sid == 0x1654AE6B:  # Tracks
                    for tid, ts, te in _elements(payload, ss, se):
                        if tid != 0xAE:  # TrackEntry
                            continue
                        tr: dict = {
                            "track_number": None,
                            "track_type": None,
                            "codec": None,
                            "width": None,
                            "height": None,
                            "sample_rate": None,
                            "channels": None,
                        }
                        for fid, fs, fe in _elements(payload, ts, te):
                            if fid == 0xD7:
                                tr["track_number"] = _uint(payload, fs, fe)
                            elif fid == 0x83:
                                tr["track_type"] = _uint(payload, fs, fe)
                            elif fid == 0x86:
                                tr["codec"] = (
                                    payload[fs:fe].decode("ascii").rstrip("\x00")
                                )
                            elif fid == 0xE0:  # Video
                                for vid, vs, ve in _elements(payload, fs, fe):
                                    if vid == 0xB0:
                                        tr["width"] = _uint(payload, vs, ve)
                                    elif vid == 0xBA:
                                        tr["height"] = _uint(payload, vs, ve)
                            elif fid == 0xE1:  # Audio
                                for aid, as_, ae in _elements(payload, fs, fe):
                                    if aid == 0xB5:
                                        tr["sample_rate"] = _float(
                                            payload, as_, ae
                                        )
                                    elif aid == 0x9F:
                                        tr["channels"] = _uint(payload, as_, ae)
                        tracks.append(tr)
                elif sid == 0x1F43B675:  # Cluster — count, never decode
                    n_clusters += 1
                    for cid, cs, ce in _elements(payload, ss, se):
                        if cid == 0xA3:  # SimpleBlock
                            # laced blocks count every frame they carry
                            # (r09 advice; the lace count byte is part
                            # of the header, no payload read)
                            tno, nf, _, _ = _block_track_and_frames(
                                payload, cs, ce
                            )
                            n_blocks += nf
                            blocks_by_track[tno] = (
                                blocks_by_track.get(tno, 0) + nf
                            )
                        elif cid == 0xA0:  # BlockGroup wraps a Block
                            for gid, gs, ge in _elements(payload, cs, ce):
                                if gid == 0xA1:
                                    # real muxers wrap most blocks in
                                    # BlockGroups — they count as frames
                                    # exactly like SimpleBlocks
                                    tno, nf, _, _ = (
                                        _block_track_and_frames(
                                            payload, gs, ge
                                        )
                                    )
                                    n_blocks += nf
                                    blocks_by_track[tno] = (
                                        blocks_by_track.get(tno, 0) + nf
                                    )
    if doc_type is None:
        raise ValueError("corrupt Matroska: EBML header without DocType")
    return {
        "doc_type": doc_type,
        "timescale_ns": timescale,
        "duration_ms": int(duration_ticks * timescale / 1e6),
        "n_tracks": len(tracks),
        "tracks": tracks,
        "n_clusters": n_clusters,
        "n_blocks": n_blocks,
        "blocks_by_track": blocks_by_track,
    }


# ---------------------------------------------------------------------------
# Minimal muxer — enough Matroska to put probe_mkv under the oracle gate
# ---------------------------------------------------------------------------


def _vint(value: int) -> bytes:
    """Encode an EBML size VINT in the shortest length whose all-ones
    pattern (reserved for "unknown size") it does not collide with."""
    if value < 0:
        raise ValueError("EBML sizes are unsigned")
    for length in range(1, 9):
        if value < (1 << (7 * length)) - 1:
            return (value | (1 << (7 * length))).to_bytes(length, "big")
    raise ValueError("EBML size too large for an 8-byte VINT")


def _el(eid: bytes, body: bytes) -> bytes:
    """One EBML element: registered id bytes + size VINT + payload."""
    return eid + _vint(len(body)) + body


def _svint(delta: int) -> bytes:
    """Signed VINT (RFC 8794 §4, used by EBML lacing size deltas):
    value + bias encoded as a marker VINT, bias = 2^(7·len−1) − 1 for
    the shortest length that holds the delta."""
    for length in range(1, 9):
        bias = (1 << (7 * length - 1)) - 1
        if -bias <= delta <= bias:
            return ((delta + bias) | (1 << (7 * length))).to_bytes(
                length, "big"
            )
    raise ValueError("EBML lace delta too large for an 8-byte VINT")


def _laced_block_body(frames: list[bytes], lacing: str) -> bytes:
    """SimpleBlock body carrying ALL ``frames`` under one lacing scheme:
    track-1 VINT, zero relative timestamp, keyframe flag with the
    lacing bits set, lace count (frames − 1), the per-mode size table
    for every frame but the last, then the concatenated frames."""
    mode = {"xiph": 0x02, "fixed": 0x04, "ebml": 0x06}[lacing]
    table = b""
    if lacing == "xiph":
        for f in frames[:-1]:
            sz = len(f)
            table += b"\xff" * (sz // 255) + bytes([sz % 255])
    elif lacing == "ebml":
        if len(frames) >= 2:
            table = _vint(len(frames[0]))
            for prev, f in zip(frames, frames[1:-1]):
                table += _svint(len(f) - len(prev))
    else:  # fixed: sizes must already be equal, no table
        if len({len(f) for f in frames}) > 1:
            raise ValueError(
                "fixed lacing requires equal-size frames "
                f"(got {sorted({len(f) for f in frames})})"
            )
    return (
        b"\x81"
        + struct.pack(">hB", 0, 0x80 | mode)
        + bytes([len(frames) - 1])
        + table
        + b"".join(frames)
    )


def _el_uint(eid: bytes, value: int) -> bytes:
    n = max(1, (value.bit_length() + 7) // 8)
    return _el(eid, value.to_bytes(n, "big"))


def encode_mkv_mjpeg(
    frames: list[bytes],
    fps: int,
    width: int,
    height: int,
    lacing: str | None = None,
) -> bytes:
    """Assemble already-encoded JPEG frames into a minimal Matroska file
    (RFC 8794 EBML + the public Matroska element registry): EBML header
    with DocType "matroska", Segment{Info{TimestampScale, Duration},
    Tracks{video TrackEntry, CodecID V_MJPEG}, one Cluster of keyframe
    SimpleBlocks}. Duration is written as an exact integer millisecond
    count (n_frames*1000//fps) so the probe's float math round-trips it
    losslessly. ``lacing`` (r10: "xiph" | "ebml" | "fixed") packs ALL
    frames into ONE laced SimpleBlock — how real WebM muxers batch
    audio and how the laced-decode path gets fixture coverage.
    Counterpart of ``encode_avi_mjpeg``/``encode_mp4_mjpeg``
    for the container-probe oracle; NOT a general-purpose muxer."""
    if not frames:
        raise ValueError("need at least one frame")
    if fps <= 0:
        raise ValueError("fps must be positive")
    header = _el(
        b"\x1a\x45\xdf\xa3",
        _el_uint(b"\x42\x86", 1)  # EBMLVersion
        + _el_uint(b"\x42\xf7", 1)  # EBMLReadVersion
        + _el_uint(b"\x42\xf2", 4)  # EBMLMaxIDLength
        + _el_uint(b"\x42\xf3", 8)  # EBMLMaxSizeLength
        + _el(b"\x42\x82", b"matroska")  # DocType
        + _el_uint(b"\x42\x87", 4)  # DocTypeVersion
        + _el_uint(b"\x42\x85", 2),  # DocTypeReadVersion
    )
    duration_ms = len(frames) * 1000 // fps
    info = _el(
        b"\x15\x49\xa9\x66",
        _el_uint(b"\x2a\xd7\xb1", 1_000_000)  # TimestampScale (ns/tick)
        + _el(b"\x44\x89", struct.pack(">d", float(duration_ms))),
    )
    video = _el(
        b"\xe0",
        _el_uint(b"\xb0", width) + _el_uint(b"\xba", height),
    )
    track = _el(
        b"\xae",
        _el_uint(b"\xd7", 1)  # TrackNumber
        + _el_uint(b"\x73\xc5", 1)  # TrackUID
        + _el_uint(b"\x83", 1)  # TrackType: video
        + _el(b"\x86", b"V_MJPEG")  # CodecID
        + video,
    )
    tracks = _el(b"\x16\x54\xae\x6b", track)
    if lacing is not None:
        blocks = _el(b"\xa3", _laced_block_body(frames, lacing))
    else:
        blocks = b""
        for i, frame in enumerate(frames):
            ts = i * 1000 // fps
            if ts > 0x7FFF:
                raise ValueError(
                    "relative block timestamp overflows int16; "
                    "split clusters"
                )
            # SimpleBlock: track VINT, int16 relative timestamp,
            # keyframe flag
            blocks += _el(
                b"\xa3", b"\x81" + struct.pack(">hB", ts, 0x80) + frame
            )
    cluster = _el(b"\x1f\x43\xb6\x75", _el_uint(b"\xe7", 0) + blocks)
    segment = _el(b"\x18\x53\x80\x67", info + tracks + cluster)
    return header + segment


def _video_block_slices(payload: bytes, track_no: int) -> list[tuple[int, int]]:
    """(offset, end) of every frame payload belonging to ``track_no``,
    cluster/block/lace order. Laced blocks (EBML/Xiph/fixed) expand into
    one slice per laced frame (r10 — was a named gate): the size tables
    are pure VINT/byte arithmetic, so every frame in a laced V_MJPEG
    block is as independently decodable as an un-laced one."""
    slices: list[tuple[int, int]] = []

    def block_slice(bs: int, be: int) -> None:
        tno, _nf, p, flags = _block_track_and_frames(payload, bs, be)
        if tno != track_no:
            return
        slices.extend(_block_frame_slices(payload, p, be, flags))

    for eid, s, e in _elements(payload, 0, len(payload)):
        if eid != 0x18538067:  # Segment
            continue
        for sid, ss, se in _elements(payload, s, e):
            if sid != 0x1F43B675:  # Cluster
                continue
            for cid, cs, ce in _elements(payload, ss, se):
                if cid == 0xA3:  # SimpleBlock
                    block_slice(cs, ce)
                elif cid == 0xA0:  # BlockGroup wraps a Block
                    for gid, gs, ge in _elements(payload, cs, ce):
                        if gid == 0xA1:
                            block_slice(gs, ge)
    return slices


def decode_mkv_frames(payload: bytes, frame_indices=None):
    """Decode selected frames (all if None) of a Matroska video track.
    Intraframe V_MJPEG tracks decode for REAL (late r09): block payloads
    are whole JPEG frames, each independently seekable through the
    native codec — the same sampled-decode economics as MJPEG-in-AVI.
    The container's common codecs stay gated by name: V_VP8/VP9/AV1 and
    H.264/H.265 are interframe (GOP-aware decoders), Opus/Vorbis are
    entropy audio — outside this repo's real-decode set. The probe
    reads all metadata either way. Returns (probe_info, [(frame_no,
    pixels)])."""
    info = probe_mkv(payload)
    video = [t for t in info["tracks"] if t["track_type"] == 1]
    vcodecs = sorted({t["codec"] for t in video if t["codec"]})
    if not video or "V_MJPEG" not in vcodecs:
        codecs = sorted({t["codec"] for t in info["tracks"] if t["codec"]})
        raise NotImplementedError(
            f"Matroska block decode unsupported (tracks: "
            f"{', '.join(codecs) or 'none'}) — interframe/entropy codecs "
            f"need GOP-aware decoders; intraframe V_MJPEG tracks decode "
            f"natively and the metadata probe (probe_mkv) reads all tracks"
        )
    tr = next(t for t in video if t["codec"] == "V_MJPEG")
    frames = _video_block_slices(payload, tr["track_number"])
    idx = (
        list(range(len(frames)))
        if frame_indices is None
        else list(frame_indices)
    )
    for i in idx:
        if not 0 <= i < len(frames):
            raise IndexError(f"frame {i} out of range 0..{len(frames)-1}")
    from vector_lake_spark.jpeg import decode_jpeg_pixels

    out = []
    for i in idx:
        s, e = frames[i]
        out.append((i, decode_jpeg_pixels(payload[s:e])))
    return info, out
