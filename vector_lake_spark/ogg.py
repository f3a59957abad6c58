"""Ogg container probe — page walk + codec identification, no decode.

The companion of ``mp3.py`` for the other half of crawl audio: Ogg
streams (Vorbis, Opus, FLAC-in-Ogg, Theora) probe by page structure
alone, per the public RFC 3533 framing: capture pattern "OggS",
version 0, header-type flags (continued/BOS/EOS), 64-bit granule
position, serial/sequence numbers, CRC, and the 255-run segment
lacing that delimits packets. The first packet of each logical
stream's BOS page carries the codec's identification header (RFC 7845
"OpusHead", Vorbis I "\\x01vorbis", "\\x7fFLAC", "\\x80theora"), which
gives channels/rate/pre-skip; the LAST page's granule position gives
the duration without touching a single audio packet — Vorbis granules
are PCM samples at the stream rate, Opus granules are 48 kHz samples
minus the pre-skip.

Page CRCs are verified on every page: Ogg uses the direct (unreflected)
CRC-32 with generator 0x04c11db7, zero init and zero final XOR,
computed with the CRC field zeroed. The matching ``mux_ogg_pages``
writes spec-valid pages (lacing, flags, CRC) so the walk's arithmetic
is provable end-to-end; entropy decode of the codecs themselves is out
of scope by design — the probe IS the 100 TB operator (route, filter,
budget), exactly the `probe_media`/`probe_mp3` posture.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _crc_table() -> list[int]:
    tbl = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
            r &= 0xFFFFFFFF
        tbl.append(r)
    return tbl


_CRC = _crc_table()

# byte/word bit-reversal tables for the zlib-dual formulation below
_REV8 = np.array(
    [int(f"{i:08b}"[::-1], 2) for i in range(256)], dtype=np.uint8
)
_REV8_L = _REV8.tolist()


def ogg_crc(data: bytes) -> int:
    """RFC 3533 page CRC: direct CRC-32, poly 0x04c11db7, init 0,
    no reflection, no final XOR.

    r13 (guide §4.2): the direct (non-reflected) CRC over poly
    0x04C11DB7 is the exact bit-reversal dual of the reflected CRC over
    0xEDB88320 — which is zlib's C implementation. So: bit-reverse each
    byte (one vectorized table gather), run ``zlib.crc32`` with raw
    init 0 (undo its pre/post conditioning), and bit-reverse the 32-bit
    result. Replaces the per-byte Python table loop (was the entire ogg
    mux+probe profile); equality with the table loop is pinned over
    random buffers in tests/test_ogg.py."""
    if not data:
        return 0
    rev = _REV8[np.frombuffer(bytes(data), np.uint8)].tobytes()
    raw = zlib.crc32(rev, 0xFFFFFFFF) ^ 0xFFFFFFFF
    r = (
        (_REV8_L[raw & 0xFF] << 24)
        | (_REV8_L[(raw >> 8) & 0xFF] << 16)
        | (_REV8_L[(raw >> 16) & 0xFF] << 8)
        | _REV8_L[(raw >> 24) & 0xFF]
    )
    return r


def _lacing(n: int) -> bytes:
    """Segment table for one packet of n bytes: 255-runs + terminator
    (a 0 terminator when n is an exact multiple of 255)."""
    full, rem = divmod(n, 255)
    return bytes([255] * full + [rem])


def mux_ogg_pages(pages: list[dict]) -> bytes:
    """Write spec-valid Ogg pages. Each page dict: ``serial``,
    ``seq``, ``granule``, ``packets`` (list of bytes — each packet must
    end on this page; continuation across pages is parsed but not
    muxed), and optional ``bos``/``eos`` flags."""
    out = bytearray()
    for p in pages:
        segs = bytearray()
        body = bytearray()
        for pkt in p["packets"]:
            segs += _lacing(len(pkt))
            body += pkt
        if len(segs) > 255:
            raise ValueError("page overflows the 255-entry segment table")
        flags = (2 if p.get("bos") else 0) | (4 if p.get("eos") else 0)
        hdr = (
            b"OggS\x00" + bytes([flags])
            + struct.pack("<q", p["granule"])
            + struct.pack("<II", p["serial"], p["seq"])
            + b"\x00\x00\x00\x00"  # CRC placeholder
            + bytes([len(segs)]) + bytes(segs)
        )
        page = bytearray(hdr + body)
        crc = ogg_crc(bytes(page))
        struct.pack_into("<I", page, 22, crc)
        out += page
    return bytes(out)


def vorbis_id_packet(channels: int, rate: int) -> bytes:
    """Vorbis I identification header (the BOS packet)."""
    return (
        b"\x01vorbis" + struct.pack("<IB I iii", 0, channels, rate, 0, 0, 0)
        + bytes([0x66])  # blocksize_1|blocksize_0 nibbles: log2 6|6 (64/64)
        + b"\x01"  # framing bit
    )


def opus_id_packet(channels: int, pre_skip: int, input_rate: int) -> bytes:
    """RFC 7845 OpusHead identification header."""
    return b"OpusHead" + struct.pack(
        "<BBHIhB", 1, channels, pre_skip, input_rate, 0, 0
    )


def probe_ogg(payload: bytes) -> dict:
    """Walk every page of an Ogg stream: verify capture pattern,
    version, CRC and per-serial sequence continuity; identify the codec
    from the first BOS packet; count pages/packets/bytes; duration from
    the final granule position. No codec packet beyond the ID header is
    inspected."""
    b = bytes(payload)
    if b[:4] != b"OggS":
        raise ValueError("not an Ogg stream (no OggS capture pattern)")
    pos = 0
    n_pages = 0
    n_packets = 0
    codec = None
    codec_serial = None  # the stream whose granule clock we report
    channels = None
    rate = None
    pre_skip = 0
    serials: dict[int, int] = {}  # serial -> last seq
    last_granule: dict[int, int] = {}
    saw_eos = False
    while pos < len(b):
        if len(b) - pos < 27:
            raise ValueError(f"truncated Ogg page header at byte {pos}")
        if b[pos : pos + 4] != b"OggS":
            raise ValueError(f"lost Ogg capture pattern at byte {pos}")
        if b[pos + 4] != 0:
            raise ValueError(f"unsupported Ogg version {b[pos + 4]}")
        flags = b[pos + 5]
        (granule,) = struct.unpack_from("<q", b, pos + 6)
        serial, seq = struct.unpack_from("<II", b, pos + 14)
        (crc,) = struct.unpack_from("<I", b, pos + 22)
        n_segs = b[pos + 26]
        seg_tbl = b[pos + 27 : pos + 27 + n_segs]
        if len(seg_tbl) < n_segs:
            raise ValueError(f"truncated Ogg segment table at byte {pos}")
        body_len = sum(seg_tbl)
        page_len = 27 + n_segs + body_len
        if pos + page_len > len(b):
            raise ValueError(
                f"truncated Ogg page body at byte {pos} "
                f"(needs {page_len} bytes)"
            )
        page = bytearray(b[pos : pos + page_len])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            raise ValueError(f"Ogg page CRC mismatch at byte {pos}")
        if serial in serials and seq != serials[serial] + 1:
            raise ValueError(
                f"Ogg sequence gap in stream {serial}: "
                f"{serials[serial]} -> {seq}"
            )
        if serial not in serials and not flags & 2:
            raise ValueError(f"Ogg stream {serial} does not begin with BOS")
        serials[serial] = seq
        if granule >= 0:
            last_granule[serial] = granule
        if flags & 4:
            saw_eos = True
        # packets ending on this page: lacing values < 255 terminate one
        n_packets += sum(1 for s in seg_tbl if s < 255)
        if flags & 2 and codec is None and body_len >= 1:
            first = b[pos + 27 + n_segs : pos + 27 + n_segs + body_len]
            if first[:8] == b"OpusHead":
                if len(first) < 12:
                    raise ValueError(
                        "corrupt Ogg: OpusHead packet shorter than its "
                        "12-byte identification header"
                    )
                codec, codec_serial = "opus", serial
                channels = first[9]
                (pre_skip,) = struct.unpack_from("<H", first, 10)
                rate = 48000  # Opus granules are always 48 kHz
            elif first[:7] == b"\x01vorbis":
                if len(first) < 16:
                    raise ValueError(
                        "corrupt Ogg: Vorbis identification packet shorter "
                        "than its fixed fields"
                    )
                codec, codec_serial = "vorbis", serial
                channels = first[11]
                (rate,) = struct.unpack_from("<I", first, 12)
            elif first[:5] == b"\x7fFLAC":
                codec, codec_serial = "flac", serial
            elif first[:7] == b"\x80theora":
                codec, codec_serial = "theora", serial
            else:
                codec, codec_serial = "unknown", serial
        n_pages += 1
        pos += page_len
    # duration comes from the identified codec's OWN stream: other
    # serials in a multiplexed file run different granule clocks
    # (e.g. Theora's shifted frame counter)
    granule = last_granule.get(codec_serial, 0)
    if codec == "opus":
        samples = max(granule - pre_skip, 0)
    else:
        samples = granule
    return {
        "codec": codec,
        "n_streams": len(serials),
        "n_pages": n_pages,
        "n_packets": n_packets,
        "n_channels": channels,
        "sample_rate": rate,
        "duration_ms": samples * 1000 // rate if rate else None,
        "eos": saw_eos,
        "total_bytes": len(b),
        "decodable": False,  # entropy decode gates by name below
    }


def decode_ogg(payload: bytes):
    """Named gate: Vorbis/Opus/Theora entropy decode is outside the
    honest-decode set — only the page-walk probe is implemented."""
    info = probe_ogg(payload)
    raise NotImplementedError(
        f"Ogg {info['codec']} decode unsupported — probe_ogg reads all "
        f"container metadata"
    )


def is_ogg(payload: bytes) -> bool:
    return payload is not None and bytes(payload[:4]) == b"OggS"
