"""MP4/ISO-BMFF codec (`vector_lake_spark.mp4`): probe + photo-JPEG
decode round trips, sample-table math proven against HAND-ASSEMBLED
boxes the muxer never emits (multi-sample chunks via stsc runs, co64,
uniform stsz, version-1 full boxes), loud codec gates, and the Arrow
operator path."""

import struct

import numpy as np
import pytest

from vector_lake_spark.jpeg import encode_jpeg
from vector_lake_spark.mp4 import (
    _sample_table,
    decode_mp4_frames,
    encode_mp4_mjpeg,
    is_mp4,
    probe_mp4,
)


@pytest.fixture(scope="module")
def mp4_payload():
    frames = [
        encode_jpeg(np.full((16, 24), v, dtype=np.uint8), 100)
        for v in (10, 120, 250, 60)
    ]
    return frames, encode_mp4_mjpeg(frames, 4, 24, 16)


def test_probe_reads_container_without_decoding(mp4_payload):
    frames, payload = mp4_payload
    info = probe_mp4(payload)
    assert info["brand"] == "isom"
    assert info["duration_ms"] == 1000  # 4 frames @ 4 fps
    assert info["n_tracks"] == 1
    t = info["tracks"][0]
    assert t["handler"] == "vide" and t["codec"] == "jpeg"
    assert (t["width"], t["height"]) == (24, 16)
    assert t["n_samples"] == 4
    assert t["timing"] == [(4, 1)]
    assert [s for _, s in t["samples"]] == [len(f) for f in frames]


def test_round_trip_exact_pixels(mp4_payload):
    frames, payload = mp4_payload
    _, out = decode_mp4_frames(payload)
    assert [i for i, _ in out] == [0, 1, 2, 3]
    for (_, px), v in zip(out, (10, 120, 250, 60)):
        assert px.shape == (16, 24)
        assert np.array_equal(px, np.full((16, 24), v, dtype=np.uint8))


def test_selective_decode_touches_only_requested_frames(mp4_payload):
    frames, payload = mp4_payload
    info = probe_mp4(payload)
    off, size = info["tracks"][0]["samples"][2]
    bad = bytearray(payload)
    for i in range(off, off + size):
        bad[i] ^= 0xFF  # destroy frame 2's JPEG bytes
    _, out = decode_mp4_frames(bytes(bad), [0, 3])
    assert [i for i, _ in out] == [0, 3]
    with pytest.raises(Exception):
        decode_mp4_frames(bytes(bad), [2])


def test_interframe_codec_gates_by_name(mp4_payload):
    _, payload = mp4_payload
    bad = bytearray(payload)
    idx = bad.find(b"jpeg", bad.find(b"stsd"))
    bad[idx : idx + 4] = b"avc1"
    with pytest.raises(NotImplementedError, match="avc1"):
        decode_mp4_frames(bytes(bad))
    # probe still reads everything — the gate is at DECODE, not metadata
    assert probe_mp4(bytes(bad))["tracks"][0]["codec"] == "avc1"


def test_not_mp4_raises():
    assert not is_mp4(b"RIFF1234AVI LIST")
    with pytest.raises(ValueError, match="ftyp"):
        probe_mp4(b"\x00" * 32)


def test_truncated_box_raises():
    p = encode_mp4_mjpeg(
        [encode_jpeg(np.full((8, 8), 1, dtype=np.uint8), 100)], 1, 8, 8
    )
    with pytest.raises(ValueError, match="corrupt MP4"):
        probe_mp4(p[: len(p) - 40])


# ---------------------------------------------------------------------------
# Hand-assembled sample-table fixtures — shapes the muxer never writes
# ---------------------------------------------------------------------------


def _b(fourcc, body):
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _fb(fourcc, version, body):
    return _b(fourcc, bytes([version]) + b"\x00\x00\x00" + body)


def test_stsc_multi_sample_chunks_and_co64():
    """5 samples in 2 chunks (3 + 2, one stsc run each), 64-bit chunk
    offsets, uniform stsz — none of which encode_mp4_mjpeg emits."""
    sizes = _fb(b"stsz", 0, struct.pack(">II", 7, 5))  # uniform 7 bytes
    stsc = _fb(
        b"stsc", 0,
        struct.pack(">I", 2)
        + struct.pack(">III", 1, 3, 1)
        + struct.pack(">III", 2, 2, 1),
    )
    co64 = _fb(
        b"co64", 0, struct.pack(">I", 2) + struct.pack(">QQ", 100, 1000)
    )
    stts = _fb(b"stts", 0, struct.pack(">III", 1, 5, 2))
    entry = struct.pack(">I4s", 86, b"jpeg") + (
        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
        + struct.pack(">HH", 30, 20)
        + struct.pack(">II", 0x480000, 0x480000) + b"\x00" * 4
        + struct.pack(">H", 1) + b"\x00" * 32 + struct.pack(">Hh", 24, -1)
    )
    stsd = _fb(b"stsd", 0, struct.pack(">I", 1) + entry)
    stbl = _b(b"stbl", stsd + stts + stsc + sizes + co64)
    minf = _b(b"minf", stbl)
    hdlr = _fb(b"hdlr", 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00")
    # version-1 mdhd: 64-bit created/modified/duration
    mdhd = _fb(
        b"mdhd", 1,
        struct.pack(">QQIQ", 0, 0, 10, 25) + struct.pack(">HH", 0x15C7, 0),
    )
    mdia = _b(b"mdia", mdhd + hdlr + minf)
    tkhd = _fb(
        b"tkhd", 1,
        struct.pack(">QQIIQ", 0, 0, 1, 0, 25)
        + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 30 << 16, 20 << 16),
    )
    trak = _b(b"trak", tkhd + mdia)
    # version-1 mvhd
    mvhd = _fb(
        b"mvhd", 1,
        struct.pack(">QQIQ", 0, 0, 10, 25)
        + struct.pack(">IHH", 0x10000, 0x100, 0) + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    moov = _b(b"moov", mvhd + trak)
    ftyp = _b(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42isom")
    payload = ftyp + moov
    info = probe_mp4(payload)
    assert info["brand"] == "mp42"
    assert info["duration_ms"] == 2500  # 25 ticks @ timescale 10
    t = info["tracks"][0]
    assert t["codec"] == "jpeg" and (t["width"], t["height"]) == (30, 20)
    assert t["language"] == "eng"  # 0x15C7 packs e,n,g
    assert t["n_samples"] == 5 and t["timing"] == [(5, 2)]
    # chunk 1 @100 holds samples 0-2, chunk 2 @1000 holds samples 3-4
    assert t["samples"] == [
        (100, 7), (107, 7), (114, 7), (1000, 7), (1007, 7),
    ]


def test_interleaved_two_track_multi_run_layout():
    """A realistic muxer layout the in-repo muxer never writes (r07
    verdict #4): video and audio INTERLEAVED in mdat order
    V1 A1 V2 A2 V3, so video chunk offsets are non-contiguous (audio
    chunks sit in the gaps), the video stsc has THREE runs (2, 3, 1
    samples per chunk), the audio stsc has two (3, 2), video uses co64
    and per-sample stsz, audio uses stco and uniform stsz. Pins the
    resolved per-sample (offset, size) of BOTH tracks exactly —
    the sample-table contract of mp4.py:33-48."""
    # mdat plan: Vc1@50 holds v0,v1 (10,11); Ac1@71 holds a0..a2 (4 ea);
    # Vc2@83 holds v2..v4 (12,13,14); Ac2@122 holds a3,a4; Vc3@130 v5 (15)
    v_sizes = [10, 11, 12, 13, 14, 15]
    v_stsz = _fb(
        b"stsz", 0,
        struct.pack(">II", 0, 6) + struct.pack(">6I", *v_sizes),
    )
    v_stsc = _fb(
        b"stsc", 0,
        struct.pack(">I", 3)
        + struct.pack(">III", 1, 2, 1)
        + struct.pack(">III", 2, 3, 1)
        + struct.pack(">III", 3, 1, 1),
    )
    v_co64 = _fb(
        b"co64", 0,
        struct.pack(">I", 3) + struct.pack(">QQQ", 50, 83, 130),
    )
    v_stts = _fb(b"stts", 0, struct.pack(">III", 1, 6, 1))
    v_entry = struct.pack(">I4s", 86, b"jpeg") + (
        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
        + struct.pack(">HH", 32, 24)
        + struct.pack(">II", 0x480000, 0x480000) + b"\x00" * 4
        + struct.pack(">H", 1) + b"\x00" * 32 + struct.pack(">Hh", 24, -1)
    )
    v_stsd = _fb(b"stsd", 0, struct.pack(">I", 1) + v_entry)
    v_stbl = _b(b"stbl", v_stsd + v_stts + v_stsc + v_stsz + v_co64)
    v_hdlr = _fb(b"hdlr", 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00")
    v_mdhd = _fb(
        b"mdhd", 0,
        struct.pack(">IIII", 0, 0, 6, 6) + struct.pack(">HH", 0x55C4, 0),
    )
    v_mdia = _b(b"mdia", v_mdhd + v_hdlr + _b(b"minf", v_stbl))
    v_tkhd = _fb(
        b"tkhd", 0,
        struct.pack(">IIIII", 0, 0, 1, 0, 6)
        + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 32 << 16, 24 << 16),
    )
    v_trak = _b(b"trak", v_tkhd + v_mdia)

    a_stsz = _fb(b"stsz", 0, struct.pack(">II", 4, 5))  # uniform 4 bytes
    a_stsc = _fb(
        b"stsc", 0,
        struct.pack(">I", 2)
        + struct.pack(">III", 1, 3, 1)
        + struct.pack(">III", 2, 2, 1),
    )
    a_stco = _fb(b"stco", 0, struct.pack(">I", 2) + struct.pack(">II", 71, 122))
    a_stts = _fb(b"stts", 0, struct.pack(">III", 1, 5, 1))
    a_entry = struct.pack(">I4s", 36, b"mp4a") + (
        b"\x00" * 6 + struct.pack(">H", 1)
        + struct.pack(">HHHH", 0, 0, 2, 16)
        + struct.pack(">HH", 0, 0)
        + struct.pack(">I", 8000 << 16)
    )
    a_stsd = _fb(b"stsd", 0, struct.pack(">I", 1) + a_entry)
    a_stbl = _b(b"stbl", a_stsd + a_stts + a_stsc + a_stsz + a_stco)
    a_hdlr = _fb(b"hdlr", 0, b"\x00" * 4 + b"soun" + b"\x00" * 12 + b"\x00")
    a_mdhd = _fb(
        b"mdhd", 0,
        struct.pack(">IIII", 0, 0, 8000, 40000)
        + struct.pack(">HH", 0x55C4, 0),
    )
    a_mdia = _b(b"mdia", a_mdhd + a_hdlr + _b(b"minf", a_stbl))
    a_tkhd = _fb(
        b"tkhd", 0,
        struct.pack(">IIIII", 0, 0, 2, 0, 6)
        + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0x0100, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 0, 0),
    )
    a_trak = _b(b"trak", a_tkhd + a_mdia)

    mvhd = _fb(
        b"mvhd", 0,
        struct.pack(">IIII", 0, 0, 6, 6)
        + struct.pack(">IHH", 0x10000, 0x100, 0) + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 3),
    )
    moov = _b(b"moov", mvhd + v_trak + a_trak)
    ftyp = _b(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    info = probe_mp4(ftyp + moov)
    assert info["n_tracks"] == 2
    vt, at = info["tracks"]
    assert vt["handler"] == "vide" and at["handler"] == "soun"
    # video: 3 chunks at non-contiguous offsets (audio occupies the gaps)
    assert vt["samples"] == [
        (50, 10), (60, 11), (83, 12), (95, 13), (108, 14), (130, 15),
    ]
    # audio: uniform-size samples packed within its own two chunks
    assert at["samples"] == [
        (71, 4), (75, 4), (79, 4), (122, 4), (126, 4),
    ]


def test_probe_missing_box_raises_by_name():
    """A structurally-valid walk that lacks a required box must raise
    the module's named ValueError, not a TypeError from subscripting a
    None _find() result (r07 advice)."""
    # moov with mvhd but a trak missing its mdia
    tkhd = _fb(
        b"tkhd", 0,
        struct.pack(">IIIII", 0, 0, 1, 0, 1)
        + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 8 << 16, 8 << 16),
    )
    trak = _b(b"trak", tkhd)
    mvhd = _fb(
        b"mvhd", 0,
        struct.pack(">IIII", 0, 0, 1, 1)
        + struct.pack(">IHH", 0x10000, 0x100, 0) + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    moov = _b(b"moov", mvhd + trak)
    ftyp = _b(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    with pytest.raises(ValueError, match="no mdia box"):
        probe_mp4(ftyp + moov)
    # and a file with no moov at all
    with pytest.raises(ValueError, match="no moov box"):
        probe_mp4(ftyp)


def test_sample_table_run_math_directly():
    # 2 runs over 4 chunks: chunks 1-2 hold 2 samples, chunks 3-4 hold 1
    samples = _sample_table(
        [5, 6, 7, 8, 9, 10],
        [0, 100, 200, 300],
        [(1, 2, 1), (3, 1, 1)],
    )
    assert samples == [
        (0, 5), (5, 6), (100, 7), (107, 8), (200, 9), (300, 10),
    ]


def test_sample_table_mismatch_raises():
    with pytest.raises(ValueError, match="resolves"):
        _sample_table([5, 5, 5], [0], [(1, 2, 1)])


# ---------------------------------------------------------------------------
# Arrow operator path (shared dispatch with AVI)
# ---------------------------------------------------------------------------


def test_extract_video_frames_mp4_end_to_end(spark, mp4_payload):
    from vector_lake_spark.avi import encode_avi_mjpeg
    from vector_lake_spark.multimodal import extract_video_frames

    frames, payload = mp4_payload
    avi = encode_avi_mjpeg(frames[:2], 2, 24, 16)
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(avi))],
        "media_id long, payload binary",
    )
    out = extract_video_frames(df, every_ms=1000).collect()
    got = {(r["media_id"], r["frame_no"]): r for r in out}
    # mp4 @4fps sampled each 1000ms → frame 0 only... stride=4 → frame 0
    assert (1, 0) in got
    r = got[(1, 0)]
    assert (r["width"], r["height"]) == (24, 16)
    assert r["mean_r"] == 10.0
    # the AVI rows decode through the same operator
    assert (2, 0) in got and got[(2, 0)]["mean_r"] == 10.0


def test_audio_sample_entry_reports_no_dimensions():
    """An AudioSampleEntry's bytes at the visual w/h offsets are the
    samplerate halves — an audio track must report width=height=0, not
    width=48000 (r07 review)."""
    sounds = _fb(
        b"stsd", 0,
        struct.pack(">I", 1)
        + struct.pack(">I4s", 36, b"mp4a")
        + b"\x00" * 6 + struct.pack(">H", 1)
        + struct.pack(">HHHH", 0, 0, 2, 16)  # version, rev, channels, bits
        + struct.pack(">HH", 0, 0)
        + struct.pack(">I", 48000 << 16),  # 16.16 samplerate
    )
    stsz = _fb(b"stsz", 0, struct.pack(">II", 5, 3))
    stsc = _fb(
        b"stsc", 0, struct.pack(">I", 1) + struct.pack(">III", 1, 3, 1)
    )
    stco = _fb(b"stco", 0, struct.pack(">II", 1, 64))
    stts = _fb(b"stts", 0, struct.pack(">III", 1, 3, 1))
    stbl = _b(b"stbl", sounds + stts + stsc + stsz + stco)
    minf = _b(b"minf", stbl)
    hdlr = _fb(b"hdlr", 0, b"\x00" * 4 + b"soun" + b"\x00" * 12 + b"\x00")
    mdhd = _fb(
        b"mdhd", 0,
        struct.pack(">IIII", 0, 0, 48000, 144000)
        + struct.pack(">HH", 0x55C4, 0),
    )
    mdia = _b(b"mdia", mdhd + hdlr + minf)
    tkhd = _fb(
        b"tkhd", 0,
        struct.pack(">IIIII", 0, 0, 1, 0, 3)
        + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0x0100, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 0, 0),
    )
    trak = _b(b"trak", tkhd + mdia)
    mvhd = _fb(
        b"mvhd", 0,
        struct.pack(">IIII", 0, 0, 48000, 144000)
        + struct.pack(">IHH", 0x10000, 0x100, 0) + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    moov = _b(b"moov", mvhd + trak)
    ftyp = _b(b"ftyp", b"M4A " + struct.pack(">I", 0) + b"isom")
    info = probe_mp4(ftyp + moov)
    t = info["tracks"][0]
    assert t["handler"] == "soun" and t["codec"] == "mp4a"
    assert t["width"] == 0 and t["height"] == 0
    assert t["n_samples"] == 3
