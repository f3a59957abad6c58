"""Matroska/WebM probe (`vector_lake_spark.mkv`): EBML parsing against
HAND-ASSEMBLED elements built from RFC 8794 + the public Matroska
registry (spec-derived by construction, independent of the r08 muxer),
plus the minimal muxer's round trip and the loud decode gate."""

import struct

import pytest

from vector_lake_spark.mkv import (
    decode_mkv_frames,
    encode_mkv_mjpeg,
    is_mkv,
    probe_mkv,
)


def _vint_size(n: int) -> bytes:
    """Encode n as a minimal EBML size VINT."""
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            v = n | (1 << (7 * length))
            return v.to_bytes(length, "big")
    raise ValueError(n)


def _el(eid: int, body: bytes) -> bytes:
    # element ids are written verbatim (marker bit included)
    id_bytes = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    return id_bytes + _vint_size(len(body)) + body


def _uint_el(eid: int, v: int, width: int = 0) -> bytes:
    w = width or max(1, (v.bit_length() + 7) // 8)
    return _el(eid, v.to_bytes(w, "big"))


def _mkv_fixture(doc_type=b"matroska", unknown_segment_size=False) -> bytes:
    ebml = _el(0x1A45DFA3, _el(0x4282, doc_type))
    info = _el(
        0x1549A966,
        _uint_el(0x2AD7B1, 1_000_000)  # timescale 1ms
        + _el(0x4489, struct.pack(">d", 4500.0)),  # duration 4500 ticks
    )
    video_track = _el(
        0xAE,
        _uint_el(0xD7, 1)
        + _uint_el(0x83, 1)  # video
        + _el(0x86, b"V_VP9")
        + _el(0xE0, _uint_el(0xB0, 640) + _uint_el(0xBA, 360)),
    )
    audio_track = _el(
        0xAE,
        _uint_el(0xD7, 2)
        + _uint_el(0x83, 2)  # audio
        + _el(0x86, b"A_OPUS")
        + _el(
            0xE1,
            _el(0xB5, struct.pack(">f", 48000.0)) + _uint_el(0x9F, 2),
        ),
    )
    tracks = _el(0x1654AE6B, video_track + audio_track)
    # two clusters, three SimpleBlocks total; block payloads are opaque
    blk = _el(0xA3, b"\x81\x00\x00\x80" + b"\xde\xad\xbe\xef")
    cluster1 = _el(0x1F43B675, _uint_el(0xE7, 0) + blk + blk)
    cluster2 = _el(0x1F43B675, _uint_el(0xE7, 3000) + blk)
    seg_body = info + tracks + cluster1 + cluster2
    if unknown_segment_size:
        seg = (
            (0x18538067).to_bytes(4, "big") + b"\xff" + seg_body
        )  # 1-byte all-ones size VINT = unknown
    else:
        seg = _el(0x18538067, seg_body)
    return ebml + seg


def test_probe_reads_everything_without_block_decode():
    info = probe_mkv(_mkv_fixture())
    assert info["doc_type"] == "matroska"
    assert info["timescale_ns"] == 1_000_000
    assert info["duration_ms"] == 4500
    assert info["n_tracks"] == 2
    v, a = info["tracks"]
    assert (v["track_type"], v["codec"], v["width"], v["height"]) == (
        1, "V_VP9", 640, 360,
    )
    assert (a["track_type"], a["codec"], a["channels"]) == (2, "A_OPUS", 2)
    assert a["sample_rate"] == 48000.0
    assert info["n_clusters"] == 2 and info["n_blocks"] == 3


def test_webm_doctype():
    assert probe_mkv(_mkv_fixture(doc_type=b"webm"))["doc_type"] == "webm"


def test_unknown_segment_size_streamed_file():
    info = probe_mkv(_mkv_fixture(unknown_segment_size=True))
    assert info["duration_ms"] == 4500 and info["n_blocks"] == 3


def test_not_mkv_raises():
    assert not is_mkv(b"RIFF....AVI ")
    with pytest.raises(ValueError, match="EBML magic"):
        probe_mkv(b"\x00\x01\x02\x03")


def test_truncated_element_raises():
    payload = _mkv_fixture()
    with pytest.raises(ValueError, match="corrupt EBML"):
        probe_mkv(payload[: len(payload) - 5])


def test_decode_gates_by_name_listing_codecs():
    with pytest.raises(NotImplementedError) as ei:
        decode_mkv_frames(_mkv_fixture())
    msg = str(ei.value)
    assert "A_OPUS" in msg and "V_VP9" in msg and "probe_mkv" in msg


def test_probe_media_unified_operator(spark):
    import numpy as np

    from vector_lake_spark.avi import encode_avi_mjpeg
    from vector_lake_spark.jpeg import encode_jpeg
    from vector_lake_spark.mp4 import encode_mp4_mjpeg
    from vector_lake_spark.multimodal import probe_media

    frames = [
        encode_jpeg(np.full((16, 24), v, dtype=np.uint8), 100)
        for v in (10, 200)
    ]
    rows = [
        (1, bytearray(encode_avi_mjpeg(frames, 2, 24, 16))),
        (2, bytearray(encode_mp4_mjpeg(frames, 2, 24, 16))),
        (3, bytearray(_mkv_fixture())),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in probe_media(df).collect()}
    assert got[1]["container"] == "avi" and got[1]["decodable"]
    assert got[1]["n_frames"] == 2 and got[1]["duration_ms"] == 1000
    assert got[2]["container"] == "mp4" and got[2]["codec"] == "jpeg"
    assert got[2]["decodable"] and got[2]["n_frames"] == 2
    assert got[3]["container"] == "matroska" and got[3]["codec"] == "V_VP9"
    assert not got[3]["decodable"]
    assert (got[3]["width"], got[3]["height"]) == (640, 360)
    assert got[3]["duration_ms"] == 4500 and got[3]["n_frames"] == 3


def test_unknown_cluster_sizes_do_not_swallow_siblings():
    """Streamed muxers (ffmpeg live) write unknown-size CLUSTERS too:
    per RFC 8794 §6.2 each ends at the first non-child id, so a
    following sibling Cluster must still be counted (r07 review — the
    first implementation extended unknown-size elements to the
    enclosing end and reported n_clusters=1)."""
    ebml = _el(0x1A45DFA3, _el(0x4282, b"webm"))
    info = _el(
        0x1549A966,
        _uint_el(0x2AD7B1, 1_000_000)
        + _el(0x4489, struct.pack(">d", 2000.0)),
    )
    track = _el(
        0xAE,
        _uint_el(0xD7, 1) + _uint_el(0x83, 1) + _el(0x86, b"V_VP8")
        + _el(0xE0, _uint_el(0xB0, 320) + _uint_el(0xBA, 240)),
    )
    tracks = _el(0x1654AE6B, track)
    blk = _el(0xA3, b"\x81\x00\x00\x80" + b"\x00\x01\x02")
    def unknown_cluster(body):
        return (0x1F43B675).to_bytes(4, "big") + b"\xff" + body
    c1 = unknown_cluster(_uint_el(0xE7, 0) + blk + blk)
    c2 = unknown_cluster(_uint_el(0xE7, 1000) + blk)
    seg = (0x18538067).to_bytes(4, "big") + b"\xff" + info + tracks + c1 + c2
    out = probe_mkv(ebml + seg)
    assert out["n_clusters"] == 2
    assert out["n_blocks"] == 3


# ---------------------------------------------------------------------------
# Minimal muxer (r08) — the writer side of the container-probe oracle
# ---------------------------------------------------------------------------


def test_muxer_probe_round_trip_swept_geometries():
    frame = b"\xff\xd8fake-jpeg\xff\xd9"
    for n, fps, w, h in [(1, 2, 8, 8), (5, 3, 16, 12), (8, 4, 320, 240),
                         (7, 3, 1, 1)]:
        payload = encode_mkv_mjpeg([frame] * n, fps, w, h)
        assert is_mkv(payload)
        info = probe_mkv(payload)
        assert info["doc_type"] == "matroska"
        assert info["duration_ms"] == n * 1000 // fps
        assert info["n_clusters"] == 1 and info["n_blocks"] == n
        (t,) = info["tracks"]
        assert t["track_type"] == 1 and t["codec"] == "V_MJPEG"
        assert t["width"] == w and t["height"] == h


def test_muxer_blocks_carry_frames_verbatim():
    """Each SimpleBlock body is track VINT + int16 timestamp + flags +
    the frame bytes unchanged — checked by re-walking the EBML tree
    with the test's own spec-derived walker, not the muxer's."""
    frames = [b"AA", b"BBB", b"CCCC"]
    payload = encode_mkv_mjpeg(frames, 2, 4, 4)
    # walk: skip EBML header, enter Segment, find Cluster, read blocks
    from vector_lake_spark.mkv import _elements

    bodies = []
    for eid, s, e in _elements(payload, 0, len(payload)):
        if eid != 0x18538067:
            continue
        for sid, ss, se in _elements(payload, s, e):
            if sid != 0x1F43B675:
                continue
            for cid, cs, ce in _elements(payload, ss, se):
                if cid == 0xA3:
                    bodies.append(payload[cs:ce])
    assert [b[4:] for b in bodies] == frames
    # keyframe flag set, track number VINT = 0x81, ts in ms
    for i, b in enumerate(bodies):
        assert b[0] == 0x81 and b[3] == 0x80
        assert struct.unpack(">h", b[1:3])[0] == i * 1000 // 2


def test_muxer_rejects_bad_inputs():
    with pytest.raises(ValueError, match="at least one frame"):
        encode_mkv_mjpeg([], 2, 8, 8)
    with pytest.raises(ValueError, match="fps must be positive"):
        encode_mkv_mjpeg([b"x"], 0, 8, 8)


# ---------------------------------------------------------------------------
# V_MJPEG block decode — late r09: the intraframe gate-close
# ---------------------------------------------------------------------------


def _mjpeg_mkv(values=(10, 120, 250), fps=5, w=24, h=16):
    import numpy as np

    from vector_lake_spark.jpeg import encode_jpeg
    from vector_lake_spark.mkv import encode_mkv_mjpeg

    frames = [
        encode_jpeg(np.full((h, w), v, dtype=np.uint8), 100) for v in values
    ]
    return encode_mkv_mjpeg(frames, fps=fps, width=w, height=h)


def test_vmjpeg_blocks_decode_exactly():
    import numpy as np

    p = _mjpeg_mkv()
    info, out = decode_mkv_frames(p)
    assert info["blocks_by_track"] == {1: 3}
    assert [px[0, 0] for _, px in out] == [10, 120, 250]
    assert all(px.shape == (16, 24) for _, px in out)
    # selective decode touches only requested frames
    _, sampled = decode_mkv_frames(p, [2])
    assert sampled == [(2, sampled[0][1])] and sampled[0][1][0, 0] == 250
    assert np.array_equal(sampled[0][1], out[2][1])


def test_vmjpeg_blockgroup_form_decodes():
    """Blocks wrapped in BlockGroup (0xA0 > 0xA1) decode the same as
    SimpleBlocks — real muxers emit both forms. Splices a BlockGroup
    cluster into the Segment body of a muxed one-frame file; both the
    per-track count and n_blocks must see TWO frames."""
    import numpy as np

    from vector_lake_spark.jpeg import encode_jpeg

    frame = encode_jpeg(np.full((16, 24), 99, dtype=np.uint8), 100)
    block_body = b"\x81\x00\x00\x00" + frame
    block = b"\xa1" + _vint_size(len(block_body)) + block_body
    group = b"\xa0" + _vint_size(len(block)) + block
    cluster = _el(0x1F43B675, _uint_el(0xE7, 200) + group)
    base = _mjpeg_mkv(values=(77,))
    seg_id = (0x18538067).to_bytes(4, "big")
    j = base.find(seg_id)
    # existing segment: id + size vint + body; re-emit with new body
    from vector_lake_spark.mkv import _read_vint

    size, body_start, _ = _read_vint(base, j + 4, keep_marker=False)
    body = base[body_start : body_start + size] + cluster
    rebuilt = base[:j] + seg_id + _vint_size(len(body)) + body
    info, out = decode_mkv_frames(rebuilt)
    assert info["blocks_by_track"] == {1: 2}
    assert info["n_blocks"] == 2  # BlockGroup blocks count as frames too
    assert [px[0, 0] for _, px in out] == [77, 99]


def _laced_mjpeg_mkv(values, lacing, w=24, h=16, fps=3):
    import numpy as np

    from vector_lake_spark.jpeg import encode_jpeg

    frames = [
        encode_jpeg(np.full((h, w), v, dtype=np.uint8), 100) for v in values
    ]
    return (
        encode_mkv_mjpeg(frames, fps=fps, width=w, height=h, lacing=lacing),
        frames,
    )


@pytest.mark.parametrize("lacing", ["xiph", "ebml", "fixed"])
def test_laced_blocks_decode(lacing):
    """r10 closes the lacing gate: all three schemes round-trip through
    one laced SimpleBlock — the probe counts FRAMES (not blocks, r09
    advice) and every laced frame decodes pixel-exact. Fixed lacing
    uses identical frames (equal JPEG sizes by construction); Xiph/EBML
    use differing content so the size tables are non-trivial (24×16
    q100 JPEGs are >255 bytes, so Xiph exercises its 0xFF runs)."""
    values = (99, 99, 99) if lacing == "fixed" else (10, 120, 250)
    p, frames = _laced_mjpeg_mkv(values, lacing)
    info = probe_mkv(p)
    assert info["n_clusters"] == 1
    assert info["n_blocks"] == 3  # laced frames counted via lace header
    assert info["blocks_by_track"] == {1: 3}
    _, out = decode_mkv_frames(p)
    assert [px[0, 0] for _, px in out] == list(values)
    assert all(px.shape == (16, 24) for _, px in out)
    # selective decode indexes across lace boundaries
    _, sampled = decode_mkv_frames(p, [2])
    assert sampled[0][0] == 2 and sampled[0][1][0, 0] == values[2]


def test_laced_corruption_raises():
    import numpy as np

    from vector_lake_spark.jpeg import encode_jpeg
    from vector_lake_spark.mkv import _block_frame_slices, _laced_block_body

    a = encode_jpeg(np.full((16, 24), 7, dtype=np.uint8), 100)
    b = encode_jpeg(np.full((16, 24), 200, dtype=np.uint8), 100)
    # muxer refuses fixed lacing over unequal frames
    if len(a) != len(b):
        with pytest.raises(ValueError, match="equal-size"):
            _laced_block_body([a, b], "fixed")
    # fixed lacing whose payload does not divide evenly: lace count byte
    # says 2 frames, 7 payload bytes remain
    body = bytes([1]) + b"\x00" * 7
    with pytest.raises(ValueError, match="does not divide"):
        _block_frame_slices(body, 0, len(body), 0x04)
    # truncated Xiph size table (run byte 0xFF then nothing)
    with pytest.raises(ValueError, match="truncated Xiph"):
        _block_frame_slices(bytes([1, 255]), 0, 2, 0x02)
    # Xiph size overrunning the block payload
    with pytest.raises(ValueError, match="overruns"):
        _block_frame_slices(bytes([1, 200]) + b"\x00" * 10, 0, 12, 0x02)
    # a lace size byte inflated in a real muxed file surfaces as corrupt
    p2, _frames = _laced_mjpeg_mkv((10, 120, 250), "xiph")
    i = p2.find(b"\xa3", p2.find(b"\x1f\x43\xb6\x75"))
    from vector_lake_spark.mkv import _read_vint

    _, body_start, _ = _read_vint(p2, i + 1, keep_marker=False)
    bad = bytearray(p2)
    # first Xiph size byte after trackno(1)+ts(2)+flags(1)+count(1)
    bad[body_start + 5] = 0xFE  # inflate a lace run byte
    with pytest.raises(ValueError):
        decode_mkv_frames(bytes(bad))


def test_extract_video_frames_mkv(spark):
    from vector_lake_spark.multimodal import extract_video_frames

    p = _mjpeg_mkv(values=(10, 120, 250, 30, 200), fps=5)
    df = spark.createDataFrame(
        [(1, bytearray(p))], "media_id long, payload binary"
    )
    out = extract_video_frames(df, every_ms=400).collect()
    # 5 fps, 400 ms stride -> every 2nd frame: 0, 2, 4
    assert [r["frame_no"] for r in out] == [0, 2, 4]
    assert [r["mean_r"] for r in out] == [10.0, 250.0, 200.0]
    assert out[0]["offset_ms"] == 0 and out[1]["offset_ms"] == 400


def test_mixed_codec_video_tracks_sample_the_mjpeg_one(spark):
    """Review finding: an MKV whose FIRST video track is interframe but
    whose second is V_MJPEG must sample and decode the V_MJPEG track
    (probe_media must call it decodable, too)."""
    import numpy as np

    from vector_lake_spark.jpeg import encode_jpeg
    from vector_lake_spark.mkv import _read_vint as _rv, probe_mkv
    from vector_lake_spark.multimodal import extract_video_frames, probe_media

    base = _mjpeg_mkv(values=(10, 200), fps=4)
    # splice a V_VP9 TrackEntry in FRONT of the muxed MJPEG track, so
    # video[0] is the interframe track and the old video[0]-based
    # sampling would raise/undersample
    vp9_track = _el(
        0xAE,
        _uint_el(0xD7, 2)
        + _uint_el(0x83, 1)  # video
        + _el(0x86, b"V_VP9")
        + _el(0xE0, _uint_el(0xB0, 24) + _uint_el(0xBA, 16)),
    )
    i = base.find((0x1654AE6B).to_bytes(4, "big"))
    size, body_start, _ = _rv(base, i + 4, keep_marker=False)
    tracks_body = base[body_start : body_start + size]
    # VP9 entry FIRST, so video[0] is the interframe track
    new_tracks = (
        (0x1654AE6B).to_bytes(4, "big")
        + _vint_size(len(vp9_track + tracks_body))
        + vp9_track
        + tracks_body
    )
    seg_id = (0x18538067).to_bytes(4, "big")
    j = base.find(seg_id)
    ssize, sbody, _ = _rv(base, j + 4, keep_marker=False)
    seg_body = base[sbody : sbody + ssize].replace(
        base[i : body_start + size], new_tracks
    )
    rebuilt = base[:j] + seg_id + _vint_size(len(seg_body)) + seg_body
    info = probe_mkv(rebuilt)
    assert [t["codec"] for t in info["tracks"] if t["track_type"] == 1] == [
        "V_VP9", "V_MJPEG",
    ]
    df = spark.createDataFrame(
        [(1, bytearray(rebuilt))], "media_id long, payload binary"
    )
    out = extract_video_frames(df, every_ms=250).collect()
    assert [r["mean_r"] for r in out] == [10.0, 200.0]
    probe = probe_media(df).collect()[0]
    assert probe["decodable"] is True


def test_ebml_lace_table_truncated_at_payload_end():
    """Review fix: an EBML lace table cut exactly at the payload end
    must raise the corrupt-stream ValueError, not IndexError."""
    from vector_lake_spark.mkv import _block_frame_slices

    # body: lace count 2 (3 frames) then nothing — table truncated
    body = bytes([2])
    with pytest.raises(ValueError, match="truncated EBML"):
        _block_frame_slices(body, 0, len(body), 0x06)
    # one VINT present, second missing
    body2 = bytes([2, 0x85])
    with pytest.raises(ValueError, match="truncated EBML"):
        _block_frame_slices(body2, 0, len(body2), 0x06)
