"""MJPEG-in-AVI container codec — real video decode, zero external deps
(container: stdlib struct; frames: the repo's own JPEG codec)."""

import numpy as np
import pytest

from vector_lake_spark.avi import (
    decode_avi_frames,
    encode_avi_mjpeg,
    probe_avi,
)
from vector_lake_spark.jpeg import encode_jpeg


def _const_frame(r, g, b, w=32, h=24):
    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[:, :, 0], px[:, :, 1], px[:, :, 2] = r, g, b
    return px


FRAMES_RGB = [(200, 30, 60), (10, 220, 40), (5, 15, 240), (128, 128, 128)]


@pytest.fixture(scope="module")
def avi_payload():
    jpegs = [
        encode_jpeg(_const_frame(*rgb), quality=100) for rgb in FRAMES_RGB
    ]
    return encode_avi_mjpeg(jpegs, fps=2, width=32, height=24)


def test_probe_reads_header_without_decoding(avi_payload):
    info = probe_avi(avi_payload)
    assert info["width"] == 32 and info["height"] == 24
    assert info["n_frames"] == len(FRAMES_RGB)
    assert info["fps"] == 2.0
    assert info["duration_ms"] == 2000
    # frame table carries (offset, length) slices into the payload
    for off, size in info["frames"]:
        assert avi_payload[off : off + 2] == b"\xff\xd8"
        assert size > 0


def test_round_trip_exact_pixels(avi_payload):
    """Quality-100 constant frames survive container + codec EXACTLY —
    the same provable-exactness contract jpeg.py establishes."""
    _, frames = decode_avi_frames(avi_payload)
    assert [f[0] for f in frames] == list(range(len(FRAMES_RGB)))
    for (fno, px), rgb in zip(frames, FRAMES_RGB):
        assert px.shape == (24, 32, 3)
        expect = _const_frame(*rgb)
        assert np.array_equal(px, expect), (fno, rgb)


def test_selective_decode_touches_only_requested_frames(avi_payload):
    _, frames = decode_avi_frames(avi_payload, [2])
    assert len(frames) == 1 and frames[0][0] == 2
    assert np.array_equal(frames[0][1], _const_frame(*FRAMES_RGB[2]))
    with pytest.raises(IndexError):
        decode_avi_frames(avi_payload, [99])


def test_non_mjpeg_handler_raises_by_name():
    jpegs = [encode_jpeg(_const_frame(1, 2, 3), quality=100)]
    payload = bytearray(encode_avi_mjpeg(jpegs, fps=1, width=32, height=24))
    pos = payload.find(b"vids") + 4
    payload[pos : pos + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        probe_avi(bytes(payload))


def test_not_an_avi_raises():
    with pytest.raises(ValueError, match="not an AVI"):
        probe_avi(b"RIFF\x00\x00\x00\x00WAVE")


def test_extract_video_frames_arrow_end_to_end(spark, avi_payload):
    """The Spark operator: probe → timeline sample → decode ONLY the
    sampled frames through Arrow; exact channel means per frame."""
    from vector_lake_spark.multimodal import extract_video_frames

    df = spark.createDataFrame(
        [(7, "video", bytearray(avi_payload))],
        "media_id long, kind string, payload binary",
    )
    # fps=2, every_ms=1000 → stride 2 → frames 0 and 2
    out = extract_video_frames(df, every_ms=1000).collect()
    assert [(r["frame_no"], r["offset_ms"]) for r in out] == [
        (0, 0),
        (2, 1000),
    ]
    for r, rgb in zip(out, [FRAMES_RGB[0], FRAMES_RGB[2]]):
        assert (r["width"], r["height"]) == (32, 24)
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == tuple(
            float(c) for c in rgb
        )


def test_truncated_payload_raises_named_container_error(avi_payload):
    with pytest.raises(ValueError, match="truncated AVI"):
        probe_avi(avi_payload[:-10])


def test_headerless_avi_refuses_blind_decode():
    """An AVI with frame chunks but no 'vids' strh must refuse — the
    codec cannot be validated, so frames never reach the JPEG decoder
    blind."""
    from vector_lake_spark.avi import _chunk, _list

    jpeg = encode_jpeg(_const_frame(1, 2, 3), quality=100)
    payload = _chunk(
        b"RIFF", b"AVI " + _list(b"movi", _chunk(b"00dc", jpeg))
    )
    with pytest.raises(NotImplementedError, match="vids"):
        probe_avi(payload)


def test_second_stream_chunks_never_reach_frame_table(avi_payload):
    """A second stream's '01dc' chunks (another codec) must not
    interleave into the validated MJPG stream's frame numbering."""
    import struct as _struct

    from vector_lake_spark.avi import _chunk

    # splice a 01dc garbage chunk into the movi list
    movi_pos = avi_payload.find(b"movi")
    insert_at = movi_pos + 4
    extra = _chunk(b"01dc", b"\x00" * 10)
    patched = bytearray(
        avi_payload[:insert_at] + extra + avi_payload[insert_at:]
    )
    # grow the RIFF and movi LIST sizes to stay consistent
    (riff_sz,) = _struct.unpack_from("<I", patched, 4)
    _struct.pack_into("<I", patched, 4, riff_sz + len(extra))
    (movi_sz,) = _struct.unpack_from("<I", patched, movi_pos - 8 + 4)
    _struct.pack_into(
        "<I", patched, movi_pos - 8 + 4, movi_sz + len(extra)
    )
    info = probe_avi(bytes(patched))
    assert info["n_frames"] == len(FRAMES_RGB)
    _, frames = decode_avi_frames(bytes(patched))
    for (fno, px), rgb in zip(frames, FRAMES_RGB):
        assert np.array_equal(px, _const_frame(*rgb)), fno


def test_zero_rate_avi_raises_in_operator(spark, avi_payload):
    """dwRate=0 + dwMicroSecPerFrame=0: the operator must refuse to
    fabricate timestamps from an invented rate."""
    import struct as _struct

    from vector_lake_spark.multimodal import extract_video_frames

    patched = bytearray(avi_payload)
    strh = patched.find(b"vids")
    # dwScale/dwRate sit 20 bytes into the strh body
    _struct.pack_into("<II", patched, strh + 20, 0, 0)
    avih = patched.find(b"avih") + 8
    _struct.pack_into("<I", patched, avih, 0)  # dwMicroSecPerFrame = 0
    df = spark.createDataFrame(
        [(1, "video", bytes(patched))],
        "media_id long, kind string, payload binary",
    )
    with pytest.raises(Exception, match="usable frame rate"):
        extract_video_frames(df, every_ms=1000).collect()
