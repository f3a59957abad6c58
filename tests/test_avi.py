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


# ---------------------------------------------------------------------------
# Microsoft RLE8 — the interframe delta codec (r09)
# ---------------------------------------------------------------------------

from vector_lake_spark.avi import _rle8_decode_frame, encode_avi_rle8


def _pal(n=16):
    i = np.arange(n, dtype=np.uint8)
    return np.stack([i * 16, 255 - i * 10, i * 3 + 7], axis=1)


def test_rle8_round_trip_exact():
    """RLE8 is lossless: every frame decodes bit-exact through the
    container, including delta frames."""
    rng = np.random.default_rng(31)
    pal = _pal()
    f0 = rng.integers(0, 16, (24, 32), dtype=np.uint8)
    f1 = f0.copy()
    f1[5:9, 10:20] = 3          # small patch changes
    f2 = f1.copy()
    f2[0, :] = 7                # top row (last DIB row) changes
    f3 = f2.copy()              # identical frame: pure persistence
    frames = [f0, f1, f2, f3]
    payload = encode_avi_rle8(frames, pal, fps=5)
    info, decoded = decode_avi_frames(payload)
    assert info["codec"] == "MRLE"
    assert info["n_frames"] == 4
    for (i, px), src in zip(decoded, frames):
        assert np.array_equal(px, pal[src]), i


def test_rle8_delta_frames_are_really_deltas():
    """The interframe claim, made falsifiable two ways: (1) a delta
    frame with a small change is far smaller than its keyframe;
    (2) decoding frame 2 alone still replays the chain — its unchanged
    pixels come from frames 0/1 content, which a from-scratch canvas
    would get wrong."""
    rng = np.random.default_rng(37)
    pal = _pal()
    f0 = rng.integers(0, 16, (40, 60), dtype=np.uint8)  # noisy keyframe
    f1 = f0.copy()
    f1[20, 30] = (f1[20, 30] + 1) % 16  # single-pixel change
    f2 = f1.copy()
    f2[21, 31] = (f2[21, 31] + 1) % 16
    payload = encode_avi_rle8([f0, f1, f2], pal, fps=5)
    info = probe_avi(payload)
    (o0, s0), (o1, s1), (o2, s2) = info["frames"]
    assert s1 < s0 / 10 and s2 < s0 / 10, (s0, s1, s2)
    _, [(i, px)] = decode_avi_frames(payload, [2])
    assert i == 2 and np.array_equal(px, pal[f2])
    # a from-scratch canvas really would differ: frame 2's own bytes
    # touch almost nothing
    fresh = np.zeros((40, 60), dtype=np.uint8)
    _rle8_decode_frame(payload[o2 : o2 + s2], fresh)
    assert not np.array_equal(pal[fresh], pal[f2])


def test_rle8_hand_fixture_absolute_and_delta():
    """Hand-assembled opcodes against the public BI_RLE8 spec: run,
    absolute mode (word-padded), delta skip, EOL, EOD."""
    # canvas 5 wide x 3 tall, previous content all 9
    canvas = np.full((3, 5), 9, dtype=np.uint8)
    data = bytes(
        [
            2, 5,          # bottom row: two pixels of 5
            0, 3, 1, 2, 3, 0,  # absolute: 1,2,3 (padded to word)
            0, 0,          # EOL
            0, 2, 2, 1,    # delta: right 2, up 1 -> skips a whole row
            1, 8,          # one pixel of 8 at (x=2, dib_y=2)
            0, 1,          # end of bitmap
        ]
    )
    _rle8_decode_frame(data, canvas)
    assert canvas.tolist() == [
        [9, 9, 8, 9, 9],   # top row (dib_y=2): delta landed at x=2
        [9, 9, 9, 9, 9],   # skipped row persists
        [5, 5, 1, 2, 3],   # bottom row: run then absolute mode
    ]


def test_rle8_validation_and_corruption():
    pal = _pal(4)
    with pytest.raises(ValueError, match="palette index"):
        encode_avi_rle8([np.full((4, 4), 9, dtype=np.uint8)], pal, fps=1)
    with pytest.raises(ValueError, match="palette must be"):
        encode_avi_rle8([np.zeros((4, 4), dtype=np.uint8)],
                        np.zeros((300, 3), dtype=np.uint8), fps=1)
    payload = encode_avi_rle8(
        [np.zeros((4, 4), dtype=np.uint8)], pal, fps=1
    )
    info = probe_avi(payload)
    off, size = info["frames"][0]
    # truncating the frame stream is corrupt, not a crash
    with pytest.raises(ValueError, match="RLE8"):
        _rle8_decode_frame(payload[off : off + 1], np.zeros((4, 4), np.uint8))


def test_rle8_probe_media_and_frame_sampler(spark):
    """The Arrow operators route RLE8 through the same dispatch: probe
    reports the codec; the frame sampler decodes the delta chain."""
    from vector_lake_spark.multimodal import extract_video_frames, probe_media

    pal = _pal()
    f0 = np.zeros((8, 8), dtype=np.uint8)
    f1 = f0.copy()
    f1[:, :4] = 2
    payload = encode_avi_rle8([f0, f1], pal, fps=1)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    probe = probe_media(df).collect()[0]
    assert probe["codec"] == "MRLE" and probe["decodable"]
    rows = extract_video_frames(df, every_ms=1000).collect()
    assert [r["frame_no"] for r in rows] == [0, 1]
    want = pal[f1].reshape(-1, 3).mean(axis=0)
    got = [rows[1]["mean_r"], rows[1]["mean_g"], rows[1]["mean_b"]]
    assert np.allclose(got, want, atol=0.01)


def test_rle8_encode_bit_identical_to_r12():
    """r13: the vectorized frame-comparison + palette-quad rewrite must
    emit byte-identical AVIs to the verbatim pre-r13 per-row logic,
    across keyframes, unchanged rows, changed prefixes and tiny runs."""
    import numpy as np

    from vector_lake_spark.avi import _rle8_encode_frame, encode_avi_rle8

    def r12_frame(cur, prev):
        h, w = cur.shape
        out = bytearray()
        rows = range(h - 1, -1, -1)
        if prev is not None:
            changed = [
                y for y in rows if not np.array_equal(cur[y], prev[y])
            ]
            last_dib = (h - 1 - changed[-1]) if changed else -1
        else:
            last_dib = h - 1
        for dib_y in range(last_dib + 1):
            y = h - 1 - dib_y
            row = cur[y]
            x = 0
            if prev is not None and np.array_equal(row, prev[y]):
                out += b"\x00\x00"
                continue
            if prev is not None:
                diff = np.flatnonzero(row != prev[y])
                skip = int(diff[0]) if diff.size else 0
                while skip >= 4:
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
                lit_start = x
                while x < w and x - lit_start < 254:
                    run = 1
                    while (
                        x + run < w and run < 255
                        and row[x + run] == row[x]
                    ):
                        run += 1
                    if run >= 3:
                        break
                    x += run
                n = x - lit_start
                if n < 3:
                    for xi in range(lit_start, x):
                        out += bytes((1, int(row[xi])))
                    continue
                out += bytes((0, n)) + row[lit_start:x].tobytes()
                if n % 2:
                    out += b"\x00"
            out += b"\x00\x00"
        out += b"\x00\x01"
        return bytes(out)

    rng = np.random.default_rng(3)
    h, w = 18, 29
    prev = None
    for trial in range(8):
        cur = rng.integers(0, 5, (h, w)).astype(np.uint8) * 37
        if trial % 3 == 1 and prev is not None:
            cur[::2] = prev[::2]  # unchanged rows
        assert _rle8_encode_frame(cur, prev) == r12_frame(cur, prev), trial
        prev = cur
