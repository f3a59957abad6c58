"""Baseline JPEG codec (`vector_lake_spark.jpeg`): exact round trips
where the math is exact, PSNR floors where quantization is lossy, loud
gates for the unsupported subset, and the Arrow operator path.

Both ends are this module (the encoder exists for exactly this reason),
so exactness claims are provable without a reference binary: at quality
100 the quant tables are all ones and DC-only blocks are integer
arithmetic end-to-end."""

import numpy as np
import pytest

from vector_lake_spark.jpeg import (
    ZIGZAG,
    decode_jpeg,
    decode_jpeg_pixels,
    encode_jpeg,
)


def test_zigzag_is_the_standard_scan():
    assert len(ZIGZAG) == 64 and len(set(ZIGZAG)) == 64
    assert ZIGZAG[:6] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2)]
    assert ZIGZAG[-1] == (7, 7)


def test_constant_gray_exact_at_q100():
    img = np.full((16, 24), 77, dtype=np.uint8)
    assert np.array_equal(decode_jpeg_pixels(encode_jpeg(img, 100)), img)


def test_dc_prediction_chain_exact_at_q100():
    img = np.zeros((8, 32), dtype=np.uint8)
    for i, v in enumerate([40, 200, 10, 255]):
        img[:, i * 8 : (i + 1) * 8] = v
    assert np.array_equal(decode_jpeg_pixels(encode_jpeg(img, 100)), img)


def test_odd_dimensions_exact_at_q100():
    img = np.full((9, 13), 130, dtype=np.uint8)
    out = decode_jpeg_pixels(encode_jpeg(img, 100))
    assert out.shape == (9, 13)
    assert np.array_equal(out, img)


def test_rgb_gradient_psnr_floor():
    h, w = 40, 56
    rgb = np.stack(
        [
            np.linspace(0, 200, w)[None, :].repeat(h, 0),
            np.linspace(30, 220, h)[:, None].repeat(w, 1),
            np.full((h, w), 128.0),
        ],
        axis=2,
    ).astype(np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(rgb, 90))
    assert dec.shape == (h, w, 3)
    mse = float(((dec.astype(float) - rgb.astype(float)) ** 2).mean())
    psnr = 10 * np.log10(255**2 / mse)
    assert psnr > 35, psnr


def test_noise_image_round_trips_within_quant_error():
    """Random noise is the quantizer's worst case — still bounded."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(24, 24, 3)).astype(np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(img, 95))
    mse = float(((dec.astype(float) - img.astype(float)) ** 2).mean())
    assert 10 * np.log10(255**2 / mse) > 20


def test_stats_shape_matches_image_contract():
    img = np.full((10, 12, 3), 50, dtype=np.uint8)
    img[:, :, 1] = 100
    d = decode_jpeg(encode_jpeg(img, 100))
    assert (d["width"], d["height"]) == (12, 10)
    assert (d["mean_r"], d["mean_g"], d["mean_b"]) == (50.0, 100.0, 50.0)


def test_unsupported_features_raise_loudly():
    img = np.full((8, 8), 9, dtype=np.uint8)
    payload = bytearray(encode_jpeg(img, 100))
    # flip SOF0 -> SOF2 (progressive)
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg_pixels(bytes(payload))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_pixels(b"nonsense")
    # sampling factor 3 is past the 1..2 decode subset
    payload = bytearray(encode_jpeg(img, 100))
    i = payload.find(b"\xff\xc0")
    payload[i + 11] = 0x33  # Hi=3, Vi=3
    with pytest.raises(NotImplementedError, match="sampling factors"):
        decode_jpeg_pixels(bytes(payload))


def test_jpeg_through_spark_arrow_boundary(spark):
    from vector_lake_spark.multimodal import extract_jpeg_features

    px1 = np.full((6, 4, 3), 0, dtype=np.uint8)
    px1[:, :, 0] = 200
    px2 = np.full((16, 16), 77, dtype=np.uint8)
    rows = [
        (1, bytearray(encode_jpeg(px1, 100))),
        (2, bytearray(encode_jpeg(px2, 100))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in extract_jpeg_features(df).collect()}
    assert (out[1]["width"], out[1]["height"]) == (4, 6)
    assert (out[1]["mean_r"], out[1]["mean_g"], out[1]["mean_b"]) == (
        200.0,
        0.0,
        0.0,
    )
    assert out[2]["mean_r"] == 77.0


def test_dispatch_recognizes_jpeg():
    from vector_lake_spark.multimodal import _decode_image

    img = np.full((8, 8), 5, dtype=np.uint8)
    d = _decode_image(encode_jpeg(img, 100))
    assert (d["width"], d["height"], d["mean_r"]) == (8, 8, 5.0)


def test_420_subsampled_round_trip():
    """4:2:0 — 4 Y blocks + Cb + Cr per MCU, chroma 2x2-averaged at
    encode and nearest-upsampled at decode. Gray content is exact at
    q100 (chroma planes are constant 128 — averaging is lossless);
    colored gradients clear a PSNR floor."""
    gray_rgb = np.full((20, 28, 3), 90, dtype=np.uint8)
    out = decode_jpeg_pixels(encode_jpeg(gray_rgb, 100, subsample=True))
    assert out.shape == (20, 28, 3)
    assert np.array_equal(out, gray_rgb)

    h, w = 32, 48
    rgb = np.stack(
        [
            np.linspace(0, 200, w)[None, :].repeat(h, 0),
            np.linspace(30, 220, h)[:, None].repeat(w, 1),
            np.full((h, w), 128.0),
        ],
        axis=2,
    ).astype(np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(rgb, 90, subsample=True))
    mse = float(((dec.astype(float) - rgb.astype(float)) ** 2).mean())
    assert 10 * np.log10(255**2 / mse) > 30
    # the 4:2:0 file is genuinely smaller (half the chroma blocks)
    assert len(encode_jpeg(rgb, 90, subsample=True)) < len(
        encode_jpeg(rgb, 90)
    )


def test_420_odd_dimensions():
    img = np.full((17, 23, 3), 64, dtype=np.uint8)
    out = decode_jpeg_pixels(encode_jpeg(img, 100, subsample=True))
    assert out.shape == (17, 23, 3)
    assert np.array_equal(out, img)


def test_restart_intervals_round_trip():
    """DRI/RSTn: encoder emits a restart marker every n MCUs (byte
    re-alignment + DC predictor reset), decoder honors them — exact
    round trip at q100 across several intervals, including 4:2:0."""
    img = np.zeros((8, 64), dtype=np.uint8)
    for i, v in enumerate([10, 60, 110, 160, 210, 255, 5, 95]):
        img[:, i * 8 : (i + 1) * 8] = v
    payload = encode_jpeg(img, 100, restart_interval=3)
    assert b"\xff\xdd" in payload and b"\xff\xd0" in payload
    assert np.array_equal(decode_jpeg_pixels(payload), img)

    rgb = np.full((32, 48, 3), 120, dtype=np.uint8)
    p2 = encode_jpeg(rgb, 100, subsample=True, restart_interval=2)
    assert np.array_equal(decode_jpeg_pixels(p2), rgb)
    # corrupted restart marker fails loudly, not silently
    broken = bytearray(payload)
    i = broken.find(b"\xff\xd0")
    broken[i + 1] = 0xD7  # wrong RST index
    with pytest.raises(ValueError, match="restart marker"):
        decode_jpeg_pixels(bytes(broken))


def test_fill_bytes_and_tem_markers_are_skipped():
    """ISO 10918-1 B.1.1.2 allows any run of 0xFF fill bytes before a
    marker, and TEM (0xFF01) carries no length field — both must be
    skipped, not parsed as a segment (r06 review)."""
    img = np.full((8, 8), 42, dtype=np.uint8)
    payload = encode_jpeg(img, 100)
    # inject fill bytes + a TEM marker right after SOI
    patched = payload[:2] + b"\xff\xff\xff" + b"\xff\x01" + payload[2:]
    assert np.array_equal(decode_jpeg_pixels(patched), img)
