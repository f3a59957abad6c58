"""CCITT fax codecs (`vector_lake_spark.fax`) and their TIFF wiring.

Round trips prove encoder/decoder consistency; the codeword pins prove
the T.4 tables against the public spec directly (a transcription slip
in a shared table would round-trip fine — the pins catch it)."""

import struct

import numpy as np
import pytest

from vector_lake_spark.fax import (
    _BLACK_TERM,
    _EXT_MAKEUP,
    _WHITE_MAKEUP,
    _WHITE_TERM,
    decode_fax,
    encode_fax,
)
from vector_lake_spark.tiff import decode_tiff_pixels, encode_tiff, probe_tiff


def test_spec_codeword_pins():
    """Well-known T.4 codewords, transcribed independently of the
    table build: short terminating codes, the 1664 white make-up
    oddity (6 bits), EOL-adjacent extended make-ups."""
    assert _WHITE_TERM[0] == "00110101"
    assert _WHITE_TERM[1] == "000111"
    assert _WHITE_TERM[2] == "0111"
    assert _WHITE_TERM[3] == "1000"
    assert _WHITE_TERM[63] == "00110100"
    assert _BLACK_TERM[0] == "0000110111"
    assert _BLACK_TERM[1] == "010"
    assert _BLACK_TERM[2] == "11"
    assert _BLACK_TERM[3] == "10"
    assert _BLACK_TERM[4] == "011"
    assert _WHITE_MAKEUP[64] == "11011"
    assert _WHITE_MAKEUP[1664] == "011000"
    assert _EXT_MAKEUP[1792] == "00000001000"
    assert _EXT_MAKEUP[2560] == "000000011111"
    # every (color, kind) table is prefix-free — the decode-dict build
    # already collides on duplicates; check cross-kind prefixes too
    for tbl in ({**_WHITE_TERM, **_WHITE_MAKEUP, **_EXT_MAKEUP},
                {**_BLACK_TERM, **_EXT_MAKEUP}):
        codes = sorted(tbl.values(), key=len)
        for i, a in enumerate(codes):
            for b in codes[i + 1 :]:
                assert not b.startswith(a) or a == b, (a, b)


def test_mh_hand_fixture():
    """A 12-wide row of 4 white, 5 black, 3 white, MH-coded by hand
    from the spec tables: white4=1011, black5=0011, white3=1000."""
    bits = "1011" + "0011" + "1000"
    data = bytes([int(bits.ljust(16, "0")[i : i + 8], 2) for i in (0, 8)])
    row = decode_fax(data, 12, 1, "mh")
    assert row.tolist() == [[0, 0, 0, 0, 1, 1, 1, 1, 1, 0, 0, 0]]


def test_black_start_needs_zero_white_run():
    """A row starting black carries the zero-length white run first
    (spec: lines always start with a white run)."""
    row = np.array([[1, 1, 1, 0, 0]], dtype=np.uint8)
    for scheme in ("mh", "g3", "g4"):
        data = encode_fax(row, scheme)
        assert np.array_equal(decode_fax(data, 5, 1, scheme), row), scheme


def test_round_trip_sweep_all_schemes():
    rng = np.random.default_rng(19)
    cases = [
        np.zeros((5, 40), dtype=np.uint8),            # all white
        np.ones((5, 40), dtype=np.uint8),             # all black
        rng.integers(0, 2, (23, 17), dtype=np.uint8),  # noise
        (rng.random((40, 200)) < 0.05).astype(np.uint8),  # sparse marks
        np.tile([0, 1], 50).reshape(1, 100).repeat(9, 0),  # 1px stripes
        np.triu(np.ones((30, 30), dtype=np.uint8)),   # diagonal edge
    ]
    for px in cases:
        for scheme in ("mh", "g3", "g4"):
            data = encode_fax(px, scheme)
            got = decode_fax(data, px.shape[1], px.shape[0], scheme)
            assert np.array_equal(got, px), scheme


def test_long_runs_use_makeups():
    """Runs past 63 / 1728 / 2623 exercise make-up and extended
    make-up chains in both directions."""
    for w in (64, 100, 1728, 1729, 1792, 2560, 2624, 3000, 6000):
        row = np.zeros((1, w), dtype=np.uint8)
        for scheme in ("mh", "g4"):
            data = encode_fax(row, scheme)
            assert np.array_equal(decode_fax(data, w, 1, scheme), row), (w, scheme)
        black = np.ones((1, w), dtype=np.uint8)
        data = encode_fax(black, "mh")
        assert np.array_equal(decode_fax(data, w, 1, "mh"), black), w


def test_g4_compresses_correlated_rows():
    """G4's whole point: vertically-correlated content (text lines,
    rules) codes at a fraction of MH's size."""
    px = np.zeros((100, 400), dtype=np.uint8)
    px[:, 100:140] = 1
    px[:, 300:310] = 1
    g4 = encode_fax(px, "g4")
    mh = encode_fax(px, "mh")
    assert len(g4) < len(mh) / 5
    assert np.array_equal(decode_fax(g4, 400, 100, "g4"), px)


def test_g4_vertical_modes_all_offsets():
    """Edges drifting by -3..+3 per row exercise every vertical code."""
    px = np.zeros((15, 60), dtype=np.uint8)
    edge = 30
    drifts = [0, 1, -1, 2, -2, 3, -3, 1, 3, -3, 2, 0, -1, 3, -2]
    for y, d in enumerate(drifts):
        edge += d
        px[y, edge : edge + 10] = 1
    data = encode_fax(px, "g4")
    assert np.array_equal(decode_fax(data, 60, 15, "g4"), px)


def test_truncated_stream_is_corrupt():
    px = np.triu(np.ones((20, 20), dtype=np.uint8))
    for scheme in ("mh", "g3", "g4"):
        data = encode_fax(px, scheme)
        with pytest.raises(ValueError):
            decode_fax(data[: len(data) // 3], 20, 20, scheme)


# ---------------------------------------------------------------------------
# TIFF wiring (compressions 2 / 3 / 4)
# ---------------------------------------------------------------------------


def test_tiff_fax_round_trip_all_schemes():
    rng = np.random.default_rng(23)
    px = (rng.random((33, 41)) < 0.2).astype(np.uint8)
    for comp, name in (("ccitt-rle", "ccitt-rle"), ("g3", "ccitt-g3"),
                       ("g4", "ccitt-g4")):
        for miw in (False, True):
            f = encode_tiff(px, compression=comp, bit_depth=1,
                            min_is_white=miw)
            info = probe_tiff(f)["pages"][0]
            assert info["compression"] == name
            assert info["bits_per_sample"] == [1]
            assert info["photometric"] == (0 if miw else 1)
            assert np.array_equal(decode_tiff_pixels(f)[:, :, 0], px), comp


def test_tiff_fax_multistrip_resets_reference():
    """Each strip codes independently: the first row of strip 2 must
    decode against an all-white imaginary reference, not strip 1's
    last row."""
    px = np.ones((8, 30), dtype=np.uint8)  # all black: worst case for G4
    f = encode_tiff(px, compression="g4", bit_depth=1, rows_per_strip=3)
    info = probe_tiff(f)["pages"][0]
    assert info["n_strips"] == 3
    assert np.array_equal(decode_tiff_pixels(f)[:, :, 0], px)


def test_tiff_fax_gates_and_validation():
    px = np.zeros((4, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match="1-bit"):
        encode_tiff(px, compression="g4")
    with pytest.raises(ValueError, match="striped"):
        encode_tiff(px, compression="g4", bit_depth=1, tile_size=16)
    # uncompressed-mode Group 3 gates by name (2-D G3 decodes since
    # late r09): set T4Options bit 1 on a real G3 file
    f = bytearray(encode_tiff(px, compression="g3", bit_depth=1))
    i = bytes(f).find(struct.pack("<HHI", 292, 4, 1))
    struct.pack_into("<I", f, i + 8, 2)
    with pytest.raises(NotImplementedError, match="uncompressed-mode Group 3"):
        decode_tiff_pixels(bytes(f))
    # a 1-D stream relabeled 2-D misparses the tag bits: corrupt, not
    # a gate
    f2 = bytearray(encode_tiff(px, compression="g3", bit_depth=1))
    i = bytes(f2).find(struct.pack("<HHI", 292, 4, 1))
    struct.pack_into("<I", f2, i + 8, 1)
    with pytest.raises(ValueError, match="fax stream"):
        decode_tiff_pixels(bytes(f2))
    # uncompressed-mode G4 gates by name
    g = bytearray(encode_tiff(px, compression="g4", bit_depth=1))
    i = bytes(g).find(struct.pack("<HHI", 293, 4, 1))
    struct.pack_into("<I", g, i + 8, 2)
    with pytest.raises(NotImplementedError, match="uncompressed"):
        decode_tiff_pixels(bytes(g))
    # CCITT on a non-bilevel page is corrupt
    h = bytearray(encode_tiff(np.zeros((4, 4), dtype=np.uint8),
                              compression="none"))
    i = bytes(h).find(struct.pack("<HHI", 259, 3, 1))
    struct.pack_into("<H", h, i + 8, 4)
    with pytest.raises(ValueError, match="bilevel"):
        decode_tiff_pixels(bytes(h))


def _bits_to_bytes(bits: str) -> bytes:
    bits = bits.ljust(-(-len(bits) // 8) * 8, "0")
    return bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))


def test_g4_zero_progress_horizontal_is_corrupt():
    """Crafted H(0,0) pairs make no progress: the decoder must raise,
    not hang. (The first H(0,0) at line start is harmlessly legal —
    two cancelling changes at 0 — the SECOND one cannot advance.)"""
    h00 = "001" + "00110101" + "0000110111"  # H + white0 + black0
    with pytest.raises(ValueError, match="empty H runs"):
        decode_fax(_bits_to_bytes(h00 + h00), 8, 1, "g4")


def test_g4_backward_vertical_is_corrupt():
    """A vertical code landing at or left of a0 would emit a
    zero/negative run and flip parity — corrupt, not accepted."""
    # row 1: H(5,3) over w=8 -> reference changes [5]
    row1 = "001" + "1100" + "10"  # H + white5 + black3
    # row 2: V0 (a1=5), then VL3 from b1=8 -> a1=5 == a0: invalid
    row2 = "1" + "0000010"
    with pytest.raises(ValueError, match="vertical out of range"):
        decode_fax(_bits_to_bytes(row1 + row2), 8, 2, "g4")


# ---------------------------------------------------------------------------
# T.4 two-dimensional (g3-2d) — late r09
# ---------------------------------------------------------------------------


class TestG32D:
    def test_roundtrip_random_densities_and_k(self):
        rng = np.random.default_rng(17)
        for density in (0.05, 0.3, 0.7):
            bits = (rng.random((14, 51)) < density).astype(np.uint8)
            for k in (1, 2, 4, 100):
                out = decode_fax(
                    encode_fax(bits, "g3-2d", k=k), 51, 14, "g3-2d")
                assert np.array_equal(out, bits), (density, k)

    def test_tag_bits_split_1d_and_2d_lines(self):
        """With K=2, every other line is 1-D: the stream must contain
        both tag values (read back by walking EOLs)."""
        rng = np.random.default_rng(3)
        bits = (rng.random((6, 40)) < 0.4).astype(np.uint8)
        payload = encode_fax(bits, "g3-2d", k=2)
        # K=1 (all 1-D) differs from K=large (mostly 2-D)
        all_1d = encode_fax(bits, "g3-2d", k=1)
        mostly_2d = encode_fax(bits, "g3-2d", k=100)
        assert payload != all_1d and payload != mostly_2d
        # 2-D coding of correlated rows is smaller than 1-D
        corr = np.tile((rng.random(60) < 0.4).astype(np.uint8), (20, 1))
        assert len(encode_fax(corr, "g3-2d", k=100)) < len(
            encode_fax(corr, "g3-2d", k=1)
        )

    def test_tiff_g3_2d_end_to_end(self):
        rng = np.random.default_rng(29)
        bits = (rng.random((22, 31)) < 0.4).astype(np.uint8)
        f = encode_tiff(bits[:, :, None], compression="g3-2d", bit_depth=1)
        assert np.array_equal(decode_tiff_pixels(f).squeeze(), bits)
        from vector_lake_spark.tiff import probe_tiff

        assert probe_tiff(f)["pages"][0]["compression"] == "ccitt-g3-2d"
        # multi-strip: each strip restarts its own 1-D reference
        f2 = encode_tiff(bits[:, :, None], compression="g3-2d",
                         bit_depth=1, rows_per_strip=5)
        assert np.array_equal(decode_tiff_pixels(f2).squeeze(), bits)

    def test_k_validation(self):
        with pytest.raises(ValueError, match="K factor"):
            encode_fax(np.zeros((2, 4), dtype=np.uint8), "g3-2d", k=0)
