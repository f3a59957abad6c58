"""Ogg container probe (`vector_lake_spark.ogg`): RFC 3533 page
framing (lacing, flags, CRC, sequence continuity), codec ID headers,
duration-from-granule arithmetic, corrupt-input contract, named decode
gate."""

import struct

import pytest

from vector_lake_spark.ogg import (
    decode_ogg,
    is_ogg,
    mux_ogg_pages,
    ogg_crc,
    opus_id_packet,
    probe_ogg,
    vorbis_id_packet,
)


def _vorbis_stream(rate=44100, channels=2, granules=(1024, 4096)):
    pages = [
        {
            "serial": 9,
            "seq": 0,
            "granule": 0,
            "bos": True,
            "packets": [vorbis_id_packet(channels, rate)],
        }
    ]
    for i, g in enumerate(granules):
        pages.append(
            {
                "serial": 9,
                "seq": i + 1,
                "granule": g,
                "eos": i == len(granules) - 1,
                "packets": [bytes([i]) * (20 + i)],
            }
        )
    return mux_ogg_pages(pages)


class TestFraming:
    def test_crc_is_direct_unreflected(self):
        """Pinned values of the documented algorithm (poly 0x04c11db7,
        zero init/xor, MSB-first): regression anchors."""
        assert ogg_crc(b"") == 0
        assert ogg_crc(b"\x00") == 0
        assert ogg_crc(b"\x01") == 0x04C11DB7
        # linearity anchor: crc(0x80 << 24 zeros...) exercises table top
        assert ogg_crc(b"\x80\x00\x00\x00") != 0

    def test_lacing_255_boundary(self):
        """Packets of exactly k*255 bytes need a 0 terminator; the
        packet count must see it as ONE packet."""
        pages = [
            {
                "serial": 1,
                "seq": 0,
                "granule": 0,
                "bos": True,
                "packets": [vorbis_id_packet(1, 8000)],
            },
            {
                "serial": 1,
                "seq": 1,
                "granule": 100,
                "eos": True,
                "packets": [b"z" * 510],
            },
        ]
        info = probe_ogg(mux_ogg_pages(pages))
        assert info["n_packets"] == 2

    def test_vorbis_metadata_and_duration(self):
        info = probe_ogg(_vorbis_stream(rate=32000, channels=1,
                                        granules=(500, 64000)))
        assert info["codec"] == "vorbis"
        assert info["sample_rate"] == 32000
        assert info["n_channels"] == 1
        assert info["duration_ms"] == 2000
        assert info["eos"] is True

    def test_opus_preskip_subtracted(self):
        pages = [
            {
                "serial": 2,
                "seq": 0,
                "granule": 0,
                "bos": True,
                "packets": [opus_id_packet(2, 312, 48000)],
            },
            {
                "serial": 2,
                "seq": 1,
                "granule": 48312,
                "eos": True,
                "packets": [b"q" * 9],
            },
        ]
        info = probe_ogg(mux_ogg_pages(pages))
        assert info["codec"] == "opus"
        assert info["sample_rate"] == 48000  # granule clock, always
        assert info["duration_ms"] == 1000

    def test_flac_and_theora_identified(self):
        for magic, name in ((b"\x7fFLAC\x01\x00", "flac"),
                            (b"\x80theora\x03", "theora")):
            pages = [
                {
                    "serial": 4,
                    "seq": 0,
                    "granule": 0,
                    "bos": True,
                    "eos": True,
                    "packets": [magic + bytes(10)],
                }
            ]
            assert probe_ogg(mux_ogg_pages(pages))["codec"] == name

    def test_multi_stream_counted(self):
        pages = [
            {"serial": 1, "seq": 0, "granule": 0, "bos": True,
             "packets": [vorbis_id_packet(2, 44100)]},
            {"serial": 2, "seq": 0, "granule": 0, "bos": True,
             "packets": [b"\x80theora" + bytes(5)]},
            {"serial": 1, "seq": 1, "granule": 4410, "eos": True,
             "packets": [b"a"]},
            {"serial": 2, "seq": 1, "granule": 99, "eos": True,
             "packets": [b"b"]},
        ]
        info = probe_ogg(mux_ogg_pages(pages))
        assert info["n_streams"] == 2
        assert info["n_pages"] == 4


class TestCorruptContract:
    def test_crc_mismatch(self):
        p = bytearray(_vorbis_stream())
        p[40] ^= 0xFF
        with pytest.raises(ValueError, match="CRC mismatch"):
            probe_ogg(bytes(p))

    def test_truncated_body_and_header(self):
        p = _vorbis_stream()
        with pytest.raises(ValueError, match="truncated"):
            probe_ogg(p[:-1])
        with pytest.raises(ValueError, match="truncated"):
            probe_ogg(p[: len(p) - 30])

    def test_sequence_gap_and_missing_bos(self):
        pages = [
            {"serial": 5, "seq": 0, "granule": 0, "bos": True,
             "packets": [vorbis_id_packet(1, 8000)]},
            {"serial": 5, "seq": 2, "granule": 10, "packets": [b"x"]},
        ]
        with pytest.raises(ValueError, match="sequence gap"):
            probe_ogg(mux_ogg_pages(pages))
        nobos = [
            {"serial": 6, "seq": 0, "granule": 0, "packets": [b"x"]},
        ]
        with pytest.raises(ValueError, match="BOS"):
            probe_ogg(mux_ogg_pages(nobos))

    def test_not_ogg(self):
        with pytest.raises(ValueError, match="capture pattern"):
            probe_ogg(b"RIFFxxxxWAVE")
        assert not is_ogg(b"RIFF")
        assert is_ogg(_vorbis_stream())

    def test_version_gate(self):
        p = bytearray(_vorbis_stream())
        p[4] = 1
        with pytest.raises(ValueError, match="version"):
            probe_ogg(bytes(p))

    def test_page_overflowing_segment_table_refused_by_muxer(self):
        with pytest.raises(ValueError, match="segment table"):
            mux_ogg_pages(
                [{"serial": 1, "seq": 0, "granule": 0,
                  "packets": [b"x" * (256 * 255)]}]
            )


def test_decode_gate_is_named():
    with pytest.raises(NotImplementedError, match="Ogg vorbis"):
        decode_ogg(_vorbis_stream())


def test_id_packet_wire_sizes():
    assert len(vorbis_id_packet(2, 44100)) == 30
    assert len(opus_id_packet(2, 312, 48000)) == 19
    v = vorbis_id_packet(2, 44100)
    assert struct.unpack_from("<I", v, 12)[0] == 44100


class TestReviewFindings:
    """Late-r09 review pass: short ID packets, multi-clock duration,
    ID3-tagged non-MPEG routing."""

    def test_short_id_packets_are_named_valueerrors(self):
        for pkt, msg in ((b"OpusHead", "OpusHead"),
                         (b"\x01vorbis" + bytes(5), "Vorbis")):
            stream = mux_ogg_pages(
                [{"serial": 1, "seq": 0, "granule": 0, "bos": True,
                  "eos": True, "packets": [pkt]}]
            )
            with pytest.raises(ValueError, match=msg):
                probe_ogg(stream)

    def test_tiny_unknown_bos_packet_is_unknown_codec(self):
        stream = mux_ogg_pages(
            [{"serial": 1, "seq": 0, "granule": 0, "bos": True,
              "eos": True, "packets": [b"xy"]}]
        )
        assert probe_ogg(stream)["codec"] == "unknown"

    def test_multiplexed_duration_uses_codec_stream_clock(self):
        """A Theora stream's granule (a shifted frame counter) must not
        leak into the Vorbis stream's duration."""
        pages = [
            {"serial": 1, "seq": 0, "granule": 0, "bos": True,
             "packets": [vorbis_id_packet(2, 44100)]},
            {"serial": 2, "seq": 0, "granule": 0, "bos": True,
             "packets": [b"\x80theora" + bytes(5)]},
            {"serial": 2, "seq": 1, "granule": 1_000_000, "eos": True,
             "packets": [b"v"]},
            {"serial": 1, "seq": 1, "granule": 4410, "eos": True,
             "packets": [b"a"]},
        ]
        info = probe_ogg(mux_ogg_pages(pages))
        assert info["codec"] == "vorbis"
        assert info["duration_ms"] == 100


def test_ogg_crc_matches_table_loop():
    """r13: the zlib-dual ogg_crc must equal the direct per-byte table
    loop (kept here as the reference) on random buffers of every size
    class, including empty."""
    import random

    from vector_lake_spark.ogg import _CRC, ogg_crc

    def table_crc(data):
        r = 0
        for b in data:
            r = ((r << 8) & 0xFFFFFFFF) ^ _CRC[((r >> 24) & 0xFF) ^ b]
        return r

    rng = random.Random(4)
    for n in (0, 1, 2, 26, 27, 255, 256, 300, 4096, 65537):
        d = bytes(rng.randrange(256) for _ in range(n))
        assert ogg_crc(d) == table_crc(d), n
