"""EXIF probe (`vector_lake_spark.exif`): writer/prober round trips in
both byte orders, the bare-JPEG and bare-TIFF paths, corrupt inputs,
and coexistence with the JPEG decoder (an APP1 segment must not change
pixels)."""

import struct

import numpy as np
import pytest

from vector_lake_spark.exif import (
    build_exif_tiff,
    insert_exif_app1,
    probe_exif,
)
from vector_lake_spark.jpeg import decode_jpeg_pixels, encode_jpeg


def _tagged(bo="II", ori=6):
    blob = build_exif_tiff(
        ori, 4032, 3024, "2024:05:17 10:11:12", "2024:05:17 09:10:11", bo
    )
    jpeg = encode_jpeg(np.full((16, 16), 40, dtype=np.uint8), 90)
    return insert_exif_app1(jpeg, blob), blob


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_roundtrip_both_byte_orders(bo):
    tagged, blob = _tagged(bo)
    expected = {
        "has_exif": True,
        "byte_order": bo,
        "orientation": 6,
        "width": 4032,
        "height": 3024,
        "datetime": "2024:05:17 10:11:12",
        "datetime_original": "2024:05:17 09:10:11",
    }
    assert probe_exif(tagged) == expected  # JPEG APP1 path
    assert probe_exif(blob) == expected  # bare TIFF-blob path


def test_app1_does_not_disturb_pixel_decode():
    tagged, _ = _tagged()
    plain = encode_jpeg(np.full((16, 16), 40, dtype=np.uint8), 90)
    assert np.array_equal(
        decode_jpeg_pixels(tagged), decode_jpeg_pixels(plain)
    )


def test_jpeg_without_exif_reports_absence():
    plain = encode_jpeg(np.full((8, 8), 9, dtype=np.uint8), 90)
    info = probe_exif(plain)
    assert info["has_exif"] is False
    assert info["orientation"] is None and info["datetime"] is None


def test_real_tiff_file_without_exif_tags():
    """A plain image TIFF (tiff.py writer) has an IFD0 but none of the
    EXIF tags — has_exif is True (there IS a parseable IFD), fields
    None."""
    from vector_lake_spark.tiff import encode_tiff

    t = encode_tiff(np.full((8, 8), 60, dtype=np.uint8))
    info = probe_exif(t)
    assert info["has_exif"] is True and info["orientation"] is None


def test_non_image_payload_gates():
    with pytest.raises(ValueError, match="JPEG or TIFF"):
        probe_exif(b"GIF89a......")


def test_corrupt_exif_blob_raises():
    jpeg = encode_jpeg(np.full((8, 8), 9, dtype=np.uint8), 90)
    bad = insert_exif_app1(jpeg, b"XX" + b"\x00" * 10)
    with pytest.raises(ValueError, match="byte-order"):
        probe_exif(bad)
    bad2 = insert_exif_app1(jpeg, b"II" + struct.pack("<H", 43) + b"\x00" * 4)
    with pytest.raises(ValueError, match="magic"):
        probe_exif(bad2)


def test_oversized_blob_refused():
    jpeg = encode_jpeg(np.full((8, 8), 9, dtype=np.uint8), 90)
    with pytest.raises(ValueError, match="too large"):
        insert_exif_app1(jpeg, b"II" + b"\x00" * 0x10000)


def test_extract_exif_operator(spark):
    """The Arrow operator: tagged JPEG → full row; untagged JPEG →
    has_exif=false; non-image payload → NULL row (route-don't-crash)."""
    from vector_lake_spark.multimodal import extract_exif

    tagged, _ = _tagged("MM", ori=3)
    plain = encode_jpeg(np.full((8, 8), 9, dtype=np.uint8), 90)
    df = spark.createDataFrame(
        [(1, bytearray(tagged)), (2, bytearray(plain)),
         (3, bytearray(b"not an image at all"))],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in extract_exif(df).collect()}
    assert rows[1].has_exif is True and rows[1].orientation == 3
    assert rows[1].byte_order == "MM" and rows[1].width == 4032
    assert rows[2].has_exif is False and rows[2].orientation is None
    assert rows[3].has_exif is None and rows[3].datetime is None


def test_malformed_payloads_raise_valueerror_not_indexerror():
    """r10 review: fill-byte runs to EOF and blobs truncated at the
    next-IFD pointer must surface as the ValueError contract (the
    operator's route-don't-crash handler catches exactly that)."""
    from vector_lake_spark.multimodal import extract_exif  # noqa: F401

    info = probe_exif(b"\xff\xd8\xff\xff\xff\xff")  # fill bytes to EOF
    assert info["has_exif"] is False
    # TIFF blob cut right before the next-IFD pointer
    blob = build_exif_tiff(1, 10, 10, "a", "b")
    for cut in (9, 10, 12, 20):
        try:
            probe_exif(blob[:cut])
        except ValueError:
            pass  # the contract
    # and through the operator: corrupt EXIF inside a valid JPEG
    jpeg = encode_jpeg(np.full((8, 8), 9, dtype=np.uint8), 90)
    bad = insert_exif_app1(jpeg, blob[:12])
    with pytest.raises(ValueError):
        probe_exif(bad)
