"""EXIF tests (round 10 s2): APP1 walk, writer→parser roundtrip
across field shapes and byte orders, orientation transforms against
the numpy rot90/flip references, and the Spark feature surface.
"""

import numpy as np
import pytest

from datasplash_spark.functions import exif as X
from datasplash_spark.functions import jpeg as J


def _jpg():
    return J.encode_jpeg_baseline(
        np.arange(64, dtype=np.uint8).reshape(8, 8), quality=90
    )


def test_exif_roundtrip_all_fields():
    jpg = _jpg()
    assert X.parse_exif(jpg)["has_exif"] is False
    for o in range(1, 9):
        j2 = X.inject_exif(
            jpg, orientation=o, make="NikonTest", model="D750x",
            datetime="2020:01:02 03:04:05",
            datetime_original="2019:12:31 23:59:59",
        )
        d = X.parse_exif(j2)
        assert d["has_exif"] and d["orientation"] == o
        assert d["make"] == "NikonTest" and d["model"] == "D750x"
        assert d["datetime"] == "2020:01:02 03:04:05"
        assert d["datetime_original"] == "2019:12:31 23:59:59"
        # the JPEG still decodes with APP1 spliced in front
        assert J.decode_jpeg(j2)["pixels"].shape[:2] == (8, 8)
    # short ASCII values take the inline (<=4 bytes incl. NUL) path
    assert X.parse_exif(X.inject_exif(jpg, make="abc"))["make"] == "abc"
    # orientation-only, no sub-IFD
    d = X.parse_exif(X.inject_exif(jpg, orientation=3))
    assert d["orientation"] == 3 and d["datetime_original"] is None


def test_exif_big_endian_read():
    # MM byte order: hand-built TIFF body with one orientation tag
    import struct

    tiff = (
        b"MM\x00*" + struct.pack(">I", 8)
        + struct.pack(">H", 1)
        + struct.pack(">HHIHH", 0x0112, 3, 1, 6, 0)
        + struct.pack(">I", 0)
    )
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    jpg = _jpg()
    d = X.parse_exif(jpg[:2] + app1 + jpg[2:])
    assert d["orientation"] == 6


def test_exif_malformed_quarantines():
    import struct

    jpg = _jpg()
    payload = b"Exif\x00\x00" + b"XX" + b"\x00" * 10  # bad byte order
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    with pytest.raises(ValueError, match="byte order"):
        X.parse_exif(jpg[:2] + app1 + jpg[2:])


def test_orientation_transforms_match_numpy():
    px = np.arange(12).reshape(3, 4)
    assert np.array_equal(X.apply_orientation(px, 1), px)
    assert np.array_equal(X.apply_orientation(px, 2), np.fliplr(px))
    assert np.array_equal(X.apply_orientation(px, 3), np.rot90(px, 2))
    assert np.array_equal(X.apply_orientation(px, 4), np.flipud(px))
    assert np.array_equal(X.apply_orientation(px, 5), px.T)
    assert np.array_equal(X.apply_orientation(px, 6), np.rot90(px, -1))
    assert np.array_equal(
        X.apply_orientation(px, 7), np.fliplr(np.flipud(px.T))
    )
    assert np.array_equal(X.apply_orientation(px, 8), np.rot90(px, 1))
    # channel axis is preserved
    c = np.arange(24).reshape(2, 4, 3)
    assert X.apply_orientation(c, 6).shape == (4, 2, 3)
    # None/unknown orientations are identity
    assert np.array_equal(X.apply_orientation(px, None), px)
    assert np.array_equal(X.apply_orientation(px, 9), px)


def test_image_exif_features_spark(spark):
    from datasplash_spark.sources import generate_input

    jpg = _jpg()
    rows = [
        (1, bytearray(X.inject_exif(jpg, orientation=6, make="cam1"))),
        (2, bytearray(jpg)),          # no EXIF
        (3, bytearray(b"not a jpeg")),  # poison
    ]
    df = generate_input(spark, rows, "doc_id bigint, media binary")
    got = {r.doc_id: r for r in X.image_exif_features(df).collect()}
    assert got[1].ok and got[1].orientation == 6
    assert (got[1].width, got[1].height) == (8, 8)  # square: swap = same
    assert got[2].ok and got[2].has_exif is False
    assert got[3].ok is False and "jpeg" in got[3].err
