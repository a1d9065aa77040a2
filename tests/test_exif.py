"""EXIF APP1 geotag parse/build — byte-level pins: hand-built big-endian
TIFF, marker-walk tolerance (JFIF APP0 first, no APP1, SOS stop), D/M/S
sign and minute handling, splice decodability, and the Spark operators'
roundtrip (geotagged_jpegs -> exif_metadata)."""

import struct

import numpy as np
import pandas as pd

from gis_scripts_spark.operators import multimodal as mm
from gis_scripts_spark.raster import exif
from gis_scripts_spark.raster.jpeg import jpeg_decode, jpeg_encode


def _base_jpeg():
    img = (np.arange(24 * 16, dtype=np.int64) % 251).reshape(24, 16, 1)
    return jpeg_encode(img.astype(np.uint8))


def test_build_parse_roundtrip_signs():
    for lat_md, lon_md in ((12345, 123456), (-12345, -1), (0, 179999), (-59999, 0)):
        app1 = exif.exif_build(lat_md, lon_md, dt="2024:06:01 10:20:30", orientation=6)
        jb = exif.jpeg_with_exif(_base_jpeg(), app1)
        meta = exif.exif_parse(jb)
        # expected decode with the documented FIXED float order
        def dec(md):
            amd = abs(md)
            deg = (amd // 1000) + 0.0 / 60.0 + ((amd % 1000) * 18 / 5) / 3600.0
            return -deg if md < 0 else deg
        assert meta["lat"] == dec(lat_md)
        assert meta["lon"] == dec(lon_md)
        assert meta["orientation"] == 6
        assert meta["datetime"] == "2024:06:01 10:20:30"


def test_spliced_jpeg_still_decodes():
    jb = _base_jpeg()
    px0 = jpeg_decode(jb)
    jb2 = exif.jpeg_with_exif(jb, exif.exif_build(1000, -2000))
    assert np.array_equal(jpeg_decode(jb2), px0)


def test_marker_walk_tolerance():
    jb = _base_jpeg()  # engine JPEGs start with APP0 JFIF after SOI
    assert jb[2:4] == b"\xff\xe0"  # precondition: APP1 is NOT first
    assert exif.exif_parse(jb) is None  # no APP1 at all
    jb2 = exif.jpeg_with_exif(jb, exif.exif_build(5000, 6000))
    assert exif.exif_parse(jb2)["lat"] == 5.0
    # non-Exif APP1 (e.g. XMP) before the Exif APP1 is skipped, not parsed
    xmp = struct.pack(">HH", 0xFFE1, 2 + 10) + b"http://ns\x00"
    jb3 = jb2[:2] + xmp + jb2[2:]
    assert exif.exif_parse(jb3)["lon"] == 6.0
    assert exif.exif_parse(b"\x00\x01not an image") is None


def _be_rational(n, d):
    return struct.pack(">II", n, d)


def test_hand_built_big_endian_with_minutes():
    """Foreign-writer shape: big-endian TIFF, D/M/S all nonzero, GPS IFD
    before IFD0's data — independent of exif_build's layout choices."""
    # GPS IFD: 4 entries at offset 26 (arbitrary but consistent)
    # layout: header(8) IFD0(2+2*12+4=30 @8) -> gps at 38
    gps_off = 38
    ifd0 = struct.pack(">H", 2)
    ifd0 += struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">HH", 8, 0)  # orient 8
    ifd0 += struct.pack(">HHI", 0x8825, 4, 1) + struct.pack(">I", gps_off)
    ifd0 += struct.pack(">I", 0)
    # gps ifd: latref, lat(3 rationals), lonref, lon(3 rationals)
    n = 4
    data_off = gps_off + 2 + 12 * n + 4
    gps = struct.pack(">H", n)
    gps += struct.pack(">HHI", 1, 2, 2) + b"S\x00\x00\x00"
    gps += struct.pack(">HHI", 2, 5, 3) + struct.pack(">I", data_off)
    gps += struct.pack(">HHI", 3, 2, 2) + b"W\x00\x00\x00"
    gps += struct.pack(">HHI", 4, 5, 3) + struct.pack(">I", data_off + 24)
    gps += struct.pack(">I", 0)
    lat_r = _be_rational(40, 1) + _be_rational(26, 1) + _be_rational(461, 10)
    lon_r = _be_rational(79, 1) + _be_rational(58, 1) + _be_rational(5594, 100)
    tiff = b"MM\x00\x2a" + struct.pack(">I", 8) + ifd0 + gps + lat_r + lon_r
    meta = exif.exif_parse(tiff)
    assert meta["orientation"] == 8
    assert meta["lat"] == -(40 + 26 / 60.0 + 46.1 / 3600.0)
    assert meta["lon"] == -(79 + 58 / 60.0 + 55.94 / 3600.0)
    assert meta["datetime"] is None
    # the same TIFF wrapped as an APP1 payload parses identically
    assert exif.exif_parse(b"Exif\x00\x00" + tiff) == meta


def test_exif_metadata_operator(spark):
    """Spark roundtrip: geotagged_jpegs -> exif_metadata; long-id
    passthrough; a non-EXIF row yields nulls."""
    pdf = pd.DataFrame(
        {
            "image_id": [10, 11, 12],
            "lat_md": [-12345, 0, 59999],
            "lon_md": [123456, -180000, 1],
            "orient": [1, 6, 8],
            "dt": ["2024:01:01 00:00:00"] * 3,
        }
    )
    df = spark.createDataFrame(pdf)
    tagged = mm.geotagged_jpegs(
        df, id_col="image_id", orientation_col="orient", dt_col="dt"
    )
    meta = mm.exif_metadata(tagged).toPandas().set_index("image_id").sort_index()
    def dec(md):
        amd = abs(md)
        deg = (amd // 1000) + 0.0 / 60.0 + ((amd % 1000) * 18 / 5) / 3600.0
        return -deg if md < 0 else deg
    for _, r in pdf.iterrows():
        assert meta.loc[r["image_id"], "lat"] == dec(r["lat_md"])
        assert meta.loc[r["image_id"], "lon"] == dec(r["lon_md"])
        assert meta.loc[r["image_id"], "orientation"] == r["orient"]
    # plain JPEG (no EXIF) -> null metadata row, id preserved
    plain = spark.createDataFrame(
        pd.DataFrame({"image_id": [99], "bytes": [_base_jpeg()]})
    )
    out = mm.exif_metadata(plain).toPandas()
    assert out["image_id"].tolist() == [99]
    assert out["lat"].isna().all() and out["orientation"].isna().all()


def test_exif_pipeline_bytes_never_in_exchange(spark):
    """Plan gate (house pattern): the JPEG bytes stay map-local between
    the build and parse Arrow passes; only (id, lat, lon, ...) scalars
    enter any Exchange."""
    import contextlib
    import io
    import re

    from gis_scripts_spark.queries import q_exif_gps_zonal

    out = q_exif_gps_zonal(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    blocks = re.findall(r"\(\d+\) (?:Broadcast)?Exchange[^\n]*\nInput[^\n]*", plan)
    assert blocks, "expected at least one Exchange in the zonal plan"
    for block in blocks:
        assert "bytes" not in block, block


def test_apply_orientation_table():
    """Hand-pinned against the standard EXIF orientation table on the
    classic 2x3 'F' matrix (values = position codes), plus inverse and
    band-axis invariance properties."""
    import pytest

    m = np.array([[1, 2, 3], [4, 5, 6]])
    want = {
        1: [[1, 2, 3], [4, 5, 6]],
        2: [[3, 2, 1], [6, 5, 4]],                  # mirror horizontal
        3: [[6, 5, 4], [3, 2, 1]],                  # rotate 180
        4: [[4, 5, 6], [1, 2, 3]],                  # mirror vertical
        5: [[1, 4], [2, 5], [3, 6]],                # transpose
        6: [[4, 1], [5, 2], [6, 3]],                # rotate 90 CW
        7: [[6, 3], [5, 2], [4, 1]],                # transverse
        8: [[3, 6], [2, 5], [1, 4]],                # rotate 90 CCW
    }
    for o, w in want.items():
        got = exif.apply_orientation(m, o)
        assert got.tolist() == w, f"orientation {o}"
        # band axis rides along untouched
        m3 = np.stack([m, m * 10], axis=2)
        got3 = exif.apply_orientation(m3, o)
        assert got3[..., 0].tolist() == w
        assert got3[..., 1].tolist() == (np.array(w) * 10).tolist()
    # rotations invert each other; mirrors/transposes self-invert
    for o, inv in ((2, 2), (3, 3), (4, 4), (5, 5), (6, 8), (7, 7), (8, 6)):
        assert exif.apply_orientation(
            exif.apply_orientation(m, o), inv
        ).tolist() == m.tolist()
    with pytest.raises(ValueError):
        exif.apply_orientation(m, 9)
    assert exif.apply_orientation(m, None) is m


def test_exif_metadata_corrupt_segment_yields_nulls(spark):
    """Crawl-data reality: a structurally broken APP1 (truncated TIFF,
    bogus IFD offset) must yield a null metadata row, not a dead task."""
    good = exif.jpeg_with_exif(_base_jpeg(), exif.exif_build(1000, 2000))
    # truncated TIFF body inside an otherwise well-formed APP1
    broken1 = exif.jpeg_with_exif(_base_jpeg(), b"Exif\x00\x00II*\x00\x08\x00")
    # IFD offset pointing far outside the segment
    broken2 = exif.jpeg_with_exif(
        _base_jpeg(), b"Exif\x00\x00II*\x00" + struct.pack("<I", 999999)
    )
    pdf = pd.DataFrame({"image_id": [1, 2, 3], "bytes": [good, broken1, broken2]})
    out = (
        mm.exif_metadata(spark.createDataFrame(pdf))
        .toPandas().set_index("image_id").sort_index()
    )
    assert out.loc[1, "lat"] == 1.0 and out.loc[1, "lon"] == 2.0
    for i in (2, 3):
        assert pd.isna(out.loc[i, "lat"]) and pd.isna(out.loc[i, "orientation"])


def test_exif_parse_batch_matches_scalar():
    """Batch parse must equal the scalar parser row for row: varying
    values, corrupt rows, zero denominators, mixed lengths, missing GPS
    (optimization-round internals)."""
    import numpy as np

    from gis_scripts_spark.raster import exif

    base = b"\xff\xd8" + b"\xff\xd9"
    bufs = []
    for i in range(40):
        app1 = exif.exif_build(
            (-1) ** i * (1000 * i + i), 2000 * i - 50000,
            dt=f"2024:01:{i % 28 + 1:02d} 00:00:{i % 60:02d}", orientation=i % 8 + 1,
        )
        bufs.append(exif.jpeg_with_exif(base, app1))
    # corrupt variants
    bufs.append(b"\x00\x01garbage")
    bufs.append(bufs[0][:20])                      # truncated
    zb = bytearray(bufs[1])
    # zero a rational denominator: find the lat deg den (8 bytes into the
    # lat span is den of degrees) — just flip some bytes mid-file instead
    zb[len(zb) // 2] ^= 0xFF
    bufs.append(bytes(zb))
    bufs.append(exif.jpeg_with_exif(base, exif.exif_build(5000, 6000)))  # no dt
    got = exif.exif_parse_batch(bufs)
    for i, b in enumerate(bufs):
        try:
            want = exif.exif_parse(b)
        except Exception:
            want = None
        assert got[i] == want, (i, got[i], want)


def test_exif_parse_batch_small_group_and_tiff():
    from gis_scripts_spark.raster import exif

    app1 = exif.exif_build(1234, -5678, dt="2024:02:02 03:04:05", orientation=6)
    tiff = app1[len(b"Exif\x00\x00"):]
    got = exif.exif_parse_batch([tiff, tiff])
    assert got[0] == exif.exif_parse(tiff) == got[1]
