"""Shapefile + GeoPackage scans: fixtures are built BY HAND from the
public specs (ESRI Shapefile Technical Description / OGC GPKG), independent
of the reader code, so the roundtrip is a real oracle."""

import sqlite3
import struct

import numpy as np
import pytest

from gis_scripts_spark.geom import core as geom
from gis_scripts_spark.geom import wkb as wkb_mod
from gis_scripts_spark.operators import pip_join
from gis_scripts_spark.sources import vector


def _shp_polygon_record(rec_no: int, rings):
    """One Polygon (type 5) record per the spec: big-endian record header,
    little-endian content (type, bbox, NumParts, NumPoints, parts, points)."""
    all_pts = np.vstack(rings)
    parts = []
    acc = 0
    for r in rings:
        parts.append(acc)
        acc += len(r)
    content = struct.pack("<i", 5)
    content += struct.pack("<4d", all_pts[:, 0].min(), all_pts[:, 1].min(),
                           all_pts[:, 0].max(), all_pts[:, 1].max())
    content += struct.pack("<ii", len(rings), acc)
    content += struct.pack("<" + "i" * len(parts), *parts)
    for r in rings:
        for x, y in r:
            content += struct.pack("<dd", x, y)
    header = struct.pack(">ii", rec_no, len(content) // 2)
    return header + content


def _shp_file(records: bytes) -> bytes:
    total_words = (100 + len(records)) // 2
    head = struct.pack(">i", 9994) + b"\0" * 20 + struct.pack(">i", total_words)
    head += struct.pack("<ii", 1000, 5)  # version, shape type
    head += struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)  # bbox placeholder
    return head + records


def _square(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]])


def test_parse_shp_polygons(tmp_path):
    recs = _shp_polygon_record(1, [_square(0, 0, 10)])
    recs += _shp_polygon_record(2, [_square(20, 20, 5), _square(22, 22, 1)])
    buf = _shp_file(recs)
    out = vector.parse_shp(buf)
    assert list(out["feature_id"]) == [1, 2]
    polys = wkb_mod.from_wkb(bytes(out.iloc[0]["wkb"]))
    # point-in-polygon through the engine's own geometry on the parsed WKB
    inside = geom.points_in_multipolygon(np.array([5.0, 15.0]), np.array([5.0, 5.0]), polys)
    assert inside.tolist() == [True, False]
    polys2 = wkb_mod.from_wkb(bytes(out.iloc[1]["wkb"]))
    assert len(polys2[0]) == 2  # both rings preserved


def test_read_shapefiles_distributed(spark, tmp_path):
    for i in range(3):
        buf = _shp_file(_shp_polygon_record(1, [_square(i * 10, 0, 5)]))
        (tmp_path / f"layer_{i}.shp").write_bytes(buf)
    out = vector.read_shapefiles(spark, str(tmp_path / "*.shp")).toPandas()
    assert len(out) == 3
    assert set(out["shape_type"]) == {5}


def _gpkg_blob(wkb: bytes) -> bytes:
    # GP magic, version 0, flags: envelope code 0, little-endian (bit 0)
    return b"GP" + bytes([0, 0b00000001]) + struct.pack("<i", 4326) + wkb


def _make_gpkg(path, polys):
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT)")
    con.execute("INSERT INTO gpkg_contents VALUES ('aoi', 'features')")
    con.execute(
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT, column_name TEXT)"
    )
    con.execute("INSERT INTO gpkg_geometry_columns VALUES ('aoi', 'geom')")
    con.execute("CREATE TABLE aoi (fid INTEGER PRIMARY KEY, geom BLOB)")
    for fid, wkb in polys:
        con.execute("INSERT INTO aoi VALUES (?, ?)", (fid, _gpkg_blob(wkb)))
    con.commit()
    con.close()


def test_read_geopackage_and_pip_join(spark, tmp_path):
    gpkg = str(tmp_path / "aoi.gpkg")
    _make_gpkg(
        gpkg,
        [
            (1, wkb_mod.bbox_to_wkb(0.0, 0.0, 10.0, 10.0)),
            (2, wkb_mod.bbox_to_wkb(20.0, 20.0, 30.0, 30.0)),
        ],
    )
    polys = vector.read_geopackage(spark, gpkg, id_col="fid")
    pdf = polys.toPandas()
    assert list(pdf["feature_id"]) == [1, 2]
    # end-to-end: the scanned layer drives the flagship PIP join
    import pandas as pd

    pts = spark.createDataFrame(
        pd.DataFrame({"pid": [1, 2, 3], "lon": [5.0, 25.0, 50.0], "lat": [5.0, 25.0, 50.0]})
    )
    # pip_join normalizes the polygon id column to 'poly_id' in its output
    pairs = pip_join.pip_join(
        pts, polys, z=6, poly_id="feature_id"
    ).select("pid", "poly_id").toPandas()
    got = set(map(tuple, pairs.itertuples(index=False)))
    assert got == {(1, 1), (2, 2)}


def test_gpkg_envelope_codes():
    wkb = wkb_mod.bbox_to_wkb(0, 0, 1, 1)
    # envelope code 1 (xy, 32 bytes)
    blob = b"GP" + bytes([0, 0b00000011]) + struct.pack("<i", 4326) + b"\0" * 32 + wkb
    assert vector.gpkg_strip_header(blob) == wkb
    with pytest.raises(ValueError):
        vector.gpkg_strip_header(b"XX" + b"\0" * 40)


# ----------------------------------------------------- .dbf attributes (S4)
def _dbf_file(fields, records) -> bytes:
    """Minimal dBASE III writer for fixtures: fields = [(name, length)],
    records = [list of string values] (all type C)."""
    n_rec = len(records)
    hdr_size = 32 + 32 * len(fields) + 1
    rec_size = 1 + sum(l for _, l in fields)
    head = bytearray(32)
    head[0] = 0x03
    struct.pack_into("<I", head, 4, n_rec)
    struct.pack_into("<HH", head, 8, hdr_size, rec_size)
    out = bytearray(head)
    for name, length in fields:
        fd = bytearray(32)
        fd[0:11] = name.encode("ascii")[:11].ljust(11, b"\0")
        fd[11] = ord("C")
        fd[16] = length
        out += fd
    out += b"\x0d"
    for rec in records:
        out += b" "  # active record flag
        for (name, length), val in zip(fields, rec):
            out += str(val).encode("ascii")[:length].ljust(length, b" ")
    return bytes(out)


def test_parse_dbf_fields_and_deleted():
    buf = bytearray(_dbf_file([("CLASS_NAME", 12), ("SITE", 6)],
                              [["seagrass", "s1"], ["sand", "s2"], ["seagrass", "s3"]]))
    # mark record 2 deleted
    hdr_size = struct.unpack_from("<H", buf, 8)[0]
    rec_size = struct.unpack_from("<H", buf, 10)[0]
    buf[hdr_size + rec_size] = ord("*")
    out = vector.parse_dbf(bytes(buf))
    assert list(out.columns) == ["feature_id", "_deleted", "CLASS_NAME", "SITE"]
    assert list(out["feature_id"]) == [1, 2, 3]
    assert list(out["CLASS_NAME"]) == ["seagrass", "sand", "seagrass"]
    assert list(out["_deleted"]) == [False, True, False]
    assert vector.dbf_field_names(bytes(buf)) == ["CLASS_NAME", "SITE"]


def test_shapefile_attrs_filtered_pip_join(spark, tmp_path):
    """The reference's SetAttributeFilter("CLASS_NAME = 'x'") -> PIP flow
    (seagrass_lib.py:532) as a Catalyst filter on the joined scan."""
    import pandas as pd
    from pyspark.sql import functions as F

    from gis_scripts_spark.operators import pip_join

    # two layers x 2 polygons, with attribute tables
    for li in range(2):
        recs = _shp_polygon_record(1, [_square(li * 40, 0, 10)])
        recs += _shp_polygon_record(2, [_square(li * 40 + 20, 0, 10)])
        (tmp_path / f"aoi_{li}.shp").write_bytes(_shp_file(recs))
        (tmp_path / f"aoi_{li}.dbf").write_bytes(_dbf_file(
            [("CLASS_NAME", 12)],
            [[f"seagrass"], [f"sand"]],
        ))
    layer = vector.read_shapefiles_with_attrs(spark, str(tmp_path / "*.shp"))
    assert set(layer.columns) >= {"path", "feature_id", "wkb", "CLASS_NAME"}
    sea = layer.filter(F.col("CLASS_NAME") == "seagrass")
    polys = sea.select(
        F.concat(F.regexp_extract("path", r"aoi_(\d)", 1), F.lit("_"),
                 F.col("feature_id").cast("string")).alias("poly_id"),
        "wkb")
    # points: centers of all four squares; only the two seagrass ones match
    pts = spark.createDataFrame(pd.DataFrame({
        "pt_id": ["p0", "p1", "p2", "p3"],
        "lon": [5.0, 25.0, 45.0, 65.0],
        "lat": [5.0, 5.0, 5.0, 5.0],
    }))
    pairs = pip_join.pip_join(pts, polys, z=6).toPandas()
    got = sorted(zip(pairs["pt_id"], pairs["poly_id"]))
    assert got == [("p0", "0_1"), ("p2", "1_1")]


def test_dbf_deleted_records_dropped(spark, tmp_path):
    recs = _shp_polygon_record(1, [_square(0, 0, 10)])
    recs += _shp_polygon_record(2, [_square(20, 0, 10)])
    (tmp_path / "l.shp").write_bytes(_shp_file(recs))
    buf = bytearray(_dbf_file([("NAME", 8)], [["keep"], ["gone"]]))
    hdr_size = struct.unpack_from("<H", buf, 8)[0]
    rec_size = struct.unpack_from("<H", buf, 10)[0]
    buf[hdr_size + rec_size] = ord("*")
    (tmp_path / "l.dbf").write_bytes(bytes(buf))
    out = vector.read_shapefiles_with_attrs(spark, str(tmp_path / "*.shp")).toPandas()
    assert list(out["NAME"]) == ["keep"]


def test_shapefiles_with_attrs_rejects_non_shp_glob(spark):
    """Round-4 ADVICE fix: a glob not ending in .shp used to be silently
    reused as the dbf glob, feeding geometry files to the dBASE parser."""
    import pytest as _pytest

    from gis_scripts_spark.sources import vector

    with _pytest.raises(ValueError, match=r"must end in \.shp"):
        vector.read_shapefiles_with_attrs(spark, "/tmp/nope/*.gpkg")


def test_geoparquet_roundtrip_and_pip_join(spark, tmp_path):
    """GeoParquet source (round 4): write AOI polygons as spec-compliant
    GeoParquet (WKB geometry + `geo` footer JSON), read back with footer
    metadata, and drive the engine's PIP join end-to-end from it."""
    import pandas as pd

    from gis_scripts_spark.geom import wkb as wkb_mod
    from gis_scripts_spark.operators import pip_join, tile_assign
    from gis_scripts_spark.sources import geoparquet, synth

    polys = pd.DataFrame(
        {
            "poly_id": ["p0", "p1"],
            "wkb": [
                bytearray(wkb_mod.bbox_to_wkb(-10.0, -10.0, 10.0, 10.0)),
                bytearray(wkb_mod.bbox_to_wkb(20.0, 20.0, 40.0, 35.0)),
            ],
            "class_name": ["a", "b"],
        }
    )
    path = str(tmp_path / "aoi_gpq")
    geoparquet.write_geoparquet(
        spark.createDataFrame(polys), path, geometry_col="wkb",
        crs={"id": {"authority": "OGC", "code": "CRS84"}},
    )
    df, meta = geoparquet.read_geoparquet(spark, path)
    assert meta.primary_column == "wkb"
    assert meta.crs()["id"]["code"] == "CRS84"
    got = df.orderBy("poly_id").toPandas()
    assert list(got["poly_id"]) == ["p0", "p1"]
    assert bytes(got["wkb"][0]) == bytes(polys["wkb"][0])
    # end-to-end: GeoParquet layer -> PIP join against synthetic images
    imgs = tile_assign.assign_tiles(synth.images_df(spark, 200, parts=4))
    keys = imgs.select("image_id", "lon", "lat", "quadkey")
    joined = pip_join.pip_join(keys, df, z=6).toPandas()
    # brute-force oracle on the two rectangles
    pts = imgs.select("image_id", "lon", "lat").toPandas()
    want = set()
    for _, r in pts.iterrows():
        if -10 <= r["lon"] < 10 and -10 <= r["lat"] < 10:
            want.add((r["image_id"], "p0"))
        if 20 <= r["lon"] < 40 and 20 <= r["lat"] < 35:
            want.add((r["image_id"], "p1"))
    got_pairs = set(zip(joined["image_id"], joined["poly_id"]))
    assert got_pairs == want


def test_geoparquet_rejects_non_geo_parquet(spark, tmp_path):
    import pytest as _pytest

    from gis_scripts_spark.sources import geoparquet

    p = str(tmp_path / "plain")
    spark.range(3).write.parquet(p)
    import os

    f = [x for x in os.listdir(p) if x.endswith(".parquet")][0]
    with _pytest.raises(ValueError, match="geo"):
        geoparquet.read_geoparquet_meta(os.path.join(p, f))
