"""GeoJSON source/sink: fixtures are hand-written RFC 7946 JSON text
(independent of the reader code), so parse is tested against the spec,
and the writer is tested by read-back plus bit-exact coordinate
roundtrips (shortest-roundtrip decimal serialization)."""

import json

import numpy as np
import pandas as pd
import pytest

from gis_scripts_spark.geom import core as geom
from gis_scripts_spark.geom import wkb as wkb_mod
from gis_scripts_spark.operators import pip_join
from gis_scripts_spark.sources import geojson as gj


def _square(x0, y0, s):
    return [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]]


_DOC = {
    "type": "FeatureCollection",
    "features": [
        {
            "type": "Feature",
            "geometry": {"type": "Polygon", "coordinates": [_square(0, 0, 10)]},
            "properties": {"name": "plain", "rank": 1},
        },
        {
            "type": "Feature",
            "geometry": {
                "type": "Polygon",
                # exterior + hole
                "coordinates": [_square(20, 20, 10), _square(24, 24, 2)],
            },
            "properties": {"name": "holed", "rank": 2},
        },
        {
            "type": "Feature",
            "geometry": {
                "type": "MultiPolygon",
                "coordinates": [[_square(-50, -10, 5)], [_square(-40, -10, 5)]],
            },
            "properties": {"name": "multi", "rank": 3},
        },
    ],
}


def test_parse_geojson_spec_document():
    out = gj.parse_geojson(json.dumps(_DOC))
    assert list(out["feature_id"]) == [0, 1, 2]
    assert list(out["geom_type"]) == ["Polygon", "Polygon", "MultiPolygon"]
    # hole respected: center of the hole is OUTSIDE
    holed = wkb_mod.from_wkb(bytes(out.iloc[1]["wkb"]))
    inside = geom.points_in_multipolygon(
        np.array([21.0, 25.0]), np.array([21.0, 25.0]), holed
    )
    assert inside.tolist() == [True, False]
    # multipolygon: both parts present
    multi = wkb_mod.from_wkb(bytes(out.iloc[2]["wkb"]))
    assert len(multi) == 2
    assert json.loads(out.iloc[0]["properties"]) == {"name": "plain", "rank": 1}


def test_parse_geojson_single_feature_and_bare_geometry():
    feat = _DOC["features"][0]
    assert len(gj.parse_geojson(json.dumps(feat))) == 1
    assert len(gj.parse_geojson(json.dumps(feat["geometry"]))) == 1


def test_parse_geojson_rejects_unsupported_type():
    with pytest.raises(ValueError, match="unsupported GeoJSON geometry"):
        gj.parse_geojson(
            json.dumps({"type": "Point", "coordinates": [1.0, 2.0]})
        )


def test_read_geojson_whole_file(spark, tmp_path):
    p = tmp_path / "aoi.geojson"
    p.write_text(json.dumps(_DOC))
    out = gj.read_geojson(spark, str(p)).orderBy("feature_id").toPandas()
    assert len(out) == 3
    assert list(out["geom_type"]) == ["Polygon", "Polygon", "MultiPolygon"]


def test_read_geojson_seq_lines_and_rs(spark, tmp_path):
    """RFC 8142 sequence: one feature per line, optional RS prefix, blank
    lines tolerated, bare-geometry lines accepted."""
    lines = [
        "\x1e" + json.dumps(_DOC["features"][0]),
        "",
        json.dumps(_DOC["features"][1]),
        json.dumps(_DOC["features"][2]["geometry"]),  # bare geometry line
    ]
    p = tmp_path / "aoi.geojsonl"
    p.write_text("\n".join(lines) + "\n")
    out = gj.read_geojson_seq(spark, str(p)).toPandas()
    assert sorted(out["geom_type"]) == ["MultiPolygon", "Polygon", "Polygon"]
    # bare geometry gets empty properties
    assert "{}" in set(out["properties"])


def test_write_geojson_seq_roundtrip_bitexact(spark, tmp_path):
    """Distributed sink -> seq scan roundtrip: WKB bytes identical (the
    shortest-roundtrip decimal rule), properties preserved with types."""
    rng = np.random.default_rng(7)
    rows = []
    for i in range(25):
        x0, y0 = rng.uniform(-179, 168), rng.uniform(-59, 30)
        w, h = rng.uniform(0.001, 9), rng.uniform(0.001, 9)
        rows.append(
            (f"p{i}", float(rng.normal()), i, bytearray(wkb_mod.bbox_to_wkb(x0, y0, x0 + w, y0 + h)))
        )
    pdf = pd.DataFrame(rows, columns=["pid", "score", "rank", "wkb"])
    df = spark.createDataFrame(pdf).repartition(4)
    path = str(tmp_path / "sink")
    gj.write_geojson_seq(df, path, geometry_col="wkb")
    back = gj.read_geojson_seq(spark, f"{path}/*.txt")
    got = back.select(
        gj.property_col("pid").alias("pid"),
        gj.property_col("score", "double").alias("score"),
        gj.property_col("rank", "int").alias("rank"),
        "wkb",
    ).toPandas().sort_values("pid").reset_index(drop=True)
    want = pdf.sort_values("pid").reset_index(drop=True)
    assert list(got["pid"]) == list(want["pid"])
    assert list(got["rank"]) == list(want["rank"])
    assert np.allclose(got["score"], want["score"], rtol=0, atol=0)  # exact
    for a, b in zip(got["wkb"], want["wkb"]):
        assert bytes(a) == bytes(b)  # bit-exact geometry roundtrip


def test_write_geojson_seq_rejects_binary_property(spark):
    pdf = pd.DataFrame(
        {"pid": ["a"], "blob": [bytearray(b"x")],
         "wkb": [bytearray(wkb_mod.bbox_to_wkb(0, 0, 1, 1))]}
    )
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="binary property"):
        gj.write_geojson_seq(df, "/tmp/never", geometry_col="wkb")


def test_geojson_polys_drive_pip_join(spark, tmp_path):
    """End-to-end: polygons from a seq scan feed pip_join; result equals
    the same polygons passed directly (format-independence)."""
    import pandas as _pd

    polys_pdf = _pd.DataFrame(
        {
            "poly_id": ["a", "b"],
            "wkb": [
                bytearray(wkb_mod.bbox_to_wkb(0, 0, 10, 10)),
                bytearray(wkb_mod.bbox_to_wkb(5, 5, 15, 15)),
            ],
        }
    )
    path = str(tmp_path / "aoi")
    gj.write_geojson_seq(spark.createDataFrame(polys_pdf), path, geometry_col="wkb")
    polys_gj = gj.read_geojson_seq(spark, f"{path}/*.txt").select(
        gj.property_col("poly_id").alias("poly_id"), "wkb"
    )
    pts = spark.createDataFrame(
        _pd.DataFrame({"pt": [1, 2, 3], "lon": [1.0, 7.0, 20.0], "lat": [1.0, 7.0, 20.0]})
    )
    direct = pip_join.pip_join(pts, spark.createDataFrame(polys_pdf), z=7)
    via_gj = pip_join.pip_join(pts, polys_gj, z=7)
    key = lambda df: sorted(map(tuple, df.select("pt", "poly_id").collect()))
    got = key(via_gj)
    assert got == key(direct)
    assert got == [(1, "a"), (2, "a"), (2, "b")]
