"""Bit-identity gates for the projection-kernel SQL mirrors.

The utm_forward_coords / rpc_image_coords driver queries run under the
full value-hash oracle, which only works because the DuckDB SQL emitted by
proj.sql_utm_forward_ctes / proj.sql_rpc_image_ctes reproduces the numpy
kernels BIT-FOR-BIT. These tests pin that contract on dense random inputs
(far denser than the driver's sf0.01 events), plus the host facts the
mirrors rely on: numpy and DuckDB agree exactly on SIN/COS/SQRT and on
+,-,*,/ — but NOT on TAN or POW (which is why the kernels use sphi/cphi
and multiply chains), and DuckDB's numeric-literal CAST routes through
DECIMAL (two roundings — which is why _dlit casts from strings).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from gis_scripts_spark.index import proj


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _fetch(con, sql):
    return con.execute(sql).fetchnumpy()


def test_host_trig_bit_identity(con):
    """The facts the mirrors depend on, measured: sin/cos/sqrt identical;
    tan/pow NOT (if tan ever becomes identical this still passes — the
    mirrors just stop needing the workaround)."""
    rng = np.random.default_rng(0)
    x = rng.uniform(-7, 7, 50000)
    con.register("thost", pd.DataFrame({"x": x}))
    for fn, ref in [("sin", np.sin(x)), ("cos", np.cos(x))]:
        got = list(_fetch(con, f"SELECT {fn}(x) FROM thost").values())[0]
        assert int(np.sum(got != ref)) == 0, fn
    got = list(_fetch(con, "SELECT sqrt(abs(x)) FROM thost").values())[0]
    assert int(np.sum(got != np.sqrt(np.abs(x)))) == 0


def test_dlit_string_cast_roundtrips_exactly(con):
    """CAST('<repr>' AS DOUBLE) must strtod back to the identical double —
    the numeric-literal form CAST(<repr> AS DOUBLE) routes through DECIMAL
    and is NOT trusted (measured 1-ulp drift on long constants)."""
    rng = np.random.default_rng(1)
    for v in rng.uniform(-1, 1, 50):
        got = con.execute(f"SELECT {proj._dlit(v)}").fetchone()[0]
        assert got == v


def test_utm_forward_sql_bit_identical_fixed_zone(con):
    rng = np.random.default_rng(42)
    n = 50000
    lon = rng.uniform(9.0, 21.0, n)
    lat = rng.uniform(-85.0, 85.0, n)
    for north in (True, False):
        e, nn = proj.utm_forward(lon, lat, 33, north=north)
        con.register("tpin", pd.DataFrame({"k": np.arange(n), "lon": lon, "lat": lat}))
        d = _fetch(con, "WITH " + proj.sql_utm_forward_ctes("tpin", "k", 33, north=north)
                   + "\nSELECT k, easting, northing FROM _utm ORDER BY k")
        assert int(np.sum(d["easting"] != e)) == 0
        assert int(np.sum(d["northing"] != nn)) == 0


def test_utm_forward_sql_bit_identical_per_row_zone(con):
    """The vectorized-central-meridian form the utm_forward_coords driver
    query uses: zone derived per row, all 60 zones + the clip edges."""
    rng = np.random.default_rng(43)
    n = 60000
    lon = rng.uniform(-180.0, 180.0, n)
    lat = rng.uniform(-60.0, 60.0, n)
    zone = np.clip(np.floor((lon + 180.0) / 6.0) + 1.0, 1.0, 60.0)
    e, nn = proj.utm_forward(lon, lat, zone)
    con.register("tz", pd.DataFrame({"k": np.arange(n), "lon": lon, "lat": lat}))
    src = ("(SELECT k, lon, lat, LEAST(GREATEST(FLOOR((lon + CAST('180.0' AS DOUBLE))"
           " / CAST('6.0' AS DOUBLE)) + CAST('1.0' AS DOUBLE), CAST('1.0' AS DOUBLE)),"
           " CAST('60.0' AS DOUBLE)) AS zone FROM tz)")
    d = _fetch(con, "WITH " + proj.sql_utm_forward_ctes(src, "k", "zone")
               + "\nSELECT k, easting, northing FROM _utm ORDER BY k")
    assert int(np.sum(d["easting"] != e)) == 0
    assert int(np.sum(d["northing"] != nn)) == 0


def _random_cam(rng):
    cam = {
        "LINE_OFF": 5000.0, "SAMP_OFF": 6000.0, "LAT_OFF": 34.0,
        "LONG_OFF": -119.0, "HEIGHT_OFF": 100.0,
        "LINE_SCALE": 5200.0, "SAMP_SCALE": 6100.0,
        "LAT_SCALE": 0.04, "LONG_SCALE": 0.05, "HEIGHT_SCALE": 500.0,
        "LINE_NUM_COEFF": list(rng.uniform(-0.05, 0.05, 20)),
        "LINE_DEN_COEFF": [1.0] + list(rng.uniform(-0.002, 0.002, 19)),
        "SAMP_NUM_COEFF": list(rng.uniform(-0.05, 0.05, 20)),
        "SAMP_DEN_COEFF": [1.0] + list(rng.uniform(-0.002, 0.002, 19)),
    }
    cam["LINE_NUM_COEFF"][2] = -1.0
    cam["SAMP_NUM_COEFF"][1] = 1.0
    return cam


def test_rpc_image_sql_bit_identical(con):
    """Random full-term cameras (long-repr coefficients — the case that
    exposed the DECIMAL-cast ulp drift) over the normalized box."""
    rng = np.random.default_rng(7)
    n = 30000
    for trial in range(3):
        cam = _random_cam(rng)
        lon = cam["LONG_OFF"] + rng.uniform(-0.9, 0.9, n) * cam["LONG_SCALE"]
        lat = cam["LAT_OFF"] + rng.uniform(-0.9, 0.9, n) * cam["LAT_SCALE"]
        h = cam["HEIGHT_OFF"] + rng.uniform(-0.9, 0.9, n) * cam["HEIGHT_SCALE"]
        x, y = proj.rpc_ground_to_image(cam, lon, lat, h)
        con.register("tr", pd.DataFrame({"k": np.arange(n), "lon": lon, "lat": lat, "h": h}))
        d = _fetch(con, "WITH " + proj.sql_rpc_image_ctes("tr", "k", cam)
                   + "\nSELECT k, img_x, img_y FROM _rpc ORDER BY k")
        assert int(np.sum(d["img_x"] != x)) == 0, f"trial {trial}"
        assert int(np.sum(d["img_y"] != y)) == 0, f"trial {trial}"


def test_utm_forward_accuracy_unchanged():
    """The bit-reproducible refactor (tan->sin/cos, **->multiply chains)
    must not move the projection: known value + roundtrip still hold."""
    # Snyder's worked example region: zone 18, lat 40.5N lon -73.5
    e, n = proj.utm_forward(np.array([-73.5]), np.array([40.5]), 18)
    lon2, lat2 = proj.utm_inverse(e, n, 18)
    assert abs(lon2[0] - -73.5) < 1e-9 and abs(lat2[0] - 40.5) < 1e-9
    # grid roundtrip across the zone
    rng = np.random.default_rng(5)
    lon = rng.uniform(-76.0, -70.0, 2000)
    lat = rng.uniform(-80.0, 80.0, 2000)
    e, n = proj.utm_forward(lon, lat, 18)
    lon2, lat2 = proj.utm_inverse(e, n, 18)
    # series truncation dominates at |lat|→80 / zone edge: ~3e-7 deg ≈ 1 cm
    assert np.max(np.abs(lon2 - lon)) < 1e-6
    assert np.max(np.abs(lat2 - lat)) < 1e-7


def test_utm_inverse_sql_bit_identical(con):
    """sql_utm_inverse_ctes reproduces utm_inverse BIT-FOR-BIT — the
    contract that puts the warp's inverse leg under the reproject_utm
    full oracle."""
    rng = np.random.default_rng(7)
    n = 50000
    e = rng.uniform(166000.0, 834000.0, n)  # zone-interior eastings
    for north in (True, False):
        nn = rng.uniform(0.0, 9330000.0, n) + (0.0 if north else 1000000.0)
        lon, lat = proj.utm_inverse(e, nn, 33, north=north)
        con.register("tinv", pd.DataFrame({"k": np.arange(n), "easting": e, "northing": nn}))
        d = _fetch(con, "WITH " + proj.sql_utm_inverse_ctes("tinv", "k", 33, north=north)
                   + "\nSELECT k, glon, glat FROM _inv ORDER BY k")
        assert int(np.sum(d["glon"] != lon)) == 0
        assert int(np.sum(d["glat"] != lat)) == 0


def test_utm_inverse_roundtrip_accuracy():
    """Accuracy unchanged by the bit-reproducible restructuring: forward
    then inverse lands within 1e-7 deg across the zone."""
    rng = np.random.default_rng(8)
    lon = rng.uniform(12.0, 18.0, 20000)
    lat = rng.uniform(-80.0, 80.0, 20000)
    e, n = proj.utm_forward(lon, lat, 33)
    lon2, lat2 = proj.utm_inverse(e, n, 33)
    assert np.abs(lon2 - lon).max() < 1e-7
    assert np.abs(lat2 - lat).max() < 1e-7
