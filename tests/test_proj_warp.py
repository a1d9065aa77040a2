"""From-scratch CRS transforms (UTM / polar stereographic / web mercator)
and the raster warp operator — roundtrip + control-point + warp oracles."""

import numpy as np
import pandas as pd
import pytest

from gis_scripts_spark.index import proj
from gis_scripts_spark.raster import codec, warp
from gis_scripts_spark.raster.match import RES_DEG
from gis_scripts_spark.sources import synth


def test_utm_control_points_and_roundtrip():
    # central-meridian invariants: easting exactly 500000, northing = k0*M
    e, n = proj.utm_forward(np.array([3.0]), np.array([0.0]), 31)
    assert e[0] == 500000.0 and n[0] == 0.0
    e, n = proj.utm_forward(np.array([15.0]), np.array([52.0]), 33)
    assert e[0] == 500000.0
    assert abs(n[0] - 5761038.21) < 0.5  # k0 * meridian arc at 52N
    # southern hemisphere false northing
    _, ns = proj.utm_forward(np.array([15.0]), np.array([-1.0]), 33, north=False)
    assert 9_800_000 < ns[0] < 10_000_000
    rng = np.random.default_rng(0)
    lon = 3.0 + rng.uniform(-2.9, 2.9, 3000)
    lat = rng.uniform(-79, 83, 3000)
    e, n = proj.utm_forward(lon, lat, 31)
    lon2, lat2 = proj.utm_inverse(e, n, 31)
    assert np.abs(lon2 - lon).max() < 1e-7
    assert np.abs(lat2 - lat).max() < 1e-7


def test_polar_stereo_roundtrip_and_pole():
    x, y = proj.polar_stereo_forward(np.array([45.0]), np.array([-90.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6  # pole maps to origin
    rng = np.random.default_rng(1)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-89.5, -60, 2000)
    x, y = proj.polar_stereo_forward(lon, lat)
    lon2, lat2 = proj.polar_stereo_inverse(x, y)
    dl = (lon2 - lon + 540) % 360 - 180
    assert np.abs(dl).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9
    # north variant
    xn, yn = proj.polar_stereo_forward(lon, -lat, south=False, lat_ts=71.0)
    lon3, lat3 = proj.polar_stereo_inverse(xn, yn, south=False, lat_ts=71.0)
    assert np.abs((lon3 - lon + 540) % 360 - 180).max() < 1e-9
    assert np.abs(lat3 + lat).max() < 1e-9


def test_webmerc_matches_tile_math():
    rng = np.random.default_rng(2)
    lon = rng.uniform(-179, 179, 500)
    lat = rng.uniform(-85, 85, 500)
    x, y = proj.webmerc_forward(lon, lat)
    lon2, lat2 = proj.webmerc_inverse(x, y)
    assert np.abs(lon2 - lon).max() < 1e-12
    assert np.abs(lat2 - lat).max() < 1e-10


def _mk_img(arr, image_id, lon, lat, nodata=-9999.0):
    return {
        "image_id": image_id, "bytes": bytearray(codec.raw_encode(arr)),
        "w": arr.shape[1], "h": arr.shape[0], "fmt": "raw", "caption": "",
        "phash": 0, "lon": lon, "lat": lat, "nodata": nodata,
        "bands": arr.shape[2],
    }


@pytest.mark.parametrize("crs,res_m", [("utm:33n", 120.0), ("webmerc", 150.0)])
def test_reproject_raster_preserves_values(spark, crs, res_m):
    """Nearest-neighbor warp of a constant image: every valid output pixel
    equals the constant, nodata only outside the footprint, and the output
    grid is TAP-snapped to res multiples."""
    arr = np.full((40, 60, 1), 777, np.int16)
    df = spark.createDataFrame(
        pd.DataFrame([_mk_img(arr, "c1", 14.9, 51.9)]), schema=synth.IMAGE_SCHEMA
    )
    out = warp.reproject_raster(df, crs, res_m, method="nearest").toPandas()
    r = out.iloc[0]
    assert r["crs"] == crs and r["fmt"] == "raw"
    assert r["x0"] % res_m == 0.0 and r["y0"] % res_m == 0.0
    img = codec.decode(bytes(r["bytes"]), "raw")[:, :, 0]
    vals = np.unique(img)
    assert set(vals.tolist()) <= {777, -9999}
    assert (img == 777).sum() > 0.5 * img.size  # footprint dominates


def test_reproject_raster_bilinear_gradient(spark):
    """Bilinear warp of a horizontal gradient to web mercator (x linear in
    lon): interior output columns must reproduce the gradient exactly up to
    interpolation (monotone, within source range)."""
    w, h = 64, 32
    arr = np.tile(np.arange(w, dtype=np.float32) * 10.0, (h, 1))[:, :, None]
    df = spark.createDataFrame(
        pd.DataFrame([_mk_img(arr, "g1", 10.0, 0.0)]), schema=synth.IMAGE_SCHEMA
    )
    res_m = 100.0
    out = warp.reproject_raster(df, "webmerc", res_m, method="bilinear").toPandas()
    img = codec.decode(bytes(out.iloc[0]["bytes"]), "raw")[:, :, 0]
    mid = img[img.shape[0] // 2]
    valid = mid[mid != -9999.0]
    assert len(valid) > 10
    assert (np.diff(valid) >= -1e-6).all()  # monotone nondecreasing
    assert valid.min() >= 0.0 and valid.max() <= 630.0


def test_reproject_roundtrip_statistics(spark):
    """Warp to UTM and back-check via inverse projection: the mean of a
    random image must be preserved (resampling is mean-preserving within
    noise for nearest on a uniform grid)."""
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 1000, (50, 50, 1)).astype(np.int16)
    df = spark.createDataFrame(
        pd.DataFrame([_mk_img(arr, "r1", 15.0, 52.0)]), schema=synth.IMAGE_SCHEMA
    )
    out = warp.reproject_raster(df, "utm:33n", 100.0, method="nearest").toPandas()
    img = codec.decode(bytes(out.iloc[0]["bytes"]), "raw")[:, :, 0].astype(np.float64)
    valid = img[img != -9999.0]
    assert abs(valid.mean() - arr.mean()) < 25.0
