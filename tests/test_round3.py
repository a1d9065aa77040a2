"""Round-3 fixes: GeoTIFF predictor, nodata-aware warp bilinear,
overlap_pair_stats null-nodata guard, typed radiometric apply path."""

import numpy as np
import pandas as pd
import pytest

from gis_scripts_spark.raster import codec, geotiff, warp
from gis_scripts_spark.raster.match import RES_DEG
from gis_scripts_spark.sources import synth


# ------------------------------------------------- GeoTIFF predictor (317)
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int16, np.int32])
def test_tiff_predictor2_roundtrip(dtype):
    rng = np.random.default_rng(9)
    if np.issubdtype(dtype, np.integer):
        arr = rng.integers(np.iinfo(dtype).min, np.iinfo(dtype).max, (130, 37, 3)).astype(dtype)
    buf = geotiff.tiff_encode(arr, compress=True, predictor=2)
    back, _ = geotiff.tiff_decode(buf)
    assert back.dtype == arr.dtype
    assert (back == arr).all()


def test_tiff_predictor3_rejected():
    import struct

    arr = np.arange(64, dtype=np.uint16).reshape(8, 8)
    buf = bytearray(geotiff.tiff_encode(arr, predictor=2))
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    (n,) = struct.unpack_from("<H", buf, ifd_off)
    for i in range(n):
        (tag,) = struct.unpack_from("<H", buf, ifd_off + 2 + 12 * i)
        if tag == geotiff.TAG_PREDICTOR:
            struct.pack_into("<H", buf, ifd_off + 2 + 12 * i + 8, 3)
    with pytest.raises(NotImplementedError):
        geotiff.tiff_decode(bytes(buf))


def test_tiff_predictor2_on_float_rejected():
    with pytest.raises(ValueError):
        geotiff.tiff_encode(np.zeros((4, 4), np.float32), predictor=2)


# --------------------------------------------- warp bilinear nodata masking
def _one_image_df(spark, px, lon=14.0, lat=52.0, nodata=-9999.0):
    rows = [{
        "image_id": "w0", "bytes": bytearray(codec.raw_encode(px)),
        "w": px.shape[1], "h": px.shape[0], "fmt": "raw", "caption": "c",
        "phash": 0, "lon": lon, "lat": lat, "nodata": nodata,
        "bands": px.shape[2],
    }]
    return spark.createDataFrame(pd.DataFrame(rows), schema=synth.IMAGE_SCHEMA)


def test_warp_bilinear_excludes_nodata(spark):
    # constant-100 image with a sentinel hole: nodata-aware bilinear must
    # never blend the sentinel — every valid output pixel is exactly 100
    px = np.full((32, 32, 1), 100.0, np.float32)
    px[10:20, 12:22, 0] = -9999.0
    df = _one_image_df(spark, px)
    out = warp.reproject_raster(df, "utm:33n", 40.0, method="bilinear").toPandas()
    img = codec.raw_decode(bytes(out.loc[0, "bytes"]))
    vals = np.unique(img)
    assert set(vals.tolist()) <= {100.0, -9999.0}
    assert (img == 100.0).sum() > 0 and (img == -9999.0).sum() > 0


def test_warp_bilinear_no_nodata_unchanged(spark):
    # without a sentinel the blend path is the plain 4-corner expression
    rng = np.random.default_rng(3)
    px = rng.uniform(0, 255, (24, 24, 1)).astype(np.float32)
    df = _one_image_df(spark, px, nodata=-1.0)  # nodata_col=None: unused
    out = warp.reproject_raster(df, "utm:33n", 60.0, method="bilinear",
                                nodata_col=None).toPandas()
    img = codec.raw_decode(bytes(out.loc[0, "bytes"]))
    valid = img[img != 0.0]
    assert valid.size > 0
    assert valid.min() >= px.min() - 1e-3 and valid.max() <= px.max() + 1e-3


# --------------------------------- overlap_pair_stats null-nodata guard
def test_pair_stats_null_nodata_guard(spark):
    from gis_scripts_spark.raster import match

    rng = np.random.default_rng(5)
    rows = []
    for k, c0 in enumerate([0, 32]):
        px = rng.integers(0, 255, (64, 64, 1)).astype(np.uint8)
        rows.append({
            "image_id": f"g{k}", "bytes": bytearray(codec.png_encode(px)),
            "w": 64, "h": 64, "fmt": "png", "caption": "x", "phash": 0,
            "lon": c0 * RES_DEG, "lat": 0.0, "nodata": float("nan"), "bands": 1,
        })
    df = spark.createDataFrame(pd.DataFrame(rows), schema=synth.IMAGE_SCHEMA)
    # a NaN nodata column must mean "no masking", not NaN-disabled masking
    out = match.overlap_pair_stats(df, z=13, nodata_col="nodata").toPandas()
    assert len(out) == 1
    assert out.loc[0, "size"] == 32 * 64
