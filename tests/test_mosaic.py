"""Pixel mosaic compositing vs a direct numpy paint oracle.

Oracle semantics (reference parity):
- first-wins == rasterio.merge default (merge_tif_files_rastario.py:31):
  the first VALID pixel in file order wins; nodata lets later files show.
- last-wins == gdal_merge (merge_tif_files.py:48-58): later files
  overwrite with their valid pixels.
"""

import numpy as np
import pandas as pd
import pytest

from gis_scripts_spark.operators import mosaic
from gis_scripts_spark.raster import codec
from gis_scripts_spark.raster.match import RES_DEG
from gis_scripts_spark.sources import synth

ND = -9999.0


def _mk(arr, image_id, px0, py0):
    """Image anchored at global pixel (px0, py0) (top-left, from lon=-180,
    lat=+90 going south)."""
    h, w = arr.shape[:2]
    lon = -180.0 + px0 * RES_DEG
    lat = 90.0 - (py0 + h) * RES_DEG
    return {
        "image_id": image_id, "bytes": bytearray(codec.raw_encode(arr)),
        "w": w, "h": h, "fmt": "raw", "caption": "", "phash": 0,
        "lon": lon, "lat": lat, "nodata": ND, "bands": arr.shape[2] if arr.ndim == 3 else 1,
    }


def _numpy_mosaic(images, order, T):
    """Oracle: paint onto an infinite canvas dict of tiles, python loops."""
    tiles = {}
    seq = sorted(images, key=lambda r: r["id"])
    if order == "first":
        pass  # first in order paints first and wins
    for rank, rec in enumerate(seq):
        arr, px0, py0 = rec["arr"], rec["px0"], rec["py0"]
        h, w = arr.shape[:2]
        for r in range(h):
            for c in range(w):
                v = arr[r, c, 0]
                if v == ND:
                    continue
                gx, gy = px0 + c, py0 + r
                tx, ty = gx // T, gy // T
                key = (tx, ty)
                if key not in tiles:
                    tiles[key] = (np.full((T, T), ND, arr.dtype), np.full((T, T), -1))
                canvas, owner = tiles[key]
                lx, ly = gx - tx * T, gy - ty * T
                if order == "first":
                    if owner[ly, lx] == -1:
                        canvas[ly, lx] = v
                        owner[ly, lx] = rank
                else:  # last wins
                    canvas[ly, lx] = v
                    owner[ly, lx] = rank
    return tiles


@pytest.mark.parametrize("order", ["first", "last"])
def test_mosaic_matches_numpy_oracle(spark, order):
    rng = np.random.default_rng(5)
    specs = []
    # three overlapping int16 scenes with planted nodata holes, straddling
    # a tile boundary (T=32): offsets chosen so tiles get 1-3 sources
    for i, (px0, py0) in enumerate([(10, 10), (26, 18), (40, 26)]):
        arr = rng.integers(0, 500, (24, 24, 1)).astype(np.int16)
        arr[rng.random((24, 24)) < 0.2, 0] = np.int16(ND)
        specs.append({"id": f"m_{i}", "arr": arr, "px0": px0, "py0": py0})

    rows = [_mk(s["arr"], s["id"], s["px0"], s["py0"]) for s in specs]
    df = spark.createDataFrame(pd.DataFrame(rows), schema=synth.IMAGE_SCHEMA)
    out = mosaic.mosaic_composite(
        df, tile_px=32, order=order, nodata_col="nodata", fill_value=ND
    ).toPandas()

    want = _numpy_mosaic(specs, order, 32)
    got = {}
    for _, r in out.iterrows():
        img = codec.decode(bytes(r["bytes"]), r["fmt"])
        got[(r["tile_x"], r["tile_y"])] = img[:, :, 0]
    # tiles with any valid pixel must match the oracle exactly
    want_nonempty = {k: v for k, (v, o) in want.items() if (o >= 0).any()}
    assert set(got) == set(want_nonempty)
    for key, canvas in want_nonempty.items():
        assert got[key].dtype == canvas.dtype
        assert (got[key] == canvas).all(), key


def test_mosaic_deterministic_across_parallelism(spark):
    rng = np.random.default_rng(11)
    rows = []
    for i in range(12):
        arr = rng.integers(0, 200, (16, 16, 1)).astype(np.int16)
        rows.append(_mk(arr, f"d_{i:02d}", (i % 4) * 8, (i // 4) * 8))
    pdf = pd.DataFrame(rows)
    a = mosaic.mosaic_composite(
        spark.createDataFrame(pdf, schema=synth.IMAGE_SCHEMA).repartition(7),
        tile_px=32, order="last", nodata_col="nodata", fill_value=ND,
    ).toPandas().sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
    b = mosaic.mosaic_composite(
        spark.createDataFrame(pdf, schema=synth.IMAGE_SCHEMA).repartition(2),
        tile_px=32, order="last", nodata_col="nodata", fill_value=ND,
    ).toPandas().sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
    assert (a["n_valid_px"] == b["n_valid_px"]).all()
    for x, y in zip(a["bytes"], b["bytes"]):
        assert bytes(x) == bytes(y)


def test_mosaic_heterogeneous_band_counts_raise(spark):
    """Round-4 gate (VERDICT r3 #6): a 3-band and a 1-band source landing
    in the same tile must RAISE (reference semantics: mixed band stacks
    are an error, temp/resample_and_merge_rasters.ipynb) — the old code
    silently painted min(src_bands, canvas_bands) and dropped bands."""
    rng = np.random.default_rng(7)
    a3 = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    b1 = rng.integers(0, 255, (16, 16, 1)).astype(np.uint8)
    rows = [_mk(a3, "hb_a", 10, 10), _mk(b1, "hb_b", 12, 12)]
    df = spark.createDataFrame(pd.DataFrame(rows), schema=synth.IMAGE_SCHEMA)
    out = mosaic.mosaic_composite(df, tile_px=32, order="last",
                                  nodata_col="nodata", fill_value=0)
    with pytest.raises(Exception, match="heterogeneous band counts"):
        out.collect()


def test_probe_shape_header_only():
    """probe_shape agrees with the full decode across all codecs, reading
    only header bytes."""
    rng = np.random.default_rng(9)
    img8 = rng.integers(0, 255, (13, 17, 3)).astype(np.uint8)
    img16 = rng.integers(-500, 500, (9, 21, 2)).astype(np.int16)
    cases = [
        (codec.png_encode(img8), "png", (13, 17, 3)),
        (codec.qnt_encode(img8), "qnt", (13, 17, 3)),
        (codec.raw_encode(img16), "raw", (9, 21, 2)),
        (codec.encode(img16, "tif"), "tif", (9, 21, 2)),
    ]
    for buf, fmt, want in cases:
        assert codec.probe_shape(buf, fmt) == want, fmt
        assert codec.probe_shape(buf, None) == want, fmt  # sniffed
