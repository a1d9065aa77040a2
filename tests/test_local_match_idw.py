"""Local histogram matching (tile stats, mean-of-means ref map, bilinear +
gamma apply) and IDW gridding vs numpy oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gis_scripts_spark.index import cells
from gis_scripts_spark.operators import idw
from gis_scripts_spark.raster import codec, local_match
from gis_scripts_spark.raster.match import RES_DEG
from gis_scripts_spark.sources import synth


def _mk_image(arr, image_id, lon, lat):
    return {
        "image_id": image_id, "bytes": bytearray(codec.png_encode(arr)),
        "w": arr.shape[1], "h": arr.shape[0], "fmt": "png", "caption": "",
        "phash": 0, "lon": lon, "lat": lat, "nodata": -9999.0, "bands": arr.shape[2],
    }


def test_tile_stats_matches_numpy(spark):
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (64, 64, 1)).astype(np.uint8)
    df = spark.createDataFrame(pd.DataFrame([_mk_image(img, "a", 10.0, 20.0)]),
                               schema=synth.IMAGE_SCHEMA)
    z = 14
    got = local_match.tile_stats(df, z=z).toPandas()
    # oracle: direct scatter-add over pixel cells
    pc = local_match._pixel_cells(10.0, 20.0, 64, 64, z).ravel()
    vals = img[:, :, 0].ravel().astype(np.float64)
    want = pd.DataFrame({"cell": pc, "v": vals}).groupby("cell")["v"].agg(["sum", "count"])
    got = got.set_index("cell")
    assert set(got.index) == set(want.index)
    for c in want.index:
        assert np.isclose(got.loc[c, "sum"], want.loc[c, "sum"])
        assert got.loc[c, "cnt"] == want.loc[c, "count"]
    # totals conserve every pixel
    assert got["cnt"].sum() == 64 * 64


def test_bilinear_nan_aware():
    grid = np.array([[1.0, 3.0], [np.nan, 5.0]])
    # center point: NaN corner dropped, weights renormalized
    v = local_match._bilinear(grid, np.array([0.5]), np.array([0.5]))
    assert np.isclose(v[0], (1 * 0.25 + 3 * 0.25 + 5 * 0.25) / 0.75)
    # exact node
    v = local_match._bilinear(grid, np.array([0.0]), np.array([1.0]))
    assert np.isclose(v[0], 3.0)


def test_local_match_reduces_interimage_spread(spark):
    """Two images of the same scene, one brightness-shifted: after local
    match the per-tile per-image means must agree much more closely."""
    rng = np.random.default_rng(7)
    scene = rng.integers(60, 160, (64, 64, 1)).astype(np.uint8)
    bright = np.clip(scene.astype(np.int32) + 50, 0, 255).astype(np.uint8)
    rows = [_mk_image(scene, "a", 0.0, 0.0), _mk_image(bright, "b", 0.0, 0.0)]
    df = spark.createDataFrame(pd.DataFrame(rows), schema=synth.IMAGE_SCHEMA)
    z = 15

    def spread(frame):
        st = local_match.tile_stats(frame, z=z).toPandas()
        st["mean"] = st["sum"] / st["cnt"]
        piv = st.pivot_table(index="cell", columns="image_id", values="mean")
        piv = piv.dropna()
        return float((piv["a"] - piv["b"]).abs().mean())

    before = spread(df)
    after = spread(local_match.local_match(df, z=z))
    assert before > 30.0
    assert after < before * 0.25, f"spread {before} -> {after}"


def test_idw_matches_bruteforce(spark):
    rng = np.random.default_rng(12)
    n = 400
    pdf = pd.DataFrame(
        {
            "lon": rng.uniform(0.0, 2.0, n),
            "lat": rng.uniform(0.0, 2.0, n),
            "z": rng.uniform(0.0, 100.0, n),
        }
    )
    df = spark.createDataFrame(pdf)
    out = idw.idw_grid(df, value="z", cell_z=8, nodes_per_cell=4, power=2.0).toPandas()
    assert len(out) > 0
    assert out["value"].notna().any()
    # oracle for a sample of nodes: IDW over points in the node's 3x3 cells
    px = pdf["lon"].to_numpy()
    py = pdf["lat"].to_numpy()
    pv = pdf["z"].to_numpy()
    pcell = cells.cell(px, py, 8)
    # itertuples (not iterrows) keeps the int64 cell id exact
    for r in out.dropna(subset=["value"]).sample(20, random_state=0).itertuples():
        nb = set(cells.disk(int(r.cell), 1).tolist())
        m = np.isin(pcell, list(nb))
        dx = r.node_lon - px[m]
        dy = r.node_lat - py[m]
        d2 = np.maximum(dx * dx + dy * dy, 1e-24)
        w = 1.0 / d2
        want = (w * pv[m]).sum() / w.sum()
        assert np.isclose(r.value, want, rtol=1e-9), r
        assert r.n_contrib == m.sum()
