"""Pixel-kernel operators vs numpy oracles; input_hint per-row invariants
(decoded-pixel identity for png, PSNR>=40 for lossy; caption + phash
equality through pipelines)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gis_scripts_spark.raster import codec, match, ops
from gis_scripts_spark.sources import synth

N = 40


@pytest.fixture(scope="module")
def images_pdf():
    return pd.DataFrame([synth.make_image_row(i) for i in range(N)])


@pytest.fixture(scope="module")
def images(spark, images_pdf):
    df = synth.images_df(spark, N, parts=4).cache()
    df.count()
    return df


def _decode_map(pdf):
    return {r["image_id"]: codec.decode(bytes(r["bytes"]), r["fmt"]) for _, r in pdf.iterrows()}


def test_payload_integrity_through_pipeline(images, images_pdf):
    """input_hint invariant: a metadata-only pipeline must not disturb
    bytes/caption/phash; decoded pixels identical (png) / PSNR>=40 (qnt)."""
    out = images.filter(F.col("w") >= 32).select("image_id", "bytes", "fmt", "caption", "phash").toPandas()
    src = images_pdf.set_index("image_id")
    for _, r in out.iterrows():
        s = src.loc[r["image_id"]]
        assert r["caption"] == s["caption"]
        assert r["phash"] == s["phash"]
        a = codec.decode(bytes(r["bytes"]), r["fmt"])
        b = codec.decode(bytes(s["bytes"]), s["fmt"])
        if r["fmt"] == "png":
            assert (a == b).all()
        else:
            assert codec.psnr(a, b) >= 40.0


def test_band_stats_matches_numpy(images, images_pdf):
    got = ops.band_stats(images).toPandas().set_index(["image_id", "band"])
    dec = _decode_map(images_pdf)
    for img_id, img in dec.items():
        for b in range(img.shape[2]):
            band = img[:, :, b].astype(np.float64)
            row = got.loc[(img_id, b)]
            assert np.isclose(row["mean"], band.mean())
            assert np.isclose(row["std"], band.std())
            assert row["n_valid"] == band.size


def test_predicate_counts_matches_numpy(images, images_pdf):
    conds = ["<50", [">100", "<200"], "128"]
    got = ops.predicate_counts(images, conds).toPandas()
    dec = _decode_map(images_pdf)
    sub = got[got["image_id"] == "img_00000003"]
    img = dec["img_00000003"].astype(np.float64)
    for b in range(img.shape[2]):
        band = img[:, :, b].ravel()
        for cond, m in [("<50", band < 50), (">100&<200", (band > 100) & (band < 200)), ("128", band == 128)]:
            row = sub[(sub["band"] == b) & (sub["condition"] == cond)].iloc[0]
            assert row["n_match"] == m.sum()
            sel = band[m]
            if sel.size:
                assert np.isclose(row["std_match"], sel.std())
    roll = ops.predicate_rollup(ops.predicate_counts(images, conds)).toPandas()
    assert set(roll["condition"]) == {"<50", ">100&<200", "128"}


def test_replace_value_kernel(spark, images, images_pdf):
    out = ops.replace_value(images.filter(F.col("fmt") == "png"), 128, 129)
    pdf = out.select("image_id", "bytes", "fmt").toPandas()
    dec = _decode_map(images_pdf)
    for _, r in pdf.iterrows():
        want = dec[r["image_id"]].copy()
        want[want == 128] = 129
        got = codec.decode(bytes(r["bytes"]), r["fmt"])
        assert (got == want).all()


def test_add_scalar_kernel(spark, images, images_pdf):
    out = ops.add_scalar(images.filter(F.col("fmt") == "png"), 10)
    pdf = out.select("image_id", "bytes", "fmt").toPandas()
    dec = _decode_map(images_pdf)
    for _, r in pdf.iterrows():
        want = np.clip(dec[r["image_id"]].astype(np.int32) + 10, 0, 255).astype(np.uint8)
        got = codec.decode(bytes(r["bytes"]), r["fmt"])
        assert (got == want).all()


def test_connected_components_label():
    mask = np.zeros((8, 8), bool)
    mask[0:2, 0:2] = True          # size 4
    mask[5, 5] = True              # size 1
    mask[6:8, 0:3] = True          # size 6
    labels, counts = ops._label_components(mask, 4)
    sizes = sorted(c for c in counts if c > 0)
    assert sizes == [1, 4, 6]
    # 8-connectivity merges diagonal
    mask2 = np.zeros((4, 4), bool)
    mask2[0, 0] = mask2[1, 1] = True
    _, c4 = ops._label_components(mask2, 4)
    _, c8 = ops._label_components(mask2, 8)
    assert sorted(x for x in c4 if x) == [1, 1]
    assert sorted(x for x in c8 if x) == [2]


def test_replace_connected(spark):
    img = np.full((16, 16, 1), 7, np.uint8)
    img[0:4, 0:4] = 42   # 16-px component
    img[10, 10] = 42     # 1-px component
    pdf = pd.DataFrame([{
        "image_id": "t0", "bytes": bytearray(codec.png_encode(img)), "w": 16, "h": 16,
        "fmt": "png", "caption": "", "phash": 0, "lon": 0.0, "lat": 0.0,
        "nodata": -9999.0, "bands": 1,
    }])
    df = spark.createDataFrame(pdf, schema=synth.IMAGE_SCHEMA)
    out = ops.replace_connected(df, find=42, replace=0, min_size=10).toPandas()
    got = codec.decode(bytes(out["bytes"][0]), "png")
    assert (got[0:4, 0:4] == 0).all()       # big component replaced
    assert got[10, 10, 0] == 42             # small survives


def test_stretch_percentile(spark, images, images_pdf):
    bps = [(0.0, 0.0), (50.0, 128.0), (100.0, 255.0)]
    out = ops.stretch_percentile(images.filter(F.col("fmt") == "png").limit(4), bps)
    pdf = out.select("image_id", "bytes", "fmt").toPandas()
    dec = _decode_map(images_pdf)
    for _, r in pdf.iterrows():
        src = dec[r["image_id"]].astype(np.float64)
        want = np.empty_like(src)
        for b in range(src.shape[2]):
            xs = np.maximum.accumulate(np.percentile(src[:, :, b], [0, 50, 100]))
            want[:, :, b] = np.interp(src[:, :, b], xs, [0, 128, 255])
        want = np.clip(np.rint(want), 0, 255).astype(np.uint8)
        got = codec.decode(bytes(r["bytes"]), r["fmt"])
        assert (got == want).all()


# ---------------------------------------------------------- global match
def _mk_image(arr, image_id, lon, lat):
    return {
        "image_id": image_id, "bytes": bytearray(codec.png_encode(arr)),
        "w": arr.shape[1], "h": arr.shape[0], "fmt": "png", "caption": "",
        "phash": 0, "lon": lon, "lat": lat, "nodata": -9999.0, "bands": arr.shape[2],
    }


def test_global_match_recovers_offset(spark):
    """Two half-overlapping images of the same scene, one shifted +20 DN:
    the solve must bring overlap means together (reference invariant:
    matched images agree in the overlap)."""
    rng = np.random.default_rng(9)
    scene = rng.integers(60, 180, (64, 96, 1)).astype(np.uint8)
    res = match.RES_DEG
    a = scene[:, :64]          # covers cols 0..63
    b = scene[:, 32:]          # covers cols 32..95, shifted values
    b = np.clip(b.astype(np.int32) + 20, 0, 255).astype(np.uint8)
    rows = [
        _mk_image(a, "img_a", 0.0, 0.0),
        _mk_image(b, "img_b", 32 * res, 0.0),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows), schema=synth.IMAGE_SCHEMA)
    pair_stats = match.overlap_pair_stats(df, z=14).toPandas()
    assert len(pair_stats) == 1
    ps = pair_stats.iloc[0]
    assert ps["size"] == 64 * 32
    assert abs((ps["mean_j"] - ps["mean_i"]) - 20.0) < 1.5  # the known shift
    whole = ops.band_stats(df).toPandas()
    params = match.solve_gains(pair_stats, whole)
    pa = params[params["image_id"] == "img_a"].iloc[0]
    pb = params[params["image_id"] == "img_b"].iloc[0]
    # after adjustment the overlap means must nearly coincide
    adj_i = pa["a"] * ps["mean_i"] + pa["b"]
    adj_j = pb["a"] * ps["mean_j"] + pb["b"]
    assert abs(adj_i - adj_j) < 0.5
    # end-to-end apply runs and preserves schema
    adjusted, _ = match.global_match(df, z=14)
    out = adjusted.toPandas()
    assert set(out.columns) == set(df.columns)
    assert len(out) == 2
