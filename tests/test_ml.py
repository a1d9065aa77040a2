"""Model train/infer sink (S12): distributed softmax vs a driver-side
numpy oracle; save/load roundtrip; patch featurization; end-to-end
patch-classify flow (the seagrass_lib.py:692-742 shape)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gis_scripts_spark.ml import softmax
from gis_scripts_spark.raster import codec
from gis_scripts_spark.sources import synth


def _blob_data(n=600, d=4, k=3, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-3, 3, (k, d))
    x = np.concatenate([centers[i] + 0.4 * rng.standard_normal((n // k, d))
                        for i in range(k)])
    y = np.repeat(np.arange(k), n // k)
    return x, y


def _train_numpy(x, y, k, iters, lr, l2):
    """Driver-side oracle: identical math, single process."""
    xb = np.concatenate([x, np.ones((len(x), 1))], axis=1)
    w = np.zeros((k, xb.shape[1]))
    for _ in range(iters):
        logits = xb @ w.T
        logits -= logits.max(axis=1, keepdims=True)
        e = np.exp(logits)
        p = e / e.sum(axis=1, keepdims=True)
        p[np.arange(len(y)), y] -= 1.0
        grad = p.T @ xb / len(y)
        w -= lr * (grad + l2 * w)
    return w


def test_train_softmax_matches_numpy_oracle(spark):
    x, y = _blob_data()
    df = spark.createDataFrame(
        pd.DataFrame({"features": list(map(list, x)), "label": y})
    ).repartition(8)
    model = softmax.train_softmax(df, ["a", "b", "c"], iters=25, lr=0.3, l2=1e-4)
    want = _train_numpy(x, y, 3, iters=25, lr=0.3, l2=1e-4)
    # full-batch GD is deterministic: partial sums are exact up to fp
    # reassociation across partitions
    assert np.allclose(model["weights"], want, atol=1e-8)
    assert model["losses"][0] > model["losses"][-1]


def test_model_sink_roundtrip_and_predict(spark, tmp_path):
    x, y = _blob_data()
    df = spark.createDataFrame(
        pd.DataFrame({"features": list(map(list, x)), "label": y})
    )
    model = softmax.train_softmax(df, ["water", "sand", "grass"], iters=40, lr=0.3)
    path = str(tmp_path / "model")
    softmax.save_model(model, path)
    back = softmax.load_model(path)
    assert back["class_names"] == ["water", "sand", "grass"]
    assert np.array_equal(back["weights"], model["weights"])
    pred = df.withColumn("cls", softmax.predict_udf(back)(F.col("features")))
    acc = pred.filter(
        F.col("cls") == F.element_at(F.array(*[F.lit(c) for c in back["class_names"]]),
                                     (F.col("label") + 1).cast("int"))
    ).count() / df.count()
    assert acc > 0.95, acc


def test_patch_features_and_end_to_end_classify(spark, tmp_path):
    """Two synthetic 'scene types' (dark/bright) -> patch features ->
    train -> predict: the reference's patch-classifier flow."""
    rng = np.random.default_rng(3)
    rows = []
    for i in range(8):
        level = 40 if i % 2 == 0 else 180
        px = np.clip(rng.normal(level, 10, (32, 32, 1)), 0, 255).astype(np.uint8)
        rows.append({
            "image_id": f"sc_{i}", "bytes": bytearray(codec.png_encode(px)),
            "w": 32, "h": 32, "fmt": "png", "caption": "", "phash": 0,
            "lon": float(i), "lat": 0.0, "nodata": -9999.0, "bands": 1,
        })
    df = spark.createDataFrame(pd.DataFrame(rows), schema=synth.IMAGE_SCHEMA)
    feats = softmax.patch_features(df, patch=8)
    assert feats.count() == 8 * 16  # 4x4 patches per image
    labeled = feats.withColumn(
        "label",
        (F.regexp_extract("image_id", r"sc_(\d+)", 1).cast("int") % 2),
    )
    model = softmax.train_softmax(labeled, ["dark", "bright"], iters=30, lr=0.1)
    path = str(tmp_path / "m2")
    softmax.save_model(model, path)
    pred = feats.withColumn("cls", softmax.predict_udf(softmax.load_model(path))(F.col("features")))
    wrong = pred.filter(
        ((F.regexp_extract("image_id", r"sc_(\d+)", 1).cast("int") % 2 == 0)
         & (F.col("cls") != "dark"))
        | ((F.regexp_extract("image_id", r"sc_(\d+)", 1).cast("int") % 2 == 1)
           & (F.col("cls") != "bright"))
    ).count()
    assert wrong == 0


# --------------------------------------------------------------------------
# real DCNN (ml/dcnn.py): the reference architecture from scratch


def test_dcnn_gradients_match_finite_differences():
    """Analytic backprop vs central finite differences on every parameter
    tensor — the from-scratch layer math's exactness proof."""
    from gis_scripts_spark.ml import dcnn

    rng = np.random.default_rng(5)
    dim, ch, k, n = 5, 2, 3, 4
    params = dcnn.init_params(dim, ch, k, seed=11)
    x = rng.standard_normal((n, dim, dim, ch))
    y = rng.integers(0, k, n)
    _, grads = dcnn.loss_and_grads(params, x, y)
    eps = 1e-6
    for name in params:
        flat = params[name].ravel()
        for j in rng.choice(flat.size, size=min(8, flat.size), replace=False):
            orig = flat[j]
            flat[j] = orig + eps
            lp, _ = dcnn.loss_and_grads(params, x, y)
            flat[j] = orig - eps
            lm, _ = dcnn.loss_and_grads(params, x, y)
            flat[j] = orig
            num = (lp - lm) / (2 * eps)
            ana = grads[name].ravel()[j]
            assert abs(num - ana) <= 1e-5 * max(1.0, abs(num)), (name, j, num, ana)


def test_dcnn_dropout_masks_partition_independent(spark):
    """Same data at 2 vs 8 partitions trains to the same weights (up to fp
    reassociation of the partial sums): dropout streams are keyed by
    content hash, not by partition/row position."""
    from gis_scripts_spark.ml import dcnn

    rng = np.random.default_rng(9)
    dim, ch, k, n = 5, 2, 2, 64
    x = rng.standard_normal((n, dim * dim * ch))
    x[: n // 2] += 1.5
    y = np.array([0] * (n // 2) + [1] * (n // 2))
    pdf = pd.DataFrame({"pixels": list(map(list, x)), "label": y})
    kw = dict(dimension=dim, channels=ch, iters=6, dropout=0.05, seed=3)
    m2 = dcnn.train_dcnn(spark.createDataFrame(pdf).repartition(2), ["a", "b"], **kw)
    m8 = dcnn.train_dcnn(spark.createDataFrame(pdf).repartition(8), ["a", "b"], **kw)
    for name in m2["params"]:
        assert np.allclose(m2["params"][name], m8["params"][name], atol=1e-9), name


def test_dcnn_distributed_matches_driver_oracle(spark):
    """Distributed Adam (dropout=0) == the identical single-process numpy
    loop: the partial-sum plumbing adds nothing but fp reassociation."""
    from gis_scripts_spark.ml import dcnn

    rng = np.random.default_rng(2)
    dim, ch, k, n = 5, 2, 3, 48
    x = rng.standard_normal((n, dim * dim * ch))
    y = rng.integers(0, k, n)
    pdf = pd.DataFrame({"pixels": list(map(list, x)), "label": y})
    iters, lr = 5, 1e-3
    got = dcnn.train_dcnn(
        spark.createDataFrame(pdf).repartition(6), ["a", "b", "c"],
        dimension=dim, channels=ch, iters=iters, lr=lr, dropout=0.0, seed=7,
    )
    # driver oracle: same init, same Adam, full batch in one process
    params = dcnn.init_params(dim, ch, k, seed=7)
    vec = dcnn._pack(params)
    m = np.zeros_like(vec)
    v = np.zeros_like(vec)
    xs = x.reshape(n, dim, dim, ch)
    for it in range(iters):
        loss, grads = dcnn.loss_and_grads(
            dcnn._unpack(vec, dim, ch, k), xs, y
        )
        grad = dcnn._pack(grads) / n
        m = 0.9 * m + 0.1 * grad
        v = 0.999 * v + 0.001 * grad * grad
        vec = vec - lr * (m / (1 - 0.9 ** (it + 1))) / (
            np.sqrt(v / (1 - 0.999 ** (it + 1))) + 1e-7
        )
    want = dcnn._unpack(vec, dim, ch, k)
    for name in want:
        assert np.allclose(got["params"][name], want[name], atol=1e-9), name
    assert got["losses"][0] > got["losses"][-1]


def test_dcnn_end_to_end_patch_classify(spark, tmp_path):
    """patch_pixels -> train_dcnn -> sink roundtrip -> predict_udf: the
    complete seagrass DCNN flow (train_dcnn + dcnn_classification,
    seagrass_lib.py:591-742) on two synthetic scene classes that need the
    3x3 layer (fine vertical stripes vs flat — identical patch MEANS, so
    a mean-feature linear model cannot separate them; spatial conv can)."""
    from gis_scripts_spark.ml import dcnn

    rng = np.random.default_rng(4)
    rows = []
    for i in range(10):
        if i % 2 == 0:  # striped: alternating columns 60/140
            base = np.tile(
                np.where(np.arange(27) % 2 == 0, 60.0, 140.0), (27, 1)
            )
        else:  # flat at the same mean
            base = np.full((27, 27), 100.0)
        px = np.clip(base + rng.normal(0, 5, (27, 27)), 0, 255)[..., None]
        rows.append({
            "image_id": f"tx_{i}",
            "bytes": bytearray(codec.png_encode(px.astype(np.uint8))),
            "w": 27, "h": 27, "fmt": "png", "caption": "", "phash": 0,
            "lon": float(i), "lat": 0.0, "nodata": -9999.0, "bands": 1,
        })
    df = spark.createDataFrame(pd.DataFrame(rows), schema=synth.IMAGE_SCHEMA)
    patches = dcnn.patch_pixels(df, dimension=9)
    assert patches.count() == 10 * 9  # 3x3 patches per 27x27 image
    labeled = patches.withColumn(
        "label",
        (F.regexp_extract("image_id", r"tx_(\d+)", 1).cast("int") % 2),
    )
    model = dcnn.train_dcnn(
        labeled, ["striped", "flat"], dimension=9, channels=1,
        iters=40, lr=5e-3, dropout=0.01, seed=7,
    )
    path = str(tmp_path / "dcnn")
    dcnn.save_model(model, path)
    back = dcnn.load_model(path)
    assert back["class_names"] == ["striped", "flat"]
    assert back["arch"] == {"dimension": 9, "channels": 1, "classes": 2}
    pred = patches.withColumn("cls", dcnn.predict_udf(back)(F.col("pixels")))
    wrong = pred.filter(
        ((F.regexp_extract("image_id", r"tx_(\d+)", 1).cast("int") % 2 == 0)
         & (F.col("cls") != "striped"))
        | ((F.regexp_extract("image_id", r"tx_(\d+)", 1).cast("int") % 2 == 1)
           & (F.col("cls") != "flat"))
    ).count()
    assert wrong == 0


def test_dcnn_patch_pixels_drops_nodata_patches(spark):
    """The reference's null-sample filter: any patch containing nodata is
    dropped (seagrass_lib.py:644-646)."""
    from gis_scripts_spark.ml import dcnn

    img = np.full((18, 18, 1), 80.0)
    img[0, 0, 0] = -1.0  # poisons exactly the (0,0) patch
    raw = codec.raw_encode(img.astype(np.float32))
    rows = [{
        "image_id": "nd_0", "bytes": bytearray(raw), "w": 18, "h": 18,
        "fmt": "raw1", "caption": "", "phash": 0, "lon": 0.0, "lat": 0.0,
        "nodata": -1.0, "bands": 1,
    }]
    df = spark.createDataFrame(pd.DataFrame(rows), schema=synth.IMAGE_SCHEMA)
    got = dcnn.patch_pixels(df, dimension=9, nodata_col="nodata").toPandas()
    assert len(got) == 3  # 2x2 grid minus the poisoned (0,0)
    assert (0, 0) not in set(zip(got["py"], got["px"]))
