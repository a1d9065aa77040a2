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
