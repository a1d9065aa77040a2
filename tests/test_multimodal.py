"""Multimodal binary-column operators: containers roundtrip, resize,
features, frame sampling; codec stubs raise for absent external formats."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gis_scripts_spark.operators import multimodal as mm
from gis_scripts_spark.raster import codec
from gis_scripts_spark.sources import synth


def test_audio_container_roundtrip_and_features(spark):
    sr = 8000
    tt = np.arange(sr * 2) / sr
    wave = 0.5 * np.sin(2 * np.pi * 440 * tt)
    buf = mm.audio_encode(wave, sr)
    dec, sr2 = mm.audio_decode(buf)
    assert sr2 == sr and len(dec) == len(wave)
    assert np.allclose(dec, wave, atol=1e-3)
    pdf = pd.DataFrame({"clip_id": ["c0"], "bytes": [bytearray(buf)]})
    out = mm.audio_features(spark.createDataFrame(pdf)).toPandas().iloc[0]
    assert np.isclose(out["duration_sec"], 2.0)
    assert np.isclose(out["rms"], 0.5 / np.sqrt(2), atol=1e-3)
    assert np.isclose(out["peak"], 0.5, atol=1e-3)


def test_audio_decode_stub_for_external_formats():
    with pytest.raises(NotImplementedError):
        mm.audio_decode(b"ID3\x04fake-mp3-bytes")


def test_video_container_and_frame_sampling(spark):
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 255, (16, 16, 1)).astype(np.uint8) for _ in range(7)]
    buf = mm.video_encode(frames)
    assert mm.video_frame_count(buf) == 7
    pdf = pd.DataFrame({"video_id": ["v0"], "bytes": [bytearray(buf)]})
    out = mm.sample_frames(spark.createDataFrame(pdf), every_k=3).toPandas()
    assert out["frame_idx"].tolist() == [0, 3, 6]
    # frames decode back within QNT loss
    f0 = codec.qnt_decode(bytes(out["frame_bytes"][0]))
    assert codec.psnr(frames[0], f0) >= 40


def test_resize_and_features(spark):
    df = synth.images_df(spark, 12, parts=2)
    out = mm.resize_images(df, 16, 16).toPandas()
    assert set(out["w"]) == {16} and set(out["h"]) == {16}
    for _, r in out.iterrows():
        img = codec.decode(bytes(r["bytes"]), r["fmt"])
        assert img.shape[:2] == (16, 16)
    feats = mm.image_features(df).toPandas()
    assert len(feats) == 12
    assert (feats["std_px"] > 0).all()
    # phash from features matches the table's phash column
    tbl = df.select("image_id", "phash").toPandas().set_index("image_id")
    lossless = df.filter(F.col("fmt") == "png").select("image_id").toPandas()["image_id"]
    for _, r in feats[feats["image_id"].isin(set(lossless))].iterrows():
        assert r["phash"] == tbl.loc[r["image_id"], "phash"]
