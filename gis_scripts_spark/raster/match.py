"""Global histogram matching — the reference's flagship pipeline
(``global_match.py:314-554``), re-expressed Spark-first (SURVEY.md §3.1):

  stage A: per-image whole stats          -> ops.band_stats (one decode/img)
  stage B: footprint overlap pairs        -> operators.overlap_join (J1)
           pair-window masked stats (J2)  -> applyInPandas per pair
  stage C: driver-side weighted least-squares solve (the matrix is
           2·n_images × (2·pairs + 2·n_images) — driver-scale by design,
           like the reference's scipy.optimize.least_squares at :442-447)
  stage D: broadcast params + vectorized apply -> ops.apply_linear

Footprint model: image at (lon, lat) covers
[lon, lon + w·res] × [lat, lat + h·res], res = RES_DEG °/px, north-up —
the affine-geotransform analogue (global_match.py:29,39-48).

Unlike the reference, whole-image stats are computed ONCE per image (not
re-read per pair — the quadratic-I/O miss noted in SURVEY.md §4.1), and
pair windows decode only the two images of the pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from gis_scripts_spark.operators import overlap_join
from gis_scripts_spark.raster import codec

RES_DEG = 0.001  # degrees per pixel of the synthetic footprint model

PAIR_STATS_SCHEMA = StructType(
    [
        StructField("id_i", StringType(), False),
        StructField("id_j", StringType(), False),
        StructField("band", IntegerType(), False),
        StructField("mean_i", DoubleType(), False),
        StructField("std_i", DoubleType(), False),
        StructField("mean_j", DoubleType(), False),
        StructField("std_j", DoubleType(), False),
        StructField("size", LongType(), False),
    ]
)


def footprints(images: DataFrame) -> DataFrame:
    """(id, x_min, y_min, x_max, y_max) from the image table."""
    return images.select(
        F.col("image_id").alias("id"),
        F.col("lon").alias("x_min"),
        F.col("lat").alias("y_min"),
        (F.col("lon") + F.col("w") * F.lit(RES_DEG)).alias("x_max"),
        (F.col("lat") + F.col("h") * F.lit(RES_DEG)).alias("y_max"),
    )


def overlap_pair_stats(images: DataFrame, z: int = 10) -> DataFrame:
    """J1 + J2: overlap pairs, then per-pair per-band masked stats over the
    shared window (global_match.py:76-198). Bands beyond min(bands_i,
    bands_j) are skipped, mirroring the reference's shared band loop."""
    fp = footprints(images)
    pairs = overlap_join.bbox_overlap_join(fp, z=z, id_col="id")

    img_i = images.select(
        F.col("image_id").alias("id_i"),
        F.col("bytes").alias("_bytes_i"),
        F.col("fmt").alias("_fmt_i"),
        F.col("lon").alias("_lon_i"),
        F.col("lat").alias("_lat_i"),
        F.col("h").alias("_h_i"),
    )
    img_j = images.select(
        F.col("image_id").alias("id_j"),
        F.col("bytes").alias("_bytes_j"),
        F.col("fmt").alias("_fmt_j"),
        F.col("lon").alias("_lon_j"),
        F.col("lat").alias("_lat_j"),
        F.col("h").alias("_h_j"),
    )
    joined = pairs.join(img_i, "id_i").join(img_j, "id_j")

    def run(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                a = codec.decode(bytes(row["_bytes_i"]), row["_fmt_i"]).astype(np.float64)
                b = codec.decode(bytes(row["_bytes_j"]), row["_fmt_j"]).astype(np.float64)
                win_a = _window(a, row["_lon_i"], row["_lat_i"], int(row["_h_i"]),
                                row["ix_min"], row["iy_min"], row["ix_max"], row["iy_max"])
                win_b = _window(b, row["_lon_j"], row["_lat_j"], int(row["_h_j"]),
                                row["ix_min"], row["iy_min"], row["ix_max"], row["iy_max"])
                hh = min(win_a.shape[0], win_b.shape[0])
                ww = min(win_a.shape[1], win_b.shape[1])
                if hh == 0 or ww == 0:
                    continue
                win_a, win_b = win_a[:hh, :ww], win_b[:hh, :ww]
                nb = min(win_a.shape[2], win_b.shape[2])
                for band in range(nb):
                    va = win_a[:, :, band].ravel()
                    vb = win_b[:, :, band].ravel()
                    rows.append(
                        (row["id_i"], row["id_j"], band,
                         float(va.mean()), float(va.std()),
                         float(vb.mean()), float(vb.std()), int(va.size))
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in PAIR_STATS_SCHEMA.fields])

    return joined.mapInPandas(run, PAIR_STATS_SCHEMA)


def _window(img: np.ndarray, lon: float, lat: float, h_px: int,
            ix0: float, iy0: float, ix1: float, iy1: float) -> np.ndarray:
    """Pixel window of the world rect [ix0,ix1]×[iy0,iy1] inside an image
    anchored at (lon, lat), north-up (global_match.py:127-142 analogue)."""
    c0 = int(round((ix0 - lon) / RES_DEG))
    c1 = int(round((ix1 - lon) / RES_DEG))
    y_max = lat + h_px * RES_DEG
    r0 = int(round((y_max - iy1) / RES_DEG))
    r1 = int(round((y_max - iy0) / RES_DEG))
    h, w = img.shape[:2]
    return img[max(0, r0): min(h, r1), max(0, c0): min(w, c1)]


def solve_gains(
    pair_stats: pd.DataFrame,
    whole_stats: pd.DataFrame,
    mean_factor: float = 1.0,
    std_factor: float = 1.0,
) -> pd.DataFrame:
    """Driver-side weighted linear least squares per band
    (global_match.py:345-452 semantics):

      pair rows:  (a_i·M_i + b_i) − (a_j·M_j + b_j) = 0   weight s·mean_factor
                  a_i·V_i − a_j·V_j = 0                    weight s·std_factor
      anchors:    a_i = 1, b_i = 0                          weight
                  total_overlap_px / (2·n_images)

    where M/V are the pair-overlap mean/std and s the overlap pixel count.
    The system is linear in (a_i, b_i) — np.linalg.lstsq replaces the
    reference's scipy least_squares (same minimizer for a linear model).

    Returns (image_id, band, a, b).
    """
    images = sorted(whole_stats["image_id"].unique())
    idx = {im: i for i, im in enumerate(images)}
    n = len(images)
    out_rows = []
    for band in sorted(whole_stats["band"].unique()):
        ps = pair_stats[pair_stats["band"] == band]
        rows, targets, weights = [], [], []
        total_px = float(ps["size"].sum())
        for _, r in ps.iterrows():
            i, j = idx[r["id_i"]], idx[r["id_j"]]
            w_m = float(r["size"]) * mean_factor
            w_s = float(r["size"]) * std_factor
            row = np.zeros(2 * n)
            row[2 * i] = r["mean_i"]
            row[2 * i + 1] = 1.0
            row[2 * j] = -r["mean_j"]
            row[2 * j + 1] = -1.0
            rows.append(row)
            targets.append(0.0)
            weights.append(w_m)
            row = np.zeros(2 * n)
            row[2 * i] = r["std_i"]
            row[2 * j] = -r["std_j"]
            rows.append(row)
            targets.append(0.0)
            weights.append(w_s)
        pjj = total_px / (2.0 * n) if n else 1.0
        for im, i in idx.items():
            row = np.zeros(2 * n)
            row[2 * i] = 1.0
            rows.append(row)
            targets.append(1.0)
            weights.append(pjj)
            row = np.zeros(2 * n)
            row[2 * i + 1] = 1.0
            rows.append(row)
            targets.append(0.0)
            weights.append(pjj)
        A = np.asarray(rows)
        t = np.asarray(targets)
        w = np.sqrt(np.asarray(weights))
        sol, *_ = np.linalg.lstsq(A * w[:, None], t * w, rcond=None)
        for im, i in idx.items():
            out_rows.append((im, int(band), float(sol[2 * i]), float(sol[2 * i + 1])))
    return pd.DataFrame(out_rows, columns=["image_id", "band", "a", "b"])


def global_match(images: DataFrame, z: int = 10,
                 mean_factor: float = 1.0, std_factor: float = 1.0) -> tuple[DataFrame, pd.DataFrame]:
    """Full pipeline: returns (adjusted_images_df, params_pdf)."""
    from gis_scripts_spark.raster import ops

    spark = images.sparkSession
    pair_stats = overlap_pair_stats(images, z=z).toPandas()
    whole = ops.band_stats(images).toPandas()
    params = solve_gains(pair_stats, whole, mean_factor, std_factor)
    params_df = spark.createDataFrame(params) if len(params) else spark.createDataFrame(
        pd.DataFrame({"image_id": pd.Series(dtype=str), "band": pd.Series(dtype=np.int32),
                      "a": pd.Series(dtype=float), "b": pd.Series(dtype=float)})
    )
    return ops.apply_linear(images, params_df), params
