"""Local (block-grid) histogram matching — reference flagship #2
(``local_match.py:722-986``), re-expressed Spark-first (SURVEY.md §3.2):

  stage A: per-image per-band per-tile partial sums from decoded pixels
           (np.add.at scatter inside the UDF — the reference's
           ``local_match.py:344-349`` — emitting (image_id, band, cell,
           sum, cnt) rows, NOT exploded pixels)
  stage B: two-level aggregation to the reference map: per-image tile
           means with a validity threshold (``:352``), then UNWEIGHTED
           mean-of-means across images (one vote per image, ``:284-291``)
  stage C: broadcast the (small) ref map back; per image: build the local
           map, NaN-aware weighted bilinear interpolation of ref and local
           maps at every pixel's fractional tile coords
           (``local_match.py:396-426``), gamma correction
           gamma = log(M_ref/255)/log(M_in/255), P = alpha * P^gamma
           (``:544-573`` normalized to the uint8 domain), re-encode.

Footprint model shared with match.py: image at (lon, lat) spans
[lon, lon+w*RES_DEG] x [lat, lat+h*RES_DEG], north-up.
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

from gis_scripts_spark.index import cells as cells_mod
from gis_scripts_spark.raster import codec
from gis_scripts_spark.raster.match import RES_DEG

TILE_STATS_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("band", IntegerType(), False),
        StructField("cell", LongType(), False),
        StructField("sum", DoubleType(), False),
        StructField("cnt", LongType(), False),
    ]
)


def _pixel_cells(lon: float, lat: float, h: int, w: int, z: int):
    """Grid cell of every pixel center (h, w) -> int64 (vectorized)."""
    xs = lon + (np.arange(w) + 0.5) * RES_DEG
    ys = lat + h * RES_DEG - (np.arange(h) + 0.5) * RES_DEG
    gx, _ = cells_mod.grid_xy(xs, np.zeros_like(xs), z)
    _, gy = cells_mod.grid_xy(np.zeros_like(ys), ys, z)
    return cells_mod.pack(z, gx[None, :].repeat(h, 0), gy[:, None].repeat(w, 1))


def tile_stats(images: DataFrame, z: int = 12) -> DataFrame:
    """Stage A: (image_id, band, cell, sum, cnt) partial aggregates —
    Spark's map-side combine done inside the UDF (A5 semantics)."""

    def run(batches):
        for pdf in batches:
            out_img, out_band, out_cell, out_sum, out_cnt = [], [], [], [], []
            for _, row in pdf.iterrows():
                img = codec.decode(bytes(row["bytes"]), row["fmt"]).astype(np.float64)
                h, w, nb = img.shape
                pc = _pixel_cells(row["lon"], row["lat"], h, w, z).ravel()
                uniq, inv = np.unique(pc, return_inverse=True)
                for b in range(nb):
                    sums = np.bincount(inv, weights=img[:, :, b].ravel(), minlength=len(uniq))
                    cnts = np.bincount(inv, minlength=len(uniq))
                    out_img.extend([row["image_id"]] * len(uniq))
                    out_band.extend([b] * len(uniq))
                    out_cell.append(uniq)
                    out_sum.append(sums)
                    out_cnt.append(cnts)
            yield pd.DataFrame(
                {
                    "image_id": out_img,
                    "band": np.asarray(out_band, np.int32),
                    "cell": np.concatenate(out_cell) if out_cell else np.empty(0, np.int64),
                    "sum": np.concatenate(out_sum) if out_sum else np.empty(0),
                    "cnt": np.concatenate(out_cnt).astype(np.int64) if out_cnt else np.empty(0, np.int64),
                }
            )

    return images.select("image_id", "bytes", "fmt", "lon", "lat").mapInPandas(
        run, TILE_STATS_SCHEMA
    )


def reference_map(stats: DataFrame, min_cnt: int = 1) -> DataFrame:
    """Stage B: per-tile unweighted mean-of-means across images (A6);
    tiles with per-image cnt < min_cnt don't get that image's vote
    (validity threshold, local_match.py:352)."""
    lvl1 = stats.filter(F.col("cnt") >= min_cnt).withColumn(
        "img_mean", F.col("sum") / F.col("cnt")
    )
    return lvl1.groupBy("band", "cell").agg(
        F.avg("img_mean").alias("ref_mean"),
        F.count(F.lit(1)).alias("n_images"),
    )


def _bilinear(map_grid: np.ndarray, fy: np.ndarray, fx: np.ndarray) -> np.ndarray:
    """NaN-aware weighted bilinear interpolation at fractional coords
    (port of the reference semantics, local_match.py:396-426: weights of
    NaN corners are dropped and the rest renormalized)."""
    h, w = map_grid.shape
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)
    wx = np.clip(fx - x0, 0.0, 1.0)
    vals = np.stack(
        [map_grid[y0, x0], map_grid[y0, x1], map_grid[y1, x0], map_grid[y1, x1]]
    )
    wts = np.stack([(1 - wy) * (1 - wx), (1 - wy) * wx, wy * (1 - wx), wy * wx])
    ok = ~np.isnan(vals)
    wts = np.where(ok, wts, 0.0)
    tot = wts.sum(axis=0)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.where(tot > 0, np.nansum(vals * wts, axis=0) / tot, np.nan)
    return out


def local_match(
    images: DataFrame,
    z: int = 12,
    alpha: float = 1.0,
    min_cnt: int = 1,
) -> DataFrame:
    """Full pipeline; returns the adjusted image table (same schema).

    The ref map is collected and broadcast — it is M*N*bands rows
    (thousands), the same driver-scale artifact as the reference's
    ``RefDistMap.tif`` (local_match.py:803-809)."""
    spark = images.sparkSession
    stats = tile_stats(images, z=z)
    ref = reference_map(stats, min_cnt=min_cnt).toPandas()

    # dense per-band grids over the covered cell range for O(1) lookup
    grids: dict[int, tuple] = {}
    for band, sub in ref.groupby("band"):
        zz, gx, gy = cells_mod.unpack(sub["cell"].to_numpy(np.int64))
        gx0, gx1 = int(gx.min()), int(gx.max())
        gy0, gy1 = int(gy.min()), int(gy.max())
        grid = np.full((gy1 - gy0 + 1, gx1 - gx0 + 1), np.nan)
        grid[gy - gy0, gx - gx0] = sub["ref_mean"].to_numpy()
        grids[int(band)] = (grid, gx0, gy0)
    b_grids = spark.sparkContext.broadcast(grids)

    schema = images.schema
    n_grid = 1 << z

    def run(batches):
        grids_l = b_grids.value
        for pdf in batches:
            out_bytes = []
            for _, row in pdf.iterrows():
                img = codec.decode(bytes(row["bytes"]), row["fmt"]).astype(np.float64)
                h, w, nb = img.shape
                # fractional GLOBAL tile coords of each pixel center
                xs = row["lon"] + (np.arange(w) + 0.5) * RES_DEG
                ys = row["lat"] + h * RES_DEG - (np.arange(h) + 0.5) * RES_DEG
                fgx = (xs + 180.0) / 360.0 * n_grid - 0.5
                fgy = (90.0 - ys) / 180.0 * n_grid - 0.5
                fx = np.broadcast_to(fgx[None, :], (h, w))
                fy = np.broadcast_to(fgy[:, None], (h, w))
                out = img.copy()
                for b in range(nb):
                    if b not in grids_l:
                        continue
                    grid, gx0, gy0 = grids_l[b]
                    m_ref = _bilinear(grid, fy - gy0, fx - gx0)
                    # local map: this image's own tile means on the fly
                    pc = _pixel_cells(row["lon"], row["lat"], h, w, z).ravel()
                    uniq, inv = np.unique(pc, return_inverse=True)
                    sums = np.bincount(inv, weights=img[:, :, b].ravel())
                    cnts = np.bincount(inv)
                    zz2, lgx, lgy = cells_mod.unpack(uniq)
                    lgx0, lgy0 = int(lgx.min()), int(lgy.min())
                    lgrid = np.full((int(lgy.max()) - lgy0 + 1, int(lgx.max()) - lgx0 + 1), np.nan)
                    lgrid[lgy - lgy0, lgx - lgx0] = sums / np.maximum(cnts, 1)
                    m_in = _bilinear(lgrid, fy - lgy0, fx - lgx0)
                    # gamma in normalized domain; guard zeros/NaNs
                    p = np.clip(img[:, :, b] / 255.0, 1e-6, 1.0)
                    mr = np.clip(m_ref / 255.0, 1e-6, 1.0)
                    mi = np.clip(m_in / 255.0, 1e-6, 1.0)
                    with np.errstate(invalid="ignore", divide="ignore"):
                        gamma = np.log(mr) / np.log(mi)
                    gamma = np.where(np.isfinite(gamma), gamma, 1.0)
                    adj = alpha * np.power(p, gamma) * 255.0
                    out[:, :, b] = np.where(np.isnan(m_ref) | np.isnan(m_in), img[:, :, b], adj)
                out_bytes.append(
                    bytearray(codec.encode(np.clip(np.rint(out), 0, 255).astype(np.uint8), row["fmt"]))
                )
            pdf = pdf.copy()
            pdf["bytes"] = out_bytes
            yield pdf[[f.name for f in schema.fields]]

    return images.mapInPandas(run, schema)
