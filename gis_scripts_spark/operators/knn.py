"""Grid-partitioned kNN join with cell-ring expansion (SURVEY.md §2.3 J8).

The reference's nearest analogues are the 30-px IDW window
(``create_dem_tiles_from_array.py:235-240``) and 4-neighbor bilinear
interpolation (``local_match.py:396-426``); the north rule requires true
kNN. Algorithm (classic distributed exact kNN):

  round r: each unresolved query probes all cells within Chebyshev ring r
  of its own cell (``cells.disk_arr``), equi-joins points on the probed
  cell, and computes a per-query top-k inside `applyInPandas`. A query is
  RESOLVED when it found >= k candidates AND its k-th distance is <= the
  guaranteed minimum distance to any point outside the probed disk
  (r * cell_height — the cell-border correctness bound, SURVEY.md §7.4).
  Unresolved queries re-run with doubled r; the loop terminates because the
  disk eventually covers the whole grid.

Distances are squared Euclidean in degrees (metric="euclid2") — used by the
driver oracle because both engines compute dx*dx+dy*dy bit-identically —
or haversine meters (metric="haversine").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from gis_scripts_spark.index import cells as cells_mod

EARTH_R = 6371000.0


def _haversine(qlon, qlat, plon, plat):
    la1, la2 = np.radians(qlat), np.radians(plat)
    dla = la2 - la1
    dlo = np.radians(plon - qlon)
    a = np.sin(dla / 2.0) ** 2 + np.cos(la1) * np.cos(la2) * np.sin(dlo / 2.0) ** 2
    return 2.0 * EARTH_R * np.arcsin(np.sqrt(a))


def _disk_cells_udf(r: int, wrap_x: bool = False):
    @F.pandas_udf(ArrayType(LongType()))
    def probe_cells(cell: pd.Series) -> pd.Series:
        arr = cell.to_numpy(np.int64)
        idx, nb = cells_mod.disk_arr(arr, r, wrap_x=wrap_x)
        out = [[] for _ in range(len(arr))]
        for i, c in zip(idx, nb):
            out[i].append(int(c))
        return pd.Series(out)

    return probe_cells


def knn_join(
    points_df: DataFrame,
    queries_df: DataFrame,
    k: int = 5,
    z: int = 6,
    point_id: str = "point_id",
    query_id: str = "query_id",
    lon: str = "lon",
    lat: str = "lat",
    metric: str = "euclid2",
    exclude_self: bool = False,
    max_rounds: int = 8,
) -> DataFrame:
    """Exact kNN: for each query row, its k nearest points.

    Returns (query_id, neighbor_id, dist, rank) with rank 1..k ordered by
    (dist, neighbor_id) — the deterministic tie-break.
    """
    spark = points_df.sparkSession
    cell_h = cells_mod.cell_size_deg(z)[1]  # the tighter axis bound

    pts = points_df.select(
        F.col(point_id).alias("_pid"),
        F.col(lon).cast("double").alias("_plon"),
        F.col(lat).cast("double").alias("_plat"),
    ).withColumn("_pcell", cells_mod.cell_col(F.col("_plon"), F.col("_plat"), z))

    qry = queries_df.select(
        F.col(query_id).alias("_qid"),
        F.col(lon).cast("double").alias("_qlon"),
        F.col(lat).cast("double").alias("_qlat"),
    ).withColumn("_qcell", cells_mod.cell_col(F.col("_qlon"), F.col("_qlat"), z))

    qid_type = qry.schema["_qid"].dataType
    pid_type = pts.schema["_pid"].dataType
    result_schema = StructType(
        [
            StructField("query_id", qid_type),
            StructField("neighbor_id", pid_type),
            StructField("dist", DoubleType()),
            StructField("rank", IntegerType()),
            StructField("_resolved", BooleanType()),
        ]
    )

    grid_n = 1 << z

    def make_topk(r: int):
        bound_deg = r * cell_h

        def topk(key, pdf: pd.DataFrame) -> pd.DataFrame:
            qlon = pdf["_qlon"].iloc[0]
            qlat = pdf["_qlat"].iloc[0]
            qid = pdf["_qid"].iloc[0]
            plon = pdf["_plon"].to_numpy(np.float64)
            plat = pdf["_plat"].to_numpy(np.float64)
            pid = pdf["_pid"].to_numpy()
            if exclude_self:
                keep = pid != qid
                plon, plat, pid = plon[keep], plat[keep], pid[keep]
            if metric == "haversine":
                d = _haversine(qlon, qlat, plon, plat)
                # min distance to outside the disk: either the lat route
                # (>= r*cell_h degrees of latitude) or the lon route
                # (>= r*cell_w degrees of longitude at the worst-case
                # latitude reachable inside the disk). Near poles the lon
                # bound collapses to 0 -> resolution falls back to full
                # grid coverage (still exact, just more rounds).
                bound_lat = 2.0 * EARTH_R * np.sin(np.radians(bound_deg) / 2.0)
                lat_reach = min(90.0, abs(qlat) + (r + 1) * cell_h)
                bound_lon = 2.0 * EARTH_R * np.arcsin(
                    min(1.0, np.cos(np.radians(lat_reach)) * np.sin(np.radians(2.0 * bound_deg) / 2.0))
                )
                bound = min(bound_lat, bound_lon)
            else:
                dx = plon - qlon
                dy = plat - qlat
                d = dx * dx + dy * dy
                bound = bound_deg * bound_deg
            if len(d) == 0:
                return pd.DataFrame(
                    {"query_id": [qid], "neighbor_id": [None], "dist": [np.nan],
                     "rank": [0], "_resolved": [False]}
                )
            order = np.lexsort((pid, d))[:k]
            kth = d[order[-1]]
            # r >= grid_n: the clamped disk covers the whole grid from ANY
            # position (corner queries included) — nothing more to find.
            resolved = bool(len(order) >= k and kth <= bound) or r >= grid_n
            return pd.DataFrame(
                {
                    "query_id": [qid] * len(order),
                    "neighbor_id": pid[order],
                    "dist": d[order],
                    "rank": np.arange(1, len(order) + 1, dtype=np.int32),
                    "_resolved": [resolved] * len(order),
                }
            )

        return topk

    resolved_parts: list[DataFrame] = []
    unresolved = qry
    r = 1
    wrap = metric == "haversine"  # antimeridian continuity on the sphere
    for _ in range(max_rounds):
        probes = unresolved.withColumn(
            "_probe", F.explode(_disk_cells_udf(r, wrap_x=wrap)(F.col("_qcell")))
        )
        cand = probes.join(pts, probes["_probe"] == pts["_pcell"], "inner")
        scored = cand.groupBy("_qid").applyInPandas(make_topk(r), result_schema)
        scored = scored.persist()
        done = scored.filter(F.col("_resolved") & F.col("neighbor_id").isNotNull()).drop("_resolved")
        resolved_parts.append(done)
        undone_ids = scored.filter(~F.col("_resolved")).select(
            F.col("query_id").alias("_qid")
        ).distinct()
        n_undone = undone_ids.count()
        if n_undone == 0:
            break
        unresolved = unresolved.join(F.broadcast(undone_ids), "_qid", "left_semi")
        r *= 2
        if r > grid_n:
            r = grid_n  # clamped disk covers the grid from any position
    out = resolved_parts[0]
    for part in resolved_parts[1:]:
        out = out.unionByName(part)
    return out
