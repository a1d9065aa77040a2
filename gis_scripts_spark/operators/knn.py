"""Grid-partitioned kNN join with cell-ring expansion (SURVEY.md §2.3 J8).

The reference's nearest analogues are the 30-px IDW window
(``create_dem_tiles_from_array.py:235-240``) and 4-neighbor bilinear
interpolation (``local_match.py:396-426``); the north rule requires true
kNN. Algorithm (classic distributed exact kNN, cell-cogrouped):

  round r: the DISTINCT cells of unresolved queries are exploded to their
  Chebyshev disk(r) (``cells.disk_arr``; x wraps at the antimeridian for
  the spherical metric), candidate points arrive via a shuffle-hash
  equi-join on the probed cell, and each query cell is cogrouped with its
  candidates: one vectorized numpy top-k per cell (not per query). A query
  RESOLVES when it has >= k candidates AND its k-th distance is <= the
  provable minimum distance to any point outside the probed disk (the
  cell-border bound; for haversine the longitude route accounts for
  high-latitude shrinkage and collapses near the poles, falling back to
  full-grid coverage — exact, just more rounds). Unresolved queries re-run
  with doubled r; termination: the clamped disk eventually covers the grid.

Scale notes: probe explode is per distinct CELL (not per query), shuffle
payload is (id, lon, lat, cell) only, and AQE skew-join splits hot cells.
Distances: squared Euclidean degrees ("euclid2", bit-reproducible vs SQL
oracles) or haversine meters ("haversine").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
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
    max_rounds: int = 10,
    initial_r: int | None = None,
    n_points_hint: int | None = None,
) -> DataFrame:
    """Exact kNN: for each query row, its k nearest points.

    Returns (query_id, neighbor_id, dist, rank) with rank 1..k ordered by
    (dist, neighbor_id) — the deterministic tie-break.

    `initial_r`: first probe radius. Default: density-sized so ~90% of
    queries resolve in round one (expected k-th-neighbor radius × 1.5 —
    each extra round costs two shuffles, so starting too small dominates
    wall-clock; starting too large only pads the candidate lists).
    """
    spark = points_df.sparkSession
    cell_h = cells_mod.cell_size_deg(z)[1]
    grid_n = 1 << z
    wrap = metric == "haversine"

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
    probe_schema = StructType(
        [StructField("_qcell", LongType(), False), StructField("_probe", LongType(), False)]
    )

    def make_probes(r: int):
        def gen(batches):
            for pdf in batches:
                arr = pdf["_qcell"].to_numpy(np.int64)
                idx, nb = cells_mod.disk_arr(arr, r, wrap_x=wrap)
                yield pd.DataFrame({"_qcell": arr[idx], "_probe": nb})

        return gen

    def make_topk(r: int):
        bound_deg = r * cell_h

        def topk(queries: pd.DataFrame, cand: pd.DataFrame) -> pd.DataFrame:
            nq = len(queries)
            if nq == 0:
                return pd.DataFrame({f.name: [] for f in result_schema.fields})
            covers_grid = r >= grid_n
            # candidates sorted by id once: stable argsort on distance then
            # yields the (dist, neighbor_id) tie-break for free
            cand = cand.sort_values("_pid", kind="mergesort")
            pid = cand["_pid"].to_numpy()
            plon = cand["_plon"].to_numpy(np.float64)
            plat = cand["_plat"].to_numpy(np.float64)
            out_q, out_n, out_d, out_r, out_res = [], [], [], [], []
            for qid, qlon, qlat in zip(
                queries["_qid"].to_numpy(),
                queries["_qlon"].to_numpy(np.float64),
                queries["_qlat"].to_numpy(np.float64),
            ):
                if metric == "haversine":
                    d = _haversine(qlon, qlat, plon, plat)
                    bound_lat = 2.0 * EARTH_R * np.sin(np.radians(bound_deg) / 2.0)
                    lat_reach = min(90.0, abs(qlat) + (r + 1) * cell_h)
                    bound_lon = 2.0 * EARTH_R * np.arcsin(
                        min(1.0, np.cos(np.radians(lat_reach)) * np.sin(np.radians(bound_deg)))
                    )
                    bound = min(bound_lat, bound_lon)
                else:
                    dx = plon - qlon
                    dy = plat - qlat
                    d = dx * dx + dy * dy
                    bound = bound_deg * bound_deg
                if exclude_self:
                    d = np.where(pid == qid, np.inf, d)
                order = np.argsort(d, kind="stable")[:k]
                order = order[np.isfinite(d[order])]
                if len(order) == 0:
                    if not covers_grid:
                        out_q.append(qid)
                        out_n.append(None)
                        out_d.append(np.nan)
                        out_r.append(0)
                        out_res.append(False)
                    continue
                kth = d[order[-1]]
                resolved = bool(len(order) >= k and kth <= bound) or covers_grid
                out_q.extend([qid] * len(order))
                out_n.extend(pid[order])
                out_d.extend(d[order])
                out_r.extend(range(1, len(order) + 1))
                out_res.extend([resolved] * len(order))
            return pd.DataFrame(
                {
                    "query_id": out_q,
                    "neighbor_id": out_n,
                    "dist": np.asarray(out_d, np.float64),
                    "rank": np.asarray(out_r, np.int32),
                    "_resolved": out_res,
                }
            )

        return topk

    pts = pts.persist()  # re-joined every round
    if initial_r is None:
        n_pts = n_points_hint if n_points_hint is not None else pts.count()
        density = max(n_pts, 1) / (360.0 * 180.0)  # rows per deg^2 (global)
        exp_kth_deg = float(np.sqrt(k / (np.pi * density)))
        initial_r = int(np.clip(np.ceil(1.5 * exp_kth_deg / cell_h), 1, grid_n))

    resolved_parts: list[DataFrame] = []
    unresolved = qry
    r = initial_r
    for _ in range(max_rounds):
        qcells = unresolved.select("_qcell").distinct()
        probes = qcells.mapInPandas(make_probes(r), probe_schema)
        cand = probes.join(
            pts.hint("shuffle_hash"), probes["_probe"] == pts["_pcell"], "inner"
        ).select("_qcell", "_pid", "_plon", "_plat")
        scored = (
            unresolved.groupBy("_qcell")
            .cogroup(cand.groupBy("_qcell"))
            .applyInPandas(make_topk(r), result_schema)
        ).persist()
        done = scored.filter(F.col("_resolved") & F.col("neighbor_id").isNotNull()).drop("_resolved")
        resolved_parts.append(done)
        undone_ids = (
            scored.filter(~F.col("_resolved")).select(F.col("query_id").alias("_qid")).distinct()
        )
        if undone_ids.isEmpty():
            break
        unresolved = unresolved.join(F.broadcast(undone_ids), "_qid", "left_semi")
        r *= 2
        if r > grid_n:
            r = grid_n  # clamped disk covers the grid from any position

    out = resolved_parts[0]
    for part in resolved_parts[1:]:
        out = out.unionByName(part)
    return out
