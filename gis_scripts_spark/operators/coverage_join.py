"""Polygon∩rect coverage join (SURVEY.md §2.3 J3).

Reference: image footprint polygon ∩ AOI extent, percent coverage =
area(∩)/area(footprint) (``seagrass_lib.py:185-192``), used to filter the
acquisition manifest (AOI_COVERAGE > 0, ``1_Image_processing.py:34``).

Spark shape: footprints (polygons as WKB) are cell-exploded; AOI rects are
cell-exploded; candidates meet on the cell equi-join (report-once on the
intersection corner cell, like overlap_join); the exact Sutherland–Hodgman
clip + shoelace ratio runs in an Arrow-batched pandas UDF on candidates
only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType

from gis_scripts_spark.geom import core as geom
from gis_scripts_spark.geom import wkb as wkb_mod
from gis_scripts_spark.index import cells as cells_mod


def _cover_wkb_udf(z: int):
    @F.pandas_udf(ArrayType(LongType()))
    def cover(wkb_col: pd.Series) -> pd.Series:
        out = []
        for buf in wkb_col:
            polys = wkb_mod.from_wkb(bytes(buf))
            cc, _ = geom.cover_polygon(polys, z)
            out.append([int(v) for v in cc])
        return pd.Series(out)

    return cover


@F.pandas_udf(DoubleType())
def _coverage_udf(wkb_col: pd.Series, x0: pd.Series, y0: pd.Series, x1: pd.Series, y1: pd.Series) -> pd.Series:
    out = np.empty(len(wkb_col))
    cache: dict[bytes, list] = {}
    for i, buf in enumerate(wkb_col):
        key = bytes(buf)
        polys = cache.get(key)
        if polys is None:
            polys = cache[key] = wkb_mod.from_wkb(key)
        bb = (x0.iloc[i], y0.iloc[i], x1.iloc[i], y1.iloc[i])
        # multipolygon: sum part intersections / sum part areas
        inter = sum(geom.coverage_fraction(rings, bb) * geom.polygon_area(rings) for rings in polys)
        total = sum(geom.polygon_area(rings) for rings in polys)
        out[i] = inter / total if total > 0 else 0.0
    return pd.Series(out)


def coverage_join(
    footprints_df: DataFrame,
    rects_df: DataFrame,
    z: int = 6,
    fp_id: str = "image_id",
    wkb_col: str = "wkb",
    rect_id: str = "aoi_id",
    min_coverage: float = 0.0,
    broadcast_candidates: bool | str = "auto",
    max_broadcast_candidates: int = 2_000_000,
) -> DataFrame:
    """(fp_id, rect_id, coverage) for every footprint×AOI pair with
    coverage > min_coverage. rects_df: (rect_id, x_min, y_min, x_max,
    y_max).

    Shuffle hygiene (the minhash ids-only discipline): the cell explode and
    the candidate dedup carry (id, cell) / (id, rect, bbox) ONLY — polygon
    WKB never rides an Exchange. The WKB is re-joined ONCE per surviving
    candidate: when the candidate set is broadcast (rows are ~48 bytes of
    ids+bbox) the join is map-side on the footprint scan, so no Exchange in
    the whole plan contains wkb; otherwise the re-join degrades to ONE
    linear shuffle of each matched footprint's WKB.

    `broadcast_candidates="auto"` (default) is the safety valve the r3
    advice asked for: an unconditional F.broadcast hint bypasses
    autoBroadcastJoinThreshold and would OOM the driver on a huge
    candidate set. Auto persists the ids-only candidate frame and gates on
    its EXACT count (r4 advice fix — the old |footprints| x |rects| product
    bound both re-ran arbitrary upstream lineage for its "metadata-only"
    counts and tripped the expensive path on tiny true candidate sets).
    The count job runs the cover+dedup pipeline once, and the subsequent
    join reuses the persisted result, so auto costs one extra count of a
    CACHED frame — but it is still one more Spark job than an explicit
    setting. Pass True for known-small dims (zero extra jobs, the
    queries.py pattern) or False to force the shuffle path.

    The persisted candidate frame is deliberately NOT auto-unpersisted
    (r4 advice: a weakref.finalize on the returned frame unpersisted the
    cache as soon as a caller dropped the parent after deriving a child,
    silently recomputing the dedup shuffle). MEMORY_AND_DISK blocks are
    evicted LRU by Spark when space is needed; callers wanting immediate
    release can unpersist via the returned frame's `_coverage_join_cand`
    attribute."""
    cov = _cover_wkb_udf(z)
    fp_src = footprints_df.select(
        F.col(fp_id).alias("_fid"), F.col(wkb_col).alias("_wkb")
    )
    # ids-only cell explode — the WKB stays in its scan partition
    fp = fp_src.select("_fid", F.explode(cov(F.col("_wkb"))).alias("cell"))

    def rect_cells(pdf_iter):
        for pdf in pdf_iter:
            ids, cs, bbs = [], [], []
            for _, r in pdf.iterrows():
                cells = cells_mod.cover_bbox(r["x_min"], r["y_min"], r["x_max"], r["y_max"], z)
                ids.extend([r[rect_id]] * len(cells))
                cs.append(cells)
                bbs.extend([(r["x_min"], r["y_min"], r["x_max"], r["y_max"])] * len(cells))
            bb = np.array(bbs) if bbs else np.empty((0, 4))
            yield pd.DataFrame(
                {
                    "_rid": ids,
                    "cell": np.concatenate(cs) if cs else np.empty(0, np.int64),
                    "x_min": bb[:, 0] if len(bb) else [],
                    "y_min": bb[:, 1] if len(bb) else [],
                    "x_max": bb[:, 2] if len(bb) else [],
                    "y_max": bb[:, 3] if len(bb) else [],
                }
            )

    from pyspark.sql.types import StringType, StructField, StructType

    rid_type = rects_df.schema[rect_id].dataType
    rect_schema = StructType(
        [
            StructField("_rid", rid_type, False),
            StructField("cell", LongType(), False),
            StructField("x_min", DoubleType(), False),
            StructField("y_min", DoubleType(), False),
            StructField("x_max", DoubleType(), False),
            StructField("y_max", DoubleType(), False),
        ]
    )
    rects = rects_df.select(
        rect_id, F.col("x_min").cast("double"), F.col("y_min").cast("double"),
        F.col("x_max").cast("double"), F.col("y_max").cast("double"),
    ).mapInPandas(rect_cells, rect_schema)

    cand = (
        fp.join(F.broadcast(rects), "cell")
        .select("_fid", "_rid", "x_min", "y_min", "x_max", "y_max")
        .dropDuplicates(["_fid", "_rid"])  # ids+bbox only in this Exchange
    )
    cand_cached = None
    if broadcast_candidates == "auto":
        # exact gate: persist the ids-only candidate frame and count it —
        # the count is the real quantity the broadcast decision needs, and
        # the persisted result feeds the join so the pipeline runs once
        cand = cand_cached = cand.persist()
        do_broadcast = cand.count() <= max_broadcast_candidates
    else:
        do_broadcast = bool(broadcast_candidates)
    cand_side = F.broadcast(cand) if do_broadcast else cand
    joined = fp_src.join(cand_side, "_fid")  # WKB re-joined once per candidate
    out = joined.withColumn(
        "coverage",
        _coverage_udf(F.col("_wkb"), F.col("x_min"), F.col("y_min"), F.col("x_max"), F.col("y_max")),
    )
    res = (
        out.filter(F.col("coverage") > min_coverage)
        .select(F.col("_fid").alias(fp_id), F.col("_rid").alias(rect_id), "coverage")
    )
    # explicit release handle; no weakref auto-unpersist (see docstring)
    res._coverage_join_cand = cand_cached
    return res
