"""Hot-cell skew: measured salting + AQE A/B (north rule: "salting for
hot-cell skew", "AQE-tuned shuffle partitions").

The engine has carried `pip_join(salt=, hot_cells=)` + `measure_hot_cells`
since round 2 with an equivalence pytest (tests/test_salting.py) — but the
actual CLAIM behind salting ("one monster cell turns the cell-keyed shuffle
join into a single-straggler stage; salting restores balance") was never
measured at material size. This tool measures it, on the realistic shape:

  - a parcels layer too big to broadcast (120k small rects -> the pip_join
    auto gate falls through to the shuffle-hash path, the same path a
    100M-row cadastral/building layer takes at 10^12 scale),
  - 20M points with HALF of them inside ONE z=7 cell (the hot-city case;
    the cell sits on parcel boundaries so every hot pair pays the exact
    ray-cast, not the full-cell fast path),

and times five plans at local-cluster[4,8] (plus [1,8] controls):

  noaqe_nosalt  : AQE skew-join OFF, no salt -> the naive cell-keyed join;
                  wall time ~= the one hot reduce task (10M-row partition).
  aqe_nosalt    : AQE skew split ON (64m/16m tuned) -> Spark's runtime
                  fix: the oversized partition is split into
                  advisory-size chunks, the parcel side duplicated.
  aqe_salt32    : explicit salt=32 over the measured hot cells
                  (measure_hot_cells) -> cover rows of hot cells are
                  replicated 32x and hot points spread by xxhash — balance
                  is decided BEFORE the shuffle. 32 buckets over 64 reduce
                  partitions is a balls-in-bins lottery (measured p75 77 s):
                  salt must sit well ABOVE the partition count.
  aqe_salt128 / noaqe_salt128 : the grain rule applied; noaqe_salt128 is
                  the best plan and sits at the machine's work-bound floor
                  (sum of task work / cores).

A 2M-point capture (cpu_skew_below_byte_threshold_2M in the record) pins
the regime AQE cannot see: the hot partition is ~40 MB — under the skew
byte threshold — but a 64 s CPU straggler (pandas-UDF ray-cast). Salting
keys on measured ROW COUNTS and fixes it (5.8x); AQE's byte-based
detection does not fire at all.

Writes BENCH/skew_salting.json; the narrative lives in BENCH/BASELINE.md
(hand-curated, section "Hot-cell skew").

Run: python tools/bench_skew.py [--points 20000000] [--polys 120000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# region the parcel layer covers (parcels never straddle the antimeridian)
X0, X1, Y0, Y1 = -170.0, 140.0, -55.0, 40.0
Z = 7  # join grid zoom: 2.8125 x 1.40625 deg cells


def _hot_cell_geometry():
    """The hot z=7 cell (a 'city'): bounds + two boundary parcels.

    Chosen so the city cell is PARTIAL for its parcels (tiny rects never
    contain a z=7 cell), hence every hot joined row runs the exact
    ray-cast — the worst, and realistic, skew shape."""
    from gis_scripts_spark.index import cells

    seed_lon, seed_lat = 12.35, 8.5
    c = int(cells.cell(np.array([seed_lon]), np.array([seed_lat]), Z)[0])
    n = 1 << Z
    gx = (c >> 29) & ((1 << 29) - 1)
    gy = c & ((1 << 29) - 1)
    w, h = 360.0 / n, 180.0 / n
    cx0, cy1 = -180.0 + gx * w, 90.0 - gy * h  # west edge, north edge
    ctr_lon, ctr_lat = cx0 + w / 2, cy1 - h / 2
    return c, ctr_lon, ctr_lat, w, h


HOT_CELL, HOT_LON, HOT_LAT, CELL_W, CELL_H = _hot_cell_geometry()


def parcels_df(spark, n_polys: int):
    """Deterministic small-rect parcel layer (0.02 deg squares, integer
    mixing — partition-count independent) + two larger rects overlapping
    the hot city so hot points actually match polygons. WKB is built in
    one Arrow pass; 120k rows x ~93 B WKB trips pip_join's auto broadcast
    gate into the shuffle-hash path, as a real 100M-row layer would."""
    from gis_scripts_spark.geom import wkb as wkb_mod

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            # integer mixing -> uniform deterministic placement
            mx = (ids * 2654435761) % 1_000_003
            my = (ids * 40503) % 999_983
            x = X0 + (X1 - X0 - 0.02) * (mx / 1_000_003.0)
            y = Y0 + (Y1 - Y0 - 0.02) * (my / 999_983.0)
            out_id, out_wkb = [], []
            for i, xx, yy in zip(ids.tolist(), x.tolist(), y.tolist()):
                out_id.append(f"p{i:07d}")
                out_wkb.append(bytearray(wkb_mod.bbox_to_wkb(xx, yy, xx + 0.02, yy + 0.02)))
            yield pd.DataFrame({"poly_id": out_id, "wkb": out_wkb})

    base = spark.range(0, n_polys, 1, 32).mapInPandas(
        gen, "poly_id string, wkb binary"
    )
    # eight city-scale rects overlapping the hot jitter disc (+-0.3*cell):
    # dense cities have MORE parcels — that multiplicity is exactly what
    # makes the cell hot on the pair side (hot pairs = hot_points x 8)
    hot_rows = []
    for j in range(8):
        dx = ((j * 2654435761) % 41 - 20) / 20.0 * 0.15 * CELL_W
        dy = ((j * 97643) % 41 - 20) / 20.0 * 0.15 * CELL_H
        hot_rows.append((f"city_{j}", bytearray(wkb_mod.bbox_to_wkb(
            HOT_LON + dx - 0.18 * CELL_W, HOT_LAT + dy - 0.18 * CELL_H,
            HOT_LON + dx + 0.18 * CELL_W, HOT_LAT + dy + 0.18 * CELL_H))))
    hot = spark.createDataFrame(pd.DataFrame(hot_rows, columns=["poly_id", "wkb"]))
    return base.unionByName(hot)


def skew_points(spark, n: int):
    """20M-point table, HALF inside the one hot cell (jitter +-0.3 cell
    around its center), half uniform over the region. Pure Column math."""
    df = spark.range(0, n, 1, 64)
    k = F.col("id")
    hot_lon = F.lit(HOT_LON) + ((k * F.lit(2654435761)) % F.lit(6001) - F.lit(3000)).cast("double") / F.lit(3000.0) * F.lit(0.3 * CELL_W)
    hot_lat = F.lit(HOT_LAT) + ((k * F.lit(97643)) % F.lit(6001) - F.lit(3000)).cast("double") / F.lit(3000.0) * F.lit(0.3 * CELL_H)
    uni_lon = F.lit(X0) + ((k * F.lit(40503)) % F.lit(310_000)).cast("double") / F.lit(1000.0)
    uni_lat = F.lit(Y0) + ((k * F.lit(65521)) % F.lit(95_000)).cast("double") / F.lit(1000.0)
    is_hot = (k % F.lit(2)) == F.lit(0)
    return df.select(
        F.col("id").alias("point_id"),
        F.when(is_hot, hot_lon).otherwise(uni_lon).alias("lon"),
        F.when(is_hot, hot_lat).otherwise(uni_lat).alias("lat"),
    )


def job_skew(spark, n: int, salt: int | None, skewjoin: bool) -> dict:
    from gis_scripts_spark.operators import pip_join

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skewjoin).lower())
    # Pin the AT-SCALE plan shape: a production parcel/building layer is
    # 10^8 rows (~10+ GB of WKB) — far beyond any broadcast threshold — so
    # the cell join SHUFFLES both sides. At sandbox size the same layer is
    # ~18 MB and Catalyst quietly broadcasts it (session threshold 64m),
    # which makes skew unmeasurable: the hot points never converge into one
    # reduce task (the first capture of this record measured exactly that —
    # three flat variants over a BroadcastHashJoin). Disabling auto-broadcast
    # here reproduces the plan a too-big-to-broadcast layer takes; the plan
    # is asserted below, not assumed.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    if skewjoin:
        # "AQE-tuned": the default 256 MB skewedPartitionThreshold is sized
        # for TB-scale shuffles; at this input the hot partition is
        # ~hundreds of MB, so tune the trigger down (the knob a real
        # deployment sets per shuffle volume)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64m")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
    try:
        polys = parcels_df(spark, JOB_POLYS)
        pts = skew_points(spark, n)
        hot_cells = None
        t_detect = 0.0
        if salt:
            # measured detection, timed separately (it is one groupBy job
            # over the point table — the operational cost of choosing salt)
            t0 = time.perf_counter()
            hot_cells = pip_join.measure_hot_cells(pts, z=Z, skew_factor=16.0)
            t_detect = time.perf_counter() - t0
            assert HOT_CELL in set(hot_cells), (HOT_CELL, hot_cells)
        joined = pip_join.pip_join(
            pts, polys, z=Z, broadcast_cover=False,
            salt=salt, hot_cells=hot_cells,
        )
        prior_stages = _completed_stage_ids(spark)
        t0 = time.perf_counter()
        agg = joined.agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.pmod(F.col("point_id"), F.lit(997))).alias("chk"),
            F.countDistinct("poly_id").alias("n_polys"),
        )
        row = agg.collect()[0]
        t_join = time.perf_counter() - t0
        # plan gate: the cell join must be SHUFFLED (the at-scale shape this
        # record claims to measure), never silently broadcast
        final_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin [cell" not in final_plan, final_plan[:2000]
        assert ("ShuffledHashJoin [cell" in final_plan
                or "SortMergeJoin [cell" in final_plan), final_plan[:2000]
        return {
            "seconds": round(t_join, 2),
            "detect_seconds": round(t_detect, 2),
            "n_pairs": int(row["n_pairs"]),
            "chk": int(row["chk"]),
            "n_polys_matched": int(row["n_polys"]),
            "task_skew": _join_stage_task_skew(spark, prior_stages),
        }
    finally:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256m")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")


def _rest_get(spark, path):
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(base + "/api/v1" + path, timeout=10) as r:
        return json.loads(r.read())


def _completed_stage_ids(spark) -> set:
    try:
        app_id = spark.sparkContext.applicationId
        stages = _rest_get(spark, f"/applications/{app_id}/stages?status=complete")
        return {s["stageId"] for s in stages}
    except Exception:
        return set()


def _join_stage_task_skew(spark, prior_stages: set) -> dict | None:
    """Per-task duration quantiles of the join-reduce stage (the stage with
    the largest shuffle read AMONG STAGES OF THIS TIMED RUN — warm-run stages
    are excluded via prior_stages), via the UI REST API. The direct evidence
    of a straggler: max >> p50 in the naive plan, max ~ p50 once AQE splits
    or salting pre-balances. Returns None when the UI is off."""
    try:
        app_id = spark.sparkContext.applicationId
        stages = _rest_get(spark, f"/applications/{app_id}/stages?status=complete")
        stages = [s for s in stages if s["stageId"] not in prior_stages]
        if not stages:
            return None
        stage = max(stages, key=lambda s: s.get("shuffleReadBytes", 0))
        if stage.get("shuffleReadBytes", 0) <= 0:
            return None
        sid, att = stage["stageId"], stage["attemptId"]
        q = _rest_get(
            spark,
            f"/applications/{app_id}/stages/{sid}/{att}/taskSummary"
            f"?quantiles=0.5,0.75,1.0",
        )
        dur = q.get("duration") or q.get("executorRunTime")
        return {
            "stage": sid,
            "n_tasks": stage.get("numCompleteTasks"),
            "shuffle_read_mb": round(stage["shuffleReadBytes"] / 1e6, 1),
            "task_sec_p50": round(dur[0] / 1e3, 2),
            "task_sec_p75": round(dur[1] / 1e3, 2),
            "task_sec_max": round(dur[2] / 1e3, 2),
        }
    except Exception as exc:  # evidence is best-effort; never fail the run
        return {"error": str(exc)[:200]}


JOB_POLYS = 120_000


def run_variant(cores: int, n: int, salt, skewjoin: bool, runs: int, warm: bool = True) -> dict:
    """One pinned local-cluster session per variant (bench_scaling.run_at
    discipline: affinity-pinned tree, warm + min-of-N)."""
    from bench_scaling import _set_tree_affinity

    import pyspark

    from gis_scripts_spark.session import get_spark, stop_spark

    stop_spark()
    all_cpus = sorted(os.sched_getaffinity(0))
    os.sched_setaffinity(0, set(all_cpus[: min(cores, len(all_cpus))]))
    os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
    n_exec = max(cores // 8, 1)
    extra = {
        "spark.driver.memory": "16g",
        "spark.executor.memory": "6g",
        "spark.executor.cores": "8",
        "spark.executorEnv.PYTHONPATH": REPO,
        "spark.executor.extraJavaOptions": "-XX:ActiveProcessorCount=8",
        "spark.driver.extraJavaOptions": "-XX:ActiveProcessorCount=4",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "32768",
        # UI on: _join_stage_task_skew reads per-task duration quantiles
        # (the straggler evidence) from the REST API
        "spark.ui.enabled": "true",
        "spark.ui.port": "4047",
    }
    spark = get_spark(
        f"skew-{cores}-{salt}-{skewjoin}",
        master=f"local-cluster[{n_exec},8,8192]",
        shuffle_partitions=2 * cores,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    _set_tree_affinity(set(os.sched_getaffinity(0)))
    if warm:
        job_skew(spark, n, salt, skewjoin)  # warm
    _set_tree_affinity(set(os.sched_getaffinity(0)))
    best = None
    for _ in range(runs):
        r = job_skew(spark, n, salt, skewjoin)
        if best is None or r["seconds"] < best["seconds"]:
            best = r
    try:
        stop_spark()
    except Exception as exc:
        print(f"(ignored teardown error: {exc})", file=sys.stderr)
    os.sched_setaffinity(0, set(all_cpus))
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=20_000_000)
    ap.add_argument("--polys", type=int, default=120_000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--warm", type=int, default=1)
    ap.add_argument("--variants", type=str,
                    default="32:noaqe_nosalt,32:aqe_nosalt,32:aqe_salt32,"
                            "8:aqe_nosalt,8:aqe_salt32")
    args = ap.parse_args()
    global JOB_POLYS
    JOB_POLYS = args.polys

    spec = {
        "noaqe_nosalt": (None, False),
        "aqe_nosalt": (None, True),
        "aqe_salt32": (32, True),
        # finer salt grain: 32 buckets over 64 reduce partitions is a
        # balls-in-bins lottery (some partitions draw 2-3 heavy buckets);
        # 128 lighter buckets smooth the load
        "aqe_salt128": (128, True),
        "noaqe_salt128": (128, False),
    }
    out_path = os.path.join(REPO, "BENCH", "skew_salting.json")
    rec = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            rec = json.load(f)
    rec.update({
        "points": args.points, "polys": args.polys,
        "hot_fraction": 0.5, "hot_cell": HOT_CELL, "z": Z,
        "mode": "local-cluster[cores/8, 8]",
        "loadavg_start": os.getloadavg()[0],
    })
    for v in args.variants.split(","):
        cores_s, name = v.split(":")
        salt, skewjoin = spec[name]
        print(f"== {name} @ {cores_s}c ==", flush=True)
        r = run_variant(int(cores_s), args.points, salt, skewjoin, args.runs, warm=bool(args.warm))
        key = f"{name}_{cores_s}c"
        rec[key] = r
        print(f"   {key}: {r}", flush=True)
        with open(out_path, "w") as f:
            json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
