"""Machine-ceiling probe for the scaling evidence: measures how the HOST
(not Spark) scales the exact per-row arithmetic of the points workload from
8 to 32 independent processes.

Each worker owns a private int64 array far larger than the last-level cache
and repeatedly computes the points job's row math (multiply, mod, divide,
floor — the whole-stage-codegen body of synth_points + cell/tile assign).
There is NO shared state, NO IPC, NO shuffle and NO skew: any shortfall
from perfect scaling is the machine's memory subsystem, not a property of
any execution plan.

Run: python tools/membus_probe.py [--rows-per-proc 8000000] [--reps 3]
Prints one JSON line with per-level aggregate throughput + 8->32 efficiency.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

import numpy as np


def worker(rows: int, reps: int, out_q) -> None:
    ids = np.arange(rows, dtype=np.int64)  # 8 B/row -> 64 MB at 8M rows
    t0 = time.perf_counter()
    acc = 0
    for _ in range(reps):
        lon = -180.0 + ((ids * 2654435761) % 360000).astype(np.float64) / 1000.0
        lat = -60.0 + ((ids * 97643) % 120000).astype(np.float64) / 1000.0
        gx = np.floor((lon + 180.0) / 360.0 * 128.0).astype(np.int64)
        gy = np.floor((90.0 - lat) / 180.0 * 128.0).astype(np.int64)
        cell = (np.int64(7) << 58) + (gx << 29) + gy
        acc += int(cell[::65536].sum())  # keep it live
    out_q.put((rows * reps, time.perf_counter() - t0, acc))


def worker_s2(rows: int, reps: int, out_q) -> None:
    """The north_table job's dominant Python stage: the engine's own
    vectorized S2 cell_id kernel (index/s2.py) over private lon/lat
    arrays — the no-Spark ceiling for the assign stage's UDF hop.
    NOTE: the module (incl. its lookup tables) is imported by the PARENT
    before forking, so no per-worker import storm is inside the timing."""
    from gis_scripts_spark.index import s2 as s2_mod

    ids = np.arange(rows, dtype=np.int64)
    lon = -180.0 + ((ids * 2654435761) % 360000).astype(np.float64) / 1000.0
    lat = -60.0 + ((ids * 97643) % 120000).astype(np.float64) / 1000.0
    t0 = time.perf_counter()
    acc = 0
    for _ in range(reps):
        cells = s2_mod.cell_id(lat, lon, level=12)
        acc += int(cells[::65536].sum())
    out_q.put((rows * reps, time.perf_counter() - t0, acc))


def run_level(procs: int, rows: int, reps: int, fn=worker) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=fn, args=(rows, reps, q)) for _ in range(procs)]
    t0 = time.perf_counter()
    for p in ps:
        p.start()
    total_rows = 0
    for _ in ps:
        r, _, _ = q.get()
        total_rows += r
    for p in ps:
        p.join()
    wall = time.perf_counter() - t0
    return total_rows / wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-per-proc", type=int, default=8_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--levels", type=str, default="8,32")
    ap.add_argument("--kernel", type=str, default="points", choices=["points", "s2"])
    args = ap.parse_args()
    kfn = worker
    if args.kernel == "s2":
        import sys

        sys.path.insert(0, "/root/repo")
        from gis_scripts_spark.index import s2 as _s2  # parent-side import: forked workers inherit

        _s2.cell_id(np.array([1.0]), np.array([2.0]), level=12)  # build tables once
        kfn = worker_s2
    levels = [int(x) for x in args.levels.split(",")]
    out = {}
    for lv in levels:
        # warm + best-of-2
        best = 0.0
        for _ in range(2):
            best = max(best, run_level(lv, args.rows_per_proc, args.reps, fn=kfn))
        out[f"rows_per_sec_{lv}procs"] = round(best, 1)
    out["kernel"] = args.kernel
    if len(levels) == 2:
        a, b = levels
        eff = (out[f"rows_per_sec_{b}procs"] / out[f"rows_per_sec_{a}procs"]) / (b / a)
        out["scaling_efficiency"] = round(eff, 3)
        out["levels"] = levels
    print(json.dumps(out))


if __name__ == "__main__":
    main()
