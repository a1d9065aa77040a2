"""hex7 encode size-sweep scaling evidence (round-5 hex7 index).

Same methodology as the north_table_packed / knn sweeps: run job_hex (hex7
aperture-7 encode forced on every row via the Arrow pandas UDF, coarse-key
checksum agg) at sizes 30M/60M/120M on local-cluster [1,8] (N) and [4,8]
(4N) — separate pinned executor JVMs — then fit seconds = floor + rate *
Mrows per level. Marginal scaling efficiency = rate_N / (4 * rate_4N): the
per-row rate governs a 10^12-row job; the fixed floor is per-job
scheduling/stage-wave latency that amortizes away.

Merges a `hex_udf` entry into BENCH/scaling_cluster.json (single-size
headline fields preserved at the largest size).

Run: python tools/bench_hex_sweep.py [--sizes 30000000,60000000,120000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=str, default="30000000,60000000,120000000")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--exec-cores", type=int, default=8)
    ap.add_argument("--merge-min", action="store_true")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from bench_knn_sweep import _settle
    from bench_scaling import job_hex, run_at

    entry: dict = {
        "rows": max(sizes),
        "cores_pair": [args.exec_cores, 4 * args.exec_cores],
        "mode": "local-cluster",
        "loadavg_start": round(os.getloadavg()[0], 2),
        "size_sweep_seconds": {"local8": {}, "local32": {}},
        "point_busy_at_start": {"local8": {}, "local32": {}},
    }
    for cores, key in ((args.exec_cores, "local8"), (4 * args.exec_cores, "local32")):
        for n in sizes:
            busy = _settle()
            t = run_at(
                cores, job_hex, n, arrow_batch=32768, mode="local-cluster",
                runs=args.runs, exec_cores=args.exec_cores,
            )
            tag = f"{n // 1_000_000}M"
            entry["size_sweep_seconds"][key][tag] = round(t, 2)
            entry["point_busy_at_start"][key][tag] = busy
            print(json.dumps({key: {f"{n}": round(t, 2), "busy": busy}}), flush=True)

    out_path = os.path.join(REPO, "BENCH", "scaling_cluster.json")
    with open(out_path) as f:
        doc = json.load(f)
    if args.merge_min and "hex_udf" in doc:
        prev = doc["hex_udf"].get("size_sweep_seconds", {})
        for key in ("local8", "local32"):
            for tag, t in prev.get(key, {}).items():
                cur = entry["size_sweep_seconds"][key].get(tag)
                if cur is None or t < cur:
                    entry["size_sweep_seconds"][key][tag] = t
                    entry["point_busy_at_start"][key][tag] = (
                        doc["hex_udf"].get("point_busy_at_start", {})
                        .get(key, {}).get(tag)
                    )

    fits = {}
    for key in ("local8", "local32"):
        xs = np.array(sizes, float) / 1e6
        ys = np.array(
            [entry["size_sweep_seconds"][key][f"{n // 1_000_000}M"] for n in sizes]
        )
        rate, floor = np.polyfit(xs, ys, 1)
        fits[key] = (max(rate, 1e-9), max(floor, 0.0))
    entry["fitted_seconds_per_Mrow"] = {k: round(v[0], 4) for k, v in fits.items()}
    entry["fitted_fixed_floor_seconds"] = {k: round(v[1], 2) for k, v in fits.items()}
    entry["marginal_scaling_efficiency"] = round(
        fits["local8"][0] / (4.0 * fits["local32"][0]), 3
    )
    big = f"{max(sizes) // 1_000_000}M"
    t8 = entry["size_sweep_seconds"]["local8"][big]
    t32 = entry["size_sweep_seconds"]["local32"][big]
    entry["seconds_local8"] = t8
    entry["seconds_local32"] = t32
    entry["rows_per_sec_local8"] = round(max(sizes) / t8, 1)
    entry["rows_per_sec_local32"] = round(max(sizes) / t32, 1)
    entry["speedup_4x_cores"] = round(t8 / t32, 3)
    entry["scaling_efficiency"] = round(t8 / t32 / 4.0, 3)
    entry["loadavg_end"] = round(os.getloadavg()[0], 2)
    entry["note"] = (
        "hex7 (from-scratch H3-structure aperture-7 icosahedral index) "
        "encode on every row via ONE Arrow pandas UDF + coarse-key checksum "
        "agg — the hex twin of points_s2_udf. Embarrassingly parallel "
        "per-row compute; marginal efficiency from the size-sweep linear "
        "fit (same methodology as north_table_packed/knn). Points are "
        "settle-gated on instantaneous /proc/stat busy; per-point "
        "busy-at-start stamped."
    )

    doc["hex_udf"] = entry
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"hex_udf": entry}, indent=1))


if __name__ == "__main__":
    main()
