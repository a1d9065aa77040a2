"""Iceberg-manifest scan planning at material size (north rule: Iceberg
tables, explicit repartitioning by cell prefix, resumable snapshots).

Builds a north_table-shaped keys table (integer-mixed lon/lat + a payload
column) as ONE snaptable snapshot, Hive-partitioned by the coarse cell
prefix with per-file min/max of the fine cell recorded in the snapshot
manifest (`write_snapshot(partition_by=, stats_cols=)`), then times a
selective AOI read two ways over identical semantics:

  full_scan : read_snapshot() + .filter(cell BETWEEN lo AND hi)
              — Spark opens EVERY data file; parquet row-group stats can
              skip row groups only after each file's open + footer read.
  manifest  : read_snapshot(where={"cell": (lo, hi)})
              — files whose recorded [min,max] misses the range are pruned
              DRIVER-SIDE from the manifest; Spark never lists or opens
              them.

On local NVMe with a warm page cache the wall delta is the scan work
skipped; on an object store every pruned file is additionally a saved
LIST/GET round trip — the files_opened counts are the portable evidence.
Results identical by construction (the pruned read applies the same
filter; asserted via checksum equality).

Writes BENCH/manifest_pruning.json.

Run: python tools/bench_manifest.py [--rows 10000000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
Z, PREFIX_Z = 7, 3  # fine join cell / coarse layout prefix (<= 64 dirs)


def build_table(spark, n: int, table: str) -> dict:
    from gis_scripts_spark.index import cells
    from gis_scripts_spark.sources import snaptable

    df = spark.range(0, n, 1, 64)
    k = F.col("id")
    lon = ((k * F.lit(2654435761)) % F.lit(350_000)).cast("double") / F.lit(1000.0) - F.lit(175.0)
    lat = ((k * F.lit(40503)) % F.lit(170_000)).cast("double") / F.lit(1000.0) - F.lit(85.0)
    cell = cells.cell_col(lon, lat, Z)
    df = df.select(
        k.alias("image_id"), lon.alias("lon"), lat.alias("lat"),
        cell.alias("cell"),
        cells.cell_prefix_col(cell, Z, PREFIX_Z).alias("cell_prefix"),
        # payload stands in for caption/metadata columns (makes per-file
        # scan cost material without image bytes)
        F.repeat(F.format_string("cap-%d", k), 8).alias("caption"),
    )
    # the north star's "explicit repartitioning by cell prefix": without it
    # every write task emits a sliver into every partition dir (64 tasks x
    # 64 prefixes = 4096 tiny files); with it each prefix dir holds ~one
    # material file — the layout a 10^12-row table needs
    df = df.repartition(1 << (2 * PREFIX_Z), "cell_prefix")
    t0 = time.time()
    snap = snaptable.write_snapshot(
        df, table, stage="ingest",
        partition_by=["cell_prefix"], stats_cols=["cell"],
    )
    return {"rows": snap["rows"], "files": len(snap["files"]),
            "build_sec": round(time.time() - t0, 1)}


def timed_agg(df) -> tuple[float, int, int]:
    t0 = time.perf_counter()
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.pmod(F.col("image_id"), F.lit(997))).alias("chk"),
    ).collect()[0]
    return time.perf_counter() - t0, int(row["n"]), int(row["chk"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--table", type=str, default="/tmp/gss_manifest_tbl")
    args = ap.parse_args()

    from gis_scripts_spark.index import cells
    from gis_scripts_spark.session import get_spark
    from gis_scripts_spark.sources import snaptable

    spark = get_spark("manifest-pruning", cores=32)
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(args.table, ignore_errors=True)
    build = build_table(spark, args.rows, args.table)

    # AOI probe: every fine cell of ONE coarse prefix cell (a real window
    # query shape — the range is over the NON-partition stats column)
    import numpy as np

    probe_cell = int(cells.cell(np.array([12.3]), np.array([41.9]), Z)[0])
    prefix = int(cells.cell_prefix(np.int64(probe_cell), PREFIX_Z))
    _, pgx, pgy = cells.unpack(np.int64(prefix))
    s = Z - PREFIX_Z
    lo = int(cells.pack(Z, int(pgx) << s, int(pgy) << s))
    hi = int(cells.pack(Z, ((int(pgx) + 1) << s) - 1, ((int(pgy) + 1) << s) - 1))

    rec = {"rows": args.rows, "z": Z, "prefix_z": PREFIX_Z, **build,
           "cell_range": [lo, hi], "loadavg_start": os.getloadavg()[0]}
    variants = {
        "full_scan": lambda: snaptable.read_snapshot(spark, args.table).filter(
            (F.col("cell") >= lo) & (F.col("cell") <= hi)),
        "manifest": lambda: snaptable.read_snapshot(
            spark, args.table, where={"cell": (lo, hi)}),
    }
    results = {}
    for name, mk in variants.items():
        df = mk()
        n_files = len(df.inputFiles())
        timed_agg(df)  # warm (page cache, codegen)
        best = None
        for _ in range(3):
            sec, n, chk = timed_agg(mk())
            if best is None or sec < best[0]:
                best = (sec, n, chk)
        results[name] = {"seconds": round(best[0], 3), "files_opened": n_files,
                         "n": best[1], "chk": best[2]}
        print(name, results[name], flush=True)
    assert results["full_scan"]["n"] == results["manifest"]["n"]
    assert results["full_scan"]["chk"] == results["manifest"]["chk"]
    rec.update(results)
    rec["files_skipped_pct"] = round(
        100.0 * (1 - results["manifest"]["files_opened"]
                 / max(results["full_scan"]["files_opened"], 1)), 1)
    out = os.path.join(REPO, "BENCH", "manifest_pruning.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))
    shutil.rmtree(args.table, ignore_errors=True)


if __name__ == "__main__":
    main()
