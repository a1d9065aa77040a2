"""spark-submit --py-files evidence (the north rule's launch mode).

Packages gis_scripts_spark into a zip, then launches a REAL
``spark-submit --master local-cluster[2,4,2048] --py-files <zip> job.py``
with PYTHONPATH scrubbed — the only way the driver AND the two separate
executor JVMs' Python workers can import the package is through the
shipped zip, exactly like a production cluster. The job runs the flagship
cell-keyed PIP join plus an Arrow-UDF query (hex7 encode), proving the
zip reaches executor-side Python (pandas UDFs unpickle the package on
workers), and prints one RESULT json line that this harness validates and
records to BENCH/submit_smoke.json.

Phase 2 (the north rule's "run at cluster sizes N and 4N" IN the launch
mode itself): the same spark-submit --py-files path launches a TIMED
S2-encode tile-assignment job (the north-star per-row kernel) at
local-cluster[1,8] and local-cluster[4,8] — one vs four separate 8-core
executor JVMs, the N level affinity-pinned to 8 CPUs like
bench_scaling.run_at — and records both wall times + raw efficiency.
The headline scaling numbers stay in BENCH/scaling_cluster.json (size
sweeps, marginal rates); this proves the mandated LAUNCH MODE runs the
job at both cluster sizes.

Run: python tools/submit_smoke.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """\
import json
import sys

from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()
# the package must come from --py-files (PYTHONPATH is scrubbed): prove it
import gis_scripts_spark
assert "gis_scripts_spark.zip" in gis_scripts_spark.__file__, gis_scripts_spark.__file__

from gis_scripts_spark import queries as Q

sf_dir = sys.argv[1]
pip = Q.QUERIES["pip_pairs"](spark, sf_dir).count()
hexz = Q.QUERIES["hex_zonal_stats"](spark, sf_dir).count()
utm = Q.QUERIES["utm_forward_coords"](spark, sf_dir).count()
execs = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
print("RESULT " + json.dumps({
    "pip_pairs_rows": pip, "hex_zonal_rows": hexz, "utm_rows": utm,
    "executor_endpoints": execs,
    "pkg_file": gis_scripts_spark.__file__,
}))
spark.stop()
"""


JOB_TIMED = """\
import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = SparkSession.builder.getOrCreate()
import gis_scripts_spark
assert "gis_scripts_spark.zip" in gis_scripts_spark.__file__, gis_scripts_spark.__file__

from gis_scripts_spark.operators import tile_assign

n = int(sys.argv[1])


def synth_points(n):
    df = spark.range(0, n, 1, 64)
    k = F.col("id")
    lon = F.lit(-180.0) + ((k * F.lit(2654435761)) % F.lit(360000)).cast("double") / F.lit(1000.0)
    lat = F.lit(-60.0) + ((k * F.lit(97643)) % F.lit(120000)).cast("double") / F.lit(1000.0)
    return df.select(F.col("id").alias("point_id"), lon.alias("lon"), lat.alias("lat"))


def run(m):
    # the FULL flagship job the north rule names: S2 encode (Arrow UDF) +
    # XYZ/quadkey tiling (codegen) + cell-keyed PIP join + zonal rollup
    from gis_scripts_spark.operators import pip_join
    from gis_scripts_spark.sources import synth as synth_mod

    assigned = tile_assign.assign_tiles(synth_points(m), grid_z=7, tile_z=12, s2_level=12)
    polys = synth_mod.aoi_polygons_df(spark)
    joined = pip_join.pip_join(assigned, polys, z=9)
    agg = joined.groupBy(F.pmod(F.col("s2_cell"), F.lit(64))).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.pmod(F.col("tile_x") * F.lit(4096) + F.col("tile_y"), F.lit(997))).alias("tile_sum"),
        F.min("s2_cell").alias("s2_min"),
    )
    agg.write.format("noop").mode("overwrite").save()


run(max(n // 10, 1))  # warm: JIT, codegen, Python UDF workers
best = float("inf")
for _ in range(2):
    t0 = time.time()
    run(n)
    best = min(best, time.time() - t0)
execs = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
print("RESULT " + json.dumps({
    "rows": n, "seconds": round(best, 2), "executor_endpoints": execs,
    "pkg_file": gis_scripts_spark.__file__,
}))
spark.stop()
"""


def build_zip(dest: str) -> str:
    zpath = os.path.join(dest, "gis_scripts_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "gis_scripts_spark")
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit")
    work = tempfile.mkdtemp(prefix="gss_submit_")
    try:
        zpath = build_zip(work)
        job = os.path.join(work, "job.py")
        with open(job, "w") as f:
            f.write(JOB)
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        env["PYSPARK_PYTHON"] = sys.executable
        env["PYSPARK_DRIVER_PYTHON"] = sys.executable
        t0 = time.time()
        proc = subprocess.run(
            [submit, "--master", "local-cluster[2,4,2048]",
             "--conf", "spark.sql.shuffle.partitions=16",
             "--conf", "spark.python.worker.faulthandler.enabled=true",
             "--py-files", zpath, job, sf_dir],
            capture_output=True, text=True, timeout=600, env=env, cwd=work,
        )
        wall = round(time.time() - t0, 1)
        line = next((ln for ln in proc.stdout.splitlines()
                     if ln.startswith("RESULT ")), None)
        if proc.returncode != 0 or line is None:
            sys.stderr.write(proc.stdout[-3000:] + "\n" + proc.stderr[-5000:])
            print("FAIL: spark-submit smoke did not produce RESULT")
            return 1
        res = json.loads(line[len("RESULT "):])
        ok = (res["pip_pairs_rows"] > 0 and res["hex_zonal_rows"] > 0
              and res["utm_rows"] > 0
              # driver endpoint + 2 executor JVMs
              and res["executor_endpoints"] >= 3)
        record = {
            "mode": "spark-submit --py-files, local-cluster[2,4,2048]",
            "sf_dir": sf_dir, "wall_sec": wall, "ok": ok, **res,
        }

        # ---- phase 2: the timed N-vs-4N pair THROUGH spark-submit ----
        # SUBMIT_PAIR=0 (pytest) runs the launch-path smoke only and does
        # NOT touch the official BENCH record — a full-suite pytest run must
        # never clobber the settled-host pair numbers with whatever the host
        # load happens to be
        if os.environ.get("SUBMIT_PAIR", "1") != "1":
            record["ok"] = ok
            print(json.dumps(record))
            return 0 if ok else 1
        n_rows = int(os.environ.get("SUBMIT_PAIR_ROWS", "120000000"))
        job2 = os.path.join(work, "job_timed.py")
        with open(job2, "w") as f:
            f.write(JOB_TIMED)
        pair: dict = {"rows": n_rows, "job": "FULL flagship: S2 encode (Arrow "
                      "UDF) + XYZ/quadkey tiling + cell-keyed PIP join vs AOI "
                      "polygons + zonal rollup"}
        pair_ok = True
        for label, master, n_exec, pin in (
            ("N_1x8", "local-cluster[1,8,6144]", 1, 8),
            ("4N_4x8", "local-cluster[4,8,6144]", 4, None),
        ):
            def _pre(pin=pin):
                if pin is not None:
                    try:
                        cpus = sorted(os.sched_getaffinity(0))
                        os.sched_setaffinity(0, set(cpus[:pin]))
                    except (AttributeError, OSError):
                        pass

            p2 = subprocess.run(
                [submit, "--master", master,
                 "--conf", "spark.executor.memory=6g",
                 "--conf", "spark.executor.cores=8",
                 "--conf", "spark.executor.extraJavaOptions=-XX:ActiveProcessorCount=8",
                 "--conf", f"spark.sql.shuffle.partitions={8 * n_exec}",
                 "--py-files", zpath, job2, str(n_rows)],
                capture_output=True, text=True, timeout=900, env=env,
                cwd=work, preexec_fn=_pre,
            )
            ln2 = next((ln for ln in p2.stdout.splitlines()
                        if ln.startswith("RESULT ")), None)
            if p2.returncode != 0 or ln2 is None:
                sys.stderr.write(p2.stdout[-2000:] + "\n" + p2.stderr[-4000:])
                pair[label] = {"ok": False}
                pair_ok = False
                continue
            r2 = json.loads(ln2[len("RESULT "):])
            r2["rows_per_sec"] = round(n_rows / r2["seconds"], 1)
            pair[label] = r2
        if pair_ok:
            thr_n = pair["N_1x8"]["rows_per_sec"]
            thr_4n = pair["4N_4x8"]["rows_per_sec"]
            pair["speedup_4x"] = round(thr_4n / thr_n, 3)
            pair["raw_efficiency"] = round(thr_4n / thr_n / 4.0, 3)
            pair["note"] = (
                "launch-mode evidence: the SAME spark-submit --py-files path "
                "runs the job at 1 and 4 separate 8-core executor JVMs; the "
                "headline scaling records (size sweeps, marginal rates, host "
                "ceiling controls) are in BENCH/scaling_cluster.json"
            )
        record["n_vs_4n_pair"] = pair
        record["ok"] = ok and pair_ok

        with open(os.path.join(REPO, "BENCH", "submit_smoke.json"), "w") as f:
            json.dump(record, f, indent=1)
        print(json.dumps(record))
        return 0 if record["ok"] else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
