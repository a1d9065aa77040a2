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
        with open(os.path.join(REPO, "BENCH", "submit_smoke.json"), "w") as f:
            json.dump(record, f, indent=1)
        print(json.dumps(record))
        return 0 if ok else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
