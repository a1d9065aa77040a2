"""One-shot IVF-ANN diagnosis run: phase split (assign/search/total) plus
the REST stage dump, at a chosen parallelism. Usage:
  python tools/diag_ann.py --n 2000000 --execs 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--execs", type=int, default=4)
    ap.add_argument("--exec-cores", type=int, default=8)
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    import pyspark

    from gis_scripts_spark.session import get_spark, stop_spark
    from tools.bench_scaling import _set_tree_affinity, job_ann

    cores = args.execs * args.exec_cores
    try:
        all_cpus = sorted(os.sched_getaffinity(0))
        os.sched_setaffinity(0, set(all_cpus[: min(cores, len(all_cpus))]))
    except (AttributeError, OSError):
        pass
    os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
    os.environ.setdefault("SPARK_WORKER_DIR", "/tmp/spark-worker")
    os.environ.setdefault("SPARK_LOG_DIR", "/tmp/spark-logs")
    extra = {
        "spark.ui.enabled": "true",
        "spark.ui.port": "4041",
        "spark.driver.memory": "16g",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "16384",
        "spark.executor.memory": "6g",
        "spark.executor.cores": str(args.exec_cores),
        "spark.executorEnv.PYTHONPATH": REPO,
        "spark.executor.extraJavaOptions": f"-XX:ActiveProcessorCount={args.exec_cores}",
        "spark.driver.extraJavaOptions": "-XX:ActiveProcessorCount=4",
    }
    spark = get_spark(
        f"diag-ann-{cores}", master=f"local-cluster[{args.execs},{args.exec_cores},8192]",
        shuffle_partitions=2 * cores, extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        cpu_set = set(os.sched_getaffinity(0))
    except (AttributeError, OSError):
        cpu_set = None
    if cpu_set is not None:
        _set_tree_affinity(cpu_set)

    job_ann(spark, args.n)  # warm (also trains + caches the codebook)
    if cpu_set is not None:
        _set_tree_affinity(cpu_set)

    import gc

    for run_i in range(args.runs):
        gc.collect()
        spark.catalog.clearCache()
        time.sleep(2.0)
        t0 = time.perf_counter()
        job_ann(spark, args.n)
        print(json.dumps({
            "run": run_i, "execs": args.execs,
            "total_sec": round(time.perf_counter() - t0, 2),
        }), flush=True)

    try:
        import urllib.request

        def _get(path):
            with urllib.request.urlopen(f"http://localhost:4041/api/v1{path}", timeout=10) as r:
                return json.loads(r.read())

        app = _get("/applications")[0]["id"]
        stages = _get(f"/applications/{app}/stages?status=complete")
        stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        for s in stages[:14]:
            print(json.dumps({
                "stage": s["stageId"],
                "name": (s.get("name") or "")[:60],
                "tasks": s.get("numCompleteTasks"),
                "run_ms": s.get("executorRunTime"),
                "cpu_ms": (s.get("executorCpuTime") or 0) // 1_000_000,
                "gc_ms": s.get("jvmGcTime"),
                "in_mb": round((s.get("inputBytes") or 0) / 1e6, 1),
                "sh_read_mb": round((s.get("shuffleReadBytes") or 0) / 1e6, 1),
                "sh_write_mb": round((s.get("shuffleWriteBytes") or 0) / 1e6, 1),
                "spill_mb": round((s.get("memoryBytesSpilled") or 0) / 1e6, 1),
                "disk_spill_mb": round((s.get("diskBytesSpilled") or 0) / 1e6, 1),
            }), flush=True)
    except Exception as exc:
        print(f"(stage dump unavailable: {exc})", file=sys.stderr)

    try:
        stop_spark()
    except Exception as exc:
        print(f"(ignored teardown error: {exc})", file=sys.stderr)


if __name__ == "__main__":
    main()
