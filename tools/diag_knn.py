"""One-shot kNN diagnosis run: per-round telemetry + phase split (driver
loop vs final action) at a chosen parallelism. Usage:
  python tools/diag_knn.py --n 4000000 --execs 4
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
    ap.add_argument("--n", type=int, default=4_000_000)
    ap.add_argument("--execs", type=int, default=4)
    ap.add_argument("--exec-cores", type=int, default=8)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    import pyspark

    from gis_scripts_spark.session import get_spark, stop_spark
    from tools.bench_scaling import _set_tree_affinity, job_knn, synth_knn_points

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
        "spark.ui.enabled": "true",   # the stage dump below needs the REST API
        "spark.ui.port": "4040",
        "spark.driver.memory": "16g",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "32768",
        "spark.executor.memory": "6g",
        "spark.executor.cores": str(args.exec_cores),
        "spark.executorEnv.PYTHONPATH": REPO,
        "spark.executor.extraJavaOptions": f"-XX:ActiveProcessorCount={args.exec_cores}",
        "spark.driver.extraJavaOptions":
            "-XX:ActiveProcessorCount=4 -Xlog:gc*:file=/tmp/diag_driver_gc.log:time",
    }
    spark = get_spark(
        f"diag-knn-{cores}", master=f"local-cluster[{args.execs},{args.exec_cores},8192]",
        shuffle_partitions=2 * cores, extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        cpu_set = set(os.sched_getaffinity(0))
    except (AttributeError, OSError):
        cpu_set = None
    if cpu_set is not None:
        _set_tree_affinity(cpu_set)

    from pyspark.sql import functions as F

    from gis_scripts_spark.operators import knn

    job_knn(spark, args.n)  # warm
    if cpu_set is not None:
        _set_tree_affinity(cpu_set)

    import gc

    for run_i in range(args.runs):
        # fire prior finalizers, then let the ASYNC block removal drain
        # before the timed fetches start (mass removals stall the block
        # manager's shuffle serving for seconds)
        gc.collect()
        spark.catalog.clearCache()
        time.sleep(2.0)
        tel: dict = {}
        t0 = time.perf_counter()
        pts = synth_knn_points(spark, args.n)
        qrs = synth_knn_points(spark, args.n // 4, seed_mul=40503).withColumnRenamed(
            "point_id", "query_id"
        )
        out = knn.knn_join(
            pts, qrs, k=5, z=11, point_id="point_id", query_id="query_id",
            n_points_hint=args.n, telemetry=tel,
        )
        t1 = time.perf_counter()
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("dist").alias("dist_sum"),
            F.sum(F.pmod(F.col("neighbor_id"), F.lit(997))).alias("nb_sum"),
        )
        agg.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        print(json.dumps({
            "run": run_i,
            "driver_loop_sec": round(t1 - t0, 2),
            "final_action_sec": round(t2 - t1, 2),
            "total_sec": round(t2 - t0, 2),
            "telemetry": tel,
        }), flush=True)

    # stage-level attribution via the driver REST API: top stages by
    # task-time with shuffle/spill volumes — the data that says WHERE a
    # non-scaling round actually spends its cycles.
    try:
        import urllib.request

        def _get(path):
            with urllib.request.urlopen(f"http://localhost:4040/api/v1{path}", timeout=10) as r:
                return json.loads(r.read())

        app = _get("/applications")[0]["id"]
        for j in _get(f"/applications/{app}/jobs"):
            print(json.dumps({
                "job": j["jobId"],
                "submitted": (j.get("submissionTime") or "")[11:23],
                "stages": j.get("stageIds"),
                "name": (j.get("name") or "")[:70],
            }), flush=True)
        stages = _get(f"/applications/{app}/stages?status=complete")
        stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        for s in stages[:4]:
            try:
                ts = _get(
                    f"/applications/{app}/stages/{s['stageId']}/0/taskSummary"
                    "?quantiles=0.0,0.5,0.9,1.0"
                )
                print(json.dumps({
                    "stage": s["stageId"],
                    "task_run_ms_q": ts.get("executorRunTime"),
                    "sched_delay_q": ts.get("schedulerDelay"),
                    "fetch_wait_q": (ts.get("shuffleReadMetrics") or {}).get("fetchWaitTime"),
                    "write_time_q": (ts.get("shuffleWriteMetrics") or {}).get("writeTime"),
                }), flush=True)
            except Exception:
                pass
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
