"""Round-6 profiling harness (measurement only — bench.py stays frozen).

Usage:
  python tools/profile_r6.py <query>[,<query>...] [sf_dir] [runs]

For each query: warm once, time `runs` noop-forced runs (min reported),
dump .explain("formatted") to plans/r06/<query>_<tag>.txt, and print the
per-job wall times + biggest stages from the Spark REST API so the time
can be attributed to operators.

Env:
  PROFILE_TAG   suffix for the plan file (default "before")
  PROFILE_UI    "1" (default) to enable the UI/REST for stage attribution
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from gis_scripts_spark import queries as Q  # noqa: E402
from gis_scripts_spark.session import get_spark  # noqa: E402


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    tag = os.environ.get("PROFILE_TAG", "before")
    ui = os.environ.get("PROFILE_UI", "1") == "1"

    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    extra = {"spark.ui.enabled": "true", "spark.ui.showConsoleProgress": "false"} if ui else {}
    spark = get_spark("profile_r6", cores=cores, extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    base = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[-1]}" if ui else None
    app_id = spark.sparkContext.applicationId

    Q.ensure_geoparquet_fixture(spark, sf_dir)
    Q.ensure_geojson_fixture(spark, sf_dir)
    Q.ensure_worldview_zip_fixture(spark, sf_dir)
    Q.ensure_phash_images_fixture(spark, sf_dir)
    Q.ensure_stream_events_fixture(spark, sf_dir)

    os.makedirs(os.path.join(_REPO, "plans", "r06"), exist_ok=True)

    for name in names:
        fn = Q.QUERIES[name]
        import gc

        gc.collect()
        spark.catalog.clearCache()
        # warm
        spark.sparkContext.setJobDescription(f"{name}: warm")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        # plan capture
        plan = fn(spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
            fn(spark, sf_dir)._jdf.queryExecution(), "formatted")
        with open(os.path.join(_REPO, "plans", "r06", f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)

        first_job = None
        if base is not None:
            jobs0 = _rest(base, f"/api/v1/applications/{app_id}/jobs")
            first_job = max((j["jobId"] for j in jobs0), default=-1) + 1
        times = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{name}: run{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        print(f"=== {name} @ {sf_dir}: min={min(times):.3f}s runs={[round(t, 3) for t in times]}")

        if base is not None:
            jobs = _rest(base, f"/api/v1/applications/{app_id}/jobs")
            jobs = [j for j in jobs if j["jobId"] >= first_job]
            rows = []
            for j in jobs:
                t0 = j.get("submissionTime")
                t1 = j.get("completionTime")
                dur = None
                if t0 and t1:
                    from datetime import datetime

                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    dur = (datetime.strptime(t1, fmt) - datetime.strptime(t0, fmt)).total_seconds()
                rows.append((dur or 0.0, j["jobId"], j.get("description") or j.get("name", ""),
                             j.get("numTasks"), j.get("stageIds")))
            rows.sort(reverse=True)
            for dur, jid, desc, ntasks, stids in rows[:14]:
                print(f"  job {jid} {dur:7.2f}s tasks={ntasks} stages={stids} {desc[:60]}")
            stages = _rest(base, f"/api/v1/applications/{app_id}/stages?status=complete")
            sel = []
            want = {sid for _, _, _, _, stids in rows for sid in (stids or [])}
            for s in stages:
                if s["stageId"] in want:
                    wall = (s.get("executorRunTime") or 0) / 1000.0
                    sel.append((wall, s["stageId"], s["numCompleteTasks"],
                                (s.get("shuffleReadBytes") or 0) // 1024,
                                (s.get("shuffleWriteBytes") or 0) // 1024,
                                s.get("name", "")[:100]))
            sel.sort(reverse=True)
            print("  top stages by executorRunTime (sum across runs):")
            for wall, sid, nt, srd, swr, nm in sel[:16]:
                print(f"    stage {sid:4d} run={wall:8.2f}s tasks={nt:4d} "
                      f"shRead={srd}K shWrite={swr}K {nm}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
