"""Label-propagation at material graph size (VERDICT r4 directive #7).

Generates ~10^6 synthetic near-dup edges — a mix of shallow clusters (the
realistic near-dup regime: millions of 4-node stars) plus ONE deep path
(diameter ~14, forcing 13+ propagation rounds) — then measures:

  1. cluster_pairs_distributed per-round wall-clock across the 13+ rounds
     (the localCheckpoint discipline's actual claim: per-round time FLAT,
     no growth trend as iterations accumulate), with check_every=1 vs 2
     (driver round-trip batching);
  2. total wall vs the driver union-find (cluster_pairs) on the SAME edges
     — the crossover context for the 10^12 story;
  3. result equality between all three runs.

Writes BENCH/graph_label_prop.json.

Run: python tools/bench_graph.py [--edges 1000000] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEEP_BASE = 10_000_000_000  # deep-path ids far above the shallow id range


def synth_edges(spark, n_edges: int, path_len: int = 14):
    """Deterministic edge table: shallow 4-node stars (3 edges per cluster)
    covering ~n_edges, plus one path of `path_len` nodes (path_len-1 edges)
    whose min label must travel the full diameter. Pure Column math."""
    n_ids = (n_edges // 3) * 4
    base = spark.range(0, n_ids, 1, 32).filter((F.col("id") % 4) != 0)
    stars = base.select(
        F.col("id").alias("id_a"), (F.col("id") - (F.col("id") % 4)).alias("id_b")
    )
    chain = spark.range(0, path_len - 1, 1, 1).select(
        (F.col("id") + F.lit(DEEP_BASE)).alias("id_a"),
        (F.col("id") + F.lit(DEEP_BASE + 1)).alias("id_b"),
    )
    return stars.unionByName(chain)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--path-len", type=int, default=14)
    args = ap.parse_args()

    from gis_scripts_spark.operators import dedup
    from gis_scripts_spark.session import get_spark, stop_spark

    stop_spark()
    spark = get_spark("graph-bench", cores=args.cores,
                      shuffle_partitions=2 * args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    edges = synth_edges(spark, args.edges, args.path_len)
    n_edges = edges.count()  # materialize the generator before timing
    results: dict = {"n_edges": int(n_edges), "cores": args.cores,
                     "path_len": args.path_len,
                     "loadavg_start": round(os.getloadavg()[0], 2)}

    # -- distributed, check every round
    tel1: dict = {}
    t0 = time.perf_counter()
    lab1 = dedup.cluster_pairs_distributed(
        edges, max_iters=40, check_every=1, telemetry=tel1)
    sum1 = lab1.agg(F.sum(F.col("cluster_id").cast("decimal(38,0)")).alias("s"),
                    F.count(F.lit(1)).alias("n")).collect()[0]
    t1 = time.perf_counter() - t0
    rounds1 = [r["seconds"] for r in tel1["rounds"]]
    results["distributed_check1"] = {
        "total_seconds": round(t1, 2),
        "n_rounds": len(rounds1),
        "per_round_seconds": rounds1,
        # flatness: ratio of mean(last 3) to mean(rounds 2-4) — ~1.0 means
        # no per-round growth (the checkpoint discipline claim)
        "flatness_last3_over_first3": round(
            (sum(rounds1[-3:]) / 3) / max(sum(rounds1[1:4]) / 3, 1e-9), 3),
        "label_sum": str(sum1["s"]), "n_nodes": int(sum1["n"]),
    }

    # -- distributed, check every 2 rounds (halved driver round-trips)
    tel2: dict = {}
    t0 = time.perf_counter()
    lab2 = dedup.cluster_pairs_distributed(
        edges, max_iters=40, check_every=2, telemetry=tel2)
    sum2 = lab2.agg(F.sum(F.col("cluster_id").cast("decimal(38,0)")).alias("s"),
                    F.count(F.lit(1)).alias("n")).collect()[0]
    t2 = time.perf_counter() - t0
    results["distributed_check2"] = {
        "total_seconds": round(t2, 2),
        "n_rounds": len(tel2["rounds"]),
        "per_round_seconds": [r["seconds"] for r in tel2["rounds"]],
        "label_sum": str(sum2["s"]), "n_nodes": int(sum2["n"]),
    }

    # -- driver union-find on the same edges (collect is part of its cost)
    t0 = time.perf_counter()
    pdf = edges.toPandas()
    lab3 = dedup.cluster_pairs(pdf)
    t3 = time.perf_counter() - t0
    results["driver_union_find"] = {
        "total_seconds": round(t3, 2),
        "label_sum": str(int(lab3["cluster_id"].sum())),
        "n_nodes": int(len(lab3)),
    }

    # equality: same node count and same exact label sum => identical
    # assignments (labels are min-member ids; sum is a faithful fingerprint
    # given equal counts and the same label-minimum semantics)
    results["all_equal"] = (
        results["distributed_check1"]["label_sum"]
        == results["distributed_check2"]["label_sum"]
        == results["driver_union_find"]["label_sum"]
        and results["distributed_check1"]["n_nodes"]
        == results["distributed_check2"]["n_nodes"]
        == results["driver_union_find"]["n_nodes"]
    )
    results["loadavg_end"] = round(os.getloadavg()[0], 2)

    out_path = os.path.join(REPO, "BENCH", "graph_label_prop.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))
    stop_spark()


if __name__ == "__main__":
    main()
