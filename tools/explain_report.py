"""Dump formatted physical plans of the headline queries to BENCH/plans/
— the reviewable evidence for pushdown / pruning / join-strategy claims
(SURVEY.md §4.2). Driver-only: plans are compiled, not executed.

Run: python tools/explain_report.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gis_scripts_spark import queries as Q  # noqa: E402
from gis_scripts_spark.session import get_spark  # noqa: E402

PLAN_QUERIES = [
    "pricing_summary",
    "tile_assign",
    "pip_pairs",
    "grid_agg_mean_of_means",
    "bbox_overlap_pairs",
    "mosaic_last_wins",
    "ngram_jaccard_pairs",
    "coverage_join",
    "minhash_lsh_pairs",
    "text_fingerprint",
    "dedup_clusters",
    "ann_ivf_top3",
    "hex_zonal_stats",
    "zip_manifest_coverage",
    "geojson_pip",
    "hamming256_neardup",
    "exif_gps_zonal",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = os.path.join(REPO, "BENCH", "plans")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans", cores=4)
    spark.sparkContext.setLogLevel("ERROR")
    for name in PLAN_QUERIES:
        df = Q.QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {name}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
