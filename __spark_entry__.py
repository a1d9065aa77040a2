"""Driver contract for the spark-graft builder (PySpark target).

entry(spark):   flagship PIP-join + zonal-count pipeline at sf0.001.
queries():      one entry per implemented operator (SURVEY.md §2).
oracle_sql():   DuckDB-equivalent SQL per query (CORRECTNESS gate).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
# Python UDF workers must import gis_scripts_spark too.
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from gis_scripts_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: point-in-polygon join
    (cell cover + broadcast + exact ray-cast check) -> zonal counts."""
    return QUERIES["pip_counts"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
