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
# Python UDF workers must import gis_scripts_spark too (helps only if the
# session starts AFTER this import — see _ensure_package for the other case).
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from gis_scripts_spark.queries import ORACLES, QUERIES  # noqa: E402


def _ensure_package(spark: SparkSession) -> None:
    """Ship gis_scripts_spark to the Python UDF workers of an EXISTING
    session via addPyFile (the driver creates its SparkSession before
    importing this module, so PYTHONPATH set here is too late for the
    already-launched JVM; pyFiles are added to worker sys.path before UDF
    unpickling). Equivalent to `spark-submit --py-files` on a cluster."""
    sc = spark.sparkContext
    if getattr(sc, "_gis_pkg_added", False):
        return
    import shutil
    import tempfile

    zip_base = os.path.join(tempfile.gettempdir(), "gis_scripts_spark_pyfiles")
    zip_path = shutil.make_archive(zip_base, "zip", root_dir=_REPO, base_dir="gis_scripts_spark")
    sc.addPyFile(zip_path)
    sc._gis_pkg_added = True


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: point-in-polygon join
    (cell cover + broadcast + exact ray-cast check) -> zonal counts."""
    _ensure_package(spark)
    return QUERIES["pip_counts"](spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable) -> Callable:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_package(spark)
        return fn(spark, sf_dir)

    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
