"""Manifest scan + idempotent ingest (SURVEY.md §2.1 S6/S7, §2.3 J7).

Reference semantics: list archive members + parse acquisition metadata into
a DataFrame (``seagrass_lib.py:168-193``), and skip-if-already-complete
downloads (``download_usgs_lidar.py:29-46``). Spark mapping: directory
manifests via the built-in binaryFile source (metadata-only — content is
NOT read unless selected), and a left-anti join against the sink table as
the idempotency filter (followed by a snaptable append, giving MERGE-like
exactly-once ingest).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def manifest_scan(spark: SparkSession, path_glob: str, suffix: str | None = None) -> DataFrame:
    """(path, modificationTime, length) manifest of files under a glob —
    column-pruned so file CONTENT is never read for metadata-only plans."""
    df = spark.read.format("binaryFile").load(path_glob)
    if suffix:
        df = df.filter(F.col("path").endswith(suffix))
    return df.select("path", "modificationTime", "length")


def read_binary_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """(path, content) rows — the raw-bytes ingestion source for image
    files (S1 ingest path: binary file -> input_hint row)."""
    return spark.read.format("binaryFile").load(path_glob).select(
        "path", F.col("content").alias("bytes"), "length"
    )


def idempotent_ingest(
    new_rows: DataFrame,
    sink_table: str,
    key: str = "image_id",
    stage: str | None = None,
) -> dict | None:
    """Append only rows whose key is not already in the sink (left-anti
    join — the reference's skip-if-file-exists as a set operation), then
    snapshot-commit. Returns the snapshot record or None if nothing new."""
    from gis_scripts_spark.sources import snaptable

    spark = new_rows.sparkSession
    try:
        existing = snaptable.read_snapshot(spark, sink_table).select(key)
    except FileNotFoundError:
        existing = None
    todo = new_rows if existing is None else new_rows.join(
        F.broadcast(existing), key, "left_anti"
    )
    if todo.isEmpty():
        return None
    return snaptable.write_snapshot(todo, sink_table, stage=stage, mode="append")
