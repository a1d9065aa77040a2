"""Structured Streaming surface: incremental ingest of image/point rows.

The reference is purely batch (SURVEY.md §2.9) — its only incremental
behavior is resume-by-file-existence. This module provides the natural
streaming extension: a file-source stream of new rows is tile-assigned
(stateless withColumns) and PIP-joined against the static broadcast AOI
cover (stream-static join, no watermark needed — both stages are
stateless), then appended to a sink. Combined with sources/snaptable this
gives continuous ingest with exactly-once file-level semantics
(checkpointLocation + idempotent parquet append).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from gis_scripts_spark.operators import pip_join, tile_assign


def stream_tile_assign(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    grid_z: int = 7,
    tile_z: int = 12,
) -> DataFrame:
    """readStream over a parquet directory -> tile-assigned stream.
    Stateless: safe at any trigger; no watermark required."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return tile_assign.assign_tiles(stream, grid_z=grid_z, tile_z=tile_z, s2_level=None)


def stream_pip_join(
    assigned: DataFrame,
    polys_df: DataFrame,
    z: int = 7,
) -> DataFrame:
    """Stream-static PIP join: the polygon cover table is static and
    broadcast; the stream side only carries keys."""
    return pip_join.pip_join(assigned, polys_df, z=z)


def run_incremental(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    polys_df: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    grid_z: int = 7,
) -> None:
    """One availableNow micro-batch pass: process every unseen file in
    `source_dir`, append results to `sink_dir`, remember progress in
    `checkpoint_dir`. Re-running after new files arrive processes ONLY the
    new files — the streaming analogue of snaptable's idempotent stages."""
    assigned = stream_tile_assign(spark, source_dir, schema, grid_z=grid_z)
    joined = stream_pip_join(assigned, polys_df, z=grid_z)
    out = joined.select("image_id", "lon", "lat", "quadkey", "poly_id")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
