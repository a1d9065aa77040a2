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


def stream_exact_dedup(
    docs_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    watermark_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep only the FIRST document per content
    hash across micro-batches — Spark's stateful streaming
    `dropDuplicates` keyed by md5(text) (state backed by the checkpoint
    store, so dedup survives restarts). With `watermark_col` the state is
    bounded — the production setting for unbounded corpora; without it the
    state grows with distinct content, the fair default for bounded
    backfills."""
    hashed = docs_stream.withColumn("_text_md5", F.md5(F.col(text_col)))
    if watermark_col is not None:
        # key-only dedup with bounded state: dropDuplicatesWithinWatermark
        # dedups on the hash ALONE (identical content with a different
        # event time inside the window is still dropped — plain
        # dropDuplicates([hash, ts]) would keep it, the r3 advice defect),
        # and state older than the watermark expires.
        hashed = hashed.withWatermark(watermark_col, watermark)
        return hashed.dropDuplicatesWithinWatermark(["_text_md5"])
    return hashed.dropDuplicates(["_text_md5"])


def stream_windowed_zonal_counts(
    joined: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time windowed zonal rollup with late-data handling — the
    standard Structured Streaming pattern the reference's batch zonal
    tables have no answer to: per (event-time window, polygon) image
    counts, with a watermark bounding state. Late events inside the
    watermark still land in their window; events later than the
    watermark are dropped (finalized windows are emitted EXACTLY once in
    append mode — safe for file sinks).

    Returns (window_start, window_end, poly_id, n_images)."""
    w = joined.withWatermark(ts_col, watermark).groupBy(
        F.window(F.col(ts_col), window), F.col("poly_id")
    ).agg(F.count(F.lit(1)).alias("n_images"))
    return w.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "poly_id",
        "n_images",
    )


def stream_running_zonal_counts(joined: DataFrame) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState): a
    running per-polygon image counter with first/last image ids,
    maintained across micro-batches (append-mode emission) — the streaming analogue of the
    zonal rollup (the reference recomputes zonal tables per batch run;
    this keeps them warm incrementally).

    State per poly_id: (n_images, first_image, last_image). Emits one
    updated row per polygon per micro-batch that touched it."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("poly_id", StringType(), False),
            StructField("n_images", LongType(), False),
            StructField("first_image", StringType(), True),
            StructField("last_image", StringType(), True),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType(), False),
            StructField("first_image", StringType(), True),
            StructField("last_image", StringType(), True),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, first, last = (state.get if state.exists else (0, None, None))
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ids = sorted(pdf["image_id"].astype(str))
            n += len(ids)
            first = ids[0] if first is None else min(first, ids[0])
            last = ids[-1] if last is None else max(last, ids[-1])
        state.update((n, first, last))
        yield pd.DataFrame(
            [{"poly_id": key[0], "n_images": n,
              "first_image": first, "last_image": last}]
        )

    # "append" operator mode: each micro-batch APPENDS one updated row per
    # touched polygon (file sinks don't accept update mode); readers take
    # the max-n row per polygon for the current totals
    return joined.groupBy("poly_id").applyInPandasWithState(
        update, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout,
    )
