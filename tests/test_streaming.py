"""Structured Streaming incremental ingest: availableNow passes process
only unseen files; stream output matches the batch PIP join."""

import os

import pytest
from pyspark.sql import functions as F

from gis_scripts_spark import streaming
from gis_scripts_spark.operators import pip_join, tile_assign
from gis_scripts_spark.sources import synth


def test_incremental_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    polys = synth.aoi_polygons_df(spark)
    imgs = synth.images_df(spark, 120, parts=2).drop("bytes")  # keys-only stream
    schema = imgs.schema

    # batch oracle on the first 120 rows
    batch = pip_join.pip_join(
        tile_assign.assign_tiles(imgs, s2_level=None), polys, z=7
    ).select("image_id", "poly_id")
    want1 = set(map(tuple, batch.collect()))

    imgs.write.parquet(os.path.join(src, "part1"))
    # parquet stream source reads a directory tree of files; write file batches
    streaming.run_incremental(spark, src + "/*", schema, polys, sink, ckpt, grid_z=7)
    got1 = set(
        map(tuple, spark.read.parquet(sink).select("image_id", "poly_id").collect())
    )
    assert got1 == want1

    # second batch of NEW rows only
    imgs2 = synth.images_df(spark, 240, parts=2).drop("bytes").filter(
        F.col("image_id") >= "img_00000120"
    )
    imgs2.write.parquet(os.path.join(src, "part2"))
    streaming.run_incremental(spark, src + "/*", schema, polys, sink, ckpt, grid_z=7)
    all_imgs = synth.images_df(spark, 240, parts=2).drop("bytes")
    want2 = set(
        map(
            tuple,
            pip_join.pip_join(tile_assign.assign_tiles(all_imgs, s2_level=None), polys, z=7)
            .select("image_id", "poly_id")
            .collect(),
        )
    )
    got2 = set(
        map(tuple, spark.read.parquet(sink).select("image_id", "poly_id").collect())
    )
    assert got2 == want2  # incremental append, no duplicates, nothing missed
