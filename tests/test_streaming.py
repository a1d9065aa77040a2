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


def test_stream_exact_dedup(spark, tmp_path):
    """Stateful streaming dedup: a duplicate arriving in a LATER
    micro-batch is dropped (state persists across batches via the
    checkpoint store)."""
    import pandas as pd
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    src = str(tmp_path / "docs_src")
    sink = str(tmp_path / "docs_sink")
    ckpt = str(tmp_path / "docs_ckpt")
    os.makedirs(src)
    schema = StructType([
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), False),
    ])

    def run_pass():
        stream = spark.readStream.schema(schema).parquet(src + "/*")
        deduped = streaming.stream_exact_dedup(stream)
        q = (deduped.select("doc_id", "text").writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).outputMode("append").start())
        q.awaitTermination()

    spark.createDataFrame(pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["aaa", "bbb", "aaa"]}), schema=schema
    ).write.parquet(os.path.join(src, "b1"))
    run_pass()
    got1 = spark.read.parquet(sink).toPandas()
    assert sorted(got1["text"]) == ["aaa", "bbb"]  # in-batch dup dropped

    # batch 2: one cross-batch duplicate + one new doc
    spark.createDataFrame(pd.DataFrame(
        {"doc_id": [4, 5], "text": ["bbb", "ccc"]}), schema=schema
    ).write.parquet(os.path.join(src, "b2"))
    run_pass()
    got2 = spark.read.parquet(sink).toPandas()
    assert sorted(got2["text"]) == ["aaa", "bbb", "ccc"]  # 'bbb' dropped by state


def test_stream_running_zonal_counts(spark, tmp_path):
    """applyInPandasWithState running zonal counter: counts accumulate
    across micro-batches per polygon."""
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    src = str(tmp_path / "z_src")
    sink = str(tmp_path / "z_sink")
    ckpt = str(tmp_path / "z_ckpt")
    os.makedirs(src)
    schema = StructType([
        StructField("image_id", StringType(), False),
        StructField("poly_id", StringType(), False),
    ])

    def run_pass():
        stream = spark.readStream.schema(schema).parquet(src + "/*")
        counts = streaming.stream_running_zonal_counts(stream)
        q = (counts.writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).outputMode("append").start())
        q.awaitTermination()

    spark.createDataFrame(pd.DataFrame({
        "image_id": ["i1", "i2", "i3"], "poly_id": ["pA", "pA", "pB"],
    }), schema=schema).write.parquet(os.path.join(src, "b1"))
    run_pass()
    spark.createDataFrame(pd.DataFrame({
        "image_id": ["i4", "i0"], "poly_id": ["pA", "pB"],
    }), schema=schema).write.parquet(os.path.join(src, "b2"))
    run_pass()
    got = spark.read.parquet(sink).toPandas()
    # latest emitted row per polygon carries the RUNNING totals
    last = got.sort_values("n_images").groupby("poly_id").last()
    assert last.loc["pA", "n_images"] == 3
    assert last.loc["pB", "n_images"] == 2
    assert last.loc["pA", "first_image"] == "i1"
    assert last.loc["pA", "last_image"] == "i4"
    assert last.loc["pB", "first_image"] == "i0"


def test_stream_dedup_watermarked_key_only(spark, tmp_path):
    """Round-4 ADVICE fix: watermarked dedup keys on the content hash
    ALONE (dropDuplicatesWithinWatermark) — identical text arriving with
    a DIFFERENT event time inside the watermark window is still dropped.
    The r3 code deduped on (hash, event_time) and kept it."""
    import datetime

    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    src = str(tmp_path / "wm_src")
    sink = str(tmp_path / "wm_sink")
    ckpt = str(tmp_path / "wm_ckpt")
    os.makedirs(src)
    schema = StructType([
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), False),
        StructField("ts", TimestampType(), False),
    ])
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    # same text at three DIFFERENT timestamps within the 1h watermark
    spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["aaa", "aaa", "aaa", "bbb"],
        "ts": [t0, t0 + datetime.timedelta(minutes=5),
               t0 + datetime.timedelta(minutes=10), t0],
    }), schema=schema).write.parquet(os.path.join(src, "b1"))
    stream = spark.readStream.schema(schema).parquet(src + "/*")
    deduped = streaming.stream_exact_dedup(stream, watermark_col="ts")
    q = (deduped.select("doc_id", "text").writeStream.format("parquet")
         .option("path", sink).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).outputMode("append").start())
    q.awaitTermination()
    got = spark.read.parquet(sink).toPandas()
    assert sorted(got["text"]) == ["aaa", "bbb"], got
