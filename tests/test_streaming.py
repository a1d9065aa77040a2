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


def test_stream_windowed_zonal_counts(spark, tmp_path):
    """Watermarked event-time windows (round 4): counts land in their
    event-time window (not arrival order), in-watermark late data is
    merged before the window finalizes, and append mode emits each
    finalized window exactly once."""
    import datetime

    import pandas as pd
    from pyspark.sql.types import (
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    src = str(tmp_path / "wz_src")
    sink = str(tmp_path / "wz_sink")
    ckpt = str(tmp_path / "wz_ckpt")
    os.makedirs(src)
    schema = StructType([
        StructField("image_id", StringType(), False),
        StructField("poly_id", StringType(), False),
        StructField("ts", TimestampType(), False),
    ])
    t = datetime.datetime(2026, 1, 1, 12, 0, 0)
    m = datetime.timedelta(minutes=1)

    def run_pass():
        stream = spark.readStream.schema(schema).parquet(src + "/*")
        out = streaming.stream_windowed_zonal_counts(
            stream, ts_col="ts", window="10 minutes", watermark="30 minutes")
        q = (out.writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).outputMode("append").start())
        q.awaitTermination()

    # batch 1: three in [12:00,12:10), one "late-but-in-watermark" comes later
    spark.createDataFrame(pd.DataFrame({
        "image_id": ["a", "b", "c"],
        "poly_id": ["P", "P", "Q"],
        "ts": [t + 1 * m, t + 3 * m, t + 5 * m],
    }), schema=schema).write.parquet(os.path.join(src, "b1"))
    run_pass()

    # batch 2: a LATE event for the same window (watermark still open:
    # max_ts 12:05 - 30min << 12:00) plus nothing advancing time
    spark.createDataFrame(pd.DataFrame({
        "image_id": ["d"], "poly_id": ["P"], "ts": [t + 2 * m],
    }), schema=schema).write.parquet(os.path.join(src, "b2"))
    run_pass()

    # batch 3: far-future event advances the watermark past 12:10 ->
    # the [12:00,12:10) windows finalize and are appended exactly once
    spark.createDataFrame(pd.DataFrame({
        "image_id": ["z"], "poly_id": ["Q"], "ts": [t + 120 * m],
    }), schema=schema).write.parquet(os.path.join(src, "b3"))
    run_pass()
    run_pass()  # no new data: nothing further emitted

    got = spark.read.parquet(sink).toPandas().sort_values(["poly_id"])
    w1 = got[got["window_start"] == t]
    assert len(w1) == 2, got
    assert dict(zip(w1["poly_id"], w1["n_images"])) == {"P": 3, "Q": 1}


def test_stream_windowed_zonal_kill_and_resume(spark, tmp_path):
    """r4 verdict directive #8 — restart evidence for the append-mode
    exactly-once claim: a stream is STOPPED mid-run (q.stop() while
    actively processing file-per-trigger micro-batches), restarted from
    its checkpoint, and the final sink table must be IDENTICAL to an
    uninterrupted run over the same files in the same order — no window
    emitted twice, none lost (the streaming analogue of
    test_band_append_idempotent_restart)."""
    import datetime
    import time

    import pandas as pd
    from pyspark.sql.types import (
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType([
        StructField("image_id", StringType(), False),
        StructField("poly_id", StringType(), False),
        StructField("ts", TimestampType(), False),
    ])
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    hour = datetime.timedelta(hours=1)
    minute = datetime.timedelta(minutes=1)

    src = str(tmp_path / "kr_src")
    os.makedirs(src)
    # 6 file batches, each one hour later; window 10 min, watermark 30 min
    # -> every batch's windows finalize when the NEXT batch is processed
    for b in range(6):
        base = t0 + b * hour
        spark.createDataFrame(pd.DataFrame({
            "image_id": [f"i{b}_{k}" for k in range(4)],
            "poly_id": ["P", "P", "Q", "Q"],
            "ts": [base + 1 * minute, base + 2 * minute,
                   base + 3 * minute, base + 12 * minute],
        }), schema=schema).write.parquet(os.path.join(src, f"b{b}"))
        time.sleep(0.05)  # distinct mtimes -> deterministic file order

    def windowed(stream):
        return streaming.stream_windowed_zonal_counts(
            stream, ts_col="ts", window="10 minutes", watermark="30 minutes")

    def drain(sink, ckpt):
        """availableNow file-per-trigger passes until fully caught up."""
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
        q = (windowed(stream).writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).outputMode("append").start())
        q.awaitTermination()

    # ---- uninterrupted oracle run
    sink_a, ckpt_a = str(tmp_path / "kr_sink_a"), str(tmp_path / "kr_ckpt_a")
    drain(sink_a, ckpt_a)
    want = spark.read.parquet(sink_a).toPandas()

    # ---- interrupted run: continuous trigger, kill after first output
    sink_b, ckpt_b = str(tmp_path / "kr_sink_b"), str(tmp_path / "kr_ckpt_b")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
    q = (windowed(stream).writeStream.format("parquet")
         .option("path", sink_b).option("checkpointLocation", ckpt_b)
         .trigger(processingTime="50 milliseconds").outputMode("append").start())
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            if spark.read.parquet(sink_b).count() >= 2:
                break  # mid-stream: some windows emitted, more pending
        except Exception:
            pass
        time.sleep(0.05)
    q.stop()  # kill while micro-batches are in flight
    q.awaitTermination()

    # restart from the same checkpoint and drain the rest
    drain(sink_b, ckpt_b)
    got = spark.read.parquet(sink_b).toPandas()

    key = ["window_start", "poly_id"]
    want_s = want.sort_values(key).reset_index(drop=True)
    got_s = got.sort_values(key).reset_index(drop=True)
    # exactly-once: no duplicated (window, poly) rows after the restart
    assert not got_s.duplicated(subset=key).any(), got_s
    pd.testing.assert_frame_equal(
        got_s[["window_start", "window_end", "poly_id", "n_images"]],
        want_s[["window_start", "window_end", "poly_id", "n_images"]],
    )
    # sanity: the run produced the expected 15 finalized windows (3 per
    # batch — P:[+0,+10), Q:[+0,+10), Q:[+10,+20) — for batches 0-4;
    # batch 5's windows await a future watermark)
    assert len(got_s) == 15, got_s


def test_streaming_windowed_zonal_query_deterministic(spark):
    """The driver query (§2.9 under the FULL oracle): two invocations —
    each with a FRESH checkpoint/sink over the shared time-ordered source
    fixture — produce identical rows, and the fixture really contains
    in-watermark late data (rows shifted one file later than their
    event-time slice)."""
    import numpy as np
    import pandas as pd

    from gis_scripts_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    a = sorted(map(tuple, Q.q_streaming_windowed_zonal(spark, sf).collect()))
    b = sorted(map(tuple, Q.q_streaming_windowed_zonal(spark, sf).collect()))
    assert a == b and len(a) > 0

    src = Q.ensure_stream_events_fixture(spark, sf)
    late_seen = 0
    for part in range(1, 6):
        pdf = pd.read_parquet(os.path.join(src, f"batch_{part}.parquet"))
        k = pdf["event_id"].to_numpy(np.int64)
        secs = (k * Q._STREAM_TS_MULT) % Q._STREAM_TS_MOD
        # a late row's event time belongs to an EARLIER 15-min slice
        late_seen += int((np.minimum(secs // 900, 5) < part).sum())
    assert late_seen > 0
