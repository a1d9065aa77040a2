"""Physical-plan quality gates (SURVEY.md §7.4): column pruning keeps the
fat `bytes` column out of metadata-only plans and out of every shuffle;
filters push down to the parquet scan; the AOI cover join broadcasts."""

import re

import pytest
from pyspark.sql import functions as F

from gis_scripts_spark.operators import pip_join, tile_assign
from gis_scripts_spark.sources import synth


@pytest.fixture(scope="module")
def images_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "images")
    synth.images_df(spark, 60, parts=2).write.parquet(p)
    return p


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_metadata_query_prunes_bytes(spark, images_parquet):
    df = spark.read.parquet(images_parquet)
    q = df.groupBy("fmt").agg(F.count(F.lit(1)).alias("n"), F.avg("w").alias("aw"))
    plan = _plan(q)
    scan_schema = re.search(r"ReadSchema: (.*)", plan).group(1)
    assert "bytes" not in scan_schema, scan_schema
    assert "fmt" in scan_schema and "w" in scan_schema


def test_filter_pushdown_reaches_scan(spark, images_parquet):
    df = spark.read.parquet(images_parquet).filter(F.col("w") == 64).select("image_id")
    plan = _plan(df)
    m = re.search(r"PushedFilters: \[(.*)\]", plan)
    assert m and "w" in m.group(1), plan[:2000]


def test_pip_join_broadcasts_cover_and_keeps_bytes_out_of_shuffle(spark, images_parquet):
    images = spark.read.parquet(images_parquet)
    polys = synth.aoi_polygons_df(spark)
    keys = tile_assign.assign_tiles(images, s2_level=None).select(
        "image_id", "lon", "lat", "quadkey"
    )
    joined = pip_join.pip_join(keys, polys, z=7)
    agg = joined.groupBy("poly_id").agg(F.count(F.lit(1)).alias("n"))
    plan = _plan(agg)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # every Exchange in the plan must be bytes-free
    for ex in re.findall(r"Exchange [^\n]*", plan):
        assert "bytes" not in ex, ex
    scan_schema = re.search(r"ReadSchema: (.*)", plan).group(1)
    assert "bytes" not in scan_schema  # pruned at the source too


def test_match_pair_stats_bytes_free(spark, images_parquet):
    """SURVEY §7.4 invariant on the histogram-match pipeline: the pair-
    window stats plan must not carry image bytes through ANY Exchange
    (the window list broadcasts onto the image scan; only stat rows
    shuffle)."""
    from gis_scripts_spark.raster import match

    images = spark.read.parquet(images_parquet)
    stats = match.overlap_pair_stats(images, z=10)
    plan = _plan(stats)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    for ex in re.findall(r"Exchange [^\n]*", plan):
        assert "bytes" not in ex, ex


def test_knn_shuffles_only_keys(spark, images_parquet):
    from gis_scripts_spark.operators import knn

    images = spark.read.parquet(images_parquet)
    out = knn.knn_join(
        images, images, k=3, z=4, point_id="image_id", query_id="image_id",
        exclude_self=True, initial_r=2,
    )
    plan = _plan(out)
    for ex in re.findall(r"Exchange [^\n]*", plan):
        assert "bytes" not in ex, ex


def test_coverage_join_wkb_never_in_exchange(spark, images_parquet):
    """Round-3 hygiene gate: the coverage_join plan must not ship polygon
    WKB through ANY Exchange (ids-only explode + dedup; WKB re-joined
    map-side via the broadcast candidate list)."""
    import pandas as pd

    from gis_scripts_spark.geom import wkb as wkb_mod
    from gis_scripts_spark.operators import coverage_join as cj
    from gis_scripts_spark.raster.match import RES_DEG

    imgs = spark.read.parquet(images_parquet)
    fp = imgs.select(
        "image_id",
        F.udf(lambda lon, lat: bytearray(wkb_mod.bbox_to_wkb(
            lon, lat, lon + 64 * RES_DEG, lat + 64 * RES_DEG)), "binary")(
            F.col("lon"), F.col("lat")).alias("wkb"),
    )
    rects = spark.createDataFrame(pd.DataFrame({
        "aoi_id": ["a0", "a1"],
        "x_min": [-20.0, 10.0], "y_min": [-20.0, 10.0],
        "x_max": [20.0, 50.0], "y_max": [20.0, 50.0],
    }))
    out = cj.coverage_join(fp, rects, z=5)
    plan = _plan(out)
    for ex in re.findall(r"Exchange [^\n]*", plan):
        assert "wkb" not in ex, ex
    assert out.count() >= 0  # plan executes


def test_cluster_labels_plan_bounded(spark):
    """Round-4 gate (VERDICT r3 #1): the label-propagation loop must
    checkpoint each round — without it the returned plan nested every
    round's plan (8,385 lines / 474 Exchanges after ~6 rounds). With
    lineage truncated to a LogicalRDD leaf the final plan is a constant
    few-line projection regardless of component depth."""
    import pandas as pd

    from gis_scripts_spark.operators import dedup

    # a 12-node path needs ~11 propagation rounds — deep enough that an
    # un-checkpointed loop would blow well past the ceiling below
    pairs = pd.DataFrame({"id_a": list(range(11)), "id_b": list(range(1, 12))})
    out = dedup.cluster_pairs_distributed(spark.createDataFrame(pairs), max_iters=30)
    plan = _plan(out)
    n_lines = plan.count("\n")
    n_exchanges = len(re.findall(r"Exchange ", plan))
    assert n_lines < 200, f"plan not bounded: {n_lines} lines"
    assert n_exchanges <= 2, f"plan not bounded: {n_exchanges} Exchanges"
    assert "Scan ExistingRDD" in plan or "LogicalRDD" in plan, plan[:500]


def test_lsh_candidate_stage_embeddings_never_in_exchange(spark):
    """r4 verdict directive #2 gate (mirror of the coverage_join WKB gate):
    the lsh_topk CANDIDATE stage must be ids-only — the embedding array
    must not appear in the Input of ANY Exchange (shuffle or broadcast).
    The vectors are re-joined once afterwards for the exact re-rank."""
    import pandas as pd

    from gis_scripts_spark.operators import similarity

    rng = __import__("numpy").random.default_rng(3)
    pdf = pd.DataFrame({
        "vec_id": range(50),
        "embedding": [rng.standard_normal(16).tolist() for _ in range(50)],
    })
    df = spark.createDataFrame(pdf)
    cand = similarity.lsh_candidates(df, dim=16, n_planes=6, n_tables=3)
    plan = _plan(cand)
    # formatted mode: each "(N) Exchange" block lists its schema on the
    # following "Input [k]: [...]" line — gate on that, not just the
    # partitioning-keys summary line
    for block in re.findall(r"\(\d+\) (?:Broadcast)?Exchange[^\n]*\nInput[^\n]*", plan):
        assert "embedding" not in block and "_pv" not in block and "_qv" not in block, block
    assert cand.count() >= 0  # plan executes
