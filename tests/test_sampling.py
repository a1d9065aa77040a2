"""Deterministic sampling: content-keyed, stable under repartitioning."""

from gis_scripts_spark.operators import sampling


def test_balance_classes_counts_and_determinism(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = sampling.balance_classes(ev, "event_type", "event_id", 20)
    pdf = out.select("event_type", "event_id").toPandas()
    assert (pdf.groupby("event_type").size() <= 20).all()
    # stable under repartitioning (content-keyed, not layout-keyed)
    out2 = sampling.balance_classes(ev.repartition(13), "event_type", "event_id", 20)
    assert sorted(map(tuple, out2.select("event_type", "event_id").collect())) == sorted(
        map(tuple, pdf.itertuples(index=False))
    )


def test_deterministic_sample_partition_invariance(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = sampling.deterministic_sample(ev, "event_id", 10).select("event_id")
    b = sampling.deterministic_sample(ev.repartition(7), "event_id", 10).select("event_id")
    sa = sorted(r[0] for r in a.collect())
    sb = sorted(r[0] for r in b.collect())
    assert sa == sb
    n = ev.count()
    assert 0.03 * n < len(sa) < 0.25 * n  # roughly 1/10


def test_balance_classes_pretopk_equals_plain_window(spark):
    """The integer-key map-side top-k prefilter must be invisible: same
    rows as the pure window formulation (optimization-round internals)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").repartition(9)
    fast = sampling.balance_classes(ev, "event_type", "event_id", 50)
    h = F.md5(F.col("event_id").cast("string"))
    w = Window.partitionBy("event_type").orderBy(h, F.col("event_id"))
    plain = (
        ev.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= 50)
        .drop("_rk")
    )
    got = sorted(map(tuple, fast.select("event_type", "event_id").collect()))
    want = sorted(map(tuple, plain.select("event_type", "event_id").collect()))
    assert got == want
