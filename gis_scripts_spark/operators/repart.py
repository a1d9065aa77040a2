"""Scale-adaptive scan spreading (guide §2.5 "input skew" / §6).

Small-bytes-but-compute-heavy tables (a 6 MB parquet of 50k documents, an
embedding table of 20k x 64 floats) arrive as ONE scan partition under
``spark.sql.files.maxPartitionBytes`` — and every per-row-expensive stage
planned on top of the scan (Arrow UDFs, shingle explodes) then runs on a
single core no matter how many the host has. `spread` repartitions ONLY
when the scan has fewer partitions than the session's parallelism, so at
real scale (thousands of input splits) it is a no-op and no shuffle is
added; at bench scale it is one tiny (<= MBs) exchange that unlocks every
core. Keyed by a deterministic column (never rand() — SPARK-38388).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def slots(spark_or_df) -> int:
    """The session's task-slot count (published by session.get_spark as
    spark.graft.slots; falls back to defaultParallelism). The right width
    for small-row-count compute-heavy stages, where 2x-slots widths only
    double per-task fixed overhead."""
    spark = getattr(spark_or_df, "sparkSession", spark_or_df)
    try:
        return int(spark.conf.get("spark.graft.slots"))
    except Exception:
        return spark.sparkContext.defaultParallelism


def spread(df: DataFrame, *keys: str, parallelism: int | None = None) -> DataFrame:
    """Repartition `df` to the session's SLOT count iff its current plan
    yields fewer partitions — a no-op on well-split inputs."""
    p = parallelism if parallelism is not None else slots(df)
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        n = 0
    if n >= p:
        return df
    if keys:
        return df.repartition(p, *keys)
    return df.repartition(p)
