"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

Training-data-pipeline operator (not in the reference, which has no
embedding surface; nearest analogue is its kNN-style interpolation). The
brute-force path stays entirely JVM-side (higher-order array functions —
zip_with/aggregate — inside whole-stage codegen, no Python). The scale path
buckets by random-hyperplane LSH signatures so candidate generation is an
equi-join instead of a cross join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def with_norm(df: DataFrame, vec: str = "embedding", out: str = "_norm") -> DataFrame:
    v = F.transform(F.col(vec), lambda x: x.cast("double"))
    return df.withColumn(out, F.sqrt(_dot(v, v)))


def cosine_topk(
    df: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec: str = "embedding",
    queries_df: DataFrame | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k via broadcast candidate matrix +
    per-batch BLAS matmul inside mapInPandas.

    Returns (query_id, neighbor_id, rank), rank ordered by (sim desc,
    neighbor_id) — deterministic tie-break. The candidate matrix is
    broadcast (fits executor memory up to ~10^7×128 float32); beyond that
    use `lsh_topk` (bucketed candidates) — the IVF-style scale path.
    """
    spark = df.sparkSession
    cand_pdf = df.select(id_col, vec).toPandas().sort_values(id_col)
    cand_ids = cand_pdf[id_col].to_numpy()
    m = np.stack([np.asarray(v, np.float64) for v in cand_pdf[vec]])
    m_norm = m / np.linalg.norm(m, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(cand_ids)
    b_mat = spark.sparkContext.broadcast(m_norm)

    qs = queries_df if queries_df is not None else df
    qid_type = qs.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("query_id", qid_type),
            StructField("neighbor_id", qid_type),
            StructField("rank", IntegerType()),
        ]
    )

    def run(batches):
        ids = b_ids.value
        mat = b_mat.value
        for pdf in batches:
            q = np.stack([np.asarray(v, np.float64) for v in pdf[vec]])
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ mat.T  # (nq, nc) BLAS
            qids = pdf[id_col].to_numpy()
            # exclude self by id
            out_q, out_n, out_r = [], [], []
            for row_i in range(len(qids)):
                s = sims[row_i]
                mask_self = ids == qids[row_i]
                s = np.where(mask_self, -np.inf, s)
                # top-k by (sim desc, id asc): ids pre-sorted + stable sort
                order = np.argsort(-s, kind="stable")[:k]
                order = order[np.isfinite(s[order])]
                out_q.extend([qids[row_i]] * len(order))
                out_n.extend(ids[order])
                out_r.extend(range(1, len(order) + 1))
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "rank": np.asarray(out_r, np.int32)}
            )

    return qs.select(id_col, vec).mapInPandas(run, out_schema)


def cosine_topk_sql(
    df: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec: str = "embedding",
    queries_df: DataFrame | None = None,
) -> DataFrame:
    """Pure-SQL variant (higher-order array functions + window) — no Python
    at all; kept for plan comparisons and as the no-broadcast fallback."""
    pts = with_norm(df.select(F.col(id_col).alias("_pid"), F.col(vec).alias("_pv")), "_pv", "_pn")
    qs = queries_df if queries_df is not None else df
    qrs = with_norm(qs.select(F.col(id_col).alias("_qid"), F.col(vec).alias("_qv")), "_qv", "_qn")

    pairs = qrs.crossJoin(pts).filter(F.col("_qid") != F.col("_pid"))
    qv = F.transform(F.col("_qv"), lambda x: x.cast("double"))
    pv = F.transform(F.col("_pv"), lambda x: x.cast("double"))
    sim = (_dot(qv, pv) / (F.col("_qn") * F.col("_pn"))).alias("_sim")
    pairs = pairs.select(F.col("_qid"), F.col("_pid"), sim)
    w = Window.partitionBy("_qid").orderBy(F.desc("_sim"), F.asc("_pid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            F.col("_pid").alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def lsh_signature_udf(dim: int, n_planes: int = 16, seed: int = 7):
    """Random-hyperplane (SimHash) signature for cosine LSH: sign pattern of
    `n_planes` fixed seeded projections, packed into an int64 bucket key."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    @F.pandas_udf(LongType())
    def sig(vec: pd.Series) -> pd.Series:
        m = np.stack(vec.to_numpy())  # (batch, dim)
        bits = (m.astype(np.float64) @ planes) >= 0.0
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series(bits @ weights)

    return sig


def lsh_topk(
    df: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate cosine top-k: `n_tables` independent hyperplane LSH
    buckets, candidates = same-bucket pairs in any table (deduped via
    min-table report-once), exact re-rank. Recall grows with n_tables."""
    base = with_norm(df.select(F.col(id_col).alias("_pid"), F.col(vec).alias("_pv")), "_pv", "_pn")
    bucketed = None
    for t in range(n_tables):
        sig = lsh_signature_udf(dim, n_planes, seed=101 + t)
        b = base.withColumn("_bucket", sig(F.col("_pv"))).withColumn("_table", F.lit(t))
        bucketed = b if bucketed is None else bucketed.unionByName(b)

    left = bucketed.select(
        F.col("_pid").alias("_qid"), F.col("_pv").alias("_qv"), F.col("_pn").alias("_qn"),
        "_bucket", "_table",
    )
    cand = left.join(bucketed, ["_bucket", "_table"]).filter(F.col("_qid") != F.col("_pid"))
    # report-once across tables: keep the pair only in its smallest table id
    w_first = Window.partitionBy("_qid", "_pid").orderBy("_table")
    cand = cand.withColumn("_rn", F.row_number().over(w_first)).filter(F.col("_rn") == 1)

    qv = F.transform(F.col("_qv"), lambda x: x.cast("double"))
    pv = F.transform(F.col("_pv"), lambda x: x.cast("double"))
    sim = (_dot(qv, pv) / (F.col("_qn") * F.col("_pn"))).alias("_sim")
    pairs = cand.select("_qid", "_pid", sim)
    w = Window.partitionBy("_qid").orderBy(F.desc("_sim"), F.asc("_pid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            F.col("_pid").alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
