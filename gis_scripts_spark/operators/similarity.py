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
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType


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
    n_blocks: int = 8,
    q_chunks: int = 4,
) -> DataFrame:
    """Exact brute-force cosine top-k, fully distributed block matmul —
    NO driver-side collect anywhere (the candidate table never leaves the
    executors).

    Block scheme (the classic blocked all-pairs shape): candidates hash to
    `n_blocks` blocks, queries hash to `q_chunks` chunks; each (block,
    chunk) task does one (nq/Q × nc/B) float64 BLAS matmul + vectorized
    stable top-k, emitting <= k rows per query per block; a final window
    merges the per-block top-k lists (input bounded at B·k rows/query).
    Communication is O(n·(B+Q)/BQ · BQ) = each vector replicated B or Q
    times — tune n_blocks so a block (~n/B vectors) fits executor memory;
    at 10^8+ vectors raise n_blocks or switch to `lsh_topk` (approximate,
    bucket-sparse).

    Returns (query_id, neighbor_id, rank), rank ordered by (sim desc,
    neighbor_id) — deterministic tie-break.
    """
    spark = df.sparkSession
    qs = queries_df if queries_df is not None else df
    qid_type = qs.schema[id_col].dataType
    local_schema = StructType(
        [
            StructField("query_id", qid_type),
            StructField("neighbor_id", qid_type),
            StructField("_sim", DoubleType()),
        ]
    )

    cand = df.select(
        F.col(id_col).alias("_cid"), F.col(vec).alias("_cv")
    ).withColumn("_blk", F.pmod(F.xxhash64(F.col("_cid")), F.lit(n_blocks)).cast("int"))
    # replicate candidates across query chunks / queries across blocks:
    # both replication factors are small constants, never data-sized
    qc_df = spark.range(q_chunks).select(F.col("id").cast("int").alias("_qc"))
    blk_df = spark.range(n_blocks).select(F.col("id").cast("int").alias("_blk"))
    cand_rep = cand.crossJoin(qc_df)
    q_rep = (
        qs.select(F.col(id_col).alias("_qid"), F.col(vec).alias("_qv"))
        .withColumn("_qc", F.pmod(F.xxhash64(F.col("_qid")), F.lit(q_chunks)).cast("int"))
        .crossJoin(blk_df)
    )

    def local_topk(queries: pd.DataFrame, candidates: pd.DataFrame) -> pd.DataFrame:
        if len(queries) == 0 or len(candidates) == 0:
            return pd.DataFrame({f.name: [] for f in local_schema.fields})
        candidates = candidates.sort_values("_cid", kind="mergesort")
        cids = candidates["_cid"].to_numpy()
        m = np.stack([np.asarray(v, np.float64) for v in candidates["_cv"]])
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        q = np.stack([np.asarray(v, np.float64) for v in queries["_qv"]])
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        qids = queries["_qid"].to_numpy()
        sims = q @ m.T  # (nq, nc) BLAS
        sims[qids[:, None] == cids[None, :]] = -np.inf  # exclude self by id
        kk = min(k, sims.shape[1])
        # stable argsort on -sim: candidate columns are id-sorted, so ties
        # break by neighbor_id ascending — the deterministic contract
        order = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        ssel = np.take_along_axis(sims, order, axis=1)
        keep = np.isfinite(ssel)
        cnt = keep.sum(axis=1)
        return pd.DataFrame(
            {
                "query_id": np.repeat(qids, cnt),
                "neighbor_id": cids[order[keep]],
                "_sim": ssel[keep],
            }
        )

    local = (
        q_rep.groupBy("_blk", "_qc")
        .cogroup(cand_rep.groupBy("_blk", "_qc"))
        .applyInPandas(local_topk, local_schema)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


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


def lsh_multi_signature_udf(dim: int, n_planes: int, n_tables: int, seed: int = 101):
    """All `n_tables` hyperplane signatures in ONE Arrow pass: returns
    array<long> of length n_tables (one packed bucket key per table), so
    the source is scanned once instead of once per table."""
    # per-table seeds identical to lsh_signature_udf(seed=seed+t) so the
    # buckets (hence results) match the per-table formulation exactly
    planes = np.hstack(
        [np.random.default_rng(seed + t).standard_normal((dim, n_planes)) for t in range(n_tables)]
    )
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @F.pandas_udf(ArrayType(LongType()))
    def sigs(vec: pd.Series) -> pd.Series:
        m = np.stack(vec.to_numpy()).astype(np.float64)  # (batch, dim)
        bits = (m @ planes) >= 0.0  # (batch, n_tables*n_planes)
        keys = bits.reshape(len(m), n_tables, n_planes) @ weights  # (batch, n_tables)
        return pd.Series(list(keys))

    return sigs


def lsh_candidates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
    n_tables: int = 4,
) -> DataFrame:
    """Candidate-pair generation for `lsh_topk` — IDS ONLY end to end
    (r4 verdict directive #2, mirroring the minhash band-join shape,
    dedup.py minhash_lsh_pairs_sql):

    - one scan computes all n_tables bucket keys per row (single Arrow
      UDF returning array<long>), then posexplode to (_pid, _table,
      _bucket) — the embedding array is dropped BEFORE any Exchange;
    - same-bucket self-join on (_bucket, _table) ships 3 small columns;
    - report-once across tables via groupBy(_qid,_pid).agg(min(_table))
      — map-side-combinable HashAggregate, no window sort.

    Returns (_qid, _pid) distinct candidate pairs (both directions kept:
    top-k is per-query, so (a,b) and (b,a) are both needed).
    """
    sigs = lsh_multi_signature_udf(dim, n_planes, n_tables)
    keyed = (
        df.select(F.col(id_col).alias("_pid"), sigs(F.col(vec)).alias("_sigs"))
        .select("_pid", F.posexplode("_sigs").alias("_table", "_bucket"))
    )
    left = keyed.select(F.col("_pid").alias("_qid"), "_table", "_bucket")
    cand = left.join(keyed, ["_bucket", "_table"]).filter(F.col("_qid") != F.col("_pid"))
    return (
        cand.groupBy("_qid", "_pid")
        .agg(F.min("_table").alias("_t"))
        .drop("_t")
    )


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
    buckets, candidates = same-bucket pairs in any table, exact re-rank.
    Recall grows with n_tables.

    Scale shape (r4 verdict #2): the candidate stage is ids-only
    (`lsh_candidates` — embeddings never enter an Exchange there; plan
    gate in tests/test_plans.py); vectors are re-joined ONCE onto the
    deduped pair list for the exact cosine re-rank, so the embedding
    payload crosses the wire exactly twice (once per pair side), not
    n_tables+1 times."""
    base = with_norm(df.select(F.col(id_col).alias("_pid"), F.col(vec).alias("_pv")), "_pv", "_pn")
    cand = lsh_candidates(df, id_col, vec, dim, n_planes, n_tables)

    qside = base.select(
        F.col("_pid").alias("_qid"), F.col("_pv").alias("_qv"), F.col("_pn").alias("_qn")
    )
    pairs = cand.join(qside, "_qid").join(base, "_pid")
    qv = F.transform(F.col("_qv"), lambda x: x.cast("double"))
    pv = F.transform(F.col("_pv"), lambda x: x.cast("double"))
    sim = (_dot(qv, pv) / (F.col("_qn") * F.col("_pn"))).alias("_sim")
    pairs = pairs.select("_qid", "_pid", sim)
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
