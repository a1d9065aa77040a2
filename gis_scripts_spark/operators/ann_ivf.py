"""IVF (inverted-file) ANN over embedding columns: distributed k-means
coarse quantizer + list-probed exact re-rank.

Training-data-pipeline operator (the second ANN scale path next to the
LSH-bucketed one in ``similarity.py``; the reference has no embedding
surface — nearest analogue is its kNN interpolation,
local_match.py:120-168). The classic IVF shape: a small coarse codebook
(n_lists centroids, trained by Lloyd's k-means) partitions the corpus into
inverted lists; a query probes only its ``nprobe`` nearest lists and
re-ranks those candidates exactly.

Scale shape (the part that matters at 10^9+ vectors):
- TRAINING touches a bounded sample and every cross-executor byte is a
  partial aggregate: assignment is an Arrow-batched argmax against the
  BROADCAST codebook (n_lists x dim floats, KBs-MBs), the centroid update
  is ``posexplode -> groupBy(list, pos).agg(sum, count)`` — a map-side
  combinable HashAggregate whose post-shuffle size is exactly
  n_lists x dim scalars regardless of input rows; only that codebook-sized
  frame ever reaches the driver.
- SEARCH ships each corpus vector through exactly ONE Exchange (the
  ``_list``-keyed cogroup — on a production layout the index table is
  bucket-written by ``_list`` so even that shuffle disappears), queries
  replicate nprobe times (a small constant), scoring is one float64 BLAS
  matmul per list (the cosine_topk kernel shape, blocked by list), and
  the top-k window runs over (qid, pid, sim) SCALARS — vectors never
  enter the rank Exchange (plan gate in tests/test_plans.py).
- Unlike LSH, lists partition the corpus (each candidate lives in exactly
  one list), so the candidate stream needs no pair-dedup stage at all.

``nprobe >= n_lists`` probes every list, making the result EXACTLY the
brute-force cosine top-k — that equivalence is both a pytest gate and the
driver query's full DuckDB oracle (ann_ivf_top3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType



def _unit_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return m / n


def train_ivf(
    df: DataFrame,
    n_lists: int,
    vec: str = "embedding",
    n_iters: int = 8,
    sample_fraction: float | None = None,
    seed: int = 11,
) -> np.ndarray:
    """Lloyd k-means on the unit sphere (spherical k-means — the right
    quantizer for cosine similarity): returns (n_lists, dim) unit-norm
    centroids.

    Deterministic init: the ``n_lists`` vectors with the smallest
    xxhash64 of their serialized value (a seedable uniform draw that needs
    no monotonic ids; ``orderBy(hash).limit(k)`` is a top-k, not a global
    sort). Each iteration runs two bounded-output jobs: the argmax
    assignment (broadcast codebook, Arrow batches) and the per-(list, dim)
    partial-sum update whose result — n_lists x dim scalars — is the only
    thing collected. Empty lists keep their previous centroid (standard
    Lloyd degeneracy handling, deterministic)."""
    vecs = df.select(F.col(vec).alias("_v"))
    if sample_fraction is not None:
        vecs = vecs.sample(fraction=sample_fraction, seed=seed)
    vecs = vecs.select(F.transform("_v", lambda x: x.cast("double")).alias("_v")).persist()
    try:
        init = (
            vecs.withColumn("_h", F.xxhash64(F.to_json(F.struct("_v")), F.lit(seed)))
            .orderBy("_h")
            .limit(n_lists)
            .select("_v")
            .toPandas()
        )
        cents = _unit_rows(np.stack(init["_v"].to_numpy()).astype(np.float64))
        dim = cents.shape[1]
        for _ in range(n_iters):
            assign = _argmax_list_udf(cents)
            sums = (
                vecs.select(assign(F.col("_v")).alias("_list"), F.posexplode("_v").alias("_pos", "_x"))
                .groupBy("_list", "_pos")
                .agg(F.sum("_x").alias("_s"), F.count(F.lit(1)).alias("_n"))
                .toPandas()
            )
            new = cents.copy()
            counts = np.zeros(len(cents), dtype=np.int64)
            acc = np.zeros_like(cents)
            for li, pos, s, n in sums.itertuples(index=False):
                acc[int(li), int(pos)] = s
                counts[int(li)] = n
            nz = counts > 0
            new[nz] = _unit_rows(acc[nz] / counts[nz, None])
            if np.allclose(new, cents, atol=1e-12):
                cents = new
                break
            cents = new
        assert cents.shape == (n_lists, dim)
        return cents
    finally:
        vecs.unpersist(False)


def _argmax_list_udf(centroids: np.ndarray):
    """Arrow-batched nearest-centroid assignment (cosine = max dot on the
    unit sphere; codebook rides the closure -> broadcast once per task)."""
    cT = np.ascontiguousarray(centroids.T)

    @F.pandas_udf(IntegerType())
    def assign(v: pd.Series) -> pd.Series:
        m = _unit_rows(np.stack(v.to_numpy()).astype(np.float64))
        return pd.Series(np.argmax(m @ cT, axis=1).astype(np.int32))

    return assign


def _probe_lists_udf(centroids: np.ndarray, nprobe: int):
    """Top-``nprobe`` nearest centroid ids per query vector (array<int>)."""
    cT = np.ascontiguousarray(centroids.T)
    k = min(nprobe, cT.shape[1])

    @F.pandas_udf(ArrayType(IntegerType()))
    def probes(v: pd.Series) -> pd.Series:
        m = _unit_rows(np.stack(v.to_numpy()).astype(np.float64))
        sims = m @ cT
        # deterministic: argsort on (-sim, list_id); lists are few, a full
        # sort of n_lists scalars per row is cheap and stable
        order = np.argsort(-sims, axis=1, kind="stable")[:, :k]
        return pd.Series(list(order.astype(np.int32)))

    return probes


def assign_lists(
    df: DataFrame, centroids: np.ndarray, vec: str = "embedding", out: str = "_list"
) -> DataFrame:
    """Index-build step: tag every row with its inverted-list id. At
    production scale the result is bucket-written by ``out`` so searches
    join shuffle-free; here it feeds the join directly."""
    return df.withColumn(out, _argmax_list_udf(centroids)(F.col(vec)))


def ivf_topk(
    df: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec: str = "embedding",
    n_lists: int = 8,
    nprobe: int = 2,
    centroids: np.ndarray | None = None,
    queries_df: DataFrame | None = None,
    n_iters: int = 8,
    seed: int = 11,
) -> DataFrame:
    """Approximate cosine top-k via IVF probing; exact when
    ``nprobe >= n_lists`` (every list probed = brute force).

    Returns (query_id, neighbor_id, rank), rank by (sim desc, neighbor_id)
    — the same deterministic contract as ``cosine_topk``/``lsh_topk``.
    Self-matches are excluded when the corpus serves as its own query set.
    """
    if centroids is None:
        centroids = train_ivf(df, n_lists, vec=vec, n_iters=n_iters, seed=seed)
    exclude_self = queries_df is None
    qs = queries_df if queries_df is not None else df

    base = assign_lists(df, centroids, vec=vec).select(
        F.col(id_col).alias("_pid"), F.col(vec).alias("_pv"), "_list"
    )
    q = qs.select(
        F.col(id_col).alias("_qid"),
        F.col(vec).alias("_qv"),
        _probe_lists_udf(centroids, nprobe)(F.col(vec)).alias("_probes"),
    ).select("_qid", "_qv", F.explode("_probes").alias("_list"))

    # Per-list scoring is ONE float64 BLAS matmul per (list) cogroup — the
    # same blocked-BLAS kernel shape as cosine_topk, blocked by inverted
    # list instead of by hash. (A first cut computed the dot product with
    # zip_with/aggregate Column expressions on the joined pairs: the
    # higher-order functions evaluate interpreted per ELEMENT per pair —
    # measured 53 s for 4M pairs at dim 64 where this kernel takes ~2 s.)
    # Each kernel emits <= k rows per query per probed list (the global
    # top-k is a subset of the union, because lists PARTITION the corpus),
    # so the rank window's input is bounded at nprobe*k rows/query and its
    # Exchange carries (qid, pid, sim) scalars only.
    qid_type = qs.schema[id_col].dataType
    pid_type = df.schema[id_col].dataType
    from pyspark.sql.types import DoubleType, StructField, StructType

    part_schema = StructType(
        [
            StructField("_qid", qid_type),
            StructField("_pid", pid_type),
            StructField("_sim", DoubleType()),
        ]
    )
    kk = int(k)
    excl = bool(exclude_self)

    def list_topk(qdf: pd.DataFrame, cdf: pd.DataFrame) -> pd.DataFrame:
        if len(qdf) == 0 or len(cdf) == 0:
            return pd.DataFrame({"_qid": [], "_pid": [], "_sim": []})
        qm = _unit_rows(np.stack(qdf["_qv"].to_numpy()).astype(np.float64))
        cm = _unit_rows(np.stack(cdf["_pv"].to_numpy()).astype(np.float64))
        qid_all = qdf["_qid"].to_numpy()
        pid = cdf["_pid"].to_numpy()
        # stable (sim desc, pid asc) tie-break: sort candidate columns by
        # pid once, then stable argsort on -sim
        order_p = np.argsort(pid, kind="mergesort")
        cm = cm[order_p]
        pid = pid[order_p]
        nc = len(pid)
        m = min(kk, nc)
        # BLOCK over queries: the full (nq, nc) sim matrix is O(nq*nc)
        # memory — at 2M vectors / 64 lists a single cogroup would
        # materialize 31k x 31k x 8B = 7.7 GB and stall the executor
        # (measured: the 2M scaling sweep hung here). Chunks bound the
        # live matrix to ~256 MB; each chunk's top-k is final because
        # rows are independent.
        q_chunk = max(1, int(32_000_000 // max(nc, 1)))
        outs = []
        for s in range(0, len(qid_all), q_chunk):
            sims = qm[s : s + q_chunk] @ cm.T  # (chunk, nc)
            qid = qid_all[s : s + q_chunk]
            if excl:
                sims[qid[:, None] == pid[None, :]] = -np.inf
            # stable argsort on pid-ordered columns keeps the exact
            # (sim desc, pid asc) tie contract the full oracle pins
            # (argpartition would pick arbitrarily among boundary ties)
            top = np.argsort(-sims, axis=1, kind="stable")[:, :m]
            top_pid = pid[top]
            tsim = np.take_along_axis(sims, top, axis=1)
            keep = np.isfinite(tsim)
            cnt = keep.sum(axis=1)
            outs.append(pd.DataFrame(
                {
                    "_qid": np.repeat(qid, cnt),
                    "_pid": top_pid[keep],
                    "_sim": tsim[keep],
                }
            ))
        return pd.concat(outs, ignore_index=True)

    scored = (
        q.groupBy("_list")
        .cogroup(base.groupBy("_list"))
        .applyInPandas(list_topk, part_schema)
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("_sim"), F.asc("_pid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            F.col("_pid").alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
        )
    )
