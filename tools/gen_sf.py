"""Generate an sf1.0-SHAPED replica of the driver's synthetic testdata for
round-6 profiling (measurement only — the driver's own testdata under
/root/testdata is read-only and its generator is not public).

Marginals are matched to /root/testdata/sf0.1 scaled by `mult` (default 10x):
table row counts, the 31-word document vocabulary and doc-length range,
language/source mixes, unit-norm 64-dim embeddings with uniform labels,
events over the same 30-day window with 10x the users, TPC-H-ish key ranges.

Usage: python tools/gen_sf.py [out_dir] [mult] [seed]
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata_r6/sf1.0"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)

    # fixed-size dims: copy verbatim
    for t in ("region", "nation"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

    n_cust = 15000 * mult
    n_supp = 1000 * mult
    n_part = 20000 * mult
    n_ord = 150000 * mult
    n_li = 600000 * mult
    n_ev = 100000 * mult
    n_users = 1500 * mult
    n_doc = 5000 * mult
    n_emb = 2000 * mult

    segs = ["FURNITURE", "MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"]
    pd.DataFrame({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": np.array(segs)[rng.integers(0, 5, n_cust)],
    }).to_parquet(f"{out}/customer.parquet", index=False)

    pd.DataFrame({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }).to_parquet(f"{out}/supplier.parquet", index=False)

    adjs = ["large", "hot", "small", "cold", "red", "blue", "green", "shiny"]
    nouns = ["ring", "bolt", "nut", "gear", "pipe", "rod", "cap", "disk"]
    types = ["LARGE", "ECONOMY", "STANDARD", "SMALL", "MEDIUM", "PROMO"]
    pd.DataFrame({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [f"{adjs[i % 8]} {nouns[(i // 8) % 8]}" for i in range(n_part)],
        "p_brand": [f"Brand#{int(b)}" for b in rng.integers(1, 26, n_part)],
        "p_type": np.array(types)[rng.integers(0, len(types), n_part)],
        "p_size": rng.integers(1, 51, n_part),
        "p_retailprice": np.round(900.0 + np.arange(n_part) * 0.1 % 1000, 2),
    }).to_parquet(f"{out}/part.parquet", index=False)

    odate = (np.datetime64("1995-01-01") +
             rng.integers(0, 2500, n_ord).astype("timedelta64[D]"))
    pd.DataFrame({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(["O", "F", "P"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(900, 450000, n_ord), 2),
        "o_orderdate": odate.astype("datetime64[us]"),
        "o_orderpriority": np.array([
            "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
        ])[rng.integers(0, 5, n_ord)],
    }).to_parquet(f"{out}/orders.parquet", index=False)

    sdate = (np.datetime64("1995-01-01") +
             rng.integers(0, 2500, n_li).astype("timedelta64[D]"))
    pd.DataFrame({
        "l_orderkey": rng.integers(0, n_ord, n_li),
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": sdate.astype("datetime64[us]"),
    }).to_parquet(f"{out}/lineitem.parquet", index=False)

    ts = (np.datetime64("2024-01-01") +
          np.sort(rng.integers(0, 30 * 86400 * 10**6, n_ev)).astype("timedelta64[us]"))
    etypes = np.array(["signup", "purchase", "view", "click", "error"])
    pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": ts,
        "user_id": rng.integers(0, n_users, n_ev),
        "event_type": etypes[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }).to_parquet(f"{out}/events.parquet", index=False)

    # documents: bags of VOCAB words, 10..100 words, ~0.3% exact copies,
    # plus runs of near-dups arising naturally from the tiny vocabulary.
    lens = rng.integers(10, 101, n_doc)
    word_ids = rng.integers(0, len(VOCAB), int(lens.sum()))
    offs = np.concatenate([[0], np.cumsum(lens)])
    varr = np.array(VOCAB)
    texts = [" ".join(varr[word_ids[offs[i]:offs[i + 1]]]) for i in range(n_doc)]
    dup_idx = rng.choice(n_doc, n_doc // 300, replace=False)
    for i in dup_idx:
        texts[i] = texts[(i + 1) % n_doc]
    langs = np.array(["en", "zh", "es", "fr", "de"])[
        rng.choice(5, n_doc, p=[0.41, 0.15, 0.15, 0.15, 0.14])]
    pd.DataFrame({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": langs,
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }).to_parquet(f"{out}/documents.parquet", index=False)

    E = rng.standard_normal((n_emb, 64)).astype(np.float32)
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(list(E), type=pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb).astype(np.int32)),
    })
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    print(f"wrote {out} mult={mult} seed={seed}")


if __name__ == "__main__":
    main()
