"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard (task-mandated first-class ops; the reference has
no text surface — its nearest analogue is the skip-if-done anti-join J7).

All hashing is derived from blake2b of the token bytes — deterministic
across partitions, parallelism levels and runs (no Python hash()
randomization, no partition-index dependence).

Scale shapes:
- exact: md5 groupBy — one shuffle, partial agg map-side.
- minhash: per-doc signature in one vectorized pandas UDF; LSH bands ->
  (id, band, band_hash) explode — IDS ONLY, the text/signature payload
  never rides the band explode or the self-join shuffle; candidates =
  self-join on the band key (equi-join, AQE-skew-safe) deduped report-once
  by min shared band (map-side partial agg); texts re-joined exactly once
  per surviving candidate pair for the exact-Jaccard verify.
- simhash: 64-bit signature; Hamming<=3 via 4x16-bit band blocking
  (pigeonhole: any pair within distance 3 shares an exact 16-bit quarter).
"""

from __future__ import annotations

import hashlib
import itertools
import os
import weakref

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

_MERSENNE = (1 << 61) - 1

# Invocation counter for plan-salting internal persists (the knn.py
# CacheManager-aliasing lesson): Spark's CacheManager is PLAN-keyed, so two
# calls of the same operator over the same input would alias one cache
# entry — the second call would silently read the first call's
# materialization (a cross-run result cache the bench rules forbid) and a
# deferred release from call 1 could drop call 2's data. A per-invocation
# literal column makes every persist plan unique; a weakref finalizer on
# the RETURNED frame unpersists as soon as the caller drops it.
_INVOKE_COUNTER = itertools.count()


def _salted_persist(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    tok = int((os.getpid() << 20) ^ next(_INVOKE_COUNTER))
    salted = df.withColumn("_salt", F.lit(tok)).persist()
    return salted.drop("_salt"), salted


def _finalize_unpersist(out: DataFrame, handles: list[DataFrame]) -> DataFrame:
    def _release(hs=tuple(reversed(handles))):
        for h in hs:
            try:
                h.unpersist(False)
            except Exception:
                pass  # session already stopped

    weakref.finalize(out, _release)
    return out


_TOKEN_CACHE: dict[str, int] = {}


def _token_hash(t: str) -> int:
    h = _TOKEN_CACHE.get(t)
    if h is None:
        h = _TOKEN_CACHE[t] = (
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big") >> 3
        )
        if len(_TOKEN_CACHE) > 1_000_000:  # bound worker memory
            _TOKEN_CACHE.clear()
    return h


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit hashes of tokens (blake2b, partition-independent;
    per-worker vocabulary cache — web text has Zipfian vocab, so the cache
    hit rate is near 1)."""
    return np.fromiter((_token_hash(t) for t in tokens), dtype=np.int64, count=len(tokens))


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    """Hashes of word n-gram shingles: per-token blake2b (cached) combined
    with a polynomial roll — vectorized, equivalent to hashing each shingle
    string but O(distinct tokens) in hashlib calls."""
    th = _token_hashes(text.split(" "))
    if n <= 1 or len(th) < n:
        return th
    B = np.int64(1099511628211)
    out = th[: len(th) - n + 1].copy()
    for i in range(1, n):
        out = (out * B + th[i : len(th) - n + 1 + i]) % _MERSENNE
    return out


def _shingles(text: str, n: int) -> list[str]:
    toks = text.split(" ")
    if n <= 1 or len(toks) < n:
        return toks
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


# ------------------------------------------------------------------- exact
def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(text_md5, canonical_id, n_copies) — hash-groupBy exact dedup."""
    return df.groupBy(F.md5(F.col(text_col)).alias("text_md5")).agg(
        F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_copies")
    )


# ----------------------------------------------------------------- minhash
def minhash_signature_udf(n_perm: int = 128, shingle_n: int = 3, seed: int = 13):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, n_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, n_perm, dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def sig(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            hs = _shingle_hashes(t, shingle_n)
            if len(hs) == 0:
                out.append([0] * n_perm)
                continue
            # (a*h + b) mod p, min over shingles, per permutation. NOTE:
            # a*h (both up to 2^61) wraps mod 2^64 in int64 BEFORE the
            # Mersenne reduction — deliberate and deterministic: the
            # composition (wrap-then-mod-p) is still a fixed seeded mixing
            # family, just not the textbook universal family. Collision
            # quality is asserted empirically (recall >= 0.9 vs the exact
            # Jaccard oracle in tests/test_dedup_text.py).
            with np.errstate(over="ignore"):
                vals = (a[:, None] * hs[None, :] + b[:, None]) % _MERSENNE
            out.append(vals.min(axis=1).tolist())
        return pd.Series(out)

    return sig


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
    threshold: float = 0.5,
    verify: bool = True,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash LSH,
    optionally verified with the exact shingle-set Jaccard.

    Returns (id_a, id_b, jaccard) when `verify` (default), else
    (id_a, id_b, est_jaccard). Report-once: a pair is emitted only from the
    FIRST band that matches (min band id, map-side partial agg).

    Scale shape (the SURVEY §7.4 invariant — fat payloads never enter a
    shuffle): the band explode and self-join carry (id, band, bhash) ONLY.
    At web scale the band-join shuffle is ids × bands, not text × bands; the
    document text (and signature, in the est path) is equi-joined back
    exactly once per SURVIVING candidate pair — a vanishing fraction of the
    corpus for near-dup-sparse web text."""
    rows_per_band = n_perm // bands
    sig = minhash_signature_udf(n_perm, shingle_n)
    base = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
    # the signature UDF is the expensive stage: make sure it runs wide even
    # when the source is a single small file (one-pass row-wise exchange —
    # corpus-size volume, nothing like the xbands band explode)
    sc = df.sparkSession.sparkContext
    if base.rdd.getNumPartitions() < sc.defaultParallelism:
        base = base.repartition(sc.defaultParallelism)
    base = base.withColumn("_sig", sig(F.col("_text")))

    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at("_sig", bi * rows_per_band + j + 1).cast("string")
                        for j in range(rows_per_band)
                    ],
                )
            ).alias("bhash"),
        )
        for bi in range(bands)
    ]
    # ids-only band table: the only thing the LSH self-join shuffles.
    # persist: both self-join sides read it, so the (expensive) signature
    # UDF runs ONCE per document; the cache is released when the caller
    # drops the returned DataFrame (weakref finalizer, as in knn_join) —
    # it holds only (id, band, bhash) rows, never text
    banded = base.withColumn("_band", F.explode(F.array(*band_cols))).select(
        "_id", F.col("_band.band").alias("band"), F.col("_band.bhash").alias("bhash")
    ).persist()

    left = banded.select(F.col("_id").alias("id_a"), "band", "bhash")
    right = banded.select(F.col("_id").alias("id_b"), "band", "bhash")
    cand = left.join(right, ["band", "bhash"]).filter(F.col("id_a") < F.col("id_b"))
    # report-once by min band: groupBy aggregates map-side (no window sort)
    pairs = cand.groupBy("id_a", "id_b").agg(F.min("band").alias("_first_band")).drop("_first_band")

    import weakref

    def _release(h=banded):
        try:
            h.unpersist(False)
        except Exception:
            pass  # session already stopped

    if not verify:
        # estimated jaccard from signature agreement (JVM-side zip_with);
        # signatures joined back once per surviving pair
        sig_a = base.select(F.col("_id").alias("id_a"), F.col("_sig").alias("_sa"))
        sig_b = base.select(F.col("_id").alias("id_b"), F.col("_sig").alias("_sb"))
        pairs = pairs.join(sig_a, "id_a").join(sig_b, "id_b")
        est = (
            F.aggregate(
                F.zip_with("_sa", "_sb", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, x: acc + x,
            ).cast("double")
            / F.lit(n_perm)
        ).alias("est_jaccard")
        out = pairs.select("id_a", "id_b", est)
        weakref.finalize(out, _release)
        return out

    # texts joined back once per surviving pair (never through the explode)
    txt = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    ta = txt.select(F.col("_id").alias("id_a"), F.col("_t").alias("_ta"))
    tb = txt.select(F.col("_id").alias("id_b"), F.col("_t").alias("_tb"))
    pairs = pairs.join(ta, "id_a").join(tb, "id_b")

    @F.pandas_udf("double")
    def jaccard(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.empty(len(ta))
        for i, (x, y) in enumerate(zip(ta, tb)):
            sa = set(_shingle_hashes(x, shingle_n).tolist())
            sb = set(_shingle_hashes(y, shingle_n).tolist())
            u = len(sa | sb)
            out[i] = len(sa & sb) / u if u else 0.0
        return pd.Series(out)

    out = pairs.select("id_a", "id_b", jaccard(F.col("_ta"), F.col("_tb")).alias("jaccard"))
    out = out.filter(F.col("jaccard") >= threshold)
    weakref.finalize(out, _release)
    return out


# ----------------------------------------------------------------- simhash
_MD5_CACHE: dict[str, int] = {}


def _md5_token_hashes(tokens: list[str]) -> np.ndarray:
    """64-bit token hashes as the first 8 bytes (big-endian) of md5 — the
    SQL-reproducible variant (DuckDB: ('0x' || substr(md5(w),1,16))::UBIGINT),
    enabling an exact ANSI-SQL oracle for the simhash pipeline."""
    out = np.empty(len(tokens), np.uint64)
    for i, t in enumerate(tokens):
        h = _MD5_CACHE.get(t)
        if h is None:
            h = _MD5_CACHE[t] = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
            if len(_MD5_CACHE) > 1_000_000:
                _MD5_CACHE.clear()
        out[i] = h
    return out


def simhash_udf(shingle_n: int = 1, hash_fn: str = "blake2b"):
    @F.pandas_udf(LongType())
    def sim(text: pd.Series) -> pd.Series:
        out = np.empty(len(text), np.int64)
        for i, t in enumerate(text):
            toks = _shingles(t, shingle_n)
            if hash_fn == "md5":
                hs = _md5_token_hashes(toks)
            else:
                hs = _token_hashes(toks).view(np.uint64)
            if len(hs) == 0:
                out[i] = 0
                continue
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            val = 0
            for j in range(64):
                if v[j] > 0:
                    val |= 1 << j
            out[i] = val - (1 << 64) if val >= (1 << 63) else val
        return pd.Series(out)

    return sim


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    shingle_n: int = 1,
    hash_fn: str = "blake2b",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming, blocked on
    16-bit quarters (pigeonhole-complete for max_hamming <= 3).

    `hash_fn='md5'` makes the token hash SQL-reproducible (DuckDB oracle).

    Returns (id_a, id_b, hamming)."""
    from gis_scripts_spark.operators.repart import spread

    sim = simhash_udf(shingle_n, hash_fn)
    # Two measured fixes from the optimization round's stage capture
    # (26.7 s at 50k docs, sf1.0):
    # - spread the scan: a single-file documents table plans the simhash
    #   UDF on ONE scan partition (24 s of the 26.7 was a 2-task stage);
    # - persist the signatures: the band self-join's two sides are separate
    #   subtrees, so without materialization the plan evaluates the UDF
    #   TWICE (the captured physical plan showed two Scan->ArrowEvalPython
    #   branches). 50k (id, int64) rows — KBs of storage, released by the
    #   caller dropping the frame (ContextCleaner), never crosses runs.
    base, _base_handle = _salted_persist(
        spread(df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t")), id_col)
        .select("_id", sim(F.col("_t")).alias("_sh"))
    )
    quarters = F.array(
        *[
            F.struct(
                F.lit(q).alias("q"),
                F.shiftright("_sh", 16 * q).bitwiseAND(F.lit(0xFFFF)).alias("qv"),
            )
            for q in range(4)
        ]
    )
    blocked = base.withColumn("_q", F.explode(quarters)).select(
        "_id", "_sh", F.col("_q.q").alias("q"), F.col("_q.qv").alias("qv")
    )
    left = blocked.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sa"), "q", "qv")
    right = blocked.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sb"), "q", "qv")
    # the hamming refine runs INSIDE the join stage, BEFORE the report-once
    # groupBy (the hamming_neardup_pairs lesson, re-measured here: at 50k
    # docs the 16-bit quarters collide quadratically — ~76M candidate rows,
    # a 387 MB Exchange — while true near-dups are a few hundred rows;
    # hamming is a function of the pair, so the filter commutes with the
    # dedup exactly and the groupBy exchange shrinks to the survivors).
    hamming = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    pairs = (
        left.join(right, ["q", "qv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
    )
    # report-once via groupBy (map-side partial agg), NOT a window
    # row_number (which would shuffle AND sort every candidate).
    out = pairs.groupBy("id_a", "id_b").agg(F.min("hamming").alias("hamming"))
    return _finalize_unpersist(out, [_base_handle])


def hamming_neardup_pairs(
    df: DataFrame,
    hash_col: str,
    id_col: str,
    max_hamming: int = 6,
) -> DataFrame:
    """Banded hamming-distance self-join on any int64 hash column
    (perceptual hashes, simhashes, fingerprints).

    The 64 bits are split into (max_hamming + 1) bands; two hashes within
    `max_hamming` must agree exactly on at least one band (pigeonhole), so
    the band equi-join is a COMPLETE candidate generator. Scale shape is
    the engine's standard: ids+hash-only band join (no payload columns in
    the Exchange), groupBy report-once (map-side combinable, no window
    sort), then one whole-stage-codegen bit_count refine.

    Returns (id_a, id_b, hamming) with id_a < id_b.
    """
    if not 0 <= max_hamming <= 16:
        raise ValueError("max_hamming must be in [0, 16]")
    n_bands = max_hamming + 1
    base_w, extra = divmod(64, n_bands)
    bands = []
    shift = 0
    for b in range(n_bands):
        width = base_w + (1 if b < extra else 0)
        bands.append((b, shift, (1 << width) - 1))
        shift += width
    base = df.select(F.col(id_col).alias("_id"), F.col(hash_col).alias("_h"))
    keys = F.array(
        *[
            F.struct(
                F.lit(b).alias("b"),
                F.shiftrightunsigned("_h", s).bitwiseAND(F.lit(m)).alias("bv"),
            )
            for b, s, m in bands
        ]
    )
    blocked = base.withColumn("_b", F.explode(keys)).select(
        "_id", "_h", F.col("_b.b").alias("b"), F.col("_b.bv").alias("bv")
    )
    left = blocked.select(F.col("_id").alias("id_a"), F.col("_h").alias("_ha"), "b", "bv")
    right = blocked.select(F.col("_id").alias("id_b"), F.col("_h").alias("_hb"), "b", "bv")
    # the bit_count refine runs INSIDE the join stage, BEFORE the
    # report-once shuffle: on uniform hashes the band join's candidate
    # volume is dominated by random collisions (occupancy n/2^width per
    # bucket => O(sum occupancy^2) pairs, almost all hamming > max_h), so
    # filtering map-side cuts the groupBy exchange from the full candidate
    # set to the true near-dup pairs — measured 2.6x end-to-end at 20M
    # hashes (BENCH/scaling_cluster.json `hamming`). hamming is a function
    # of the pair, so the filter commutes with the dedup exactly.
    hamming = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    pairs = (
        left.join(right, ["b", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs.groupBy("id_a", "id_b").agg(F.min("hamming").alias("hamming"))


def multiword_bands(n_bits: int, max_hamming: int) -> list[tuple[int, int, int]]:
    """(band, start_bit, width) layout for an n_bits hash split into
    (max_hamming + 1) contiguous bands — shared by the Spark operator and
    the DuckDB oracle SQL so both extract IDENTICAL band values. Global
    bit k lives in word k // 64 at in-word position k % 64 (LSB-first)."""
    n_bands = max_hamming + 1
    base_w, extra = divmod(n_bits, n_bands)
    width0 = base_w + (1 if extra else 0)
    if width0 > 64:
        raise ValueError(
            f"band width {width0} > 64: raise max_hamming (>= {n_bits // 64 - 1}) "
            "so each band value fits one int64 join key"
        )
    bands, s = [], 0
    for b in range(n_bands):
        w = base_w + (1 if b < extra else 0)
        bands.append((b, s, w))
        s += w
    return bands


def _mw_band_col(words: list, s: int, wd: int):
    """Column expression for bits [s, s+wd) of the multiword hash. A band
    of width <= 64 spans at most two adjacent words."""
    i, r = divmod(s, 64)
    lowbits = 64 - r
    if wd <= lowbits:
        v = F.shiftrightunsigned(words[i], r) if r else words[i]
        if wd < lowbits:
            v = v.bitwiseAND(F.lit((1 << wd) - 1))
        return v
    lo = F.shiftrightunsigned(words[i], r)  # all 64-r bits, zero-filled
    hi = words[i + 1].bitwiseAND(F.lit((1 << (wd - lowbits)) - 1))
    return lo.bitwiseOR(F.shiftleft(hi, lowbits))


def hamming_neardup_pairs_multiword(
    df: DataFrame,
    hash_col: str,
    id_col: str,
    max_hamming: int = 10,
    n_words: int = 4,
) -> DataFrame:
    """Banded hamming self-join on a MULTI-WORD hash column
    (``array<bigint>`` of length n_words = 64*n_words bits) — the
    documented scale path for image near-dup at 10^12 rows: a 64-bit
    pHash at useful thresholds (max_h ~ 10) gives ~6-bit bands and an
    occupancy explosion, while 256 bits at the same threshold keeps
    23-bit bands (occupancy n / 2^23). Same engine shape as the 64-bit
    version: ids+words-only band join, map-side bit_count refine INSIDE
    the join stage, groupBy report-once. Bands may span word boundaries;
    extraction is two shifts + an OR, all whole-stage codegen.

    Returns (id_a, id_b, hamming) with id_a < id_b.
    """
    if not 0 <= max_hamming <= 32:
        raise ValueError("max_hamming must be in [0, 32]")
    n_bits = 64 * n_words
    bands = multiword_bands(n_bits, max_hamming)
    wcols = [F.col(hash_col).getItem(i).alias(f"_w{i}") for i in range(n_words)]
    base = df.select(F.col(id_col).alias("_id"), *wcols)
    words = [F.col(f"_w{i}") for i in range(n_words)]
    wnames = [f"_w{i}" for i in range(n_words)]
    # pack (band index, band value) into ONE int64 join key when the band
    # value provably fits 57 bits (band count <= 33 < 64 needs 6 bits):
    # halves the join-key bytes in the exchange and makes hashing/probing a
    # single-long compare. Falls back to the two-column key for >=58-bit
    # bands (only reachable at n_words > 8).
    max_wd = max(wd for _, _, wd in bands)
    packed = max_wd <= 57
    if packed:
        keys = F.array(
            *[
                F.shiftleft(_mw_band_col(words, s, wd), 6).bitwiseOR(F.lit(b))
                for b, s, wd in bands
            ]
        )
        blocked = base.withColumn("_bk", F.explode(keys)).select("_id", "_bk")
        if max_wd <= 25:
            # 6 band bits + <=25 value bits fit an INT: half the key bytes
            # in the exchange, narrower hash/compare in the join build
            blocked = blocked.withColumn("_bk", F.col("_bk").cast("int"))
        join_cols = ["_bk"]
    else:
        keys = F.array(
            *[
                F.struct(F.lit(b).alias("b"), _mw_band_col(words, s, wd).alias("bv"))
                for b, s, wd in bands
            ]
        )
        blocked = base.withColumn("_b", F.explode(keys)).select(
            "_id", F.col("_b.b").alias("b"), F.col("_b.bv").alias("bv")
        )
        join_cols = ["b", "bv"]
    # ids-only band join + post-join word re-attach. The 64-bit pHash path
    # measured the OPPOSITE (map-side refine inside the join, r5): there
    # ~6-bit bands make random collisions the dominant volume, so carrying
    # the word through the exchange beat re-joining per candidate. Wide
    # (23-bit) bands invert the tradeoff — occupancy is n/2^23, candidates
    # are a sliver of the banded table — and carrying 4 words per exploded
    # row put a 464 MB exchange + 929 MB read in front of a few-hundred-
    # thousand-row candidate set (measured: 8.7 s wall, ~100 s executor in
    # the join stage alone). Shuffling (id, packed key) only is ~3x fewer
    # bytes; the distinct collapses per-band duplicates BEFORE the words
    # are fetched, so each surviving pair pays the 4-word xor exactly once.
    left = blocked.select(F.col("_id").alias("id_a"), *join_cols)
    right = blocked.select(F.col("_id").alias("id_b"), *join_cols)
    # scale safety: each join side is bands x n rows BY CONSTRUCTION, so a
    # broadcast is never right (Spark's size estimate through Generate can
    # undershoot badly enough to pick one — measured at bench scale: a
    # 1.1M-row driver-built HashedRelation). Pin a SHUFFLED hash join; both
    # sides are the same exploded table, so AQE writes the exchange once
    # and ReusedExchange serves the other side; per-partition builds are
    # bounded by the band-occupancy invariant.
    cand = (
        left.join(right.hint("shuffle_hash"), join_cols)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    wa = base.select(
        F.col("_id").alias("id_a"), *[F.col(w).alias(f"_a{i}") for i, w in enumerate(wnames)]
    )
    wb = base.select(
        F.col("_id").alias("id_b"), *[F.col(w).alias(f"_b{i}") for i, w in enumerate(wnames)]
    )
    hamming = sum(
        F.bit_count(F.col(f"_a{i}").bitwiseXOR(F.col(f"_b{i}"))) for i in range(n_words)
    )
    return (
        cand.join(wa, "id_a")
        .join(wb, "id_b")
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def multiword_band_sql(table: str, id_col: str, word_cols: list[str],
                       max_hamming: int) -> str:
    """DuckDB SQL emitting the SAME banded candidate join + refine as
    hamming_neardup_pairs_multiword over `table` (one row per hash,
    words nonnegative) — the oracle half of the shared band layout.
    Returns a SELECT producing (id_a, id_b, hamming)."""
    n_words = len(word_cols)
    bands = multiword_bands(64 * n_words, max_hamming)

    def band_expr(s: int, wd: int) -> str:
        i, r = divmod(s, 64)
        lowbits = 64 - r
        w = word_cols[i]
        if wd <= lowbits:
            e = f"({w} >> {r})" if r else w
            return f"({e} & {(1 << wd) - 1})" if wd < lowbits else e
        hi = f"({word_cols[i + 1]} & {(1 << (wd - lowbits)) - 1})"
        return f"(({w} >> {r}) | ({hi} * {1 << lowbits}))"

    banded = " UNION ALL ".join(
        f"SELECT {id_col} AS _id, {b} AS b, {band_expr(s, wd)} AS bv FROM {table}"
        for b, s, wd in bands
    )
    ham = " + ".join(
        f"bit_count(xor(ha.{w}, hb.{w}))" for w in word_cols
    )
    return f"""
SELECT c.id_a, c.id_b, MIN({ham}) AS hamming
FROM (SELECT DISTINCT a._id AS id_a, b._id AS id_b
      FROM ({banded}) a JOIN ({banded}) b
        ON a.b = b.b AND a.bv = b.bv AND a._id < b._id) c
JOIN {table} ha ON ha.{id_col} = c.id_a
JOIN {table} hb ON hb.{id_col} = c.id_b
GROUP BY c.id_a, c.id_b
HAVING MIN({ham}) <= {max_hamming}
"""


# ----------------------------------------------------- exact word jaccard
def word_jaccard_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", threshold: float = 0.5
) -> DataFrame:
    """Exact distinct-word Jaccard similarity join, pure DataFrame ops
    (inverted-index style: explode words -> pair counts -> |A∩B| /
    (|A|+|B|-|A∩B|)). The exact oracle for the MinHash path.

    Returns (id_a, id_b, jaccard)."""
    words = df.select(
        F.col(id_col).alias("_id"), F.explode(F.array_distinct(F.split(text_col, " "))).alias("w")
    )
    sizes = words.groupBy("_id").agg(F.count(F.lit(1)).alias("n"))
    a = words.select(F.col("_id").alias("id_a"), "w")
    b = words.select(F.col("_id").alias("id_b"), "w")
    inter = (
        a.join(b, "w")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col("_id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("_id").alias("id_b"), F.col("n").alias("n_b"))
    out = (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
    )
    return out.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_fastpath_docs: int = 500_000,
    max_fastpath_gram_rows: int = 30_000_000,
) -> DataFrame:
    """Exact n-gram (word shingle) Jaccard similarity join.

    Semantics (both paths, bit-identical): gram set = DISTINCT word
    n-grams (docs with < n tokens contribute nothing); keep pairs with
    |A∩B| / (|A|+|B|-|A∩B|) >= threshold, id_a < id_b, jaccard as the
    float64 division of the exact integer counts.

    Two measured facts drove the optimization-round redesign:
    - shingles are built with array ops (split -> slice -> array_join)
      instead of a posexplode + lead() window — same strings, one fewer
      Exchange + sort;
    - on small-vocabulary corpora EVERY gram is hot: at 50k docs the
      fixture has 27,865 distinct trigrams each shared by ~94 docs, so
      the inverted-index self-join emits 257M rows into a 120M-key
      hash aggregate (measured 26.8 s, ~700 ns/row of pure join+agg).
      The FAST PATH (bounded, pip_join-style gate) collects the integer
      postings (doc_idx, gram_idx) — ints only, ~16 B/row — broadcasts
      them, and counts pair intersections per doc-block with a
      vectorized numpy kernel (range-concat + sort-unique), filtering
      to the threshold INSIDE the task so the 10^8-row pair stream
      never touches a shuffle. Exactness is unchanged: same gram sets,
      same integer intersection counts, same float64 jaccard — pytest
      pins fastpath == join-path on planted corpora, and the driver
      query keeps its full DuckDB oracle.

    The join formulation remains the scale path (unbounded corpora,
    non-integer ids) and is used whenever the gates fail."""
    from gis_scripts_spark.operators.repart import spread

    toks = F.split(F.col("_t"), " ")
    grams_arr = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    )  # no otherwise: < n tokens -> NULL -> explode drops the doc
    docs = spread(df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t")), id_col)
    grams = docs.select("_id", F.explode(F.array_distinct(grams_arr)).alias("g"))

    id_type = df.schema[id_col].dataType
    from pyspark.sql.types import DoubleType, IntegerType, LongType, StructField, StructType

    integral_id = isinstance(id_type, (IntegerType, LongType))
    n_docs = df.count() if integral_id else None  # parquet metadata count
    if integral_id and n_docs <= max_fastpath_docs:
        # token count >= distinct-gram count, so one cheap scan-side agg
        # upper-bounds the collect (no extra pass over the gram explode)
        est = docs.agg(
            F.sum(F.size(F.split(F.col("_t"), " "))).alias("s")
        ).collect()[0]["s"] or 0
        if est <= max_fastpath_gram_rows:
            return _ngram_jaccard_fastpath(grams, id_type, threshold)

    sizes = grams.groupBy("_id").agg(F.count(F.lit(1)).alias("n"))
    a = grams.select(F.col("_id").alias("id_a"), "g")
    b = grams.select(F.col("_id").alias("id_b"), "g")
    inter = (
        a.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col("_id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("_id").alias("id_b"), F.col("n").alias("n_b"))
    out = (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
    )
    return out.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def _ngram_jaccard_fastpath(grams: DataFrame, id_type, threshold: float) -> DataFrame:
    """Bounded-size exact all-pairs Jaccard: collect the (gate-bounded)
    gram table once, factorize gram strings on the driver (any injective
    assignment works — the code only names the gram), broadcast the
    integer postings in both orderings, and count pair intersections with
    a per-doc cache-resident kernel. See ngram_jaccard_pairs."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    spark = grams.sparkSession
    sc = spark.sparkContext
    pdf = grams.toPandas()
    doc_ids, doc_idx = np.unique(pdf["_id"].to_numpy(np.int64), return_inverse=True)
    gram_idx = pd.factorize(pdf["g"])[0]
    n_docs = len(doc_ids)
    n_grams_d = int(gram_idx.max()) + 1 if len(gram_idx) else 0
    sizes = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
    # BOTH orderings of the postings, int32 (indices are gate-bounded):
    # per-doc gram lists drive the kernel loop, per-gram doc lists get
    # gathered per doc.
    order_d = np.argsort(doc_idx, kind="stable")
    grams_by_doc = gram_idx[order_d].astype(np.int32)
    iptr_d = np.searchsorted(doc_idx[order_d], np.arange(n_docs + 1)).astype(np.int64)
    order_g = np.argsort(gram_idx, kind="stable")
    docs_by_gram = doc_idx[order_g].astype(np.int32)
    iptr_g = np.searchsorted(gram_idx[order_g], np.arange(n_grams_d + 1)).astype(np.int64)
    bc = sc.broadcast((doc_ids, sizes, grams_by_doc, iptr_d, docs_by_gram, iptr_g))

    # one block per core slot (defaultParallelism is 2x slots here): the
    # kernel is one pass over the postings, extra waves only add per-task
    # fixed cost (broadcast load, worker dispatch)
    n_blocks = max(sc.defaultParallelism // 2, 1)
    thr = float(threshold)

    out_schema = StructType(
        [
            StructField("id_a", id_type),
            StructField("id_b", id_type),
            StructField("jaccard", DoubleType()),
        ]
    )

    def block_pairs(batches):
        # Per-DOC counting in cache-resident chunks: for each of my docs,
        # concatenate its grams' posting lists (|A| x avg-posting ints),
        # keep ids above mine (np.unique doc order == original id order,
        # so this IS the id_a < id_b filter), sort the few-thousand-element
        # chunk IN CACHE, and run-length it into per-neighbor intersection
        # counts. Two block-wide alternatives were built and measured under
        # 32-way parallelism on this host and REVERTED: a composite-key
        # bincount (zeroing ~300 MB count arrays saturated the memory bus)
        # and a single block-wide 4M-element key sort (8M-element gathers/
        # cumsums + the big sort are pure membus traffic: 9.1 s wall vs
        # 0.25 s for this per-doc form on identical inputs).
        doc_ids_b, sizes_b, gbd, iptr_d_b, dbg, iptr_g_b = bc.value
        nd = len(doc_ids_b)
        for pdf_b in batches:
            for blk in pdf_b["id"].to_numpy():
                out_a, out_b, out_j = [], [], []
                for d in range(int(blk), nd, n_blocks):
                    gs = gbd[iptr_d_b[d]:iptr_d_b[d + 1]]
                    if len(gs) == 0:
                        continue
                    starts = iptr_g_b[gs]
                    ends = iptr_g_b[gs + 1]
                    others = np.concatenate(
                        [dbg[s:e] for s, e in zip(starts.tolist(), ends.tolist())]
                    )
                    others = others[others > d]
                    if len(others) == 0:
                        continue
                    others.sort()
                    umask = np.empty(len(others), bool)
                    umask[0] = True
                    np.not_equal(others[1:], others[:-1], out=umask[1:])
                    idxs = np.flatnonzero(umask)
                    counts = np.diff(np.append(idxs, len(others)))
                    dj = others[idxs].astype(np.int64)
                    na = sizes_b[d]
                    nb_ = sizes_b[dj]
                    # integer prefilter (exact superset of the float
                    # threshold at thr=0.5: j >= 0.5 <=> 3*ni >= na+nb; +1
                    # slack guards the boundary), then the float64 division
                    # — the same IEEE op the SQL formulation performs.
                    if thr == 0.5:
                        pre = counts * 3 + 1 >= na + nb_
                        dj, counts, nb_ = dj[pre], counts[pre], nb_[pre]
                    if len(counts) == 0:
                        continue
                    jac = counts.astype(np.float64) / (na + nb_ - counts)
                    keep = jac >= thr
                    if keep.any():
                        out_a.append(np.full(int(keep.sum()), doc_ids_b[d]))
                        out_b.append(doc_ids_b[dj[keep]])
                        out_j.append(jac[keep])
                if out_a:
                    yield pd.DataFrame(
                        {
                            "id_a": np.concatenate(out_a),
                            "id_b": np.concatenate(out_b),
                            "jaccard": np.concatenate(out_j),
                        }
                    )

    # range(0, n, 1, n): one consecutive id per partition — no hash
    # collisions piling 2-3 blocks onto one task while others sit idle
    blocks = spark.range(0, n_blocks, 1, n_blocks)
    return blocks.mapInPandas(block_pairs, out_schema)

# -------------------------------------------------------------- clustering
def cluster_pairs(pairs_pdf: pd.DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> pd.DataFrame:
    """Union-find over a (small, collected) pair list -> (doc_id,
    cluster_id=min member). The driver-side finisher of a dedup run; at
    10^12 scale replace with iterative Spark label propagation (join-based
    min-propagation until fixpoint)."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for _, r in pairs_pdf.iterrows():
        ra, rb = find(r[id_a]), find(r[id_b])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = [(x, find(x)) for x in list(parent)]
    return pd.DataFrame(rows, columns=["doc_id", "cluster_id"])


MINHASH_SQL_PRIME = 67108859  # largest prime < 2^26: a*h < 2^52, exact in
# both Spark LongType and DuckDB BIGINT (no overflow divergence)


def minhash_sql_constants(n_perm: int = 64, seed: int = 101):
    """The (a_p, b_p) affine-permutation constants, deterministic — the
    SAME literals are embedded in the Spark plan and the DuckDB oracle."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MINHASH_SQL_PRIME, n_perm)
    b = rng.integers(0, MINHASH_SQL_PRIME, n_perm)
    return [int(x) for x in a], [int(x) for x in b]


def minhash_lsh_pairs_sql(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Banded MinHash LSH with an SQL-portable hash family, bit-reproducible
    in ANSI SQL — which makes the driver row a full oracle.

    Definition (mirrored verbatim by the DuckDB oracle, SQL_MINHASH):
      shingle set = DISTINCT word `shingle_n`-grams (tokens themselves when
                    the doc is shorter)
      h(s)        = int(first 7 hex chars of md5(s)) mod P,  P = 67108859
      sig_p       = MIN over shingles of (a_p*h + b_p) mod P   (affine
                    permutations; constants from minhash_sql_constants —
                    ONE md5 per shingle, the permutations are integer math)
      band hash   = md5 of the band's sig values joined in perm order
      candidates  = pairs sharing any (band, bhash), id_a < id_b
      jaccard     = exact |A∩B|/|A∪B| on shingle sets; keep >= threshold

    Scale shape: each doc crosses the Python boundary ONCE and its whole
    per-doc pipeline (shingle/hash/signature mins) runs in one vectorized
    Arrow kernel — no shingle explode, no collect_list shuffle; the banded
    self-join carries (id, band, bhash) only; texts re-join once per
    surviving candidate for the exact string-set Jaccard verify."""
    if n_perm % bands != 0:
        raise ValueError("bands must divide n_perm")
    r = n_perm // bands
    prime = MINHASH_SQL_PRIME
    a_const, b_const = minhash_sql_constants(n_perm)
    from gis_scripts_spark.operators.repart import spread

    # spread BEFORE the shingle build (optimization-round stage capture at
    # 50k docs: a single-file scan plans the whole per-doc pipeline on 1-2
    # tasks). The keyed repartition is AQE-exempt; at real scale (many
    # input splits) spread is a no-op.
    docs = spread(
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t")), id_col
    )
    # ONE Python stage for shingle + hash + signature (optimization round):
    # every JVM formulation measured worse at 50k docs — the exploded
    # string-shingle table re-shuffled through collect_list cost three
    # passes of the doc pipeline (6.1 s), persisting it serialized the
    # consumers on cache-block locks (12.8 s), and a per-element
    # `transform(md5)` array formulation pays the interpreted
    # higher-order-function path per shingle (stage capture: 2x the codegen
    # explode). Here the text crosses the Python boundary once per doc and
    # everything per-doc happens in one vectorized kernel. Values are
    # BIT-IDENTICAL to the SQL oracle: hashlib.md5 == SQL md5, the first 7
    # hex chars == digest[:4] >> 4, and a, b, h < P = 2^26 keep a*h + b <
    # 2^52 exact in int64 (numpy % == SQL % on non-negatives), so the sig
    # mins and the md5 band hashes built from them are unchanged.
    a_np = np.asarray(a_const, np.int64)[:, None]
    b_np = np.asarray(b_const, np.int64)[:, None]

    @F.pandas_udf(ArrayType(LongType()))
    def sig_udf(t_col: pd.Series) -> pd.Series:
        md5 = hashlib.md5
        out = []
        for t in t_col:
            toks = t.split(" ")
            if len(toks) >= shingle_n:
                sset = {" ".join(toks[i:i + shingle_n])
                        for i in range(len(toks) - shingle_n + 1)}
            else:
                sset = set(toks)
            hv = np.fromiter(
                (int.from_bytes(md5(s.encode()).digest()[:4], "big") >> 4
                 for s in sset),
                dtype=np.int64, count=len(sset),
            ) % prime
            out.append(((a_np * hv[None, :] + b_np) % prime).min(axis=1))
        return pd.Series(out)

    # persist the (id, sig) table: the band self-join's two sides are
    # separate subtrees (the planner broadcasts one), so without
    # materialization the signature UDF runs twice — and unlike the old
    # multi-million-row shingle cache this is one 64-long array per doc.
    # Released when the caller drops the returned frame (see _pin in
    # queries.py for why wrappers must keep it alive).
    with_sig, _sig_handle = _salted_persist(
        docs.select("_id", sig_udf(F.col("_t")).alias("_sig"))
    )
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[F.element_at("_sig", b * r + j + 1).cast("string") for j in range(r)],
                )
            ).alias("bhash"),
        )
        for b in range(bands)
    ])
    banded = with_sig.select(
        "_id", F.explode(band_structs).alias("_b")
    ).select("_id", F.col("_b.band").alias("band"), F.col("_b.bhash").alias("bhash"))
    # self-join via alias so BOTH sides are the same canonical subtree: the
    # join's shuffle is written once and ReusedExchange serves the other
    # side — with distinct left/right projections the signature UDF ran
    # twice (stage capture: two identical ~27 s stages per run).
    ba, bb = banded.alias("_ba"), banded.alias("_bb")
    cand = (
        ba.join(
            bb,
            (F.col("_ba.band") == F.col("_bb.band"))
            & (F.col("_ba.bhash") == F.col("_bb.bhash"))
            & (F.col("_ba._id") < F.col("_bb._id")),
        )
        .select(F.col("_ba._id").alias("id_a"), F.col("_bb._id").alias("id_b"))
        .distinct()
    )
    # exact Jaccard per surviving pair: texts re-joined once per candidate
    # (candidates are the band collisions — a vanishing fraction of docs),
    # shingle STRING sets intersected in one vectorized kernel. Set math on
    # the strings themselves, not hashes, so the value matches the oracle's
    # string-distinct intersection exactly; IEEE double division is
    # bit-identical to SQL's.
    ta = docs.select(F.col("_id").alias("id_a"), F.col("_t").alias("_ta"))
    tb = docs.select(F.col("_id").alias("id_b"), F.col("_t").alias("_tb"))

    @F.pandas_udf("double")
    def jac_udf(a_col: pd.Series, b_col: pd.Series) -> pd.Series:
        def sset(t: str) -> set:
            toks = t.split(" ")
            if len(toks) >= shingle_n:
                return {" ".join(toks[i:i + shingle_n])
                        for i in range(len(toks) - shingle_n + 1)}
            return set(toks)

        out = np.empty(len(a_col))
        for i, (x, y) in enumerate(zip(a_col, b_col)):
            sa, sb = sset(x), sset(y)
            inter = len(sa & sb)
            out[i] = inter / (len(sa) + len(sb) - inter)
        return pd.Series(out)

    out = (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select("id_a", "id_b", jac_udf(F.col("_ta"), F.col("_tb")).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    return _finalize_unpersist(out, [_sig_handle])


def cluster_pairs_distributed(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
    check_every: int = 1,
    telemetry: dict | None = None,
) -> DataFrame:
    """Distributed connected components over near-dup pairs by iterative
    min-label propagation — the 10^12-scale replacement for the
    driver-side union-find finisher (cluster_pairs): each round every
    node takes min(own label, neighbors' labels); fixpoint after
    O(component diameter) rounds (near-dup clusters are shallow). One
    equi-join + one groupBy per round, labels only in the shuffles.

    Returns (doc_id, cluster_id = min member id of the component).

    Lineage discipline: every round's labels are `localCheckpoint`ed
    (eager), NOT merely persisted. A persist keeps the full logical plan
    nested under each successive round — after ~6 rounds the physical
    plan was 8,385 lines / 474 Exchange nodes, and driver-side
    analysis/planning cost grows superlinearly with component depth; a
    checkpoint replaces the plan with a LogicalRDD leaf, so the per-round
    plan is constant-size (edges-leaf JOIN labels-leaf) regardless of
    iteration count. `edges` is checkpointed once up front for the same
    reason (its plan otherwise carries the whole upstream LSH pipeline
    into every round's join). Checkpointed blocks are freed by the
    ContextCleaner when the RDD is GC'd — no manual cache bookkeeping.

    `check_every`: run the (driver-blocking) convergence agg only every
    N rounds — at deep component diameters the per-round driver round-trip
    serializes; checking every 2 halves those trips at the cost of at most
    one extra propagation round past the fixpoint (labels are monotone, so
    extra rounds are no-ops, never wrong). `telemetry` (optional dict)
    records per-round wall seconds — the r4 directive-#7 flatness hook."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "label", F.col("id")
    ).localCheckpoint(eager=True)
    # convergence check: labels are elementwise NON-INCREASING, so for
    # integer ids the EXACT decimal sum is unchanged iff no label changed —
    # one agg on the checkpointed frame per round instead of a join + count.
    numeric = isinstance(labels.schema["label"].dataType,
                         (ByteType, ShortType, IntegerType, LongType))

    def _label_sum(df):
        v = df.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
        return v

    import time as _time

    prev_sum = _label_sum(labels) if numeric else None
    if telemetry is not None:
        telemetry["rounds"] = []
    for round_i in range(max_iters):
        _t0 = _time.perf_counter()
        neigh = (
            edges.join(
                labels.select(F.col("id").alias("dst"), F.col("label").alias("nl")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nl").alias("nl"))
            .select(F.col("src").alias("id"), "nl")
        )
        prop = labels.join(neigh, "id", "left").select(
            "id", F.least("label", F.coalesce("nl", "label")).alias("label")
        )
        # POINTER JUMPING (optimization round): after the neighbor-min
        # propagation, each node additionally takes its label's label —
        # L(v) <- min(L(v), L(L(v))) — which doubles the hop distance
        # covered per round, turning O(component diameter) rounds into
        # O(log diameter). One extra labels-by-label equi-join per round
        # (labels only, tiny rows); the fixpoint — min member id per
        # component — is unchanged, labels stay monotone non-increasing,
        # so the decimal-sum convergence check is untouched.
        lmap = prop.select(F.col("id").alias("_lk"), F.col("label").alias("_ll"))
        jumped = prop.join(lmap, prop["label"] == lmap["_lk"], "left").select(
            prop["id"], F.least(prop["label"], F.coalesce("_ll", prop["label"])).alias("label")
        )
        # localCheckpoint (not persist): truncates lineage to a LogicalRDD
        # leaf so the next round's plan does NOT nest this round's — the
        # eager materialization doubles as the convergence-agg input scan.
        new_labels = jumped.localCheckpoint(eager=True)
        # convergence check on every check_every-th round (or the last):
        # labels are monotone non-increasing, so an unchanged sum across a
        # SPAN of rounds proves no label moved anywhere in the span
        check = ((round_i + 1) % max(check_every, 1) == 0) or round_i == max_iters - 1
        changed = 1
        if check:
            if numeric:
                cur_sum = _label_sum(new_labels)
                changed = int(cur_sum != prev_sum)
                prev_sum = cur_sum
            else:
                changed = (
                    new_labels.alias("n")
                    .join(labels.alias("o"), "id")
                    .filter(F.col("n.label") != F.col("o.label"))
                    .count()
                )
        labels = new_labels
        if telemetry is not None:
            telemetry["rounds"].append(
                {"seconds": round(_time.perf_counter() - _t0, 3), "checked": bool(check)}
            )
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"cluster_pairs_distributed did not converge in {max_iters} "
            "rounds (component diameter exceeds max_iters) — raise "
            "max_iters; returning partial labels would be silently wrong")
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))
