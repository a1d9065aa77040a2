"""Trained-BPE exactness (operators/tokenize.py).

The merge loop is pinned against the hand-derivable classic corpus
(Sennrich et al. 2016's low/lower/newest/widest example — every merge
below is derivable by hand from the pair counts), the incremental
inverted-index trainer is cross-checked against a brute-force recount
trainer, and application invariants (concat == pretokens, memo purity,
rank-greedy order) plus the Spark end-to-end path are exercised.
"""

import numpy as np
import pandas as pd
import pytest

from gis_scripts_spark.operators.tokenize import (
    _END,
    apply_bpe,
    bpe_word,
    pretokenize,
    train_bpe,
    word_histogram,
)

# the classic corpus: counts chosen so pair counts are hand-computable
_CLASSIC = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def _brute_train(histogram, n_merges, min_freq=2):
    """Independent reference trainer: full pair recount every round."""
    words = {i: list(w) + [_END] for i, (w, _c) in enumerate(histogram)}
    counts = {i: c for i, (_w, c) in enumerate(histogram)}
    merges = []
    for _ in range(n_merges):
        pc = {}
        for i, syms in words.items():
            for p in zip(syms, syms[1:]):
                pc[p] = pc.get(p, 0) + counts[i]
        cands = [(n, p) for p, n in pc.items() if n >= min_freq]
        if not cands:
            break
        # deterministic tie-break: count desc, pair ASC
        top_n = max(n for n, _p in cands)
        best = min((p for n, p in cands if n == top_n))
        merges.append(best)
        a, b = best
        for i, syms in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
    return merges


class TestTrain:
    def test_classic_first_merges(self):
        """Hand-derived: 'es' appears in newest(6)+widest(3)=9 — the top
        pair; then 'est' 9; then 'est</w>' 9; then 'lo' in low(5)+lower(2)=7."""
        merges = train_bpe(_CLASSIC, n_merges=4)
        assert merges == [("e", "s"), ("es", "t"), ("est", _END), ("l", "o")]

    def test_matches_brute_force_trainer(self):
        rng = np.random.RandomState(11)
        vocab = ["".join(rng.choice(list("abcdef"), size=rng.randint(2, 9)))
                 for _ in range(120)]
        hist = [(w, int(rng.randint(1, 40))) for w in sorted(set(vocab))]
        fast = train_bpe(hist, n_merges=60)
        slow = _brute_train(hist, n_merges=60)
        assert fast == slow

    def test_min_freq_stops(self):
        merges = train_bpe([("ab", 1)], n_merges=10, min_freq=2)
        assert merges == []
        merges = train_bpe([("ab", 2)], n_merges=10, min_freq=2)
        assert merges[0] == ("a", "b")


class TestApply:
    def test_roundtrip_concat(self):
        merges = train_bpe(_CLASSIC, n_merges=10)
        ranks = {p: i for i, p in enumerate(merges)}
        for w, _c in _CLASSIC + [("lowest", 0), ("unseen", 0), ("w", 0)]:
            toks = bpe_word(w, ranks)
            assert "".join(toks) == w + _END

    def test_trained_words_tokenize_to_single_units(self):
        """After enough merges the training words become 1-2 tokens."""
        merges = train_bpe(_CLASSIC, n_merges=30)
        ranks = {p: i for i, p in enumerate(merges)}
        assert bpe_word("newest", ranks) == ["newest" + _END]
        assert bpe_word("low", ranks) == ["low" + _END]

    def test_rank_greedy_not_positional(self):
        # ranks: ('b','c') rank 0 beats the earlier-positioned ('a','b')
        ranks = {("b", "c"): 0, ("a", "b"): 1}
        assert bpe_word("abc", ranks)[:2] == ["a", "bc"]

    def test_pretokenize(self):
        assert pretokenize("Hello, world 42!") == ["hello", ",", "world", "42", "!"]


def test_spark_end_to_end(spark):
    docs = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(8)],
            "text": [
                "the lowest newest low", "lower, lower!", "newest widest",
                "low low low", "the widest", "newest newest newest",
                "42 low things", "unrelated zebra",
            ],
        }
    )
    df = spark.createDataFrame(docs)
    hist = word_histogram(df, "text")
    # histogram must equal a pandas recount (same pretokenizer)
    import collections

    ref = collections.Counter(
        w for t in docs["text"] for w in pretokenize(t)
    )
    assert dict(hist) == dict(ref)
    merges = train_bpe(hist, n_merges=40)
    out = apply_bpe(df.repartition(3), merges).toPandas().set_index("doc_id")
    # invariant: concatenated tokens reproduce the pretokens of every doc
    for _, row in docs.iterrows():
        toks = out.loc[row["doc_id"], "tokens"]
        assert "".join(toks) == "".join(w + _END for w in pretokenize(row["text"]))
        assert out.loc[row["doc_id"], "n_pretokens"] == len(pretokenize(row["text"]))
        assert out.loc[row["doc_id"], "n_bpe_tokens"] == len(toks)
    # trained tokenizer compresses the CORPUS: unseen words (d7's zebra)
    # can exceed their char count (char tokens + </w> markers), but total
    # tokens must be well under total characters
    assert out["n_bpe_tokens"].sum() < 0.6 * docs["text"].str.len().sum()


def test_histogram_deterministic_across_parallelism(spark):
    docs = pd.DataFrame(
        {"doc_id": [f"d{i}" for i in range(30)],
         "text": [f"word{i % 7} common common word{i % 3}" for i in range(30)]}
    )
    df = spark.createDataFrame(docs)
    h1 = word_histogram(df.repartition(1), "text", max_words=5)
    h2 = word_histogram(df.repartition(16), "text", max_words=5)
    assert h1 == h2
