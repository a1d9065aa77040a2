"""Trained BPE tokenizer: distributed histogram training, broadcast apply.

The real version of text.py's "BPE-ish regex" proxy count — a byte-pair
encoding trained ON the corpus and applied distributed, the tokenizer
stage of an LLM training-data pipeline.

Scale shape (the part that matters at 100 TB):

- **Training is one shuffle, not a corpus scan per merge.** BPE training
  operates on the distinct-word frequency table, not the raw text (the
  original Sennrich et al. 2016 formulation): the corpus collapses to
  (word, count) via pretokenize-explode -> groupBy(word).count() — a
  map-side-combinable aggregation whose post-shuffle size is the distinct
  vocabulary (Heaps' law, ~1e6 rows for 100 TB of text, and `max_words`
  caps it by frequency) — and the merge loop then runs driver-side over
  that bounded histogram. Merges per round touch only words containing
  the merged pair (an inverted pair->words index), so 10k merges over a
  500k-word histogram is seconds, independent of corpus size.
- **Application is embarrassingly parallel**: the merge ranks broadcast
  (a dict of ~vocab_size entries), one Arrow pass tokenizes each doc;
  a per-batch word->tokens memo makes the cost proportional to DISTINCT
  words per batch, not tokens.

No SQL oracle (a rank-greedy merge loop is not expressible in ANSI SQL)
— the driver query is rows-only; exactness is pinned in pytest against
the hand-derivable classic example (lo+w / lowe+r-style merges on the
Sennrich corpus), tokenization invariants (concat == pretokens; applied
merges must be adjacent-pair ranks), and a brute-force per-word reference
implementation.
"""
from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# pretokenizer: lowercase word / number / single punctuation — the same
# family as text.with_token_stats' "BPE-ish" regex, kept dependency-free
_PRETOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"
_END = "</w>"  # Sennrich end-of-word marker: merges never cross words


def pretokenize(text: str) -> list[str]:
    return re.findall(_PRETOKEN_RE, text.lower())


def word_histogram(df: DataFrame, text_col: str = "text",
                   max_words: int = 500_000) -> list[tuple[str, int]]:
    """(word, count) rows — ONE map-side-combinable shuffle; the result is
    vocabulary-sized, never corpus-sized. max_words keeps the driver copy
    bounded by taking the most frequent words (ties broken by word so the
    trained tokenizer is deterministic at any parallelism)."""
    # \s must survive Spark SQL string-literal escape processing
    sql_re = _PRETOKEN_RE.replace("\\", "\\\\")
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), '{sql_re}', 0)"
    )
    from gis_scripts_spark.operators.repart import spread

    # spread the scan BEFORE the regex explode: a small-bytes corpus
    # arrives as 1-2 splits and the regexp_extract_all + explode + partial
    # agg then runs on 1-2 cores (stage capture: a 2-task 2.7-3.9 s stage
    # at 50k docs); no-op on multi-split inputs.
    hist = (
        spread(df.select(F.col(text_col)))
        .select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(max_words)
    )
    return [(r["word"], int(r["cnt"])) for r in hist.collect()]


def train_bpe(histogram: list[tuple[str, int]], n_merges: int,
              min_freq: int = 2) -> list[tuple[str, str]]:
    """Driver-side merge loop over the bounded histogram (the standard
    algorithm): repeatedly merge the most frequent adjacent symbol pair
    (count desc, pair asc — fully deterministic), maintaining an inverted
    pair->word index so each round touches only affected words."""
    words: list[list[str]] = [list(w) + [_END] for w, _c in histogram]
    counts = [c for _w, c in histogram]

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(words):
        c = counts[wi]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
            pair_words.setdefault((a, b), set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        best_n = min_freq - 1
        for p, n in pair_counts.items():
            if n > best_n or (n == best_n and best is not None and p < best):
                best, best_n = p, n
        if best is None:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            syms = words[wi]
            c = counts[wi]
            # remove this word's old pair contributions
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= c
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        del pair_words[(a, b)]
            # apply the merge left-to-right
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
                pair_words.setdefault((a, b), set()).add(wi)
    return merges


def bpe_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize one pretoken: greedily apply the LOWEST-rank adjacent pair
    until no merge applies (the canonical apply algorithm)."""
    syms = list(word) + [_END]
    while len(syms) > 1:
        best_i, best_r = -1, len(ranks)
        for i, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p, -1)
            if r != -1 and r < best_r:
                best_i, best_r = i, r
        if best_i < 0:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def _tokenized_schema(id_type) -> StructType:
    # the id column keeps its source type (documents tables commonly key
    # by int64; fixtures by string)
    return StructType(
        [
            StructField("doc_id", id_type, False),
            StructField("n_pretokens", IntegerType(), False),
            StructField("n_bpe_tokens", IntegerType(), False),
            StructField("tokens", ArrayType(StringType(), False), False),
        ]
    )


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_tokens: bool = True,
) -> DataFrame:
    """Tokenize every document with the trained merges — merges ride the
    closure (KB-scale broadcast), one Arrow pass per batch, and a
    word->tokens memo bounds per-batch work by DISTINCT words."""
    ranks = {p: i for i, p in enumerate(merges)}

    def run(batches):
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            ids, n_pre, n_tok, toks = [], [], [], []
            # zip over column arrays, not iterrows: the per-row work is a
            # memoized dict walk, so pandas row-object construction is a
            # measurable fraction (the exif_metadata 1.7x lesson)
            for rid, text in zip(pdf[id_col].to_numpy(), pdf[text_col].to_numpy()):
                pres = pretokenize(text)
                out: list[str] = []
                for w in pres:
                    t = memo.get(w)
                    if t is None:
                        t = memo[w] = bpe_word(w, ranks)
                    out.extend(t)
                ids.append(rid)
                n_pre.append(len(pres))
                n_tok.append(len(out))
                toks.append(out if keep_tokens else [])
            yield pd.DataFrame(
                {"doc_id": ids, "n_pretokens": n_pre,
                 "n_bpe_tokens": n_tok, "tokens": toks}
            )

    from gis_scripts_spark.operators.repart import spread

    # spread: same single-split-corpus unlock as word_histogram above.
    return spread(df.select(id_col, text_col), id_col).mapInPandas(
        run, _tokenized_schema(df.schema[id_col].dataType)
    )
