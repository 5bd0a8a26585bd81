"""Vocab-driven byte-pair encoding: train a merge table from the
corpus, encode documents against it, and count REAL tokens — the
production replacement for the regex pre-tokenizer approximation
(:data:`southpaw_spark.operators.text.BPE_TOKEN_PATTERN`), whose counts
can diverge 2×+ from a trained tokenizer on code / non-English text.
Token counts drive packing (t09), budgets (t15), mixing (t17) and
splits — at production they must come from the actual tokenizer's
merges, not a heuristic.

Public-knowledge algorithm: Sennrich, Haddow & Birch 2016 ("Neural
Machine Translation of Rare Words with Subword Units", ACL) for
training; the standard lowest-rank-pair merge loop (as in the public
GPT-2 encoder) for encoding. No end-of-word marker — tokens never
cross the pre-tokenizer's word boundaries.

Determinism contract (what makes the DuckDB oracle possible):

* Pre-tokenization is the engine-portable regex split of
  ``BPE_TOKEN_PATTERN`` — identical word streams in any engine.
* Training ties break deterministically: highest pair count, then
  lexicographically smallest pair — retrain on the same corpus, get
  the same merges.
* Encoding applies merges by ascending rank. For a TRAINED vocab this
  equals the lowest-rank-pair loop (a merge's constituents always have
  strictly lower ranks than any merge that consumes them), and it is
  exactly replayable as a sequence of left-to-right non-overlapping
  string replacements over the space-joined symbol string — which is
  how the registry oracle (t21) recomputes the encode from first
  principles in SQL.

Spark shape: training is two combiner-friendly jobs (word counts →
bounded top-``word_cap`` collect; the classic merge loop then runs on
the driver over the word-FREQUENCY dict, never the corpus — Sennrich's
algorithm is defined on that dict). Encoding is one Arrow-batched
``pandas_udf`` with the merge table captured in the closure (broadcast
once per executor) and a per-executor word→tokens cache — Zipf makes
the cache hit rate extreme, so the merge loop runs roughly once per
DISTINCT word, not per occurrence. No shuffle anywhere: encode is a
projection that rides the scan partitioning at 100 TB.
"""

from __future__ import annotations

import re
from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from southpaw_spark.operators.text import BPE_TOKEN_PATTERN

#: Per-executor cap on the word→tokens memo (entries); Zipf means the
#: useful head is far smaller, the cap just bounds worst-case memory.
_CACHE_CAP = 200_000


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 100,
    word_cap: int = 50_000,
    pattern: str = BPE_TOKEN_PATTERN,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus (Sennrich 2016).

    The corpus-sized work is one Spark aggregation: explode the
    pre-tokenized word stream, count, and take the top ``word_cap``
    words by (count desc, word asc) — a bounded TakeOrdered, never a
    global sort. The merge loop itself runs on the driver over that
    word-frequency dict (the algorithm is defined on the dict, so this
    is not a scale compromise: the dict is vocabulary-sized, not
    corpus-sized; ``word_cap`` truncates the Zipf tail, which carries
    negligible pair mass).

    Deterministic: ties in pair count break to the lexicographically
    smallest pair; training stops early when no pair occurs twice.
    Returns the merge list in rank order — the exact input
    :func:`bpe_encode` and the t21 oracle replay expect."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1; got {n_merges}")
    rows = (
        df.select(
            F.explode(
                F.expr(f"regexp_extract_all({text_col}, '{pattern}', 0)")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(word_cap)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["w"]): int(r["c"]) for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best, cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break  # singleton pairs carry no compression evidence
        merges.append(best)
        a, b = best
        ab = a + b
        nxt: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + c
        vocab = nxt
    return merges


def merge_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE word against a rank table: repeatedly merge the
    lowest-rank adjacent pair (all its occurrences, left to right)
    until no adjacent pair is in the table — the standard BPE encode
    loop. For a trained vocab this is equivalent to applying the
    merges sequentially in rank order (see module docstring)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        a, b = best_pair
        ab = a + b
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(ab)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: Sequence[tuple[str, str]],
    out_col: str = "bpe_tokens",
    count_col: str = "n_tokens_bpe",
    pattern: str = BPE_TOKEN_PATTERN,
) -> DataFrame:
    """Append the BPE token array (``out_col``) and the REAL token
    count (``count_col``) for every document.

    One Arrow-batched ``pandas_udf`` projection — zero shuffles, rides
    the scan partitioning. The merge table travels in the UDF closure
    (shipped once per executor, like a broadcast) and a capped
    word→tokens memo amortizes the merge loop to ~once per distinct
    word under Zipf. Python-side work is unavoidable here (the greedy
    merge loop is data-dependent per word — no Column-expression
    form), which is exactly the sanctioned Pandas-UDF escape hatch;
    everything downstream consumes only the JVM-side ``count_col``."""
    ranks = {
        (str(a), str(b)): i for i, (a, b) in enumerate(merges)
    }
    pat = pattern

    @F.pandas_udf("array<string>")
    def enc(col: pd.Series) -> pd.Series:
        rx = re.compile(pat)
        cache: dict[str, list[str]] = {}

        def word_tokens(w: str) -> list[str]:
            t = cache.get(w)
            if t is None:
                t = merge_word(w, ranks)
                if len(cache) < _CACHE_CAP:
                    cache[w] = t
            return t

        return col.map(
            lambda txt: [
                tok
                for w in rx.findall(txt or "")
                for tok in word_tokens(w)
            ]
        )

    out = df.withColumn(out_col, enc(F.col(text_col)))
    return out.withColumn(count_col, F.size(F.col(out_col)).cast("long"))


def with_bpe_token_count(
    df: DataFrame,
    text_col: str,
    merges: Sequence[tuple[str, str]],
    count_col: str = "n_tokens_bpe",
    pattern: str = BPE_TOKEN_PATTERN,
) -> DataFrame:
    """``count_col`` only — the budgeting/packing input — without
    materializing the token array column."""
    tmp = f"__{count_col}_toks"
    return bpe_encode(
        df, text_col, merges, out_col=tmp, count_col=count_col,
        pattern=pattern,
    ).drop(tmp)
