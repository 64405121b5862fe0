"""Byte-pair-encoding tokenizer training over the corpus (training-data
pipeline op — not in the reference, which has no subword tokenizer).

Spark-first decomposition of the classic BPE trainer (Sennrich 2016 /
GPT-2 style, trained from a word-frequency table the way HF tokenizers
do):

1. ``word_counts``  — the DISTRIBUTED stage: pretokenize every doc with
   the shared ``textquality.BPE_PRETOKEN_RE`` (JVM regexp, no Python),
   explode, and ``groupBy(word).count()`` — one map-side-combined
   shuffle whose output is Zipf-shaped and tiny relative to the corpus.
   This is the only stage that touches the 100 TB; everything after
   runs on the weighted vocabulary.
2. ``top_words``    — deterministic cap to the ``max_words`` heaviest
   words (count desc, word asc). Standard practice: the head of a web
   Zipf covers ≳99.9% of token mass; the dropped tail mass is RETURNED
   (never a silent cap) so callers can log it.
3. ``learn_merges`` — the driver-side merge loop over the capped
   word-count table: repeatedly merge the highest-weight adjacent
   symbol pair. Deterministic tie-break (count desc, pair lexicographic
   asc). The table is ≤ max_words rows — driver-sized by construction,
   exactly like ivf_fit's k-means sketch.
4. ``apply_merges`` / ``bpe_token_count`` — ship the learned merge
   ranks back out as an Arrow pUDF and tokenize distributed (greedy
   lowest-rank-first merging, the exact GPT-2 ``get_pairs``/bigram
   loop semantics).

Symbols are unicode characters within a pre-token (pre-tokens carry
their leading space, GPT-2 style, so no end-of-word marker is needed);
merges never cross pre-token boundaries.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .textquality import BPE_PRETOKEN_RE

_WS_ONLY = r"^[ \t\n\r]+$"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (word, cnt): corpus-wide pre-token frequencies. One shuffle,
    partial-aggregated map-side; whitespace-only pre-tokens dropped
    (they carry no mergeable content — the leading-space convention
    keeps one space inside the following word)."""
    toks = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(BPE_PRETOKEN_RE), 0)
    return (
        docs.select(F.explode(toks).alias("word"))
        .filter(~F.col("word").rlike(_WS_ONLY))
        .groupBy("word").agg(F.count("*").cast(LongType()).alias("cnt"))
    )


def top_words(counts: DataFrame, max_words: int = 1_000_000):
    """→ (rows, dropped_mass_fraction): the ``max_words`` heaviest words
    as driver rows (deterministic order: cnt desc, word asc — a single
    TakeOrderedAndProject) plus the fraction of total token mass the cap
    dropped, so callers can log it instead of capping silently."""
    total, = counts.agg(F.sum("cnt")).first()
    rows = (counts.orderBy(F.desc("cnt"), F.asc("word"))
            .limit(max_words).collect())
    kept = sum(r.cnt for r in rows)
    dropped = 0.0 if not total else 1.0 - kept / total
    return rows, dropped


def learn_merges(word_rows, n_merges: int = 100) -> list[tuple[str, str]]:
    """Classic weighted BPE merge loop over (word, cnt) rows → ordered
    merge list. Ties break (count desc, pair lexicographic asc) so two
    runs over the same table are identical. Stops early when no adjacent
    pair repeats."""
    words: dict[tuple[str, ...], int] = {}
    for r in word_rows:
        w = tuple(r.word)
        words[w] = words.get(w, 0) + int(r.cnt)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, cnt in words.items():
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        joined = best[0] + best[1]
        new_words: dict[tuple[str, ...], int] = {}
        for sym, cnt in words.items():
            out, i = [], 0
            while i < len(sym):
                if (i + 1 < len(sym)
                        and sym[i] == best[0] and sym[i + 1] == best[1]):
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_words[t] = new_words.get(t, 0) + cnt
        words = new_words
    return merges


def learn_bpe(docs: DataFrame, n_merges: int = 100,
              max_words: int = 1_000_000, text_col: str = "text"):
    """End-to-end trainer: distributed word counts → capped table →
    driver merge loop. → (merges, dropped_mass_fraction)."""
    rows, dropped = top_words(word_counts(docs, text_col), max_words)
    return learn_merges(rows, n_merges), dropped


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE encode of one pre-token (the GPT-2
    bigram loop: always merge the best-ranked pair present)."""
    sym = list(word)
    while len(sym) > 1:
        pairs = [(ranks.get((a, b)), i)
                 for i, (a, b) in enumerate(zip(sym, sym[1:]))]
        cands = [(rk, i) for rk, i in pairs if rk is not None]
        if not cands:
            break
        _, i = min(cands)
        sym[i:i + 2] = [sym[i] + sym[i + 1]]
    return sym


def bpe_token_count(docs: DataFrame, merges: list[tuple[str, str]],
                    text_col: str = "text") -> DataFrame:
    """→ (doc_id, n_bpe_tokens): token bill under the LEARNED merges —
    the upgrade from bpe_pretoken_count's lower bound to the real count.
    Pretokenization + merging run in one Arrow pUDF per batch; the merge
    ranks ship once per task in the closure (a few KB for typical merge
    lists)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    pat = re.compile(BPE_PRETOKEN_RE)
    ws = re.compile(_WS_ONLY)

    @F.pandas_udf(LongType())
    def count_tokens(text: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}

        def one(t):
            if t is None:
                return 0
            total = 0
            for w in pat.findall(t):
                if ws.match(w):
                    continue
                n = memo.get(w)
                if n is None:
                    n = len(encode_word(w, ranks))
                    memo[w] = n
                total += n
            return total

        return text.map(one)

    return docs.select(
        "doc_id", count_tokens(F.col(text_col)).alias("n_bpe_tokens"))
