"""Benchmark decontamination — drop training documents that share a
word n-gram with an evaluation/benchmark set.

Not in the reference engine (no training-data tooling there); this is
the standard eval-leakage guard a 100 TB training pipeline runs after
dedup: any document containing a (default 13-token) n-gram that also
appears in a benchmark document is removed (or marked), so evaluation
prompts/answers cannot leak into the training set verbatim.

Scale shape (the eval set is always tiny relative to the corpus):

* eval side  — tokenize → n-gram → md5-16 hash → distinct. One small
  shuffle over the benchmark set only.
* corpus side — tokenize + n-gram per row (narrow, no shuffle), explode,
  LEFT SEMI join against the eval hashes (AQE broadcasts the small
  side: no corpus shuffle), then distinct over the FLAGGED doc ids only
  — the shuffle carries contaminated ids, not documents.
* rejoin — LEFT ANTI (or a left join for ``mark=True``) of the corpus
  against the flagged-id frame; AQE broadcasts it while it is small and
  falls back to a shuffle join only if contamination is corpus-scale,
  which is the correct plan in that regime anyway.

Grams are matched via ``substr(md5(gram), 1, 16)`` — 16 hex chars
(64 bits; birthday collision odds ~1e-8 at a billion distinct eval
grams, and a collision only ever drops an extra training doc, never
leaks one) — so the broadcast ships 16-byte keys instead of 13-word
strings, and DuckDB reproduces the decision exactly for the driver
contract (``decontaminate`` entry in __spark_entry__.py).
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_hash_udf(n: int):
    """Arrow-batched pandas UDF: text → array of 16-hex md5 gram-hash
    prefixes, one per word-n-gram position.

    A pandas UDF, not a Catalyst ``transform(sequence(...), i ->
    md5(array_join(slice(...))))``: higher-order-function lambdas
    evaluate INTERPRETED per element, and the expression form measured
    ~10× slower at sf0.1 (same finding as dedup.simhash64 — hashlib's C
    md5 beats interpreted expression trees for per-token hashing).

    Tokenization contract (== the JVM text operators and the DuckDB
    oracle): lowercase, split on ASCII whitespace runs, drop empties —
    ``re.ASCII`` pins Python's ``\\s`` to Java's/RE2's ASCII class so
    all three engines tokenize identically."""
    ws = re.compile(r"\s+", re.ASCII)

    @F.pandas_udf("array<string>")
    def gram_hashes(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = [w for w in ws.split((t or "").lower()) if w]
            if len(toks) < n:
                out.append([])
                continue
            joined = " ".join(toks)
            # gram strings via one pre-joined buffer + running offsets:
            # avoids re-joining a 13-token slice per position
            offs = [0]
            for w in toks:
                offs.append(offs[-1] + len(w) + 1)
            out.append([
                hashlib.md5(
                    joined[offs[i]:offs[i + n] - 1].encode()
                ).hexdigest()[:16]
                for i in range(len(toks) - n + 1)
            ])
        return pd.Series(out)

    return gram_hashes


def ngram_hashes(docs: DataFrame, n: int, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """→ (id_col, gram_hash) — one row per word-n-gram occurrence
    position; gram_hash = first 16 md5 hex chars of the space-joined
    lowercased gram. Documents shorter than ``n`` tokens yield no rows
    (standard n-gram decontamination semantics: too short to match).
    Narrow (Arrow UDF + explode only, no shuffle); callers dedupe as
    needed."""
    if n < 1:
        raise ValueError(f"n must be >= 1: {n}")
    return docs.select(
        F.col(id_col),
        F.explode(_gram_hash_udf(n)(F.col(text_col))).alias("gram_hash"),
    )


def eval_ngram_hashes(eval_docs: DataFrame, n: int = 13,
                      text_col: str = "text") -> DataFrame:
    """→ (gram_hash) — the distinct n-gram hash set of the benchmark
    corpus. Small by assumption (benchmarks are MBs, not TBs); compute
    once and reuse across decontaminate() calls when sweeping corpora."""
    tagged = eval_docs.select(F.monotonically_increasing_id().alias("_eid"),
                              F.col(text_col))
    return ngram_hashes(tagged, n, text_col, "_eid") \
        .select("gram_hash").distinct()


def decontaminate(docs: DataFrame, eval_docs: DataFrame, n: int = 13,
                  text_col: str = "text", eval_text_col: str | None = None,
                  mark: bool = False) -> DataFrame:
    """Remove (``mark=False``) or flag (``mark=True``, adds a boolean
    ``contaminated`` column) every document in ``docs`` sharing at least
    one word-``n``-gram with ``eval_docs``.

    ``n=13`` is the published standard (GPT-3 appendix C / The Pile);
    lower it for stricter matching. Documents with fewer than ``n``
    tokens are never flagged — tighten ``n`` rather than special-casing
    short docs, so the decision stays a pure n-gram-set intersection
    that the DuckDB oracle reproduces row-for-row.
    """
    evals = eval_ngram_hashes(eval_docs, n, eval_text_col or text_col)
    flagged = (
        ngram_hashes(docs, n, text_col)
        .join(evals, "gram_hash", "left_semi")
        .select("doc_id")
        .distinct()
    )
    if mark:
        return docs.join(flagged.withColumn("contaminated", F.lit(True)),
                         "doc_id", "left") \
            .withColumn("contaminated",
                        F.coalesce(F.col("contaminated"), F.lit(False)))
    return docs.join(flagged, "doc_id", "left_anti")
