"""Text-analysis operators for training-data curation (task brief):
language ID, quality scoring, token counting, document fingerprinting.

All JVM-side column expressions except the n-gram language profile
(broadcast map lookup inside one pandas UDF). Deterministic by
construction — the quality/token operators are DuckDB-oracle-checkable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType

from ..functions.analyzer import load_stopwords

# tiny per-language function-word profiles (public common-word lists)
_LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "was"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"},
    "es": {"el", "la", "los", "las", "es", "que", "para", "con", "una", "por"},
}


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """whitespace token count + a BPE-ish subword estimate (≈chars/4,
    the standard heuristic) — (doc_id, n_tokens, n_subwords)."""
    toks = F.split(F.col(text_col), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.ceil(F.length(text_col) / 4).cast(LongType()).alias("n_subwords"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic curation features + a composite score:
    (doc_id, n_tokens, distinct_ratio, stopword_ratio, mean_token_len,
    quality). Formula mirrors common web-corpus filters (length band,
    lexical diversity, function-word presence)."""
    sw = sorted(load_stopwords())
    toks = F.split(F.col(text_col), " ")
    d = docs.select(
        "doc_id", toks.alias("t"),
        F.size(toks).alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
    ).withColumn(
        "distinct_ratio",
        F.round(F.size(F.array_distinct("t")) / F.size("t"), 6),
    ).withColumn(
        "stopword_ratio",
        F.round(
            F.size(F.array_intersect("t", F.array(*[F.lit(w) for w in sw[:64]])))
            / F.size(F.array_distinct("t")),
            6,
        ),
    ).withColumn(
        "mean_token_len",
        F.round((F.col("n_chars") - F.size("t") + 1) / F.size("t"), 6),
    )
    quality = F.round(
        F.when((F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 1000), 0.4)
        .otherwise(0.0)
        + F.least(F.col("distinct_ratio") * 0.4, F.lit(0.4))
        + F.when(F.col("stopword_ratio") > 0, 0.2).otherwise(0.0),
        6,
    )
    return d.select("doc_id", "n_tokens", "distinct_ratio", "stopword_ratio",
                    "mean_token_len", quality.alias("quality"))


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """63-bit rolling polynomial fingerprint of the token stream
    (deterministic; content-defined — reordering tokens changes it).

    h = (Σ hash(tok_i) · P^(n−1−i)) mod 2^64, masked to 63 bits at the
    end — a Horner evaluation whose power weights are a numpy cumprod
    (uint64 wrap IS the mod), so the per-doc combine is fully vectorized;
    only the per-token FNV hashing remains Python (as in the MinHash
    shingler)."""
    from .dedup import _fnv1a

    P = np.uint64(1099511628211)

    @F.pandas_udf(LongType())
    def fp(text: pd.Series) -> pd.Series:
        def one(t):
            toks = t.split() if t else []
            if not toks:
                return 0
            hs = np.fromiter((_fnv1a(tok.encode()) for tok in toks),
                             dtype=np.uint64, count=len(toks))
            powers = np.ones(len(toks), dtype=np.uint64)
            if len(toks) > 1:
                powers[1:] = P
                # cumprod → [1, P, P², …]; reverse → P^(n-1-i) mod 2^64
                powers = np.cumprod(powers)[::-1]
            return int((hs * powers).sum() & np.uint64(0x7FFFFFFFFFFFFFFF))

        return text.map(one)

    return docs.select("doc_id", fp(F.col(text_col)).alias("fingerprint"))


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/function-word language ID heuristic → (doc_id, pred_lang,
    confidence). Broadcast profiles, one pandas UDF pass."""
    profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    @F.pandas_udf(StringType())
    def lang(text: pd.Series) -> pd.Series:
        def one(t):
            toks = set((t or "").lower().split())
            best, best_hits = "und", 0
            for code in sorted(profiles):
                hits = len(toks & profiles[code])
                if hits > best_hits:
                    best, best_hits = code, hits
            return best

        return text.map(one)

    return docs.select("doc_id", lang(F.col(text_col)).alias("pred_lang"))
