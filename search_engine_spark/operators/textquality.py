"""Text-analysis operators for training-data curation (task brief):
language ID, quality scoring, token counting, document fingerprinting.

All JVM-side column expressions except the n-gram language profile
(broadcast map lookup inside one pandas UDF). Deterministic by
construction — the quality/token operators are DuckDB-oracle-checkable.
"""

from __future__ import annotations

import re

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


def _tokens(text_col: str):
    """Whitespace-robust token array: split on \\s+ runs, drop empties —
    newlines/tabs/multi-space real-web text counts correctly and empty/
    NULL text yields ZERO tokens (a bare split(' ') would glue
    'one.\\nline' together and count '' as one token)."""
    return F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda x: x != "",
    )


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """whitespace token count + a BPE-ish subword estimate (≈chars/4,
    the standard heuristic) — (doc_id, n_tokens, n_subwords)."""
    return docs.select(
        "doc_id",
        F.size(_tokens(text_col)).alias("n_tokens"),
        F.ceil(F.length(F.coalesce(F.col(text_col), F.lit(""))) / 4)
        .cast(LongType()).alias("n_subwords"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic curation features + a composite score:
    (doc_id, n_tokens, distinct_ratio, stopword_ratio, mean_token_len,
    quality). Formula mirrors common web-corpus filters (length band,
    lexical diversity, function-word presence). Empty/NULL text scores
    zero on every ratio (no null-skipping credit)."""
    sw = frozenset(load_stopwords())  # full Glasgow list on both sides
    # one Arrow pass over the TEXT computes all four integer counts —
    # tokenize + distinct + stopword-membership are per-token work, where
    # a pandas UDF beats interpreted Catalyst array HOFs by >2× (the
    # 571-literal array_intersect alone doubled this operator's latency).
    # Only exact integers cross the UDF boundary; every ratio/round stays
    # a Spark column expression so DuckDB-oracle parity is unchanged.
    # Split pattern = the exact Java-regex \s class (ASCII) _tokens uses,
    # NOT Python str.split() (which would also split Unicode whitespace).
    ws = re.compile(r"[ \t\n\x0B\f\r]+")

    @F.pandas_udf(
        "struct<n_tokens:int,n_distinct:int,n_sw:int,char_sum:long>")
    def feats(text: pd.Series) -> pd.DataFrame:
        rows = []
        for t in text:
            toks = [x for x in ws.split(t)] if t else []
            toks = [x for x in toks if x]
            uniq = set(toks)
            rows.append((len(toks), len(uniq), len(sw & uniq),
                         sum(len(x) for x in toks)))
        return pd.DataFrame(rows, columns=["n_tokens", "n_distinct",
                                           "n_sw", "char_sum"])

    d = docs.select("doc_id", feats(F.col(text_col)).alias("f")).select(
        "doc_id",
        F.col("f.n_tokens").alias("n_tokens"),
        F.col("f.n_distinct").alias("n_distinct"),
        F.col("f.n_sw").alias("n_sw"),
        F.col("f.char_sum").alias("char_sum"),
    ).withColumn(
        "distinct_ratio",
        F.when(F.col("n_tokens") > 0,
               F.round(F.col("n_distinct") / F.col("n_tokens"), 6))
        .otherwise(F.lit(0.0)),
    ).withColumn(
        "stopword_ratio",
        F.when(F.col("n_tokens") > 0,
               F.round(F.col("n_sw") / F.col("n_distinct"), 6))
        .otherwise(F.lit(0.0)),
    ).withColumn(
        "mean_token_len",
        F.when(F.col("n_tokens") > 0,
               F.round(F.col("char_sum") / F.col("n_tokens"), 6))
        .otherwise(F.lit(0.0)),
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
    the per-token FNV hashing goes through the shared per-batch memo
    (dedup._fnv1a_tokens: each DISTINCT token hashed once per batch)."""
    from .dedup import _fnv1a_tokens

    P = np.uint64(1099511628211)

    @F.pandas_udf(LongType())
    def fp(text: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def one(t):
            toks = t.split() if t else []
            if not toks:
                return 0
            hs = _fnv1a_tokens(toks, cache)
            powers = np.ones(len(toks), dtype=np.uint64)
            if len(toks) > 1:
                powers[1:] = P
                # cumprod → [1, P, P², …]; reverse → P^(n-1-i) mod 2^64
                powers = np.cumprod(powers)[::-1]
            return int((hs * powers).sum() & np.uint64(0x7FFFFFFFFFFFFFFF))

        return text.map(one)

    return docs.select("doc_id", fp(F.col(text_col)).alias("fingerprint"))


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """function-word language ID heuristic → (doc_id, pred_lang);
    'und' when no profile matches. Broadcast profiles, one pandas UDF
    pass."""
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


# PII patterns shared by the engine and the DuckDB oracle. RE2-safe
# (no lookaround/backrefs) so Java regex (Spark) and RE2 (DuckDB)
# match identically; applied IN ORDER on the progressively scrubbed
# text (emails first — an address can contain IP/phone-shaped spans).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d-]{5,13}\d", "<PHONE>"),
]


def unigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """CCNet-style corpus-LM quality signal →
    (doc_id, n_tokens, bits_per_token).

    ``bits_per_token`` is the mean over the doc's (lowercased,
    whitespace-split) tokens of −log₂ p(w), where p(w) = cf(w)/total
    over THIS corpus — the self-perplexity proxy for the KenLM filter
    CCNet runs (no external model ships in this sandbox; the corpus's
    own unigram distribution is the deterministic, oracle-checkable
    stand-in). Low bits ⇒ function-word-like, typical text; high bits ⇒
    rare-token soup (lorem, base64, boilerplate navigation). Empty docs
    get 0.0.

    Plan shape: explode → one vocab-sized count agg → join back →
    per-doc avg, all JVM-side, one action. The token stream is scanned
    twice (stats pass + scoring pass) rather than persisted: at 100 TB
    a corpus-sized cache costs more than the second source scan, and
    both scans are narrow until their respective aggs. The cf join is
    vocab-sized on the build side — AQE broadcasts it for real-world
    vocabularies (≤ a few hundred M terms) and falls back to a shuffle
    join only when the vocabulary itself is at data scale."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                        r"\s+"),
                lambda x: x != "",
            )
        ).alias("tok"),
    )
    cf = toks.groupBy("tok").agg(F.count("*").alias("_c"))
    total = toks.agg(F.count("*").cast("double").alias("_n"))
    scored = (
        toks.join(cf, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(-F.log2(F.col("_c") / F.col("_n"))), 6)
            .alias("bits_per_token"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("bits_per_token"), F.lit(0.0))
            .alias("bits_per_token"),
        )
    )


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4 addresses / phone-shaped digit runs: the
    text column is replaced with the scrubbed form, every other input
    column passes through, and per-pattern n_email/n_ip/n_phone counts
    are appended.

    Narrow projection, zero shuffle, all JVM-side regex — the shape a
    100 TB scrub pass needs (reads text, writes text, nothing else
    moves). Counts are taken on the text as it stands before each
    pattern's own replacement, mirroring the oracle exactly."""
    cur = F.coalesce(F.col(text_col), F.lit(""))
    cols = []
    for name, pat, repl in PII_PATTERNS:
        cols.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    keep = [F.col(c) for c in docs.columns if c != text_col]
    return docs.select(*keep, cur.alias(text_col), *cols)


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     include_bigrams: bool = True) -> DataFrame:
    """Gopher/C4-style repetition signals →
    (doc_id, n_lines, dup_line_ratio[, top_bigram_frac]).

    * dup_line_ratio — fraction of non-empty lines that are repeats of
      an earlier line (1 − distinct/total); computed array-side per row,
      no shuffle.
    * top_bigram_frac — occurrences of the most frequent word bigram
      over total bigrams; explode → count keyed on (doc_id, bigram) —
      small derived keys, the scalable form of a per-doc mode.
      ``include_bigrams=False`` omits the column AND its two shuffle
      aggregations, keeping a lines-only pass fully shuffle-free (a
      caller filtering only on dup_line_ratio must not pay the bigram
      explode at 100 TB).
    Boilerplate-heavy pages score high on both; the standard prune
    thresholds are dup_line_ratio > 0.3, top_bigram_frac > 0.2."""
    lines = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\n"),
        lambda x: x != "",
    )
    dup_ratio = F.when(
        F.col("n_lines") > 0,
        F.round(F.lit(1.0) - F.col("n_distinct_lines") / F.col("n_lines"), 6),
    ).otherwise(F.lit(0.0)).alias("dup_line_ratio")
    base = docs.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        F.size(F.array_distinct(lines)).alias("n_distinct_lines"),
        F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
                 lambda x: x != "").alias("_toks"),
    )
    if not include_bigrams:
        return base.select("doc_id", "n_lines", dup_ratio)
    bigrams = F.when(
        F.size("_toks") >= 2,
        F.expr("transform(sequence(1, size(_toks) - 1), "
               "i -> concat_ws(' ', _toks[i - 1], _toks[i]))"),
    ).otherwise(F.array().cast("array<string>"))
    bg = base.select("doc_id", F.explode(bigrams).alias("bg")) \
        .groupBy("doc_id", "bg").count() \
        .groupBy("doc_id").agg(F.max("count").alias("_top"),
                               F.sum("count").alias("_total"))
    return (
        base.join(bg, "doc_id", "left")
        .select(
            "doc_id", "n_lines", dup_ratio,
            F.coalesce(F.round(F.col("_top") / F.col("_total"), 6),
                       F.lit(0.0)).alias("top_bigram_frac"),
        )
    )


def dedup_lines(docs: DataFrame, min_docs: int = 2,
                text_col: str = "text") -> DataFrame:
    """Corpus-level duplicate-line removal (the CCNet/RefinedWeb
    boilerplate stage): any NON-EMPTY line whose exact string occurs in
    ``min_docs`` or more DISTINCT documents is deleted from every
    document, and each text is rebuilt from its surviving lines in the
    original order. Nav bars, cookie banners, and SEO footers are
    line-identical across a site's pages, so this one pass removes them
    corpus-wide without any per-site configuration. Distinct-doc counts
    (not raw occurrences) mean a line repeated within a single document
    is NOT boilerplate by this signal — that is repetition_stats' job.
    Empty lines pass through (they are spacing, and deleting them
    would rewrite every document).

    → the input columns with ``text_col`` rewritten, plus
    ``n_lines_dropped`` per doc. The doc set is preserved: a document
    whose every line is boilerplate comes back with empty text, not
    dropped (dropping is a policy for the quality filter downstream).

    Scale shape, three key-partitioned shuffles (the minimum for exact
    corpus-wide line counts): (1) distinct-doc count per line; (2) the
    lines frame ANTI-joins the boilerplate set — only lines ABOVE the
    threshold ship to that join's build side, typically orders of
    magnitude smaller than the distinct-line universe, so AQE broadcasts
    it for real corpora; (3) rebuild keyed on doc_id. The hottest line
    ("Home") is one row after the count agg — partial aggregation
    absorbs the skew map-side."""
    lines = docs.select(
        F.col("doc_id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("_pos", "_line"),
    )
    boiler = (
        lines.filter(F.col("_line") != "")
        .groupBy("_line")
        .agg(F.countDistinct("doc_id").alias("_nd"))
        .filter(F.col("_nd") >= F.lit(int(min_docs)))
        .select("_line")
    )
    kept = lines.join(boiler, "_line", "left_anti")
    rebuilt = (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("_new_text"),
            F.count("*").alias("_n_kept"),
        )
    )
    n_lines = lines.groupBy("doc_id").agg(F.count("*").alias("_n_all"))
    others = [c for c in docs.columns if c != text_col]
    return (
        docs.join(rebuilt, "doc_id", "left")
        .join(n_lines, "doc_id")
        .select(
            *others,
            F.coalesce(F.col("_new_text"), F.lit("")).alias(text_col),
            (F.col("_n_all") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("long").alias("n_lines_dropped"),
        )
    )


#: GPT-2-family pre-tokenizer pattern, ASCII-deterministic subset:
#: words / digit runs / punctuation runs, each with an optional attached
#: leading space, plus whitespace runs (filtered out of the count).
#: Kept to constructs with identical semantics in Java regex (Spark) and
#: RE2 (DuckDB) so the oracle is byte-equivalent.
BPE_PRETOKEN_RE = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r]+|[ \t\n\r]+"


def bpe_pretoken_count(docs: DataFrame,
                       text_col: str = "text") -> DataFrame:
    """→ (doc_id, n_pretokens): the number of BPE PRE-tokens — the units
    a GPT-style byte-pair tokenizer merges within — under the shared
    BPE_PRETOKEN_RE. A far tighter LLM-token estimate than chars/4
    (token_count's n_subwords): real BPE only splits further inside a
    pre-token, so n_pretokens is a true LOWER bound on the token bill,
    and for English web text it tracks actual GPT-2 counts within
    ~15-20% without shipping a vocab. Narrow JVM projection (one
    regexp_extract_all + filter + size), shuffle-free — safe inside any
    100 TB pass."""
    toks = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")),
        F.lit(BPE_PRETOKEN_RE), 0)
    return docs.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: ~x.rlike(r"^[ \t\n\r]+$")))
        .cast(LongType()).alias("n_pretokens"),
    )


def bpe_pretoken_oracle_sql(table: str = "documents") -> str:
    """DuckDB oracle for bpe_pretoken_count — generated from
    BPE_PRETOKEN_RE (one source of truth)."""
    pat = BPE_PRETOKEN_RE.replace("'", "''")
    return rf"""
        SELECT doc_id,
               CAST(len(list_filter(
                   regexp_extract_all(COALESCE(text, ''), '{pat}'),
                   x -> NOT regexp_matches(x, '^[ \t\n\r]+$')))
                   AS BIGINT) AS n_pretokens
        FROM {table}
    """


def bigram_logprob(docs: DataFrame, lam: float = 0.8,
                   text_col: str = "text") -> DataFrame:
    """Interpolated-bigram corpus-LM quality signal →
    (doc_id, n_bigrams, bits_per_token) — one modeling step up from
    unigram_logprob toward the KenLM filter CCNet actually runs:

        p(wᵢ | wᵢ₋₁) = λ·c(wᵢ₋₁wᵢ)/hist(wᵢ₋₁) + (1−λ)·cf(wᵢ)/N

    with hist(w) = count of bigrams whose FIRST token is w (the true
    history count — c(w) would overcount docs' final tokens), all counts
    from THIS corpus. ``bits_per_token`` = mean −log₂p over the doc's
    bigram positions; docs with <2 tokens get 0.0.

    What a SELF-trained bigram LM can and cannot separate (pytest pins
    all three): repetitive boilerplate → near-zero bits (its bigrams
    repeat); rare continuations of COMMON histories (e.g. normal prose
    wandering into nonsense after a stopword) → high bits, a signal the
    unigram model underweights; hapax-token soup → LOW bigram bits,
    because a singleton history makes its one continuation look
    deterministic (cb/hist = 1/1) — self-scoring can never find its own
    singletons surprising. Soup is unigram_logprob's job (its cf/N term
    explodes there); run BOTH and filter on the pair, which is exactly
    the split CCNet resolves with an externally-trained KenLM that
    cannot ship in this sandbox.

    Plan shape: bigrams are built JVM-side from the token array
    (zip_with over two slices — no positional self-join), then three
    vocab-sized count aggs (bigram, history, unigram) join back onto the
    exploded bigram stream; AQE broadcasts the count sides for
    real-world vocabularies. Same two-scan trade as unigram_logprob."""
    toks_arr = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda x: x != "",
    )
    base = docs.select("doc_id", toks_arr.alias("_toks"))
    n = F.size("_toks")
    grams = base.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("_toks", F.lit(1), F.greatest(n - 1, F.lit(0))),
                F.slice("_toks", F.lit(2), F.greatest(n - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("gram"),
    )
    toks = base.select(F.explode("_toks").alias("tok"))
    cb = grams.groupBy("gram").agg(F.count("*").alias("_cb"))
    hist = (grams
            .select(F.substring_index("gram", " ", 1).alias("_w1h"))
            .groupBy("_w1h").agg(F.count("*").alias("_ch")))
    cf = toks.groupBy("tok").agg(F.count("*").alias("_cf"))
    total = toks.agg(F.count("*").cast("double").alias("_n"))
    p = (F.lit(lam) * F.col("_cb") / F.col("_ch")
         + F.lit(1.0 - lam) * F.col("_cf") / F.col("_n"))
    scored = (
        grams
        .withColumn("_w1", F.substring_index("gram", " ", 1))
        .withColumn("_w2", F.substring_index("gram", " ", -1))
        .join(cb, "gram")
        .join(hist, F.col("_w1") == F.col("_w1h"))
        .join(cf, F.col("_w2") == F.col("tok"))
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast(LongType()).alias("n_bigrams"),
            F.round(F.avg(-F.log2(p)), 6).alias("bits_per_token"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.coalesce(F.col("bits_per_token"), F.lit(0.0))
            .alias("bits_per_token"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", §A1.1) — the
# published rule set most large webtext pipelines (MassiveWeb,
# RefinedWeb, Dolma) start from. Pure JVM column expressions: every
# feature is a per-row array/string computation, so the operator is
# shuffle-free and whole-stage-codegen'd end to end.
# ---------------------------------------------------------------------------

#: Gopher's "must contain at least 2 of" function-word list (§A1.1).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(docs: DataFrame, min_words: int = 50,
                   max_words: int = 100_000,
                   text_col: str = "text") -> DataFrame:
    """Per-doc Gopher rule features + the composite pass flag →
    (doc_id, n_words, mean_word_len, frac_alpha, n_stop_hits,
    symbol_ratio, bullet_frac, ellipsis_frac, gopher_pass).

    Published thresholds (Rae et al. §A1.1), all pinned here:
    ``min_words ≤ n_words ≤ max_words``; mean word length in [3, 10];
    symbol-to-word ratio ('#' or ellipsis) ≤ 0.1; ≤ 90% of lines start
    with a bullet; ≤ 30% of lines end with an ellipsis; ≥ 80% of words
    contain an alphabetic character; ≥ 2 of the 8 Gopher function words
    present. Ratios are rounded to 6 for DuckDB-oracle parity; empty/
    NULL text fails the word-count rule with every ratio 0.0. Word split
    is the ASCII ``\\s+`` class ``_tokens`` uses; ellipses count both
    the three-dot spelling and U+2026."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = _tokens(text_col)
    lines = F.split(t, "\n")
    n_words = F.size(words)
    n_lines = F.size(lines)  # split never yields an empty array
    # Σ word lengths == chars left after deleting every whitespace run
    char_sum = F.length(F.regexp_replace(t, r"\s+", ""))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    n_stop = F.size(F.array_intersect(
        F.array_distinct(F.transform(words, F.lower)),
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
    ))
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_dots = (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    n_uell = F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit("")))
    n_bullet = F.size(F.filter(
        lines, lambda l: l.rlike(r"^[ \t]*[-*•]")))
    n_ellipsis_end = F.size(F.filter(
        lines, lambda l: l.rlike(r"(\.\.\.|…)[ \t]*$")))

    def ratio(num, den):
        return F.when(den > 0, F.round(num / den, 6)).otherwise(F.lit(0.0))

    d = docs.select(
        "doc_id",
        n_words.cast(LongType()).alias("n_words"),
        ratio(char_sum, n_words).alias("mean_word_len"),
        ratio(n_alpha, n_words).alias("frac_alpha"),
        n_stop.cast(LongType()).alias("n_stop_hits"),
        ratio(n_hash + n_dots + n_uell, n_words).alias("symbol_ratio"),
        F.round(n_bullet / n_lines, 6).alias("bullet_frac"),
        F.round(n_ellipsis_end / n_lines, 6).alias("ellipsis_frac"),
    )
    gopher_pass = (
        F.col("n_words").between(int(min_words), int(max_words))
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("bullet_frac") <= 0.9)
        & (F.col("ellipsis_frac") <= 0.3)
        & (F.col("frac_alpha") >= 0.8)
        & (F.col("n_stop_hits") >= 2)
    )
    return d.withColumn("gopher_pass", gopher_pass)


# ---------------------------------------------------------------------------
# C4 heuristic cleanup (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning...", §2.2) — the line-level + page-level rules the
# C4 corpus was built with. Row-local like gopher_quality: one
# shuffle-free projection.
# ---------------------------------------------------------------------------

#: C4's terminal punctuation set: period, exclamation mark, question
#: mark, end quotation mark (straight + curly).
C4_TERMINALS = (".", "!", "?", '"', "”")


def c4_line_filter(docs: DataFrame, min_words_per_line: int = 3,
                   min_kept_lines: int = 5,
                   require_terminal_punct: bool = True,
                   badwords: list[str] | None = None,
                   text_col: str = "text") -> DataFrame:
    """C4's page cleanup → the input columns with ``text_col`` rebuilt
    from the KEPT lines, plus (n_lines, n_lines_kept, killed_by).

    Line rules (a line survives iff ALL hold): ≥ ``min_words_per_line``
    words; does not contain the word "javascript" (case-insensitive);
    with ``require_terminal_punct`` (the paper's rule — pass False for
    corpora without sentence punctuation), ends in one of
    ``C4_TERMINALS`` after right-trim. Empty lines are dropped (unlike
    ``dedup_lines``: C4 rebuilds pages from surviving sentences, it does
    not preserve spacing).

    Page rules (``killed_by``, first match; NULL = survivor): 'brace'
    (contains "{" — the paper's code/JS heuristic), 'lorem_ipsum',
    'badword' (any of ``badwords`` as a substring of the lowercased
    text — the paper uses a public blocklist; ship your own, none is
    bundled), 'too_few_lines' (fewer than ``min_kept_lines`` surviving
    lines — the paper's ≥5-sentence rule with kept lines as the
    sentence proxy). The doc set is preserved — dropping killed rows is
    downstream policy, mirroring ``dedup_lines``."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    low = F.lower(t)
    lines = F.split(t, "\n")

    def line_ok(l):
        n_w = F.size(F.filter(F.split(l, r"\s+"), lambda x: x != ""))
        ok = (n_w >= int(min_words_per_line)) \
            & ~F.contains(F.lower(l), F.lit("javascript"))
        if require_terminal_punct:
            term = F.lit(False)
            for p in C4_TERMINALS:
                term = term | F.endswith(F.rtrim(l), F.lit(p))
            ok = ok & term
        return ok

    kept = F.filter(lines, line_ok)
    killed = F.when(F.contains(t, F.lit("{")), "brace") \
        .when(F.contains(low, F.lit("lorem ipsum")), "lorem_ipsum")
    if badwords:
        bad = F.lit(False)
        for w in badwords:
            bad = bad | F.contains(low, F.lit(str(w).lower()))
        killed = killed.when(bad, "badword")
    killed = killed.when(F.size(kept) < int(min_kept_lines),
                         "too_few_lines")
    others = [c for c in docs.columns if c != text_col]
    return docs.select(
        *others,
        F.array_join(kept, "\n").alias(text_col),
        F.size(lines).cast(LongType()).alias("n_lines"),
        F.size(kept).cast(LongType()).alias("n_lines_kept"),
        killed.cast(StringType()).alias("killed_by"),
    )
