"""Corpus-wide n-gram heavy hitters — exact top-k for boilerplate
discovery.

Every web-curation pipeline mines its corpus's most frequent word
n-grams: the head of that list IS the boilerplate (cookie banners,
nav bars, SEO footers), and the repetition filters' thresholds
(textquality.repetition_stats) are tuned against it. The reference
engine computes corpus term stats but nothing at the n-gram level
(index_builder.py aggregates unigram df/cf only), so this is a
pipeline-completing operator, not a port.

Plan shape: tokenize + gram-enumerate narrowly (no UDF — slice/
transform/explode are JVM HOFs), one count agg, one global top-k.
The agg shuffles the full gram stream, which is unavoidable for EXACT
counts — but map-side partial aggregation collapses it to one row per
(gram, map-partition) before the exchange, and the n-gram distribution
is Zipf: the head grams are exactly the ones partial agg compresses
best. The final top-k is a TakeOrderedAndProject (O(k) per partition),
never a global sort. For 100 TB with a tight latency budget the
published alternative is a count-min sketch + heap per partition
(approximate); the exact form ships because its answer is
oracle-checkable and its shuffle is already minimal for what it
promises.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._cache import PersistRegistry

_registry = PersistRegistry()


def release_caches() -> None:
    """Unpersist the module's cached summary frames (top_ngrams_approx).
    Each entry point drains before caching anew, so the registry holds
    at most one small frame between calls."""
    _registry.drain()


def top_ngrams(docs: DataFrame, n: int = 2, k: int = 20,
               text_col: str = "text") -> DataFrame:
    """→ (gram, cnt): the ``k`` most frequent word ``n``-grams over the
    lowercased, whitespace-split corpus, ties broken by gram text
    ascending (fully deterministic — the driver hashes the result).
    Docs shorter than ``n`` tokens contribute nothing."""
    if n < 1:
        raise ValueError(f"n must be >= 1: {n}")
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda x: x != "",
    )
    # sequence(1, x) is DESCENDING for x < 1 — guard short docs to an
    # empty gram array instead
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(k)
    )


def top_ngrams_oracle_sql(n: int = 2, k: int = 20,
                          table: str = "documents") -> str:
    """DuckDB oracle for top_ngrams() — generated so engine and oracle
    share n, k, and the tokenize/tie-break rules (one source of
    truth)."""
    return rf"""
        WITH w AS (SELECT list_filter(regexp_split_to_array(
                       lower(COALESCE(text, '')), '\s+'),
                       x -> x != '') AS toks
                   FROM {table}),
        g AS (SELECT unnest(list_transform(
                  generate_series(1, greatest(len(toks) - {n - 1}, 0)),
                  i -> array_to_string(toks[i:i+{n - 1}], ' '))) AS gram
              FROM w)
        SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM g GROUP BY gram
        ORDER BY cnt DESC, gram LIMIT {k}
    """


#: exact Java-regex \s class (ASCII) — the Python twin of the JVM
#: split(lower(text), r"\s+") that top_ngrams uses (same constant as
#: textquality's Arrow pass; Python's bare \s would also split Unicode
#: whitespace and break gram parity with the exact path)
_WS = re.compile(r"[ \t\n\x0B\f\r]+")


def top_ngrams_approx(docs: DataFrame, n: int = 2, k: int = 20,
                      capacity: int = 4096,
                      text_col: str = "text") -> DataFrame:
    """Approximate n-gram heavy hitters with BOUNDED per-task memory and
    BOUNDED shuffle — the 100 TB path next to top_ngrams' exact form.

    → (gram, cnt, err): ``cnt`` is a LOWER bound on the gram's true
    corpus count, and ``cnt + err`` an upper bound, where ``err`` is the
    summed eviction watermark of every input partition (a gram absent
    from a partition's summary can have occurred at most that
    partition's watermark times there). Ordered by (cnt desc, gram asc),
    top ``k``.

    Why it exists: the exact form's group-agg must shuffle one row per
    DISTINCT gram per map partition — on web text the gram tail is huge
    (most n-grams are unique), so at 100 TB that exchange carries nearly
    the whole tokenized corpus. This operator caps both sides: each task
    keeps a Counter of at most 8×``capacity`` entries (evicting down to
    ``capacity`` by (count desc, gram asc) and recording the largest
    evicted count as its watermark) and ships exactly ``capacity`` rows
    into the final agg. Any gram with true frequency > Σ watermarks is
    GUARANTEED to surface with cnt ≥ true − Σ watermarks (the classic
    lossy-counting argument); Zipf heads clear that bar by orders of
    magnitude, and the caller can verify from the emitted err whether
    the top-k order is provably exact (gap between ranks > err).

    Determinism: counting is exact per partition; eviction points depend
    only on the input partitioning and Arrow batch size, both fixed for
    a given input + session config. With ``capacity`` ≥ the distinct
    grams of every partition, no eviction happens, err = 0, and the
    result equals top_ngrams exactly (pytest-gated).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1: {n}")
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if capacity < k:
        raise ValueError(f"capacity must be >= k: {capacity} < {k}")
    watermark_len = 8 * capacity

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: Counter = Counter()
        err = 0

        def evict_to(keep: int) -> int:
            nonlocal err
            if len(counts) <= keep:
                return err
            kept = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            dropped_max = max(c for _, c in kept[keep:])
            err = max(err, dropped_max)
            counts.clear()
            counts.update(dict(kept[:keep]))
            return err

        for pdf in batches:
            for text in pdf[text_col]:
                if not text:
                    continue
                toks = [t for t in _WS.split(text.lower()) if t]
                if len(toks) < n:
                    continue
                counts.update(
                    " ".join(toks[i:i + n])
                    for i in range(len(toks) - n + 1)
                )
            if len(counts) > watermark_len:
                evict_to(capacity)
        evict_to(capacity)
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        yield pd.DataFrame(
            {"gram": [g for g, _ in top],
             "cnt": pd.Series([c for _, c in top], dtype="int64"),
             "err": pd.Series([err] * len(top), dtype="int64")}
        )

    # the summary frame feeds TWO aggregates (per-gram counts + the
    # global Σ-watermark bound), so cache it for the query's lifetime —
    # it holds ≤ capacity rows per task, tiny by construction. Drained
    # on the next call / release_caches(), the module-registry idiom
    # shared with operators.dedup.
    _registry.drain()
    summaries = docs.select(text_col).mapInPandas(
        summarize, "gram string, cnt long, err long"
    ).cache()
    _registry.add(summaries)
    merged = summaries.groupBy("gram").agg(F.sum("cnt").alias("cnt"))
    # every row of a task repeats that task's watermark — recover one
    # value per task via spark_partition_id (mapInPandas is 1:1 with its
    # input partitions), then Σ over tasks = the global undercount bound
    bound = (
        summaries.select(F.spark_partition_id().alias("_p"), "err")
        .groupBy("_p").agg(F.max("err").alias("_w"))
        .groupBy().agg(F.coalesce(F.sum("_w"), F.lit(0)).alias("err"))
    )
    return (
        merged.crossJoin(F.broadcast(bound))
        .select("gram", "cnt", "err")
        .orderBy(F.desc("cnt"), F.asc("gram"))
        .limit(k)
    )


def doc_keywords(postings: DataFrame, term_stats: DataFrame, n_docs: int,
                 m: int = 5) -> DataFrame:
    """Per-document tf-idf keyword extraction: the ``m`` highest-scoring
    terms of every doc, score = tf × ln(n_docs / df), rounded to 6 dp.

    → (doc_id, term, tfidf), ties by term ascending. The canonical
    corpus-annotation op (tag docs with their salient vocabulary for
    curation / clustering / eval slicing); the reference computes tf·idf
    weights only transiently inside VSM scoring (vector_space_model.py),
    never as a per-doc annotation.

    Plan shape: one join postings⋈term_stats on term (AQE broadcasts
    term_stats when the vocabulary is small; sort-merge otherwise — both
    sides partial-agg nothing, it is a straight enrich), then one window
    rank partitioned by doc_id — billions of small partitions, the
    window's sort is per-doc-local and never global. ln(n_docs/df) ≥ 0
    with equality on corpus-universal terms, which therefore rank last
    (kept: determinism beats cleverness; stopwords are already out of
    the postings when the full analyzer built them).
    """
    if n_docs < 1:
        raise ValueError(f"n_docs must be >= 1: {n_docs}")
    if m < 1:
        raise ValueError(f"m must be >= 1: {m}")
    scored = postings.select("term", "doc_id", "tf").join(
        term_stats.select("term", "df"), "term"
    ).select(
        "doc_id", "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6)
        .alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= m)
        .drop("_r")
    )


def doc_keywords_oracle_sql(n_docs_sql: str, m: int = 5,
                            tok_sql: str | None = None) -> str:
    """DuckDB oracle for doc_keywords() — ``tok_sql`` must yield
    (term, doc_id) one row per token occurrence (the caller's tokenizer
    contract), ``n_docs_sql`` a scalar subquery for the corpus size."""
    return f"""
        WITH tf AS (SELECT term, doc_id, COUNT(*) AS tf
                    FROM ({tok_sql}) GROUP BY 1, 2),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        s AS (SELECT tf.doc_id, tf.term,
                     ROUND(tf.tf * LN(({n_docs_sql}) * 1.0 / df.df), 6)
                     AS tfidf
              FROM tf JOIN df USING (term)),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                  ORDER BY tfidf DESC, term ASC) AS rn FROM s)
        SELECT doc_id, term, tfidf FROM r WHERE rn <= {m}
    """


def collocations(docs: DataFrame, k: int = 50, min_count: int = 5,
                 text_col: str = "text") -> DataFrame:
    """→ (w1, w2, n_ab, pmi): the ``k`` strongest adjacent-word
    collocations by pointwise mutual information,
    pmi = ln((n_ab/B) / ((n_a/N)·(n_b/N))) — the classic phrase-mining
    signal (multiword entities, boilerplate phrases) that raw bigram
    counts (top_ngrams) bury under stopword pairs.

    Same tokenization and bigram universe as ``top_ngrams(n=2)``; pairs
    below ``min_count`` are cut BEFORE the unigram joins (PMI of a
    hapax pair is noise, and the cut bounds the join input). N (tokens)
    and B (bigram instances) fold from ONE O(1) aggregate over doc
    token counts — no corpus-sized frame is persisted or re-read. The
    unigram-count joins let Spark pick the strategy (the vocabulary
    table may exceed broadcast size at web scale). Rank key is pmi
    rounded to 6 dp (ties → w1, w2 ASC) — the cross-engine
    determinism convention.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1: {min_count}")
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda x: x != "",
    )
    scal = docs.agg(
        F.sum(F.size(toks)).alias("n"),
        F.sum(F.greatest(F.size(toks) - 1, F.lit(0))).alias("b"),
    ).collect()[0]
    n_tok, n_big = int(scal["n"] or 0), int(scal["b"] or 0)
    if n_big == 0:
        return docs.sparkSession.createDataFrame(
            [], "w1 string, w2 string, n_ab long, pmi double")

    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.array_join(F.slice(toks, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = (
        docs.select(F.explode(grams).alias("gram"))
        .groupBy("gram").agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
        .select(F.split("gram", " ").getItem(0).alias("w1"),
                F.split("gram", " ").getItem(1).alias("w2"), "n_ab")
    )
    uni = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w").agg(F.count("*").alias("n_w"))
    )
    joined = (
        pairs
        .join(uni.select(F.col("w").alias("w1"),
                         F.col("n_w").alias("n_a")), "w1")
        .join(uni.select(F.col("w").alias("w2"),
                         F.col("n_w").alias("n_b")), "w2")
    )
    # double-division parenthesization mirrored EXACTLY in the oracle
    pmi = F.log(
        (F.col("n_ab").cast("double") / F.lit(float(n_big)))
        / ((F.col("n_a").cast("double") / F.lit(float(n_tok)))
           * (F.col("n_b").cast("double") / F.lit(float(n_tok))))
    )
    return (
        joined.select("w1", "w2", "n_ab", F.round(pmi, 6).alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )
