"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-k over sf0.001 documents.
``queries()`` / ``oracle_sql()`` — one pair per SQL-expressible operator
from SURVEY.md §2; DuckDB runs the SQL on the same parquet (views are
pre-registered by the driver).

Column-name & value parity rules used throughout:
* every computed column aliased identically on both sides;
* doubles rounded to 4-5 decimals on both sides before comparison;
* top-k ordered by (rounded score desc, doc_id asc) on both sides.

The oracle-gated text queries use the ``simple`` analyzer (tokenize+fold
only) so the chain stays ANSI-SQL-expressible; the full reference chain
(stopwords + Porter) is covered by pytest rank-identity tests against
tests/oracle.py, which SQL cannot express.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark import engine
from search_engine_spark.functions.analyzer import AnalyzerConfig
from search_engine_spark.operators import postings as P
from search_engine_spark.operators import search as S
from search_engine_spark.sources import corpus

SIMPLE = AnalyzerConfig.simple()

# Tokenization used by the oracle SQL (text is single-space-joined lowercase
# words in the driver tables — verified equal to the Python regex analyzer).
_TOK = "SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents"

_BM25_QUERY_TERMS = ["spark", "query", "join"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.read_documents(spark, sf_dir)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the inverted index over sf0.001 documents and run a
    BM25 top-k free-text query end-to-end."""
    docs = _docs(spark, "/root/testdata/sf0.001")
    idx = engine.build_index(docs, AnalyzerConfig.full())
    return S.search_freetext(idx, "spark query join fast", k=100, model="bm25")


# ---------------------------------------------------------------------------
# queries() — each callable: (spark, sf_dir) -> DataFrame
# ---------------------------------------------------------------------------

def q_term_doc_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    post = P.build_postings(_docs(spark, sf_dir), SIMPLE, positional=False)
    return post.select("term", "doc_id", "tf")


def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    post = P.build_postings(_docs(spark, sf_dir), SIMPLE, positional=False)
    return P.term_stats(post).select(
        "term", F.col("df").cast("long").alias("df"), F.col("cf").cast("long").alias("cf")
    )


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = P.doc_stats(_docs(spark, sf_dir), SIMPLE)
    return ds.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
        F.round(F.avg("dl"), 4).alias("avgdl"),
    )


def q_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.doc_stats(_docs(spark, sf_dir), SIMPLE).select(
        "doc_id", F.col("dl").cast("long").alias("dl")
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    idx = engine.build_index(docs, SIMPLE, positional=False, cache=False)
    terms = _BM25_QUERY_TERMS
    scored = S._scored_frame(idx, terms, "bm25")
    agg = scored.groupBy("doc_id").agg(F.round(F.sum("weight"), 4).alias("score"))
    return agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(100)


def q_boolean_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    post = P.build_postings(_docs(spark, sf_dir), SIMPLE, positional=False)
    a = post.filter(F.col("term") == "spark").select("doc_id")
    b = post.filter(F.col("term") == "vector").select("doc_id")
    return a.join(b, "doc_id", "left_semi")


def q_boolean_or_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(spark OR vector) AND NOT dup — set algebra as joins (Q10)."""
    post = P.build_postings(_docs(spark, sf_dir), SIMPLE, positional=False)
    a = post.filter(F.col("term") == "spark").select("doc_id")
    b = post.filter(F.col("term") == "vector").select("doc_id")
    c = post.filter(F.col("term") == "dup").select("doc_id")
    return a.union(b).distinct().join(c, "doc_id", "left_anti")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "term_doc_tf": q_term_doc_tf,
        "term_stats": q_term_stats,
        "corpus_stats": q_corpus_stats,
        "doc_lengths": q_doc_lengths,
        "bm25_topk": q_bm25_topk,
        "boolean_and": q_boolean_and,
        "boolean_or_not": q_boolean_or_not,
    }


# ---------------------------------------------------------------------------
# oracle_sql() — DuckDB ANSI SQL over the same parquet views
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    bm25_terms = ", ".join(f"('{t}')" for t in _BM25_QUERY_TERMS)
    return {
        "term_doc_tf": f"""
            SELECT term, doc_id, CAST(COUNT(*) AS INT) AS tf
            FROM ({_TOK}) GROUP BY term, doc_id
        """,
        "term_stats": f"""
            WITH tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM ({_TOK}) GROUP BY 1, 2)
            SELECT term, COUNT(*) AS df, SUM(tf) AS cf FROM tf GROUP BY term
        """,
        "corpus_stats": f"""
            WITH dl AS (SELECT doc_id, COUNT(*) AS dl FROM ({_TOK}) GROUP BY 1)
            SELECT COUNT(*) AS n_docs, SUM(dl) AS total_tokens,
                   ROUND(AVG(dl), 4) AS avgdl FROM dl
        """,
        "doc_lengths": f"""
            SELECT doc_id, COUNT(*) AS dl FROM ({_TOK}) GROUP BY doc_id
        """,
        "bm25_topk": f"""
            WITH tok AS ({_TOK}),
            tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
            dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
            stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
            df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
            q(term) AS (VALUES {bm25_terms}),
            w AS (
                SELECT tf.doc_id,
                       LN(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                       * tf.tf * 2.2
                       / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) AS wt
                FROM tf JOIN q USING (term) JOIN df USING (term)
                JOIN dl USING (doc_id) CROSS JOIN stats s
            )
            SELECT doc_id, ROUND(SUM(wt), 4) AS score
            FROM w GROUP BY doc_id
            ORDER BY score DESC, doc_id ASC LIMIT 100
        """,
        "boolean_and": f"""
            WITH tok AS ({_TOK})
            SELECT DISTINCT doc_id FROM tok WHERE term = 'spark'
            AND doc_id IN (SELECT doc_id FROM tok WHERE term = 'vector')
        """,
        "boolean_or_not": f"""
            WITH tok AS ({_TOK})
            SELECT DISTINCT doc_id FROM tok
            WHERE term IN ('spark', 'vector')
            AND doc_id NOT IN (SELECT doc_id FROM tok WHERE term = 'dup')
        """,
    }
