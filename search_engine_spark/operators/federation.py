"""Selective search: CORI shard resource selection + routed querying.

The north rule targets a 10^12-doc corpus on a multi-executor cluster. At
that scale a single monolithic index is the wrong serving shape — real
web engines document-partition the corpus into S shards (hash- or
topic-assigned) and ROUTE each query to the few shards likely to hold
its results (selective search; Callan's CORI resource-selection formula,
INQUERY / TREC federated track — public literature). The reference is a
single-node engine (one dict index, search/retrieval/retrieval_main.py),
so this module is scale surface the reference cannot express: the same
query semantics, federated.

Spark-first decomposition:

* shard assignment — a deterministic md5 bucket on ``doc_id``
  (``sampling.hash_bucket``; growth-stable, order-independent) or a
  topical assignment from ``clustering.kmeans_assign``. Hash assignment
  is a pure column EXPRESSION, so restricting an index to shards is a
  FILTER (pushes to the parquet scan) — no join, no shuffle.
* shard language models — one join postings⋈assignment on doc_id (hash
  join, co-partitionable on a real cluster) + a (shard, term) groupBy
  with map-side partial agg. Output is |V|·|S| rows, built ONCE at
  index time; at web scale the routing table is pruned to df_s ≥
  min_df before persisting (the tail a router can never usefully score).
* CORI scoring — query-time cost is |q|·|S| rows: filter the routing
  table to the query terms (pushes down), broadcast-join the per-shard
  sizes, one groupBy(shard). Shard count is O(1000) — the score table
  and the selected-shard list are bounded driver values by design.
* routed search — global corpus statistics (df, avgdl, n_docs) are kept
  for scoring, so shard routing changes RECALL only, never the score of
  a doc that is retrieved: selecting all shards is rank-identical to the
  unrouted search (the driver-oracle identity gate), and any subset's
  scores are a sub-multiset of the full ranking's.

CORI belief (b=0.4 default, the published constant):

    T = df_s / (df_s + 50 + 150 · cw_s / avg_cw)
    I = log((S + 0.5) / cf_t) / log(S + 1.0)
    p(t|s) = b + (1 − b) · T · I         (absent term ⇒ df_s=0 ⇒ b)
    score(q|s) = Σ_t p(t|s)

where df_s = docs in shard s containing t, cw_s = tokens in shard s,
cf_t = number of shards containing t.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import hash_bucket
from .search import InvertedIndex, search_freetext_tokens

#: published CORI default belief floor
CORI_B = 0.4


def shard_expr(key_col: Column, n_shards: int, salt: str = "") -> Column:
    """Deterministic shard id in [0, n_shards) for a key column — the
    md5-bucket idiom (purpose salt 'shard:' keeps the stream independent
    of split/sample/mixture buckets). A pure expression: usable both to
    MATERIALIZE an assignment and to FILTER an index without a join."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive: {n_shards}")
    return hash_bucket(key_col, "shard:" + salt, n_shards)


def assign_shards(docs: DataFrame, n_shards: int, key_col: str = "doc_id",
                  salt: str = "") -> DataFrame:
    """(doc_id, shard) hash assignment. Shuffle-free, order-independent,
    growth-stable (a new doc never moves an old doc's shard)."""
    return docs.select(
        key_col, shard_expr(F.col(key_col), n_shards, salt).alias("shard"))


def shard_stats(postings: DataFrame, doc_stats: DataFrame,
                assignment: DataFrame,
                min_df: int = 1) -> tuple[DataFrame, DataFrame]:
    """Build the routing tables: per-(shard, term) language-model stats
    and per-shard sizes.

    Returns ``(term_shard_stats, shard_sizes)``:

    * term_shard_stats: (shard, term, df_s, cf_s) — one row per term per
      shard that contains it. ``min_df`` prunes the long tail before the
      table is persisted (at 10^12 docs the full |V|·|S| table is
      dominated by df_s=1 hapaxes a router can never usefully rank on).
    * shard_sizes: (shard, n_docs_s, cw_s) — |S| rows.

    Scale shape: ONE hash join on doc_id (postings and assignment both
    key on it — co-partitionable / storage-bucketed on a real cluster)
    and one (shard, term) groupBy with map-side partial aggregation.
    Built once per index build, not per query.
    """
    joined = postings.select("term", "doc_id", "tf").join(assignment, "doc_id")
    ts = (joined.groupBy("shard", "term")
          .agg(F.count("*").cast("long").alias("df_s"),
               F.sum("tf").cast("long").alias("cf_s")))
    if min_df > 1:
        ts = ts.filter(F.col("df_s") >= min_df)
    sizes = (doc_stats.join(assignment, "doc_id")
             .groupBy("shard")
             .agg(F.count("*").cast("long").alias("n_docs_s"),
                  F.sum("dl").cast("long").alias("cw_s")))
    return ts, sizes


def cori_scores(term_shard_stats: DataFrame, shard_sizes: DataFrame,
                terms: list[str], b: float = CORI_B) -> DataFrame:
    """(shard, score) CORI resource ranking for the (deduped) query terms.

    Every shard appears (a shard holding none of the terms scores the
    floor |q|·b), so downstream top-m selection is total. Query-time
    plan: filter the routing table to |q| terms (predicate pushdown),
    broadcast the |q|-row cf table and the |S|-row sizes, ONE
    groupBy(shard) — no corpus-scale frame is touched.
    """
    terms = sorted(set(terms))
    if not terms:
        raise ValueError("cori_scores needs at least one query term")
    # bounded driver scalars: |S| rows and one avg
    sz = shard_sizes.agg(F.count("*").alias("s"),
                         F.avg("cw_s").alias("avg_cw")).first()
    n_shards, avg_cw = int(sz["s"]), float(sz["avg_cw"])
    qs = term_shard_stats.filter(F.col("term").isin(terms))
    cf = qs.groupBy("term").agg(F.count("*").alias("cf_t"))
    joined = (qs.join(F.broadcast(cf), "term")
              .join(F.broadcast(shard_sizes.select("shard", "cw_s")),
                    "shard"))
    t_belief = F.col("df_s") / (F.col("df_s") + 50.0
                                + 150.0 * F.col("cw_s") / F.lit(avg_cw))
    i_belief = (F.log(F.lit(float(n_shards) + 0.5) / F.col("cf_t"))
                / math.log(n_shards + 1.0))
    per_shard = joined.groupBy("shard").agg(
        F.sum(t_belief * i_belief).alias("ti_sum"))
    floor = len(terms) * b
    return (shard_sizes.select("shard")
            .join(per_shard, "shard", "left")
            .select("shard",
                    F.round(floor + (1.0 - b)
                            * F.coalesce(F.col("ti_sum"), F.lit(0.0)),
                            6).alias("score")))


def select_shards(scores: DataFrame, m: int) -> list[int]:
    """Top-m shard ids by (score desc, shard asc) — an O(|S|) bounded
    driver transfer (shard count is a config constant, not data-scale)."""
    if m < 1:
        raise ValueError(f"m must be >= 1: {m}")
    rows = scores.orderBy(F.desc("score"), F.asc("shard")).limit(m).collect()
    return [int(r["shard"]) for r in rows]


def restrict_index_hash(index: InvertedIndex, n_shards: int,
                        shard_ids: list[int],
                        salt: str = "") -> InvertedIndex:
    """Index handle restricted to hash shards — a pure FILTER on the
    deterministic shard expression (no join, no shuffle; pushes into the
    scan as a row-level predicate). Global term_stats/stats are KEPT so
    routed scores equal unrouted scores doc-for-doc."""
    ids = [int(s) for s in shard_ids]
    pred = shard_expr(F.col("doc_id"), n_shards, salt).isin(ids)
    return InvertedIndex(
        postings=index.postings.filter(pred),
        doc_stats=index.doc_stats.filter(pred),
        term_stats=index.term_stats, stats=index.stats,
        documents=index.documents, analyzer=index.analyzer)


def restrict_index_assigned(index: InvertedIndex, assignment: DataFrame,
                            shard_ids: list[int]) -> InvertedIndex:
    """Index handle restricted via a MATERIALIZED assignment (topical /
    kmeans shards, where membership is not an expression): one left-semi
    join on doc_id per side. Global stats kept, as above."""
    ids = [int(s) for s in shard_ids]
    sel = assignment.filter(F.col("shard").isin(ids)).select("doc_id")
    return InvertedIndex(
        postings=index.postings.join(sel, "doc_id", "left_semi"),
        doc_stats=index.doc_stats.join(sel, "doc_id", "left_semi"),
        term_stats=index.term_stats, stats=index.stats,
        documents=index.documents, analyzer=index.analyzer)


def search_routed(index: InvertedIndex, toks: list[str],
                  term_shard_stats: DataFrame, shard_sizes: DataFrame,
                  n_shards: int, m: int, k: int | None = 100,
                  model: str = "bm25", salt: str = "",
                  assignment: DataFrame | None = None,
                  b: float = CORI_B) -> DataFrame:
    """End-to-end selective search: CORI-rank the shards for ``toks``,
    restrict the index to the top-``m``, run the standard free-text
    scorer with GLOBAL statistics. ``m >= n_shards`` is rank-identical
    to the unrouted search (the oracle gate); smaller m trades recall
    for touching 1/S of the posting data per query."""
    ranked = cori_scores(term_shard_stats, shard_sizes, toks, b=b)
    chosen = select_shards(ranked, m)
    if assignment is not None:
        sub = restrict_index_assigned(index, assignment, chosen)
    else:
        sub = restrict_index_hash(index, n_shards, chosen, salt=salt)
    return search_freetext_tokens(sub, toks, k=k, model=model)
