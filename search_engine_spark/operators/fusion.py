"""Rank fusion: hybrid sparse+dense retrieval via Reciprocal Rank Fusion.

The reference engine ranks with one model at a time (bm25 / vsm / lm —
search/retrieval/retrieval_execution.py:77-138 dispatches on the model
string); modern web retrieval serves a HYBRID of the lexical index and an
embedding index and fuses the two rankings. Reciprocal Rank Fusion
(Cormack, Clarke & Büttcher, SIGIR 2009) is the standard score-free
fuser — it needs no cross-model score calibration:

    fused(d) = Σ_runs 1 / (rrf_k + rank_run(d))      (rrf_k = 60 canon.)

Scale shape: fusion consumes ALREADY-BOUNDED top-``depth`` runs. A rank
only exists over a totally ordered list, and the depth cut happens
DISTRIBUTED inside each retriever (TakeOrderedAndProject for BM25,
the rounded-cosine ordered cut for the dense scan / ANN probe) — so the
rank window here is a single-partition window over O(n_runs × depth)
rows, driver-bounded by contract, never corpus-scale. The corpus-scale
work stays in the per-run plans; the fuse itself adds one union + one
group-agg over ≤ n_runs·depth rows.

Determinism: ranks are assigned over (score desc, id asc); callers that
need cross-engine rank identity must round scores BEFORE the depth cut
(the driver entry rounds BM25 at 4dp and the cosine run is already
rounded at 6dp inside ``similarity.cosine_topk``), so equal-at-rounding
scores rank by id on both engines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranked_run(run: DataFrame, id_col: str = "doc_id",
               score_col: str = "score") -> DataFrame:
    """(id, score) → (id, rank) with rank = ROW_NUMBER over
    (score desc, id asc). Single-partition window BY DESIGN — the input
    contract is a depth-bounded top-k run (see module docstring), so the
    window never sees more than ``depth`` rows."""
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return run.select(F.col(id_col), F.row_number().over(w).alias("rank"))


def rrf_fuse(runs: list[DataFrame], k: int = 10, rrf_k: int = 60,
             id_col: str = "doc_id", score_col: str = "score") -> DataFrame:
    """Fuse ranked runs into (id, rrf_score) top-k.

    Each run is a depth-bounded (id, score) frame; a document missing
    from a run simply contributes nothing for that run (the standard RRF
    convention — no imputed rank). Tie-break (rrf_score desc, id asc).
    """
    if not runs:
        raise ValueError("rrf_fuse needs at least one run")
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if rrf_k <= 0:
        raise ValueError(f"rrf_k must be > 0: {rrf_k}")
    ranked = [ranked_run(r, id_col=id_col, score_col=score_col)
              for r in runs]
    u = reduce(lambda a, b: a.unionByName(b), ranked)
    fused = u.groupBy(id_col).agg(
        F.sum(F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank")))
        .alias("rrf_score"))
    return (fused.orderBy(F.desc("rrf_score"), F.asc(id_col)).limit(k))


def search_hybrid(index, embeddings: DataFrame, toks: list[str],
                  qvec: list[float], k: int = 10, depth: int = 100,
                  rrf_k: int = 60, model: str = "bm25",
                  vec_id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Hybrid lexical+dense retrieval: BM25 (or lm-*) top-``depth`` and
    brute-force cosine top-``depth`` over an embedding table keyed by
    the SAME document ids, fused with RRF into a top-``k``.

    ``embeddings`` rows whose id has no text (or vice versa) still fuse
    correctly — RRF scores whatever each run retrieved. The dense run
    here is the exact cosine scan; swapping in ``similarity.ivf_topk``
    or ``pq_topk`` for the 100 TB serving path changes only the run
    frame, not the fusion.
    """
    from . import search as S
    from . import similarity

    if depth < 1:
        raise ValueError(f"depth must be >= 1: {depth}")
    sparse = S.search_freetext_tokens(index, toks, k=depth, model=model)
    dense = similarity.cosine_topk(
        embeddings, qvec, k=depth, vec_col=vec_col, id_col=vec_id_col
    ).select(F.col("vec_id").alias("doc_id"), F.col("cosine").alias("score"))
    return rrf_fuse([sparse, dense], k=k, rrf_k=rrf_k)
