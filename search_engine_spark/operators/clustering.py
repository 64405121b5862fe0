"""Distributed embedding clustering — spherical k-means as DataFrame
ops, the corpus-partitioning step an LLM-data pipeline runs between
similarity search and mixture design (topic balancing, SemDeDup cell
fitting at full scale, cluster-stratified sampling).

The reference engine has no clustering (its retrieval is term-based;
SURVEY §2 has no vector ops); this is a first-class LLM-pipeline
operator per the task brief, and it retires the bounded driver-side
Lloyd's in ``similarity.ivf_fit``/``pq_fit`` for the case where the
sketch itself would be too big: here the per-iteration work is fully
distributed and only k×(dim+2) numbers ever reach the driver.

No ML library: one Lloyd's iteration IS a pair of DataFrame operators —

* assign  — argmax cosine(x, cᵢ) over centroids shipped as LITERALS:
            a shuffle-free JVM projection (``F.aggregate``/``zip_with``
            fold per centroid, ``array_max`` over (sim, −cluster)
            structs for the tie-broken argmax). No Python, no join.
* update  — groupBy(cluster).agg(dim avg columns + count): ONE
            map-side-combined aggregate whose output is k rows; the
            driver renormalizes to unit length (spherical k-means) and
            re-ships the next centroids as literals.

Scale shape at 100 TB: the assign scan reads each vector once per
iteration with no shuffle; the update shuffles k×dim partial sums per
partition (bytes, not vectors). Persist the input once per training
session — every iteration re-reads only (id, vector).

Determinism: assignment rounds cosine to 6 dp before the argmax — the
same rank-key convention as ``similarity.cosine_topk`` — so the
assignment is exactly reproducible cross-engine (the ``kmeans_assign``
driver entry gates it against a DuckDB argmax replay). Centroid UPDATES
are float avg() sums whose combine order Spark does not pin, so trained
centroids agree run-to-run only to ~1e-12; tests gate training on
tolerances and on parity with a numpy replica of the same updates
(the ``classifier.train_quality_classifier`` pattern).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import hash_bucket

#: assignment rank-key precision (matches similarity.cosine_topk)
SIM_DECIMALS = 6


def _check_centroids(centroids: list[list[float]]) -> int:
    if not centroids:
        raise ValueError("centroids must be non-empty")
    dim = len(centroids[0])
    for i, c in enumerate(centroids):
        if len(c) != dim:
            raise ValueError(
                f"centroid {i} has dim {len(c)}, expected {dim}")
        if not math.isfinite(math.sqrt(sum(x * x for x in c))) \
                or sum(x * x for x in c) == 0.0:
            raise ValueError(f"centroid {i} must be finite and non-zero")
    return dim


def _cos_lit(vec_col: Column, centroid: list[float]) -> Column:
    """cosine(x, c) with c as literals — the cosine_topk formula
    verbatim (left-fold dot, python-float centroid norm) so the DuckDB
    ``list_cosine_similarity`` oracle reproduces it at 6 dp."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    dot = F.aggregate(F.zip_with(vec_col, c, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    xnorm = F.sqrt(F.aggregate(vec_col, F.lit(0.0),
                               lambda acc, x: acc + x * x))
    cnorm = math.sqrt(sum(x * x for x in centroid))
    return dot / (xnorm * F.lit(cnorm))


def _best_struct(vec_col: Column, centroids: list[list[float]]) -> Column:
    """struct(sim, negc) of the winning centroid: array_max compares
    fields in order, so max sim wins and ties go to the LOWEST cluster
    id (negc = −cluster). sim is pre-rounded to SIM_DECIMALS — the
    cross-engine determinism key."""
    cand = F.array(*[
        F.struct(
            F.round(_cos_lit(vec_col, c), SIM_DECIMALS).alias("sim"),
            F.lit(-i).alias("negc"),
        )
        for i, c in enumerate(centroids)
    ])
    return F.array_max(cand)


def kmeans_assign(embeddings: DataFrame, centroids: list[list[float]],
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """→ (vec_id, cluster, sim): each vector's nearest centroid by
    cosine (ties → lowest cluster id). Shuffle-free JVM projection —
    the serving/partitioning pass."""
    _check_centroids(centroids)
    best = _best_struct(F.col(vec_col), centroids)
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        (-best["negc"]).alias("cluster"),
        best["sim"].alias("sim"),
    )


def seed_centroids(embeddings: DataFrame, k: int,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> list[list[float]]:
    """k deterministic, content-hash-spread seed vectors: the k rows
    with the smallest (md5-bucket(id), id) key — representative under
    ANY id order (crawl-sorted, topic-sorted), the same de-biasing rule
    as ``similarity.ivf_fit``'s sketch. O(k) driver transfer."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    rows = (
        embeddings
        .select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy(hash_bucket(F.col("_id"), "kmeans:"), F.col("_id"))
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"need at least k={k} vectors, found {len(rows)}")
    return [[float(x) for x in r._v] for r in rows]


def kmeans_train(embeddings: DataFrame, k: int | None = None,
                 iters: int = 10,
                 init: list[list[float]] | None = None,
                 vec_col: str = "embedding",
                 id_col: str = "vec_id") -> list[list[float]]:
    """Spherical k-means by Lloyd's iterations, fully distributed:
    assign (shuffle-free literal-centroid scan) → update (ONE map-side-
    combined groupBy(cluster) aggregate of dim avg columns) → driver
    renormalizes k unit centroids and re-ships them as literals.

    ``init`` takes explicit start centroids (tests / warm restarts);
    otherwise ``seed_centroids(k)`` picks content-hash-spread seeds.
    An emptied cluster keeps its previous centroid (the standard
    Lloyd's guard). Returns the k unit-norm centroids; only k×(dim+2)
    numbers ever cross to the driver per iteration.
    """
    if iters < 0:
        raise ValueError(f"iters must be >= 0: {iters}")
    if init is not None:
        centroids = [list(map(float, c)) for c in init]
        _check_centroids(centroids)
    elif k is not None:
        centroids = seed_centroids(embeddings, k, vec_col, id_col)
    else:
        raise ValueError("pass k or init")
    dim = len(centroids[0])

    src = embeddings.select(F.col(vec_col).alias("_v"))
    for _ in range(iters):
        best = _best_struct(F.col("_v"), centroids)
        assigned = src.select((-best["negc"]).alias("_c"), "_v")
        stats = (
            assigned.groupBy("_c")
            .agg(F.count("*").alias("_n"),
                 *[F.avg(F.col("_v").getItem(j)).alias(f"m{j}")
                   for j in range(dim)])
            .collect()
        )
        nxt = list(centroids)  # emptied clusters keep their centroid
        for row in stats:
            mean = [row[f"m{j}"] for j in range(dim)]
            nrm = math.sqrt(sum(x * x for x in mean))
            if nrm > 0.0:
                nxt[row["_c"]] = [x / nrm for x in mean]
        centroids = nxt
    return centroids
