"""Distributed embedding clustering — k-means (spherical/cosine by
default, classic Euclidean via ``metric='l2'``) as DataFrame ops, the
corpus-partitioning step an LLM-data pipeline runs between similarity
search and mixture design (topic balancing, SemDeDup cell fitting at
full scale, cluster-stratified sampling, IVF coarse quantizers beyond
the driver's sketch envelope).

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


#: k×dim bound on literal-centroid plans: centroids ship as plan
#: LITERALS (that is what makes the assignment scan shuffle-free), so
#: plan size grows with k×dim — fine for the documented topic-shard use
#: (k ≤ hundreds), but a k=10⁴ × dim=768 call would ship ~8M literals
#: and blow up codegen. 262144 (k·dim, ≈2 MB of doubles) is far above
#: any sane literal plan and far below where codegen falls over; larger
#: models belong in the IVF/PQ catalog artifacts (broadcast data, not
#: plan text).
MAX_CENTROID_LITERALS = 262_144


def _check_centroids(centroids: list[list[float]]) -> int:
    if not centroids:
        raise ValueError("centroids must be non-empty")
    dim = len(centroids[0])
    if len(centroids) * dim > MAX_CENTROID_LITERALS:
        raise ValueError(
            f"k x dim = {len(centroids)} x {dim} = "
            f"{len(centroids) * dim} exceeds MAX_CENTROID_LITERALS "
            f"({MAX_CENTROID_LITERALS}): literal-centroid plans of this "
            "size break codegen. Use the IVF/PQ ANN artifacts "
            "(catalog.build_ann_index) for large codebooks — they ship "
            "as data, not as plan text.")
    for i, c in enumerate(centroids):
        if len(c) != dim:
            raise ValueError(
                f"centroid {i} has dim {len(c)}, expected {dim}")
        if not math.isfinite(math.sqrt(sum(x * x for x in c))) \
                or sum(x * x for x in c) == 0.0:
            raise ValueError(f"centroid {i} must be finite and non-zero")
    return dim


def _xsq(vec_col: Column) -> Column:
    """‖x‖² fold — hoisted ONCE per row into a projection column before
    the per-centroid candidates (computing it inside each candidate
    would repeat a dim-wide fold k times per row and inflate the
    generated code k-fold)."""
    return F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x)


def _cos_lit(vec_col: Column, centroid: list[float],
             xsq_col: Column | None = None) -> Column:
    """cosine(x, c) with c as literals — the cosine_topk formula
    verbatim (left-fold dot, python-float centroid norm, ÷ (‖x‖·‖c‖))
    so the DuckDB ``list_cosine_similarity`` oracle reproduces it at
    6 dp. ``xsq_col`` supplies a pre-hoisted ‖x‖² column (identical
    arithmetic — sqrt of the same fold)."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    dot = F.aggregate(F.zip_with(vec_col, c, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    xnorm = F.sqrt(_xsq(vec_col) if xsq_col is None else xsq_col)
    cnorm = math.sqrt(sum(x * x for x in centroid))
    return dot / (xnorm * F.lit(cnorm))


def _neg_l2sq_lit(vec_col: Column, centroid: list[float],
                  xsq_col: Column | None = None) -> Column:
    """−‖x − c‖² via the expansion −(‖x‖² − 2x·c + ‖c‖²), with ‖c‖²
    folded on the driver — the l2 analogue of _cos_lit (higher =
    closer, so the same argmax machinery serves both metrics)."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    dot = F.aggregate(F.zip_with(vec_col, c, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    xsq = _xsq(vec_col) if xsq_col is None else xsq_col
    csq = sum(x * x for x in centroid)
    return -(xsq - F.lit(2.0) * dot + F.lit(csq))


def _check_metric(metric: str) -> None:
    if metric not in ("cosine", "l2"):
        raise ValueError(f"metric must be 'cosine' or 'l2': {metric!r}")


def _best_struct(vec_col: Column, centroids: list[list[float]],
                 metric: str = "cosine",
                 xsq_col: Column | None = None) -> Column:
    """struct(sim, negc) of the winning centroid: array_max compares
    fields in order, so max sim wins and ties go to the LOWEST cluster
    id (negc = −cluster). sim is pre-rounded to SIM_DECIMALS — the
    cross-engine determinism key. For metric='l2', sim is −‖x−c‖²
    (same higher-is-closer ordering; see _neg_l2sq_lit)."""
    score = _cos_lit if metric == "cosine" else _neg_l2sq_lit
    cand = F.array(*[
        F.struct(
            F.round(score(vec_col, c, xsq_col), SIM_DECIMALS).alias("sim"),
            F.lit(-i).alias("negc"),
        )
        for i, c in enumerate(centroids)
    ])
    return F.array_max(cand)


def kmeans_assign(embeddings: DataFrame, centroids: list[list[float]],
                  vec_col: str = "embedding",
                  id_col: str = "vec_id",
                  metric: str = "cosine") -> DataFrame:
    """→ (vec_id, cluster, sim): each vector's nearest centroid by
    cosine — or squared-L2 with ``metric='l2'``, where sim = −‖x−c‖²
    (ties → lowest cluster id either way). Shuffle-free JVM projection —
    the serving/partitioning pass."""
    _check_metric(metric)
    _check_centroids(centroids)
    pre = embeddings.select(F.col(id_col).alias("vec_id"),
                            F.col(vec_col).alias("_v"),
                            _xsq(F.col(vec_col)).alias("_xsq"))
    best = _best_struct(F.col("_v"), centroids, metric, F.col("_xsq"))
    return pre.select(
        "vec_id",
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
                 id_col: str = "vec_id",
                 metric: str = "cosine") -> list[list[float]]:
    """k-means by Lloyd's iterations, fully distributed: assign
    (shuffle-free literal-centroid scan) → update (ONE map-side-
    combined groupBy(cluster) aggregate of dim avg columns) → the
    driver re-ships k centroids as literals.

    ``metric='cosine'`` (default) is SPHERICAL k-means: centroids are
    the L2-normalized cluster means. ``metric='l2'`` is classic
    Euclidean Lloyd's: centroids are the plain means — the variant
    ``similarity.ivf_fit(distributed=True)`` uses when the fit sketch
    would exceed the driver envelope.

    ``init`` takes explicit start centroids (tests / warm restarts);
    otherwise ``seed_centroids(k)`` picks content-hash-spread seeds.
    An emptied cluster keeps its previous centroid (the standard
    Lloyd's guard). Returns the k centroids; only k×(dim+2) numbers
    ever cross to the driver per iteration.
    """
    _check_metric(metric)
    if iters < 0:
        raise ValueError(f"iters must be >= 0: {iters}")
    if init is not None:
        centroids = [list(map(float, c)) for c in init]
        _check_centroids(centroids)
    elif k is not None:
        centroids = seed_centroids(embeddings, k, vec_col, id_col)
        if k * len(centroids[0]) > MAX_CENTROID_LITERALS:
            raise ValueError(
                f"k x dim = {k} x {len(centroids[0])} exceeds "
                f"MAX_CENTROID_LITERALS ({MAX_CENTROID_LITERALS}) — "
                "see kmeans_assign's literal-plan bound")
    else:
        raise ValueError("pass k or init")
    dim = len(centroids[0])

    src = embeddings.select(F.col(vec_col).alias("_v"),
                            _xsq(F.col(vec_col)).alias("_xsq"))
    for _ in range(iters):
        best = _best_struct(F.col("_v"), centroids, metric, F.col("_xsq"))
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
            if metric == "l2":
                nxt[row["_c"]] = mean
                continue
            nrm = math.sqrt(sum(x * x for x in mean))
            if nrm > 0.0:
                nxt[row["_c"]] = [x / nrm for x in mean]
        centroids = nxt
    return centroids
