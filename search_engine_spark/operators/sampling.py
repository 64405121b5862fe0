"""Deterministic splitting & sampling for training-data pipelines.

Not in the reference engine (no training-data tooling there); these are
the corpus-preparation companions a 100 TB pipeline needs between
curation (operators.curation) and packing (operators.packing):

* assign_splits     — train/val/test assignment by a content-derived
                      hash bucket of the key column. A pure narrow
                      projection: NO shuffle, NO RNG, stable under
                      repartitioning/resharding/incremental re-runs —
                      a doc keeps its split forever, which is the
                      property that keeps eval sets uncontaminated
                      when the corpus is rebuilt.
* stratified_sample — deterministic fraction-per-stratum sampling via
                      the same bucket hash; fractions are NESTED
                      (the 1% sample is a subset of the 10% sample),
                      so sample-size sweeps reuse cached artifacts.
* shuffle_shards    — deterministic global training-order shuffle as a
                      (shard, pos) assignment: one shuffle keyed on a
                      contiguous range of the order hash, a per-shard
                      sort, never a global window. Salt = epoch.

The hash is md5(key || salt) truncated to its first 8 hex digits — a
uniform 32-bit bucket that DuckDB reproduces exactly
(``CAST(('0x' || substr(md5(...), 1, 8)) AS BIGINT)``), making every
split/sample decision SQL-oracle-checkable. ``salt`` rotates the
assignment without touching the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10_000


def hash_bucket(key_col: Column, salt: str = "",
                n_buckets: int = N_BUCKETS) -> Column:
    """Uniform deterministic bucket in [0, n_buckets): first 8 hex digits
    of md5(key || salt) as an unsigned 32-bit int, mod n_buckets. Fits a
    LongType with no sign issues (max 0xFFFFFFFF).

    Each operator passes a purpose-prefixed salt ('split:…', 'sample:…',
    'mixture:…') so their bucket streams are INDEPENDENT: with a shared
    hash, chaining rebalance_mixture → assign_splits would correlate the
    decisions (mixture survivors all sit in low buckets, so the high-
    bucket val/test splits would end up empty or single-domain)."""
    h = F.conv(
        F.substring(F.md5(F.concat(key_col.cast("string"), F.lit(salt))),
                    1, 8),
        16, 10,
    ).cast("long")
    return h % n_buckets


def assign_splits(docs: DataFrame,
                  weights: dict[str, float] | None = None,
                  key_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Add a ``split`` column assigning each row to exactly one named
    split with the given weights (normalized; default 80/10/10
    train/val/test).

    Bucket thresholds are integer cut points on the shared 10k-bucket
    hash, so splits are disjoint, exhaustive, and independent of row
    order, partitioning, and corpus growth (a new doc never moves an
    old doc's split)."""
    if weights is None:
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be non-negative and non-empty: {weights}")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")

    bucket = hash_bucket(F.col(key_col), "split:" + salt)
    names = list(weights)
    cuts = []
    acc = 0.0
    for name in names:
        acc += weights[name] / total
        cuts.append(round(acc * N_BUCKETS))
    cuts[-1] = N_BUCKETS  # close the range against float rounding
    expr = None
    for name, cut in zip(names, cuts):
        cond = bucket < cut
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return docs.withColumn("split", expr)


def stratified_sample(docs: DataFrame, fraction: float,
                      by: str | None = None,
                      fractions: dict | None = None,
                      key_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Deterministic ~``fraction`` sample (bucket < fraction·10k). With
    ``by``/``fractions``, each stratum (value of column ``by``) gets its
    own fraction (missing strata fall back to ``fraction``).

    Nested by construction: the f=0.01 sample ⊆ the f=0.1 sample for the
    same salt, so downsampling experiments are monotone."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1]: {fraction}")
    bucket = hash_bucket(F.col(key_col), "sample:" + salt)
    if by is None:
        return docs.filter(bucket < round(fraction * N_BUCKETS))
    fractions = fractions or {}
    if any(not 0.0 <= f <= 1.0 for f in fractions.values()):
        raise ValueError(f"per-stratum fractions must be in [0, 1]: {fractions}")
    cut = F.lit(round(fraction * N_BUCKETS))
    for val, frac in fractions.items():
        cut = F.when(F.col(by) == val,
                     F.lit(round(frac * N_BUCKETS))).otherwise(cut)
    return docs.filter(bucket < cut)


def shuffle_shards(docs: DataFrame, n_shards: int,
                   key_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Deterministic global shuffle for training order, materialized as
    ``shard`` (long) + ``pos`` (row number within shard) columns.

    The order key is md5(key || 'order:' || salt); ``shard`` is the
    top-level split of that key's first 32 bits into ``n_shards``
    CONTIGUOUS ranges, and ``pos`` orders rows within a shard by the
    full hex key. Because lowercase-hex lexicographic order equals the
    numeric order of the hash, reading shard 0's rows by pos, then
    shard 1's, … reproduces one global pseudo-random permutation —
    without ever sorting globally. A new ``salt`` (e.g. "epoch2") is a
    fresh permutation; the same salt replays bit-identically regardless
    of partitioning or cluster size.

    Plan: one shuffle (the per-shard window), no global window, no RNG.
    Writers should ``repartition(n_shards, "shard")`` +
    ``sortWithinPartitions("pos")`` + ``partitionBy("shard")`` so each
    shard lands as one orderly file set."""
    if not 1 <= n_shards <= 1 << 30:
        raise ValueError(f"n_shards must be in [1, 2^30]: {n_shards}")
    okey = F.md5(F.concat(F.col(key_col).cast("string"),
                          F.lit("order:" + salt)))
    # integer math: h32*n_shards < 2^62, exact in a long; >>32 splits
    # [0, 2^32) into n_shards contiguous, near-equal ranges (a double
    # division here could misplace boundary rows)
    h32 = F.conv(F.substring(okey, 1, 8), 16, 10).cast("long")
    from pyspark.sql.window import Window

    w = Window.partitionBy("shard").orderBy("_okey", key_col)
    return (
        docs.withColumn("_okey", okey)
        .withColumn("shard", F.shiftright(h32 * F.lit(n_shards), 32))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_okey")
    )


def rebalance_mixture(docs: DataFrame, target: dict[str, float],
                      by: str = "source", key_col: str = "doc_id",
                      salt: str = "") -> DataFrame:
    """Deterministically downsample to a target domain mixture (e.g.
    30% code / 70% web): keep the LARGEST corpus whose ``by``-column
    proportions match ``target`` exactly, dropping rows from
    over-represented domains via the shared hash bucket.

    N = min over domains of count(s)/weight(s) is the largest feasible
    total; domain s keeps floor(weight(s)·N/count(s)·10k) buckets. Two
    jobs: one tiny count aggregation (|domains| rows to the driver),
    then one shuffle-free filtered scan. Domains absent from ``target``
    are dropped; a targeted domain with zero rows raises (the mixture
    is infeasible)."""
    import math

    if not target or any(w < 0 for w in target.values()):
        raise ValueError(f"target weights must be non-negative: {target}")
    total_w = float(sum(target.values()))
    if total_w <= 0:
        raise ValueError("target weights must sum to a positive value")
    weights = {s: w / total_w for s, w in target.items() if w > 0}
    counts = {r[by]: r["c"] for r in
              docs.filter(F.col(by).isin(list(weights)))
              .groupBy(by).agg(F.count("*").alias("c")).collect()}
    missing = sorted(set(weights) - set(counts))
    if missing:
        raise ValueError(
            f"target domains have no rows (mixture infeasible): {missing}")
    n = min(counts[s] / w for s, w in weights.items())
    bucket = hash_bucket(F.col(key_col), "mixture:" + salt)
    cut = None
    for s, w in weights.items():
        # the BINDING domain (c/w == n) keeps everything by definition;
        # computing its cut through floats would floor 9999.999… to 9999
        # and silently drop ~0.01% of the domain that sets the budget
        cut_val = N_BUCKETS if counts[s] / w == n \
            else math.floor(w * n / counts[s] * N_BUCKETS)
        c = F.lit(cut_val)
        cut = F.when(F.col(by) == s, c) if cut is None \
            else cut.when(F.col(by) == s, c)
    return docs.filter(bucket < cut)
