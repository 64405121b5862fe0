"""Crawl-to-crawl corpus diff — the drift report a recurring web crawl
runs before deciding what to re-index (operators.sources.catalog's
refresh_index consumes exactly this signal: which keys are new, gone,
or rewritten).

The reference engine has no multi-crawl tooling (its pipeline is
one-shot); this is first-class recurring-pipeline support per the task
brief, and it composes with the index lifecycle: ``added ∪ changed`` is
the delta-build input, ``removed ∪ changed`` the tombstone set.

Scale shape: ONE full outer join on the key (shuffle on both sides,
AQE-coalescible) comparing md5 content digests computed in the same
pass — no text column survives past the projection, so the shuffle
carries (key, 32-byte digest), not documents. The summary is a
groupBy(status) over that frame: ≤4 rows out.

Cross-engine determinism: status derives from md5(text) equality —
byte-exact in DuckDB (the exact_dedup convention) — and NULL text is
digested as the empty string on both sides (COALESCE) so a text-less
row diffs like an empty document instead of NULL-poisoning the
comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: diff statuses, in report order
STATUSES = ("added", "removed", "changed", "unchanged")


def crawl_diff(old: DataFrame, new: DataFrame, key: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """→ (key, status): per-key drift between two crawls of the same
    corpus — 'added' (only in new), 'removed' (only in old), 'changed'
    (both, different md5(text)), 'unchanged'. Duplicate keys within a
    side are refused upstream concerns (url_dedup/exact_dedup run
    first); this operator assumes key-unique inputs, the same contract
    as refresh_index."""
    if key not in old.columns or key not in new.columns:
        raise ValueError(f"key column {key!r} must exist in both frames")
    if text_col not in old.columns or text_col not in new.columns:
        raise ValueError(
            f"text column {text_col!r} must exist in both frames")
    dig = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    o = old.select(F.col(key), dig.alias("_ho"))
    n = new.select(F.col(key), dig.alias("_hn"))
    joined = o.join(n, key, "full_outer")
    status = (
        F.when(F.col("_ho").isNull(), "added")
        .when(F.col("_hn").isNull(), "removed")
        .when(F.col("_ho") == F.col("_hn"), "unchanged")
        .otherwise("changed")
    )
    return joined.select(F.col(key), status.alias("status"))


def diff_summary(diff: DataFrame) -> DataFrame:
    """→ (status, n): the 4-row drift report."""
    return diff.groupBy("status").agg(F.count("*").alias("n"))
