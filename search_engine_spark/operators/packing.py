"""Sequence packing for LLM pretraining — concat-then-chunk token layout.

Given per-doc token counts and a canonical document order, assign every
doc its global token offset and the fixed-budget training sequences it
lands in (docs may straddle a sequence boundary — the standard
concat-then-chunk pretraining layout, where sequence t covers global
token positions [t·budget, (t+1)·budget)).

The core is a GLOBAL running sum in doc order, which naive Spark
(``Window.orderBy`` with no partition) executes on a single task — a
scale-killer at 10^12 docs. ``pack_sequences`` instead runs the classic
two-pass distributed prefix sum:

1. bin rows into ordered chunks by literal boundaries sampled once from
   the key distribution (approxQuantile → driver literals, so both
   passes see identical binning by construction);
2. one tiny aggregation gives per-chunk token totals → prefix offsets
   (chunk-count rows, broadcast back);
3. a window PARTITIONED BY chunk (parallel, bounded partitions) computes
   the local running sum; local + chunk offset = exact global offset.

Every stage is shuffle-parallel; driver traffic is O(n_chunks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ._cache import PersistRegistry

# The slim (order, tokens) frame persisted by the last pack_sequences
# call: three consumers read it (quantile sketch, chunk totals, final
# window), and without a cache each would re-execute the caller's
# upstream lineage — e.g. re-tokenize all text when fed from
# token_count. Drained on the next call or via release_caches().
_PERSISTED = PersistRegistry()


def release_caches() -> None:
    """Unpersist the slim input frame retained by the last
    pack_sequences call (its output lazily recomputes if still used)."""
    _PERSISTED.drain()


def _chunk_col(order_col: str, bounds: list[float]):
    """Ordered chunk id from literal boundaries: #bounds <= order value.
    JVM-side fold over a literal array — no UDF, no shuffle."""
    if not bounds:
        return F.lit(0)
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    return F.aggregate(
        arr, F.lit(0),
        lambda acc, b: acc + F.when(F.col(order_col) >= b, 1).otherwise(0),
    )


def chunk_bounds(docs: DataFrame, order_col: str,
                 n_chunks: int) -> list[float]:
    """~Equi-depth interior boundaries for the order column (driver
    literals). Balance, not correctness, depends on their placement."""
    if n_chunks <= 1:
        return []
    qs = [i / n_chunks for i in range(1, n_chunks)]
    bounds = docs.stat.approxQuantile(order_col, qs, 0.01)
    # dedupe while preserving order (skewed keys can repeat a boundary)
    out: list[float] = []
    for b in bounds:
        if not out or b > out[-1]:
            out.append(b)
    return out


def pack_sequences(docs: DataFrame, budget: int,
                   token_col: str = "n_tokens",
                   order_col: str = "doc_id",
                   n_chunks: int = 64) -> DataFrame:
    """→ (doc_id-order row, token span, sequence span):
    ``(order_col, n_tokens, begin_tok, seq_first, seq_last)`` where
    ``begin_tok`` is the doc's global token offset in ``order_col``
    order and the doc's tokens occupy sequences seq_first..seq_last of
    size ``budget`` (inclusive; a doc longer than the budget spans
    several). Zero-token docs sit at their boundary with
    seq_last == seq_first.

    ``order_col`` must be numeric and unique (the canonical layout
    order); ``token_col`` must be non-negative.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive: {budget}")
    release_caches()
    # persist the 2-column slice FIRST: the quantile sketch, the totals
    # aggregation, and the final plan all read it, and each would
    # otherwise re-run the caller's upstream lineage (tokenization,
    # joins) — one upstream scan total, three cached reads
    slim = docs.select(order_col, token_col).persist()
    _PERSISTED.add(slim)
    bounds = chunk_bounds(slim, order_col, n_chunks)
    base = slim.withColumn("_chunk", _chunk_col(order_col, bounds))
    # pass 1: per-chunk totals -> prefix offsets (n_chunks rows on the
    # driver; broadcast-joined back)
    totals = base.groupBy("_chunk") \
        .agg(F.sum(token_col).cast("long").alias("_sum")).collect()
    acc = 0
    offs = []
    for row in sorted(totals, key=lambda r: r["_chunk"]):
        offs.append((row["_chunk"], acc))
        acc += row["_sum"]
    spark = docs.sparkSession
    off_df = spark.createDataFrame(offs, "_chunk int, _offset long")
    # pass 2: parallel per-chunk running sum + chunk offset
    w = Window.partitionBy("_chunk").orderBy(order_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    end = (F.sum(token_col).over(w) + F.col("_offset")).cast("long")
    out = (
        base.join(F.broadcast(off_df), "_chunk")
        .withColumn("_end", end)
        .withColumn("begin_tok", (F.col("_end") - F.col(token_col)).cast("long"))
        .withColumn("seq_first", F.floor(F.col("begin_tok") / budget))
        .withColumn(
            "seq_last",
            F.when(F.col(token_col) > 0,
                   F.floor((F.col("_end") - 1) / budget))
            .otherwise(F.floor(F.col("begin_tok") / budget)),
        )
    )
    return out.select(order_col, F.col(token_col).cast("long").alias(token_col),
                      "begin_tok", "seq_first", "seq_last")
