"""Corpus sources: the driver test tables and the input_hint web corpus.

Two document shapes exist in this sandbox:

* ``/root/testdata/sf*/documents.parquet`` — driver-generated
  ``(doc_id, text, lang, source, n_chars)``; used by the driver's DuckDB
  correctness gate (__spark_entry__.py).
* the BASELINE.json ``input_hint`` shape
  ``(url string, warc_ts timestamp, html binary, text string, lang string)``
  — Common-Crawl-style web pages. No external data is allowed, so
  ``synthesize_web_corpus`` builds it deterministically and distributively
  (spark.range → mapInPandas; generation parallelism == Spark parallelism,
  which is what lets the bench harness scale the build N→4N).

The html wraps the text (<title>…</title>/<body>…</body> with HTML
entities planted in a fixed fraction of rows) so that
functions.analyzer.extract_text(html) == text byte-for-byte — the
input_hint per-row invariant, asserted in tests.
"""

from __future__ import annotations

import html as _html
from datetime import datetime, timedelta

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType, TimestampType)

TESTDATA_TABLES = ("region", "nation", "customer", "supplier", "part",
                   "orders", "lineitem", "events", "documents", "embeddings")

WEB_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])

# Deterministic vocabulary: Zipf-ish weights over stem families + currency
# tokens + a few planted phrase words (FIXTURES.md §1 semantics).
_FAMILIES = [
    "connect", "connected", "connection", "connections", "connecting",
    "relate", "relational", "relation", "rationally",
    "search", "searches", "searching", "searched",
    "index", "indexes", "indexing", "indexed",
    "market", "markets", "marketing", "price", "prices", "pricing",
    "stock", "stocks", "trade", "trades", "trading", "traded",
    "bank", "banks", "banking", "report", "reports", "reported",
    "world", "hello", "germany", "china", "france", "economy", "economic",
    "growth", "inflation", "energy", "crisis", "government", "policy",
    "€100", "£50", "¢99", "data2022",
]
_STOP_SAMPLE = ["the", "of", "and", "to", "a", "in", "that", "is", "was", "for"]
_VOCAB = _FAMILIES + _STOP_SAMPLE + [f"term{i}" for i in range(400)]
_BASE_TS = datetime(2022, 1, 1)


def _gen_rows(ids: np.ndarray) -> pd.DataFrame:
    rows = []
    vocab = np.array(_VOCAB)
    # Zipf weights pinned once (rank-based, deterministic); inverse-CDF
    # sampling via searchsorted (rng.choice with p is O(|vocab|) per draw)
    w = 1.0 / np.arange(1, len(vocab) + 1)
    cdf = np.cumsum(w / w.sum())

    def draw(rng, size):
        return vocab[np.searchsorted(cdf, rng.random(size))]

    for i in ids:
        rng = np.random.default_rng(int(i) + 1_000_003)
        n_title = int(rng.integers(3, 9))
        n_body = int(rng.integers(20, 401))
        title = " ".join(draw(rng, n_title))
        body_toks = list(draw(rng, n_body))
        if i % 5 == 0:  # plant a phrase for phrase/proximity queries
            # (must be non-stopwords: "hello" is in the Glasgow list and
            # would be analyzed away)
            k = int(rng.integers(0, max(n_body - 2, 1)))
            body_toks[k : k + 2] = ["germany", "economy"]
        body = " ".join(body_toks)
        if i % 7 == 0:  # exercise the entity-unescape step
            body = body + " AT&T €uro"
        text = title + " " + body
        html_doc = (
            "<html><head><title>" + _html.escape(title, quote=False)
            + "</title></head><body>" + _html.escape(body, quote=False)
            + "</body></html>"
        ).encode("utf-8")
        ts = _BASE_TS + timedelta(days=int(i % 90), hours=int(i % 24))
        rows.append({
            "url": f"https://site{i % 97}.example/{i}",
            "warc_ts": ts,
            "html": html_doc,
            "text": text,
            "lang": "de" if i % 29 == 0 else "en",
        })
    return pd.DataFrame(rows)


def synthesize_web_corpus(spark: SparkSession, n_docs: int,
                          partitions: int | None = None) -> DataFrame:
    """Deterministic input_hint-shaped corpus, generated on executors."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            yield _gen_rows(pdf["id"].to_numpy())

    return spark.range(0, n_docs, numPartitions=parts).mapInPandas(gen, WEB_SCHEMA)


def with_doc_ids(docs: DataFrame) -> DataFrame:
    """Dense 1-based doc_id (reference semantics: sequential int starting
    at 1, index_build.py:130,199), deterministic via url order.

    Note for 10^12-doc scale: a global row_number is a single-partition
    window — fine at test scale, replaced by ``xxhash64(url)`` (sparse but
    deterministic and shuffle-free) via ``with_hash_doc_ids`` at bench
    scale; both are stable per url.
    """
    return docs.withColumn("doc_id", F.row_number().over(Window.orderBy("url")).cast(LongType()))


def with_hash_doc_ids(docs: DataFrame) -> DataFrame:
    """Sparse 64-bit hash ids, no shuffle at all. Fine for the relational
    query path; NOT for the segment layer (doc-partitioned blocks need
    dense ids — use with_dense_doc_ids there)."""
    return docs.withColumn("doc_id", F.xxhash64("url"))


def with_dense_doc_ids(docs: DataFrame, start: int = 1,
                       reliable_checkpoint: bool = False) -> DataFrame:
    """Dense doc ids without a global sort (the 10^12-scale id assigner).

    zipWithIndex scheme: count rows per partition (one lightweight job),
    broadcast the cumulative offsets, then number rows inside each
    partition — deterministic for a deterministic input layout, no
    shuffle of the data itself. Dense ids keep the segment layer's
    doc-partitioned blocks (block_id = doc_id // span) at bounded
    occupancy, which hash ids would destroy (every posting its own block).

    ``reliable_checkpoint=False`` (default) uses localCheckpoint: blocks
    live on executors, unreplicated, with lineage TRUNCATED — losing an
    executor (failure or dynamic-allocation decommission) mid-build makes
    the job unrecoverable rather than recomputable. Fine in local mode
    and on static clusters with retry-the-job semantics. For long cluster
    builds pass ``reliable_checkpoint=True`` and set
    ``spark.sparkContext.setCheckpointDir(<HDFS/object-store path>)``
    first: blocks go to the checkpoint dir and executor loss recovers.
    """
    import pandas as pd
    from pyspark.sql.types import LongType, StructField

    spark = docs.sparkSession
    # checkpoint BEFORE the two passes (count + numbering): (1) the
    # full upstream lineage — typically the expensive corpus generation /
    # extraction — executes once, not twice; (2) both passes read the
    # SAME materialized layout, so per-partition counts can never drift
    # from the rows the numbering pass sees (re-evaluated lineage makes
    # no such guarantee for nondeterministic upstreams)
    # The partition id is STAMPED INTO THE DATA before the eager
    # checkpoint, then read back as a column — materialized data can't
    # be desynchronized by downstream plan shapes (a union() shifts
    # stage partition indices, so TaskContext.partitionId() AT NUMBERING
    # TIME is not safe). The stamp itself is evaluated during the
    # checkpoint job, whose final RDD IS the pinned layout, so any
    # runtime partition-index source is consistent — the one failure
    # mode is Catalyst's ConvertToLocalRelation folding a
    # spark_partition_id() column DRIVER-SIDE to constant 0 when the
    # whole input collapses to a LocalRelation (createDataFrame inputs:
    # every partition then numbers from the same base and ids collide).
    # That collapse is exactly what isLocal() reports, and such inputs
    # are driver-resident (tiny) by construction — they take a pandas-
    # UDF stamp (opaque to constant folding); everything else keeps the
    # zero-Python JVM column, so real corpus builds pay ONE Python pass
    # (the numbering), not two.
    if docs.isLocal():
        from pyspark import TaskContext

        pid_schema = StructType(
            [f for f in docs.schema.fields]
            + [StructField("_pid", LongType())]
        )

        def stamp(batches):
            pid = TaskContext.get().partitionId()
            for pdf in batches:
                pdf = pdf.copy()
                pdf["_pid"] = pid
                yield pdf

        with_pid = docs.mapInPandas(stamp, pid_schema)
    else:
        with_pid = docs.withColumn(
            "_pid", F.spark_partition_id().cast("long"))
    if reliable_checkpoint:
        with_pid = with_pid.checkpoint(eager=True)
    else:
        with_pid = with_pid.localCheckpoint(eager=True)
    counts = dict(
        (r["_pid"], r["c"])
        for r in with_pid.groupBy("_pid").agg(F.count("*").alias("c")).collect()
    )
    offsets = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    boff = spark.sparkContext.broadcast(offsets)
    out_schema = StructType(
        [f for f in docs.schema.fields] + [StructField("doc_id", LongType())]
    )

    def number(batches):
        # the stamped _pid is per-partition constant: every batch of one
        # mapInPandas call carries the same value
        local = {"base": None, "seen": 0}
        for pdf in batches:
            if local["base"] is None:
                local["base"] = boff.value[int(pdf["_pid"].iloc[0])]
            n = len(pdf)
            pdf = pdf.drop(columns=["_pid"])
            pdf["doc_id"] = range(local["base"] + local["seen"],
                                  local["base"] + local["seen"] + n)
            local["seen"] += n
            yield pdf

    return with_pid.mapInPandas(number, out_schema)


def ingest_filters(docs: DataFrame) -> DataFrame:
    """Reference ingest validity filters (index_build.py:147,150-157):
    drop url >= 1000 chars, malformed timestamps, missing text; a
    ``title`` column, when present, gets the reference's same <1000-char
    sanity bound. The bound is NOT applied to ``text`` — body text
    routinely exceeds 1000 chars and the reference only bounds its
    (short) title field."""
    cond = (F.length("url") < 1000) & F.col("warc_ts").isNotNull() \
        & F.col("text").isNotNull()
    if "title" in docs.columns:
        # NULL title (pages without <title>) is valid — only an
        # oversized title fails the sanity bound
        cond = cond & (F.col("title").isNull() | (F.length("title") < 1000))
    return docs.filter(cond)


def read_testdata(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def read_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-shape documents table (doc_id,text,lang,source,n_chars)."""
    return read_testdata(spark, sf_dir, "documents")


def write_documents_partitioned(docs: DataFrame, path: str) -> None:
    """Write documents partitioned by days(warc_ts) — the Iceberg
    days-transform layout from SURVEY §1.4: date-range queries become
    partition pruning instead of a full scan (replacing the reference's
    date2doc reverse map, index_build.py:94-99).

    repartitionByRange on (warc_date, url) before partitionBy: bounds
    file count at O(partitions) instead of tasks × dates, and splits a
    hot date across several tasks instead of one straggler."""
    parts = max(docs.sparkSession.sparkContext.defaultParallelism, 8)
    (docs.withColumn("warc_date", F.to_date("warc_ts"))
         .repartitionByRange(parts, "warc_date", "url")
         .write.mode("overwrite").partitionBy("warc_date").parquet(path))


def read_documents_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
