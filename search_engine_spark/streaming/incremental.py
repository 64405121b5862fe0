"""Structured-Streaming ingestion: incremental index maintenance.

The reference is batch-only (SURVEY §2.6: no streaming operators exist);
this module is the Spark-native growth path a web-scale corpus needs —
new document files land continuously and the index must absorb them
without a full rebuild:

* ``incremental_index_build`` — readStream over a documents directory →
  per-micro-batch postings/doc_stats appended to the index staging tables
  (foreachBatch; exactly-once via the streaming checkpoint + append-only
  parquet), one manifest lineage row per batch. Blocks/segments are
  re-encoded lazily per bucket by the next ``build_durable_index`` resume
  pass — the doc-partitioned block layout (block_id = doc_id // span)
  means new high doc_ids only ADD blocks, never rewrite old ones.
* ``watermarked_event_counts`` — event-time tumbling aggregation with a
  watermark for late data (the canonical readStream→window→writeStream
  shape, demonstrated on the events table).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.analyzer import AnalyzerConfig
from ..operators import postings as P


def incremental_index_build(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    schema,
    conf: AnalyzerConfig = AnalyzerConfig.full(),
    buckets: int = 64,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Start (and with available_now=True, run to completion) a streaming
    ingest of parquet document files into the index staging tables."""
    checkpoint_dir = checkpoint_dir or os.path.join(index_dir, "_stream_checkpoint")
    stage_dir = os.path.join(index_dir, "postings_stage")
    ds_dir = os.path.join(index_dir, "doc_stats")
    os.makedirs(os.path.join(index_dir, "manifest"), exist_ok=True)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def absorb(batch_df: DataFrame, batch_id: int) -> None:
        post = P.build_postings(batch_df, conf, positional=True).withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(buckets)).cast("int")
        )
        post.write.mode("append").partitionBy("bucket").parquet(stage_dir)
        P.doc_stats(batch_df, conf).write.mode("append").parquet(ds_dir)
        n = batch_df.count()
        with open(os.path.join(index_dir, "manifest",
                               f"stream_batch_{batch_id}.json"), "w") as f:
            json.dump({"step": f"stream_batch_{batch_id}", "rows": n,
                       "ts": time.time()}, f)

    writer = stream.writeStream.foreachBatch(absorb) \
        .option("checkpointLocation", checkpoint_dir)
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def watermarked_event_counts(events_stream: DataFrame, minutes: int = 60,
                             watermark: str = "2 hours") -> DataFrame:
    """event-time tumbling counts tolerating late arrivals up to the
    watermark — attach to readStream(events) and writeStream as needed."""
    if dict(events_stream.dtypes).get("ts") == "timestamp_ntz":
        # watermarks require TIMESTAMP; session TZ is pinned UTC so the
        # NTZ→LTZ cast is exact
        events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
