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


def streaming_sessionize(events_stream: DataFrame, gap_minutes: int = 30,
                         watermark: str = "10 minutes") -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    gap-based sessionization identical to the batch
    ``operators.events.sessionize`` (same second-floor gap test, same
    per-user session numbering), emitting a session when either (a) a
    later event of the same user breaks the gap, or (b) the event-time
    watermark passes session_end + gap (timeout) — so sessions split
    across micro-batches merge exactly like the batch window identity.

    State per user: (next session_id, start_us, end_us, n, total).
    Output: (user_id, session_id, session_start, session_end, n_events,
    total_value) — append mode.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType, TimestampType)

    if dict(events_stream.dtypes).get("ts") == "timestamp_ntz":
        events_stream = events_stream.withColumn(
            "ts", F.col("ts").cast("timestamp"))

    gap_s = gap_minutes * 60
    out_type = StructType([
        StructField("user_id", LongType()),
        StructField("session_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ])
    state_type = StructType([
        StructField("sid", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ])

    def fn(key, pdfs, state: GroupState):
        uid = key[0]

        def emit(sid, start_us, end_us, n, total):
            return pd.DataFrame({
                "user_id": [uid], "session_id": [sid],
                "session_start": [pd.to_datetime(start_us, unit="us")],
                "session_end": [pd.to_datetime(end_us, unit="us")],
                "n_events": [n], "total_value": [round(total, 4)],
            })

        if state.hasTimedOut:
            sid, start_us, end_us, n, total = state.get
            state.remove()
            yield emit(sid, start_us, end_us, n, total)
            return

        if state.exists:
            sid, start_us, end_us, n, total = state.get
        else:
            sid, start_us, end_us, n, total = 0, None, None, 0, 0.0

        closed = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, val in zip(pdf["ts"], pdf["value"]):
                us = ts.value // 1000  # pandas ns → µs
                # batch identity: gap test on second-FLOORED epochs
                # (sessionize casts ts to long, events.py:60-61)
                if start_us is not None and (
                        us // 1_000_000 - end_us // 1_000_000) <= gap_s:
                    # late events may precede the open session's start
                    start_us = min(start_us, us)
                    end_us = max(end_us, us)
                    n += 1
                    total += float(val)
                else:
                    if start_us is not None:
                        closed.append((sid, start_us, end_us, n, total))
                    sid += 1
                    start_us = end_us = us
                    n, total = 1, float(val)
        state.update((sid, start_us, end_us, n, total))
        # fire when the watermark passes the open session's close point
        state.setTimeoutTimestamp(end_us // 1000 + gap_s * 1000)
        for c in closed:
            yield emit(*c)

    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, out_type, state_type, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
