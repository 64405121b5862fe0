"""Streaming ingestion: incremental index equals batch index over the
same documents; late-data watermark plan sanity."""

import glob
import os

from pyspark.sql import functions as F

from search_engine_spark.operators import postings as P
from search_engine_spark.streaming import incremental


def test_incremental_equals_batch(spark, corpus_sdf, tmp_path):
    src = str(tmp_path / "incoming")
    # drop the corpus as several files to simulate arriving batches
    corpus_sdf.select("doc_id", "text").repartition(6).write.parquet(src)

    index_dir = str(tmp_path / "streamidx")
    schema = spark.read.parquet(src).schema
    incremental.incremental_index_build(
        spark, src, index_dir, schema, available_now=True
    )

    got = spark.read.parquet(os.path.join(index_dir, "postings_stage"))
    want = P.build_postings(corpus_sdf.select("doc_id", "text"))
    g = {(r.term, r.doc_id): (r.tf, list(r.positions)) for r in got.collect()}
    w = {(r.term, r.doc_id): (r.tf, list(r.positions)) for r in want.collect()}
    assert g == w

    # lineage rows exist for the processed stream batches
    assert glob.glob(os.path.join(index_dir, "manifest", "stream_batch_*.json"))

    # doc_stats complete
    ds = spark.read.parquet(os.path.join(index_dir, "doc_stats"))
    assert ds.count() == corpus_sdf.count()


def test_watermarked_plan_builds(spark, tmp_path):
    src = str(tmp_path / "ev")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    out = incremental.watermarked_event_counts(stream, minutes=30)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("wm_counts")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    # append mode emits only windows closed by the watermark; the final
    # window stays open, so emitted <= batch-computed windows
    batch = spark.read.parquet(src)
    want = batch.groupBy(F.window("ts", "30 minutes"), "event_type").count().count()
    got = spark.sql("select * from wm_counts").count()
    assert 0 < got <= want
