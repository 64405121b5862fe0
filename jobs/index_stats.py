"""Index-store inspection job: one JSON report of a durable index's
health — the operational "segments API" a 100 TB store needs before
anyone debugs a slow query or plans a merge.

spark-submit --py-files dist/engine.zip jobs/index_stats.py /data/index

Reports: corpus scalars + store kind (tf / impact bits), committed
optional artifacts (VSM norms, phrase index, trigram index), tombstone
batches + deleted fraction, per-bucket segment balance (blocks,
postings, payload bytes, and the max/mean SKEW factor — the number
that says whether the bucket hash still spreads the term mass), the
payload codec mix (varint / Elias-Fano / impact, from the
self-describing payload tags), and the head of the df distribution.
Everything is DataFrame aggregates over segment metadata and side
tables — no payload decode, so the report is cheap even on a huge
store (the codec mix reads 2 bytes per block payload).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect_stats(spark, index_dir: str) -> dict:
    from pyspark.sql import functions as F

    from search_engine_spark.sources import catalog

    with open(os.path.join(index_dir, "stats.json")) as f:
        meta = json.load(f)
    seg = spark.read.parquet(os.path.join(index_dir, "segments"))

    per_bucket = (seg.groupBy("bucket").agg(
        F.count("*").alias("blocks"),
        F.sum("n_docs").alias("postings"),
        F.sum(F.length("payload")).alias("payload_bytes"))
        .orderBy("bucket").collect())
    postings = [int(r.postings or 0) for r in per_bucket]
    mean_p = (sum(postings) / len(postings)) if postings else 0.0

    # codec mix from the self-describing payload tag: legacy varint
    # payloads never start with 0x00; tagged formats are 0x00 + a
    # format letter ('B' EF block, 'I' impact) — 2 bytes per block
    tag = F.hex(F.expr("substring(payload, 1, 2)"))
    mix_rows = (seg.select(
        F.when(~tag.startswith("00"), "vb")
        .when(tag == "0042", "ef")
        .when(tag == "0049", "impact")
        .otherwise("unknown").alias("codec"))
        .groupBy("codec").count().collect())

    # quantized artifacts hold only segments + stats.json; side tables
    # resolve from the source via the sidecar pointer
    ts_dir = os.path.join(index_dir, "term_stats")
    if not os.path.isdir(ts_dir) and meta.get("sidecar_dir"):
        ts_dir = os.path.join(meta["sidecar_dir"], "term_stats")
    ts = spark.read.parquet(ts_dir)
    head = [(r.term, int(r.df)) for r in
            ts.orderBy(F.desc("df"), F.asc("term")).limit(10).collect()]

    batches = catalog.tombstone_batches(index_dir)
    report = {
        "index_dir": os.path.abspath(index_dir),
        "store": meta.get("store", "tf"),
        "impact_bits": meta.get("impact_bits"),
        "n_docs": meta["n_docs"],
        "total_len": meta["total_len"],
        "avgdl": round(meta["avgdl"], 2),
        "buckets": meta["buckets"],
        "block_span": meta["block_span"],
        "positional": meta.get("positional", True),
        "n_terms": ts.count(),
        "blocks": sum(int(r.blocks) for r in per_bucket),
        "postings": sum(postings),
        "payload_bytes": sum(int(r.payload_bytes or 0) for r in per_bucket),
        "bucket_skew_max_over_mean":
            round(max(postings) / mean_p, 3) if mean_p else None,
        "codec_mix": {r.codec: int(r["count"]) for r in mix_rows},
        # mirror SegmentIndex's resolution order: an impact store's
        # phrase/trigram/VSM artifacts resolve through the sidecar at
        # serving time, so the report must probe it too (consistent with
        # the term_stats fallback above)
        "artifacts": sorted(
            a for a in ("vsm_norms", "phrase_index", "term_ngram_index",
                        "ann_index")
            if catalog._done(index_dir, a)
            or (meta.get("sidecar_dir")
                and catalog._done(meta["sidecar_dir"], a))),
        "tombstone_batches": batches,
        "deleted_fraction":
            round(catalog.deleted_fraction(spark, index_dir), 4),
        "df_head": head,
    }
    if meta.get("sidecar_dir"):
        report["sidecar_dir"] = meta["sidecar_dir"]
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("index", help="durable index dir")
    args = ap.parse_args()

    from search_engine_spark.session import get_spark

    spark = get_spark("index_stats")
    print(json.dumps(collect_stats(spark, args.index)))


if __name__ == "__main__":
    main()
