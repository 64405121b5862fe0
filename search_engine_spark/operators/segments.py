"""Posting-segment encode/decode: delta+varint blocks with block-max
metadata (SURVEY §2.4 C1-C5; reference compression.py:48-65 +
index_hasher word2byte, replaced by columnar layout + pruning).

Layout decisions (scale rationale):

* ``bucket = pmod(xxhash64(term), B)`` — the segment table is written
  partitioned by bucket, so a query's term lookup prunes to |q| partitions
  (the Spark-native ``word2byte``: file-level pruning instead of byte
  offsets).
* ``block_id = doc_id // block_span`` — DOC-partitioned blocks, assigned
  arithmetically BEFORE any grouping. A stopword term's postings land in
  many independent (term, block_id) groups of bounded size, so the encode
  groupBy has no skewed reducer — this is the salting of the north rule,
  derived from the data instead of a random salt so block membership stays
  deterministic and doc-ordered.
* per-block ``max_tf`` and ``max_score`` (BM25 upper bound at dl→0:
  idf·(k1+1)·tf_max/(tf_max+k1·(1−b))) enable Block-Max WAND pruning.
* payload = varint([n, doc₀, Δdocs…, tfs…]); positions payload separate
  (column pruning: non-phrase queries never read it).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

from .. import codec

SEGMENT_SCHEMA = StructType([
    StructField("term", StringType()),
    StructField("bucket", IntegerType()),
    StructField("block_id", LongType()),
    StructField("n_docs", IntegerType()),
    StructField("min_doc_id", LongType()),
    StructField("max_doc_id", LongType()),
    StructField("block_max_tf", IntegerType()),
    StructField("payload", BinaryType()),
    StructField("pos_payload", BinaryType()),
])

DEFAULT_BUCKETS = 64
DEFAULT_BLOCK_SPAN = 1 << 17  # 131072 doc ids per block

#: pluggable doc-id codecs for segment payloads — both produce
#: self-describing bytes decode_block_full dispatches on
BLOCK_CODECS = ("vb", "ef")


def _block_encoder(name: str):
    if name == "vb":
        return codec.encode_block
    if name == "ef":
        return codec.encode_block_ef
    raise ValueError(f"block_codec must be one of {BLOCK_CODECS}: {name!r}")


def bm25_upper_bound(df: int, n_docs: int, max_tf: int,
                     k1: float = 1.2, b: float = 0.75) -> float:
    """Per-block BM25 score ceiling (dl→0 bound), used by WAND pruning."""
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * (k1 + 1.0) * max_tf / (max_tf + k1 * (1.0 - b))


def encode_segments(postings: DataFrame, buckets: int = DEFAULT_BUCKETS,
                    block_span: int = DEFAULT_BLOCK_SPAN,
                    positional: bool = True,
                    block_codec: str = "vb") -> DataFrame:
    """postings (term, doc_id, tf[, positions]) → segment blocks.

    One shuffle (groupBy term, block_id — bounded groups), Arrow-batched
    encode in applyInPandas. ``block_codec``: "vb" (legacy varint-delta)
    or "ef" (Elias-Fano doc ids, codec.encode_block_ef) — payloads
    self-describe, so readers and merges handle either or a mix.
    """
    enc = _block_encoder(block_codec)
    has_pos = positional and "positions" in postings.columns
    has_dl = "dl" in postings.columns
    cols = ["term", "doc_id", "tf"] + (["dl"] if has_dl else []) \
        + (["positions"] if has_pos else [])
    base = postings.select(*cols).withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(buckets)).cast(IntegerType())
    ).withColumn("block_id", (F.col("doc_id") / F.lit(block_span)).cast(LongType()))

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        docs = pdf["doc_id"].to_numpy()
        tfs = pdf["tf"].to_numpy()
        dls = pdf["dl"].to_numpy() if has_dl else None
        payload = enc(docs, tfs, dls)
        if has_pos:
            counts = [len(p) for p in pdf["positions"]]
            flat = [x for p in pdf["positions"] for x in p]
            import numpy as np
            pos_payload = codec.encode_positions(
                np.asarray(flat, dtype="int64"), np.asarray(counts, dtype="int64")
            )
        else:
            pos_payload = b""
        return pd.DataFrame([{
            "term": pdf["term"].iloc[0],
            "bucket": int(pdf["bucket"].iloc[0]),
            "block_id": int(pdf["block_id"].iloc[0]),
            "n_docs": len(docs),
            "min_doc_id": int(docs[0]),
            "max_doc_id": int(docs[-1]),
            "block_max_tf": int(tfs.max()),
            "payload": payload,
            "pos_payload": pos_payload,
        }])

    return base.groupBy("term", "block_id").applyInPandas(encode, SEGMENT_SCHEMA)


def encode_sorted(postings: DataFrame, positional: bool = True,
                  block_codec: str = "vb") -> DataFrame:
    """Shuffle-FREE segment encoder for postings that are already
    range-partitioned by (bucket, term, block_id) and sorted within
    partitions by (bucket, term, block_id, doc_id) — the exact layout the
    durable build's ONE stage exchange produces.

    ``encode_segments`` pays a second full shuffle of every posting row
    plus one pandas-DataFrame construction per (term, block) group
    (applyInPandas); at 150k docs / 11M postings that group overhead was
    ~2/3 of the whole index build and scaled at only ~0.4 efficiency
    from 2→8 cores. This encoder is a mapInPandas pass: groups are
    CONSECUTIVE runs in the sorted partitions, detected vectorized, with
    the trailing (possibly incomplete) run carried across Arrow batch
    boundaries within a partition. Range partitioning keeps every row of
    one (bucket, term, block_id) key in one partition, so no group ever
    straddles a partition boundary; group size is bounded by block
    occupancy ≤ block_span (the doc-partitioned-block skew bound).

    Requires columns: term, doc_id, tf, bucket, block_id [, dl]
    [, positions]. Rows within each group must be doc_id-ascending
    (delta encoding depends on it) — guaranteed by the sort.
    """
    import numpy as np

    enc = _block_encoder(block_codec)
    has_pos = positional and "positions" in postings.columns
    has_dl = "dl" in postings.columns
    cols = ["term", "bucket", "block_id", "doc_id", "tf"] \
        + (["dl"] if has_dl else []) + (["positions"] if has_pos else [])

    def encode_stream(batches):
        carry: pd.DataFrame | None = None

        def encode_runs(pdf: pd.DataFrame, starts: "np.ndarray"):
            docs_all = pdf["doc_id"].to_numpy()
            tfs_all = pdf["tf"].to_numpy()
            dls_all = pdf["dl"].to_numpy() if has_dl else None
            pos_all = pdf["positions"].to_numpy() if has_pos else None
            terms = pdf["term"].to_numpy()
            buckets_ = pdf["bucket"].to_numpy()
            blocks_ = pdf["block_id"].to_numpy()
            out = {k: [] for k in ("term", "bucket", "block_id", "n_docs",
                                   "min_doc_id", "max_doc_id",
                                   "block_max_tf", "payload", "pos_payload")}
            bounds = list(starts) + [len(pdf)]
            for s, e in zip(bounds[:-1], bounds[1:]):
                docs, tfs = docs_all[s:e], tfs_all[s:e]
                payload = enc(
                    docs, tfs, dls_all[s:e] if has_dl else None)
                if has_pos:
                    plist = pos_all[s:e]
                    counts = np.fromiter((len(p) for p in plist),
                                         dtype="int64", count=e - s)
                    flat = (np.concatenate([np.asarray(p, dtype="int64")
                                            for p in plist])
                            if counts.sum() else np.empty(0, dtype="int64"))
                    pos_payload = codec.encode_positions(flat, counts)
                else:
                    pos_payload = b""
                out["term"].append(terms[s])
                out["bucket"].append(int(buckets_[s]))
                out["block_id"].append(int(blocks_[s]))
                out["n_docs"].append(e - s)
                out["min_doc_id"].append(int(docs[0]))
                out["max_doc_id"].append(int(docs[-1]))
                out["block_max_tf"].append(int(tfs.max()))
                out["payload"].append(payload)
                out["pos_payload"].append(pos_payload)
            return pd.DataFrame(out)

        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            terms = pdf["term"].to_numpy()
            blocks_ = pdf["block_id"].to_numpy()
            change = (terms[1:] != terms[:-1]) | (blocks_[1:] != blocks_[:-1])
            starts = np.concatenate(
                [[0], np.flatnonzero(change) + 1]).astype("int64")
            # the last run may continue in the next Arrow batch of this
            # partition — hold it back
            carry = pdf.iloc[starts[-1]:]
            body = pdf.iloc[: starts[-1]]
            if len(body):
                yield encode_runs(body, starts[:-1])
        if carry is not None and len(carry):
            yield encode_runs(carry.reset_index(drop=True),
                              np.zeros(1, dtype="int64"))

    return postings.select(*cols).mapInPandas(encode_stream, SEGMENT_SCHEMA)


def quantize_blocks(segments: DataFrame, n_docs: int, total_len: int,
                    bits: int = 8, keep_positions: bool = False) -> DataFrame:
    """tf/dl segment blocks → quantized-impact blocks (same schema).

    mapInPandas over block rows: decode each payload (must be
    self-contained, i.e. carry the dl run — the durable build's shape),
    quantize with scoring.quantize_impacts (exact int64 arithmetic), and
    re-encode via codec.encode_block_impact. Structure is preserved 1:1
    — same (term, bucket, block_id, n_docs, min/max doc) — so every
    pruning path (bucket partitions, parquet min/max + bloom, the
    impact-ordered cap) works unchanged on the quantized store.
    ``block_max_tf`` becomes the block's max IMPACT: for impact stores
    the kernels' range bound is idf·(k1+1)·max_impact/maxq — EXACT for
    the quantized scores (tighter than the tf store's dl→0 bound).
    ``pos_payload`` is DROPPED (emitted empty) by default: nothing reads
    positions from an impact store — phrase/proximity queries route
    through the source sidecar (SegmentIndex.lookup's impact branch and
    bigram_lookup), and on positional builds the positional payloads
    typically dominate index size, which would defeat the whole
    ~1 byte/posting point of the artifact. ``keep_positions=True``
    restores the pass-through for callers that want a self-contained
    copy."""
    from . import scoring

    if not 2 <= bits <= 16:
        raise ValueError(f"impact bits must be in [2, 16]: {bits}")

    def convert(batches):
        from .. import codec as C

        for pdf in batches:
            payloads, maxima = [], []
            for payload in pdf["payload"]:
                docs, tfs, dls = C.decode_block_full(bytes(payload))
                if dls is None:
                    raise ValueError(
                        "quantize_blocks needs self-contained blocks "
                        "(payloads carrying dl — the durable build's "
                        "shape); this store was encoded without dl")
                q = scoring.quantize_impacts(tfs, dls, n_docs, total_len,
                                             bits)
                payloads.append(C.encode_block_impact(docs, q))
                maxima.append(int(q.max()) if len(q) else 0)
            import numpy as np

            out = pdf.copy()
            out["payload"] = payloads
            out["block_max_tf"] = np.asarray(maxima, dtype="int32")
            if not keep_positions:
                out["pos_payload"] = [b""] * len(out)
            yield out

    return segments.mapInPandas(convert, SEGMENT_SCHEMA)


DECODED_SCHEMA = StructType([
    StructField("term", StringType()),
    StructField("doc_id", LongType()),
    StructField("tf", IntegerType()),
    StructField("dl", IntegerType()),
])


def decode_segments(segments: DataFrame, positional: bool = False,
                    has_dl: bool = True) -> DataFrame:
    """segment blocks → postings rows (term, doc_id, tf[, dl][, positions]).

    mapInPandas: each Arrow batch of blocks explodes to posting rows with
    numpy decode — no per-row Python.

    ``has_dl=False`` (segments encoded from dl-less postings) omits the
    dl column entirely so downstream scoring falls back to the doc_stats
    join — NEVER fabricate dl=0, which would silently zero the BM25
    length norm. A mismatch between the flag and the payload raises.
    """
    import numpy as np
    from pyspark.sql.types import ArrayType

    fields = list(DECODED_SCHEMA.fields)
    if not has_dl:
        fields = [f for f in fields if f.name != "dl"]
    if positional:
        fields = fields + [StructField("positions", ArrayType(IntegerType()))]
    out_schema = StructType(fields)

    def decode(batches):
        for pdf in batches:
            frames = []
            for _, row in pdf.iterrows():
                docs, tfs, dls = codec.decode_block_full(row["payload"])
                if has_dl and dls is None:
                    raise ValueError(
                        "segment payload carries no dl run but has_dl=True "
                        "was requested — decode with has_dl=False (scoring "
                        "will join doc_stats instead)")
                d = {"term": row["term"], "doc_id": docs,
                     "tf": tfs.astype("int32")}
                if has_dl:
                    d["dl"] = dls.astype("int32")
                if positional:
                    pp = row["pos_payload"]
                    if pp is None or len(pp) == 0:
                        raise ValueError(
                            "segment block has no positional payload "
                            "(encoded with positional=False) — phrase/"
                            "proximity queries need a positional build")
                    counts, flat = codec.decode_positions(pp)
                    splits = np.split(flat.astype("int32"), np.cumsum(counts)[:-1])
                    d["positions"] = [list(map(int, s)) for s in splits]
                frames.append(pd.DataFrame(d))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    cols = ["term", "payload"] + (["pos_payload"] if positional else [])
    return segments.select(*cols).mapInPandas(decode, out_schema)
