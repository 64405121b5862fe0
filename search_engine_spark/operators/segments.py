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


def bm25_upper_bound(df: int, n_docs: int, max_tf: int,
                     k1: float = 1.2, b: float = 0.75) -> float:
    """Per-block BM25 score ceiling (dl→0 bound), used by WAND pruning."""
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * (k1 + 1.0) * max_tf / (max_tf + k1 * (1.0 - b))


def encode_segments(postings: DataFrame, buckets: int = DEFAULT_BUCKETS,
                    block_span: int = DEFAULT_BLOCK_SPAN,
                    positional: bool = True) -> DataFrame:
    """postings (term, doc_id, tf[, positions]) → segment blocks.

    One shuffle (groupBy term, block_id — bounded groups), Arrow-batched
    encode in applyInPandas.
    """
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
        payload = codec.encode_block(docs, tfs, dls)
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
