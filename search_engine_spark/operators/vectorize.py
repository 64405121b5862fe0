"""Feature-hashed document vectors (the "hashing trick" / HashingTF):
tokens → md5 bucket in [0, dim) → per-doc term-frequency vector, with
no vocabulary to fit, broadcast, or keep consistent across reruns —
the property that makes hashing the default text vectorizer at
100 TB (a vocabulary dictionary is corpus-wide mutable state; a hash
is not).

The reference engine vectorizes only through its inverted index (VSM
weights per indexed term); this supplies the index-free vectorization
an LLM-data pipeline wants for clustering/classification features, and
it composes with ``clustering.kmeans_train`` for topic-style corpus
partitioning without an embedding model.

Scale shape:
* ``hashed_tf`` — explode(split) → groupBy(doc_id, bucket).count():
  ONE map-side-combined aggregate, pure JVM (the md5 bucket is
  ``sampling.hash_bucket``, column expressions only). Long/sparse form
  (doc_id, bucket, tf) — the natural storage shape (most docs touch a
  small fraction of buckets) and the DuckDB-gated contract.
* ``hashed_vectors`` — scatters the sparse rows into a dense
  array<double> per doc via map_from_entries + a sequence transform:
  one groupBy(doc_id), still JVM-only. Dense form feeds kmeans/cosine.

Determinism: the bucket is the first 8 md5 hex digits of
(term || 'htf:') mod dim — exactly reproducible in SQL
(``CAST(('0x' || substr(md5(term || 'htf:'), 1, 8)) AS BIGINT)``), so
the ``hashed_tf`` driver entry value-hashes cross-engine; tf values are
integer counts (no float-sum order concerns). Tokenization is the
corpus convention shared with decontam/bigrams: ASCII-whitespace split,
empty tokens dropped, NO case folding or stemming (hash features are
raw-surface by design; fold upstream if wanted).

Hash collisions are the accepted trade (two terms sharing a bucket add
their counts); at the default dim=256 they are common and harmless for
clustering — raise dim for finer features. Docs with zero tokens
produce no rows in ``hashed_tf`` and no vector in ``hashed_vectors``
(callers needing them keep a left join on the source frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import hash_bucket

#: bucket-salt prefix: keeps the feature-hash stream independent of the
#: split/sample/mixture hash streams (see sampling.hash_bucket)
SALT = "htf:"


def hashed_tf(docs: DataFrame, dim: int = 256,
              text_col: str = "text") -> DataFrame:
    """→ (doc_id, bucket, tf): sparse feature-hashed term counts."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1: {dim}")
    term = F.explode(F.split(F.col(text_col), r"\s+")).alias("term")
    toks = docs.select("doc_id", term).filter(F.col("term") != "")
    bucket = hash_bucket(F.col("term"), SALT, dim)
    return (
        toks.groupBy("doc_id", bucket.alias("bucket"))
        .agg(F.count("*").alias("tf"))
    )


def hashed_vectors(docs: DataFrame, dim: int = 256,
                   text_col: str = "text",
                   normalize: bool = True) -> DataFrame:
    """→ (doc_id, x array<double>): dense dim-width vector per doc
    (L2-normalized by default, ready for cosine/k-means). JVM-only
    scatter; docs with zero tokens are absent (see module docstring)."""
    sparse = hashed_tf(docs, dim, text_col)
    m = F.map_from_entries(
        F.collect_list(F.struct(F.col("bucket").cast("int").alias("k"),
                                F.col("tf").cast("double").alias("v"))))
    g = sparse.groupBy("doc_id").agg(m.alias("_m"))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(int(dim) - 1)),
        lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(0.0)),
    )
    out = g.select("doc_id", vec.alias("x"))
    if normalize:
        nrm = F.sqrt(F.aggregate(F.col("x"), F.lit(0.0),
                                 lambda acc, x: acc + x * x))
        # a doc present in sparse form has tf >= 1 somewhere → nrm > 0
        out = out.select(
            "doc_id", F.transform(F.col("x"), lambda x: x / nrm).alias("x"))
    return out
