"""Index-construction parity: Spark postings/doc_stats/term_stats vs oracle
dict index (SURVEY §2.3 A1-A3, §1.2 shapes)."""

from pyspark.sql import functions as F

from search_engine_spark.operators import postings as P


def test_postings_match_oracle(built_index, oracle_index):
    o_index, _ = oracle_index
    rows = built_index.postings.collect()
    got = {(r.term, r.doc_id): (r.tf, list(r.positions)) for r in rows}
    want = {}
    for term, (df, postings) in o_index.items():
        for doc_id, positions in postings.items():
            want[(term, doc_id)] = (len(positions), positions)
    assert got == want


def test_positions_are_one_based(built_index):
    m = built_index.postings.agg(F.min(F.array_min("positions"))).collect()[0][0]
    assert m == 1


def test_df_matches_oracle(built_index, oracle_index):
    o_index, _ = oracle_index
    got = {r.term: r.df for r in built_index.term_stats.collect()}
    assert got == {t: e[0] for t, e in o_index.items()}


def test_doc_stats_match_oracle(built_index, oracle_index):
    _, doc_sizes = oracle_index
    got = {r.doc_id: r.dl for r in built_index.doc_stats.collect()}
    assert got == doc_sizes


def test_corpus_stats(built_index, oracle_index):
    _, doc_sizes = oracle_index
    st = built_index.stats
    assert st["n_docs"] == len(doc_sizes)
    assert st["total_len"] == sum(doc_sizes.values())


def test_salted_term_stats_equal_unsalted(spark, built_index):
    """The salted two-phase aggregation is semantics-preserving."""
    plain = (
        built_index.postings.groupBy("term")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
    )
    salted = P.term_stats(built_index.postings, salt_buckets=7)
    a = {(r.term, r.df, r.cf) for r in plain.collect()}
    b = {(r.term, r.df, r.cf) for r in salted.collect()}
    assert a == b


def test_extract_text_invariant(spark, corpus_sdf, corpus_pdf):
    """input_hint invariant: extract_text(html) == text byte-identically
    per url, as a vectorized UDF over the synthetic web corpus."""
    from search_engine_spark.functions.analyzer import make_extract_text_udf
    from search_engine_spark.sources.corpus import _gen_rows
    import numpy as np

    pdf = _gen_rows(np.arange(80))
    sdf = spark.createDataFrame(pdf)
    bad = (
        sdf.withColumn("extracted", make_extract_text_udf()(F.col("html")))
        .filter(F.col("extracted") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_dense_ids_reliable_checkpoint_identity(spark, tmp_path):
    """reliable_checkpoint=True (cluster-recoverable blocks) assigns the
    SAME ids as the default localCheckpoint path."""
    from search_engine_spark.sources import corpus as C

    web = C.synthesize_web_corpus(spark, 200)
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    a = {(r.url, r.doc_id) for r in C.with_dense_doc_ids(web)
         .select("url", "doc_id").collect()}
    b = {(r.url, r.doc_id) for r in
         C.with_dense_doc_ids(web, reliable_checkpoint=True)
         .select("url", "doc_id").collect()}
    assert a == b and len(a) == 200


def test_dense_ids_local_relation_and_union(spark):
    """Two regressions pinned at once: (1) a createDataFrame input (a
    Catalyst LocalRelation — ConvertToLocalRelation used to fold the
    partition-id stamp to constant 0, colliding every partition's ids);
    (2) consuming the numbered frame through a downstream union (stage
    partition indices shift, which desynced a TaskContext-at-numbering
    variant). Ids must stay dense/unique in both shapes."""
    import numpy as np

    from search_engine_spark.sources import corpus as C
    from search_engine_spark.sources.corpus import _gen_rows

    local = spark.createDataFrame(_gen_rows(np.arange(37)))
    ids = sorted(r.doc_id for r in
                 C.with_dense_doc_ids(local, start=101)
                 .select("doc_id").collect())
    assert ids == list(range(101, 138))

    numbered = C.with_dense_doc_ids(local, start=1000)
    other = spark.createDataFrame(_gen_rows(np.arange(500, 520))) \
        .withColumn("doc_id", F.monotonically_increasing_id())
    through_union = other.select("doc_id").unionByName(
        numbered.select("doc_id"))
    got = sorted(r.doc_id for r in through_union.collect()
                 if r.doc_id >= 1000)
    assert got == list(range(1000, 1037))
