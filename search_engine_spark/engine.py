"""Top-level API: build_index(spark, docs, conf) / search(index, query).

The thin facade over operators/* — mirrors the reference's two halves
(indexing/main.py batch build; search/retrieval query execution) as two
composable calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .functions.analyzer import AnalyzerConfig
from .operators import postings as P
from .operators.search import InvertedIndex


def build_index(docs: DataFrame, conf: AnalyzerConfig = AnalyzerConfig.full(),
                positional: bool = True, cache: bool = True,
                documents: DataFrame | None = None) -> InvertedIndex:
    """documents(doc_id, text, …) → in-memory InvertedIndex handle.

    For the durable, segment-file form (delta+varint blocks, lineage,
    resume) see jobs/build_index.py + sources/catalog.py; this handle is
    the hot-cache form used by tests and the query engine directly.
    """
    post = P.build_postings(docs, conf, positional=positional)
    dstats = P.doc_stats(docs, conf)
    tstats = P.term_stats(post)
    if cache:
        post = post.cache()
        dstats = dstats.cache()
        tstats = tstats.cache()
    stats = P.corpus_stats(dstats)
    return InvertedIndex(
        postings=post, doc_stats=dstats, term_stats=tstats, stats=stats,
        documents=documents if documents is not None else docs, analyzer=conf,
    )


def search(index: InvertedIndex, query: str, k: int = 100,
           model: str = "bm25", **kwargs) -> DataFrame:
    """Unified query entry (SURVEY §2.7): classifies the query
    (free-text / phrase / boolean / proximity, plus optional date range
    and spellcheck kwargs) and dispatches through operators.executor —
    the facade mirroring the reference's RetrievalExecution.

    Cache lifecycle: a query's phrase/adaptive-candidate caches live on
    the index handle until the NEXT search() (or executor.execute())
    call releases them. Callers driving search_phrase /
    search_freetext_tokens(adaptive=True) DIRECTLY on a long-lived index
    should call ``index.release_caches()`` between queries themselves —
    see InvertedIndex.release_caches."""
    from .operators import executor

    return executor.execute(index, query, k=k, model=model, **kwargs)
