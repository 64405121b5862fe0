"""search_engine_spark — a from-scratch PySpark-native inverted-index + BM25 engine.

Capabilities mirror the reference engine (timhuijsmans1/search_engine, surveyed in
SURVEY.md): positional inverted-index construction, delta+varint posting compression,
BM25 / VSM / language-model ranking, phrase / boolean / proximity / date-filtered
queries — re-expressed as idiomatic Spark DataFrame plans (Catalyst-optimized scans,
salted aggregations, broadcast joins, TakeOrderedAndProject top-k) with vectorized
pandas/Arrow UDFs only where byte-identical Python text semantics are required.

Nothing here is a port: the reference is single-threaded dict-of-dicts Python
(see /root/reference); this package is a distributed columnar design.
"""

__version__ = "0.1.0"
