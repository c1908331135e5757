"""search_engine_spark — a PySpark-native full-text analytics engine.

A from-scratch rebuild of the query/data semantics of the reference
Elasticsearch-style engine (Inquir-search/search-engine, see SURVEY.md):
positional inverted index, BM25 top-k, an OpenSearch-like query DSL
(match/term/bool/range/prefix/wildcard/fuzzy/phrase/geo/nested), facets and
aggregations — expressed as Spark DataFrame plans over term-partitioned
Parquet index tables (Iceberg-shaped layout: snapshot manifest + per-partition
lineage), plus the training-data-pipeline operators a 100 TB corpus needs
(dedup, similarity search, text quality, multimodal plumbing).

Design: declarative DataFrame plans so Catalyst handles pushdown/pruning;
Python only in Arrow-vectorized pandas UDFs (posting-block codec, WAND).
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
