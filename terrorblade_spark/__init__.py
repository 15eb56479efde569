"""terrorblade_spark — a from-scratch PySpark-native analytics engine.

Re-implements the query/data-processing capabilities of the reference
engine (sevapru/terrorblade: Telegram ingest -> normalize -> embed ->
cluster -> vector search -> SQL analytics) as idiomatic Spark:
declarative DataFrame plans optimized by Catalyst, Arrow-batched pandas
UDFs only where built-ins genuinely cannot express the semantics
(embedding encode), and partition-aware design for 100 TB scale.

Layout
------
- ``session``    SparkSession factory (AQE, Arrow, UTC, tuned shuffle)
- ``tables``     parquet table loaders for the test star schema
- ``registry``   query + DuckDB-oracle registry consumed by __spark_entry__
- ``operators/`` composable DataFrame -> DataFrame operators
  (relational, windows, sessionization, dedup, components, sampling,
  packing, curation, text, vector)
- ``sources/``   Telegram JSON export reader and normalizer
- ``queries/``   the named query surface (imported to populate registry)
- ``streaming/`` Structured Streaming variants (session/tumbling windows)
- ``api``        user-facing facade mirroring the reference's entry points
"""

__version__ = "0.1.0"
