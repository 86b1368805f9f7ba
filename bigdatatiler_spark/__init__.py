"""bigdatatiler_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
BigDataTiler system (a Cosmos-DB-backed compressed-log tiler) as an
idiomatic Spark DataFrame engine, and extends the surface with the
relational + LLM-data-pipeline operators a 100 TB training-data platform
needs (dedup, similarity search, multimodal columns, text analysis).

Layout:
    session      — tuned SparkSession factory (AQE, UTC, shuffle sizing)
    tables       — canonical loaders for the TPC-H-ish test tables
    registry     — query registry backing the driver contract
                   (__spark_entry__.queries / oracle_sql)
    logstore/    — the reference-parity log store: schema, ids, tiling
                   (chunk/split), reassembly, filtered-scan query builder
    operators/   — relational surface, dedup, similarity, text analysis
    streaming/   — Structured Streaming variants of the ingest path
"""

__version__ = "0.1.0"
