"""etl_pdf_pipepline_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of the reference PDF ETL + RAG
pipeline (`dabsdamoon/ETL-pdf-pipepline`), re-expressed Spark-first.

Layout (SURVEY.md §7):
- ``session``    SparkSession factory (AQE, UTC, Arrow)
- ``sources``    catalog over parquet tables; binary/raw-doc ingestion
- ``functions``  scalar column-expression library (text, vectors)
- ``operators``  chunking, dedup, similarity, text-stats, validation
- ``retrieval``  BM25 / vector / hybrid-RRF search (the reference's Q1–Q8)
- ``plans``      relational query plans + lifecycle jobs (ingest/delete/stats)
- ``streaming``  Structured Streaming ingestion & event windows
- ``registry``   named query + DuckDB-oracle registry driving __spark_entry__
"""

__version__ = "0.1.0"
