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


def __getattr__(name: str):
    """Lazy functional API (mirrors reference src/__init__.py:68-232)
    without importing pyspark at package-import time."""
    if name in ("extract_pdf", "chunk_text", "chunk_dataframe", "embed_chunks", "process_pdf"):
        from . import pipeline

        return getattr(pipeline, name)
    raise AttributeError(name)
