"""Functional API — mirrors the reference's convenience surface
(/root/reference/src/__init__.py:68-232: extract_pdf / chunk_text /
embed_chunks / process_pdf) with DataFrames in place of Python lists.

The reference functions are one-document-at-a-time; each equivalent here
takes/returns a DataFrame so the same call processes one file or a
100 TB directory — parallelism is partitioning, not a caller loop
(the reference's batch wrapper iterates sequentially,
src/pipeline.py:156-168).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.text import file_hash, title_from_filename
from .operators.chunker import chunk_documents
from .operators.chunker import chunk_text as chunk_text_py
from .retrieval.embedder import Embedder, embed_dataframe
from .sources.extract import extract_markdown, scan_pdf_dir, with_validation


def extract_pdf(spark: SparkSession, directory: str) -> DataFrame:
    """Reference `extract_pdf` (src/__init__.py:68-131), directory-shaped:
    scan → validate → parse valid files → (path, markdown, page_count,
    method, error) + identity metadata (title F10, file_hash F11).

    Metadata is computed scan-side in the SAME projection that feeds the
    parse UDF and carried through it — one binaryFile read, one parse per
    document, no self-join of the scan lineage."""
    files = with_validation(scan_pdf_dir(spark, directory))
    valid = files.filter(F.col("validation_result") == "valid").withColumns(
        {
            "file_hash": file_hash("content"),
            "title": title_from_filename(F.element_at(F.split("path", "/"), -1)),
        }
    )
    return extract_markdown(valid, carry=["file_hash", "title"])


def chunk_text(text: str, size: int = 512, overlap: int = 50) -> list[dict]:
    """Reference `chunk_text` (src/__init__.py:134-167) — the pure-Python
    single-document path (also the UDF kernel of `chunk_documents`)."""
    return chunk_text_py(text, size=size, overlap=overlap)


def chunk_dataframe(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Set-shaped chunking: documents → exploded chunk rows."""
    return chunk_documents(df, id_col, text_col)


def embed_chunks(df: DataFrame, text_col: str = "text", embedder: Embedder | None = None) -> DataFrame:
    """Reference `embed_chunks` (src/__init__.py:170-192): append an
    embedding column (Arrow-batched; deterministic HashEmbedder default)."""
    return embed_dataframe(df, text_col, embedder)


def process_pdf(spark: SparkSession, directory: str, embedder: Embedder | None = None) -> DataFrame:
    """Reference `process_pdf` (src/__init__.py:195-232): extract → chunk
    → embed, returning embedded chunk rows for custom storage. One lazy
    lineage — nothing materializes until the caller acts on it."""
    extracted = extract_pdf(spark, directory)
    docs = extracted.filter(F.col("error").isNull())
    chunks = chunk_documents(
        docs, "path", "markdown", carry=["title", "file_hash"]
    ).withColumnRenamed("document_id", "path")
    return embed_chunks(chunks, "text", embedder)
