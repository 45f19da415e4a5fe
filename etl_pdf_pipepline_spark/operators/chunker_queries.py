"""Chunker queries: the SQL-expressible fixed-window chunker (oracle-
checked) and the full hybrid chunker (rows-only check — a recursive
splitter is not expressible in ANSI SQL; its semantics are pinned by the
golden unit tests in tests/test_chunker.py instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.catalog import load_table
from .chunker import CHUNK_OVERLAP, CHUNK_SIZE, chunk_documents

_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP  # 462


@query(
    "chunk_fixed_window",
    oracle=f"""
    WITH n AS (
        SELECT doc_id, text, length(text) AS len,
               CASE WHEN length(text) <= {CHUNK_SIZE} THEN 1
                    ELSE 1 + CAST(floor((length(text) - {CHUNK_SIZE} + {_STRIDE} - 1) / {_STRIDE}.0) AS INT)
               END AS n_chunks
        FROM documents
    ),
    e AS (
        SELECT doc_id, text, n_chunks, unnest(range(0, n_chunks)) AS chunk_index
        FROM n
    ),
    c AS (
        SELECT doc_id, chunk_index, n_chunks AS total_chunks,
               substr(text, 1 + chunk_index * {_STRIDE}, {CHUNK_SIZE}) AS chunk
        FROM e
    )
    SELECT doc_id, chunk_index, total_chunks,
           length(chunk) AS chunk_len, md5(chunk) AS chunk_md5,
           chunk_index = 0 AS is_section_start
    FROM c ORDER BY doc_id, chunk_index
    """,
)
def chunk_fixed_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size character chunking (size 512, overlap 50 — the reference's
    ChunkingConfig, /root/reference/src/config.py:68-69) in pure built-ins:
    sequence → transform → posexplode. Entirely JVM-side, no UDF, no
    shuffle — each document expands within its own partition."""
    docs = load_table(spark, sf_dir, "documents")
    length = F.length("text")
    n_chunks = F.when(length <= CHUNK_SIZE, F.lit(1)).otherwise(
        (
            F.lit(1)
            + F.floor((length - CHUNK_SIZE + _STRIDE - 1) / F.lit(float(_STRIDE)))
        ).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.col("text").substr(i * _STRIDE + 1, F.lit(CHUNK_SIZE)),
    )
    return (
        docs.select("doc_id", n_chunks.alias("total_chunks"), F.posexplode(chunks).alias("chunk_index", "chunk"))
        .select(
            "doc_id",
            "chunk_index",
            "total_chunks",
            F.length("chunk").alias("chunk_len"),
            F.md5("chunk").alias("chunk_md5"),
            (F.col("chunk_index") == 0).alias("is_section_start"),
        )
        .orderBy("doc_id", "chunk_index")
    )


@query("chunk_markdown_hybrid", oracle=None)
def chunk_markdown_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full hybrid chunker (header split + recursive split,
    /root/reference/src/transform/chunker.py:50-122) over the documents
    table. Non-SQL-expressible → rows-only driver check; exact semantics
    are pinned by golden tests (tests/test_chunker.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, "doc_id", "text").orderBy("document_id", "chunk_index")
