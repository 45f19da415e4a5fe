"""Document-lifecycle plans over the `documents` table (reference §2.12 +
F/J families on the catalog).

The reference's lifecycle is SQLite row mutations guarded by Python checks
(/root/reference/src/load/sqlite_store.py, src/pipeline.py:192-295). Each
query here is the declarative equivalent over an immutable table: change
detection is a hash anti-join, deletion is an anti-join rewrite, stats are
hash aggregates. At scale these run as broadcast joins against the (small)
catalog side and never mutate in place — the Delta/partition-overwrite
sink in sources/sinks.py applies their outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import file_hash, title_from_filename, token_count_estimate
from ..registry import query
from ..sources.catalog import load_table


@query(
    "docs_stats_by_source",
    oracle="""
    SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST((sum(n_chars) * 10000) // count(*) AS BIGINT) AS avg_chars_x10000
    FROM documents GROUP BY source ORDER BY source
    """,
)
def docs_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference A1–A3 stats surface (/root/reference/src/pipeline.py:297-311).

    Integer-exact on purpose (the money.py convention): DuckDB's sum() over
    INT is HUGEINT (INT128) and its double rounding ties differ from Spark's
    HALF_UP, so both the total and the scaled average are kept in BIGINT on
    both sides — no floating representation can diverge between engines."""
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.expr("CAST((sum(n_chars) * 10000) DIV count(*) AS BIGINT)").alias(
                "avg_chars_x10000"
            ),
        )
        .orderBy("source")
    )


@query(
    "doc_hashes",
    oracle="""
    SELECT doc_id, 'sha256:' || sha256(text) AS file_hash
    FROM documents WHERE doc_id < 50 ORDER BY doc_id
    """,
)
def doc_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference F11 file-hash projection
    (/root/reference/src/extract/pymupdf_extractor.py:25-31): content-
    addressed identity, computed scan-side with the built-in sha2."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", file_hash("text").alias("file_hash"))
        .orderBy("doc_id")
    )


@query(
    "incremental_new_docs",
    oracle="""
    WITH catalog AS (
        SELECT 'sha256:' || sha256(text) AS file_hash
        FROM documents WHERE doc_id % 3 = 0
    )
    SELECT d.doc_id, d.source FROM documents d
    WHERE NOT EXISTS (
        SELECT 1 FROM catalog c WHERE c.file_hash = 'sha256:' || sha256(d.text)
    )
    ORDER BY d.doc_id
    """,
)
def incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference J1/S2 incremental ingestion
    (/root/reference/src/pipeline.py:192-220): scanned files anti-joined
    against the already-ingested catalog on content hash. The catalog side
    (hashes only) broadcasts; the scan side never re-reads ingested bytes."""
    docs = load_table(spark, sf_dir, "documents")
    catalog = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select(file_hash("text").alias("file_hash"))
    )
    scanned = docs.withColumn("file_hash", file_hash("text"))
    return (
        scanned.join(F.broadcast(catalog), "file_hash", "left_anti")
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@query(
    "docs_after_source_purge",
    oracle="""
    SELECT source, count(*) AS n_docs FROM documents
    WHERE source <> 'src0'
    GROUP BY source ORDER BY source
    """,
)
def docs_after_source_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference M2/J5 delete-cascade rewrite
    (/root/reference/src/pipeline.py:270-295) applied to the docs table:
    survivors of deleting one source, summarized."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("source") != "src0")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("source")
    )


@query(
    "doc_lookup_filters",
    oracle="""
    SELECT doc_id, source, n_chars FROM documents
    WHERE source LIKE '%src1%' AND n_chars > 300
    ORDER BY doc_id
    """,
)
def doc_lookup_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference F5–F8: equality/LIKE lookups
    (/root/reference/src/load/sqlite_store.py:174-227, title LIKE at
    src/retrieve/hybrid_retriever.py:77-81). Parameterized Column
    predicates make the reference's quote-escaping obsolete; both filters
    push down to the parquet scan."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("source").contains("src1") & (F.col("n_chars") > 300))
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


@query(
    "doc_titles_from_filenames",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(
               regexp_replace(
                   regexp_replace(
                       regexp_replace(source || '_report_' || CAST(doc_id AS VARCHAR) || '.pdf', '\\.pdf$', ''),
                       '^[A-Z]{2,3}[0-9]{2,4}[ _-]*', ''),
                   '[_-][0-9]{4,8}$', ''),
               '[_-]+', ' ', 'g')) AS title
    FROM documents WHERE doc_id < 40 ORDER BY doc_id
    """,
)
def doc_titles_from_filenames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference F10 title-from-filename regex chain
    (/root/reference/src/extract/pymupdf_extractor.py:33-51), applied to a
    synthesized filename column."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    fname = F.concat(F.col("source"), F.lit("_report_"), F.col("doc_id").cast("string"), F.lit(".pdf"))
    return docs.select("doc_id", title_from_filename(fname).alias("title")).orderBy("doc_id")


@query(
    "doc_token_estimates",
    oracle="""
    SELECT doc_id,
           CAST(floor(len(list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')) * 1.3) AS INT) AS token_est
    FROM documents WHERE doc_id < 60 ORDER BY doc_id
    """,
)
def doc_token_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference F12 token estimate (words × 1.3,
    /root/reference/src/transform/chunker.py:124-126)."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", token_count_estimate("text").alias("token_est"))
        .orderBy("doc_id")
    )
