"""PDF ingestion sources: directory scan, validation, text extraction.

Re-expresses the reference's extract stage Spark-first:

- S1 directory scan (/root/reference/src/pipeline.py:170-190): the
  `binaryFile` datasource replaces the glob loop — (path, modificationTime,
  length, content) rows, partitioned by file, with pathGlobFilter pushdown.
- F1 validation (/root/reference/src/extract/validator.py:17-84): a
  computed `validation_result` column. The size/empty/magic checks are
  JVM-side `when()` arms; the open/password/page-count checks need a PDF
  parser and live in the extraction UDF (a file that fails to parse gets
  `corrupted` there), so validation is split scan-side vs parse-side
  exactly along the cheap/expensive boundary — at 100 TB the scan-side
  arms prune garbage before any Python runs.
- S3 extraction (/root/reference/src/extract/pymupdf_extractor.py:53-148):
  an Arrow-batched UDF binary → struct(markdown, page_count, method).
  PyMuPDF is the real parser when importable; this container ships no PDF
  libs, so the default is the deterministic text-passthrough parser
  (utf-8 decode, form-feed pages) — same seam policy as
  operators/multimodal.py: real schema, plumbing, and partitioning; the
  codec is the swappable slot.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_FILE_SIZE_MB = 50  # reference src/config.py:60
MAX_PAGE_COUNT = 500  # reference src/config.py:61

try:  # the real parser slot
    import fitz  # type: ignore  # noqa: F401

    HAVE_PYMUPDF = True
except Exception:  # pragma: no cover - environment-dependent
    HAVE_PYMUPDF = False


def scan_pdf_dir(spark: SparkSession, directory: str) -> DataFrame:
    """S1: glob *.pdf under a directory as binary rows."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(directory)
    )


def with_validation(df: DataFrame) -> DataFrame:
    """F1 scan-side dispositions over binaryFile rows; `valid` here means
    "worth sending to the parser" (parse-side failures downgrade to
    `corrupted` later). Pure column expressions — prunes before Python."""
    return df.withColumn(
        "validation_result",
        F.when(F.col("length") > MAX_FILE_SIZE_MB * 1024 * 1024, "file_too_large")
        .when(F.col("length") == 0, "empty")
        .when(F.substring(F.col("content").cast("string"), 1, 5) != "%PDF-", "corrupted")
        .otherwise("valid"),
    )


EXTRACTED_FIELDS = [
    T.StructField("path", T.StringType()),
    T.StructField("markdown", T.StringType()),
    T.StructField("page_count", T.IntegerType()),
    T.StructField("method", T.StringType()),
    T.StructField("error", T.StringType()),
]


def _parse_pymupdf(content: bytes) -> tuple[str, int]:  # pragma: no cover
    import fitz

    doc = fitz.open(stream=content, filetype="pdf")
    try:
        if doc.needs_pass:
            raise ValueError("password_protected")
        if doc.page_count > MAX_PAGE_COUNT:
            raise ValueError("too_many_pages")
        text = "\n\n".join(page.get_text() for page in doc)
        return text, doc.page_count
    finally:
        doc.close()


def _parse_passthrough(content: bytes) -> tuple[str, int]:
    """Deterministic fallback parser: utf-8 text, form-feed page breaks."""
    text = content.decode("utf-8", errors="replace")
    return text, max(1, text.count("\x0c") + 1)


def extract_markdown(df: DataFrame, carry: list[str] | None = None) -> DataFrame:
    """S3/S4 slot: binary → (markdown, page_count) via mapInPandas. Errors
    are captured per-row (error column), not raised — the reference's
    stop-on-failure (M4) is a driver policy applied on top.

    `carry` columns (e.g. scan-side file_hash/title) pass straight through
    the UDF, so downstream metadata needs NO self-join back onto the scan
    lineage — without this the binaryFile read + parse would re-execute
    once per join branch (the parse being the dominant cost with a real
    PDF codec)."""
    carry = carry or []

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parse = _parse_pymupdf if HAVE_PYMUPDF else _parse_passthrough
        method = "pymupdf" if HAVE_PYMUPDF else "passthrough"
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in ("path", "markdown", "page_count", "method", "error")}
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    md, pages = parse(bytes(content))
                    err = None
                except Exception as e:  # parse-side validation failures
                    md, pages, err = None, None, str(e)
                out["path"].append(path)
                out["markdown"].append(md)
                out["page_count"].append(pages)
                out["method"].append(method)
                out["error"].append(err)
            result = pd.DataFrame(out)
            for c in carry:
                result[c] = pdf[c].values
            yield result

    schema = T.StructType(
        EXTRACTED_FIELDS + [df.schema[c] for c in carry]
    )
    return df.select("path", "content", *carry).mapInPandas(run, schema)


def read_markdown_checkpoints(spark: SparkSession, directory: str) -> DataFrame:
    """S7 raw form: ingest reference-style markdown checkpoint files
    (`data/markdown/{id}.md`, YAML-ish frontmatter written by
    /root/reference/src/extract/pymupdf_extractor.py:150-171 and parsed
    back by src/transform/markdown_parser.py:33-102). The parquet stage
    table is this engine's native checkpoint; this reader exists so
    reference-written .md trees ingest directly. Frontmatter parsing is
    all JVM expressions: regexp block split + str_to_map — no Python."""
    raw = (
        spark.read.option("pathGlobFilter", "*.md")
        .text(directory, wholetext=True)
        .withColumn("path", F.input_file_name())
    )
    fm_block = F.regexp_extract("value", r"(?s)\A---\n(.*?)\n---\n", 1)
    body = F.regexp_replace("value", r"(?s)\A---\n.*?\n---\n", "")
    return raw.select(
        "path",
        F.str_to_map(fm_block, F.lit("\n"), F.lit(": ")).alias("frontmatter"),
        body.alias("markdown"),
    )
