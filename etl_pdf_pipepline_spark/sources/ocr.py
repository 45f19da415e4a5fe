"""OCR-style external-call source: page fan-out + batched, retried calls.

Re-expresses the reference's Google Vision extractor
(/root/reference/src/extract/google_vision_extractor.py:51-177) Spark-first:

- render: each document fans out to N page images (reference renders pages
  to PNG at `dpi`, :100-102). The real rasterizer needs a PDF lib this
  container doesn't ship, so the default renderer is a deterministic fake
  (fixed-size character windows of the text, utf-8-encoded as the "image"
  bytes) with the real slot documented — same seam policy as
  operators/multimodal.py. The fake render is pure JVM column expressions
  (sequence + explode + substring + encode): no Python until the external
  call.
- recognize: the per-page API call (:105-106) becomes an Arrow-batched
  `mapInPandas` stage that groups rows into ≤batch_size calls and retries
  transient failures with exponential backoff. Failures that survive
  max_attempts QUARANTINE the affected rows (status/error columns, M4
  per-row capture) instead of failing the task — at 1000-executor scale a
  flaky external service must not kill the job and must not retry-storm it
  (backoff is per-call, attempts capped).
- assemble: page texts concatenate with `<!-- Page N -->` markers (:118)
  back into one markdown per document — collect_list within the doc_id
  group is bounded by the reference's own 500-page cap (src/config.py:61),
  so per-group state stays small no matter the corpus size.

The retry/batch core (`call_with_retries`, `recognize_with_quarantine`) is
plain Python, unit-testable without Spark, and shared by the mapInPandas
stage — the same layering as retrieval/embedder.py's batched provider.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from typing import Protocol

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from .catalog import load_table

DEFAULT_PAGE_CHARS = 800  # fake-render page size (chars per "page image")
DEFAULT_BATCH_SIZE = 16  # pages per external call (reference is 1/page; we batch)
DEFAULT_MAX_ATTEMPTS = 3
DEFAULT_BACKOFF_S = 0.05


class TransientOcrError(Exception):
    """Retryable failure (rate limit, timeout, 5xx). Anything else raised
    by a client is treated as permanent and quarantines without retry."""


class OcrClient(Protocol):
    def recognize_batch(self, images: list[bytes]) -> list[str]: ...


class FakeOcrClient:
    """Deterministic stand-in for the Vision client.

    "Recognition" is utf-8 decode of the fake page image — lossless, so
    the pipeline output is oracle-checkable end to end. `fail_every=k`
    makes every k-th `recognize_batch` invocation raise TransientOcrError
    (the invocation counter includes retries, so a failed call succeeds on
    its retry when k > 1, and k == 1 exercises the exhaustion path) —
    fully deterministic, no clock or randomness, safe across executor
    processes."""

    def __init__(self, fail_every: int = 0):
        self.fail_every = fail_every
        self.calls = 0
        self.batch_sizes: list[int] = []

    def recognize_batch(self, images: list[bytes]) -> list[str]:
        self.calls += 1
        self.batch_sizes.append(len(images))
        if self.fail_every and self.calls % self.fail_every == 0:
            raise TransientOcrError(f"simulated transient failure (call {self.calls})")
        return [bytes(img).decode("utf-8", errors="replace") for img in images]


def call_with_retries(
    fn: Callable[[], list[str]],
    max_attempts: int = DEFAULT_MAX_ATTEMPTS,
    backoff_s: float = DEFAULT_BACKOFF_S,
    sleep: Callable[[float], None] = time.sleep,
) -> tuple[list[str] | None, str | None, int]:
    """Run one external call with exponential backoff on transient errors.

    Returns (result, error, attempts). Only TransientOcrError retries;
    permanent errors return immediately — retrying a malformed-input
    rejection just burns quota."""
    err: str | None = None
    for attempt in range(1, max_attempts + 1):
        try:
            return fn(), None, attempt
        except TransientOcrError as e:
            err = str(e)
            if attempt < max_attempts:
                sleep(backoff_s * (2 ** (attempt - 1)))
        except Exception as e:  # permanent
            return None, str(e), attempt
    return None, err, max_attempts


def recognize_with_quarantine(
    client: OcrClient,
    images: list[bytes],
    batch_size: int = DEFAULT_BATCH_SIZE,
    max_attempts: int = DEFAULT_MAX_ATTEMPTS,
    backoff_s: float = DEFAULT_BACKOFF_S,
    sleep: Callable[[float], None] = time.sleep,
) -> list[tuple[str | None, str | None, int]]:
    """Recognize a row batch in ≤batch_size calls; a call that exhausts its
    retries quarantines ONLY its slice (other slices proceed). Returns one
    (text, error, attempts) per input image, order-preserving."""
    out: list[tuple[str | None, str | None, int]] = []
    for start in range(0, len(images), batch_size):
        chunk = images[start : start + batch_size]
        texts, err, attempts = call_with_retries(
            lambda c=chunk: client.recognize_batch(c), max_attempts, backoff_s, sleep
        )
        if texts is None:
            out.extend((None, err, attempts) for _ in chunk)
        else:
            out.extend((t, None, attempts) for t in texts)
    return out


def render_pages(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    page_chars: int = DEFAULT_PAGE_CHARS,
) -> DataFrame:
    """1→N page fan-out (reference render step, google_vision_extractor.py:
    100-102). Fake renderer: fixed-size char windows of the text, utf-8
    bytes as the page "image" — all JVM expressions (a real pdf→PNG
    rasterizer would be a mapInPandas over binary content in this same
    slot). Every document yields ≥1 page, as a PDF always has a page."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    n_pages = F.greatest(
        F.lit(1), F.ceil(F.length(txt) / F.lit(float(page_chars)))
    ).cast("int")
    exploded = docs.select(
        F.col(id_col),
        txt.alias("_page_src"),
        F.explode(F.sequence(F.lit(1), n_pages)).alias("page_no"),
    )
    page_text = F.substring(
        F.col("_page_src"),
        (F.col("page_no") - F.lit(1)) * F.lit(page_chars) + F.lit(1),
        F.lit(page_chars),
    )
    return exploded.select(
        id_col, "page_no", F.encode(page_text, "utf-8").alias("image")
    )


OCR_FIELDS = [
    T.StructField("page_no", T.IntegerType()),
    T.StructField("text", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("error", T.StringType()),
    T.StructField("attempts", T.IntegerType()),
]


def ocr_pages(
    pages: DataFrame,
    client_factory: Callable[[], OcrClient] = FakeOcrClient,
    id_col: str = "doc_id",
    batch_size: int = DEFAULT_BATCH_SIZE,
    max_attempts: int = DEFAULT_MAX_ATTEMPTS,
    backoff_s: float = DEFAULT_BACKOFF_S,
) -> DataFrame:
    """The external-call stage: (doc_id, page_no, image) → recognized text
    with per-row status. One client per Python worker (client_factory runs
    executor-side — connection reuse across Arrow batches, the analogue of
    the reference's lazy client at google_vision_extractor.py:36-41)."""
    schema = T.StructType([pages.schema[id_col]] + OCR_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        for pdf in batches:
            images = [bytes(b) for b in pdf["image"]]
            results = recognize_with_quarantine(
                client, images, batch_size, max_attempts, backoff_s
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "page_no": pdf["page_no"].astype("int32").values,
                    "text": [r[0] for r in results],
                    "status": ["failed" if r[0] is None else "ok" for r in results],
                    "error": [r[1] for r in results],
                    "attempts": pd.array([r[2] for r in results], dtype="int32"),
                }
            )

    return pages.mapInPandas(run, schema)


def assemble_markdown(ocr: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Reassemble per-document markdown with `<!-- Page N -->` markers
    (reference google_vision_extractor.py:118). Pages sort within the
    group via sort_array on (page_no, text) structs — no window, one
    shuffle on doc_id with map-side partial aggregation. Documents with
    any quarantined page report failed_pages > 0 and exclude those pages
    from the markdown (the caller's M4 policy decides retry-vs-drop)."""
    pages = F.sort_array(
        F.collect_list(
            F.when(F.col("status") == "ok", F.struct("page_no", "text"))
        )
    )
    return (
        ocr.groupBy(id_col)
        .agg(
            pages.alias("_pages"),
            F.count(F.when(F.col("status") != "ok", 1)).cast("int").alias("failed_pages"),
            F.max("page_no").alias("_max_page"),
        )
        .select(
            id_col,
            F.size("_pages").cast("int").alias("page_count"),
            "failed_pages",
            # Byte-compatible with the reference's page-marker format
            # (google_vision_extractor.py:118): each page contributes
            # '\n\n<!-- Page N -->\n\n' + text, pages joined by '\n'.
            F.concat_ws(
                "\n",
                F.transform(
                    "_pages",
                    lambda p: F.concat(
                        F.lit("\n\n<!-- Page "),
                        p["page_no"].cast("string"),
                        F.lit(" -->\n\n"),
                        p["text"],
                    ),
                ),
            ).alias("markdown"),
        )
    )


@query(
    "ocr_document_text",
    oracle=f"""
    WITH nums AS (
      SELECT unnest(range(1, (SELECT greatest(CAST(ceil(max(length(coalesce(text,'')))/{DEFAULT_PAGE_CHARS}.0) AS BIGINT), 1) + 1
                              FROM documents))) AS i
    ),
    pages AS (
      SELECT d.doc_id, n.i AS page_no,
             substring(coalesce(d.text,''), ((n.i-1)*{DEFAULT_PAGE_CHARS})+1, {DEFAULT_PAGE_CHARS}) AS ptext
      FROM documents d JOIN nums n
        ON n.i <= greatest(1, CAST(ceil(length(coalesce(d.text,''))/{DEFAULT_PAGE_CHARS}.0) AS BIGINT))
    )
    SELECT doc_id, CAST(max(page_no) AS INT) AS page_count,
           CAST(0 AS INT) AS failed_pages,
           string_agg(chr(10) || chr(10) || '<!-- Page ' || page_no || ' -->' || chr(10) || chr(10) || ptext, chr(10) ORDER BY page_no) AS markdown
    FROM pages GROUP BY doc_id ORDER BY doc_id
    """,
)
def ocr_document_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 end to end on the documents table: fake render → batched
    "recognition" (lossless fake client, so the round trip is exactly the
    paged reassembly DuckDB can mirror) → marker assembly, byte-compatible
    with the reference's page format since r4 (ADVICE r3). The oracle's
    static `nums` series replaces the per-row lateral (DuckDB can't
    correlate generate_series); Spark's explode(sequence(...)) IS the
    per-row lateral, which is the scalable shape — no corpus-wide max on
    the hot path."""
    docs = load_table(spark, sf_dir, "documents")
    rendered = render_pages(docs)
    recognized = ocr_pages(rendered)
    return assemble_markdown(recognized).orderBy("doc_id")
