"""OCR external-call seam: retry/backoff, batch splitting, quarantine,
and the end-to-end paged round trip (reference
src/extract/google_vision_extractor.py:51-177)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pdf_pipepline_spark.sources.ocr import (
    DEFAULT_PAGE_CHARS,
    FakeOcrClient,
    TransientOcrError,
    assemble_markdown,
    call_with_retries,
    ocr_document_text,
    ocr_pages,
    recognize_with_quarantine,
    render_pages,
)

from conftest import SF_SMALL


# ---------- plain-Python core (no Spark) ----------


def test_retry_succeeds_after_transient_failures():
    attempts_log = []

    def flaky():
        attempts_log.append(1)
        if len(attempts_log) < 3:
            raise TransientOcrError("rate limited")
        return ["ok"]

    sleeps: list[float] = []
    result, err, attempts = call_with_retries(
        flaky, max_attempts=3, backoff_s=0.1, sleep=sleeps.append
    )
    assert result == ["ok"] and err is None and attempts == 3
    # exponential backoff: 0.1, then 0.2 — and no sleep after success
    assert sleeps == [0.1, 0.2]


def test_retry_exhaustion_returns_error():
    def always_down():
        raise TransientOcrError("503")

    result, err, attempts = call_with_retries(
        always_down, max_attempts=3, backoff_s=0.0, sleep=lambda s: None
    )
    assert result is None and "503" in err and attempts == 3


def test_permanent_error_does_not_retry():
    calls = []

    def bad_input():
        calls.append(1)
        raise ValueError("unsupported image format")

    result, err, attempts = call_with_retries(bad_input, max_attempts=5, sleep=lambda s: None)
    assert result is None and "unsupported" in err
    assert attempts == 1 and len(calls) == 1


def test_batch_splitting_respects_batch_size():
    client = FakeOcrClient()
    images = [f"page {i}".encode() for i in range(10)]
    results = recognize_with_quarantine(client, images, batch_size=4, sleep=lambda s: None)
    assert client.batch_sizes == [4, 4, 2]
    assert [r[0] for r in results] == [f"page {i}" for i in range(10)]
    assert all(r[1] is None and r[2] == 1 for r in results)


def test_quarantine_isolates_failed_slice():
    # fail_every=1 → every invocation fails; max_attempts=1 → no retries.
    client = FakeOcrClient(fail_every=1)
    images = [b"a", b"b"]
    results = recognize_with_quarantine(
        client, images, batch_size=2, max_attempts=1, sleep=lambda s: None
    )
    assert all(r[0] is None and "transient" in r[1] for r in results)

    # fail_every=2 with retries: call 1 ok, call 2 fails then call 3 (its
    # retry) succeeds — both slices come back good, attempts prove the path.
    client = FakeOcrClient(fail_every=2)
    results = recognize_with_quarantine(
        client, [b"a", b"b"], batch_size=1, max_attempts=3, sleep=lambda s: None
    )
    assert [r[0] for r in results] == ["a", "b"]
    assert [r[2] for r in results] == [1, 2]


# ---------- Spark stages ----------


def test_render_pages_fans_out_and_slices(spark):
    docs = spark.createDataFrame(
        [(1, "x" * (DEFAULT_PAGE_CHARS + 10)), (2, "short"), (3, None)],
        "doc_id long, text string",
    )
    pages = render_pages(docs).collect()
    by_doc = {}
    for r in pages:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 2 and len(by_doc[2]) == 1 and len(by_doc[3]) == 1
    p1, p2 = sorted(by_doc[1], key=lambda r: r.page_no)
    assert bytes(p1.image).decode() == "x" * DEFAULT_PAGE_CHARS
    assert bytes(p2.image).decode() == "x" * 10
    assert bytes(by_doc[3][0].image) == b""  # null text → one empty page


def test_ocr_pages_happy_path_and_assembly(spark):
    docs = spark.createDataFrame(
        [(7, "A" * DEFAULT_PAGE_CHARS + "B" * 5)], "doc_id long, text string"
    )
    out = assemble_markdown(ocr_pages(render_pages(docs))).collect()
    assert len(out) == 1
    row = out[0]
    assert row.page_count == 2 and row.failed_pages == 0
    # Reference byte format (google_vision_extractor.py:118): each page is
    # '\n\n<!-- Page N -->\n\n' + text, pages joined by '\n'.
    expected = (
        "\n\n<!-- Page 1 -->\n\n"
        + "A" * DEFAULT_PAGE_CHARS
        + "\n\n\n<!-- Page 2 -->\n\n"
        + "BBBBB"
    )
    assert row.markdown == expected


def test_ocr_pages_quarantine_surfaces_in_assembly(spark):
    docs = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    # Every call fails and retries are off → the single page quarantines;
    # the task itself must NOT fail (per-row capture, M4).
    out = ocr_pages(
        render_pages(docs),
        client_factory=lambda: FakeOcrClient(fail_every=1),
        max_attempts=1,
        backoff_s=0.0,
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0].status == "failed" and rows[0].text is None
    assert "transient" in rows[0].error

    assembled = assemble_markdown(out).collect()[0]
    assert assembled.failed_pages == 1 and assembled.page_count == 0
    assert assembled.markdown == ""


def test_ocr_document_text_matches_direct_reassembly(spark):
    out = ocr_document_text(spark, SF_SMALL)
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    n_docs = docs.count()
    rows = out.collect()
    assert len(rows) == n_docs
    assert all(r.failed_pages == 0 for r in rows)
    # Lossless fake codec ⇒ stripping markers reconstructs the text.
    # Drop each marker block (leading page-join '\n' + '\n\n<!-- Page N
    # -->\n\n'); what remains is the concatenation of page slices = text.
    joined = out.withColumn(
        "reconstructed",
        F.regexp_replace("markdown", r"(\n)?\n\n<!-- Page \d+ -->\n\n", ""),
    ).join(docs.select("doc_id", "text"), "doc_id")
    mismatches = joined.filter(
        F.col("reconstructed") != F.coalesce(F.col("text"), F.lit(""))
    ).count()
    assert mismatches == 0
