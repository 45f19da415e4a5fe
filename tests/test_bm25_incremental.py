"""extend_index ≡ full rebuild (retrieval/bm25.py): the O(delta) FTS
index extension must score bit-identically to rebuilding over the whole
corpus — postings, denormalized dl, query-time df, and the exactly-merged
corpus scalars all have to agree."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pdf_pipepline_spark.retrieval.bm25 import (
    bm25_scores_from_index,
    extend_index,
    persist_index,
)
from etl_pdf_pipepline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
TERMS = ["spark", "join", "fast", "table"]


def test_extend_equals_full_rebuild(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    delta = docs.filter(F.col("doc_id") % 5 == 0)
    assert delta.count() > 0

    full_path = str(tmp_path / "full")
    incr_path = str(tmp_path / "incr")
    persist_index(docs, "doc_id", "text", full_path)
    persist_index(base, "doc_id", "text", incr_path)
    extend_index(delta, "doc_id", "text", incr_path)

    full_corpus = spark.read.parquet(f"{full_path}/corpus").collect()[0]
    incr_corpus = spark.read.parquet(f"{incr_path}/corpus").collect()[0]
    assert incr_corpus["n"] == full_corpus["n"]
    assert incr_corpus["total_dl"] == full_corpus["total_dl"]
    assert incr_corpus["avgdl"] == full_corpus["avgdl"]  # exact: int total / n

    full = dict(bm25_scores_from_index(spark, full_path, TERMS).collect())
    incr = dict(bm25_scores_from_index(spark, incr_path, TERMS).collect())
    assert set(full) == set(incr)
    # Per-term components are bit-identical; the per-doc SUM is a double
    # fold whose order follows file layout, so the two indexes may part
    # in the final ulp. The serving tier rounds to 4 decimals (the same
    # total-order contract every search row uses) — assert that, plus a
    # 1e-12 relative band that would catch any real statistic drift.
    for k in full:
        assert abs(full[k] - incr[k]) <= 1e-12 * max(abs(full[k]), 1.0), k
        assert round(full[k], 4) == round(incr[k], 4), k


def test_extend_empty_delta_is_noop(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "idx")
    persist_index(docs, "doc_id", "text", path)
    before = spark.read.parquet(f"{path}/corpus").collect()[0]
    extend_index(docs.filter(F.lit(False)), "doc_id", "text", path)
    after = spark.read.parquet(f"{path}/corpus").collect()[0]
    assert tuple(before) == tuple(after)
