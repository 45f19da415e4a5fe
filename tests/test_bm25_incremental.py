"""extend_index ≡ full rebuild (retrieval/bm25.py): the O(delta) FTS
index extension must score bit-identically to rebuilding over the whole
corpus — postings, denormalized dl, query-time df, and the exactly-merged
corpus scalars all have to agree."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pdf_pipepline_spark.retrieval.bm25 import (
    bm25_scores_from_index,
    corpus_scalars,
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

    # scalars live in the CAS-committed meta record (r8); the exact
    # integer merge means the extended index's stats equal the rebuild's
    assert corpus_scalars(spark, incr_path) == corpus_scalars(spark, full_path)

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
    before = corpus_scalars(spark, path)
    extend_index(docs.filter(F.lit(False)), "doc_id", "text", path)
    assert corpus_scalars(spark, path) == before


def test_compact_preserves_scores_and_folds_files(spark, tmp_path):
    """compact_index must fold the per-extend file accumulation back to
    the build-time layout without changing a single score — compaction
    moves bytes, never statistics or postings content."""
    import os

    from etl_pdf_pipepline_spark.retrieval.bm25 import compact_index

    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "idx")
    n_buckets = 8
    persist_index(docs.filter(F.col("doc_id") % 5 == 1), "doc_id", "text", path, n_buckets)
    for m in (2, 3, 4, 0):  # four daily extends
        extend_index(docs.filter(F.col("doc_id") % 5 == m), "doc_id", "text", path, n_buckets)

    def n_files(sub):
        return sum(1 for f in os.listdir(f"{path}/{sub}") if f.endswith(".parquet"))

    assert n_files("postings") > n_buckets  # the accumulation is real
    before_scores = dict(bm25_scores_from_index(spark, path, TERMS).collect())
    before_scalars = corpus_scalars(spark, path)

    counts = compact_index(spark, path, n_buckets)
    assert counts["postings"] == n_buckets == n_files("postings")
    assert corpus_scalars(spark, path) == before_scalars
    after_scores = dict(bm25_scores_from_index(spark, path, TERMS).collect())
    assert set(after_scores) == set(before_scores)
    for k, v in before_scores.items():
        # same per-component algebra; per-doc double fold order may move
        # with the file layout — the serving tier's round(4) contract
        assert round(v, 4) == round(after_scores[k], 4), k


def test_extend_migrates_legacy_corpus_layouts(spark, tmp_path):
    """Pre-r8 indexes stored scalars as a one-row {path}/corpus parquet;
    pre-r7 ones lacked total_dl entirely. extend_index must accept both
    (ADVICE r7: fall back to reconstructing total_dl from doc_stats)
    and re-publish through the CAS meta, scoring identically to a full
    rebuild afterward."""
    import shutil

    docs = load_table(spark, SF, "documents")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    delta = docs.filter(F.col("doc_id") % 5 == 0)

    for drop_total_dl in (False, True):
        path = str(tmp_path / f"legacy_{drop_total_dl}")
        persist_index(base, "doc_id", "text", path)
        n, total = corpus_scalars(spark, path)
        # devolve to the legacy layout: corpus parquet, no meta record
        cols = [F.lit(n).cast("long").alias("n")]
        if not drop_total_dl:
            cols.append(F.lit(total).cast("long").alias("total_dl"))
        cols.insert(0, F.lit(float(total) / n).alias("avgdl"))
        spark.range(1).select(*cols).write.parquet(f"{path}/corpus")
        shutil.rmtree(f"{path}/_manifests")
        assert corpus_scalars(spark, path) == (n, total)

        extend_index(delta, "doc_id", "text", path)
        full_path = str(tmp_path / f"full_{drop_total_dl}")
        persist_index(docs, "doc_id", "text", full_path)
        assert corpus_scalars(spark, path) == corpus_scalars(spark, full_path)
        incr = dict(bm25_scores_from_index(spark, path, TERMS).collect())
        full = dict(bm25_scores_from_index(spark, full_path, TERMS).collect())
        assert set(incr) == set(full)
        for k in full:
            assert round(full[k], 4) == round(incr[k], 4), k


def test_term_df_dictionary_matches_live_scores(spark, tmp_path):
    """r13 layout: the persisted term dictionary's literal-df serving
    plan must score bit-identically to the live (tokenize + query-time
    df) path, and the plan must actually be the one-scan shape (no df
    broadcast join, no second postings scan)."""
    from etl_pdf_pipepline_spark.retrieval.bm25 import bm25_scores

    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "idx")
    persist_index(docs, "doc_id", "text", path)
    assert (tmp_path / "idx" / "term_df").is_dir()

    served = bm25_scores_from_index(spark, path, TERMS)
    plan = served._jdf.queryExecution().executedPlan().toString()
    # one-scan shape: no join, exactly one postings scan
    assert "Join" not in plan, plan
    assert plan.count("Scan parquet") == 1, plan

    live = dict(bm25_scores(docs, "doc_id", "text", TERMS).collect())
    got = dict(served.collect())
    assert set(live) == set(got)
    for k in live:
        assert round(live[k], 4) == round(got[k], 4), k


def test_legacy_index_without_term_df_still_serves(spark, tmp_path):
    """Pre-r13 indexes (no term_df dir) must keep serving through the
    two-scan fallback with identical scores."""
    import shutil

    path = str(tmp_path / "idx")
    docs = load_table(spark, SF, "documents")
    persist_index(docs, "doc_id", "text", path)
    with_dict = dict(bm25_scores_from_index(spark, path, TERMS).collect())
    shutil.rmtree(f"{path}/term_df")
    legacy = dict(bm25_scores_from_index(spark, path, TERMS).collect())
    assert set(with_dict) == set(legacy)
    for k in with_dict:
        assert abs(with_dict[k] - legacy[k]) <= 1e-12 * max(abs(with_dict[k]), 1.0), k


def test_extend_keeps_term_df_in_sync(spark, tmp_path):
    """After an extend, the dictionary's per-term totals must equal the
    postings' actual per-term row counts (the df the legacy plan would
    compute at query time)."""
    docs = load_table(spark, SF, "documents")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    delta = docs.filter(F.col("doc_id") % 5 == 0)
    path = str(tmp_path / "idx")
    persist_index(base, "doc_id", "text", path)
    extend_index(delta, "doc_id", "text", path)

    from_dict = {
        r["term"]: r["total"]
        for r in spark.read.parquet(f"{path}/term_df")
        .filter(F.col("term").isin(TERMS))
        .groupBy("term")
        .agg(F.sum("df").alias("total"))
        .collect()
    }
    from_postings = {
        r["term"]: r["n"]
        for r in spark.read.parquet(f"{path}/postings")
        .filter(F.col("term").isin(TERMS))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert from_dict == from_postings
