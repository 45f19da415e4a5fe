"""Plan-shape regression guards for the r11 union-purge rewrites.

Spark plans unionAll branches independently — N selects over one
expensive subtree execute it N times. These tests pin the fixed shapes
(one scan of the expensive input) so the defect can't silently return
via a refactor that reintroduces a per-band / per-column union.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lsh_band_keys_single_signature_pass(spark):
    """Banding must compute the minhash signature ONCE and explode, not
    union per-band selects (each of which re-runs scan+shingle+md5+agg).
    Pin: exactly one parquet scan and one Generate (explode), no Union."""
    from etl_pdf_pipepline_spark.operators.dedup import lsh_band_keys
    from etl_pdf_pipepline_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents")
    plan = _executed_plan(lsh_band_keys(docs))
    assert "Union" not in plan, "per-band union re-executes the signature subtree"
    assert len(re.findall(r"Scan parquet", plan)) == 1
    assert plan.count("Generate") >= 1  # shingle explode + band explode


def test_embedding_lsh_candidates_single_keyed_join(spark):
    """Sign-LSH candidate generation: one composite-key (band, bucket)
    self-join, not a per-band join + union. The full query re-attaches
    vectors by id afterwards (two more scans, linear by design), so pin
    the absence of Union — the signature of the per-band shape."""
    from etl_pdf_pipepline_spark.registry import all_queries

    df = all_queries()["embedding_lsh_pairs"](spark, SF)
    plan = _executed_plan(df)
    assert "Union" not in plan


def test_corpus_profile_single_scan(spark):
    """The ANALYZE-style profile must read documents ONCE (a wide
    multi-distinct aggregate planned via Expand), not once per column."""
    from etl_pdf_pipepline_spark.registry import all_queries

    df = all_queries()["corpus_profile"](spark, SF)
    plan = _executed_plan(df)
    assert "Union" not in plan
    assert len(re.findall(r"Scan parquet", plan)) == 1
    assert "Expand" in plan  # multi-countDistinct plans as one Expand


def test_lsh_band_keys_rows_unchanged(spark):
    """The explode rewrite emits exactly the same (id, band_id, band_key)
    rows as N_BANDS rows per doc with distinct band ids."""
    from etl_pdf_pipepline_spark.operators.dedup import _LSH_BANDS, lsh_band_keys
    from etl_pdf_pipepline_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 20)
    n_docs = docs.count()
    bands = lsh_band_keys(docs)
    assert bands.count() == n_docs * len(_LSH_BANDS)
    per_doc = bands.groupBy("doc_id").agg(
        F.countDistinct("band_id").alias("n_bands")
    )
    assert per_doc.filter(F.col("n_bands") != len(_LSH_BANDS)).count() == 0


# ---------------------------------------------------------------------------
# r12: sort-free listing serves (VERDICT r11 ask #5).
#
# Unbounded listing queries (per-doc / per-media / per-admission reports)
# must not end in a global Sort: the compare contract is order-insensitive
# and a terminal orderBy plans Sort + Exchange(rangepartitioning) plus a
# RangePartitioner sampling job — a free-standing full shuffle at 100×.
# Pin every listing serve the r12 sweep de-sorted.
# ---------------------------------------------------------------------------

_LISTING_QUERIES = [
    "dedup_minhash_signatures",
    "dedup_simhash",
    "media_metadata",
    "media_metadata_served",
    "media_frame_sample",
    "doc_token_stats",
    "chunk_fixed_window",
    "customer_order_profile",
    "near_dup_incremental",
    "media_resize",  # terminal orderBy dropped r12; pin added r13 (ADVICE)
    "events_hourly_rollup",  # terminal range sort dropped r13 (~3.4k-row agg)
    "streaming_hourly_rollup",  # drain's terminal ordered_small dropped r14
]


def test_listing_serves_have_no_terminal_sort(spark):
    from etl_pdf_pipepline_spark.registry import all_queries

    qs = all_queries()
    offenders = []
    for name in _LISTING_QUERIES:
        plan = _executed_plan(qs[name](spark, SF))
        # A terminal global sort shows as a Sort [..], true (global) node;
        # sortWithinPartitions would be Sort [..], false and is also absent
        # from these listings. TakeOrderedAndProject (top-k) never appears
        # in a full listing.
        if re.search(r"Sort \[.*\], true", plan):
            offenders.append(name)
    assert offenders == [], f"terminal global sort on listing serves: {offenders}"


def test_small_ordered_results_use_no_range_sampling(spark):
    """ordered_small results: total order via coalesce(1)+
    sortWithinPartitions — the plan must carry NO rangepartitioning
    exchange (whose sampling pass is a separate driver job)."""
    from etl_pdf_pipepline_spark.registry import all_queries

    qs = all_queries()
    # (events_hourly_rollup went sort-free in r13 — it is pinned in
    # _LISTING_QUERIES above; see functions/ordering.py docstring.)
    for name in ("q1_pricing_summary", "events_user_gaps", "revenue_by_nation_scan"):
        plan = _executed_plan(qs[name](spark, SF))
        assert "rangepartitioning" not in plan, name


def test_revenue_dim_chain_is_one_broadcast(spark):
    """r12 job-floor fusion: the nation⋈region⋈customer dim chain must
    enter the orders join as ONE BroadcastExchange (nation⋈region rides
    inside it as a shuffle join) — the r11 shape nested two more
    broadcast exchanges (region, then the post-aggregate name map), each
    a separate driver job. Allow ≤3 total: dims + an optional auto-
    broadcast of the pre-aggregated lineitem side at small sf + slack
    for AQE-off static planning; 4+ means the nested chain is back."""
    from etl_pdf_pipepline_spark.registry import all_queries

    qs = all_queries()
    for name in ("revenue_by_nation_scan",):
        plan = _executed_plan(qs[name](spark, SF))
        n = plan.count("BroadcastExchange")
        assert n <= 3, f"{name}: {n} broadcast exchanges — dim-chain fusion regressed"
