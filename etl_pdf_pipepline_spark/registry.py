"""Query registry — the single source of truth behind `__spark_entry__.py`.

Every implemented operator from SURVEY.md §2 (plus the beyond-reference
LLM-data ops) registers itself here as a named query:

    @query("bm25_search", oracle=\"\"\"SELECT ...\"\"\")
    def bm25_search(spark, sf_dir):
        return ...DataFrame...

The driver runs the Spark callable and the DuckDB oracle side by side and
hash-compares results, so each pair must agree on column names, ordering of
values within rounding, and row counts. Conventions that keep the hashes
stable:

- alias EVERY computed column identically on both sides;
- round floating aggregates (helper `round4`) on both sides — double
  summation order differs between engines;
- make top-k ordering total (tie-break on a key column).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None for non-SQL-expressible ops
    doc: str = ""


_REGISTRY: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


# The driver gate budget-caps at ~50 entries and iteration order is part
# of the contract, so it is explicit. r12 ordering, same invariant since
# r3 (any query whose EXECUTED PLAN or oracle changes enters the next
# gate's top-50):
#
# 1. The 18 r8-latest rows (VERDICT r11 ask #2: the oldest driver
#    evidence in the registry — all marched into this gate, displacing
#    the r11 rows, which are the newest evidence).
# 2. The 17 further rows whose executed plan changed in r12:
#    - the sort-free listing serves (terminal global orderBy dropped:
#      dedup_minhash_signatures, dedup_simhash, media_metadata,
#      media_metadata_served, doc_token_stats, chunk_fixed_window,
#      customer_order_profile, near_dup_admission/_incremental —
#      pinned by tests/test_plan_shapes.py);
#    - the ordered_small rewrites (coalesce(1)+sortWithinPartitions on
#      provably-small results: events_hourly_rollup, events_user_gaps,
#      streaming_hourly_rollup, streaming_hourly_served,
#      events_zorder_served/_pruned — no RangePartitioner sample job);
#    - revenue_by_nation_scan (single-broadcast fused dim chain, n_name
#      carry — the routed/bucketed twins are group-1 marchers);
#    - dedup_ngram_jaccard (DF cap via count-over-window on the reused
#      term exchange + cached-scalar literal cap).
#    NOT gate-entering (executed plan bit-identical, only construction
#    changed): the bm25/hybrid family's F.expr score strings, the
#    minhash/simhash/banding expr-string builders, and every
#    read_parquet_cached serve (same scan, memoized handle) — all
#    r10/r11-green, re-verified vs oracles at sf0.01 this round.
# 4. Two NEW r12 rows (int8 embedding quantization + its serving face)
#    with zero driver history take the last two slots, displacing the
#    last two alphabetical r9 fills to r13.
# 3. The remaining slots: oldest-latest (r9) rows — first the four
#    that execute r12-touched code (the RAM-checkpoint drain lifecycle:
#    streaming_versioned_ingest, streaming_rollup_maintenance; the
#    expr-string minhash family: doc_shingle_novelty; headline:
#    ann_cosine_topk), then alphabetical r9 fill.
# 18 + 17 + 13 + 2 = 50, counted by test_registry's gate-budget assertion.
_GATE_PRIORITY = [
    # -- group 1: the 18 r8-latest marchers -------------------------------
    "doc_quality_scores",
    "doc_repetition_filter",
    "doc_stratified_sample",
    "events_asof_purchase_click",
    "events_sessionization",
    "label_centroids",
    "media_frame_sample",
    "order_sequence_window",
    "q12_shipmode_priority",
    "q1_pricing_summary",
    "q21_waiting_suppliers",
    "revenue_by_nation",
    "revenue_by_nation_bucketed",
    "routed_search",
    "salted_skew_join",
    "segment_acctbal_stats",
    "shipping_priority_bucketed",
    "shipping_priority_top10",
    # -- group 2: r12 executed-plan changes -------------------------------
    "dedup_minhash_signatures",
    "dedup_simhash",
    "media_metadata",
    "media_metadata_served",
    "doc_token_stats",
    "chunk_fixed_window",
    "customer_order_profile",
    "near_dup_admission",
    "near_dup_incremental",
    "events_hourly_rollup",
    "events_user_gaps",
    "streaming_hourly_rollup",
    "streaming_hourly_served",
    "events_zorder_served",
    "events_zorder_pruned",
    "revenue_by_nation_scan",
    "dedup_ngram_jaccard",
    # -- group 3: oldest-latest (r9) rotation -----------------------------
    "streaming_versioned_ingest",
    "streaming_rollup_maintenance",
    "doc_shingle_novelty",
    "ann_cosine_topk",
    "ann_batch_topk",
    "customer_balance_quartiles",
    "doc_dup_paragraph_fraction",
    "doc_dup_paragraph_removal",
    "doc_hashes",
    "doc_lookup_filters",
    "doc_titles_from_filenames",
    "doc_token_estimates",
    "embedding_near_dup_pairs",
    # -- group 4: NEW r12 rows, zero driver history ----------------------
    "embedding_quantize_int8",
    "ann_cosine_topk_int8",
    # ---- 50 entries; driver caps at ~50 ----
    # Below the cut, next-oldest (remaining r9): events_anomaly_zscore,
    # events_daily_rollup_totals, events_funnel_counts,
    # events_lake_compaction, events_lake_optimize,
    # events_range_join_attribution, events_retention_cohorts,
    # events_schema_evolution, events_snapshot_pruned,
    # incremental_new_docs, media_decode_filter, media_png_roundtrip,
    # orders_status_counts, priority_set_ops, q10_returned_items,
    # q13_customer_distribution, q14_promo_revenue, q15_top_supplier,
    # q17_small_quantity_revenue, q18_large_volume_customers,
    # q19_disjunctive_revenue, q4_order_priority, q6_forecast_revenue,
    # q7_volume_shipping — march into r13's top-50.
]


def _gate_order(names: list[str]) -> list[str]:
    rank = {n: i for i, n in enumerate(_GATE_PRIORITY)}
    return sorted(names, key=lambda n: (rank.get(n, len(rank)), names.index(n)))


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: _REGISTRY[name].fn for name in _gate_order(list(_REGISTRY))}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    names = [n for n in _REGISTRY if _REGISTRY[n].oracle is not None]
    return {name: _REGISTRY[name].oracle for name in _gate_order(names)}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are for the side effect of @query registration.
    from .plans import relational  # noqa: F401
    from .plans import relational_tpch_ext  # noqa: F401
    from .plans import relational_tpch_ext2  # noqa: F401
    from .plans import bucketed  # noqa: F401
    from .plans import partitioned  # noqa: F401
    from .plans import matview  # noqa: F401
    from .plans import zorder  # noqa: F401
    from .plans import lifecycle  # noqa: F401
    from .operators import chunker_queries  # noqa: F401
    from .operators import dedup  # noqa: F401
    from .operators import textstats  # noqa: F401
    from .operators import curation  # noqa: F401
    from .operators import similarity  # noqa: F401
    from .operators import events_queries  # noqa: F401
    from .operators import approx  # noqa: F401
    from .operators import multimodal  # noqa: F401
    from .sources import ocr  # noqa: F401
    from .streaming import events as streaming_events  # noqa: F401
    from .streaming import documents as streaming_documents  # noqa: F401
    from .retrieval import queries as retrieval_queries  # noqa: F401

    _LOADED = True
