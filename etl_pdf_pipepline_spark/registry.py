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
# of the contract, so it is explicit. r13 ordering, same invariant since
# r3 (any query whose EXECUTED PLAN or oracle changes enters the next
# gate's top-50):
#
# 1. The 24 r9-latest rows (VERDICT r12 ask #5: the oldest driver
#    evidence in the registry — the complete below-the-cut list from
#    r12, all marched in; after r13 no row's latest green is older
#    than r10).
# 2. The rows whose executed plan or oracle changed in r13:
#    - embedding_quantize_int8 — the r12 red row, output reshaped to
#      driver-canonicalizable scalars (md5(array_join(q8))+size, scale
#      via the closed-form half-away rounding mirrored in the oracle);
#    - media_resize — its terminal orderBy was dropped in r12 but it
#      missed that round's gate and the pin list (ADVICE r12); now in
#      both (tests/test_plan_shapes._LISTING_QUERIES);
#    - hybrid_rrf_search, hybrid_rrf_from_index, ann_cosine_topk_int8 —
#      the query vector enters the scored scan as a SQL LITERAL
#      (functions/vectors.array_lit_sql) instead of a broadcast 1-row
#      DF: the BroadcastExchange (a driver job per call) is gone from
#      the executed plan, so these re-enter the gate.
#    - bm25_search — the served plan now folds df from the persisted
#      term dictionary as literals (one postings scan, no df broadcast
#      join; bm25.py _write_term_df); its from-index/incremental
#      siblings with the same plan change are already gated in groups
#      2/4 (hybrid_rrf_*, bm25_topk_from_index, bm25_incremental_index).
#    - events_hourly_rollup — terminal range sort dropped (r13: a ~3.4k-
#      row aggregate listing needs no output order; the sort cost a
#      range-sampling job + an Exchange + a Sort per call);
#    - events_sessionization — the user_id<10 probe routes to the
#      z-ordered events layout when fresh (file-skipping scan); its
#      forced-scan twin events_sessionization_scan is NEW in group 3;
#    - doc_token_stats — token counting moved to the Arrow-native
#      mapInArrow kernel (guide §4.2), same integer stats, same Spark
#      round/divide tail, equality-tested vs the JVM-expression form.
#    NOT gate-entering (executed plan bit-identical, only construction
#    changed): the probe family's memoized query-vector fetch
#    (_query_vector_cached — removes a per-call pre-job; the RETURNED
#    plan is unchanged since the same literal vector lands in the same
#    scorer), re-verified vs oracles at sf0.001/sf0.01 this round.
#    Also NOT gate-entering: order_sequence_window / running_spend_budget
#    now route through _orders_custkey_sliced (raw-table footer-stat
#    file pruning) — on the driver's SINGLE-FILE tables raw_pruned_files
#    returns None and the executed plan is bit-identical (operator-level
#    diff of plans/r13/order_sequence_window_{before,after}.txt is
#    expression IDs only); the pruned branch only exists on multi-file
#    corpora, where it is verified directly vs DuckDB
#    (tools/check_oracle.py at .scale/sf30, r13) and equality-tested in
#    tests/test_raw_prune.py.
# 3. Four NEW r13 rows with zero driver history: ivf_probe_int8_served
#    (IVF-SQ8 cell serving), ivf_int8_incremental (O(delta) quantized-
#    layout maintenance), ann_recall_int8 (scalar recall bound), and
#    events_sessionization_scan (forced-scan twin of the rerouted
#    sessionization probe).
# 4. The remaining 13 slots: oldest-latest (r10) rotation, alphabetical
#    fill (media_resize already enters via group 2; events_cube_day_type,
#    doc_pii_scrub, doc_quality_classifier, doc_unigram_logprob and
#    docs_stats_by_source displaced below the cut by the group-2/3
#    optimization entries).
# 24 + 9 + 4 + 13 = 50, counted by test_registry's gate-budget assertion.
_GATE_PRIORITY = [
    # -- group 1: the 24 r9-latest marchers -------------------------------
    "events_anomaly_zscore",
    "events_daily_rollup_totals",
    "events_funnel_counts",
    "events_lake_compaction",
    "events_lake_optimize",
    "events_range_join_attribution",
    "events_retention_cohorts",
    "events_schema_evolution",
    "events_snapshot_pruned",
    "incremental_new_docs",
    "media_decode_filter",
    "media_png_roundtrip",
    "orders_status_counts",
    "priority_set_ops",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    # -- group 2: r13 executed-plan / oracle changes ----------------------
    "embedding_quantize_int8",
    "media_resize",
    "hybrid_rrf_search",
    "hybrid_rrf_from_index",
    "ann_cosine_topk_int8",
    "bm25_search",
    "events_hourly_rollup",
    "events_sessionization",
    "doc_token_stats",
    # -- group 3: NEW r13 rows, zero driver history -----------------------
    "ivf_probe_int8_served",
    "ivf_int8_incremental",
    "ann_recall_int8",
    "events_sessionization_scan",
    # -- group 4: oldest-latest (r10) rotation, alphabetical fill ---------
    "approx_distinct_users",
    "approx_value_quantiles",
    "bm25_incremental_index",
    "bm25_search_title_filtered",
    "bm25_search_title_weighted",
    "bm25_topk_from_index",
    "brand_price_stats",
    "chunk_markdown_hybrid",
    "context_distinct_sources",
    "customers_with_open_orders",
    "customers_without_orders",
    "dedup_winnowing_pairs",
    "doc_pack_sequences",
    # ---- 50 entries; driver caps at ~50 ----
    # Below the cut, next-oldest (remaining r10): doc_pii_scrub,
    # doc_quality_classifier, doc_unigram_logprob, docs_stats_by_source,
    # events_cube_day_type,
    # events_json_props,
    # events_lake_autopilot,
    # events_sliding_window, events_top_users, events_type_pivot,
    # events_user_rank_dist, fts_phrase_search, ivf_assignment,
    # ivf_incremental_index, ivf_probe_from_index, ivf_probe_served,
    # ivf_probe_topk, media_image_features, ocr_document_text,
    # q22_sales_opportunity, q8_market_share, running_spend_budget,
    # shipping_priority_scan, top_orders_by_value — march into r14's
    # top-50.
]


def _gate_order(names: list[str]) -> list[str]:
    rank = {n: i for i, n in enumerate(_GATE_PRIORITY)}
    return sorted(names, key=lambda n: (rank.get(n, len(rank)), names.index(n)))


def nested_output_fields(schema) -> list[str]:
    """Names of output columns with nested (array/map/struct) types.

    Gated queries must emit SCALAR columns only: the driver's
    canonicalizer pandas-sorts result columns and crashes on list values
    (`TypeError: unhashable type: 'list'` — the r12 `embedding_quantize_
    int8` red row), while this repo's local check_oracle normalized
    lists→tuples and so was laxer than the hard signal it predicts.
    Queries that need to pin array contents digest them to scalars
    (md5(array_join(...)) + size) instead. Enforced in
    tools/check_oracle.py and tests/test_all_queries_smoke.py."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


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
