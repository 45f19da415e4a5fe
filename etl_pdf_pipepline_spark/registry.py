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
# of the contract, so it is explicit. r6 ordering, same invariant since
# r3 (any query whose plan/oracle changes enters the next gate's top-50):
# the 27 queries r6 touched or added (one-digest minhash family, keeper
# broadcast removal, LSH derived-planes restructure, layout routing,
# int-key rollups, codec family, persisted LSH band index faces,
# novelty, compaction, round_half_away ulp fix) plus the 23 r3-latest
# rows the r5 budget deferred fill the 50 exactly. After this gate no
# row is older than r4; everything below the cut rotates in r7.
_GATE_PRIORITY = [
    # touched in r6 — plans or shared scorers changed, need current-code rows
    "doc_dup_paragraph_fraction",   # regex chunker + xxhash64 keys + unrounded keep
    "doc_dup_paragraph_removal",    # regex chunker + xxhash64 keys
    "dedup_keepers",                # forced broadcast dropped
    "semantic_dedup_keepers",       # forced broadcast dropped
    "embedding_lsh_pairs",          # derived planes + id-only distinct
    "embedding_cluster_components", # inherits the lsh restructure
    "embedding_near_dup_pairs",     # pair scorer rounding moved into UDF
    "revenue_by_nation",            # layout-aware routing
    "shipping_priority_top10",      # layout-aware routing
    "revenue_by_nation_bucketed",   # shares the routed read path
    "ann_cosine_topk",              # round_half_away ulp fix
    "ann_batch_topk",               # round_half_away ulp fix
    "ivf_probe_from_index",         # round_half_away ulp fix
    "media_decode_filter",          # decode_media codec param
    "media_metadata",               # sort-before-digest plan (r6)
    "media_png_roundtrip",          # NEW r6: real-codec end-to-end gate
    "media_image_features",         # NEW r6: decoded-pixel feature stats
    "dedup_minhash_signatures",     # one-digest affine minhash (r6)
    "dedup_lsh_candidates",         # inherits the hash family
    "dedup_connected_components",   # inherits the hash family
    "corpus_curation_stats",        # inherits the hash family
    "near_dup_incremental",         # NEW r6: persisted LSH band index
    "events_lake_compaction",       # NEW r6: small-files compaction face
    "doc_shingle_novelty",          # NEW r6: per-doc novelty score
    "streaming_near_dup_ingest",    # NEW r6: stream-static admit gate
    "events_hourly_rollup",         # int-bucket group key (r6)
    "events_daily_rollup_totals",   # int-bucket rollup key (r6)
    # the 23 r3-latest rows deferred below the r5 cut — 3 rounds old, due
    "incremental_new_docs",
    "doc_lookup_filters",
    "doc_hashes",
    "doc_titles_from_filenames",
    "doc_token_estimates",
    "orders_status_counts",
    "priority_set_ops",
    "customer_balance_quartiles",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q19_disjunctive_revenue",
    "q18_large_volume_customers",
    "q17_small_quantity_revenue",
    "q15_top_supplier",
    "q10_returned_items",
    "q7_volume_shipping",
    "events_user_gaps",
    "events_anomaly_zscore",
    "events_funnel_counts",
    "events_retention_cohorts",
    "events_range_join_attribution",
    # ---- 50-budget cut (driver caps here) ----
    # The r6-touched/new block + the 23 due r3 rows fill the whole 50
    # budget; first below sit ivf_probe_topk (its r6 ulp fix is
    # exercised in-gate by ann_cosine/ann_batch/ivf_probe_from_index)
    # and shipping_priority_bucketed (layout exercised by the revenue
    # twin); ALL r4-latest fills rotate in r7.
    "ivf_probe_topk",
    "shipping_priority_bucketed",
    "customer_order_profile",
    "top_orders_by_value",
    "running_spend_budget",
    "brand_price_stats",
    "events_sliding_window",
    "events_top_users",
    "events_type_pivot",
    "events_cube_day_type",
    "events_user_rank_dist",
    "events_json_props",
    "doc_token_stats",
    "chunk_fixed_window",
    "bm25_search_title_weighted",
    "ocr_document_text",
    "q8_market_share",
    "q22_sales_opportunity",
    "doc_pack_sequences",
    "doc_pii_scrub",
    "media_resize",
    "doc_quality_classifier",
    "doc_unigram_logprob",
    "dedup_winnowing_pairs",
    "fts_phrase_search",
    "approx_distinct_users",
    "approx_value_quantiles",
    "bm25_search",
    "bm25_search_title_filtered",
    "chunk_markdown_hybrid",
    "context_distinct_sources",
    "customers_with_open_orders",
    "customers_without_orders",
    "dedup_ngram_jaccard",
    "docs_stats_by_source",
    "hybrid_rrf_search",
    "ivf_assignment",
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
