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
# of the contract, so it is explicit. r5 ordering, same invariant as r3/r4
# (any query whose plan/oracle changes enters the next gate's top-50):
# first the queries touched or added THIS round (oracle-typing fix,
# interval fix, rate clamp, JVM frame-sampler rewrite, rounding-contract
# change in the Arrow scorers, the new layout/index/curation
# registrations), then the 9 queries whose latest driver row is still r2
# (r4's gate budget-capped them out; code verified unchanged, rows valid
# but stale), then the OLDEST r3 rows to fill the 50 budget so no row
# ages past ~2 rounds. The r3-latest rows below the cut are mostly the
# trivial scalar-projection/count plans (doc_hashes, q6, etc.) plus a
# few stable unchanged joins displaced by the r5 additions — they rotate
# in r6.
_GATE_PRIORITY = [
    # touched / added in r5 — need current-code rows
    "q12_shipmode_priority",
    "q21_waiting_suppliers",
    "doc_repetition_filter",
    "corpus_mixture_sample",
    "media_frame_sample",
    "ann_cosine_topk",
    "ann_batch_topk",
    "doc_dup_paragraph_fraction",
    "bm25_topk_from_index",
    "revenue_by_nation_bucketed",
    "events_partition_pruned_day",
    "ivf_probe_from_index",
    "semantic_dedup_keepers",
    "doc_dup_paragraph_removal",
    "hybrid_rrf_from_index",
    "shipping_priority_bucketed",
    "streaming_partitioned_ingest",
    "dedup_keepers",
    "dedup_connected_components",
    "corpus_profile",
    # r2-latest rows (code unchanged since their gate; rotate forward)
    "label_centroids",
    "lineitem_after_order_purge",
    "media_decode_filter",
    "media_metadata",
    "order_sequence_window",
    "routed_search",
    "salted_skew_join",
    "segment_acctbal_stats",
    # oldest r3-latest rows, non-trivial plans first
    "dedup_exact",
    "dedup_lsh_candidates",
    "dedup_minhash_signatures",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "corpus_curation_stats",
    "corpus_contamination_probe",
    "corpus_top_terms_per_lang",
    "context_assembly",
    "doc_bpe_token_counts",
    "doc_fingerprints",
    "doc_language_id",
    "doc_quality_scores",
    "doc_stratified_sample",
    "docs_after_source_purge",
    "events_asof_purchase_click",
    "events_sessionization",
    "q1_pricing_summary",
    "streaming_click_purchase_join",
    "streaming_dedup_counts",
    "streaming_hourly_rollup",
    "streaming_session_counts",
    # ---- 50-budget cut (driver caps here) ----
    # r3-latest trivial plans, deferred to r6
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
    from .retrieval import queries as retrieval_queries  # noqa: F401

    _LOADED = True
