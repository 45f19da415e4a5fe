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
# of the contract, so it is explicit. r3 ordering (VERDICT r2 ask #6):
# broken-first — the 8 queries red in CORRECTNESS_r02 (7 NTZ crashes + 1
# hash mismatch, both root causes fixed this round), then plans/oracles
# changed since their last green driver row (the narrow-shingle minhash
# rewrite landed AFTER the r2 gate ran, so its r1 row proves a deleted
# plan), then the 28 queries only ever proven in r1 (code unchanged but
# stale — rotation keeps union coverage converging), then the rest in
# registration order.
_GATE_PRIORITY = [
    # red in CORRECTNESS_r02 — fixed this round, must re-prove
    "events_user_gaps",
    "events_sessionization",
    "events_asof_purchase_click",
    "events_range_join_attribution",
    "streaming_hourly_rollup",
    "streaming_session_counts",
    "streaming_dedup_counts",
    "context_assembly",
    # plan rewritten after the r2 gate ran (green row is for the old plan)
    "dedup_minhash_signatures",
    "dedup_lsh_candidates",
    # new in r3
    "ocr_document_text",
    "dedup_connected_components",
    "embedding_cluster_components",
    "streaming_click_purchase_join",
    "corpus_curation_stats",
    "doc_stratified_sample",
    "corpus_top_terms_per_lang",
    "events_funnel_counts",
    "corpus_contamination_probe",
    "events_retention_cohorts",
    "events_anomaly_zscore",
    # r1-only green rows (never re-checked since)
    "chunk_fixed_window",
    "customer_balance_quartiles",
    "dedup_exact",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "doc_bpe_token_counts",
    "doc_fingerprints",
    "doc_hashes",
    "doc_language_id",
    "doc_lookup_filters",
    "doc_quality_scores",
    "doc_titles_from_filenames",
    "doc_token_estimates",
    "doc_token_stats",
    "docs_after_source_purge",
    "incremental_new_docs",
    "priority_set_ops",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q4_order_priority",
    "q7_volume_shipping",
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
    from .plans import lifecycle  # noqa: F401
    from .operators import chunker_queries  # noqa: F401
    from .operators import dedup  # noqa: F401
    from .operators import textstats  # noqa: F401
    from .operators import similarity  # noqa: F401
    from .operators import events_queries  # noqa: F401
    from .operators import approx  # noqa: F401
    from .operators import multimodal  # noqa: F401
    from .sources import ocr  # noqa: F401
    from .streaming import events as streaming_events  # noqa: F401
    from .retrieval import queries as retrieval_queries  # noqa: F401

    _LOADED = True
