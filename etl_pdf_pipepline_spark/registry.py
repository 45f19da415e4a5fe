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


# The r1 driver gate stopped after the first 50 dict entries, leaving 28
# operators locally-verified but driver-unproven (VERDICT.md "What's
# wrong" #2). Iteration order is part of the driver contract, so it is
# explicit: first everything the r1 gate never reached, then every query
# whose plan or oracle changed this round, then the rest in registration
# order — a budget-capped gate proves the unproven before re-proving the
# proven, and successive rounds cover the union.
_GATE_PRIORITY = [
    # r1-unchecked (CORRECTNESS_r01.json complement)
    "bm25_search",
    "bm25_search_title_filtered",
    "hybrid_rrf_search",
    "routed_search",
    "context_assembly",
    "context_distinct_sources",
    "embedding_lsh_pairs",
    "events_hourly_rollup",
    "events_json_props",
    "events_top_users",
    "events_user_gaps",
    "events_sessionization",
    "events_sliding_window",
    "events_daily_rollup_totals",
    "events_asof_purchase_click",
    "events_type_pivot",
    "events_cube_day_type",
    "events_range_join_attribution",
    "events_user_rank_dist",
    "approx_distinct_users",
    "approx_value_quantiles",
    "salted_skew_join",
    "media_metadata",
    "media_decode_filter",
    "media_frame_sample",
    "streaming_hourly_rollup",
    "streaming_session_counts",
    "streaming_dedup_counts",
    # changed in r2 (new/edited plan or oracle)
    "docs_stats_by_source",
    "chunk_markdown_hybrid",
    "dedup_ngram_jaccard",
    "ivf_assignment",
    "ivf_probe_topk",
    "ann_cosine_topk",
    "embedding_near_dup_pairs",
    "label_centroids",
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
    from .streaming import events as streaming_events  # noqa: F401
    from .retrieval import queries as retrieval_queries  # noqa: F401

    _LOADED = True
