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
# of the contract, so it is explicit. r14 ordering, same invariant since
# r3 (any query whose EXECUTED PLAN or oracle changes enters the next
# gate's top-50):
#
# 1. The 24 r10-latest rows (the complete below-the-cut list from r13,
#    all marched in; after r14 no row's latest green is older than r11 —
#    the VERDICT r13 ask #9 criterion).
# 2. The rows whose executed plan or Python payload changed in r14:
#    - streaming_hourly_rollup — the drain's state key is the integer
#      hour index instead of the window() struct (the batch twin's r13
#      identity), and the terminal ordered_small is dropped (sort-free
#      ~3.4k-row listing; order-insensitive compare);
#    - events_user_gaps — routes through _events_user_sliced(20) like
#      its sessionization sibling (pruned raw files / z-layout when
#      fresh, raw scan otherwise);
#    - events_user_gaps_scan — NEW forced-scan twin, zero driver history;
#    - doc_token_stats — the mapInArrow kernel gained per-batch
#      allocator hygiene (gc + release_unused; rep-tail drift fix). The
#      plan SHAPE is unchanged but the shipped Python payload is not,
#      so it re-enters.
#    NOT gate-entering (executed plan bit-identical): the stream-stage
#    memoization (lazy plan handles, same plans), the scale-safe
#    _raw_file_stats resolution path (same pruning decisions, tested in
#    tests/test_raw_prune.py), pin_events_read_confs (same conf values,
#    set at the same points in the read lifecycle), and
#    customer_order_profile (re-adjudicated as noise, form unchanged).
# 3. The remaining 22 slots: oldest-latest (r11) rotation, alphabetical
#    fill.
# 24 + 4 + 22 = 50, counted by test_registry's gate-budget assertion.
_GATE_PRIORITY = [
    # -- group 1: the 24 r10-latest marchers -------------------------------
    "doc_pii_scrub",
    "doc_quality_classifier",
    "doc_unigram_logprob",
    "docs_stats_by_source",
    "events_cube_day_type",
    "events_json_props",
    "events_lake_autopilot",
    "events_sliding_window",
    "events_top_users",
    "events_type_pivot",
    "events_user_rank_dist",
    "fts_phrase_search",
    "ivf_assignment",
    "ivf_incremental_index",
    "ivf_probe_from_index",
    "ivf_probe_served",
    "ivf_probe_topk",
    "media_image_features",
    "ocr_document_text",
    "q22_sales_opportunity",
    "q8_market_share",
    "running_spend_budget",
    "shipping_priority_scan",
    "top_orders_by_value",
    # -- group 2: r14 executed-plan / payload changes ----------------------
    "streaming_hourly_rollup",
    "events_user_gaps",
    "events_user_gaps_scan",
    "doc_token_stats",
    # -- group 3: oldest-latest (r11) rotation, alphabetical fill ----------
    "context_assembly",
    "corpus_contamination_probe",
    "corpus_curation_stats",
    "corpus_decontaminated",
    "corpus_mixture_sample",
    "corpus_profile",
    "corpus_seeded_shuffle",
    "corpus_top_terms_per_lang",
    "dedup_cc_incremental",
    "dedup_connected_components",
    "dedup_exact",
    "dedup_keepers",
    "dedup_lsh_candidates",
    "dedup_simhash_pairs",
    "doc_bpe_token_counts",
    "doc_duplicate_spans",
    "doc_fingerprints",
    "doc_language_id",
    "doc_span_scrub",
    "docs_after_source_purge",
    "docs_lake_cdf_admission",
    "embedding_cluster_components",
    # ---- 50 entries; driver caps at ~50 ----
    # Below the cut, next-oldest (remaining r11): embedding_lsh_pairs,
    # events_change_feed, events_count_served, events_merge_on_read,
    # events_partition_pruned_day, events_partitioned_merge,
    # events_rollup_after_dv, events_rollup_from_cdf,
    # events_rollup_incremental, events_versioned_merge,
    # lineitem_after_order_purge, semantic_dedup_keepers,
    # streaming_cdc_dv_ingest, streaming_click_purchase_join,
    # streaming_dedup_counts, streaming_near_dup_ingest,
    # streaming_partitioned_ingest, streaming_session_counts — march
    # into r15's top-50.
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
