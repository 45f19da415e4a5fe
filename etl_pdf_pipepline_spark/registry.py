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
# of the contract, so it is explicit. r11 ordering, same invariant since
# r3 (any query whose plan/oracle changes enters the next gate's top-50):
#
# 1. The 12 ZERO-driver-history rows (VERDICT r10 ask #1: the 11
#    late-r10 additions the rotation never sampled, all re-verified
#    check_oracle-green at sf0.01 this session, plus the one NEW r11
#    row, events_rollup_after_dv — the DV-aware decoupled-daemon gate).
# 2. The 19 rows whose PLAN or ORACLE changed in r11:
#    - dedup_lsh_candidates / dedup_simhash_pairs: new `capped` output
#      column, oracle mirrored (VERDICT r10 ask #4);
#    - bm25_search / hybrid_rrf_search: route to the persisted postings
#      index when fresh (scan fallback answers the same oracle);
#    - dedup_connected_components / dedup_keepers /
#      corpus_curation_stats / embedding_cluster_components /
#      semantic_dedup_keepers: closure internals reworked (one job per
#      round) and/or banded_pairs now carries the capped column;
#    - streaming_hourly_rollup / streaming_session_counts /
#      streaming_dedup_counts / streaming_click_purchase_join: drains
#      size state-store partitions from the input;
#    - events_rollup_incremental: executes refresh_rollup_view, whose
#      r11 empty-list early-return changed the lifecycle code it runs
#      (its sibling events_rollup_from_cdf — the row that ALSO consumes
#      the now-DV-aware changed_partitions_between — is in group 1);
#    - dedup_minhash_signatures / dedup_simhash: route to the
#      signature-at-ingest manifests when fresh (late-r11; scan
#      fallback answers the same oracle).
# 3. The remaining slots go to the oldest green (r8-latest) rows —
#    manifest-lifecycle rows first (they execute the r11-changed
#    _publish_merge/delete_commit code paths), then alphabetical. The
#    18 r8-latest rows left below the cut march into r12's top-50.
# 12 + 19 + 19 = 50, counted by test_registry's gate-budget assertion.
_GATE_PRIORITY = [
    # -- group 1: zero driver history ------------------------------------
    "corpus_decontaminated",
    "corpus_seeded_shuffle",
    "dedup_cc_incremental",
    "doc_duplicate_spans",
    "doc_span_scrub",
    "docs_lake_cdf_admission",
    "events_change_feed",
    "events_count_served",
    "events_merge_on_read",
    "events_rollup_after_dv",   # NEW r11
    "events_rollup_from_cdf",
    "streaming_cdc_dv_ingest",
    # -- group 2: r11 plan/oracle changes ---------------------------------
    "dedup_lsh_candidates",
    "dedup_simhash_pairs",
    "bm25_search",
    "hybrid_rrf_search",
    "dedup_connected_components",
    "dedup_keepers",
    "corpus_curation_stats",
    "embedding_cluster_components",
    "semantic_dedup_keepers",
    "streaming_hourly_rollup",
    "streaming_session_counts",
    "streaming_dedup_counts",
    "streaming_click_purchase_join",
    "events_rollup_incremental",
    "dedup_minhash_signatures",   # late-r11 signature-manifest routing
    "dedup_simhash",              # late-r11 signature-manifest routing
    # late-r11 union-purge rewrites: lsh_band_keys computes the minhash
    # signature once and explodes bands (these two rows exercise the
    # rewritten banding against the persisted index), and
    # embedding_lsh_pairs replaced per-band self-joins + unionAll with
    # one composite-key join.
    "near_dup_admission",
    "near_dup_incremental",
    "embedding_lsh_pairs",
    # -- group 3: oldest-latest (r8) rows — lifecycle first ---------------
    "docs_after_source_purge",
    "lineitem_after_order_purge",
    "events_partitioned_merge",
    "events_versioned_merge",
    "events_partition_pruned_day",
    "events_zorder_pruned",
    "events_zorder_served",
    "streaming_near_dup_ingest",
    "streaming_partitioned_ingest",
    "hybrid_rrf_from_index",
    "context_assembly",
    "corpus_contamination_probe",
    "corpus_mixture_sample",
    "corpus_profile",
    "corpus_top_terms_per_lang",
    "dedup_exact",
    "doc_bpe_token_counts",
    "doc_fingerprints",
    "doc_language_id",
    # ---- 50 entries; driver caps at ~50 ----
    # Below the cut, still r8-latest, march into r12's top-50:
    # doc_quality_scores, doc_repetition_filter, doc_stratified_sample
    # (displaced by the three late-r11 union-purge rows above),
    # events_asof_purchase_click, events_sessionization,
    # label_centroids, media_frame_sample, order_sequence_window,
    # q12_shipmode_priority, q1_pricing_summary, q21_waiting_suppliers,
    # revenue_by_nation, revenue_by_nation_bucketed, routed_search,
    # salted_skew_join, segment_acctbal_stats, shipping_priority_bucketed,
    # shipping_priority_top10.
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
