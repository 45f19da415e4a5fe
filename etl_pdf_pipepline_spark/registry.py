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
# of the contract, so it is explicit. r7 ordering, same invariant since
# r3 (any query whose plan/oracle changes enters the next gate's top-50):
# the 11 queries r7 touched or added (byte-correct RGB+gray image
# features, the steady-state admission path, the scan-path routing
# variants, the routing-freshness predicate, the ngram-jaccard broadcast
# drop, the LSH plane-divergence guard) plus ALL 36 r4-latest rows (the
# oldest green rows in the registry — VERDICT r6 ask #2; one of them,
# dedup_ngram_jaccard, is also r7-touched) plus 4 fills: the sf100
# adjudication target media_frame_sample (its plan may change with the
# decomposition; doc_token_stats is already in via the r4 list), two r5
# rows sharing touched files (dedup_exact; streaming_near_dup_ingest on
# the refactored index-persist path), and q1_pricing_summary (headline
# representative). After this gate every latest row is r5 or newer.
_GATE_PRIORITY = [
    # touched/new in r7
    "events_partitioned_merge",     # NEW r7: partition-scoped CDC MERGE (copy-on-write)
    "events_versioned_merge",       # NEW r7: manifest-committed MERGE (atomic, time travel)
    "bm25_incremental_index",       # NEW r7: O(delta) FTS index extension
    "media_image_features",         # RGB+gray codec paths, byte-correct oracle (schema changed)
    "near_dup_admission",           # NEW r7: steady-state marginal admission
    "revenue_by_nation_scan",       # NEW r7: forced scan-path gate variant
    "shipping_priority_scan",       # NEW r7: forced scan-path gate variant
    "near_dup_incremental",         # shared _delta_admission refactor
    "revenue_by_nation",            # routing predicate now freshness-checked
    "shipping_priority_top10",      # routing predicate now freshness-checked
    "revenue_by_nation_bucketed",   # build now writes the freshness tag
    "shipping_priority_bucketed",   # build now writes the freshness tag (r5 fill)
    "embedding_lsh_pairs",          # oracle-divergence guard added
    "dedup_ngram_jaccard",          # per-doc sizes broadcast hint dropped (also r4-latest)
    # ALL 36 r4-latest rows — oldest green rows, due per the r6 rotation plan
    "bm25_search",
    "hybrid_rrf_search",
    "ivf_probe_topk",
    "ivf_assignment",
    "chunk_markdown_hybrid",
    "chunk_fixed_window",
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
    "bm25_search_title_weighted",
    "bm25_search_title_filtered",
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
    "context_distinct_sources",
    "customers_with_open_orders",
    "customers_without_orders",
    "docs_stats_by_source",
    # last slot to 50: the r7 perf-adjudication target (its plan changed
    # in the frame-sample rework, so it must re-gate). The former fills
    # (dedup_exact, q1_pricing_summary, streaming_near_dup_ingest)
    # yielded their slots to the three NEW r7 queries at the top; all
    # three stay r5/r6-green and their code paths are oracle-covered by
    # the rows above (near_dup_admission shares the refactored
    # index-persist path streaming_near_dup_ingest serves from).
    "media_frame_sample",
    # ---- 50-budget cut (driver caps here) ----
    # Below the cut: everything r5/r6-latest and untouched this round.
    "streaming_near_dup_ingest",
    "dedup_exact",
    "q1_pricing_summary",
    "events_sessionization",
    "streaming_hourly_rollup",
    "order_sequence_window",
    "doc_dup_paragraph_fraction",
    "doc_dup_paragraph_removal",
    "dedup_keepers",
    "semantic_dedup_keepers",
    "embedding_cluster_components",
    "embedding_near_dup_pairs",
    "ann_cosine_topk",
    "ann_batch_topk",
    "ivf_probe_from_index",
    "media_decode_filter",
    "media_metadata",
    "media_png_roundtrip",
    "dedup_minhash_signatures",
    "dedup_lsh_candidates",
    "dedup_connected_components",
    "corpus_curation_stats",
    "events_lake_compaction",
    "doc_shingle_novelty",
    "events_hourly_rollup",
    "events_daily_rollup_totals",
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
