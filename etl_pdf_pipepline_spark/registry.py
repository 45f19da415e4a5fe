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
# of the contract, so it is explicit. r10 ordering, same invariant since
# r3 (any query whose plan/oracle changes enters the next gate's top-50):
# the two late-r9 rows with ZERO driver history top the list (VERDICT r9
# ask #1) plus the one NEW r10 row; then ALL 40 remaining r7-latest rows
# — the oldest green rows, so min-latest marches to r8 after this gate;
# then the 7 r8-latest rows in the families r10's index-freshness work
# touched (IVF/BM25/LSH extend+ensure paths — serving plans and results
# unchanged, re-verified via check_oracle in-session, but the lifecycle
# code they execute changed, so they re-gate). 3 + 40 + 7 = 50, counted
# by test_registry's gate-budget assertion.
_GATE_PRIORITY = [
    # zero-driver-history rows (VERDICT r9 ask #1) — r9's lifecycle
    # flagships + r10's new digest-at-ingest serving face
    "ivf_probe_served",         # serve-or-build IVF reader (ensure_ivf_index)
    "events_lake_autopilot",    # maintain_lake policy pass
    "media_metadata_served",    # NEW r10: digest-at-ingest media manifest
    # ALL 40 remaining r7-latest rows — oldest green rows; min-latest → r8
    "approx_distinct_users",
    "approx_value_quantiles",
    "bm25_search",
    "bm25_search_title_filtered",
    "bm25_search_title_weighted",
    "brand_price_stats",
    "chunk_fixed_window",
    "chunk_markdown_hybrid",
    "context_distinct_sources",
    "customer_order_profile",
    "customers_with_open_orders",
    "customers_without_orders",
    "dedup_ngram_jaccard",
    "dedup_winnowing_pairs",
    "doc_pack_sequences",
    "doc_pii_scrub",
    "doc_quality_classifier",
    "doc_token_stats",
    "doc_unigram_logprob",
    "docs_stats_by_source",
    "embedding_lsh_pairs",
    "events_cube_day_type",
    "events_json_props",
    "events_sliding_window",
    "events_top_users",
    "events_type_pivot",
    "events_user_rank_dist",
    "fts_phrase_search",
    "hybrid_rrf_search",
    "ivf_assignment",
    "ivf_probe_topk",
    "media_image_features",
    "media_resize",
    "ocr_document_text",
    "q22_sales_opportunity",
    "q8_market_share",
    "revenue_by_nation_scan",
    "running_spend_budget",
    "shipping_priority_scan",
    "top_orders_by_value",
    # r8-latest rows in the r10-touched index families (extenders now
    # CAS-advance the freshness record; ensure_ivf_index variant check
    # strictened; bm25 ensure_index added)
    "ivf_incremental_index",
    "ivf_probe_from_index",
    "bm25_incremental_index",
    "bm25_topk_from_index",
    "near_dup_incremental",
    "near_dup_admission",
    "dedup_simhash",            # LSH cap family (contract doc'd, ADVICE r9)
    # ---- 50 entries; driver caps at ~50 ----
    # Below the cut: everything else is r8/r9-latest and untouched this
    # round (media_metadata's r10 work is a dedicated probe + the NEW
    # served face above; its own plan and oracle are byte-identical),
    # plus ONE new late-r10 row added with the top-50 already full —
    # per the standing invariant it enters r11's top-50;
    # check_oracle-green in-session at sf0.001 AND sf0.01:
    # - dedup_cc_incremental: O(delta) component maintenance via the
    #   quotient-graph closure (extend_components, operators/dedup.py) —
    #   full-corpus _CC_ORACLE, crafted bridge/singleton topologies
    #   unit-tested in tests/test_dedup.py.
    # Also entering r11's top-50: dedup_simhash_pairs — its plan AND
    # oracle changed with the r10 star cap (the only cap-touched row
    # below this round's cut; every other cap consumer is in the list
    # above and re-verified: 10 family rows check_oracle-green
    # in-session after the change, incl. dedup_simhash_pairs itself).
    "dedup_cc_incremental",
    # Late-r10 additions with the top-50 already full — all
    # check_oracle-green in-session at sf0.01; per the standing
    # invariant they enter r11's top-50:
    # - corpus_decontaminated: removal face of the contamination probe
    #   (membership-checksummed kept set), operators/textstats.py.
    # - doc_duplicate_spans / doc_span_scrub: cross-doc EXACT substring
    #   dedup (suffix-array family via rolling K-gram hashes + island
    #   merge) and its md5-verified removal face, operators/dedup.py;
    #   boundary/merge/within-doc-exclusion unit tests in
    #   tests/test_dedup.py.
    # - events_change_feed: physical-file-diff CDF between lake versions
    #   (manifest.changed_files/read_file_list), classified insert/
    #   delete/update/carryover against the logical CDC oracle;
    #   partition-locality unit tests in tests/test_manifest.py.
    # - events_merge_on_read: deletion-vector DELETE (O(batch) commit,
    #   masked reads, file-scoped masks, purge as rows_preserved merge);
    #   DV semantics unit-tested in tests/test_manifest.py and model-
    #   checked in tests/test_manifest_model.py's op set.
    # - events_rollup_from_cdf: view maintenance as a decoupled daemon —
    #   touched days recovered from the manifest diff
    #   (changed_partitions_between), no writer side-channel.
    "corpus_decontaminated",
    "doc_duplicate_spans",
    "doc_span_scrub",
    # - streaming_cdc_dv_ingest: per-micro-batch append + DV-delete
    #   interleaving with an in-plan append-only file-history assert.
    "events_change_feed",
    "events_merge_on_read",
    "events_rollup_from_cdf",
    "streaming_cdc_dv_ingest",
    # - events_count_served: per-partition COUNT(*) from manifest row
    #   counts (footer-recorded at commit, DV-subtracted) — zero data
    #   files opened after a full merge+DV lifecycle.
    "events_count_served",
    # - corpus_seeded_shuffle: deterministic global training order via
    #   the distributed-rank pattern (256 ordered md5 buckets + local
    #   windows), permutation-checksummed per shard.
    "corpus_seeded_shuffle",
    # - docs_lake_cdf_admission: the index-maintenance loop closed
    #   through the table format — delta discovered via changed_files,
    #   admission + O(delta) index extension, freshness CAS'd to the
    #   lake head; same oracle as near_dup_admission.
    "docs_lake_cdf_admission",
]
# r11 bench-headline candidate: doc_duplicate_spans — dedicated sf30
# Spark-vs-DuckDB 71.3 s vs 169.5 s (0.42×, SCALING.md late-r10). Left
# out of THIS round's HEADLINE so the three recorded r10 sweep artifacts
# stay one comparable 24-row set.


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
