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


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: rq.fn for name, rq in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: rq.oracle for name, rq in _REGISTRY.items() if rq.oracle is not None}


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
