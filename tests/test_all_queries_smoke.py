"""Every registered query executes at sf0.001 and returns a sane result.

The DuckDB-oracle gate (tools/check_oracle.py, driver CORRECTNESS) checks
values at sf0.01; this pytest-level smoke catches runtime regressions for
the full registry on every test run, including queries outside the
oracle-subset file.
"""

from __future__ import annotations

import pytest

from etl_pdf_pipepline_spark.registry import (
    all_oracles,
    all_queries,
    nested_output_fields,
)

SF = "/root/testdata/sf0.001"

# Queries whose result can legitimately be empty at tiny scale.
MAY_BE_EMPTY = {
    "dedup_lsh_candidates",
    "embedding_near_dup_pairs",
    "incremental_new_docs",
    "customers_without_orders",  # synthetic data: every customer has orders
}


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_runs(spark, name):
    df = all_queries()[name](spark, SF)
    rows = df.collect()
    assert df.columns, f"{name} produced no columns"
    # Driver-strictness lint (r12): the driver's canonicalizer crashes on
    # nested values, so every gate-visible query must emit scalars only —
    # digest arrays to md5(array_join(...)) + size instead.
    nested = nested_output_fields(df.schema)
    assert not nested, f"{name} emits driver-unhashable nested columns {nested}"
    if name not in MAY_BE_EMPTY:
        assert rows, f"{name} returned 0 rows at sf0.001"


def test_nested_output_lint_catches_arrays(spark):
    """The lint itself trips on a deliberately array-typed result — the
    exact shape (array<int> column) that slipped past the laxer r12
    local gate and died in the driver's canonicalizer."""
    from pyspark.sql import functions as F

    bad = spark.range(1).select(F.array(F.lit(1), F.lit(2)).alias("q8"))
    assert nested_output_fields(bad.schema) == ["q8"]
    ok = spark.range(1).select(
        F.md5(F.lit("1,2")).alias("q8_md5"), F.lit(2).alias("n_codes")
    )
    assert nested_output_fields(ok.schema) == []


def test_every_oracle_has_query():
    assert set(all_oracles()) <= set(all_queries())


def test_oracle_coverage_is_high():
    """Non-SQL-expressible ops are the exception, not the rule."""
    q, o = all_queries(), all_oracles()
    assert len(o) >= len(q) - 2, f"rows-only queries: {sorted(set(q) - set(o))}"
