"""Robustness: concurrent query serving, failure paths, registry contracts."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pytest

from etl_pdf_pipepline_spark.registry import all_queries, query
from etl_pdf_pipepline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_concurrent_queries_one_session(spark):
    """A long-lived engine serves many queries at once: SparkSession is
    thread-safe; six queries submitted from six threads all complete with
    correct, independent results."""
    qs = all_queries()
    names = [
        "orders_status_counts",
        "revenue_by_nation",
        "doc_token_stats",
        "bm25_search",
        "dedup_exact",
        "events_top_users",
    ]

    def run(name):
        return name, len(qs[name](spark, SF).collect())

    with ThreadPoolExecutor(max_workers=6) as ex:
        counts = dict(ex.map(run, names))
    assert all(v > 0 for v in counts.values()), counts
    # spot-check one against a direct run
    assert counts["orders_status_counts"] == len(
        qs["orders_status_counts"](spark, SF).collect()
    )


def test_load_table_unknown_name(spark):
    with pytest.raises(KeyError, match="unknown table"):
        load_table(spark, SF, "not_a_table")


def test_registry_rejects_duplicate_names():
    with pytest.raises(ValueError, match="duplicate query name"):

        @query("orders_status_counts")
        def clash(spark, sf_dir):  # pragma: no cover
            raise AssertionError


def test_queries_are_lazy(spark):
    """Building a query DataFrame must not trigger any Spark job."""
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None) or []
    all_queries()["revenue_by_nation"](spark, SF)  # build only, no action
    after = tracker.getJobIdsForGroup(None) or []
    assert len(after) == len(before)
