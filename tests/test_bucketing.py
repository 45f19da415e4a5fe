"""Bucketed co-located join: the pre-shuffle pattern for repeated big-big
joins (SURVEY.md §7.1 / build brief 'bucketing for co-located joins').

Both sides written bucketed+sorted on the join key → the join plan has NO
shuffle exchange on either side. At 100 TB this converts every recurring
fact-fact join on the bucket key from two full shuffles to zero.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketdb(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{loc}'")
    yield "bucketdb"
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def test_bucketed_join_has_no_shuffle(spark, bucketdb):
    orders = spark.range(1000).select(
        F.col("id").alias("o_key"), (F.col("id") % 7).alias("o_val")
    )
    items = spark.range(5000).select(
        (F.col("id") % 1000).alias("o_key"), F.col("id").alias("item_id")
    )
    (
        orders.write.bucketBy(8, "o_key").sortBy("o_key")
        .mode("overwrite").saveAsTable(f"{bucketdb}.orders_b")
    )
    (
        items.write.bucketBy(8, "o_key").sortBy("o_key")
        .mode("overwrite").saveAsTable(f"{bucketdb}.items_b")
    )
    # disable broadcast so the join would otherwise need a full shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(f"{bucketdb}.orders_b").join(
            spark.table(f"{bucketdb}.items_b"), "o_key"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_revenue_bucketed_plan_has_no_orderkey_exchange(spark):
    """The real-workload bucketed path (plans/bucketed.py): after writing
    lineitem/orders bucketed on the join key, the revenue plan must show
    NO exchange on either orderkey — the groupBy(l_orderkey) pre-agg and
    the orderkey join both inherit the bucketed scan's partitioning. Also
    asserts value parity with the query-time plan."""
    from etl_pdf_pipepline_spark.plans.bucketed import (
        revenue_from_bucketed,
        write_bucketed_facts,
    )
    from etl_pdf_pipepline_spark.plans.relational import revenue_by_nation

    sf = "/root/testdata/sf0.001"
    write_bucketed_facts(spark, sf)
    df = revenue_from_bucketed(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan[:3000]
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan[:3000]
    got = [(r.n_name, r.revenue) for r in df.collect()]
    want = [(r.n_name, r.revenue) for r in revenue_by_nation(spark, sf).collect()]
    assert got == want
    # the SAME layout serves the Q3 shape with the same zero-exchange
    # property: filter + pre-agg + join + final group all inherit the
    # bucketed distribution (hash(l_orderkey) clusters a subset of the
    # final group's keys)
    from etl_pdf_pipepline_spark.plans.bucketed import shipping_priority_bucketed

    ship_plan = (
        shipping_priority_bucketed(spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning(l_orderkey" not in ship_plan, ship_plan[:3000]
    assert "Exchange hashpartitioning(o_orderkey" not in ship_plan, ship_plan[:3000]


def test_layout_routing_switches_serving_path(spark):
    """r6 routing (VERDICT r5 ask #3): with no layout, revenue_by_nation
    is the scan plan (orderkey exchanges present); once the corpus's
    bucketed layout exists, the SAME registry query serves from it
    (zero orderkey exchanges) and values are identical."""
    from etl_pdf_pipepline_spark.plans.bucketed import (
        _drop_stale,
        bucketed_layout_exists,
        bucketed_table_names,
        write_bucketed_facts,
    )
    from etl_pdf_pipepline_spark.plans.relational import (
        revenue_by_nation,
        shipping_priority_top10,
    )

    sf = "/root/testdata/sf0.001"
    _drop_stale(spark, *bucketed_table_names(spark, sf))
    assert not bucketed_layout_exists(spark, sf)
    scan_df = revenue_by_nation(spark, sf)
    scan_plan = scan_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(l_orderkey" in scan_plan, scan_plan[:3000]
    scan_vals = [(r.n_name, r.revenue) for r in scan_df.collect()]
    scan_top = [r.l_orderkey for r in shipping_priority_top10(spark, sf).collect()]

    write_bucketed_facts(spark, sf)
    assert bucketed_layout_exists(spark, sf)
    try:
        routed = revenue_by_nation(spark, sf)
        routed_plan = routed._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(l_orderkey" not in routed_plan, routed_plan[:3000]
        assert [(r.n_name, r.revenue) for r in routed.collect()] == scan_vals
        assert [
            r.l_orderkey for r in shipping_priority_top10(spark, sf).collect()
        ] == scan_top
    finally:
        _drop_stale(spark, *bucketed_table_names(spark, sf))


def test_partitioned_events_scan_is_pruned(spark):
    """Directory-level pruning (plans/partitioned.py): the one-day query
    over the date-partitioned layout must carry a live PartitionFilter
    and touch only the target day's files."""
    from etl_pdf_pipepline_spark.plans.partitioned import (
        TARGET_DAY,
        day_rollup_from_partitioned,
        write_partitioned_events,
    )

    import os
    import re

    sf = "/root/testdata/sf0.001"
    path = write_partitioned_events(spark, sf)
    df = day_rollup_from_partitioned(spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the filter must actually bind to the partition column, not be empty
    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "event_date" in m.group(1), plan[:3000]
    # pruning is OBSERVABLE, not just printed: plant a corrupt parquet
    # file in a DIFFERENT day's partition — a pruned scan never opens it,
    # an unpruned scan dies on the bad footer. (inputFiles() can't prove
    # this: it lists the relation's files before partition filters.)
    bad_dir = os.path.join(path, "event_date=2024-01-02")
    assert os.path.isdir(bad_dir)
    bad_file = os.path.join(bad_dir, "part-junk.snappy.parquet")
    with open(bad_file, "wb") as f:
        f.write(b"this is not a parquet file")
    try:
        rows = day_rollup_from_partitioned(spark, sf).collect()
        assert rows  # target day has events and the query completed
    finally:
        os.remove(bad_file)


def test_unbucketed_join_needs_shuffle(spark):
    """Control: the same join over plain tables shuffles both sides."""
    a = spark.range(1000).select(F.col("id").alias("k"))
    b = spark.range(1000).select(F.col("id").alias("k"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = a.join(b, "k")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_lake_compaction_collapses_files_per_day(spark):
    """The fragmented lake has FRAGMENT_TASKS files per day directory;
    compaction leaves exactly one — and the gated query already proves
    the rewrite changes no values."""
    import glob
    import os

    from etl_pdf_pipepline_spark.plans.partitioned import (
        FRAGMENT_TASKS,
        compacted_events_path,
        fragmented_events_path,
    )
    from etl_pdf_pipepline_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    assert all_queries()["events_lake_compaction"](spark, sf).count() > 0

    def files_per_day(base):
        days = [d for d in glob.glob(os.path.join(base, "event_date=*")) if os.path.isdir(d)]
        assert days, f"no day partitions under {base}"
        return {d: len(glob.glob(os.path.join(d, "*.parquet"))) for d in days}

    frag = files_per_day(fragmented_events_path(sf))
    comp = files_per_day(compacted_events_path(sf))
    assert all(n == 1 for n in comp.values()), comp
    assert max(frag.values()) > 1  # fragmentation was real, not vacuous
    assert sorted(os.path.basename(d) for d in frag) == sorted(
        os.path.basename(d) for d in comp
    )
