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
