"""Salted join equivalence + approximate-aggregate contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pdf_pipepline_spark.operators.approx import salted_join


def test_salted_join_equals_plain_join(spark):
    fact = spark.createDataFrame(
        [(i % 3, f"e{i}") for i in range(100)], ["k", "payload"]
    )
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], ["k", "attr"])
    plain = fact.join(dim, "k").groupBy("k", "attr").count()
    salted = salted_join(fact, dim, "k").groupBy("k", "attr").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_no_dim_dupes(spark):
    # each fact row matches exactly one (key, salt) dim replica
    fact = spark.createDataFrame([(1, "x")], ["k", "v"])
    dim = spark.createDataFrame([(1, "d")], ["k", "d"])
    assert salted_join(fact, dim, "k").count() == 1


def test_approx_contracts_hold(spark):
    qs = __import__(
        "etl_pdf_pipepline_spark.registry", fromlist=["all_queries"]
    ).all_queries()
    for name, flag in [
        ("approx_distinct_users", "approx_within_5pct"),
        ("approx_value_quantiles", "approx_within_tol"),
    ]:
        rows = qs[name](spark, "/root/testdata/sf0.001").collect()
        assert rows and all(getattr(r, flag) for r in rows)
