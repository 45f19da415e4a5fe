"""Vector expressions vs numpy (Q1 math)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_pdf_pipepline_spark.functions.vectors import (
    as_double,
    cosine,
    dot,
    norm,
    query_vector_lit,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = [
        ("a", [1.0, 2.0, 3.0]),
        ("b", [0.0, 0.0, 1.0]),
        ("c", [-1.0, 0.5, 2.5]),
    ]
    return spark.createDataFrame(rows, ["id", "v"])


def test_dot_norm_cosine_match_numpy(spark, vec_df):
    q = [0.5, -1.0, 2.0]
    out = vec_df.select(
        "id",
        dot(as_double("v"), query_vector_lit(q)).alias("dot"),
        norm(as_double("v")).alias("norm"),
        cosine(as_double("v"), query_vector_lit(q)).alias("cos"),
    ).collect()
    qn = np.array(q)
    for r in out:
        v = np.array(dict([("a", [1.0, 2.0, 3.0]), ("b", [0.0, 0.0, 1.0]), ("c", [-1.0, 0.5, 2.5])])[r.id])
        assert r.dot == pytest.approx(float(v @ qn))
        assert r.norm == pytest.approx(float(np.linalg.norm(v)))
        assert r.cos == pytest.approx(float(v @ qn / (np.linalg.norm(v) * np.linalg.norm(qn))))


def test_cosine_self_is_one(spark, vec_df):
    out = vec_df.select(cosine(as_double("v"), as_double("v")).alias("c")).collect()
    for r in out:
        assert r.c == pytest.approx(1.0)
