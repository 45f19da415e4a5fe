"""The r13 Arrow-native token-stat kernel must be bit-identical to the
JVM-expression form it replaced (doc_token_stats), on the real corpus and
on edge strings — and where the two underlying regex engines genuinely
differ (Java \\s includes \\x0B, RE2 \\s does not), the kernel must side
with the DuckDB ORACLE's semantics, which is also RE2."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from etl_pdf_pipepline_spark.functions.text import tokens
from etl_pdf_pipepline_spark.operators.textstats import _token_stat_counts
from etl_pdf_pipepline_spark.sources.catalog import load_table

SF_SMALL = "/root/testdata/sf0.001"


def _jvm_counts(docs):
    staged = docs.select("doc_id", tokens("text").alias("toks"))
    return staged.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.aggregate("toks", F.lit(0), lambda acc, t: acc + F.length(t)).alias("nonws"),
    )


def _sorted_pdf(df) -> pd.DataFrame:
    return df.toPandas().sort_values("doc_id").reset_index(drop=True)


def test_kernel_equals_jvm_form_on_corpus(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    a = _sorted_pdf(_jvm_counts(docs))
    b = _sorted_pdf(_token_stat_counts(docs))
    pd.testing.assert_frame_equal(a, b)


EDGES = [
    (1, "Hello  WORLD  hello"),  # case-fold + dup token
    (2, ""),  # empty text -> all zeros
    (3, "   \t\n  "),  # whitespace-only -> all zeros
    (4, None),  # null text -> null stats (size(NULL) semantics)
    (5, "one"),  # single token, no separators
    (6, "  padded   edges  "),  # leading/trailing separators
    (7, "Ünïcode Ünïcode ü"),  # non-ASCII case-fold + code-point lengths
    (8, "a b"),  # NBSP is NOT \s in either engine: one token
    (9, "x " * 5000),  # long doc
]


def test_kernel_equals_jvm_form_on_edges(spark):
    docs = spark.createDataFrame(EDGES, "doc_id bigint, text string")
    a = _sorted_pdf(_jvm_counts(docs))
    b = _sorted_pdf(_token_stat_counts(docs))
    pd.testing.assert_frame_equal(a, b)


def test_vertical_tab_sides_with_the_oracle(spark):
    """\\x0B (vertical tab): Java \\s splits on it, RE2 \\s does not. The
    kernel must match the DuckDB oracle's regexp_split_to_array (RE2),
    i.e. keep 'a\\x0bb' as ONE token of length 3."""
    import duckdb

    row = duckdb.sql(
        r"""SELECT len(list_filter(regexp_split_to_array(lower('a' || chr(11) || 'b'), '\s+'),
                                   t -> t <> '')) AS n"""
    ).fetchone()
    assert row[0] == 1  # the oracle keeps it joined

    docs = spark.createDataFrame([(1, "a\x0bb")], "doc_id bigint, text string")
    got = _token_stat_counts(docs).collect()[0]
    assert (got.n_tokens, got.n_distinct, got.nonws) == (1, 1, 3)
