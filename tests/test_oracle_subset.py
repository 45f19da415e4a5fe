"""Fast oracle equivalence on a representative query subset at sf0.001.

The driver runs the FULL registry at sf0.01 (tools/check_oracle.py mirrors
it); this keeps a quick per-family regression inside pytest.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from etl_pdf_pipepline_spark.registry import all_oracles, all_queries
from etl_pdf_pipepline_spark.sources.catalog import TABLES

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "q1_pricing_summary",      # scan-agg
    "revenue_by_nation",       # multi-way join
    "q21_waiting_suppliers",   # decorrelated EXISTS/NOT-EXISTS
    "top_orders_by_value",     # top-k
    "order_sequence_window",   # window
    "bm25_search",             # retrieval keyword
    "hybrid_rrf_search",       # retrieval fusion
    "ann_cosine_topk",         # vector
    "dedup_exact",             # dedup
    "events_hourly_rollup",    # events/time
    "doc_token_stats",         # text stats
]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def nv(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else (0.0 if v == 0.0 else v)
        if isinstance(v, list):
            return tuple(nv(x) for x in v)
        return v

    return sorted((tuple(nv(r[i]) for i in order) for r in rows), key=repr)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, ddb, name):
    qfn = all_queries()[name]
    sql = all_oracles()[name]
    sdf = qfn(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)
    res = ddb.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    assert normalize(spark_rows, spark_cols) == normalize(duck_rows, duck_cols)
