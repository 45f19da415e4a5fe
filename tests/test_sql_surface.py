"""The SQL front-end: catalog views + spark.sql + the chunker UDTF."""

from __future__ import annotations

from etl_pdf_pipepline_spark.sources.catalog import register_views

SF = "/root/testdata/sf0.001"


def test_spark_sql_over_views(spark):
    register_views(spark, SF)
    row = spark.sql(
        """
        SELECT n.n_name, count(*) AS n_customers
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY n_customers DESC, n_name LIMIT 1
        """
    ).first()
    assert row.n_customers > 0


def test_spark_sql_documents_join_embeddings(spark):
    register_views(spark, SF)
    n = spark.sql(
        """
        SELECT count(*) AS n FROM documents d
        JOIN embeddings e ON d.doc_id = e.vec_id
        """
    ).first().n
    assert n > 0


def test_events_view_timestamp_type(spark):
    register_views(spark, SF)
    dt = dict(spark.table("events").dtypes)
    assert dt["ts"] == "timestamp"
