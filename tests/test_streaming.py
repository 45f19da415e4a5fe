"""Streaming operators drain deterministically and agree with batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pdf_pipepline_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_streaming_rollup_matches_batch(spark):
    qs = all_queries()
    stream = qs["streaming_hourly_rollup"](spark, SF).collect()
    batch = qs["events_hourly_rollup"](spark, SF).collect()
    skey = {(r.window_start, r.event_type): (r.n_events, r.total_value) for r in stream}
    bkey = {(r.window_start, r.event_type): (r.n_events, r.total_value) for r in batch}
    assert skey == bkey


def test_streaming_sessionization_matches_batch_aggregate(spark):
    qs = all_queries()
    stream = {r.user_id: (r.n_sessions, r.n_events) for r in
              qs["streaming_session_counts"](spark, SF).collect()}
    batch = qs["events_sessionization"](spark, SF)
    agg = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in batch.groupBy("user_id")
        .agg(F.countDistinct("session_id").alias("n_sessions"), F.sum("n_events").alias("n_events"))
        .collect()
    }
    assert stream == agg
