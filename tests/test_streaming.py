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


def test_streaming_dedup_matches_batch_distinct(spark):
    qs = all_queries()
    stream = {r.event_type: r.n_unique for r in
              qs["streaming_dedup_counts"](spark, SF).collect()}
    from etl_pdf_pipepline_spark.sources.catalog import load_table

    batch = {
        r.event_type: r.n
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("event_id").alias("n"))
        .collect()
    }
    assert stream == batch


def test_foreachbatch_ingest_exactly_once(spark, tmp_path):
    """Checkpointed availableNow ingest: run the same stream twice; the
    second run must add nothing (source offsets are committed in the
    checkpoint) — the idiomatic form of the reference's hash-based
    incremental skip (SURVEY §2.11)."""
    from etl_pdf_pipepline_spark.streaming.events import stream_events

    out = str(tmp_path / "ingested")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            stream_events(spark, SF)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(out).count()
    run_once()
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 == 1000  # sf0.001 events rows; second run is a no-op


def test_release_stream_tables_drops_memory_sinks(spark):
    from etl_pdf_pipepline_spark.streaming import events as se

    before = set(t.name for t in spark.catalog.listTables())
    df = se.run_available_now(
        se.stream_events(spark, "/root/testdata/sf0.001").groupBy("event_type").count(),
        "complete",
    )
    assert df.count() > 0
    created = set(t.name for t in spark.catalog.listTables()) - before
    assert created
    assert se.release_stream_tables(spark) >= 1
    after = set(t.name for t in spark.catalog.listTables())
    assert not (created & after)
    assert se.release_stream_tables(spark) == 0


def test_streaming_partitioned_ingest_exactly_once(spark, tmp_path):
    """The partitioned parquet sink's commit log gives exactly-once
    file-level semantics: a second availableNow drain against the same
    checkpoint (no new source files) appends nothing."""
    from pyspark.sql import functions as F

    from etl_pdf_pipepline_spark.sources.catalog import load_table
    from etl_pdf_pipepline_spark.streaming.events import stream_events

    sf = "/root/testdata/sf0.001"
    ev = stream_events(spark, sf).withColumn("event_date", F.to_date("ts"))

    def drain():
        q = (
            ev.writeStream.format("parquet")
            .option("path", str(tmp_path / "data"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .partitionBy("event_date")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    n1 = spark.read.parquet(str(tmp_path / "data")).count()
    drain()
    n2 = spark.read.parquet(str(tmp_path / "data")).count()
    expected = load_table(spark, sf, "events").count()
    assert n1 == n2 == expected


def test_streaming_near_dup_matches_batch(spark):
    """Stream-banded admit decisions ≡ the batch near_dup_incremental —
    the same rows and values (both are unordered listings since r12;
    compare sorted)."""
    qs = all_queries()
    stream = sorted(tuple(r) for r in qs["streaming_near_dup_ingest"](spark, SF).collect())
    batch = sorted(tuple(r) for r in qs["near_dup_incremental"](spark, SF).collect())
    assert stream == batch
    assert len(stream) > 0


def test_stream_stage_memoized_per_session(spark):
    """r14: stream stages are lazy plan handles memoized per
    (session, sf_dir) — the same object comes back, and a second drain
    from the cached stage still re-executes (fresh sink rows each time,
    proving nothing but the plan is cached)."""
    from etl_pdf_pipepline_spark.streaming.events import (
        _hourly_rollup_stage,
        _stream_state_partitions,
        release_stream_tables,
        run_available_now,
    )

    sf = "/root/testdata/sf0.001"
    s1 = _hourly_rollup_stage(spark, sf)
    s2 = _hourly_rollup_stage(spark, sf)
    assert s1 is s2
    sp = _stream_state_partitions(sf)
    a = run_available_now(s1, "complete", state_partitions=sp).collect()
    b = run_available_now(s2, "complete", state_partitions=sp).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and len(a) > 0
    release_stream_tables(spark)
