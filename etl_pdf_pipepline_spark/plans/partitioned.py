"""Date-partitioned lake layout + directory-level partition pruning
(round 5) — the second ingest-time layout demonstration beside
plans/bucketed.py.

Everything else in the engine proves ROW-GROUP pruning (parquet min/max
stats behind PushedFilters). This module proves DIRECTORY pruning: events
written `partitionBy(event_date)` — the standard time-series lake layout
— and a one-day query whose filter binds to the partition column, so
Spark's file index never even lists the other days' files. At 100 TB of
events (years of days), this is the difference between a query that
touches ~0.5% of the lake and one that stats every file: row-group stats
still require opening footers; partition pruning happens in the catalog
before any I/O.

Gated against the same aggregate computed by DuckDB over the unpartitioned
events table with the equivalent ts-range predicate — a green row proves
layout-path ≡ scan-path. tests/test_bucketing.py asserts the plan property
(a live PartitionFilter, and only the target day's files scanned).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import cents as _cents
from ..registry import query
from ..sources.catalog import load_table

TARGET_DAY = "2024-01-15"


def partitioned_events_path(sf_dir: str) -> str:
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo_root, "spark-warehouse", f"events_by_day_{tag}")


def write_partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Ingest-time layout: one directory per event_date, one file per
    directory (repartition on the partition column so each day's rows
    land in a single task — the compacted layout a streaming ingest's
    nightly compaction produces, not the task×day file explosion a naive
    partitionBy write creates)."""
    path = partitioned_events_path(sf_dir)
    (
        load_table(spark, sf_dir, "events")
        .withColumn("event_date", F.to_date("ts"))
        .repartition(F.col("event_date"))
        .write.partitionBy("event_date")
        .mode("overwrite")
        .parquet(path)
    )
    return path


def day_rollup_from_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One day's per-type rollup, filter bound to the partition column."""
    ev = spark.read.parquet(partitioned_events_path(sf_dir))
    return (
        ev.filter(F.col("event_date") == F.lit(TARGET_DAY).cast("date"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(_cents("value")).cast("double") / 100, 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


# Shared by events_partition_pruned_day (batch-written layout) and
# streaming_partitioned_ingest (stream-written layout): both answer the
# same one-day rollup from a date-partitioned lake.
DAY_ROLLUP_ORACLE = f"""
    SELECT event_type, count(*) AS n,
           round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100, 2)
               AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '{TARGET_DAY} 00:00:00'
      AND ts <  TIMESTAMP '{TARGET_DAY} 00:00:00' + INTERVAL 1 DAY
    GROUP BY event_type ORDER BY event_type
    """


@query("events_partition_pruned_day", oracle=DAY_ROLLUP_ORACLE)
def events_partition_pruned_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the date-partitioned layout, answer one day's rollup from it.
    The oracle runs the equivalent ts-range predicate over the flat
    table; equality proves the partition column derivation and the pruned
    read lose nothing (event_date = date(ts), so the whole-day partition
    filter and the ts range select identical rows)."""
    write_partitioned_events(spark, sf_dir)
    return day_rollup_from_partitioned(spark, sf_dir)


def fragmented_events_path(sf_dir: str) -> str:
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo_root, "spark-warehouse", f"events_by_day_frag_{tag}")


def compacted_events_path(sf_dir: str) -> str:
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo_root, "spark-warehouse", f"events_by_day_compact_{tag}")


FRAGMENT_TASKS = 8  # simulated ingest parallelism: files per day before compaction


def write_fragmented_events(spark: SparkSession, sf_dir: str) -> str:
    """The small-files lake a continuous ingest actually produces: a
    round-robin repartition(FRAGMENT_TASKS) BEFORE partitionBy means
    every ingest task holds rows of every day, so each day's directory
    collects one file PER TASK (×batches, in a real deployment). This is
    the naive-write file explosion the module docstring warns about,
    materialized on purpose as the compaction input."""
    path = fragmented_events_path(sf_dir)
    (
        load_table(spark, sf_dir, "events")
        .withColumn("event_date", F.to_date("ts"))
        .repartition(FRAGMENT_TASKS)
        .write.partitionBy("event_date")
        .mode("overwrite")
        .parquet(path)
    )
    return path


def compact_events_lake(spark: SparkSession, src_path: str, dst_path: str) -> str:
    """Nightly compaction: rewrite the lake with rows repartitioned ON
    the partition column, so each day lands in one task → one file per
    directory. Writes to a SIDE path (production swaps atomically after
    validation; self-overwrite of a path being read is the classic
    corruption trap). The rewrite is partition-parallel — one shuffle of
    the day's bytes, no cross-day coordination — so a cluster compacts
    years of days concurrently and a 100 TB lake's per-day cost is flat."""
    (
        spark.read.parquet(src_path)
        .repartition(F.col("event_date"))
        .write.partitionBy("event_date")
        .mode("overwrite")
        .parquet(dst_path)
    )
    return dst_path


@query("events_lake_compaction", oracle=DAY_ROLLUP_ORACLE)
def events_lake_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files maintenance, end-to-end: build the fragmented lake a
    naive ingest produces (FRAGMENT_TASKS files per day), compact it to
    one file per day directory, answer the one-day rollup from the
    COMPACTED lake. Third face of DAY_ROLLUP_ORACLE (after the
    batch-written and stream-written layouts): a green row proves the
    compaction rewrite loses/changes nothing vs the flat-table scan.
    tests/test_bucketing.py asserts the file counts (>1 before, ==1
    after) so the demonstration cannot silently degenerate."""
    frag = write_fragmented_events(spark, sf_dir)
    compact = compact_events_lake(spark, frag, compacted_events_path(sf_dir))
    ev = spark.read.parquet(compact)
    return (
        ev.filter(F.col("event_date") == F.lit(TARGET_DAY).cast("date"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(_cents("value")).cast("double") / 100, 2).alias("total_value"),
        )
        .orderBy("event_type")
    )
