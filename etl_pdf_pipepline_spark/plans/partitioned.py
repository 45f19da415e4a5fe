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


# ---------------------------------------------------------------------------
# CDC MERGE into the partitioned lake (copy-on-write, partition-scoped)
# ---------------------------------------------------------------------------

MERGE_INS_OFFSET = 10_000_000_000


def merge_lake_path(sf_dir: str) -> str:
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo_root, "spark-warehouse", f"events_by_day_merge_{tag}")


def _merge_cdc_batch(ev: DataFrame):
    """Deterministic CDC batch over TARGET_DAY, the three MERGE verbs:
    updates (user_id%7: value+10), inserts (user_id%11: new ids offset by
    MERGE_INS_OFFSET, shifted one day forward — an insert into a
    DIFFERENT existing partition), deletes (user_id%13). `ev` carries
    event_date; all three outputs do too (a real CDC feed ships the
    partition value with each change row — that is what lets the merge
    prune)."""
    day = F.col("event_date") == F.lit(TARGET_DAY).cast("date")
    upserts = ev.filter(day & (F.col("user_id") % 7 == 0)).withColumn(
        "value", F.col("value") + 10.0
    )
    inserts = (
        ev.filter(day & (F.col("user_id") % 11 == 0))
        .withColumn("event_id", F.col("event_id") + F.lit(MERGE_INS_OFFSET))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 DAY"))
        .withColumn("event_type", F.lit("merged"))
        .withColumn("event_date", F.to_date("ts"))
    )
    deletes = ev.filter(day & (F.col("user_id") % 13 == 0)).select("event_id", "event_date")
    return upserts, inserts, deletes


def merge_cdc_into_lake(
    spark: SparkSession,
    lake_path: str,
    upserts: DataFrame,
    inserts: DataFrame,
    deletes: DataFrame,
) -> list[str]:
    """Apply a CDC batch to a date-partitioned lake, rewriting ONLY the
    touched partitions (Delta/Iceberg MERGE semantics, hand-rolled
    copy-on-write):

    1. changed days = distinct partition values across the batch —
       driver-collected, bounded by the calendar, the thing that makes
       the whole operation O(touched days), never O(lake);
    2. read just those partitions (the isin filter binds to the
       partition column, so the file index prunes every other day before
       any I/O);
    3. delete-wins merge: anti-join out updated+deleted keys, union the
       surviving updates, union the inserts — the standard
       anti-join+union rewrite (upsert() above) scoped to the slice.
       No broadcast hint on the key tables: CDC batches are delta-sized
       today but nothing bounds them structurally, and AQE broadcasts
       small ones on its own (the r5 keeper-table lesson);
    4. commit via merge_partitions' per-partition directory swap,
       passing the changed-day set explicitly so a day whose rows were
       ALL deleted (no staging output) has its directory removed rather
       than silently surviving (ADVICE r7).
    """
    changed = [
        r[0]
        for r in upserts.select("event_date")
        .unionByName(inserts.select("event_date"))
        .unionByName(deletes.select("event_date"))
        .distinct()
        .collect()
    ]
    lake = spark.read.parquet(lake_path)
    slice_ = lake.filter(F.col("event_date").isin(changed))
    dead_keys = (
        upserts.select("event_id").unionByName(deletes.select("event_id")).distinct()
    )
    merged = (
        slice_.join(dead_keys, "event_id", "left_anti")
        .unionByName(upserts.join(deletes.select("event_id"), "event_id", "left_anti"))
        .unionByName(inserts)
    )
    from ..sources.sinks import merge_partitions

    return merge_partitions(merged, lake_path, "event_date", changed_partitions=changed)


MERGE_ORACLE = f"""
    WITH day AS (
        SELECT * FROM events
        WHERE ts >= TIMESTAMP '{TARGET_DAY} 00:00:00'
          AND ts <  TIMESTAMP '{TARGET_DAY} 00:00:00' + INTERVAL 1 DAY
    ),
    upd AS (
        SELECT event_id, ts, user_id, event_type, value + 10 AS value, props
        FROM day WHERE user_id % 7 = 0
    ),
    ins AS (
        SELECT event_id + {MERGE_INS_OFFSET} AS event_id,
               ts + INTERVAL 1 DAY AS ts, user_id,
               'merged' AS event_type, value, props
        FROM day WHERE user_id % 11 = 0
    ),
    del AS (SELECT event_id FROM day WHERE user_id % 13 = 0),
    merged AS (
        SELECT * FROM events
        WHERE event_id NOT IN (SELECT event_id FROM upd)
          AND event_id NOT IN (SELECT event_id FROM del)
        UNION ALL
        SELECT * FROM upd WHERE event_id NOT IN (SELECT event_id FROM del)
        UNION ALL
        SELECT * FROM ins
    )
    SELECT CAST(ts AS DATE) AS event_date, event_type, count(*) AS n,
           round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100, 2)
               AS total_value
    FROM merged
    WHERE ts >= TIMESTAMP '{TARGET_DAY} 00:00:00' - INTERVAL 1 DAY
      AND ts <  TIMESTAMP '{TARGET_DAY} 00:00:00' + INTERVAL 2 DAY
    GROUP BY 1, 2 ORDER BY 1, 2
    """


@query("events_partitioned_merge", oracle=MERGE_ORACLE)
def events_partitioned_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE end-to-end: build the date-partitioned lake, apply a
    deterministic update/insert/delete batch over TARGET_DAY via the
    partition-scoped copy-on-write merge (only the two touched day
    directories are rewritten — tests/test_merge.py asserts the other
    days' files are PHYSICALLY untouched, inode for inode), then answer
    a three-day per-type rollup from the merged lake. The window
    includes the day before TARGET_DAY — an untouched partition — so a
    green row proves the swap left the rest of the lake readable and
    bit-equal, while the oracle applies the same CDC semantics to the
    flat table in SQL (delete-wins, inserts shifted one day forward)."""
    path = merge_lake_path(sf_dir)
    (
        load_table(spark, sf_dir, "events")
        .withColumn("event_date", F.to_date("ts"))
        .repartition(F.col("event_date"))
        .write.partitionBy("event_date")
        .mode("overwrite")
        .parquet(path)
    )
    ev = load_table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    upserts, inserts, deletes = _merge_cdc_batch(ev)
    merge_cdc_into_lake(spark, path, upserts, inserts, deletes)
    lake = spark.read.parquet(path)
    lo = F.lit(TARGET_DAY).cast("date")
    return (
        lake.filter(
            (F.col("event_date") >= F.date_sub(lo, 1))
            & (F.col("event_date") < F.date_add(lo, 2))
        )
        .groupBy("event_date", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(_cents("value")).cast("double") / 100, 2).alias("total_value"),
        )
        .orderBy("event_date", "event_type")
    )


def versioned_lake_path(sf_dir: str) -> str:
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo_root, "spark-warehouse", f"events_versioned_{tag}")


@query("events_versioned_merge", oracle=MERGE_ORACLE)
def events_versioned_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same CDC MERGE run through the manifest-committed snapshot
    layer (sources/manifest.py): v1 = the full events lake, v2 = v1 with
    the update/insert/delete batch applied — new files only, one atomic
    manifest publication as the commit point — and the three-day rollup
    answered from the v2 SNAPSHOT READ (explicit manifest-resolved file
    list, not a directory listing). Shares MERGE_ORACLE with
    events_partitioned_merge, so a green pair proves swap-committed and
    manifest-committed MERGE agree with each other and with the
    flat-table CDC semantics. What the manifest adds — cross-partition
    commit atomicity, v1 readability after the merge (time travel), CAS
    on concurrent commits, vacuum retention — is asserted in
    tests/test_manifest.py, where multiple snapshots can be compared."""
    from ..sources.manifest import init_versioned_lake, read_snapshot

    # Lazy import: matview.py imports this module's oracle/batch symbols
    # at top level, so the shared CDC-apply helper (which pins the base
    # version BEFORE its snapshot read — merge_commit links at exactly
    # base+1, detecting any interleaved commit) is imported here.
    from .matview import apply_versioned_cdc

    root = versioned_lake_path(sf_dir)
    ev = load_table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    init_versioned_lake(ev, root, "event_date")
    apply_versioned_cdc(spark, root, ev)

    snap = read_snapshot(spark, root)
    lo = F.lit(TARGET_DAY).cast("date")
    return (
        snap.filter(
            (F.col("event_date") >= F.date_sub(lo, 1))
            & (F.col("event_date") < F.date_add(lo, 2))
        )
        .groupBy("event_date", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(_cents("value")).cast("double") / 100, 2).alias("total_value"),
        )
        .orderBy("event_date", "event_type")
    )


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


SNAP_DAY_LO = "2024-01-05"
SNAP_DAY_HI = "2024-01-07"  # inclusive: [LO 00:00, HI+1 00:00)

_SNAPSHOT_PRUNED_ORACLE = f"""
    SELECT CAST(ts AS DATE) AS event_date, event_type, count(*) AS n,
           round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100, 2)
               AS total_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '{SNAP_DAY_LO}' AND DATE '{SNAP_DAY_HI}'
      AND user_id <= (SELECT CAST(floor(max(user_id) * 0.1) AS BIGINT) FROM events)
    GROUP BY 1, 2 ORDER BY 1, 2
    """


def stats_lake_path(sf_dir: str) -> str:
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo_root, "spark-warehouse", f"events_stats_lake_{tag}")


@query("events_snapshot_pruned", oracle=_SNAPSHOT_PRUNED_ORACLE)
def events_snapshot_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-level data skipping (sources/manifest.py snapshot_files)
    — the read-side payoff of the versioned lake's per-file stats: build
    a day-partitioned, user-clustered lake whose manifest commits
    per-file user_id min/max (footer reads over exactly the files the
    commit wrote), then answer a 2-D slice (3-day window AND
    bottom-decile users) through `read_snapshot(bounds=...)`, which
    prunes partitions by directory value and files by committed stats
    BEFORE Spark lists or opens anything. The oracle runs the identical
    predicate over the flat table, so a green row proves pruning is a
    safe superset — the exact filter still applies and no row is lost.
    The pruning MECHANICS (bounded entry/file counts vs the full
    manifest) are asserted manifest-in-hand in tests/test_manifest.py.

    Scale posture (100 TB): this is Iceberg's manifest-stats model —
    plan-time skipping costs O(manifest), not O(files); parquet footer
    row-group skipping still applies WITHIN every file that survives.
    Clustering note: per-file user_id stats are only selective because
    ingest range-clusters users within each day (cluster_col), the same
    reason z-order exists for the interleaved 2-D case (plans/zorder.py
    — z-order bounds BOTH dims per file; here the partition value
    bounds time and the cluster key bounds users)."""
    from ..sources.manifest import init_versioned_lake, read_snapshot

    root = stats_lake_path(sf_dir)
    ev = load_table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    # One 2-row-output pass: the query parameter (decile bound) and the
    # day count that sizes the range write — within-partition file
    # splits need more range tasks than partitions (4 files/day here;
    # at lake scale the multiplier comes from target file size).
    params = ev.agg(
        F.max("user_id").alias("mu"), F.countDistinct("event_date").alias("nd")
    ).collect()[0]
    u_hi = int(params["mu"] * 0.1)
    init_versioned_lake(
        ev,
        root,
        "event_date",
        stats_cols=("user_id",),
        cluster_col="user_id",
        cluster_files=int(params["nd"]) * 4,
    )
    snap = read_snapshot(
        spark,
        root,
        bounds={"event_date": (SNAP_DAY_LO, SNAP_DAY_HI), "user_id": (None, u_hi)},
    )
    return (
        snap.filter(
            (F.col("event_date") >= F.lit(SNAP_DAY_LO).cast("date"))
            & (F.col("event_date") <= F.lit(SNAP_DAY_HI).cast("date"))
            & (F.col("user_id") <= u_hi)
        )
        .groupBy("event_date", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(_cents("value")).cast("double") / 100, 2).alias("total_value"),
        )
        .orderBy("event_date", "event_type")
    )


_SCHEMA_EVOLUTION_ORACLE = f"""
    SELECT CAST(ts AS DATE) AS event_date,
           CASE WHEN CAST(ts AS DATE) = DATE '{TARGET_DAY}'
                THEN CASE WHEN user_id % 2 = 0 THEN 'app' ELSE 'web' END
                ELSE 'legacy' END AS channel,
           count(*) AS n,
           round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100, 2)
               AS total_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '{TARGET_DAY}' - 1 AND DATE '{TARGET_DAY}' + 1
    GROUP BY 1, 2 ORDER BY 1, 2
    """


def evo_lake_path(sf_dir: str) -> str:
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo_root, "spark-warehouse", f"events_evo_lake_{tag}")


@query("events_schema_evolution", oracle=_SCHEMA_EVOLUTION_ORACLE)
def events_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-column schema evolution on the versioned lake
    (sources/manifest.py): v1 is the plain events lake; a MERGE rewrites
    ONE day's partition with a new `channel` column, committing the
    widened schema in the manifest. The latest snapshot then reads the
    WHOLE lake through the committed schema — the rewritten day carries
    real values, every untouched day's pre-evolution files project the
    column as null (no rewrite of 29/30 of the lake, the whole point of
    in-place evolution) — and a 3-day rollup spanning evolved and
    legacy days proves both paths in one result. The oracle computes
    the identical CASE over the flat table. Add-only validation
    (drops/retypes raise before staging I/O) and time travel at the old
    width (v1 re-read has no `channel`) are asserted in
    tests/test_manifest.py.

    Scale posture (100 TB): evolution cost is O(rewritten partitions) +
    one manifest commit — never O(table); reads stay O(manifest) with
    the schema a literal in the metadata (no footer sampling, which at
    10^6 files is a real planning cost Spark's mergeSchema pays)."""
    from ..sources.manifest import init_versioned_lake, merge_commit, read_snapshot

    root = evo_lake_path(sf_dir)
    ev = load_table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    init_versioned_lake(ev, root, "event_date")

    day = F.lit(TARGET_DAY).cast("date")
    evolved = (
        read_snapshot(spark, root)
        .filter(F.col("event_date") == day)
        .withColumn(
            "channel",
            F.when(F.col("user_id") % 2 == 0, F.lit("app")).otherwise(F.lit("web")),
        )
    )
    merge_commit(evolved, root, "event_date", changed_partitions=[TARGET_DAY])

    snap = read_snapshot(spark, root)
    return (
        snap.filter(
            (F.col("event_date") >= F.date_sub(day, 1))
            & (F.col("event_date") <= F.date_add(day, 1))
        )
        .groupBy(
            "event_date", F.coalesce(F.col("channel"), F.lit("legacy")).alias("channel")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(_cents("value")).cast("double") / 100, 2).alias("total_value"),
        )
        .orderBy("event_date", "channel")
    )


_OPTIMIZE_ORACLE = """
    SELECT event_type, count(*) AS n,
           round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100, 2)
               AS total_value
    FROM events
    GROUP BY event_type ORDER BY event_type
    """


def optimize_lake_path(sf_dir: str) -> str:
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo_root, "spark-warehouse", f"events_opt_lake_{tag}")


@query("events_lake_optimize", oracle=_OPTIMIZE_ORACLE)
def events_lake_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE on the versioned lake (sources/manifest.py
    optimize_commit) — the versioned twin of events_lake_compaction's
    side-path rewrite: v1 is a deliberately fragmented lake (range-split
    ingest, several files per day), v2 is its one-file-per-partition
    compaction published as an atomic manifest commit, and the query
    answers a FULL-table rollup from the optimized snapshot. The
    flat-table oracle makes the row the strongest possible equality
    check: compaction that loses, duplicates, or mutates even one row
    anywhere in the lake goes red. File-count mechanics (>1 per
    partition before, ==1 after, small files still readable at v1) are
    asserted in tests/test_manifest.py.

    This completes the lake's maintenance lifecycle on ONE commit
    protocol: init → CDC MERGE → schema evolution → OPTIMIZE → vacuum,
    every step an atomic manifest version with time travel across it."""
    from ..sources.manifest import init_versioned_lake, optimize_commit, read_snapshot

    root = optimize_lake_path(sf_dir)
    ev = load_table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    nd = ev.select(F.countDistinct("event_date")).collect()[0][0]
    init_versioned_lake(
        ev, root, "event_date", cluster_col="user_id", cluster_files=int(nd) * 4
    )
    optimize_commit(spark, root)
    return (
        read_snapshot(spark, root)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(_cents("value")).cast("double") / 100, 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


AUTOPILOT_DAYS = ("2024-01-05", "2024-01-07")  # inclusive append window

_AUTOPILOT_ORACLE = f"""
    SELECT event_type, count(*) AS n,
           round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100, 2)
               AS total_value
    FROM events
    WHERE user_id % 5 <> 0
       OR CAST(ts AS DATE) BETWEEN DATE '{AUTOPILOT_DAYS[0]}' AND DATE '{AUTOPILOT_DAYS[1]}'
    GROUP BY event_type ORDER BY event_type
    """


def autopilot_lake_path(sf_dir: str) -> str:
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo_root, "spark-warehouse", f"events_autopilot_lake_{tag}")


@query("events_lake_autopilot", oracle=_AUTOPILOT_ORACLE)
def events_lake_autopilot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy-driven lake maintenance end-to-end (manifest.maintain_lake):
    v1 is a clean one-file-per-day lake of the base rows (user_id % 5
    ≠ 0), v2 appends a delta slice into a THREE-DAY window — exactly the
    small-files debt a streaming ingest leaves — and the autopilot pass
    then (a) finds the fragmented partitions from the manifest alone,
    (b) compacts ONLY those via a scoped rows_preserved OPTIMIZE commit,
    and (c) vacuums past retention. The query asserts the POLICY inline
    (precisely the appended days got compacted, nothing else) and
    answers the full-table rollup from the maintained snapshot, so a
    pass that loses, duplicates, or mutates one row anywhere goes red
    against the flat-table oracle. events_lake_optimize proves the
    OPTIMIZE verb; this row proves the closed loop a production lake
    actually runs: ingest debt → manifest-read policy → scoped atomic
    compaction → retention — all on the one commit protocol."""
    import datetime

    from ..sources.manifest import (
        append_commit,
        fragmented_partitions,
        init_versioned_lake,
        maintain_lake,
        read_snapshot,
    )

    root = autopilot_lake_path(sf_dir)
    ev = load_table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    lo = datetime.date.fromisoformat(AUTOPILOT_DAYS[0])
    hi = datetime.date.fromisoformat(AUTOPILOT_DAYS[1])
    in_window = (F.col("event_date") >= F.lit(lo)) & (F.col("event_date") <= F.lit(hi))

    init_versioned_lake(ev.filter(F.col("user_id") % 5 != 0), root, "event_date")
    delta = ev.filter((F.col("user_id") % 5 == 0) & in_window)
    append_commit(delta, root, "event_date")

    # the fragmentation the policy must find = exactly the days the
    # delta actually touched (at tiny sf a window day can be empty)
    expected = {str(r[0]) for r in delta.select("event_date").distinct().collect()}
    frag = set(fragmented_partitions(root, max_files=1))
    if frag != expected:
        raise RuntimeError(f"autopilot policy wrong: fragmented={frag} expected={expected}")
    report = maintain_lake(spark, root, max_files_per_partition=1)
    if set(report["optimized_partitions"]) != expected or fragmented_partitions(root, 1):
        raise RuntimeError(f"autopilot pass incomplete: {report}")

    return (
        read_snapshot(spark, root)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(_cents("value")).cast("double") / 100, 2).alias("total_value"),
        )
        .orderBy("event_type")
    )


def cdf_lake_path(sf_dir: str) -> str:
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo_root, "spark-warehouse", f"events_cdf_{tag}")


_CHANGE_FEED_ORACLE = f"""
    WITH day AS (
        SELECT * FROM events
        WHERE ts >= TIMESTAMP '{TARGET_DAY} 00:00:00'
          AND ts <  TIMESTAMP '{TARGET_DAY} 00:00:00' + INTERVAL 1 DAY
    ),
    upd AS (
        SELECT event_id, ts, user_id, event_type, value + 10 AS value, props
        FROM day WHERE user_id % 7 = 0
    ),
    ins AS (
        SELECT event_id + {MERGE_INS_OFFSET} AS event_id,
               ts + INTERVAL 1 DAY AS ts, user_id,
               'merged' AS event_type, value, props
        FROM day WHERE user_id % 11 = 0
    ),
    del AS (SELECT event_id FROM day WHERE user_id % 13 = 0),
    pre AS (
        SELECT event_id, ts, user_id, event_type, value, props FROM events
        WHERE CAST(ts AS DATE) BETWEEN DATE '{TARGET_DAY}' AND DATE '{TARGET_DAY}' + 1
    ),
    post AS (
        SELECT event_id, ts, user_id, event_type, value, props FROM pre
        WHERE event_id NOT IN (SELECT event_id FROM upd)
          AND event_id NOT IN (SELECT event_id FROM del)
        UNION ALL
        SELECT * FROM upd WHERE event_id NOT IN (SELECT event_id FROM del)
        UNION ALL
        SELECT * FROM ins
    ),
    j AS (
        SELECT coalesce(a.event_id, b.event_id) AS event_id,
               CASE WHEN a.event_id IS NULL THEN 'insert'
                    WHEN b.event_id IS NULL THEN 'delete'
                    WHEN a.value <> b.value OR a.ts <> b.ts
                         OR a.event_type <> b.event_type OR a.props <> b.props
                         THEN 'update'
                    ELSE 'carryover' END AS change_type,
               CASE WHEN b.event_id IS NULL THEN a.value ELSE b.value END AS v
        FROM pre a FULL JOIN post b ON a.event_id = b.event_id
    )
    SELECT change_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(event_id) AS BIGINT) AS id_sum,
           CAST(sum(CAST(round(v * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
    FROM j GROUP BY change_type ORDER BY change_type
    """


@query("events_change_feed", oracle=_CHANGE_FEED_ORACLE)
def events_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed between two lake versions (Delta's table_changes
    / Iceberg incremental scan): v1 = the full versioned events lake,
    v2 = v1 with the standard CDC batch merge-committed, and the feed is
    computed FROM THE PHYSICAL FILE DELTA — manifest.changed_files gives
    the added/removed file lists (O(manifest), no data I/O to plan),
    the two sides are read basePath-aware in their own versions' schemas,
    and a full-outer join on the key classifies every row as insert /
    delete / update / carryover (a copy-on-write rewrite re-materializes
    untouched rows; a CDF reader must separate them from real changes —
    exactly the contract Delta's CDF columns encode). The gate compares
    per-class row counts plus id and money checksums against the oracle's
    purely LOGICAL reconstruction of the same CDC semantics, so a green
    row proves physical-file-diff CDF ≡ logical change semantics.

    Scale posture: planning is two manifest JSON reads; data I/O and the
    classifying join touch ONLY rewritten partitions (two days here),
    never the lake — the join keys are the changed slice's event_ids,
    shuffled once, AQE free to broadcast the smaller side. Downstream
    consumers (incremental matview refresh, index extenders) subscribe
    to exactly this feed shape instead of re-scanning the table."""
    from ..sources.manifest import (
        changed_files,
        init_versioned_lake,
        latest_version,
        read_file_list,
    )
    from .matview import apply_versioned_cdc

    root = cdf_lake_path(sf_dir)
    ev = load_table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    init_versioned_lake(ev, root, "event_date")
    apply_versioned_cdc(spark, root, ev)
    v2 = latest_version(root)
    v1 = v2 - 1
    added, removed = changed_files(root, v1, v2)
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    pre = read_file_list(spark, root, removed, v1).select(cols)
    post = read_file_list(spark, root, added, v2).select(cols)
    a = pre.select([F.col(c).alias(f"a_{c}") for c in cols])
    b = post.select([F.col(c).alias(f"b_{c}") for c in cols])
    j = a.join(b, a.a_event_id == b.b_event_id, "full_outer")
    differs = (
        (F.col("a_value") != F.col("b_value"))
        | (F.col("a_ts") != F.col("b_ts"))
        | (F.col("a_event_type") != F.col("b_event_type"))
        | (F.col("a_props") != F.col("b_props"))
    )
    change_type = (
        F.when(F.col("a_event_id").isNull(), "insert")
        .when(F.col("b_event_id").isNull(), "delete")
        .when(differs, "update")
        .otherwise("carryover")
    )
    v = F.when(F.col("b_event_id").isNull(), F.col("a_value")).otherwise(F.col("b_value"))
    return (
        j.select(
            change_type.alias("change_type"),
            F.coalesce("a_event_id", "b_event_id").alias("event_id"),
            v.alias("v"),
        )
        .groupBy("change_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("event_id").alias("id_sum"),
            F.sum(_cents("v")).alias("value_cents"),
        )
        .orderBy("change_type")
    )


def mor_lake_path(sf_dir: str) -> str:
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo_root, "spark-warehouse", f"events_mor_{tag}")


_MOR_ORACLE = f"""
    WITH day AS (
        SELECT * FROM events
        WHERE ts >= TIMESTAMP '{TARGET_DAY} 00:00:00'
          AND ts <  TIMESTAMP '{TARGET_DAY} 00:00:00' + INTERVAL 1 DAY
    ),
    del AS (SELECT event_id FROM day WHERE user_id % 13 = 0)
    SELECT CAST(ts AS DATE) AS event_date, event_type, count(*) AS n,
           round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100, 2)
               AS total_value
    FROM events
    WHERE event_id NOT IN (SELECT event_id FROM del)
      AND ts >= TIMESTAMP '{TARGET_DAY} 00:00:00' - INTERVAL 1 DAY
      AND ts <  TIMESTAMP '{TARGET_DAY} 00:00:00' + INTERVAL 2 DAY
    GROUP BY 1, 2 ORDER BY 1, 2
    """


@query("events_merge_on_read", oracle=_MOR_ORACLE)
def events_merge_on_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE end-to-end (Delta deletion vectors / Iceberg
    position deletes on the manifest layer): v1 = the versioned lake,
    v2 = delete_commit of TARGET_DAY's user_id%13 keys — which must
    rewrite NOTHING (asserted in-plan via changed_files: the v1→v2 data-
    file delta is empty on both sides; the commit is one small DV parquet
    + a manifest), then purge_deletes materializes the masks as v3 (a
    rows_preserved partition rewrite, so downstream freshness survives,
    asserted via rows_changed_since). The RETURNED rollup time-travels to
    v2 — the masked read path itself, DV anti-join live — over a window
    including an untouched day, and the in-plan check pins the masked v2
    read row-count-equal to the purged v3 read. Oracle: the same rollup
    with the delete set subtracted logically.

    Scale posture: the delete commits in O(delete batch) I/O (locate via
    partition-scoped scan with `_metadata`, write one delta-sized DV
    file) — copy-on-write would rewrite every touched partition for any
    delete size; the masked read adds one broadcast anti-join; the purge
    rewrites ONLY partitions holding masked files."""
    from ..sources.manifest import (
        changed_files,
        delete_commit,
        init_versioned_lake,
        purge_deletes,
        read_snapshot,
        rows_changed_since,
    )

    root = mor_lake_path(sf_dir)
    ev = load_table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    init_versioned_lake(ev, root, "event_date")
    day = F.col("event_date") == F.lit(TARGET_DAY).cast("date")
    keys = ev.filter(day & (F.col("user_id") % 13 == 0)).select("event_id", "event_date")
    v2 = delete_commit(spark, root, keys, "event_id")
    added, removed = changed_files(root, 1, v2)
    if added or removed:
        raise RuntimeError(f"merge-on-read rewrote data files: +{added} -{removed}")
    purged = purge_deletes(spark, root)
    if purged != [TARGET_DAY]:
        raise RuntimeError(f"purge touched {purged}, expected [{TARGET_DAY!r}]")
    if rows_changed_since(root, v2):
        raise RuntimeError("purge must be rows_preserved for downstream freshness")
    masked = read_snapshot(spark, root, v2)
    if masked.count() != read_snapshot(spark, root).count():
        raise RuntimeError("masked v2 read and purged v3 read disagree")
    lo = F.lit(TARGET_DAY).cast("date")
    return (
        masked.filter(
            (F.col("event_date") >= F.date_sub(lo, 1))
            & (F.col("event_date") < F.date_add(lo, 2))
        )
        .groupBy("event_date", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(_cents("value")).cast("double") / 100, 2).alias("total_value"),
        )
        .orderBy("event_date", "event_type")
    )


def count_lake_path(sf_dir: str) -> str:
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo_root, "spark-warehouse", f"events_count_{tag}")


_COUNT_SERVED_ORACLE = f"""
    WITH day AS (
        SELECT * FROM events
        WHERE ts >= TIMESTAMP '{TARGET_DAY} 00:00:00'
          AND ts <  TIMESTAMP '{TARGET_DAY} 00:00:00' + INTERVAL 1 DAY
    ),
    upd AS (SELECT event_id FROM day WHERE user_id % 7 = 0),
    ins AS (SELECT event_id + {MERGE_INS_OFFSET} AS event_id,
                   ts + INTERVAL 1 DAY AS ts, user_id
            FROM day WHERE user_id % 11 = 0),
    del AS (SELECT event_id FROM day WHERE user_id % 13 = 0),
    merged AS (
        SELECT event_id, ts, user_id FROM events
        WHERE event_id NOT IN (SELECT event_id FROM del)
        UNION ALL
        SELECT event_id, ts, user_id FROM ins
    ),
    dv AS (
        SELECT event_id FROM events
        WHERE CAST(ts AS DATE) = DATE '{TARGET_DAY}' - 1 AND user_id % 13 = 0
    )
    SELECT CAST(ts AS DATE) AS event_date, CAST(count(*) AS BIGINT) AS n
    FROM merged WHERE event_id NOT IN (SELECT event_id FROM dv)
    GROUP BY 1 ORDER BY 1
    """


@query("events_count_served", oracle=_COUNT_SERVED_ORACLE)
def events_count_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition COUNT(*) answered from METADATA ALONE
    (manifest.partition_row_counts): the lake's manifests record each
    file's footer row count at commit time (Iceberg's record_count), so
    after a CDC MERGE **and** with a deletion-vector delete still
    outstanding, the per-day counts come from one manifest read plus the
    delta-sized DV parquets — zero data files opened. The plan drives
    the full lifecycle first (init → versioned CDC merge → DV delete of
    the PRIOR day, a partition the merge never touched), so the served
    numbers must survive file rewrite, entry drop, carry rules, and
    mask subtraction; the oracle recomputes the same counts logically
    from the flat table. At 100 TB this is the difference between
    ingest-monitoring dashboards scanning years of history and reading
    a JSON file.

    Note the update leg cancels out of pure counts (upserts replace
    rows 1:1) — the oracle keeps only inserts, deletes, and the DV
    subtraction, which is exactly why count-serving never needs the
    rewritten files' contents, only their footers."""
    from ..sources.manifest import (
        delete_commit,
        init_versioned_lake,
        partition_row_counts,
    )
    from .matview import apply_versioned_cdc

    root = count_lake_path(sf_dir)
    ev = load_table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    init_versioned_lake(ev, root, "event_date")
    apply_versioned_cdc(spark, root, ev)
    prior = F.date_sub(F.lit(TARGET_DAY).cast("date"), 1)
    keys = ev.filter(
        (F.col("event_date") == prior) & (F.col("user_id") % 13 == 0)
    ).select("event_id", "event_date")
    delete_commit(spark, root, keys, "event_id")
    counts = partition_row_counts(spark, root)
    if counts is None:
        raise RuntimeError("metadata row counts unavailable — recording broke")
    return (
        spark.createDataFrame(
            sorted(counts.items()), "event_date string, n long"
        )
        .select(F.to_date("event_date").alias("event_date"), "n")
        .orderBy("event_date")
    )
