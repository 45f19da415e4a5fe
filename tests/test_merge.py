"""Partition-scoped CDC MERGE (plans/partitioned.py, sources/sinks.py
merge_partitions): the copy-on-write contract a 100 TB lake depends on —
only the partitions a CDC batch touches are rewritten; every other
directory is left inode-for-inode untouched."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_pdf_pipepline_spark.plans.partitioned import (
    MERGE_INS_OFFSET,
    TARGET_DAY,
    _merge_cdc_batch,
    merge_cdc_into_lake,
    merge_lake_path,
)
from etl_pdf_pipepline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _file_idents(root: str) -> dict[str, tuple]:
    """partition dir -> sorted (name, size, mtime_ns, inode) tuples."""
    out = {}
    for entry in sorted(os.listdir(root)):
        p = os.path.join(root, entry)
        if not os.path.isdir(p):
            continue
        stats = []
        for f in sorted(os.listdir(p)):
            st = os.stat(os.path.join(p, f))
            stats.append((f, st.st_size, st.st_mtime_ns, st.st_ino))
        out[entry] = tuple(stats)
    return out


def _build_lake(spark) -> str:
    path = merge_lake_path(SF)
    (
        load_table(spark, SF, "events")
        .withColumn("event_date", F.to_date("ts"))
        .repartition(F.col("event_date"))
        .write.partitionBy("event_date")
        .mode("overwrite")
        .parquet(path)
    )
    return path


def test_merge_rewrites_only_touched_partitions(spark):
    path = _build_lake(spark)
    before = _file_idents(path)

    ev = load_table(spark, SF, "events").withColumn("event_date", F.to_date("ts"))
    upserts, inserts, deletes = _merge_cdc_batch(ev)
    swapped = merge_cdc_into_lake(spark, path, upserts, inserts, deletes)

    after = _file_idents(path)
    touched = {f"event_date={TARGET_DAY}", "event_date=2024-01-16"}
    assert set(swapped) == touched
    for part, ident in before.items():
        if part in touched:
            assert after[part] != ident, f"{part} should have been rewritten"
        else:
            assert after[part] == ident, f"{part} was rewritten but not touched"
    # no staging/backup residue
    assert not os.path.exists(path + "__merge_staging")
    assert not any(e.endswith("__old") for e in os.listdir(path))


def test_merge_applies_cdc_semantics(spark):
    path = _build_lake(spark)
    ev = load_table(spark, SF, "events").withColumn("event_date", F.to_date("ts"))
    upserts, inserts, deletes = _merge_cdc_batch(ev)

    day = ev.filter(F.col("event_date") == F.lit(TARGET_DAY).cast("date"))
    upd_ids = {r[0] for r in day.filter(F.col("user_id") % 7 == 0).select("event_id").collect()}
    del_ids = {r[0] for r in day.filter(F.col("user_id") % 13 == 0).select("event_id").collect()}
    ins_src = {r[0] for r in day.filter(F.col("user_id") % 11 == 0).select("event_id").collect()}
    old_vals = dict(
        day.filter(F.col("user_id") % 7 == 0).select("event_id", "value").collect()
    )
    assert upd_ids and del_ids and ins_src, "CDC batch degenerate at this sf"

    merge_cdc_into_lake(spark, path, upserts, inserts, deletes)
    lake = spark.read.parquet(path)

    # deletes win (including over updates)
    assert lake.filter(F.col("event_id").isin(list(del_ids))).count() == 0
    # surviving updates carry value+10
    survivors = upd_ids - del_ids
    got = dict(
        lake.filter(F.col("event_id").isin(list(survivors))).select("event_id", "value").collect()
    )
    assert set(got) == survivors
    for eid in survivors:
        assert abs(got[eid] - (old_vals[eid] + 10.0)) < 1e-9
    # inserts landed on the next day's partition with the id offset
    ins_rows = lake.filter(F.col("event_id") >= MERGE_INS_OFFSET)
    assert ins_rows.count() == len(ins_src)
    assert ins_rows.filter(F.col("event_date") != F.lit("2024-01-16").cast("date")).count() == 0
    assert ins_rows.filter(F.col("event_type") != "merged").count() == 0


def test_merge_drops_fully_deleted_partition(spark, tmp_path):
    """ADVICE r7: a CDC batch that deletes EVERY row of a partition
    produces no staging dir for it; with the explicit changed-partition
    set the swap must REMOVE the live directory instead of silently
    resurrecting the deleted rows."""
    import datetime

    from etl_pdf_pipepline_spark.sources.sinks import merge_partitions

    path = str(tmp_path / "lake")
    ev = load_table(spark, SF, "events").withColumn("event_date", F.to_date("ts"))
    (
        ev.repartition(F.col("event_date"))
        .write.partitionBy("event_date")
        .mode("overwrite")
        .parquet(path)
    )
    kill_day = datetime.date.fromisoformat(TARGET_DAY)
    keep_day = datetime.date(2024, 1, 16)
    n_keep_before = spark.read.parquet(path).filter(
        F.col("event_date") == F.lit(keep_day)
    ).count()
    assert n_keep_before > 0

    # batch semantics: delete ALL of kill_day, rewrite keep_day minus one row
    keep_slice = (
        spark.read.parquet(path)
        .filter(F.col("event_date") == F.lit(keep_day))
        .orderBy("event_id")
        .limit(n_keep_before - 1)
    )
    before = _file_idents(path)
    swapped = merge_partitions(
        keep_slice, path, "event_date", changed_partitions=[kill_day, keep_day]
    )
    assert set(swapped) == {f"event_date={kill_day}", f"event_date={keep_day}"}
    # the fully-deleted partition's directory is gone
    assert not os.path.exists(os.path.join(path, f"event_date={kill_day}"))
    lake = spark.read.parquet(path)
    assert lake.filter(F.col("event_date") == F.lit(kill_day)).count() == 0
    assert lake.filter(F.col("event_date") == F.lit(keep_day)).count() == n_keep_before - 1
    # untouched partitions stayed inode-for-inode identical
    after = _file_idents(path)
    for part, ident in before.items():
        if part not in (f"event_date={kill_day}", f"event_date={keep_day}"):
            assert after[part] == ident, f"{part} was rewritten but not touched"
