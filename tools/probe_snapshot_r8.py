"""r8 probe: price manifest-stats data skipping (events_snapshot_pruned)
at scale — the read-side payoff the sf0.01 gate row can't show.

Measures, in ONE session at a given sf dir:
  1. lake build wall (one-time ingest cost: range-cluster write +
     footer stats + manifest commit)
  2. the 2-D slice (3-day window AND bottom-decile users) answered from
     a FULL snapshot read (manifest file list, no pruning)
  3. the same slice from the PRUNED read (read_snapshot(bounds=...))
  4. file counts: total vs after partition-value pruning vs after
     file-stat pruning — the skipping the plan never pays for
  5. DuckDB's flat-table wall for the identical predicate (context)

Usage: python tools/probe_snapshot_r8.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

from etl_pdf_pipepline_spark.plans.partitioned import (
    SNAP_DAY_HI,
    SNAP_DAY_LO,
    _SNAPSHOT_PRUNED_ORACLE,
    stats_lake_path,
)
from etl_pdf_pipepline_spark.session import get_spark
from etl_pdf_pipepline_spark.sources.catalog import load_table
from etl_pdf_pipepline_spark.sources.manifest import (
    _read_manifest,
    init_versioned_lake,
    latest_version,
    read_snapshot,
    snapshot_files,
)


def _min2(fn):
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def _slice_agg(df, u_hi):
    return (
        df.filter(
            (F.col("event_date") >= F.lit(SNAP_DAY_LO).cast("date"))
            & (F.col("event_date") <= F.lit(SNAP_DAY_HI).cast("date"))
            & (F.col("user_id") <= u_hi)
        )
        .groupBy("event_date", "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )


def ingest(sf_dirs):
    """Price the manifest protocol's streaming-ingest overhead: the
    same availableNow file stream landed through (a) the plain
    checkpointed parquet sink and (b) foreachBatch -> append_commit
    (atomic versioned batches + txn ledger). The delta is what
    exactly-once table-format ingest costs over raw file append."""
    import shutil
    import uuid as _uuid

    from etl_pdf_pipepline_spark.sources.manifest import append_commit
    from etl_pdf_pipepline_spark.streaming.events import stream_events

    for sf_dir in sf_dirs:
        spark = get_spark(f"probe_ingest_{os.path.basename(sf_dir)}", data_dir=sf_dir)
        for mode in ("parquet_sink", "append_commit"):
            base = f"/tmp/probe_ingest_{_uuid.uuid4().hex}"
            ev = stream_events(spark, sf_dir).withColumn(
                "event_date", F.to_date("ts")
            )
            t0 = time.time()
            w = ev.writeStream
            if mode == "parquet_sink":
                w = w.format("parquet").option("path", f"{base}/data").partitionBy(
                    "event_date"
                ).outputMode("append")
            else:
                root = f"{base}/table"
                w = w.foreachBatch(
                    lambda b, i: append_commit(b, root, "event_date", txn=("p", i))
                )
            q = (
                w.option("checkpointLocation", f"{base}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            print(f"{sf_dir} {mode}: {time.time() - t0:.2f}s", flush=True)
            shutil.rmtree(base, ignore_errors=True)
        spark.stop()


def main(sf_dirs):
    for sf_dir in sf_dirs:
        spark = get_spark(f"probe_snap_{os.path.basename(sf_dir)}", data_dir=sf_dir)
        ev = load_table(spark, sf_dir, "events").withColumn(
            "event_date", F.to_date("ts")
        )
        params = ev.agg(
            F.max("user_id").alias("mu"), F.countDistinct("event_date").alias("nd")
        ).collect()[0]
        u_hi = int(params["mu"] * 0.1)
        root = stats_lake_path(sf_dir)

        t0 = time.time()
        init_versioned_lake(
            ev,
            root,
            "event_date",
            stats_cols=("user_id",),
            cluster_col="user_id",
            cluster_files=int(params["nd"]) * 4,
        )
        print(f"{sf_dir} build: {time.time() - t0:.2f}s", flush=True)

        m = _read_manifest(root, latest_version(root))
        total = len(snapshot_files(m))
        day_only = len(snapshot_files(m, {"event_date": (SNAP_DAY_LO, SNAP_DAY_HI)}))
        both = len(
            snapshot_files(
                m,
                {"event_date": (SNAP_DAY_LO, SNAP_DAY_HI), "user_id": (None, u_hi)},
            )
        )
        print(
            f"{sf_dir} files: {total} total -> {day_only} after partition "
            f"bound -> {both} after file stats ({both / total:.1%} read)",
            flush=True,
        )

        bounds = {"event_date": (SNAP_DAY_LO, SNAP_DAY_HI), "user_id": (None, u_hi)}
        full = _min2(lambda: _slice_agg(read_snapshot(spark, root), u_hi).toPandas())
        pruned = _min2(
            lambda: _slice_agg(read_snapshot(spark, root, bounds=bounds), u_hi).toPandas()
        )
        print(
            f"{sf_dir} slice: full-snapshot {full:.2f}s, pruned {pruned:.2f}s "
            f"({full / pruned:.1f}x)",
            flush=True,
        )

        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM "
            f"'{sf_dir}/events.parquet{'/**/*.parquet' if os.path.isdir(f'{sf_dir}/events.parquet') else ''}'"
        )
        duck = _min2(lambda: con.sql(_SNAPSHOT_PRUNED_ORACLE).fetchall())
        print(f"{sf_dir} duckdb flat-table: {duck:.2f}s", flush=True)
        con.close()
        spark.stop()


if __name__ == "__main__":
    if sys.argv[1:2] == ["ingest"]:
        ingest(sys.argv[2:] or ["/root/repo/.scale/sf30"])
    else:
        main(sys.argv[1:] or ["/root/repo/.scale/sf30"])
