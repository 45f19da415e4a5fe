"""Decompose the streaming_hourly_rollup drain wall (guide §1).

For each variant, runs N drains of the hourly-rollup stage and prints the
wall plus the micro-batch progress durationMs breakdown from the live
StreamingQuery (addBatch / queryPlanning / latestOffset / walCommit /
commitOffsets / getBatch), so machinery cost is attributed, not guessed.

Variants:
  base      — the production path (withWatermark, complete mode)
  nowm      — watermark node dropped (no-op for complete-mode output:
              complete emits every window; watermark-driven eviction
              never applies)

Usage: python tools/probe_drain_r13.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_pdf_pipepline_spark.session import get_spark  # noqa: E402
from etl_pdf_pipepline_spark.streaming.events import (  # noqa: E402
    _stream_state_partitions,
    release_stream_tables,
    run_available_now,
    stream_events,
)
from etl_pdf_pipepline_spark.functions.money import cents as _cents  # noqa: E402


def stage(spark, sf_dir, watermark: bool):
    ev = stream_events(spark, sf_dir)
    if watermark:
        ev = ev.withWatermark("ts", "1 hour")
    cents = _cents("value")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(cents).cast("double") / 100, 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark("probe-drain", data_dir=sf_dir)
    sp = _stream_state_partitions(sf_dir)

    for label, wm in [("base", True), ("nowm", False)]:
        walls = []
        last_prog = None
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"drain probe {label} rep {i}")
            t0 = time.time()
            out = run_available_now(stage(spark, sf_dir, wm), "complete", state_partitions=sp)
            n = out.count()
            walls.append(time.time() - t0)
            # recentProgress of the just-finished query is not reachable
            # from the returned table; re-run one labelled drain below if
            # needed. Instead grab from active listener: simplest is the
            # spark.streams.active (empty post-termination), so drive one
            # manual query for the breakdown on the last rep.
        print(f"{label}: rows={n} walls={[round(w,3) for w in walls]} min={min(walls):.3f}")
        release_stream_tables(spark)

        # One instrumented drain for the durationMs breakdown.
        name = f"probe_sink_{label}"
        ckpt_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
        import tempfile

        ckpt = tempfile.mkdtemp(prefix="probe_ckpt_", dir=ckpt_base)
        q = (
            stage(spark, sf_dir, wm)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        for p in q.recentProgress:
            print(f"  progress durationMs: {p['durationMs']}")
        spark.catalog.dropTempView(name)
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
