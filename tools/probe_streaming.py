"""Micro-batch/state-store probe for the streaming hourly rollup
(VERDICT r5 ask #4): is the 17.5 s sf100 wall the honest cost of
streaming semantics, or does batch sizing / the RocksDB state store
move it?

    python tools/probe_streaming.py [sf_dir] [reps]

Variants, each a fresh streaming query on the same session:
  base        — availableNow, all 340 files in one micro-batch,
                HDFS-backed (in-memory) state store (the bench config)
  rocksdb     — same plan, RocksDBStateStoreProvider
  files32     — maxFilesPerTrigger=32 (~11 micro-batches)
  files85     — maxFilesPerTrigger=85 (4 micro-batches)

Results land in SCALING.md as a measured statement either way, like the
r4 AQE-coalesce negative result.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_pdf_pipepline_spark.session import get_spark
from etl_pdf_pipepline_spark.streaming.events import (
    _SCHEMA_CACHE,
    release_stream_tables,
    run_available_now,
    stream_events,
)

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
HDFS = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"


def rollup(spark, sf_dir, max_files=None):
    from etl_pdf_pipepline_spark.functions.money import cents as _cents

    ev = stream_events(spark, sf_dir)
    if max_files is not None:
        # re-wire the file source with a trigger cap: availableNow
        # respects maxFilesPerTrigger as the micro-batch size while
        # still draining everything.
        src = os.path.join(sf_dir, "events.parquet")
        raw_schema = _SCHEMA_CACHE[(id(spark), sf_dir)]
        from etl_pdf_pipepline_spark.sources.catalog import _normalize_events_ts

        ev = _normalize_events_ts(
            spark.readStream.schema(raw_schema)
            .option("maxFilesPerTrigger", str(max_files))
            .parquet(src)
        )
    cents = _cents("value")
    return (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf100"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("probe-streaming", data_dir=sf_dir)
    variants = [
        ("base", HDFS, None),
        ("rocksdb", ROCKSDB, None),
        ("files32", HDFS, 32),
        ("files85", HDFS, 85),
    ]
    for name, provider, max_files in variants:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
        best, rows = float("inf"), -1
        for _ in range(reps):
            t0 = time.time()
            out = run_available_now(rollup(spark, sf_dir, max_files), "complete")
            n = out.count()
            best, rows = min(best, time.time() - t0), n
            release_stream_tables(spark)
        assert rows > 0, f"{name}: empty stream (hollow measurement)"
        print(f"{name}: {best:.1f}s rows={rows}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
