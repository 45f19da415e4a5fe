"""r14 drain decomposition: where does a memory-sink availableNow drain
of the hourly rollup spend its wall beyond the batch-equivalent agg?

Phases timed per rep: stage construction (py4j), start→awaitTermination
(split into the progress durationMs fields + stateOperators commit
times), result table read (ordered_small + toPandas). Variants A/B conf
knobs on the same session, interleaved.

Usage: python tools/probe_drain_r14.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_pdf_pipepline_spark.functions.money import cents as _cents  # noqa: E402
from etl_pdf_pipepline_spark.functions.ordering import ordered_small  # noqa: E402
from etl_pdf_pipepline_spark.session import get_spark  # noqa: E402
from etl_pdf_pipepline_spark.streaming.events import (  # noqa: E402
    _stream_state_partitions,
    stream_events,
)


def build_stage(spark, sf_dir):
    ev = stream_events(spark, sf_dir)
    return (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(_cents("value")).cast("double") / 100, 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def one_drain(spark, sf_dir, stage, extra_conf: dict[str, str], idx: int):
    prev = {}
    for k, v in extra_conf.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    sp = _stream_state_partitions(sf_dir)
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(sp))
    name = f"probe14_{idx}"
    ckpt = tempfile.mkdtemp(prefix="probe14_ckpt_", dir="/dev/shm")
    t0 = time.perf_counter()
    q = (
        stage.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    t_started = time.perf_counter()
    q.awaitTermination()
    t_done = time.perf_counter()
    out = ordered_small(spark.table(name), "window_start", "event_type")
    n = len(out.toPandas())
    t_read = time.perf_counter()
    progs = list(q.recentProgress)
    spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    for k, v in prev.items():
        if v is not None:
            spark.conf.set(k, v)
    spark.catalog.dropTempView(name)
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "rows": n,
        "start": t_started - t0,
        "drain": t_done - t_started,
        "read": t_read - t_done,
        "wall": t_read - t0,
        "progs": progs,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("probe-drain14", data_dir=sf_dir)

    t0 = time.perf_counter()
    stage = build_stage(spark, sf_dir)
    t_build1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    build_stage(spark, sf_dir)
    t_build2 = time.perf_counter() - t0
    print(f"stage construction: cold {t_build1:.3f}s warm {t_build2:.3f}s")

    variants = [
        ("base", {}),
        ("nodata-off", {"spark.sql.streaming.noDataMicroBatches.enabled": "false"}),
        (
            "statefmt1",
            {"spark.sql.streaming.aggregation.stateFormatVersion": "1"},
        ),
    ]
    idx = 0
    results: dict[str, list[dict]] = {v[0]: [] for v in variants}
    for r in range(reps):
        for label, conf in variants:
            spark.sparkContext.setJobDescription(f"drain14 {label} rep {r}")
            res = one_drain(spark, sf_dir, stage, conf, idx)
            idx += 1
            results[label].append(res)
    for label, runs in results.items():
        walls = [r["wall"] for r in runs]
        best = min(runs, key=lambda r: r["wall"])
        print(
            f"{label}: rows={best['rows']} walls={[round(w,3) for w in walls]} "
            f"min={min(walls):.3f} (start {best['start']:.3f} drain {best['drain']:.3f} "
            f"read {best['read']:.3f}) batches={len(best['progs'])}"
        )
        for p in best["progs"]:
            so = p["stateOperators"][0] if p["stateOperators"] else {}
            print(
                f"  durationMs={p['durationMs']} "
                f"state: updated={so.get('numRowsUpdated')} "
                f"allUpdatesMs={so.get('allUpdatesTimeMs')} "
                f"commitMs={so.get('commitTimeMs')} "
                f"allRemovalsMs={so.get('allRemovalsTimeMs')}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
