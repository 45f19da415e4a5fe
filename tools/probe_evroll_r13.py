"""Layer decomposition of events_hourly_rollup's scale-invariant wall
(r13: ~1.4 s at BOTH sf30 and sf100 — not data-bound, so the r12/r13
"decode floor over 600M rows" attribution needs re-measurement; events
is 30M rows at sf30 / 100M at sf100).

    python tools/probe_evroll_r13.py [sf_dir] [reps]

Layers, each timed min-of-N with the noop sink (guide §1.4) so the
collect path is out of the measurement:

  L0 scan+decode   select(ts, event_type, value), noop
  L1 + keying      groupBy(hb, event_type).count(), noop
  L2 full agg      the registered query body, noop
  L3 full query    the registered query body, toPandas (bench action)

The gap L0→L1 is hash-agg keying, L1→L2 the exact-cents sums, L2→L3
result materialization + construction. Scan TASK COUNT is printed from
the noop job's partition count so the 4 ms/task dispatch floor
(SCALING.md sf100 decomposition) can be priced against L0.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf30"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from etl_pdf_pipepline_spark.registry import all_queries
    from etl_pdf_pipepline_spark.session import get_spark
    from etl_pdf_pipepline_spark.sources.catalog import load_table

    spark = get_spark("probe-evroll", data_dir=sf_dir)
    qs = all_queries()

    def noop_wall(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def best(fn, make) -> float:
        b = float("inf")
        for _ in range(reps):
            b = min(b, fn(make()))
        return b

    ev = load_table(spark, sf_dir, "events")
    n_scan_parts = ev.select("ts", "event_type", "value").rdd.getNumPartitions()

    spark.sparkContext.setJobDescription("evroll L0 scan+decode")
    l0 = best(noop_wall, lambda: load_table(spark, sf_dir, "events").select("ts", "event_type", "value"))
    spark.sparkContext.setJobDescription("evroll L1 keying")
    l1 = best(
        noop_wall,
        lambda: load_table(spark, sf_dir, "events")
        .groupBy(F.expr("unix_micros(ts) div 3600000000").alias("hb"), "event_type")
        .count(),
    )
    spark.sparkContext.setJobDescription("evroll L2 full agg noop")
    l2 = best(noop_wall, lambda: qs["events_hourly_rollup"](spark, sf_dir))
    spark.sparkContext.setJobDescription("evroll L3 full toPandas")

    def pandas_wall(df) -> float:
        t0 = time.perf_counter()
        n = len(df.toPandas())
        assert n > 0
        return time.perf_counter() - t0

    l3 = best(pandas_wall, lambda: qs["events_hourly_rollup"](spark, sf_dir))
    spark.sparkContext.setJobDescription(None)

    print(
        f"sf_dir={sf_dir} reps={reps} scan_partitions={n_scan_parts}\n"
        f"L0 scan+decode noop : {l0:.3f}s\n"
        f"L1 + hb/type keying : {l1:.3f}s\n"
        f"L2 full agg noop    : {l2:.3f}s\n"
        f"L3 full toPandas    : {l3:.3f}s"
    )


if __name__ == "__main__":
    main()
