"""r8 economics probe: incremental materialized-view maintenance
(plans/matview.py) at a scale dir.

    python tools/probe_matview_r8.py [sf_dir] [reps]

Phases, timed in lifecycle order per cycle (state mutates, so phases
cannot be cross-ordered; MIN per phase over `reps` cycles reported):

1. view_build   — full rollup over the base snapshot (the once cost)
2. cdc_merge    — the gate's CDC batch merge-committed into the base
3. view_refresh — partition-scoped refresh of the touched days only
4. view_rebuild — the naive alternative: full re-aggregate of the
                  post-merge lake (what refresh avoids per CDC batch)
5. serve_view   — answering the 3-day rollup from the view
6. serve_scan   — the same answer re-aggregated from the facts

The refresh-vs-rebuild ratio is the marginal-cost claim; at 100 TB the
rebuild side scales with the lake while refresh scales with the CDC
batch's day span."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf30"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from etl_pdf_pipepline_spark.functions.money import cents as _cents
    from etl_pdf_pipepline_spark.plans.matview import (
        _rollup,
        apply_versioned_cdc,
        build_rollup_view,
        mv_lake_path,
        refresh_rollup_view,
        serve_rollup,
    )
    from etl_pdf_pipepline_spark.plans.partitioned import TARGET_DAY
    from etl_pdf_pipepline_spark.session import get_spark
    from etl_pdf_pipepline_spark.sources.catalog import load_table
    from etl_pdf_pipepline_spark.sources.manifest import init_versioned_lake, read_snapshot

    spark = get_spark("probe-matview", data_dir=sf_dir)
    root = mv_lake_path(sf_dir)
    best: dict[str, float] = {}

    def clock(name: str, fn):
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        best[name] = min(best.get(name, float("inf")), dt)
        print(f"  {name}: {dt:.2f}s", flush=True)
        return out

    ev = load_table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    lo = F.lit(TARGET_DAY).cast("date")
    window = lambda df: df.filter(  # noqa: E731
        (F.col("event_date") >= F.date_sub(lo, 1)) & (F.col("event_date") < F.date_add(lo, 2))
    )

    for cycle in range(reps):
        print(f"cycle {cycle}:", flush=True)
        init_versioned_lake(ev, root, "event_date")  # untimed base ingest
        clock("view_build", lambda: build_rollup_view(spark, root, sf_dir))
        changed = clock("cdc_merge", lambda: apply_versioned_cdc(spark, root, ev))
        clock("view_refresh", lambda: refresh_rollup_view(spark, root, sf_dir, changed))
        clock(
            "view_rebuild",
            lambda: _rollup(read_snapshot(spark, root)).write.mode("overwrite").parquet(
                "/tmp/probe_mv_rebuild"
            ),
        )
        clock("serve_view", lambda: window(serve_rollup(spark, sf_dir)).orderBy(
            "event_date", "event_type"
        ).collect())
        clock(
            "serve_scan",
            lambda: window(read_snapshot(spark, root))
            .groupBy("event_date", "event_type")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum(_cents("value")).cast("double") / 100, 2).alias("total_value"),
            )
            .orderBy("event_date", "event_type")
            .collect(),
        )

    best["refresh_vs_rebuild"] = round(best["view_rebuild"] / best["view_refresh"], 2)
    print(json.dumps({"sf_dir": sf_dir, "best": {k: round(v, 3) for k, v in best.items()}}))


if __name__ == "__main__":
    main()
