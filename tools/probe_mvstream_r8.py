"""r8 economics probe: STREAMING materialized-view maintenance
(plans/matview.py streaming_rollup_maintenance) at a scale dir.

    python tools/probe_mvstream_r8.py [sf_dir] [reps] [n_batches]

Per cycle, over the same pre-split time-ranged source files:

  ingest_only — foreachBatch -> append_commit (txn ledger), no view:
                the plain versioned streaming sink (the r8
                streaming_versioned_ingest shape)
  maintained  — the same drain plus per-batch view maintenance
                (build on batch 0, partition-scoped refresh after)

The difference is the always-fresh-aggregate surcharge per drain; the
per-batch surcharge is that divided by the batch count. MIN over reps.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf30"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from etl_pdf_pipepline_spark.plans.matview import (
        build_rollup_view,
        refresh_rollup_view,
    )
    from etl_pdf_pipepline_spark.session import get_spark
    from etl_pdf_pipepline_spark.sources.catalog import load_table
    from etl_pdf_pipepline_spark.sources.manifest import append_commit, latest_version

    spark = get_spark("probe-mvstream", data_dir=sf_dir)
    base = "/tmp/probe_mvstream"
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "src")
    ev = load_table(spark, sf_dir, "events")
    ev.repartitionByRange(n_batches, "ts").write.parquet(src)
    schema = spark.read.parquet(src).schema
    best: dict[str, float] = {}

    def drain(tag: str, maintain: bool) -> float:
        root = os.path.join(base, f"{tag}_table")
        view_root = os.path.join(base, f"{tag}_view")
        meta_root = os.path.join(base, f"{tag}_meta")
        ckpt = os.path.join(base, f"{tag}_ckpt")
        for d in (root, view_root, meta_root, ckpt):
            shutil.rmtree(d, ignore_errors=True)

        def sink(batch, bid):
            batch = batch.withColumn("event_date", F.to_date("ts"))
            append_commit(batch, root, "event_date", txn=("probe", bid))
            if not maintain:
                return
            if latest_version(view_root) == 0:
                build_rollup_view(spark, root, sf_dir, view_root=view_root, meta_root=meta_root)
            else:
                changed = [r[0] for r in batch.select("event_date").distinct().collect()]
                refresh_rollup_view(
                    spark, root, sf_dir, changed, view_root=view_root, meta_root=meta_root
                )

        t0 = time.monotonic()
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return time.monotonic() - t0

    for cycle in range(reps):
        print(f"cycle {cycle}:", flush=True)
        for tag, maintain in (("ingest_only", False), ("maintained", True)):
            dt = drain(f"{tag}_{cycle}", maintain)
            best[tag] = min(best.get(tag, float("inf")), dt)
            print(f"  {tag}: {dt:.2f}s", flush=True)

    surcharge = best["maintained"] - best["ingest_only"]
    best["surcharge_per_drain"] = round(surcharge, 3)
    best["surcharge_per_batch"] = round(surcharge / n_batches, 3)
    best["surcharge_pct"] = round(100 * surcharge / best["ingest_only"], 1)
    print(
        json.dumps(
            {"sf_dir": sf_dir, "n_batches": n_batches, "best": {k: round(v, 3) for k, v in best.items()}}
        )
    )


if __name__ == "__main__":
    main()
