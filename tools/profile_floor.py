"""Per-query job/stage accounting for the sf0.1 floor hunt (r11).

For each headline query: wall time plus how many Spark jobs and stages the
timed run launches (statusTracker deltas). A 0.4 s query that launches 5
jobs is paying scheduling, not compute — the fix is collapsing actions,
not tuning plans. Usage:

    python tools/profile_floor.py [query ...]       # default: full headline
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pdf_pipepline_spark.registry import all_queries
from etl_pdf_pipepline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_floor", data_dir=sf_dir)
    qs = all_queries()

    import bench

    names = sys.argv[1:] or bench.HEADLINE
    # Prepare phase identical to bench.py so routed queries serve.
    from etl_pdf_pipepline_spark.operators.dedup import (
        ensure_lsh_band_index,
        ensure_minhash_signatures,
        ensure_simhash_signatures,
    )
    from etl_pdf_pipepline_spark.operators.multimodal import ensure_media_manifest
    from etl_pdf_pipepline_spark.plans.bucketed import write_bucketed_facts
    from etl_pdf_pipepline_spark.plans.zorder import ensure_zorder_events
    from etl_pdf_pipepline_spark.retrieval.queries import ensure_bm25_index

    write_bucketed_facts(spark, sf_dir)
    ensure_lsh_band_index(spark, sf_dir)
    ensure_zorder_events(spark, sf_dir)
    ensure_media_manifest(spark, sf_dir)
    ensure_bm25_index(spark, sf_dir)
    ensure_minhash_signatures(spark, sf_dir)
    ensure_simhash_signatures(spark, sf_dir)

    tracker = spark.sparkContext.statusTracker()

    # Warm pass (codegen compile), then measured pass with job accounting.
    for name in names:
        qs[name](spark, sf_dir).toPandas()

    print(f"{'query':34s} {'wall':>7s} {'jobs':>5s} {'stages':>7s}")
    rows = []
    for name in names:
        spark.sparkContext.setJobGroup(f"prof_{name}", name)
        t0 = time.time()
        qs[name](spark, sf_dir).toPandas()
        wall = time.time() - t0
        job_ids = tracker.getJobIdsForGroup(f"prof_{name}")
        n_stages = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is not None:
                n_stages += len(info.stageIds)
        spark.sparkContext.setJobGroup("idle", "idle")
        rows.append((name, wall, len(job_ids), n_stages))
        print(f"{name:34s} {wall:7.3f} {len(job_ids):5d} {n_stages:7d}")
    total = sum(r[1] for r in rows)
    tot_jobs = sum(r[2] for r in rows)
    print(f"{'TOTAL':34s} {total:7.3f} {tot_jobs:5d}")


if __name__ == "__main__":
    main()
