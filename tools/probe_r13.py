"""r13 profiling probe: decompose headline-query walls (guide §1).

For each query: DataFrame CONSTRUCTION wall (py4j/planning driver work),
noop-sink execution wall (compute only, guide §1.4), toPandas wall (the
bench's timed action), and the number of Spark jobs each action schedules
(driver job round-trips are the sf0.1 wall — every job is a scheduling +
result round-trip).

Usage: python tools/probe_r13.py [sf_dir] [name ...]   (default HEADLINE)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402
from etl_pdf_pipepline_spark.registry import _REGISTRY, _ensure_loaded  # noqa: E402
from etl_pdf_pipepline_spark.session import get_spark  # noqa: E402

REPS = 5


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or list(bench.HEADLINE)
    _ensure_loaded()
    spark = get_spark("probe-r13", data_dir=sf_dir)

    # Bench prepare phase: layouts/indexes/manifests so routed queries
    # take their served paths, same as the timed bench.
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

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    print(f"{'query':32s} {'build':>7s} {'noop':>7s} {'pandas':>7s} {'jobs':>5s}")
    for name in names:
        fn = _REGISTRY[name].fn
        # warm (cold pass: codegen, listing, caches)
        fn(spark, sf_dir).toPandas()

        best_build = best_noop = best_pd = float("inf")
        jobs = -1
        for _ in range(REPS):
            t0 = time.time()
            df = fn(spark, sf_dir)
            best_build = min(best_build, time.time() - t0)

            sc.setJobDescription(f"probe:{name}:noop")
            j0 = tracker.getJobIdsForGroup(None)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best_noop = min(best_noop, time.time() - t0)

            sc.setJobDescription(f"probe:{name}:pandas")
            t0 = time.time()
            fn(spark, sf_dir).toPandas()
            dt = time.time() - t0
            if dt < best_pd:
                best_pd = dt
            sc.setJobDescription(None)
        # jobs for ONE toPandas action (measured once, outside timing)
        before = len(tracker.getJobIdsForGroup(None))
        fn(spark, sf_dir).toPandas()
        jobs = len(tracker.getJobIdsForGroup(None)) - before
        print(
            f"{name:32s} {best_build*1e3:7.1f} {best_noop*1e3:7.1f} "
            f"{best_pd*1e3:7.1f} {jobs:5d}"
        )
        from etl_pdf_pipepline_spark.streaming.events import release_stream_tables

        release_stream_tables(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
