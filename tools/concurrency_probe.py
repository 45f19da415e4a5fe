"""Concurrent-query serving throughput on ONE shared SparkSession — the
deployment shape of api/engine.py's long-lived session (and of any
multi-tenant Spark driver): N client threads submit independent actions;
Spark schedules their jobs' tasks concurrently across the executor cores.

    python tools/concurrency_probe.py FIFO 8
    python tools/concurrency_probe.py FAIR 8

Measures a 24-query mixed retrieval workload (bm25 / ann / hybrid /
events rollup, warmed) sequentially vs through a thread pool, under the
FIFO (default) or FAIR scheduler. Results in SCALING.md r5.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pdf_pipepline_spark.registry import all_queries  # noqa: E402
from etl_pdf_pipepline_spark.session import get_spark  # noqa: E402

MIX = ["bm25_search", "ann_cosine_topk", "hybrid_rrf_search", "events_hourly_rollup"]


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "FIFO"
    threads = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        f"conc-{mode}", data_dir=sf_dir, extra_conf={"spark.scheduler.mode": mode}
    )
    qs = all_queries()
    for n in MIX:  # warm: caches + codegen
        qs[n](spark, sf_dir).toPandas()
    tasks = MIX * 6

    def run(n: str) -> None:
        qs[n](spark, sf_dir).toPandas()

    t0 = time.time()
    for n in tasks:
        run(n)
    seq = time.time() - t0

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=threads) as ex:
        list(ex.map(run, tasks))
    conc = time.time() - t0
    print(
        json.dumps(
            {
                "mode": mode,
                "threads": threads,
                "n_queries": len(tasks),
                "sequential_s": round(seq, 2),
                "concurrent_s": round(conc, 2),
                "speedup": round(seq / conc, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
