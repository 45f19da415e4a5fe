"""Per-query shuffle/memory telemetry for the headline set (VERDICT r3 #7).

The scaling argument in SCALING.md claims the sf30 laggards are single-node
shuffle I/O that a cluster divides; this tool records the numbers behind
that claim. For each headline query it runs the query once (steady-state:
a warm pass precedes the timed pass) and diffs the Spark UI REST API's
per-stage metrics, attributing to the query every stage that completed
during its window:

- shuffle_write_mb / shuffle_read_mb — bytes through the shuffle. The
  cluster-divisible term: N executors each write/read ~1/N of it.
- input_mb — bytes read from parquet (post column-pruning; a number far
  below the raw table size is pushdown working).
- peak_exec_mem_mb — max over stages of peakExecutionMemory: the largest
  single-stage memory footprint (spill risk proxy).
- tasks — total task count (parallelism granularity).

Usage:
    python tools/bench_telemetry.py [sf_dir] [out_json]

Prints a markdown table (for SCALING.md) and writes the raw JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from etl_pdf_pipepline_spark.registry import all_queries  # noqa: E402
from etl_pdf_pipepline_spark.session import get_spark  # noqa: E402

MB = 1024 * 1024


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=10) as r:
        return json.loads(r.read())


def _stage_rows(base: str, app_id: str) -> dict[tuple[int, int], dict]:
    """All COMPLETE stage attempts keyed by (stageId, attemptId)."""
    rows = {}
    for s in _api(base, f"/api/v1/applications/{app_id}/stages?status=complete"):
        rows[(s["stageId"], s["attemptId"])] = s
    return rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/telemetry.json"

    spark = get_spark(
        "bench-telemetry",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
        data_dir=sf_dir,  # same derived shuffle partitions as bench.py
    )
    base = "http://localhost:4050"
    app_id = _api(base, "/api/v1/applications")[0]["id"]
    qs = all_queries()

    results: dict[str, dict] = {}
    for name in HEADLINE:
        fn = qs[name]
        fn(spark, sf_dir).toPandas()  # warm: codegen + any cached index build
        before = _stage_rows(base, app_id)
        t0 = time.time()
        fn(spark, sf_dir).toPandas()
        wall = time.time() - t0
        # completed-stage metrics flush asynchronously; small settle loop
        time.sleep(0.3)
        after = _stage_rows(base, app_id)
        new = [s for k, s in after.items() if k not in before]
        results[name] = {
            "wall_s": round(wall, 3),
            "shuffle_write_mb": round(sum(s.get("shuffleWriteBytes", 0) for s in new) / MB, 2),
            "shuffle_read_mb": round(sum(s.get("shuffleReadBytes", 0) for s in new) / MB, 2),
            "input_mb": round(sum(s.get("inputBytes", 0) for s in new) / MB, 2),
            "peak_exec_mem_mb": round(
                max((s.get("peakExecutionMemory", 0) for s in new), default=0) / MB, 2
            ),
            "tasks": sum(s.get("numCompleteTasks", 0) for s in new),
            "stages": len(new),
        }
        r = results[name]
        print(
            f"{name}: {r['wall_s']}s  shufW={r['shuffle_write_mb']}MB "
            f"shufR={r['shuffle_read_mb']}MB in={r['input_mb']}MB "
            f"peakMem={r['peak_exec_mem_mb']}MB tasks={r['tasks']}",
            flush=True,
        )

    with open(out_json, "w") as f:
        json.dump({"sf_dir": sf_dir, "queries": results}, f, indent=1)

    print("\n| query | wall s | shuffle write MB | shuffle read MB | input MB | peak exec mem MB | tasks |")
    print("|---|---|---|---|---|---|---|")
    for name, r in results.items():
        print(
            f"| {name} | {r['wall_s']} | {r['shuffle_write_mb']} | {r['shuffle_read_mb']} "
            f"| {r['input_mb']} | {r['peak_exec_mem_mb']} | {r['tasks']} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
