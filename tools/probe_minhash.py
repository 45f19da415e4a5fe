"""A/B probe for the minhash signature hashing cost at a scale dir.

    python tools/probe_minhash.py /root/repo/.scale/sf30 [reps]

Times dedup_minhash_signatures on BOTH engines (Spark toPandas, DuckDB
fetch_df) with the currently-registered plan+oracle, min-of-N after one
warm rep. Cross-order-safe: each rep alternates which engine goes first
so neither systematically eats the cold cost (the r6 streaming-probe
lesson, SCALING.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_baseline import duckdb_connect_views


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf30"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from etl_pdf_pipepline_spark.registry import _REGISTRY, _ensure_loaded
    from etl_pdf_pipepline_spark.session import get_spark

    _ensure_loaded()
    spec = _REGISTRY["dedup_minhash_signatures"]
    spark = get_spark(data_dir=sf_dir)
    con = duckdb_connect_views(sf_dir)

    def run_spark() -> float:
        t0 = time.perf_counter()
        n = len(spec.fn(spark, sf_dir).toPandas())
        assert n > 0
        return time.perf_counter() - t0

    def run_duck() -> float:
        t0 = time.perf_counter()
        n = len(con.execute(spec.oracle).fetch_df())
        assert n > 0
        return time.perf_counter() - t0

    run_spark(), run_duck()  # warm
    sp, dk = [], []
    for r in range(reps):
        order = [("spark", run_spark), ("duckdb", run_duck)]
        if r % 2:
            order.reverse()
        for name, fn in order:
            (sp if name == "spark" else dk).append(fn())
    print(
        f"spark min={min(sp):.2f}s all={[round(x, 2) for x in sp]} | "
        f"duckdb min={min(dk):.2f}s all={[round(x, 2) for x in dk]} | "
        f"ratio={min(sp) / min(dk):.2f}"
    )


if __name__ == "__main__":
    main()
