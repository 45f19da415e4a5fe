"""A/B probe for any registered query at a scale dir: Spark vs its
DuckDB oracle, same session, cross-ordered reps.

    python tools/probe_query.py NAME [sf_dir] [reps]

Generalizes tools/probe_minhash.py (kept for its recorded numbers).
Cross-order-safe: each rep alternates which engine goes first so
neither systematically eats the cold cost (the r6 streaming-probe
lesson, SCALING.md). Zero-row results refuse to report — the r5
hollow-measurement guard."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_baseline import duckdb_connect_views


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf30"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from etl_pdf_pipepline_spark.registry import _REGISTRY, _ensure_loaded
    from etl_pdf_pipepline_spark.session import get_spark

    _ensure_loaded()
    spec = _REGISTRY[name]
    spark = get_spark(data_dir=sf_dir)
    con = duckdb_connect_views(sf_dir)

    def run_spark() -> float:
        t0 = time.perf_counter()
        n = len(spec.fn(spark, sf_dir).toPandas())
        assert n > 0, f"{name} returned 0 rows at {sf_dir}"
        return time.perf_counter() - t0

    def run_duck() -> float:
        t0 = time.perf_counter()
        n = len(con.execute(spec.oracle).fetch_df())
        assert n > 0
        return time.perf_counter() - t0

    runners = [("spark", run_spark)] + (
        [("duckdb", run_duck)] if spec.oracle else []
    )
    for _, fn in runners:
        fn()  # warm
    sp, dk = [], []
    for r in range(reps):
        order = list(runners)
        if r % 2:
            order.reverse()
        for nm, fn in order:
            (sp if nm == "spark" else dk).append(fn())
    msg = f"PROBE {name} @ {sf_dir}: spark min={min(sp):.2f}s all={[round(x, 2) for x in sp]}"
    if dk:
        msg += (
            f" | duckdb min={min(dk):.2f}s all={[round(x, 2) for x in dk]}"
            f" | ratio={min(sp) / min(dk):.2f}"
        )
    print(msg)


if __name__ == "__main__":
    main()
