"""DuckDB baseline for the bench headline set: run each headline query's
oracle SQL against the same parquet dir bench.py uses, min-of-2 timing,
one JSON line — the apples-to-apples denominator for BENCH ratios.

    python tools/bench_baseline.py [sf_dir]

`duckdb_measure()` is importable — bench.py co-measures the baseline in
the SAME session so every BENCH_r{N}.json carries ratios, not walls
(machine-noise drift between sessions cost a round of signal at r5:
a uniform +32% on bit-identical plans was indistinguishable from a
regression until re-measured).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def duckdb_connect_views(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    """A fresh DuckDB connection with the standard tables registered as
    views over the same parquet `bench.py` reads."""
    from etl_pdf_pipepline_spark.sources.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written table dir vs single file
            path = f"{path}/*.parquet"
        sel = f"SELECT * FROM read_parquet('{path}')"
        if t == "events":
            (ts_type,) = con.execute(
                f"SELECT typeof(ts) FROM read_parquet('{path}') LIMIT 1"
            ).fetchone()
            if ts_type == "BIGINT":  # scaled copies store int64 nanos
                sel = (
                    f"SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) "
                    f"FROM read_parquet('{path}')"
                )
        con.execute(f"CREATE VIEW {t} AS {sel}")
    return con


def duckdb_measure(sf_dir: str, names: list[str]) -> dict[str, float]:
    """min-of-2 DuckDB wall per named query (those with an oracle), after
    one untimed warm pass — the exact protocol of bench.py's timed phase.
    fetch_df (Arrow/pandas) mirrors bench.py's toPandas: both sides
    measure execution + native bulk materialization, not row-object
    conversion overhead."""
    from etl_pdf_pipepline_spark.registry import _REGISTRY, _ensure_loaded

    _ensure_loaded()
    con = duckdb_connect_views(sf_dir)
    per_query: dict[str, float] = {}
    for name in names:
        sql = _REGISTRY[name].oracle
        if sql is None:
            continue
        con.execute(sql).fetch_df()  # warm (page cache, catalog)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            con.execute(sql).fetch_df()
            best = min(best, time.time() - t0)
        per_query[name] = round(best, 3)
    con.close()
    return per_query


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    m = re.search(r"sf([0-9.]+)", sf_dir)
    from bench import HEADLINE

    per_query = duckdb_measure(sf_dir, HEADLINE)
    print(
        json.dumps(
            {
                "metric": "duckdb_headline_total",
                "value": round(sum(per_query.values()), 3),
                "unit": "sec",
                "queries": per_query,
                "sf": float(m.group(1)) if m else -1.0,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
