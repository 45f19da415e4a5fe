"""Local stand-in for the driver's correctness gate.

Runs every registry query on Spark and its DuckDB oracle side by side at a
given sf dir, compares row count, column names, and order-insensitive
values (columns sorted by name, floats compared exactly after the queries'
own rounding). Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from etl_pdf_pipepline_spark.registry import (  # noqa: E402
    _REGISTRY,
    _ensure_loaded,
    nested_output_fields,
)
from etl_pdf_pipepline_spark.session import get_spark  # noqa: E402
from etl_pdf_pipepline_spark.sources.catalog import TABLES  # noqa: E402


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            if v == 0.0:
                return 0.0
            return v
        if isinstance(v, list):
            return tuple(norm_val(x) for x in v)
        return v

    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    _ensure_loaded()

    spark = get_spark("oracle-check")
    # Directory-aware views (r13): Spark-written scale copies store each
    # table as a DIRECTORY of part files (and events ts as int64 nanos);
    # bench_baseline.duckdb_connect_views handles both, and is exactly the
    # single-file view set on the driver's testdata — so the gate tool can
    # also verify routed/pruned branches that only fire on multi-file
    # corpora (e.g. raw_pruned_files) directly against DuckDB.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_baseline import duckdb_connect_views

    con = duckdb_connect_views(sf_dir)

    failures = []
    for name, rq in sorted(_REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = rq.fn(spark, sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        # Driver-strictness lint: the driver's canonicalizer cannot hash
        # nested values (r12 red row) — reject them here so the local gate
        # can never again be laxer than the hard signal.
        nested = nested_output_fields(sdf.schema)
        if nested:
            failures.append(name)
            print(f"FAIL {name}: nested output columns {nested} (driver-unhashable)")
            continue
        if rq.oracle is None:
            print(f"ok?  {name}: rows-only check, {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            o = con.sql(rq.oracle)
            o_cols = o.columns
            o_rows = o.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle error: {e}")
            continue
        if sorted(s_cols) != sorted(o_cols):
            failures.append(name)
            print(f"FAIL {name}: columns {sorted(s_cols)} != {sorted(o_cols)}")
            continue
        if len(s_rows) != len(o_rows):
            failures.append(name)
            print(f"FAIL {name}: rowcount {len(s_rows)} != {len(o_rows)}")
            continue
        ns, no = normalize(s_rows, list(s_cols)), normalize(o_rows, list(o_cols))
        if ns != no:
            failures.append(name)
            ndiff = sum(1 for a, b in zip(ns, no) if a != b)
            print(f"FAIL {name}: values differ in {ndiff}/{len(ns)} rows")
            for a, b in zip(ns, no):
                if a != b:
                    print(f"  spark:  {a}\n  oracle: {b}")
                    break
        else:
            print(f"PASS {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
