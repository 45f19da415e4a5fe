"""Per-query wall decomposition for the sf0.1 floor accounting (r12).

Splits each headline query's steady-state wall into the three layers a
PySpark-classic (py4j) driver pays per query, none of which exist for the
in-process DuckDB baseline:

  build    constructing the DataFrame — py4j round-trips for every
           Column/reader call (JVM-parsed F.expr strings cut this; what
           remains is the reader/join/groupBy API surface itself)
  analyze  Catalyst analysis + optimization + physical planning + job
           scheduling of the FRESH plan (difference column — see below)
  exec     executing the already-analyzed plan object (re-collect of the
           same DataFrame; broadcast/shuffle results may be reused, so
           this is a LOWER bound on execution and `analyze` is the
           corresponding upper bound on planning)

Method: t_build = median time to construct the DataFrame; t_exec =
median re-collect of one constructed object; t_full = median fresh
construct+collect (bench convention); analyze = t_full - build - exec.
The sum of the three columns is t_full by construction — the point is
the SPLIT, which tells you whether a row's residual over DuckDB is
plan-shape (exec) or per-query driver floor (build+analyze).

Usage: python tools/profile_decomp.py [query ...]   # default: headline
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pdf_pipepline_spark.registry import all_queries
from etl_pdf_pipepline_spark.session import get_spark


def median(xs: list[float]) -> float:
    xs = sorted(xs)
    return xs[len(xs) // 2]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_decomp", data_dir=sf_dir)
    qs = all_queries()

    import bench

    names = sys.argv[1:] or bench.HEADLINE

    # Same prepare phase as bench.py so routed queries serve.
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

    for name in names:  # warm: codegen compile + file listings
        qs[name](spark, sf_dir).toPandas()

    print(f"{'query':32s} {'build':>7s} {'analyze':>8s} {'exec':>7s} {'full':>7s}")
    tot = {"build": 0.0, "analyze": 0.0, "exec": 0.0, "full": 0.0}
    rows = []
    for name in names:
        builds, execs, fulls = [], [], []
        for _ in range(3):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            builds.append(time.time() - t0)
        df.toPandas()  # analyze once so re-collects measure exec only
        for _ in range(3):
            t0 = time.time()
            df.toPandas()
            execs.append(time.time() - t0)
        for _ in range(3):
            t0 = time.time()
            qs[name](spark, sf_dir).toPandas()
            fulls.append(time.time() - t0)
        b, e, f = median(builds), median(execs), median(fulls)
        a = max(0.0, f - b - e)
        rows.append((name, b, a, e, f))
        tot["build"] += b
        tot["analyze"] += a
        tot["exec"] += e
        tot["full"] += f
        print(f"{name:32s} {b:7.3f} {a:8.3f} {e:7.3f} {f:7.3f}")
    print(
        f"{'TOTAL':32s} {tot['build']:7.3f} {tot['analyze']:8.3f} "
        f"{tot['exec']:7.3f} {tot['full']:7.3f}"
    )
    n = tot["full"] or 1.0
    print(
        f"\nshare: build {tot['build'] / n:.0%}  analyze {tot['analyze'] / n:.0%}  "
        f"exec {tot['exec'] / n:.0%}"
    )


if __name__ == "__main__":
    main()
