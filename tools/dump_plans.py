"""Dump `.explain("formatted")` output for registry queries to files.

Usage:
    python tools/dump_plans.py <out_dir> <tag> [sf_dir] [name ...]

Writes <out_dir>/<query>_<tag>.txt for each named query (default: the
bench HEADLINE set). The committed plans/r13/*_{before,after}.txt
deliverables are produced with this tool, so every plan claim in
OPTIMIZATION_r13.md is reproducible from the same entry points the
driver uses (registry query functions, same session factory, same
sf dir).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from etl_pdf_pipepline_spark.registry import _REGISTRY, _ensure_loaded  # noqa: E402
from etl_pdf_pipepline_spark.session import get_spark  # noqa: E402


def main() -> int:
    out_dir = sys.argv[1]
    tag = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    _ensure_loaded()
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans", data_dir=sf_dir)
    for name in names:
        df = _REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
