"""Physical-plan audit: scan every registered query's plan for patterns
that would not survive a 100 TB scale-up.

Red flags:
- CartesianProduct           unbounded cross join (broadcast crossJoin of a
                             1-row/short side is fine and prints separately)
- global Sort without Limit  full-dataset sort not folded into TakeOrdered
- Scan reading all columns   projection pruning failed (heuristic: >12 cols)
- row-at-a-time PythonUDF    BatchEvalPython (non-Arrow) in the plan

Run: python tools/audit_plans.py [sf_dir] [name ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from etl_pdf_pipepline_spark.registry import _ensure_loaded, _REGISTRY  # noqa: E402
from etl_pdf_pipepline_spark.session import get_spark  # noqa: E402


def audit(plan: str) -> tuple[list[str], int]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CartesianProduct")
    if "BatchEvalPython" in plan:
        flags.append("row-at-a-time PythonUDF")
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        ncols = m.group(1).count(",") + 1 if m.group(1) else 0
        if ncols > 12:
            flags.append(f"wide scan ({ncols} cols — pruning?)")
    # Global sorts: formatted mode details each Sort as
    # "(n) Sort\nInput...\nArguments: [keys], <global:bool>, 0". Partition-
    # local sorts (window operators) have global=false and are fine. A
    # single trailing global Sort is the query's deterministic output
    # ordering (top-k/oracle display) — report as info, not a flag; more
    # than one global Sort means an intermediate full-data sort.
    n_global = len(re.findall(r"\(\d+\) Sort(?: \[codegen[^\]]*\])?\n(?:[^\n]*\n)*?Arguments: \[[^\n]*\], true,", plan))
    if n_global > 1:
        flags.append(f"{n_global} global Sorts (intermediate full sort?)")
    return flags, n_global


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    _ensure_loaded()
    spark = get_spark("plan-audit")
    em = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    n_flagged = 0
    for name, rq in sorted(_REGISTRY.items()):
        if only and name not in only:
            continue
        if name.startswith("streaming_"):
            print(f"  skip {name} (streaming plan)")
            continue
        try:
            df = rq.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(em)
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_flagged += 1
            continue
        flags, n_global = audit(plan)
        if flags:
            n_flagged += 1
            print(f"FLAG {name}: {'; '.join(flags)}")
        else:
            note = " (output-order sort)" if n_global == 1 else ""
            print(f"ok   {name}{note}")
    print(f"\n{n_flagged} flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
