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


# Streaming queries whose stream side is a STATELESS passthrough into
# foreachBatch / a file sink: the interesting plans are the per-batch
# BATCH plans, which are the same code paths as the named batch twins
# (audited above as ordinary registry rows). The stream side itself has
# no join, no aggregation, no state store — nothing to scale-audit.
_FOREACH_BATCH_TWINS = {
    "streaming_partitioned_ingest": "events_partition_pruned_day (same day-rollup read)",
    "streaming_versioned_ingest": "events_versioned_merge (append_commit path)",
    "streaming_cdc_dv_ingest": "events_merge_on_read (append_commit + delete_commit)",
    "streaming_near_dup_ingest": "near_dup_incremental (same admission plan per batch)",
    "streaming_rollup_maintenance": "events_rollup_incremental (refresh_rollup_view)",
}


def audit_streaming(plan: str) -> list[str]:
    """Scale red flags specific to streaming plan templates (VERDICT r11
    ask #4): unbounded-state shapes the batch audit can't see."""
    flags = []
    if "CartesianProduct" in plan:
        flags.append("stream-side CartesianProduct")
    # A stream-stream join must carry a watermark on BOTH inputs or its
    # buffers grow forever (Spark enforces this only for append mode).
    if "StreamingSymmetricHashJoin" in plan:
        n_wm = plan.count("EventTimeWatermark")
        if n_wm < 2:
            flags.append(f"stream-stream join with {n_wm} watermark(s)")
    # A windowed/event-time aggregation without a watermark never evicts
    # state. (Keyed running totals — FlatMapGroupsInPandasWithState with
    # update output — and whole-key dropDuplicates are bounded by key
    # cardinality instead; their docstrings carry the production
    # watermarked variants.)
    if "StateStoreSave" in plan and "window" in plan and "EventTimeWatermark" not in plan:
        flags.append("windowed agg without watermark")
    return flags


def lint_conf_mutations() -> list[str]:
    """Source lint (VERDICT r13 ask #6): no `spark.conf.set` inside query-
    path modules (operators/, plans/, retrieval/) — a query function
    mutating shared session conf as a routing side effect silently
    changes how CONCURRENT queries read (the r13 nanosAsLong case).
    Read-critical conf pinning lives in the load boundary
    (sources/catalog.pin_events_read_confs); scoped set/restore pairs in
    streaming/run_available_now are the one sanctioned exception and
    live outside the linted dirs."""
    import os as _os

    pkg = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "etl_pdf_pipepline_spark",
    )
    hits: list[str] = []
    for sub in ("operators", "plans", "retrieval"):
        d = _os.path.join(pkg, sub)
        for fn in sorted(_os.listdir(d)):
            if not fn.endswith(".py"):
                continue
            with open(_os.path.join(d, fn)) as fh:
                for i, line in enumerate(fh, 1):
                    if ".conf.set(" in line and not line.lstrip().startswith("#"):
                        hits.append(f"{sub}/{fn}:{i}: {line.strip()}")
    return hits


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    _ensure_loaded()

    conf_hits = lint_conf_mutations()
    if conf_hits:
        for h in conf_hits:
            print(f"FLAG conf-mutation in query path: {h}")
    from etl_pdf_pipepline_spark.session import parquet_bytes, partitions_for_bytes
    from etl_pdf_pipepline_spark.streaming.events import (
        STREAM_STAGES,
        _stream_state_partitions,
    )

    spark = get_spark("plan-audit")
    em = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    n_flagged = len(conf_hits)

    # State-store partition sizing: every drain passes
    # _stream_state_partitions, which must BE the shared floor-1 rule
    # (r13: floor 4 → 1, measured −14% on the sf0.1 drain).
    import os as _os

    want = partitions_for_bytes(
        parquet_bytes(_os.path.join(sf_dir, "events.parquet")), floor=1
    )
    got = _stream_state_partitions(sf_dir)
    if got != want:
        print(f"FLAG state-store partitions: {got} != shared rule {want}")
        n_flagged += 1
    else:
        print(f"ok   state-store partition rule ({got} at this sf)")

    for name, rq in sorted(_REGISTRY.items()):
        if only and name not in only:
            continue
        if name in STREAM_STAGES:
            try:
                stage = STREAM_STAGES[name](spark, sf_dir)
                plan = stage._jdf.queryExecution().explainString(em)
            except Exception as e:
                print(f"ERROR {name}: {e}")
                n_flagged += 1
                continue
            flags = audit_streaming(plan)
            if flags:
                n_flagged += 1
                print(f"FLAG {name}: {'; '.join(flags)}")
            else:
                print(f"ok   {name} (streaming stage)")
            continue
        if name in _FOREACH_BATCH_TWINS:
            print(f"ok   {name} (stateless stream side; batch plans = {_FOREACH_BATCH_TWINS[name]})")
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
