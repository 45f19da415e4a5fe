"""Total ordering for SMALL results without a range exchange.

A terminal `.orderBy` plans Sort + Exchange(rangepartitioning), and the
range partitioner runs a separate reservoir-sampling job before the sort
— pure scheduling overhead when the thing being sorted is a handful of
aggregate rows (profiled r12: the sample job alone is ~60-90 ms at sf0.1,
on results of 4-25 rows). `ordered_small` keeps the exact total order but
plans it as coalesce(1) + sortWithinPartitions: no sampling job, no
exchange — the upstream (partial aggregation, joins) still runs fully
parallel, only the final already-tiny stage funnels to one task.

Use ONLY where the result is provably small (a group-by over a low-
cardinality key — ≤~100 groups — or a bounded probe). The coalesce(1)
merges the post-shuffle partitions, so the FINAL aggregate runs as one
task over every map partition's partial rows: at 25 groups that is
trivial at any scale, but at thousands of groups it single-threads real
work (events_hourly_rollup, ~3.4k groups, measured +43% at sf100 —
SCALING.md r12). For unbounded listings AND for multi-thousand-row
aggregates nobody consumes in order, the right move is no terminal sort
at all (events_hourly_rollup went sort-free in r13; see
tests/test_plan_shapes.py); for big sorted outputs a real range sort is
correct.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def ordered_small(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Totally-ordered single-partition result for a small DataFrame."""
    return df.coalesce(1).sortWithinPartitions(*cols)
