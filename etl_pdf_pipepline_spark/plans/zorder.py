"""Z-order (Morton-curve) clustering for multi-dimensional pruning —
the third ingest-time layout beside bucketing (plans/bucketed.py) and
date partitioning (plans/partitioned.py).

The gap it closes: a date-partitioned events lake prunes time-range
predicates at directory level, but a query that ALSO bounds user_id
still reads every file of the selected days — min/max stats on user_id
are useless when each file contains the full user range. Sorting by
(ts, user_id) doesn't help either: the secondary column's stats are
only selective within one value of the primary. Z-ordering interleaves
the bits of both dimensions into one clustering key, so files laid out
by z-ranges are tight rectangles in (time × user) space and parquet
min/max stats become selective on BOTH columns at once — the same
technique as Delta's OPTIMIZE ZORDER BY and the classic UB-tree. No
extra read-path machinery is needed: Spark's scan already does
file/row-group skipping from pushed filters; the layout just makes the
stats tight.

Construction is pure JVM column algebra inside whole-stage codegen:
each dimension is scaled to an 8-bit cell index with `width_bucket`
(equal-width cells over the driver-fetched min/max — two 1-row
aggregates, the engine's query-parameter convention), and the 16-bit
Morton code is a constant-folded sum of masked shifts. The write is
`repartitionByRange(z)` + `sortWithinPartitions(z)` — one range
exchange at ingest, amortized over every 2-D query after it.

Scale posture (100 TB): the z-value is computed scan-side and never
shuffled except as the range key; file count derives from the input
size (same rule as bucket count); the curve order (8 bits/dim = 256
cells/dim) bounds the tail of each file's min/max box — deeper
interleaving sharpens boxes but shrinks runs of identical z (65536
cells is the standard depth for two dims). A real deployment z-orders
WITHIN each date partition (the maintenance pass compaction already
does); here the whole table is one z-space so the file-skipping effect
is measurable on both columns.

Reference seam: the reference has no analytic layouts at all (SQLite +
LanceDB row stores, /root/reference/src/load/); this module is part of
the beyond-reference lake layer SURVEY.md §2.11+ claims.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import cents as _cents
from ..functions.ordering import ordered_small
from ..registry import query
from ..sources.catalog import load_table, read_parquet_cached, table_scalar_cached

Z_BITS_PER_DIM = 8  # 256 cells per dimension, 16-bit Morton code

# Bumped when the physical layout recipe changes in a way serving depends
# on (r13: 8 MB row groups for within-file skipping + per-file stat boxes
# in meta); ensure_zorder_events rebuilds layouts committed under an older
# recipe even when the source signature still matches.
ZORDER_LAYOUT_REV = 2


def morton_interleave(a: Column, b: Column, bits: int = Z_BITS_PER_DIM) -> Column:
    """Bit-interleave two `bits`-wide non-negative int columns into one
    Morton code: z = ...a1 b1 a0 b0 (a-bits at the odd positions, so
    bit 0 is b0 and `a` carries the higher weight at every level —
    tests/test_zorder.py pins this algebra). Built as a
    literal sum of masked shifts — `bits` is a plan-time constant, so
    the whole expression stays inside codegen (no higher-order
    functions, the media_frame_sample lesson)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def _cell(col: Column, lo, hi, bits: int = Z_BITS_PER_DIM) -> Column:
    """Equal-width cell index 0..2^bits-1 of `col` over [lo, hi]."""
    n = 1 << bits
    # width_bucket returns 1..n inside the range, 0/n+1 outside; clamp
    # keeps boundary values (hi itself lands in n+1) in the last cell.
    return F.least(
        F.lit(n - 1),
        F.greatest(F.lit(0), F.width_bucket(col, F.lit(lo), F.lit(hi), F.lit(n)) - 1),
    ).cast("long")


def zorder_events_path(sf_dir: str) -> str:
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo_root, "spark-warehouse", f"events_zorder_{tag}")


def write_zorder_events(
    spark: SparkSession, sf_dir: str, n_files: int | None = None
) -> str:
    """Ingest-time z-ordered layout of events, clustered on (ts,
    user_id): scale both dimensions to 8-bit cells over their observed
    min/max (two 1-row driver fetches), range-partition + sort on the
    Morton code, write plain parquet. The z column itself is dropped —
    it exists to place rows; queries filter on the natural columns and
    parquet stats do the pruning."""
    from ..session import derive_shuffle_partitions

    ev = load_table(spark, sf_dir, "events")
    lo_hi = ev.agg(
        F.min(F.col("ts").cast("double")).alias("tlo"),
        F.max(F.col("ts").cast("double")).alias("thi"),
        F.min("user_id").alias("ulo"),
        F.max("user_id").alias("uhi"),
    ).collect()[0]
    z = morton_interleave(
        _cell(F.col("ts").cast("double"), lo_hi["tlo"], lo_hi["thi"]),
        _cell(F.col("user_id"), lo_hi["ulo"], lo_hi["uhi"]),
    )
    path = zorder_events_path(sf_dir)
    n = n_files or derive_shuffle_partitions(sf_dir)
    (
        ev.withColumn("z", z)
        .repartitionByRange(n, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        # r13 (guide §6): 8 MB row groups instead of the 128 MB default.
        # The layout's whole point is min/max skipping, and a ~27 MB part
        # file under the default is ONE row group — a pushed user_id/ts
        # predicate can skip the file or nothing; at 8 MB each file
        # carries ~4 stat boxes for within-file skipping. Measured
        # neutral on the user_id<10 probe at sf100 (that probe's win is
        # the FILE-level pruning below — interleaved A/B 0.55 → 0.29 s
        # scan-only); kept because finer boxes cannot lose and serve
        # predicates the file boxes are too coarse for. Cost: marginally
        # worse compression, more footer entries — far above the
        # many-tiny-pages regime.
        .option("parquet.block.size", str(8 * 1024 * 1024))
        .parquet(path)
    )
    from ..sources.catalog import table_stat_signature
    from ..sources.manifest import commit_meta

    commit_meta(
        path,
        {
            "source_signature": table_stat_signature(sf_dir, ("events",)),
            "n_files": n,
            "layout_rev": ZORDER_LAYOUT_REV,
            # Per-FILE (user_id, ts) min/max boxes, read once from the
            # just-written footers (r13, guide §6): Spark's scan prunes
            # ROW GROUPS from pushed filters, but it still schedules one
            # task per file and opens every footer — at 256 files that
            # ~4 ms/task floor IS the wall of a selective probe
            # (SCALING.md sf100 decomposition). With the boxes in the
            # layout's CAS meta, zorder_pruned_files() drops
            # non-overlapping FILES from the read before Spark lists
            # anything — manifest-style file skipping, same trick the
            # lake layer's snapshot bounds use. ts is stored as epoch
            # MICROS of the footer min/max.
            "file_stats": _collect_file_stats(path),
        },
    )
    return path


def _collect_file_stats(path: str) -> dict[str, dict[str, int]]:
    """{relname: {u_lo, u_hi, t_lo, t_hi}} from the parquet footers of
    every part file under `path` — one pyarrow metadata read per file,
    no data pages touched. ts bounds in epoch micros."""
    import pyarrow.parquet as pq

    out: dict[str, dict[str, int]] = {}
    for fn in sorted(os.listdir(path)):
        if not fn.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fn)).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if "user_id" not in names or "ts" not in names:
            continue
        u_lo = u_hi = t_lo = t_hi = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            us = g.column(names["user_id"]).statistics
            ts = g.column(names["ts"]).statistics
            if us is None or ts is None or not us.has_min_max or not ts.has_min_max:
                return {}  # stats missing anywhere: no file pruning
            u_lo = us.min if u_lo is None else min(u_lo, us.min)
            u_hi = us.max if u_hi is None else max(u_hi, us.max)
            t_min = _epoch_us(ts.min)
            t_max = _epoch_us(ts.max)
            t_lo = t_min if t_lo is None else min(t_lo, t_min)
            t_hi = t_max if t_hi is None else max(t_hi, t_max)
        if u_lo is None:
            return {}
        out[fn] = {"u_lo": int(u_lo), "u_hi": int(u_hi), "t_lo": t_lo, "t_hi": t_hi}
    return out


def _epoch_us(v) -> int:
    """Footer timestamp stat → epoch micros (pyarrow yields datetime for
    timestamp columns, int for int64-encoded clocks)."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        epoch = _dt.datetime(1970, 1, 1, tzinfo=v.tzinfo)
        return int((v - epoch).total_seconds() * 1_000_000)
    return int(v)


def zorder_pruned_files(
    sf_dir: str, user_hi_exclusive: int | None = None
) -> list[str] | None:
    """File names of the fresh z-layout overlapping `user_id <
    user_hi_exclusive`, from the CAS meta's per-file boxes — or None when
    the layout is stale/absent/statless (callers fall back to their scan
    path). Pruning only SHRINKS the read set; callers still apply the
    exact predicate, so results are unchanged by construction."""
    from ..sources.catalog import table_stat_signature
    from ..sources.manifest import read_meta

    path = zorder_events_path(sf_dir)
    meta = read_meta(path) or {}
    if meta.get("source_signature") != table_stat_signature(sf_dir, ("events",)):
        return None
    stats = meta.get("file_stats")
    if not stats:
        return None
    keep = [
        fn
        for fn, s in sorted(stats.items())
        if user_hi_exclusive is None or s["u_lo"] < user_hi_exclusive
    ]
    return [os.path.join(path, fn) for fn in keep]


def ensure_zorder_events(
    spark: SparkSession, sf_dir: str, n_files: int | None = None
) -> str:
    """Serve-or-build for the z-ordered layout: reuse when the
    CAS-committed freshness record (manifest commit_meta — the repo's
    one artifact protocol) matches the current events files and file
    count, rebuild otherwise — the same lifecycle every maintained
    artifact here has (bucketed facts, LSH bands, BM25/IVF indexes)."""
    from ..session import derive_shuffle_partitions
    from ..sources.catalog import table_stat_signature
    from ..sources.manifest import read_meta

    from ..sources.manifest import commit_meta

    path = zorder_events_path(sf_dir)
    n = n_files or derive_shuffle_partitions(sf_dir)
    meta = read_meta(path) or {}
    if (
        meta.get("source_signature") == table_stat_signature(sf_dir, ("events",))
        and meta.get("n_files") == n
        and meta.get("layout_rev") == ZORDER_LAYOUT_REV
    ):
        return path
    return write_zorder_events(spark, sf_dir, n_files=n)


# The 2-D predicate: a 3-day window AND the bottom decile of users.
# The user bound is relative (10% of max) so selectivity holds at every
# sf; both engines derive it with the same floor(max*0.1) arithmetic.
Z_DAY_LO = "2024-01-10"
Z_DAY_HI = "2024-01-13"

_ZORDER_ORACLE = f"""
    SELECT event_type, count(*) AS n,
           round(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS DOUBLE) / 100, 2)
               AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '{Z_DAY_LO} 00:00:00'
      AND ts <  TIMESTAMP '{Z_DAY_HI} 00:00:00'
      AND user_id <= (SELECT CAST(floor(max(user_id) * 0.1) AS BIGINT) FROM events)
    GROUP BY event_type ORDER BY event_type
    """


def _two_dim_slice(spark: SparkSession, sf_dir: str, path: str) -> DataFrame:
    """The 2-D rollup both gate rows share: 3-day time window AND
    bottom-decile users, answered from the layout at `path`."""
    ev = load_table(spark, sf_dir, "events")
    # Decile cut: a bounded scalar of the events table, memoized per
    # file-stat signature (r12) — recomputing max(user_id) was a whole
    # extra Spark job on every serve of this layout.
    max_u = table_scalar_cached(
        spark,
        sf_dir,
        "events",
        "max_user_id",
        lambda: ev.agg(F.max("user_id")).collect()[0][0],
    )
    u_hi = int(max_u * 0.1)
    z = read_parquet_cached(spark, path)
    return ordered_small(
        z.filter(
            (F.col("ts") >= F.lit(f"{Z_DAY_LO} 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit(f"{Z_DAY_HI} 00:00:00").cast("timestamp"))
            & (F.col("user_id") <= u_hi)
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(_cents("value")).cast("double") / 100, 2).alias("total_value"),
        ),
        "event_type",
    )


@query("events_zorder_pruned", oracle=_ZORDER_ORACLE)
def events_zorder_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the z-ordered layout, answer a two-dimensional slice (3-day
    time window AND bottom-decile users) from it. The oracle runs the
    identical predicate over the flat table, so a green row proves the
    z-order rewrite (cell scaling, Morton interleave, range partition,
    z drop) loses and changes nothing — this row intentionally re-proves
    build + read-back every run, like revenue_by_nation_bucketed. The
    pruning MECHANICS — that the layout's per-file (ts, user_id) min/max
    boxes let this predicate skip most files, while a time-only-sorted
    layout skips only on time — are asserted file-by-file from the
    parquet footers in tests/test_zorder.py, where two layouts can be
    compared."""
    path = write_zorder_events(spark, sf_dir)
    return _two_dim_slice(spark, sf_dir, path)


@query("events_zorder_served", oracle=_ZORDER_ORACLE)
def events_zorder_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STEADY-STATE face of the same query (the both-branches-gated
    pattern every serve-or-build artifact here follows): serve the 2-D
    slice from an existing z-layout, building only when the CAS
    freshness record is missing or stale (ensure_zorder_events). Same
    oracle as events_zorder_pruned, so both routing branches are proven
    every round; what differs is what a run PAYS — this row prices the
    recurring 2-D query against a maintained layout (file-skipping
    scan, no rewrite), which is the actual economics of z-ordering a
    lake: one range-exchange at ingest, amortized over every query."""
    path = ensure_zorder_events(spark, sf_dir)
    return _two_dim_slice(spark, sf_dir, path)
