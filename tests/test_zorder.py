"""Z-order layout mechanics (plans/zorder.py): the gate proves result
equality; these tests prove the CLUSTERING — that the layout's per-file
(ts, user_id) min/max boxes actually let a two-dimensional predicate
skip most files, which a one-dimensional (time-sorted) layout cannot do
on the second column — plus the Morton-code algebra itself."""

from __future__ import annotations

import datetime
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_pdf_pipepline_spark.plans.zorder import (
    Z_DAY_HI,
    Z_DAY_LO,
    morton_interleave,
    write_zorder_events,
)
from etl_pdf_pipepline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.01"
# Enough files that the box-counting has resolution: with 16 files a
# 10% time window selects 2-3 files in EITHER layout and the comparison
# can tie on range-sampling wobble (repartitionByRange bounds come from
# a sampled sketch whose seed varies with rdd id).
N_FILES = 64


def test_morton_interleave_algebra(spark):
    # z(a, b) interleaves a into odd bits, b into even bits
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (255, 0), (0, 255), (3, 5)], ["a", "b"]
    )
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", morton_interleave(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }

    def ref(a, b):
        z = 0
        for i in range(8):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    for (a, b), z in got.items():
        assert z == ref(a, b), (a, b)


def _file_boxes(path: str) -> list[tuple]:
    """Per data file: (t_min, t_max, u_min, u_max) from the parquet
    footers — exactly the stats Spark's scan skips on."""
    boxes = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        ts_i, u_i = schema_names.index("ts"), schema_names.index("user_id")
        t_lo = t_hi = u_lo = u_hi = None
        for rg in range(md.num_row_groups):
            ts_st = md.row_group(rg).column(ts_i).statistics
            u_st = md.row_group(rg).column(u_i).statistics
            t_lo = ts_st.min if t_lo is None else min(t_lo, ts_st.min)
            t_hi = ts_st.max if t_hi is None else max(t_hi, ts_st.max)
            u_lo = u_st.min if u_lo is None else min(u_lo, u_st.min)
            u_hi = u_st.max if u_hi is None else max(u_hi, u_st.max)
        boxes.append((t_lo, t_hi, u_lo, u_hi))
    return boxes


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    max_u = ev.agg(F.max("user_id")).collect()[0][0]
    u_hi = int(max_u * 0.1)
    # stats come back tz-aware (UTC micros); compare in UTC
    t_lo = datetime.datetime.fromisoformat(f"{Z_DAY_LO} 00:00:00+00:00")
    t_hi = datetime.datetime.fromisoformat(f"{Z_DAY_HI} 00:00:00+00:00")

    # the comparison layout: same file count, clustered on time only
    time_sorted = str(tmp_path / "time_sorted")
    (
        ev.repartitionByRange(N_FILES, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(time_sorted)
    )
    z_path = write_zorder_events(spark, SF, n_files=N_FILES)

    def counts(path):
        time_hit = both_hit = 0
        boxes = _file_boxes(path)
        for f_t_lo, f_t_hi, f_u_lo, _f_u_hi in boxes:
            if f_t_lo < t_hi and f_t_hi >= t_lo:
                time_hit += 1
                if f_u_lo <= u_hi:
                    both_hit += 1
        return time_hit, both_hit, len(boxes)

    z_time, z_both, z_total = counts(z_path)
    t_time, t_both, t_total = counts(time_sorted)
    assert z_total == t_total == N_FILES

    # time-only layout: every time-selected file spans the full user
    # range (64 files × ~150 uniform users: u_min is 0-ish everywhere),
    # so the user predicate skips NOTHING beyond what time skipped
    assert t_both == t_time, (t_both, t_time)
    # z-layout: the time-selected files partition the user range, so the
    # bottom-decile predicate eliminates most of them — user-dimension
    # stats are doing real work only the z-layout makes possible
    assert z_both < z_time, (z_both, z_time)
    assert z_both <= z_time // 2, f"user stats pruned only {z_time - z_both}/{z_time}"
    # and strictly fewer files read than the 1-D layout, absolute
    assert z_both < t_both, (z_both, t_both)

    # and the layouts hold identical data
    assert (
        spark.read.parquet(z_path).count()
        == spark.read.parquet(time_sorted).count()
        == ev.count()
    )
