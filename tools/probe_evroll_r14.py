"""r14 ask #4: can a packed single-long group key (or a pivot-style
conditional-agg rewrite) beat the (hour-int, event_type-string) hash-agg
keying that r13 named as events_hourly_rollup's floor (~1 us/row/core)?

Variants (noop-sink walls, interleaved min-of-N, guide 1.4):
  base    — the production plan: groupBy(hb, event_type) + cents sums
  packed  — groupBy(hb*8 + pmod(xxhash64(event_type), 8)) COUNT ONLY:
            an upper bound on what single-long keying could buy (not
            result-correct — hash collisions could merge types — so it
            is a BOUND probe, never a candidate plan)
  pivot   — groupBy(hb) with per-type conditional aggregates (type set
            from a distinct pre-pass, here inlined), then stack back to
            rows: one ~N_hours-group agg, 3x5 conditional exprs per row

Usage: python tools/probe_evroll_r14.py [sf_dir] [reps]
"""
import sys, time
sys.path.insert(0, ".")
from pyspark.sql import functions as F
from etl_pdf_pipepline_spark.session import get_spark
from etl_pdf_pipepline_spark.sources.catalog import load_table
from etl_pdf_pipepline_spark.functions.money import cents as _cents

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf30"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
spark = get_spark("probe-evroll14", data_dir=sf_dir)
ev = load_table(spark, sf_dir, "events")
TYPES = [r[0] for r in ev.select("event_type").distinct().collect()]
print("types:", sorted(TYPES))

def base():
    return (ev.groupBy(F.expr("unix_micros(ts) div 3600000000").alias("hb"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum(_cents("value")).cast("double")/100,2).alias("total_value"),
             F.round(F.sum(_cents("value")).cast("double")/100/F.count("*"),4).alias("avg_value")))

def packed():
    return (ev.groupBy((F.expr("unix_micros(ts) div 3600000000")*8
                        + F.pmod(F.xxhash64("event_type"), F.lit(8))).alias("k"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum(_cents("value")).cast("double")/100,2).alias("total_value")))

def pivot():
    aggs = []
    for i, t in enumerate(sorted(TYPES)):
        c = F.when(F.col("event_type")==t, 1).otherwise(0)
        v = F.when(F.col("event_type")==t, _cents("value")).otherwise(F.lit(0))
        aggs += [F.sum(c).alias(f"n_{i}"), F.sum(v).alias(f"s_{i}")]
    g = ev.groupBy(F.expr("unix_micros(ts) div 3600000000").alias("hb")).agg(*aggs)
    stack = ", ".join(f"'{t}', n_{i}, s_{i}" for i, t in enumerate(sorted(TYPES)))
    return (g.selectExpr("hb", f"stack({len(TYPES)}, {stack}) as (event_type, n_events, cents)")
        .filter("n_events > 0")
        .select("hb","event_type","n_events",
                F.round(F.col("cents").cast("double")/100,2).alias("total_value"),
                F.round(F.col("cents").cast("double")/100/F.col("n_events"),4).alias("avg_value")))

variants = [("base", base), ("packed", packed), ("pivot", pivot)]
for _, fn in variants:
    fn().write.format("noop").mode("overwrite").save()  # warm
res = {k: [] for k,_ in variants}
for r in range(reps):
    order = variants if r % 2 == 0 else variants[::-1]
    for label, fn in order:
        spark.sparkContext.setJobDescription(f"evroll14 {label} rep {r}")
        t0=time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        res[label].append(time.perf_counter()-t0)
for label, ws in res.items():
    print(f"{label}: walls={[round(x,3) for x in ws]} min={min(ws):.3f}")
# result identity check base vs pivot (rendered key + values)
import pandas as pd
a = base().toPandas().sort_values(["hb","event_type"]).reset_index(drop=True)
b = pivot().toPandas()[["hb","event_type","n_events","total_value","avg_value"]].sort_values(["hb","event_type"]).reset_index(drop=True)
b["n_events"] = b["n_events"].astype(a["n_events"].dtype)
print("base==pivot:", a.equals(b), "rows:", len(a))
