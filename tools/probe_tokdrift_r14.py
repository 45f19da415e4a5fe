"""r14 ask #8: bound the doc_token_stats mapInArrow rep-tail drift
(2.5 -> 5.4 s over 6 hot reps at sf30 in r13 — Python-worker memory/GC).

Sequential blocks of N reps per variant in ONE session (drift is a
within-variant, across-rep phenomenon — interleaving would smear it):

  base     — shipped kernel
  kernelgc — kernel wrapped with gc.collect() + release_unused() after
             each batch
  batch4k  — spark.sql.execution.arrow.maxRecordsPerBatch=4096 (smaller
             batches, smaller allocator high-water mark)

Separately (fresh process, static conf): SPARK_WORKER_REUSE=0 runs the
same base block with spark.python.worker.reuse=false — fresh Python
worker per task, no cross-task allocator growth by construction.

Usage: python tools/probe_tokdrift_r14.py [sf_dir] [reps]
"""
import os, sys, time
sys.path.insert(0, ".")
from etl_pdf_pipepline_spark.operators.textstats import _token_stat_batches
from etl_pdf_pipepline_spark.session import get_spark
from etl_pdf_pipepline_spark.sources.catalog import load_table
from pyspark.sql import functions as F

def _gc_batches(batches):
    import gc
    import pyarrow as pa
    for out in _token_stat_batches(batches):
        yield out
        gc.collect()
        pa.default_memory_pool().release_unused()

def build(spark, sf_dir, fn):
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.select("doc_id", "text").mapInArrow(
        fn, "doc_id bigint, n_tokens int, n_distinct int, nonws int")
    n_toks = F.greatest(F.col("n_tokens"), F.lit(1))
    return stats.select("doc_id", "n_tokens", "n_distinct",
        F.round(F.col("n_distinct").cast("double")/n_toks, 4).alias("ttr"),
        F.round(F.col("nonws")/n_toks, 4).alias("avg_word_len"))

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf30"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    reuse_off = os.environ.get("SPARK_WORKER_REUSE") == "0"
    extra = {"spark.python.worker.reuse": "false"} if reuse_off else None
    spark = get_spark("probe-tokdrift14", data_dir=sf_dir, extra_conf=extra)
    variants = [("reuse-off-base" if reuse_off else "base", _token_stat_batches, None)]
    if not reuse_off:
        variants += [("kernelgc", _gc_batches, None), ("batch4k", _token_stat_batches, "4096")]
    for label, fn, batch in variants:
        prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        if batch: spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", batch)
        walls = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"tokdrift14 {label} rep {r}")
            df = build(spark, sf_dir, fn)
            t0 = time.time(); df.write.format("noop").mode("overwrite").save()
            walls.append(time.time()-t0)
        if batch: spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
        seq = " ".join(f"{w:6.2f}" for w in walls)
        print(f"{label:14s} reps: {seq}  min={min(walls):.2f} max={max(walls):.2f} drift={max(walls)/min(walls):.2f}x")
    return 0

if __name__ == "__main__":
    raise SystemExit(main())
