"""r7 economics probe: the steady-state cost splits of the two new
index/lake maintenance ops, at a scale dir.

    python tools/probe_merge_r7.py [sf_dir]

1. CDC MERGE: lake build (once) vs partition-scoped merge (marginal) vs
   the naive alternative (full-lake rewrite carrying the CDC) — the
   number that justifies copy-on-write on a 100 TB lake.
2. FTS index: persist_index over the full corpus (rebuild) vs
   extend_index over the 5% delta (marginal) — the near-dup-band-index
   split (SCALING.md "incremental-index economics"), now for BM25.

Cross-ordered min-of-N is NOT used here on purpose: each phase mutates
state (build→merge must run in order), so each is timed in lifecycle
order over `reps` full cycles and the MIN per phase is reported;
cross-cycle ordering bias doesn't arise because every cycle pays the
same sequence.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf30"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from etl_pdf_pipepline_spark.plans.partitioned import (
        _merge_cdc_batch,
        merge_cdc_into_lake,
    )
    from etl_pdf_pipepline_spark.retrieval.bm25 import extend_index, persist_index
    from etl_pdf_pipepline_spark.session import get_spark
    from etl_pdf_pipepline_spark.sources.catalog import load_table

    spark = get_spark("probe-merge", data_dir=sf_dir)
    lake = "/tmp/probe_merge_lake"
    idx_full = "/tmp/probe_bm25_full"
    idx_incr = "/tmp/probe_bm25_incr_base"

    ev = load_table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    best: dict[str, float] = {}

    def mark(key: str, t0: float) -> None:
        dt = time.perf_counter() - t0
        best[key] = min(best.get(key, float("inf")), dt)
        print(f"  {key}: {dt:.2f}s")

    for rep in range(reps):
        print(f"cycle {rep + 1}/{reps}")
        t0 = time.perf_counter()
        (
            ev.repartition(F.col("event_date"))
            .write.partitionBy("event_date")
            .mode("overwrite")
            .parquet(lake)
        )
        mark("lake_build", t0)

        upserts, inserts, deletes = _merge_cdc_batch(ev)
        t0 = time.perf_counter()
        merge_cdc_into_lake(spark, lake, upserts, inserts, deletes)
        mark("merge_partition_scoped", t0)

        # naive alternative: rewrite the WHOLE lake with the CDC applied
        dead = upserts.select("event_id").unionByName(deletes.select("event_id")).distinct()
        merged_all = (
            spark.read.parquet(lake)
            .join(dead, "event_id", "left_anti")
            .unionByName(upserts.join(deletes.select("event_id"), "event_id", "left_anti"))
            .unionByName(inserts)
        )
        t0 = time.perf_counter()
        (
            merged_all.repartition(F.col("event_date"))
            .write.partitionBy("event_date")
            .mode("overwrite")
            .parquet(lake + "_fullrw")
        )
        mark("merge_full_rewrite", t0)

        docs = load_table(spark, sf_dir, "documents")
        base = docs.filter(F.col("doc_id") % 20 != 0)
        delta = docs.filter(F.col("doc_id") % 20 == 0)
        t0 = time.perf_counter()
        persist_index(docs, "doc_id", "text", idx_full)
        mark("bm25_full_rebuild", t0)
        persist_index(base, "doc_id", "text", idx_incr)
        t0 = time.perf_counter()
        extend_index(delta, "doc_id", "text", idx_incr)
        mark("bm25_extend_delta", t0)

    print("\nMIN per phase:")
    for k, v in best.items():
        print(f"  {k}: {v:.2f}s")
    print(
        f"\nmerge speedup vs full rewrite: {best['merge_full_rewrite'] / best['merge_partition_scoped']:.1f}x; "
        f"extend speedup vs rebuild: {best['bm25_full_rebuild'] / best['bm25_extend_delta']:.1f}x"
    )


if __name__ == "__main__":
    main()
