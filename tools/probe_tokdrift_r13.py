"""Chase the mapInArrow rep-tail drift on doc_token_stats (guide §1/§4).

Interleaves three variants of the token-stat computation, R rounds of
noop-sink reps each, in ONE session, printing every rep's wall so drift
(rep N slower than rep 1) is visible and attributable:

  arrow   — the shipped _token_stat_batches kernel
  arrowrl — same kernel + pa.default_memory_pool().release_unused() per
            batch (tests the allocator-growth hypothesis)
  jvm     — the pre-r13 JVM expression form (split + array_distinct +
            aggregate fold)

Usage: python tools/probe_tokdrift_r13.py [sf_dir] [rounds]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_pdf_pipepline_spark.functions.text import tokens  # noqa: E402
from etl_pdf_pipepline_spark.operators.textstats import (  # noqa: E402
    _token_stat_batches,
)
from etl_pdf_pipepline_spark.session import get_spark  # noqa: E402
from etl_pdf_pipepline_spark.sources.catalog import load_table  # noqa: E402


def _arrow_rl_batches(batches):
    import pyarrow as pa

    for out in _token_stat_batches(batches):
        yield out
        pa.default_memory_pool().release_unused()


def build(spark, sf_dir, variant):
    docs = load_table(spark, sf_dir, "documents")
    if variant == "jvm":
        staged = docs.select("doc_id", tokens("text").alias("toks"))
        stats = staged.select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            F.size(F.array_distinct("toks")).alias("n_distinct"),
            F.aggregate("toks", F.lit(0), lambda acc, t: acc + F.length(t)).alias("nonws"),
        )
    else:
        fn = _token_stat_batches if variant == "arrow" else _arrow_rl_batches
        stats = docs.select("doc_id", "text").mapInArrow(
            fn, "doc_id bigint, n_tokens int, n_distinct int, nonws int"
        )
    n_toks = F.greatest(F.col("n_tokens"), F.lit(1))
    return stats.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round(F.col("n_distinct").cast("double") / n_toks, 4).alias("ttr"),
        F.round(F.col("nonws") / n_toks, 4).alias("avg_word_len"),
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf30"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("probe-tokdrift", data_dir=sf_dir)
    variants = ["arrow", "arrowrl", "jvm"]
    walls: dict[str, list[float]] = {v: [] for v in variants}
    for r in range(rounds):
        for v in variants:
            spark.sparkContext.setJobDescription(f"tokdrift {v} round {r}")
            df = build(spark, sf_dir, v)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            walls[v].append(time.time() - t0)
    for v in variants:
        seq = " ".join(f"{w:6.2f}" for w in walls[v])
        print(f"{v:8s} reps: {seq}   min={min(walls[v]):.2f} max={max(walls[v]):.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
