"""A/B probe: doc_token_stats JVM-expression form vs Arrow-kernel form.

Checks exact result equality first (sorted full compare), then interleaved
min-of-N noop walls (guide §1.4) so machine drift cancels.

Usage: python tools/probe_tokstats.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_pdf_pipepline_spark.functions.text import tokens  # noqa: E402
from etl_pdf_pipepline_spark.operators.textstats import (  # noqa: E402
    _token_stat_counts,
)
from etl_pdf_pipepline_spark.session import get_spark  # noqa: E402
from etl_pdf_pipepline_spark.sources.catalog import load_table  # noqa: E402


def jvm_form(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select("doc_id", tokens("text").alias("toks"))
    return staged.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.aggregate("toks", F.lit(0), lambda acc, t: acc + F.length(t)).alias("nonws"),
    )


def arrow_form(spark, sf_dir):
    return _token_stat_counts(load_table(spark, sf_dir, "documents"))


def finalize(stats):
    n_toks = F.greatest(F.col("n_tokens"), F.lit(1))
    return stats.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round(F.col("n_distinct").cast("double") / n_toks, 4).alias("ttr"),
        F.round(F.col("nonws") / n_toks, 4).alias("avg_word_len"),
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("probe-tokstats", data_dir=sf_dir)

    a = finalize(jvm_form(spark, sf_dir)).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = finalize(arrow_form(spark, sf_dir)).toPandas().sort_values("doc_id").reset_index(drop=True)
    if not a.equals(b):
        diff = (a != b) & ~(a.isna() & b.isna())
        bad = diff.any(axis=1)
        print("MISMATCH rows:", int(bad.sum()))
        print(a[bad].head(10))
        print(b[bad].head(10))
        return 1
    print(f"equality OK ({len(a)} rows, dtypes match={list(a.dtypes) == list(b.dtypes)})")

    walls = {"jvm": float("inf"), "arrow": float("inf")}
    builders = {"jvm": jvm_form, "arrow": arrow_form}
    for name, fn in builders.items():  # warm codegen / worker pools
        finalize(fn(spark, sf_dir)).write.format("noop").mode("overwrite").save()
    for _ in range(reps):
        for name, fn in builders.items():
            spark.sparkContext.setJobDescription(f"tokstats:{name}")
            t0 = time.time()
            finalize(fn(spark, sf_dir)).write.format("noop").mode("overwrite").save()
            walls[name] = min(walls[name], time.time() - t0)
    for name, w in walls.items():
        print(f"{name:6s} {w:.3f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
