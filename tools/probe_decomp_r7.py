"""r7 decomposition probe for the two >2x sf100 rows (VERDICT r6 ask #3):
media_frame_sample (2.8x) and doc_token_stats (2.26x). Stage-split each
plan into named variants, min-of-2 cross-ordered, same-session DuckDB.

    python tools/probe_decomp_r7.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_baseline import duckdb_connect_views


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf100"

    from pyspark.sql import functions as F

    from etl_pdf_pipepline_spark.operators.multimodal import (
        media_table,
        sample_frames,
    )
    from etl_pdf_pipepline_spark.operators.textstats import doc_token_stats
    from etl_pdf_pipepline_spark.registry import _REGISTRY, _ensure_loaded
    from etl_pdf_pipepline_spark.session import get_spark
    from etl_pdf_pipepline_spark.sources.catalog import load_table

    _ensure_loaded()
    spark = get_spark(data_dir=sf_dir)
    con = duckdb_connect_views(sf_dir)

    def frames_base(spark, sf_dir):
        media = media_table(spark, sf_dir).filter(F.col("media_type") == "video")
        return sample_frames(media, 4)

    variants = {
        # --- media_frame_sample stage split ---
        "mfs_full": lambda: _REGISTRY["media_frame_sample"].fn(spark, sf_dir),
        "mfs_nosort": lambda: frames_base(spark, sf_dir),
        "mfs_ckpt_sort": lambda: frames_base(spark, sf_dir)
        .localCheckpoint(eager=False)
        .orderBy("media_id", "frame_index"),
        "mfs_scan_floor": lambda: media_table(spark, sf_dir)
        .filter(F.col("media_type") == "video")
        .select(F.sum(F.octet_length("content")).alias("b")),
        # --- doc_token_stats stage split ---
        "dts_full": lambda: _REGISTRY["doc_token_stats"].fn(spark, sf_dir),
        "dts_nosort": lambda: _dts_nosort(spark, sf_dir),
        "dts_notfold": lambda: _dts_notfold(spark, sf_dir),
        "dts_scan_floor": lambda: load_table(spark, sf_dir, "documents").select(
            F.sum(F.length("text")).alias("c")
        ),
    }

    def _dts_nosort(spark, sf_dir):
        from etl_pdf_pipepline_spark.functions.text import tokens

        docs = load_table(spark, sf_dir, "documents")
        staged = docs.select("doc_id", tokens("text").alias("toks"))
        return staged.select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            F.size(F.array_distinct("toks")).alias("n_distinct"),
            F.aggregate("toks", F.lit(0), lambda a, t: a + F.length(t)).alias("nw"),
        )

    def _dts_notfold(spark, sf_dir):
        # fold replaced by a second regex pass over the raw text:
        # non-ws char count == length(text) - count of \s chars
        from etl_pdf_pipepline_spark.functions.text import tokens

        docs = load_table(spark, sf_dir, "documents")
        staged = docs.select(
            "doc_id",
            tokens("text").alias("toks"),
            (
                F.length("text")
                - F.length(F.regexp_replace("text", r"\S", ""))
            ).alias("nw"),
        )
        return staged.select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            F.size(F.array_distinct("toks")).alias("n_distinct"),
            "nw",
        )

    variants["dts_nosort"] = lambda: _dts_nosort(spark, sf_dir)
    variants["dts_notfold"] = lambda: _dts_notfold(spark, sf_dir)

    results: dict[str, float] = {}
    for name, build in variants.items():
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            n = len(build().toPandas())
            walls.append(time.perf_counter() - t0)
            assert n > 0
        results[name] = min(walls)
        print(f"VARIANT {name}: min={min(walls):.2f}s all={[round(w,2) for w in walls]}", flush=True)

    for qname in ("media_frame_sample", "doc_token_stats"):
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            n = len(con.execute(_REGISTRY[qname].oracle).fetch_df())
            walls.append(time.perf_counter() - t0)
            assert n > 0
        print(f"DUCKDB {qname}: min={min(walls):.2f}s all={[round(w,2) for w in walls]}", flush=True)


if __name__ == "__main__":
    main()
