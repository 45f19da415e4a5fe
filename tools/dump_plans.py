"""Dump `.explain("formatted")` output for registry queries to files.

Usage:
    python tools/dump_plans.py [--prepare] <out_dir> <tag> [sf_dir] [name ...]

Writes <out_dir>/<query>_<tag>.txt for each named query (default: the
bench HEADLINE set). With --prepare, the bench's untimed prepare phase
(bucketed facts, BM25 postings, LSH band index, media manifest, z-order
layout, signature manifests) runs first so the layout-routed queries
plan their SERVED path — the same plan the bench times — instead of the
cold-session scan fallback. The committed plans/r13/*_{before,after}.txt
deliverables are produced with this tool, so every plan claim in
OPTIMIZATION_r13.md is reproducible from the same entry points the
driver uses (registry query functions, same session factory, same
sf dir).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from etl_pdf_pipepline_spark.registry import _REGISTRY, _ensure_loaded  # noqa: E402
from etl_pdf_pipepline_spark.session import get_spark  # noqa: E402


def main() -> int:
    argv = list(sys.argv[1:])
    prepare = "--prepare" in argv
    if prepare:
        argv.remove("--prepare")
    out_dir = argv[0]
    tag = argv[1]
    sf_dir = argv[2] if len(argv) > 2 else "/root/testdata/sf0.1"
    names = argv[3:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    _ensure_loaded()
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans", data_dir=sf_dir)
    if prepare:
        from etl_pdf_pipepline_spark.operators.dedup import (
            ensure_lsh_band_index,
            ensure_minhash_signatures,
            ensure_simhash_signatures,
        )
        from etl_pdf_pipepline_spark.operators.multimodal import ensure_media_manifest
        from etl_pdf_pipepline_spark.plans.bucketed import write_bucketed_facts
        from etl_pdf_pipepline_spark.plans.zorder import ensure_zorder_events
        from etl_pdf_pipepline_spark.retrieval.queries import ensure_bm25_index

        write_bucketed_facts(spark, sf_dir)
        ensure_lsh_band_index(spark, sf_dir)
        ensure_zorder_events(spark, sf_dir)
        ensure_media_manifest(spark, sf_dir)
        ensure_bm25_index(spark, sf_dir)
        ensure_minhash_signatures(spark, sf_dir)
        ensure_simhash_signatures(spark, sf_dir)
    for name in names:
        df = _REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
