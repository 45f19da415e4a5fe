"""r8 probe: adjudicate the sf30-only stragglers (VERDICT r7 ask #2) and
price the O(delta) index extensions (asks #4/#7).

Part A — stragglers: media_metadata / chunk_fixed_window / ann_cosine_topk
were 4.2x / 5.2x / 4.0x in the r7 sf30 sweep yet under bar (or winning) at
sf100. Hypothesis to test with numbers: DuckDB is relatively faster when
the working set fits memory — i.e. its wall grows SUPER-linearly
sf30→sf100 while Spark's grows ~linearly. Measure both engines at both
scales in ONE session.

Part B — index-extension economics at sf30 (the near-dup treatment):
  bm25:  full persist_index wall vs extend_index(5% delta) wall
  ivf:   full persist_ivf_index wall vs extend_ivf_index(5% delta) wall
Break-even = builds amortized over daily extends.

Usage: python tools/probe_sf30_r8.py [stragglers|economics] [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_pdf_pipepline_spark.registry import _REGISTRY, _ensure_loaded
from etl_pdf_pipepline_spark.session import get_spark

STRAGGLERS = ["media_metadata", "chunk_fixed_window", "ann_cosine_topk"]


def _min2(fn):
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def stragglers(sf_dirs):
    _ensure_loaded()
    from bench_baseline import duckdb_measure

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    for sf_dir in sf_dirs:
        spark = get_spark(f"probe_{os.path.basename(sf_dir)}", data_dir=sf_dir)
        for name in STRAGGLERS:
            q = _REGISTRY[name].fn
            q(spark, sf_dir).toPandas()  # warm
            wall = _min2(lambda: q(spark, sf_dir).toPandas())
            print(f"{sf_dir} spark {name}: {wall:.2f}s", flush=True)
        duck = duckdb_measure(sf_dir, STRAGGLERS)
        for name, wall in duck.items():
            print(f"{sf_dir} duck  {name}: {wall:.2f}s", flush=True)
        spark.stop()


def economics(sf_dir):
    from etl_pdf_pipepline_spark.operators.similarity import (
        extend_ivf_index,
        persist_ivf_index,
    )
    from etl_pdf_pipepline_spark.retrieval.bm25 import extend_index, persist_index
    from etl_pdf_pipepline_spark.sources.catalog import load_table

    spark = get_spark("probe_econ", data_dir=sf_dir)

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 20 != 0)
    delta = docs.filter(F.col("doc_id") % 20 == 0)
    path = "/tmp/probe_bm25_idx"
    t0 = time.time(); persist_index(base, "doc_id", "text", path)
    print(f"bm25 base build (95%): {time.time()-t0:.2f}s", flush=True)
    t0 = time.time(); extend_index(delta, "doc_id", "text", path)
    print(f"bm25 extend (5% delta): {time.time()-t0:.2f}s", flush=True)
    t0 = time.time(); persist_index(docs, "doc_id", "text", "/tmp/probe_bm25_full")
    print(f"bm25 full rebuild (100%): {time.time()-t0:.2f}s", flush=True)

    emb = load_table(spark, sf_dir, "embeddings")
    t0 = time.time()
    ivf_path = persist_ivf_index(
        spark, sf_dir, base_filter=F.col("vec_id") % 20 != 0
    )
    print(f"ivf base build (95%): {time.time()-t0:.2f}s", flush=True)
    d = emb.filter(F.col("vec_id") % 20 == 0)
    t0 = time.time(); extend_ivf_index(spark, d, ivf_path)
    print(f"ivf extend (5% delta): {time.time()-t0:.2f}s", flush=True)
    t0 = time.time(); persist_ivf_index(spark, sf_dir)
    print(f"ivf full rebuild (100%): {time.time()-t0:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "stragglers":
        stragglers(sys.argv[2:])
    else:
        economics(sys.argv[2])
