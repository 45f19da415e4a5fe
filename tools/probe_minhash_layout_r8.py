"""r8 layout adjudication: is the sf100 `dedup_minhash_signatures`
wall regression (37.8 s r6-session -> ~60 s r8-session) the regenerated
1001-small-file documents layout, as SCALING.md hypothesised?

    python tools/probe_minhash_layout_r8.py [sf_dir] [reps] [files]

Method: one session, same code, two physical layouts of the SAME rows —
the dir's own documents.parquet (1001 x ~570 KB at sf100) vs a
compacted copy (default 32 files) reached through a symlink-farm sf dir
(every other table symlinked, documents replaced). MIN over reps,
alternating layouts so cache/GC debt is shared. Row counts asserted
equal so the comparison cannot silently diverge.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf100")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from etl_pdf_pipepline_spark.operators.dedup import dedup_minhash_signatures
    from etl_pdf_pipepline_spark.session import get_spark
    from etl_pdf_pipepline_spark.sources.catalog import TABLES

    spark = get_spark("probe-minhash-layout", data_dir=sf_dir)

    farm = "/tmp/probe_minhash_layout_sf"
    shutil.rmtree(farm, ignore_errors=True)
    os.makedirs(farm)
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if t != "documents" and os.path.exists(src):
            os.symlink(src, os.path.join(farm, f"{t}.parquet"))
    compact = os.path.join(farm, "documents.parquet")
    t0 = time.monotonic()
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).coalesce(
        n_files
    ).write.parquet(compact)
    print(f"compacted to {n_files} files in {time.monotonic()-t0:.1f}s", flush=True)

    best: dict[str, float] = {}
    counts: dict[str, int] = {}
    for cycle in range(reps):
        for tag, d in (("files1001", sf_dir), ("compacted", farm)):
            t0 = time.monotonic()
            # toPandas(), not count(): bench measures Arrow
            # materialization of the signature arrays, and count() would
            # let Catalyst prune the sig computation entirely.
            n = len(dedup_minhash_signatures(spark, d).toPandas())
            dt = time.monotonic() - t0
            counts[tag] = n
            best[tag] = min(best.get(tag, float("inf")), dt)
            print(f"cycle {cycle} {tag}: {dt:.2f}s ({n} rows)", flush=True)
    assert counts["files1001"] == counts["compacted"], counts
    best["layout_ratio"] = round(best["files1001"] / best["compacted"], 2)
    print(json.dumps({"sf_dir": sf_dir, "n_files_compact": n_files,
                      "best": {k: round(v, 3) for k, v in best.items()}}))


if __name__ == "__main__":
    main()
