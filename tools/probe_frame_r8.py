"""r8 probe: media_frame_sample variants at scale (VERDICT r7 ask #3).

Variants:
  shipped  — checkpoint + global sort, sha256 digest (r7 form)
  nosort   — no checkpoint, no sort (set-valued result), sha256
  nosort_md5 — same, md5 digest (cheapest cross-engine digest)
DuckDB: oracle with and without ORDER BY (fairness: if the Spark side
drops the presentational sort, the oracle must too).

Usage: python tools/probe_frame_r8.py /root/repo/.scale/sf30
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

from etl_pdf_pipepline_spark.operators.multimodal import media_table, sample_frames
from etl_pdf_pipepline_spark.session import get_spark


def spark_variant(spark, sf_dir, sort, digest):
    media = media_table(spark, sf_dir).filter(F.col("media_type") == "video")
    frames = sample_frames(media, 4, digest=digest)
    if sort:
        frames = frames.localCheckpoint(eager=False).orderBy("media_id", "frame_index")
    return frames


ORACLE = """
    WITH v AS (
        SELECT doc_id AS media_id, text, octet_length(encode(text)) AS n
        FROM read_parquet('{sf}/documents.parquet{glob}')
        WHERE NOT (doc_id % 3 = 0) AND NOT (doc_id % 3 = 1)
    ),
    frames AS (
        SELECT media_id, i AS frame_index, (n * i) // 4 AS offset_bytes,
               {fn}(substring(text, ((n * i) // 4) + 1, 64)) AS frame_digest
        FROM v, generate_series(0, 3) AS t(i)
    )
    SELECT media_id, CAST(frame_index AS INT) AS frame_index,
           offset_bytes, frame_digest
    FROM frames {order}
"""


def main():
    sf_dir = sys.argv[1]
    spark = get_spark("probe_frame", data_dir=sf_dir)

    for name, sort, digest in [
        ("shipped_sha256_sorted", True, "sha256"),
        ("nosort_sha256", False, "sha256"),
        ("nosort_md5", False, "md5"),
    ]:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            spark_variant(spark, sf_dir, sort, digest).toPandas()
            best = min(best, time.time() - t0)
        print(f"spark {name}: {best:.2f}s", flush=True)

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    glob = (
        "/*.parquet"
        if os.path.isdir(os.path.join(sf_dir, "documents.parquet"))
        else ""
    )
    for name, fn, order in [
        ("duck_sha256_sorted", "sha256", "ORDER BY media_id, frame_index"),
        ("duck_sha256_nosort", "sha256", ""),
        ("duck_md5_nosort", "md5", ""),
    ]:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            con.sql(ORACLE.format(sf=sf_dir, fn=fn, order=order, glob=glob)).fetchdf()
            best = min(best, time.time() - t0)
        print(f"{name}: {best:.2f}s", flush=True)


if __name__ == "__main__":
    main()
