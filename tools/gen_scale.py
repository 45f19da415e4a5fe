"""Generate a K×-scaled copy of a testdata sf dir for perf measurement
(NOT for the correctness gate — oracle constants like `doc_id < 80` pin
fixtures, and replicated text is near-duplicate by construction).

    python tools/gen_scale.py /root/testdata/sf0.1 .scale/sf1 10

Replication preserves join semantics: the fact cluster (customer, orders,
lineitem, events, documents, embeddings) gets per-replica key offsets so
FKs stay valid within each replica; shared dimensions (region, nation,
supplier, part) are copied once and referenced by every replica — the
same shape a 100 TB lake has (huge facts, stable dims). Document text
gets a per-replica suffix token so vocabulary/statistics shift slightly
instead of being 100% identical.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_pdf_pipepline_spark.session import get_spark

# table -> columns shifted by i * (max+1) per replica i
OFFSETS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation", "supplier", "part"]


def main() -> int:
    src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    spark = get_spark("gen-scale")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(out, exist_ok=True)

    for name in COPY:
        spark.read.parquet(f"{src}/{name}.parquet").write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        print(f"{name}: copied")

    for name, keys in OFFSETS.items():
        df = spark.read.parquet(f"{src}/{name}.parquet")
        strides = {c: df.agg(F.max(c)).first()[0] + 1 for c in keys}
        reps = []
        for i in range(k):
            rep = df
            for c in keys:
                rep = rep.withColumn(c, F.col(c) + F.lit(i * strides[c]))
            if name == "documents" and i > 0:
                rep = rep.withColumn("text", F.concat(F.col("text"), F.lit(f" r{i}")))
                rep = rep.withColumn("n_chars", F.length("text").cast("long"))
            reps.append(rep)
        outdf = reps[0]
        for rep in reps[1:]:
            outdf = outdf.unionByName(rep)
        outdf.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: x{k} -> {outdf.count()} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
