"""Generate a K×-scaled copy of a testdata sf dir for perf measurement
(NOT for the correctness gate — oracle constants like `doc_id < 80` pin
fixtures, and replicated text is near-duplicate by construction).

    python tools/gen_scale.py /root/testdata/sf0.1 .scale/sf1 10
    python tools/gen_scale.py /root/testdata/sf0.1 .scale/sf30z 300 zipf

Replication preserves join semantics: the fact cluster (customer, orders,
lineitem, events, documents, embeddings) gets per-replica key offsets so
FKs stay valid within each replica; shared dimensions (region, nation,
supplier, part) are copied once and referenced by every replica — the
same shape a 100 TB lake has (huge facts, stable dims). Document text
gets a per-replica suffix token so vocabulary/statistics shift slightly
instead of being 100% identical.

`zipf` (VERDICT r4 ask #7): uniform replication proves nothing about
skew handling — every join key keeps the base corpus's flat frequency.
With the flag, the two fact join keys the skew-sensitive queries shuffle
on (lineitem.l_orderkey, events.user_id) get a zipf-like head grafted
on: 8/4/2/1 percent of ALL rows are deterministically remapped
(xxhash64 bucket, seed 42) onto the 4 smallest existing key values, so
~15% of the fact mass lands on 4 global hot keys while the remaining
85% stays uniform. Key validity holds (the hot keys exist on the
dimension side — they come from the base table), query RESULTS change
(this is perf data, never gate data), and the hot reducer a 1000-node
cluster fears is reproduced locally: at ×300, one orderkey owns ~14M
lineitem rows.
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

# table -> join key that receives the zipf head under the `zipf` flag
ZIPF_COLS = {"lineitem": "l_orderkey", "events": "user_id"}
# cumulative permille buckets -> hot-key rank: 8%, 4%, 2%, 1%
ZIPF_BUCKETS = [(80, 0), (120, 1), (140, 2), (150, 3)]


def _fresh_unit_vector(key_col: str, dim: int):
    """A fresh unit vector as a column expression, deterministic in the
    (replica-offset) key: per dimension j, two xxhash64-derived uniforms
    feed Box-Muller; the gaussian array is then L2-normalized. Matches
    the base corpus's measured distribution (isotropic unit, dim-wise
    std ≈ 1/√dim)."""

    def u(j, salt):
        h = F.pmod(F.xxhash64(F.col(key_col), j, F.lit(salt)), F.lit(1 << 30))
        return (h.cast("double") + 0.5) / float(1 << 30)

    import math

    gauss = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.sqrt(-2.0 * F.log(u(j, 1))) * F.cos(2.0 * math.pi * u(j, 2)),
    )
    nrm = F.sqrt(F.aggregate(gauss, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.transform(gauss, lambda x: (x / nrm).cast("float"))


def zipf_remap(df, col, hot_keys):
    b = F.pmod(F.xxhash64(F.col(col), F.lit(42)), F.lit(1000))
    expr = None
    for cutoff, rank in ZIPF_BUCKETS:
        case = F.when(b < cutoff, F.lit(hot_keys[rank]))
        expr = case if expr is None else expr.when(b < cutoff, F.lit(hot_keys[rank]))
    return df.withColumn(col, expr.otherwise(F.col(col)))


def main() -> int:
    src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    extra = sys.argv[4:]
    zipf = "zipf" in extra
    # only=<table>[,<table>…]: regenerate a subset into an existing out
    # dir (e.g. `only=embeddings` after the r6 fresh-vector change,
    # without rewriting a 15 GB lineitem).
    only = None
    for a in extra:
        if a.startswith("only="):
            only = set(a[5:].split(","))
    spark = get_spark("gen-scale")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(out, exist_ok=True)

    for name in COPY:
        if only and name not in only:
            continue
        spark.read.parquet(f"{src}/{name}.parquet").write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
        print(f"{name}: copied")

    for name, keys in OFFSETS.items():
        if only and name not in only:
            continue
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
            if name == "embeddings" and i > 0:
                # FRESH vectors per replica (VERDICT r5 ask #7), not
                # jittered copies: replicas of the same base vector are
                # genuine near-dups, so K× replication makes every
                # pair/closure query's TRUE output quadratic in K — the
                # r5 jitter kept them near-dup (cosine 0.999+) and the
                # sweep filled a spill disk discovering it. The base
                # corpus is isotropic unit vectors (measured: norms
                # 1.0±4e-8, intra-label cosine 0.009 ≈ inter-label
                # -0.004 — no cluster structure), so the faithful scale
                # distribution is fresh isotropic draws: Box-Muller over
                # xxhash64-derived uniforms keyed by the ALREADY-OFFSET
                # vec_id (deterministic, no Date/rand), then normalize.
                rep = rep.withColumn("embedding", _fresh_unit_vector("vec_id", 64))
            reps.append(rep)
        outdf = reps[0]
        for rep in reps[1:]:
            outdf = outdf.unionByName(rep)
        if zipf and name in ZIPF_COLS:
            c = ZIPF_COLS[name]
            hot = [r[0] for r in df.select(c).distinct().orderBy(c).limit(4).collect()]
            outdf = zipf_remap(outdf, c, hot)
            print(f"{name}: zipf head on {c} -> hot keys {hot}")
        outdf.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: x{k} -> {outdf.count()} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
