"""Trained-IVF invariants: k-means determinism and probe recall vs brute
force (the approximation contract of ivf_probe_topk)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pdf_pipepline_spark.functions.vectors import as_double, cosine
from etl_pdf_pipepline_spark.operators.similarity import (
    IVF_K,
    ivf_probe_topk,
    kmeans_centroids,
)
from etl_pdf_pipepline_spark.sources.catalog import load_table

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_d(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    return emb.select("vec_id", as_double("embedding").alias("v"))


def test_kmeans_deterministic_and_complete(spark, emb_d):
    a = {r.centroid_id: r.cv for r in kmeans_centroids(emb_d).collect()}
    b = {r.centroid_id: r.cv for r in kmeans_centroids(emb_d).collect()}
    assert a == b  # fixed seed + fixed rounding => bit-identical reruns
    assert set(a) <= set(range(IVF_K))
    dims = {len(v) for v in a.values()}
    assert dims == {64}


def test_kmeans_centroids_move_from_seed(spark, emb_d):
    seeds = {
        r.vec_id: [float(x) for x in r.v]
        for r in emb_d.filter(F.col("vec_id") < IVF_K).collect()
    }
    trained = {r.centroid_id: [float(x) for x in r.cv] for r in kmeans_centroids(emb_d).collect()}
    # Lloyd means over many assigned vectors differ from any single seed
    assert any(trained[c] != seeds[c] for c in trained)


def test_ivf_probe_recall_at_10_vs_brute_force(spark, emb_d):
    q = emb_d.filter(F.col("vec_id") == 4).select(F.col("v").alias("qv"))
    brute = (
        emb_d.filter(F.col("vec_id") != 4)
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.round(cosine(F.col("v"), F.col("qv")), 4).alias("score"))
        .orderBy(F.desc("score"), "vec_id")
        .limit(10)
    )
    exact = {r.vec_id for r in brute.collect()}
    probed = {r.vec_id for r in ivf_probe_topk(spark, SF_SMALL).collect()}
    recall = len(exact & probed) / 10
    # nprobe=2 of 4 trained cells: the near-neighbors of q overwhelmingly
    # live in q's own (probed) cell; require a solid majority recovered.
    assert recall >= 0.6, f"recall@10 = {recall} ({sorted(exact & probed)})"


def test_ann_batch_topk_partition_pruning_is_exact(spark):
    """Batch ANN's per-partition semi-reduction must be invisible: the
    result over a many-partition corpus equals the brute-force window
    answer computed without any pruning."""
    from etl_pdf_pipepline_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    got = all_queries()["ann_batch_topk"](spark, sf).collect()
    assert got, "batch ANN returned nothing"
    # every query id present, ranks dense 1..k, scores non-increasing
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, rs in by_q.items():
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(r.vec_id >= 5 for r in rs)


def test_semantic_dedup_keepers_invariants(spark):
    """Keepers = one per component: every component's keeper is its own
    label, non-keepers point at a keeper, and the keeper count equals the
    distinct component count. Corpus coverage is total (every vec_id)."""
    from etl_pdf_pipepline_spark.operators.similarity import semantic_dedup_keepers
    from etl_pdf_pipepline_spark.sources.catalog import load_table

    rows = semantic_dedup_keepers(spark, "/root/testdata/sf0.001").collect()
    n_vecs = load_table(spark, "/root/testdata/sf0.001", "embeddings").count()
    assert len(rows) == n_vecs
    comps = {}
    for r in rows:
        comps.setdefault(r.component, []).append(r)
    keepers = [r for r in rows if r.is_keeper]
    assert len(keepers) == len(comps)
    for comp, members in comps.items():
        ks = [r for r in members if r.is_keeper]
        assert len(ks) == 1 and ks[0].vec_id == comp
        assert all(r.component == comp for r in members)


def test_int8_quantization_error_bound(spark):
    """Dequantized-cosine scores must track exact cosine within the int8
    quantization error envelope: |Δ| ≤ ~dim·(0.5/127)·2 in the worst
    case, and in practice ≪ 0.02 at dim 64. Also pins the scale law
    (max|code| == 127 for every non-zero vector)."""
    from etl_pdf_pipepline_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    qs = all_queries()
    exact = {r["vec_id"]: r["score"] for r in qs["ann_cosine_topk"](spark, sf).collect()}
    q8 = {r["vec_id"]: r["score"] for r in qs["ann_cosine_topk_int8"](spark, sf).collect()}
    assert len(q8) == 10
    shared = set(exact) & set(q8)
    assert shared, "top-10 sets diverged completely — quantization broken"
    for vid in shared:
        assert abs(exact[vid] - q8[vid]) < 0.02, (vid, exact[vid], q8[vid])

    # The gated query emits scalar digests (r13 — the driver canonicalizer
    # can't hash arrays); pin the raw codes via the shared projection it
    # digests, then check the digest itself agrees with a local md5.
    import hashlib

    from pyspark.sql import functions as F

    from etl_pdf_pipepline_spark.operators.similarity import _int8_code_table
    from etl_pdf_pipepline_spark.sources.catalog import load_table

    raw = _int8_code_table(load_table(spark, sf, "embeddings")).collect()
    assert len(raw) > 0
    by_id = {}
    for r in raw:
        m = max(abs(c) for c in r["q8"])
        assert m <= 127
        if r["scale"] > 0:
            assert m == 127, f"vec {r['vec_id']}: max|code| {m} != 127"
        by_id[r["vec_id"]] = r["q8"]

    digests = qs["embedding_quantize_int8"](spark, sf).collect()
    assert len(digests) == len(raw)
    for r in digests:
        joined = ",".join(str(c) for c in by_id[r["vec_id"]])
        assert r["q8_md5"] == hashlib.md5(joined.encode()).hexdigest()
        assert r["n_codes"] == len(by_id[r["vec_id"]])


def test_int8_recall_bound(spark):
    """The gate's scalar recall row (ann_recall_int8) must show the
    quantized store agreeing with exact float search on ≥8 of the top
    10 — the bound that makes 'int8 serving is recall-adequate' a
    falsifiable claim rather than a docstring."""
    from etl_pdf_pipepline_spark.registry import all_queries

    row = all_queries()["ann_recall_int8"](spark, "/root/testdata/sf0.001").first()
    assert row["overlap10"] >= 8, row["overlap10"]


def test_ivf_int8_layout_matches_parent_cells(spark):
    """Cell membership in the int8 layout is a copy of the float index's
    assignment — never re-derived. A drifted copy would silently break
    directory pruning (probe reads cell A, vector lives in cell B)."""
    from etl_pdf_pipepline_spark.operators.similarity import (
        ensure_ivf_index,
        ensure_ivf_int8,
    )

    sf = "/root/testdata/sf0.001"
    parent = ensure_ivf_index(spark, sf)
    path = ensure_ivf_int8(spark, sf)
    fl = {
        r["vec_id"]: r["centroid_id"]
        for r in spark.read.parquet(f"{parent}/vectors").select("vec_id", "centroid_id").collect()
    }
    q8 = {
        r["vec_id"]: r["centroid_id"]
        for r in spark.read.parquet(f"{path}/codes").select("vec_id", "centroid_id").collect()
    }
    assert fl == q8
