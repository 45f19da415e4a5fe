"""Dedup operator invariants (beyond-reference LLM-data ops)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pdf_pipepline_spark.operators.dedup import (
    N_MINHASH,
    minhash_signature,
    shingle_rows,
    word_shingles,
)


def test_word_shingles_width3(spark):
    df = spark.createDataFrame([("a b c d",)], ["t"])
    got = df.select(word_shingles("t").alias("s")).first()["s"]
    assert got == ["a b c", "b c d"]


def test_word_shingles_short_text_whole_string(spark):
    df = spark.createDataFrame([("only two",)], ["t"])
    assert df.select(word_shingles("t").alias("s")).first()["s"] == ["only two"]


def test_shingle_rows_matches_array_form(spark):
    df = spark.createDataFrame(
        [("d1", "a b c d e"), ("d2", "x y"), ("d3", "one two three")], ["id", "t"]
    )
    rows = shingle_rows(df, "id", "t").collect()
    got = {}
    for r in rows:
        got.setdefault(r["__id"], []).append(r.sh)
    arr = {
        r.id: r.s
        for r in df.select("id", word_shingles("t").alias("s")).collect()
    }
    for k in arr:
        assert sorted(got[k]) == sorted(arr[k])


def test_minhash_identical_texts_identical_signatures(spark):
    df = spark.createDataFrame(
        [("d1", "the quick brown fox jumps"), ("d2", "the quick brown fox jumps"),
         ("d3", "entirely different text body here")],
        ["id", "t"],
    )
    sig = {r.id: tuple(r[f"mh{i}"] for i in range(N_MINHASH)) for r in
           minhash_signature(df, "id", "t", N_MINHASH).collect()}
    assert sig["d1"] == sig["d2"]
    assert sig["d1"] != sig["d3"]


def test_minhash_similar_texts_share_components(spark):
    a = "w0 " + " ".join(f"w{i}" for i in range(1, 30))
    b = "x0 " + " ".join(f"w{i}" for i in range(1, 30))  # 1-token difference
    df = spark.createDataFrame([("a", a), ("b", b)], ["id", "t"])
    sig = {r.id: [r[f"mh{i}"] for i in range(N_MINHASH)] for r in
           minhash_signature(df, "id", "t", N_MINHASH).collect()}
    agree = sum(1 for x, y in zip(sig["a"], sig["b"]) if x == y)
    # Jaccard ≈ 27/31 ⇒ expect most components to agree
    assert agree >= N_MINHASH // 2


def test_jaccard_df_cap_drops_universal_stopword(spark):
    # Every doc contains "the"; only (d1, d2) share real vocabulary.
    # With max_df_frac=0.5 over 4 docs, "the" (DF=4 > 2) is dropped, so
    # docs that share ONLY the stopword must not pair at all.
    from etl_pdf_pipepline_spark.operators.dedup import token_jaccard_pairs

    df = spark.createDataFrame(
        [
            (1, "the apple banana cherry"),
            (2, "the apple banana damson"),
            (3, "the xylophone quartz"),
            (4, "the zephyr marble"),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in token_jaccard_pairs(df, "doc_id", "text", max_df_frac=0.5).collect()
    }
    assert set(pairs) == {(1, 2)}
    # capped vocab: {apple, banana, cherry} vs {apple, banana, damson}
    assert pairs[(1, 2)] == 0.5


def test_jaccard_without_cap_pairs_everything(spark):
    # Control: with the cap disabled (frac=1.0) the universal stopword
    # makes every doc pair — the quadratic blow-up the cap exists to stop.
    from etl_pdf_pipepline_spark.operators.dedup import token_jaccard_pairs

    df = spark.createDataFrame(
        [(i, f"the unique{i}") for i in range(1, 5)], ["doc_id", "text"]
    )
    n = token_jaccard_pairs(df, "doc_id", "text", max_df_frac=1.0).count()
    assert n == 6  # all C(4,2) pairs
    n_capped = token_jaccard_pairs(df, "doc_id", "text", max_df_frac=0.5).count()
    assert n_capped == 0
