"""SparkSession factory.

The reference engine (`/root/reference/src/pipeline.py`) is a single-process
Python loop; our equivalent of its "process setup" is a SparkSession tuned
for the workload shape this engine produces:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast conversion replace the reference's hand-rolled
  physical tactics (SURVEY.md §4).
- UTC session timezone: all timestamps in the test tables are naive; pinning
  the zone keeps Spark and the DuckDB oracle byte-identical.
- Arrow enabled: every Python-side operator in this engine is a Pandas UDF /
  mapInPandas (never row-at-a-time), so Arrow transfer is the hot path.

At cluster scale the same builder is used; only master/shuffle-partition
settings come from the environment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Compressed input bytes one shuffle partition should be responsible for.
# 64 MB compressed ≈ 0.5 GB of decompressed hash-build state — the knee of
# the measured spill curve (SCALING.md knob matrix: revenue_by_nation sf100
# 119 s at 32 partitions / ~1 GB-task vs 48 s at 256 / ~0.12 GB-task).
_BYTES_PER_PARTITION = 64 * 1024 * 1024


def parquet_bytes(path: str) -> int:
    """Compressed parquet bytes under `path` (a directory walked
    recursively, or a single file) — the input-volume probe every
    derived-sizing knob shares."""
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    return total


def partitions_for_bytes(total: int, floor: int, cap: int = 2048) -> int:
    """The ONE sizing rule: one partition per _BYTES_PER_PARTITION of
    compressed input, rounded up to a power of two, clamped to
    [floor, cap]. Shared by the batch shuffle knob (floor 8 since r11,
    paired with the data-sized AQE toggle below — with AQE off at small
    volumes, 8 static partitions measured fastest and nothing
    re-coalesces 32 near-empty shuffles) and the streaming state-store
    knob (floor 4 — AQE can't coalesce stateful stages, so small corpora
    must not inherit the batch floor). Powers of two keep counts stable
    under small input-size jitter."""
    need = total // _BYTES_PER_PARTITION
    p = floor
    while p < need and p < cap:
        p *= 2
    return p


def derive_shuffle_partitions(data_dir: str) -> int:
    """Size `spark.sql.shuffle.partitions` from the data, not a constant.

    SCALING.md's sf100 matrix showed there is no single static value for a
    1000× data range: 32 is right for the sf0.1 gate but a 2.5×-measured
    spill wall at sf100, while AQE coalesce is NOT a substitute (its 64 MB
    advisory re-merges the big join's partitions back into spill
    territory — fanning out via initialPartitionNum LOST to plain static
    256). A cluster deployment scales the knob with executors×cores, i.e.
    with the compute that scales with the data; the local analogue is to
    scale it with the input: one footer-less directory walk sums the
    compressed parquet bytes, and partitions grow as the next power of two
    of bytes/64 MB, floored at 8 and capped at 2048. Powers of two keep
    partition counts stable under small data-size jitter. Measured
    mapping: sf0.1→8, sf10→32, sf30→128, sf100 (15 GB)→256 — identical to
    the r6 matrix's winning static value at every ≥sf10 point; the sub-
    512 MB regime dropped from the old floor of 32 to 8 together with the
    r11 AQE toggle below (derive_aqe_enabled): with AQE off, 8 static
    partitions measured fastest at sf0.1 and nothing re-coalesces 32
    near-empty shuffles."""
    return partitions_for_bytes(parquet_bytes(data_dir), floor=8)


# Compressed-input volume below which AQE costs more than it saves: with
# the floor of 8 partitions × _BYTES_PER_PARTITION, inputs under this fit
# the floor partition count in a single task wave.
_AQE_MIN_BYTES = 8 * _BYTES_PER_PARTITION


def derive_aqe_enabled(data_dir: str) -> bool:
    """Data-sized AQE toggle, the third knob of the one sizing rule.

    AQE re-plans at QueryStage boundaries, and each materialized stage is
    a separate driver job round-trip. At ≥sf30 that buys real wins
    (runtime coalesce, skew-join splitting — the sf100 matrix), but below
    ~512 MB compressed input every shuffle already fits the floor
    partition count in one task wave: there is no spill, skew, or
    mis-sized exchange for AQE to fix, and the round-trips dominate the
    wall (profiled sf0.1: 102 driver jobs across the 24-query headline,
    9 jobs for a single 80-doc Jaccard query). Measured A/B at sf0.1,
    same session, min-of-2 per query: AQE off + 8 static partitions
    improved EVERY headline query, whole-headline −30%. Static planning
    still broadcasts every small dim (parquet stats +
    autoBroadcastJoinThreshold), which is all the plan choice this
    volume needs.

    Scope (ADVICE r11): get_spark consults this toggle only when the
    shuffle-partition count is ALSO derived from the data — an explicit
    count (argument or env override) keeps AQE at Spark's default (on),
    since the "derived floor fits one task wave" premise no longer holds."""
    return parquet_bytes(data_dir) >= _AQE_MIN_BYTES


def _input_bytes(data_dir: str) -> int:
    return parquet_bytes(data_dir)


# derive_scan_conf: below this input volume, Spark's scan defaults stand
# (128 MB maxPartitionBytes / 4 MB openCostInBytes) — at gate/sf0.1 sizes
# every table fits in a handful of tasks either way and fewer tasks wins.
_SCAN_TUNE_MIN_BYTES = 2 * 1024**3

# Spark's stock values for the scan-split knobs derive_scan_conf tunes —
# what a reused session is reset to when the current data_dir is below
# the tuning threshold.
_SCAN_CONF_DEFAULTS = {
    "spark.sql.files.maxPartitionBytes": str(128 * 1024**2),
    "spark.sql.files.openCostInBytes": str(4 * 1024**2),
}


def derive_scan_conf(data_dir: str) -> dict[str, str]:
    """Size the SCAN-stage split knobs from the data, the input-side twin
    of derive_shuffle_partitions — shuffle sizing fixed the exchange
    stages but left `spark.sql.files.maxPartitionBytes` at its 128 MB
    default, and the r9 sf100 probe caught what that costs on a
    many-small-files table: documents (590 MB in 1001 files + 4 MB
    openCost padding each) packs into ~34 scan partitions, which on 32
    cores is a TWO-WAVE schedule whose second wave runs 2 tasks while 30
    cores idle — dedup_minhash_signatures measured 56.4 s vs 38.6 s
    (2.33× → 1.59× vs DuckDB) just by splitting the scan finer
    (tools/probe_scanpar, SCALING.md r9). The fix is the same shape as
    the shuffle knob: target ~3 balanced waves per large scan by setting
    maxPartitionBytes ≈ total_bytes / (3 × shuffle partitions), clamped
    to [16 MB, 128 MB], with openCostInBytes dropped to 1 MB so padding
    stops dominating real bytes on small-file layouts. On a cluster the
    same rule holds with executors×cores in the denominator. Below
    _SCAN_TUNE_MIN_BYTES the defaults stand (returns {}), so gate and
    sf0.1 behavior is byte-identical to before."""
    total = _input_bytes(data_dir)
    if total < _SCAN_TUNE_MIN_BYTES:
        return {}
    p = derive_shuffle_partitions(data_dir)
    mpb = max(16 * 1024**2, min(128 * 1024**2, total // (3 * p)))
    return {
        "spark.sql.files.maxPartitionBytes": str(mpb),
        "spark.sql.files.openCostInBytes": str(1024**2),
    }


def get_spark(
    app_name: str = "etl-pdf-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    data_dir: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config.

    Precedence for shuffle partitions: explicit argument >
    $SPARK_GRAFT_SHUFFLE_PARTITIONS > derived-from-`data_dir` size > 32."""
    # The AQE toggle is derived from data volume ONLY when the partition
    # count is too (ADVICE r11): its rationale is "the derived floor fits
    # one task wave, so AQE has nothing to fix" — a caller who pins a
    # partition count (argument or $SPARK_GRAFT_SHUFFLE_PARTITIONS) has
    # overridden that sizing, so they get Spark's default (AQE on) and
    # can pin spark.sql.adaptive.enabled via extra_conf if they want.
    partitions_pinned = (
        shuffle_partitions is not None
        or "SPARK_GRAFT_SHUFFLE_PARTITIONS" in os.environ
    )
    if shuffle_partitions is None:
        if "SPARK_GRAFT_SHUFFLE_PARTITIONS" in os.environ:
            shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS
        elif data_dir is not None:
            shuffle_partitions = derive_shuffle_partitions(data_dir)
    aqe_enabled = (
        derive_aqe_enabled(data_dir)
        if (data_dir is not None and not partitions_pinned)
        else True
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", str(aqe_enabled).lower())
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE re-coalesce the output partitioning of cached plans
        # (postings/doc-stats caches otherwise freeze at
        # spark.sql.shuffle.partitions tiny partitions; measured ~1.5×
        # whole-bench speedup at sf0.1, and at cluster scale it sizes
        # cached-index partitions to data volume instead of a static conf).
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        # Write timestamps as TIMESTAMP_MICROS, not the legacy INT96:
        # INT96 columns carry NO parquet min/max statistics, which
        # silently disables every timestamp row-group/file skip on
        # tables this engine writes (found by the z-order layout's
        # footer assertions, tests/test_zorder.py — a time-range
        # predicate could prune nothing on an INT96 ts). Micros is also
        # what Spark reads back natively and what DuckDB/Arrow expect.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # r13 (guide §1/§7 — measure the construction floor): PySpark 4's
        # DataFrame-debugging wrapper decorates EVERY DataFrame/Column API
        # call with call-site capture for JVM error context — one
        # getActiveSession + one conf.get + a PySparkCurrentOrigin
        # set/clear, i.e. ~4 extra py4j round-trips and a Python stack
        # walk per API call. Profiled at sf0.1: ~380 py4j round-trips to
        # BUILD q6_forecast_revenue, construction 202 ms of a 343 ms
        # wall; toggled off, builds drop 40-60% (q6 202→76 ms,
        # shipping_priority_top10 195→91 ms, media_frame_sample
        # 163→86 ms — min-of-5, OPTIMIZATION_r13.md). Cost: driver-side
        # error messages lose the Python call-site line; executed plans
        # are bit-identical (the wrapper never touches the expression
        # tree). Overridable via extra_conf.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{DEFAULT_CPUS}]")
    scan_conf = derive_scan_conf(data_dir) if data_dir is not None else {}
    for k, v in scan_conf.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Scan-split knobs are runtime SQL confs: apply them even when
    # getOrCreate returned a pre-existing session (builder confs are
    # silently ignored then), so a bench/probe that re-enters get_spark
    # with a data_dir still gets the derived scan sizing. Symmetrically,
    # when THIS data_dir is below _SCAN_TUNE_MIN_BYTES (scan_conf == {})
    # the knobs are reset to Spark's defaults — a reused session
    # otherwise keeps the previous large corpus's finer splits, which
    # contradicts derive_scan_conf's byte-identical-below-threshold
    # contract (ADVICE r9). extra_conf pins always win.
    if data_dir is not None:
        for k, dflt in _SCAN_CONF_DEFAULTS.items():
            pinned = (extra_conf or {}).get(k)
            # A pin must hold on a REUSED session too (builder confs are
            # ignored then), so apply it at runtime like the derivation.
            spark.conf.set(k, pinned if pinned is not None else scan_conf.get(k, dflt))
        # The AQE toggle and shuffle sizing are runtime confs like the
        # scan splits: a reused session re-entered with a different
        # data_dir must flip to THAT volume's regime (small corpus →
        # AQE off / floor partitions; large → AQE on / derived count).
        for k, v in (
            ("spark.sql.adaptive.enabled", str(aqe_enabled).lower()),
            (
                "spark.sql.shuffle.partitions",
                str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
            ),
        ):
            pinned = (extra_conf or {}).get(k)
            spark.conf.set(k, pinned if pinned is not None else v)
    else:
        for k, v in scan_conf.items():
            if (extra_conf or {}).get(k) is None:
                spark.conf.set(k, v)
    return spark
