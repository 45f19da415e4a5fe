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
    of bytes/64 MB, floored at 32 (sf≤10 keeps the gate-tuned default
    exactly) and capped at 2048. Powers of two keep partition counts
    stable under small data-size jitter. Measured mapping: sf0.1→32,
    sf10→32, sf30→128, sf100 (15 GB)→256 — reproducing the matrix's
    winning static value at every measured point without env vars."""
    total = 0
    for root, _dirs, files in os.walk(data_dir):
        for f in files:
            if f.endswith(".parquet"):
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
    need = total // _BYTES_PER_PARTITION
    p = 32
    while p < need and p < 2048:
        p *= 2
    return p


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
    if shuffle_partitions is None:
        if "SPARK_GRAFT_SHUFFLE_PARTITIONS" in os.environ:
            shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS
        elif data_dir is not None:
            shuffle_partitions = derive_shuffle_partitions(data_dir)
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
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
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{DEFAULT_CPUS}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
