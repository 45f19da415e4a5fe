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


def get_spark(
    app_name: str = "etl-pdf-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
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
