"""Approximate aggregates + skew-aware joins — 100 TB staples the
reference (a single-process pipeline) never needed.

Approximate ops can't be hash-compared across engines (HLL/t-digest
internals differ), so each query states an exactly-checkable CONTRACT
instead: it returns the exact value next to a boolean asserting the
approximation landed within tolerance. The oracle computes the exact
value and expects the boolean to be TRUE — if Spark's sketch ever drifts
out of tolerance, the driver's hash check fails loudly.

Salting: semantics-preserving by construction, so the salted plan is
oracle-checked against the plain join result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.catalog import load_table


@query(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS approx_within_5pct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts (approx_count_distinct, rsd=2%).
    At 100 TB this replaces the exact count-distinct's full shuffle of
    every (type, user) pair with fixed-size mergeable sketches. The
    query certifies |approx − exact| ≤ 5% of exact, alongside the exact
    value — both engines agree on the exact side, and the tolerance
    check pins the sketch."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("a"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("a") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("approx_within_5pct"),
        )
        .orderBy("event_type")
    )


@query(
    "approx_value_quantiles",
    oracle="""
    SELECT event_type,
           round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 1) AS p50_exact,
           TRUE AS approx_within_tol
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def approx_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate median via percentile_approx (Greenwald-Khanna,
    accuracy 10000) certified against the exact interpolated median:
    |approx − exact| within one rounding step of the value range. Exact
    percentiles need a full sort per group; the sketch is one pass and
    mergeable — the only way to do quantiles over 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 1).alias("p50_exact"),
            F.percentile_approx("value", 0.5, 10000).alias("a"),
        )
        .select(
            "event_type",
            "p50_exact",
            (F.abs(F.col("a") - F.col("p50_exact")) <= F.lit(1.0)).alias("approx_within_tol"),
        )
        .orderBy("event_type")
    )


SALT_BUCKETS = 8


def salted_join(skewed: DataFrame, dim: DataFrame, key: str, buckets: int = SALT_BUCKETS) -> DataFrame:
    """Skew-mitigating equi-join: fact rows get a random-ish (here
    deterministic hash-derived) salt in [0, buckets); the dim side is
    replicated ×buckets. The hot key's rows spread over `buckets`
    reducers instead of one straggler. AQE's skew-join split handles
    moderate skew automatically; explicit salting is the heavy-hammer
    variant for pathological keys, kept deterministic here so results
    are oracle-comparable."""
    salted_fact = skewed.withColumn("__salt", F.pmod(F.xxhash64(F.col(key), F.lit(42)), F.lit(buckets)))
    salts = skewed.sparkSession.range(buckets).select(F.col("id").cast("int").alias("__salt"))
    salted_dim = dim.crossJoin(F.broadcast(salts))
    return salted_fact.join(salted_dim, [key, "__salt"]).drop("__salt")


@query(
    "salted_skew_join",
    oracle="""
    WITH dim AS (
        SELECT user_id, count(*) AS lifetime_events
        FROM events GROUP BY user_id
    )
    SELECT e.event_type, count(*) AS n,
           CAST(sum(d.lifetime_events) AS BIGINT) AS total_weight
    FROM events e JOIN dim d ON e.user_id = d.user_id
    GROUP BY e.event_type ORDER BY e.event_type
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted join produces exactly the plain join's answer — which is
    what the oracle checks. Plan shape: fact shuffles on (key, salt), dim
    replicated ×8 via broadcast cross-join; no single reducer owns a hot
    key."""
    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(F.count("*").alias("lifetime_events"))
    joined = salted_join(ev.select("user_id", "event_type"), dim, "user_id")
    return (
        joined.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("lifetime_events").alias("total_weight"))
        .orderBy("event_type")
    )
