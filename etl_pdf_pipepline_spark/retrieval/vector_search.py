"""Vector KNN search (reference Q1).

The reference calls LanceDB's ANN index
(/root/reference/src/load/lancedb_store.py:127-152). The Spark-native
baseline is an exact brute-force scored scan — embarrassingly parallel,
no shuffle except the final top-k (TakeOrderedAndProject) — with an
IVF-style bucketed variant (operators/similarity.py) as the scale path:
at 100 TB you never scan every vector per query; you prune to the nearest
centroid partitions first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine, query_vector_lit


def cosine_topk(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float] | Column,
    k: int,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Exact cosine top-k for one query vector against a vector table."""
    qv = query_vector_lit(query_vec) if isinstance(query_vec, list) else query_vec
    scored = vectors.select(
        F.col(id_col),
        *[F.col(c) for c in (extra_cols or [])],
        F.round(cosine(as_double(vec_col), qv), 4).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def cosine_topk_from_id(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    query_id: int,
    k: int,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Top-k where the query vector is a row of the same table (excluded
    from results). The one-row query side is broadcast — no shuffle."""
    qdf = (
        vectors.filter(F.col(id_col) == query_id)
        .select(as_double(vec_col).alias("__qv"))
    )
    scored = (
        vectors.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(qdf))
        .select(
            F.col(id_col),
            *[F.col(c) for c in (extra_cols or [])],
            F.round(cosine(as_double(vec_col), F.col("__qv")), 4).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
