"""Vector column expressions for embedding search (SURVEY.md §2.9 Q1).

All pure built-ins (`zip_with`/`aggregate`), evaluated JVM-side — the
brute-force scored scan is embarrassingly parallel and shuffle-free; the
only shuffle in a top-k query is the final TakeOrderedAndProject.

Arrays are cast to double before arithmetic so Spark and the DuckDB oracle
accumulate in the same precision (inputs are float32, exactly representable
in double → identical left-to-right sums).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def query_vector_lit(vec: list[float]) -> Column:
    """A literal query vector as an array<double> column."""
    return F.array(*[F.lit(float(x)) for x in vec])
