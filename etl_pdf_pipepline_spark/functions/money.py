"""Exact money arithmetic, shared by every query that aggregates currency.

Money columns in the test tables are 2-decimal doubles; summing doubles
directly drifts between engines (different summation order). The
convention — documented in plans/relational.py and mirrored in every
DuckDB oracle — is: convert to integer cents (`round(x*100)::bigint`),
aggregate exactly (whole-stage-codegen long sums, measured ~6× faster
than DECIMAL(18,4) accumulation), convert back to double and round only
at output. Overflow headroom: cents sums stay < 2^53 up to ~10^11 rows
per group; beyond that switch the accumulator to decimal.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(c: Column | str, scale: int = 100) -> Column:
    """Exact integer representation of a fixed-point double column."""
    col = F.col(c) if isinstance(c, str) else c
    return F.round(col * scale, 0).cast("bigint")
