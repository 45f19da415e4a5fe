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
    """Exact integer representation of a fixed-point double column.

    floor(x*scale + 0.5), not round(): Spark's `round` on DoubleType drops
    out of codegen into per-row BigDecimal (measured 3.2s vs 0.9s for one
    sum over 6M rows at sf1 — it dominated TPC-H Q1). The money columns
    are fixed-point with ≤2 decimals, so x*scale is mathematically
    integral and only carries float noise (±1e-9): adding 0.5 and
    flooring rounds to that nearest integer for either sign, and the
    exact-.5 tie that would distinguish floor(+0.5) from HALF_UP cannot
    occur. Matches DuckDB's round() on the same doubles bit-for-bit.

    DOMAIN PRECONDITION (ADVICE r3): callers must pass columns whose
    values are fixed-point with at most log10(scale) decimals. For a
    value that genuinely lands on an exact k+0.5 after scaling (only
    possible with >2-decimal inputs at scale=100), floor(x+0.5) rounds
    toward +inf while DuckDB's round() rounds half away from zero — a
    NEGATIVE such value would diverge from every oracle. Verified for
    all current callers against the generated tables: lineitem/orders
    money columns and the events `value` column (adopted by
    streaming_hourly_rollup) are nonnegative 2-decimal fixed-point
    (max |x*100 − round(x*100)| observed 3.6e-12, no genuine third
    decimal anywhere, minimums ≥ 0). A future column with finer
    precision needs a larger `scale`, not this function unchanged."""
    col = F.col(c) if isinstance(c, str) else c
    return F.floor(col * scale + F.lit(0.5)).cast("bigint")
