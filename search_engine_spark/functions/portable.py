"""Cross-engine float rounding.

Spark's ``round(x, 6)`` (java BigDecimal HALF_UP over the double's shortest
decimal form) and DuckDB's ``round`` (scale-multiply) can disagree when the
value sits exactly on a .5 tie at the 6th decimal — observed in the oracle
gate (0.520313 vs 0.520312 for the same bit-identical double). ``round6``
is the portable alternative: ``floor(x * 1e6 + 0.5) / 1e6`` — every step is
a correctly-rounded IEEE754 double op, so ANY engine that evaluates the
same expression produces the same bits. Ties round toward +inf in both.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 1e6


def round6(c: Column) -> Column:
    """Portable 6-decimal round as a Spark column (double)."""
    return F.floor(c * F.lit(SCALE) + F.lit(0.5)) / F.lit(SCALE)


def round6_sql(expr: str) -> str:
    """DuckDB/ANSI twin of :func:`round6`."""
    return f"(floor(({expr}) * 1000000.0::DOUBLE + 0.5::DOUBLE) / 1000000.0::DOUBLE)"


def round6_py(x: float) -> float:
    """Python twin (for oracles / driver-side checks)."""
    import math
    return math.floor(x * SCALE + 0.5) / SCALE
