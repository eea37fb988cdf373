"""Cross-engine bit-stable rounding.

Engine-native ``round(double, n)`` implementations disagree on values
whose EXACT decimal expansion is a half at the target scale: Spark
routes through BigDecimal(double.toString) and sees the double's true
value (just below or above the half), while DuckDB scales by 10^n first
— a multiply that can land exactly ON the half and then rounds up. The
round-6 10× soak caught a real case: an hourly mean of exactly
43.4728125 (double 43.47281249999999630…) rounded to 43.472812 in Spark
and 43.472813 in DuckDB.

``stable_round`` sidesteps the engines entirely: FLOOR(x·10^n + 0.5) /
10^n is three primitive IEEE-754 operations, so any two engines fed the
SAME double produce the SAME double — the property the oracle contract
actually needs (cross-engine agreement, not a particular tie rule).
Callers must therefore feed it deterministic inputs (decimal-lane sums,
integer arithmetic, or previously-stabilized doubles); it cannot rescue
inputs that already differ between engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_round(col: Column, scale: int = 6) -> Column:
    """round-half-up(col, scale) as FLOOR(x·10^s + 0.5)/10^s — identical
    IEEE ops in every engine (Spark's floor(double) yields a long; the
    final division restores double)."""
    m = float(10**scale)
    return F.floor(col * F.lit(m) + F.lit(0.5)) / F.lit(m)


def stable_round_sql(expr: str, scale: int = 6) -> str:
    """The DuckDB twin of :func:`stable_round` (FLOOR yields double
    there; the value is an exact integer either way)."""
    m = 10**scale
    return f"(FLOOR(({expr}) * {m}.0 + 0.5) / {m}.0)"
