"""Portable (engine-deterministic) aggregate expressions.

The problem: Spark sums doubles in partial-aggregate arrival order,
which varies run to run; DuckDB sums in its own order. When a group's
true sum sits within one ulp of a 0.005 grid point (constant with
money-like 2-decimal inputs), round(sum(x), 2) flips between engines
— or between two runs of the same engine.

The fix: cast each addend to DECIMAL(18,6) before summing. Addends
here carry at most 6 true decimal digits (prices/quantities have 2;
price*(1±rate) products have ≤6), and the double error is ~1e-10 ≪
the 5e-7 decimal-rounding boundary, so the cast recovers the exact
value and decimal addition is associative → the sum is EXACT and
order-independent in both engines. Final round-half-up on an exact
decimal is identical in Spark (HALF_UP) and DuckDB (half away from
zero) for ties.

SQL mirror (use verbatim in oracles):
  dsum  → round(sum(CAST(x AS DECIMAL(18,6))), 2)::DOUBLE
  davg  → round(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / count(x), 2)
  nz    → (expr) + 0.0                     -- normalizes -0.0 to 0.0
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

DEC = "decimal(18,6)"


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col, scale: int = 2) -> Column:
    """Order-independent rounded sum of a money-like double column."""
    return F.round(F.sum(_c(col).cast(DEC)), scale).cast("double")


def davg(col, scale: int = 2) -> Column:
    """Order-independent rounded average: exact decimal sum / count."""
    c = _c(col)
    return F.round(F.sum(c.cast(DEC)).cast("double") / F.count(c), scale)


def dsum_window(col, window, scale: int = 2) -> Column:
    """dsum over a window frame."""
    return F.round(F.sum(_c(col).cast(DEC)).over(window), scale).cast("double")


def nz(col) -> Column:
    """Normalize IEEE negative zero to positive zero (repr-portable)."""
    return _c(col) + F.lit(0.0)


def round_nz(col, scale: int) -> Column:
    """round() that can never emit -0.0."""
    return F.round(_c(col), scale) + F.lit(0.0)
