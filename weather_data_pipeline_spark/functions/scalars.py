"""Deterministic aggregation helpers.

Floating-point SUM/AVG are order-dependent — a distributed engine and a
single-threaded oracle will disagree in the low bits, and any hash-based
comparison (and any *re-run* of the same job on a cluster!) becomes flaky.
Policy (registry docstring):

- ``dsum``: cast each row to DECIMAL (exact, order-independent) then SUM.
  Per-row double→decimal rounding is unambiguous: binary doubles are never
  exact midpoints at decimal scale ≥ 1, so HALF_UP (Spark) and DuckDB's
  rounding agree on real data.
- ``davg``: exact decimal SUM, cast to double, divide by COUNT — one
  deterministic IEEE division, identical in every engine.

The same shapes are written in the DuckDB oracle SQL:
``SUM(CAST(x AS DECIMAL(p,s)))`` / ``CAST(SUM(...) AS DOUBLE)/COUNT(x)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})"))


def davg(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, precision, scale).cast("double") / F.count(c)


def dsum_out(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """``dsum`` rendered for the OUTPUT boundary: rounded DOUBLE.

    DECIMAL results with trailing-zero cents (``1234.00``) render
    differently across engines/serializers (``1234.0`` float-style vs
    ``1234.00``), so value-hash comparisons fail on representation even
    when values are equal. Accumulate exact decimal internally, but emit
    ``ROUND(CAST(sum AS DOUBLE), scale)`` — and write the identical shape
    in the oracle SQL: ``ROUND(CAST(SUM(CAST(x AS DECIMAL(p,s))) AS
    DOUBLE), s)``. The round is numerically a no-op (the decimal already
    has ≤ ``scale`` places); it exists purely to normalize representation
    identically on both sides.
    """
    return F.round(dsum(col, precision, scale).cast("double"), scale)


def dec_out(c: Column, scale: int = 2) -> Column:
    """Render an already-DECIMAL aggregate column as rounded DOUBLE (same
    output-boundary policy as ``dsum_out`` for composed expressions)."""
    return F.round(c.cast("double"), scale)
