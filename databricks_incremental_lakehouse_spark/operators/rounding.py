"""Engine-portable decimal rounding.

``ROUND`` on raw doubles is not portable: Spark rounds the double's shortest
decimal representation (HALF_UP on ``BigDecimal.valueOf``), DuckDB rounds the
binary value — values that land within one ulp of a half-cent boundary round
differently per engine. Routing the round through a fixed-scale decimal cast
(scale = digits + 4, wide enough to swallow double representation error,
narrow enough to land boundary values exactly on the grid) makes both
engines agree bit-for-bit:

    spark:  round(cast(x as decimal(38, n+4)), n)::double
    duckdb: CAST(ROUND(CAST(x AS DECIMAL(38, n+4)), n) AS DOUBLE)

Used for every rounded metric in silver/gold so the engine matches the
oracle exactly (reference formulas use plain ROUND, e.g.
refined_order_details.py:73-79 — the numeric results agree except on
representation-error boundary ties, where this definition is the portable
one).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_dbl(col: Column, n: int = 2) -> Column:
    """Deterministic cross-engine ROUND(x, n) for double columns."""
    scale = n + 4
    return F.round(col.cast(f"decimal(38,{scale})"), n).cast("double")


def round_dbl_sql(expr: str, n: int = 2) -> str:
    """DuckDB rendering of the same operation (for oracle SQL strings)."""
    scale = n + 4
    return f"CAST(ROUND(CAST({expr} AS DECIMAL(38,{scale})), {n}) AS DOUBLE)"
