"""Cross-engine-stable rounding.

``round()`` implementations diverge between engines on exact half
boundaries (Spark: decimal HALF_UP via BigDecimal; DuckDB: double
arithmetic) — identical input doubles can round differently. For
oracle-checked outputs we express rounding as plain IEEE arithmetic,
``floor(x * 10^n + 0.5) / 10^n``, evaluated with the same operation
sequence on both engines: identical bits in, identical bits out.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_fixed(col: Column, n: int) -> Column:
    """Half-up fixed-point rounding as pure double arithmetic."""
    scale = F.lit(float(10**n))
    return F.floor(col * scale + F.lit(0.5)) / scale


def sql_round(expr: str, n: int) -> str:
    """The identical rounding for the DuckDB oracle."""
    scale = float(10**n)
    return f"floor(({expr}) * {scale!r} + 0.5) / {scale!r}"
