"""Shared expression helpers enforcing the DuckDB-parity policy.

Policy (SURVEY.md §4.3, verified): sums of doubles go through
DECIMAL(38,10) so partial/final aggregation order cannot perturb the
result (decimal addition is exact + associative → bit-identical to the
oracle); averages/moments stay double but are rounded to 4 decimals on
both sides (drift ≪ rounding resolution at fixture magnitudes).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "DECIMAL(38,10)"


def dec_sum(expr: str, alias: str) -> Column:
    """Exact (order-insensitive) sum of a double expression."""
    return F.expr(f"SUM(CAST(({expr}) AS {DEC}))").alias(alias)


def round4(expr: str, alias: str) -> Column:
    return F.expr(f"ROUND(({expr}), 4)").alias(alias)


def oracle_dec_sum(expr: str, alias: str) -> str:
    """DuckDB twin of :func:`dec_sum` (identical semantics)."""
    return f"SUM(CAST(({expr}) AS {DEC})) AS {alias}"
