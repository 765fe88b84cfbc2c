"""Deterministic numeric aggregation helpers.

Floating-point sums are order-dependent, and Spark's parallel
aggregation order differs run-to-run and engine-to-engine.  For
oracle-checked queries we sum through a wide decimal — decimal
addition is exact and associative, so the result is bit-identical
regardless of partitioning — then cast back to double.  The
double→decimal rounding of each *input* value is deterministic and
identical across engines (one IEEE value → one decimal).

This costs a few % over native double sums but makes every aggregate
reproducible at any cluster size — worth it for a 100 TB pipeline
where "re-run produces a different hash" is a debugging nightmare.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 38 digits total; 6 fractional digits keeps ~1e-6 absolute precision
# while leaving 1e32 of headroom for 100 TB-scale sums.
DECIMAL_T = "decimal(38,6)"


def dsum(col: Column, alias: str) -> Column:
    """Order-independent sum of a double column via exact decimal."""
    return F.sum(col.cast(DECIMAL_T)).cast("double").alias(alias)


def dsum_expr(sql_expr: str, alias: str) -> Column:
    """Like :func:`dsum` but over a SQL expression (e.g. a product).

    The expression itself is evaluated in IEEE double (bit-exact on
    any engine); only the summation goes through decimal.
    """
    return F.sum(F.expr(sql_expr).cast(DECIMAL_T)).cast("double").alias(alias)


def davg(col: Column, alias: str) -> Column:
    """Order-independent mean: exact decimal sum / count, one double div."""
    return (
        F.sum(col.cast(DECIMAL_T)).cast("double") / F.count(F.lit(1))
    ).alias(alias)
