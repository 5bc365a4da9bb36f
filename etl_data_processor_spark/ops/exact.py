"""Exact, order-independent numeric aggregation helpers.

Double summation is order-dependent; on a cluster the reduction order varies
with partitioning, so ``SUM(double)`` is not reproducible bit-for-bit — and
differential testing against another engine (the DuckDB oracle) needs
bit-identical results. These helpers route money-style arithmetic through
DECIMAL, where + and * are exact and therefore order- and engine-independent,
then cast the final rounded result back to DOUBLE.

This is also the right call at 100 TB: decimal aggregation is codegen'd
JVM-side (no Python boundary) and makes results stable under AQE re-planning,
speculative execution, and partition-count changes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DECIMAL(18,4): products of two stay within 38 digits on BOTH engines
# (DuckDB silently promotes >38-width decimal products to DOUBLE, which would
# reintroduce order-dependence), and sums get +10 headroom digits — enough for
# 100-TB-scale money totals.
_DEC = "decimal(18,4)"


def dec(c: Column | str) -> Column:
    """Cast to the engine's exact money decimal."""
    return F.col(c).cast(_DEC) if isinstance(c, str) else c.cast(_DEC)


def dsum(c: Column | str, scale: int = 4) -> Column:
    """Order-independent SUM: exact decimal sum, rounded, emitted as double.

    Oracle-SQL equivalent: ``CAST(ROUND(SUM(CAST(x AS DECIMAL(18,4))), s) AS DOUBLE)``.
    """
    return F.round(F.sum(dec(c)), scale).cast("double")


def davg(c: Column | str, scale: int = 6) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, as double.

    The division happens on identical (exact) operands on both engines, so the
    double quotient is bit-identical too.
    """
    return F.round(F.sum(dec(c)).cast("double") / F.count(c), scale).cast("double")


def revenue(price: str = "l_extendedprice", discount: str = "l_discount") -> Column:
    """Exact TPC-H revenue term: price * (1 - discount) in decimal."""
    return dec(price) * (F.lit(1).cast(_DEC) - dec(discount))


# SQL-side fragments for oracle parity (kept next to the Spark forms so the
# two can't drift).
SQL_DEC = "DECIMAL(18,4)"


def sql_dsum(expr: str, scale: int = 4) -> str:
    return f"CAST(ROUND(SUM(CAST({expr} AS {SQL_DEC})), {scale}) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6) -> str:
    return (
        f"CAST(ROUND(CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE)"
        f" / COUNT({expr}), {scale}) AS DOUBLE)"
    )


def sql_revenue(price: str = "l_extendedprice", discount: str = "l_discount") -> str:
    return f"(CAST({price} AS {SQL_DEC}) * (CAST(1 AS {SQL_DEC}) - CAST({discount} AS {SQL_DEC})))"
