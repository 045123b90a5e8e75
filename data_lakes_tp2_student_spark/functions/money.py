"""Exact decimal money arithmetic, portable across engines.

Why: Spark casts double→decimal via the double's SHORTEST string repr
(java BigDecimal(Double.toString)), DuckDB rounds the exact binary value —
per-row `CAST(a*b AS DECIMAL)` on double products therefore drifts by a cent
between engines. The raw money columns are exact cents (verified: every value
equals round(x, 2)), so casting the RAW columns to decimal is engine-agnostic,
and keeping all subsequent arithmetic in decimal is exact: sums become
associative and bit-identical under any partitioning/aggregation order —
which is also what makes these aggregates safe on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dec2(col: str | Column) -> Column:
    """Raw cents column as DECIMAL(18,2)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def disc_price(price: str = "l_extendedprice", discount: str = "l_discount") -> Column:
    """extendedprice * (1 - discount), exact to 4 decimals."""
    one_minus = (F.lit(1.0) - F.col(discount)).cast("decimal(18,2)")
    return (dec2(price) * one_minus).cast("decimal(18,4)")


def charge(
    price: str = "l_extendedprice",
    discount: str = "l_discount",
    tax: str = "l_tax",
) -> Column:
    """extendedprice * (1 - discount) * (1 + tax), exact to 6 decimals."""
    one_plus = (F.lit(1.0) + F.col(tax)).cast("decimal(18,2)")
    return (disc_price(price, discount) * one_plus).cast("decimal(18,6)")


# Matching DuckDB SQL fragments (keep in lockstep with the expressions above).
SQL_DISC_PRICE = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))"
)
SQL_CHARGE = (
    f"CAST({SQL_DISC_PRICE} * CAST(1 + l_tax AS DECIMAL(18,2)) AS DECIMAL(18,6))"
)
