"""Derived ``partsupp`` table (round 8, VERDICT r7 item 4).

The driver schema ships no ``partsupp``, which forced q2/q9/q11/q16/q20
into shape-preserving adaptations. This module derives a DETERMINISTIC
partsupp from the tables that do exist — a pure integer function of
``part`` keys and the supplier count, written identically in Spark and in
the DuckDB oracle, so both engines materialize the exact same rows and
the five real correlated-subquery shapes become hash-checkable:

- 4 suppliers per part (the TPC-H partsupp cardinality):
  ``ps_suppkey = (p_partkey*4 + i) % S`` for i in 0..3 — distinct for any
  S ≥ 4, uniform supplier load (every supplier serves P*4/S parts), and
  0-based to match the driver's 0-based keys.
- ``ps_availqty = (p_partkey*7 + i*131) % 9999 + 1`` (1..9999, the
  dbgen range).
- ``ps_supplycost_cents = (p_partkey*13 + i*97) % 99900 + 100`` — money
  kept in INTEGER CENTS ($1.00..$999.99) so every aggregate over it
  (sums, mins, products with integral quantities) is exact BIGINT
  arithmetic on both engines; divide by 100.0 only at the output edge.

Scale note: partsupp is part-dimension-sized (4 rows per part — ~8 M rows
at SF 100), derives map-only from the part scan plus one broadcast scalar
(the supplier count), and is broadcastable wherever part itself is.

Unlike dbgen there is no guarantee lineitem's (l_partkey, l_suppkey)
pairs all appear in this partsupp — the driver generated lineitem
independently — so q9/q20 join through the pairs that DO match (~4/S of
lineitem rows), identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import load

# The SAME derivation as SQL, for embedding in oracle CTEs:
# WITH partsupp AS ({PARTSUPP_SQL}) ...
PARTSUPP_SQL = """
    SELECT p_partkey AS ps_partkey,
           (p_partkey * 4 + gen.i) % (SELECT count(*) FROM supplier)
               AS ps_suppkey,
           (p_partkey * 7 + gen.i * 131) % 9999 + 1 AS ps_availqty,
           (p_partkey * 13 + gen.i * 97) % 99900 + 100
               AS ps_supplycost_cents
    FROM part CROSS JOIN (VALUES (0), (1), (2), (3)) gen(i)
"""


def partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived partsupp as a DataFrame: part scan → 4-way explode →
    integer arithmetic; the supplier count enters as a broadcast scalar
    (1-row cross join — the repo's standard scalar-subquery pattern)."""
    part = load(spark, sf_dir, "part").select("p_partkey")
    s_n = load(spark, sf_dir, "supplier").agg(F.count("*").alias("_s_n"))
    return (
        part.crossJoin(F.broadcast(s_n))
        .select(
            "p_partkey",
            "_s_n",
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("_i"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") * 4 + F.col("_i")) % F.col("_s_n")).alias(
                "ps_suppkey"
            ),
            ((F.col("p_partkey") * 7 + F.col("_i") * 131) % 9999 + 1).alias(
                "ps_availqty"
            ),
            (
                (F.col("p_partkey") * 13 + F.col("_i") * 97) % 99900 + 100
            ).alias("ps_supplycost_cents"),
        )
    )
