"""TPC-H q2/q20 shape adaptations — the two shapes `relational4.py` left out
because the driver schema has no ``partsupp`` table. Both are rebuilt on the
supplier-part relation *derived from lineitem* (``GROUP BY l_partkey,
l_suppkey``), which preserves exactly what makes each query interesting:

- q2: a **correlated scalar-min subquery** (cheapest supplier per part within
  a region) planned as aggregate + re-join on the min, never per-row probes;
- q20: **nested IN subqueries with a correlated scalar threshold** (suppliers
  holding a dominant share of a part's yearly volume) planned as two
  aggregation levels + semi join.

Extension surface (SURVEY.md §2 x6): the reference
(sarafa19/Data-Lakes-tp2-student) contains zero joins
(/root/reference/src/preprocess_to_staging.py — none; SURVEY §2.C).

Determinism: costs/quantities stay DECIMAL end-to-end (associative sums,
exact equality for the min re-join — a double min-equality could flip on a
borderline tie across engines); the one double division (q20's share
threshold) divides exact-decimal-derived values once, in a fixed order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.money import dec2
from ..registry import load, register


@register(
    "x6_tpch_q2",
    oracle="""
    WITH offers AS (
        SELECT l_partkey, l_suppkey,
               min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    eu_offers AS (
        SELECT o.l_partkey, o.cost, eu.s_suppkey, eu.s_name,
               eu.s_acctbal, eu.n_name
        FROM offers o JOIN eu ON o.l_suppkey = eu.s_suppkey
    ),
    mincost AS (
        SELECT l_partkey, min(cost) AS min_cost
        FROM eu_offers GROUP BY l_partkey
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_brand,
           CAST(e.cost AS DOUBLE) AS cost
    FROM eu_offers e
    JOIN mincost m ON e.l_partkey = m.l_partkey AND e.cost = m.min_cost
    JOIN part p ON p.p_partkey = e.l_partkey
    WHERE p.p_size = 15 AND p.p_type = 'PROMO'
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
)
def x6_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — TPC-H Q2 shape (minimum-cost supplier): for each qualifying part,
    the European supplier(s) offering it at the regional minimum cost.
    ``partsupp.ps_supplycost`` becomes min(l_extendedprice) per
    (part, supplier) from lineitem — same correlated-min structure. Plan: the
    offers aggregate computes ONCE and feeds both the per-part min and the
    probe side (agg + re-join, the standard decorrelation); supplier/nation/
    region/part dims all broadcast; ties on exact decimal cost are preserved
    like the real q2."""
    li = load(spark, sf_dir, "lineitem")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(dec2("l_extendedprice")).alias("cost")
    )
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_offers = offers.join(
        F.broadcast(eu), offers.l_suppkey == eu.s_suppkey
    ).select("l_partkey", "cost", "s_name", "s_acctbal", "n_name")
    eu_offers = eu_offers.persist()
    mincost = eu_offers.groupBy("l_partkey").agg(F.min("cost").alias("min_cost"))
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "PROMO")
    )
    return (
        eu_offers.join(
            mincost,
            (eu_offers.l_partkey == mincost.l_partkey)
            & (eu_offers.cost == mincost.min_cost),
        )
        .drop(mincost.l_partkey)
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("cost").cast("double").alias("cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "x6_tpch_q20",
    oracle="""
    WITH red_parts AS (
        SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
    ),
    per_ps AS (
        SELECT l.l_partkey, l.l_suppkey,
               sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS qty
        FROM lineitem l
        JOIN red_parts g ON l.l_partkey = g.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l.l_partkey, l.l_suppkey
    ),
    per_p AS (
        SELECT l_partkey, sum(qty) AS total_qty FROM per_ps GROUP BY l_partkey
    ),
    dominant AS (
        SELECT DISTINCT ps.l_suppkey
        FROM per_ps ps JOIN per_p p ON ps.l_partkey = p.l_partkey
        WHERE CAST(ps.qty AS DOUBLE) > 0.5 * CAST(p.total_qty AS DOUBLE)
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM dominant)
    ORDER BY s.s_name
    """,
)
def x6_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — TPC-H Q20 shape (potential part promotion): suppliers holding a
    dominant (>50%) share of some red part's 1997 shipped volume.
    ``ps_availqty > 0.5 * sum(l_quantity)`` becomes per-supplier share vs the
    part total — the same nested IN-subquery + correlated-scalar-threshold
    structure. Plan: filtered part keys broadcast into the lineitem scan
    (pushdown + one shuffle on (part, supp)); the part total reuses the
    per-(part,supp) aggregate (two-level agg, no second lineitem scan); the
    final IN is a left-semi join to the supplier dim."""
    red_parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    per_ps = (
        li.join(F.broadcast(red_parts), li.l_partkey == red_parts.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec2("l_quantity")).alias("qty"))
    )
    per_ps = per_ps.persist()
    per_p = per_ps.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    dominant = (
        per_ps.join(per_p.withColumnRenamed("l_partkey", "_pk"),
                    per_ps.l_partkey == F.col("_pk"))
        .filter(
            F.col("qty").cast("double")
            > F.lit(0.5) * F.col("total_qty").cast("double")
        )
        .select("l_suppkey")
        .distinct()
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
