"""TPC-H-style coverage, second batch — adapted to the driver's schema
(no partsupp / commitdate / shipmode columns, so the classic templates are
re-targeted at the columns that exist while keeping each query's *shape*:
EXISTS semi-join (q4), pure scan-agg (q6), CASE-conditional agg (q12/q14),
correlated scalar-subquery-as-join (q17), OR-of-ANDs pushdown predicate
(q19), GROUPING SETS, and a deterministic hash sample.

Scale notes: every dim side is broadcast; q6/q19 are single-pass scans whose
predicates push to parquet; q17's per-part average is a partial-aggregated
shuffle on p_partkey, then a broadcast-right join back to lineitem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.money import SQL_DISC_PRICE, dec2, disc_price
from ..registry import load, register


@register(
    "x6_tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
      )
    GROUP BY o.o_orderpriority
    """,
)
def x6_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — TPC-H Q4 shape (order priority checking): EXISTS subquery as a
    left-semi join; lineitem side is filtered BEFORE the semi join so the
    probe input shrinks first. Classic q4 tests commitdate<receiptdate; the
    driver schema lacks those, so the exists-predicate is returnflag='R'."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "x6_tpch_q6",
    oracle=f"""
    SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE)
           AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def x6_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — TPC-H Q6 (forecasting revenue change): the canonical
    filter-then-global-agg scan. All four predicates push down to the
    parquet reader; the agg reduces map-side to one row per partition."""
    l = load(spark, sf_dir, "lineitem")
    rev = (dec2("l_extendedprice") * dec2("l_discount")).cast("decimal(18,4)")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@register(
    "x6_tpch_q12",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
)
def x6_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — TPC-H Q12 shape (shipping modes & priority): conditional
    CASE-WHEN aggregation over a fact-fact join. Grouped by l_linestatus
    (driver schema has no l_shipmode)."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "x6_tpch_q14",
    oracle=f"""
    SELECT 100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                                 THEN {SQL_DISC_PRICE} ELSE 0 END) AS DOUBLE)
                 / CAST(sum({SQL_DISC_PRICE}) AS DOUBLE) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def x6_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — TPC-H Q14 (promotion effect): ratio of two conditional sums in
    one aggregation pass; part is broadcast so lineitem never shuffles for
    the join. Both exact-decimal sums are cast to double BEFORE dividing —
    a decimal divide's result scale is engine-specific (observed last-ulp
    drift), while double ops in a fixed order are bit-identical."""
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    promo = F.when(F.col("p_type") == "PROMO", disc_price()).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(disc_price()).cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "x6_tpch_q17",
    oracle="""
    WITH avg_qty AS (
        SELECT l_partkey, avg(l_quantity) AS part_avg
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) / 7.0 AS DOUBLE)
           AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN avg_qty a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < 0.5 * a.part_avg
    """,
)
def x6_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — TPC-H Q17 (small-quantity-order revenue): the correlated scalar
    subquery `l_quantity < 0.5 * (SELECT avg(..) WHERE same part)` decorrelated
    into an aggregate + equi-join — exactly what Catalyst does to the SQL
    form. The per-part average is a partial-agg shuffle on l_partkey; the
    brand filter broadcast-prunes before the expensive compare."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.avg("l_quantity").alias("part_avg")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey, "left_semi")
        .join(avg_qty, F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("part_avg"))
        .agg(
            (F.sum(dec2("l_extendedprice")) / 7.0)
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "x6_tpch_q19",
    oracle=f"""
    SELECT CAST(sum({SQL_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def x6_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — TPC-H Q19 (discounted revenue): disjunction of conjunctive
    range predicates across BOTH join sides. Catalyst extracts the common
    join key as an equi-join and keeps the OR as a post-join filter; the
    part side stays broadcast. Verifies complex-predicate planning."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & q.between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#7")
        & F.col("p_size").between(1, 25)
        & q.between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(1, 35)
        & q.between(20, 30)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )


@register(
    "d12c_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(grouping(l_returnflag) AS INT) * 2
             + CAST(grouping(l_linestatus) AS INT) AS gid
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), ())
    """,
)
def d12c_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d12 — explicit GROUPING SETS (finer control than rollup/cube) with a
    grouping-id column distinguishing the aggregation levels. One shuffle;
    Spark expands the sets map-side."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("l_gsets")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(grouping(l_returnflag) AS INT) * 2
                 + CAST(grouping(l_linestatus) AS INT) AS gid
        FROM l_gsets
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


@register(
    "f5_hash_sample",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE md5(CAST(l_orderkey AS VARCHAR) || '-'
              || CAST(l_linenumber AS VARCHAR)) < '1'
    """,
)
def f5_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f5 — deterministic ~1/16 Bernoulli sample via a hash predicate on the
    primary key (md5 hex < '1'). Unlike `df.sample()`, the selected set is
    a pure function of the data — identical on any engine, any partitioning,
    any cluster size — which is what makes sampled pipelines reproducible
    and oracle-checkable. Predicate is a cheap codegen'd expression; at
    100 TB the sample never materializes the full table."""
    l = load(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "-",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    return l.filter(F.md5(key) < "1").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "d13_conditional_agg",
    oracle="""
    SELECT event_type,
           count(*) FILTER (WHERE value > 50) AS n_high,
           bool_or(value > 99) AS any_extreme,
           bool_and(value >= 0) AS all_nonneg,
           min_by(user_id, event_id) AS first_user
    FROM events
    GROUP BY event_type
    """,
)
def d13_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d13 — conditional/ordered aggregates: count_if, bool_or/bool_and,
    min_by keyed on the unique event_id (deterministic). All are single-pass
    hash aggregates with map-side partials."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_if(F.col("value") > 50).alias("n_high"),
        F.bool_or(F.col("value") > 99).alias("any_extreme"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        F.min_by("user_id", "event_id").alias("first_user"),
    )


@register(
    "d14_stats_agg",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(avg(l_quantity), 4) AS avg_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def d14_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d14 — statistical moment aggregates (sample stddev/variance/mean).
    Double accumulation order differs across partitionings, so results are
    rounded to 4 decimals — ~1e-9 absolute drift against a 0.5e-4 rounding
    boundary keeps the oracle hash stable."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
    )
