"""Deeper relational coverage: MERGE/upsert (CDC), TPC-H q10/q18-style
composites (outer-join revenue ranking; HAVING-subquery semi join)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.money import SQL_DISC_PRICE, disc_price
from ..operators.merge import merge_upsert, scd2_merge
from ..registry import load, register


@register(
    "x8_merge_upsert",
    oracle="""
    WITH source AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(o_totalprice * 1.1 AS DOUBLE) AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 10 = 0
    )
    SELECT * FROM orders t
    WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)
    UNION ALL
    SELECT * FROM source
    """,
)
def x8_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation (anti-join + union): a 10% 'CDC batch' with
    repriced orders upserted into the orders table; source wins on key."""
    orders = load(spark, sf_dir, "orders")
    source = orders.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", (F.col("o_totalprice") * 1.1).cast("double")
    )
    return merge_upsert(orders, source, "o_orderkey")


@register(
    "x28_scd2_dimension",
    oracle="""
    WITH dim AS (
        SELECT c_custkey, c_mktsegment,
               CAST(0 AS BIGINT) AS valid_from,
               CAST(NULL AS BIGINT) AS valid_to
        FROM customer
    ),
    upd AS (
        SELECT c_custkey, 'PROMO' AS new_seg
        FROM customer WHERE c_custkey % 10 = 3
    )
    SELECT d.c_custkey, d.c_mktsegment, d.valid_from, d.valid_to
    FROM dim d LEFT JOIN upd u USING (c_custkey)
    WHERE u.c_custkey IS NULL OR u.new_seg = d.c_mktsegment
    UNION ALL
    SELECT d.c_custkey, d.c_mktsegment, d.valid_from, CAST(1 AS BIGINT)
    FROM dim d JOIN upd u USING (c_custkey)
    WHERE u.new_seg <> d.c_mktsegment
    UNION ALL
    SELECT d.c_custkey, u.new_seg, CAST(1 AS BIGINT), CAST(NULL AS BIGINT)
    FROM dim d JOIN upd u USING (c_custkey)
    WHERE u.new_seg <> d.c_mktsegment
    """,
)
def x28_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x28 — SCD TYPE-2 dimension merge (the history-keeping cousin of
    x8's overwrite upsert): a CDC batch re-segments 10% of customers;
    changed rows are closed with a validity end and re-opened at the new
    value, untouched/no-op rows pass through (`operators.merge.scd2_merge`).
    The standard warehouse pattern for auditable dimensions."""
    cust = load(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit(0).cast("bigint").alias("valid_from"),
        F.lit(None).cast("bigint").alias("valid_to"),
    )
    updates = cust.filter(F.col("c_custkey") % 10 == 3).select(
        "c_custkey", F.lit("PROMO").alias("c_mktsegment")
    )
    return scd2_merge(dim, updates, "c_custkey", "c_mktsegment", batch_id=1)


@register(
    "x6_tpch_q10",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(sum({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def x6_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — TPC-H Q10 (returned-item reporting): who returned the most
    revenue in a quarter; 4-way join, decimal-exact ranking, top 20."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "x6_tpch_q18",
    oracle="""
    WITH big AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 120
    )
    SELECT c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def x6_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — TPC-H Q18 (large-volume orders): HAVING-filtered aggregate as a
    semi-join filter, then re-aggregate with customer context."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 120)
        .select("l_orderkey")
    )
    return (
        l.join(big, "l_orderkey", "left_semi")
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty")
        )
    )
