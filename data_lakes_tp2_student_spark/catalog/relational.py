"""Relational-surface catalog: filters (b), joins (c3-c8), rollup/cube (d12),
analytic windows (e3), top-k (f4), set ops (g), scalar/date/JSON/array
functions (h), and TPC-H-style composites (x6) on the driver tables.

The reference has none of these beyond implicit forms (SURVEY.md §2 C/G/H
"Absent" rows) — they are the mandated extension surface, expressed purely
with built-in DataFrame/SQL operators so Catalyst owns the physical strategy.

Cross-engine exactness conventions (driver hashes values):
- money sums: per-row CAST(expr AS DECIMAL(18,2)) then SUM — decimal addition
  is associative, so Spark's partial aggregation and DuckDB's sequential scan
  produce bit-identical totals (double sums would drift in the last ulp);
- averages: round(avg(x), 6) — relative fp error ~1e-15 never reaches 1e-6;
- rank/length/year-style ints: cast to BIGINT on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.compute import spread_if_underparallel
from ..functions.money import SQL_CHARGE, SQL_DISC_PRICE, charge, dec2, disc_price
from ..registry import load, register

# ---------------------------------------------------------------- B: filters


@register(
    "b1_dropna",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    WHERE lang IS NOT NULL AND lang <> 'de'
      AND source IS NOT NULL AND source <> 'src0'
    """,
)
def b1_dropna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b1 — drop rows with any null (ref: src/preprocess_to_staging.py:120
    `data.dropna()`); nulls injected via NULLIF since testdata is null-free."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("nullif(lang, 'de')").alias("lang"),
        F.expr("nullif(source, 'src0')").alias("source"),
    )
    return docs.na.drop("any")


@register(
    "b2_projection_filter",
    oracle="""
    SELECT l_orderkey, l_extendedprice FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01'
    """,
)
def b2_projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b2 — column pruning + predicate pushdown to the parquet scan
    (ref drops columns late: src/preprocess_to_staging.py:155-157)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp")).select(
        "l_orderkey", "l_extendedprice"
    )


# ----------------------------------------------------------------- C: joins


@register(
    "c3_join_inner_agg",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def c3_join_inner_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c3 — shuffle-side fact joined to broadcast dim, then hash agg."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey, "inner"
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "c4_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def c4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c4 — left-semi join (EXISTS): customers with a >400k order."""
    customer = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "c5_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def c5_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c5 — left-anti join (NOT EXISTS): customers with no orders."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "c6_range_join",
    oracle="""
    SELECT o.o_orderkey, t.tier
    FROM orders o
    JOIN (VALUES ('small', 0.0, 100000.0),
                 ('medium', 100000.0, 300000.0),
                 ('large', 300000.0, 1000000.0)) t(tier, lo, hi)
      ON o.o_totalprice >= t.lo AND o.o_totalprice < t.hi
    """,
)
def c6_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c6 — non-equi (banded range) join against a broadcast tier table;
    Spark plans BroadcastNestedLoopJoin — correct for a 3-row dim."""
    orders = load(spark, sf_dir, "orders")
    tiers = spark.createDataFrame(
        [("small", 0.0, 100000.0), ("medium", 100000.0, 300000.0),
         ("large", 300000.0, 1000000.0)],
        "tier string, lo double, hi double",
    )
    cond = (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi"))
    return orders.join(F.broadcast(tiers), cond, "inner").select("o_orderkey", "tier")


@register(
    "c7_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           c.ts AS last_click_ts, c.value AS last_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def c7_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c7 — as-of join (Spark has no native one): for each purchase, the most
    recent click at-or-before it, per user.

    Scalable pattern: tag + UNION both streams, one hash-partition by user,
    one window carrying the last click forward (`last(ignorenulls)` over
    unbounded-preceding rows) — a single shuffle, no per-row probing, no
    skew beyond the user key itself. At equal ts the click sorts first,
    matching ASOF's >= semantics.
    """
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("is_p"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.col("value").alias("click_value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_p"),
        "event_id",
        F.lit(None).cast("double").alias("click_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    click_ts = F.when(F.col("is_p") == 0, F.col("ts"))
    click_v = F.when(F.col("is_p") == 0, F.col("click_value"))
    return (
        clicks.unionByName(purchases)
        .withColumn("last_click_ts", F.last(click_ts, ignorenulls=True).over(w))
        .withColumn("last_click_value", F.last(click_v, ignorenulls=True).over(w))
        .filter(F.col("is_p") == 1)
        .select("event_id", "user_id", "ts", "last_click_ts", "last_click_value")
    )


@register(
    "c8_outer_join",
    oracle="""
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def c8_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c8 — left outer join preserving order-less customers (count = 0)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# ------------------------------------------------------- D12: rollup / cube


@register(
    "d12_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def d12_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d12 — hierarchical subtotals via ROLLUP."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
    )


@register(
    "d12b_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def d12b_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d12 — all grouping-set combinations via CUBE."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))


# ------------------------------------------------------------- E3: windows


@register(
    "e3_window_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(rank() OVER w AS BIGINT) AS price_rank,
           lag(l_extendedprice) OVER w AS prev_price,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
               PARTITION BY l_orderkey
               ORDER BY l_extendedprice, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_qty
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_extendedprice, l_linenumber)
    """,
)
def e3_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e3 — rank / lag / running frame sum per order (one shuffle, one sort,
    all three functions share the window)."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_extendedprice", "l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w).cast("bigint").alias("price_rank"),
        F.lag("l_extendedprice").over(w).alias("prev_price"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_qty"),
    )


# --------------------------------------------------------------- F: top-k


@register(
    "f4_topk",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    ORDER BY c_acctbal DESC, c_custkey LIMIT 10
    """,
)
def f4_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f4 — top-k (Spark plans TakeOrderedAndProject: per-partition heaps,
    no global sort). Tie-broken by key for cross-engine determinism."""
    customer = load(spark, sf_dir, "customer")
    return (
        customer.orderBy(F.desc("c_acctbal"), "c_custkey")
        .select("c_custkey", "c_name", "c_acctbal")
        .limit(10)
    )


# ------------------------------------------------------------- G: set ops


@register(
    "g1_union_all",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-01-01'
    UNION ALL
    SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    """,
)
def g1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g1 — UNION ALL (ref: pd.concat of ~100 shard frames,
    build/unpack_to_raw.py:31-50; in Spark multi-path reads subsume this)."""
    orders = load(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp")
    a = orders.filter(F.col("o_orderdate") < cut).select("o_orderkey", "o_totalprice")
    b = orders.filter(F.col("o_orderdate") >= cut).select("o_orderkey", "o_totalprice")
    return a.unionByName(b)


@register(
    "g2_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def g2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g2 — INTERSECT (distinct): nations having both customers and suppliers."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "g2b_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def g2b_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g2 — EXCEPT (distinct): customer nations with no suppliers."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT DISTINCT semantics


# ------------------------------------------------- H5: scalar function sets


@register(
    "h5_date_functions",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders GROUP BY yr, mo
    """,
)
def h5_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h5 — date part extraction + monthly aggregation."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.month("o_orderdate").cast("bigint").alias("mo"),
            "o_totalprice",
        )
        .groupBy("yr", "mo")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "h5_json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n,
           round(avg(value), 6) AS avg_value
    FROM events GROUP BY k_bucket
    """,
)
def h5_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h5 — JSON string field extraction (events.props is a JSON string)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select((k % 10).alias("k_bucket"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


@register(
    "h5_array_functions",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
    FROM embeddings
    """,
)
def h5_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h5 — array ops on the embedding column: size + L2 norm, computed with
    builtin higher-order functions (transform/aggregate), no UDF."""
    emb = load(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
    )


# ------------------------------------------------- X6: TPC-H-style composites


@register(
    "x6_tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_base_price,
           CAST(sum({SQL_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
           CAST(sum({SQL_CHARGE}) AS DOUBLE) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def x6_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — TPC-H Q1 pricing summary (adapted to driver schema); money math
    in exact decimal (functions.money) so sums are partition-order-proof.
    The scan feeds the whole aggregation map-side, so a single-row-group
    input file would run it one-tasked — `spread_if_underparallel`
    repartitions first ONLY in that case (no-op on a multi-split table;
    round 15, see functions/compute.py)."""
    li = spread_if_underparallel(load(spark, sf_dir, "lineitem"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec2("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(charge()).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "x6_tpch_q3",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(sum({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def x6_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — TPC-H Q3 shipping priority: 3-way join, agg, ordered top-k.
    The customer dim is broadcast; decimal revenue keeps cross-engine
    ordering exact at the LIMIT boundary."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "x6_tpch_q5",
    oracle=f"""
    SELECT n.n_name,
           CAST(sum({SQL_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    """,
)
def x6_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — TPC-H Q5 local-supplier volume: 6-way star join; every dim side
    broadcast, so the only fact-table shuffle is the final group-by."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )


@register(
    "x6_group_having",
    oracle="""
    SELECT p_brand, count(*) AS n_parts, round(avg(p_retailprice), 6) AS avg_price
    FROM part GROUP BY p_brand HAVING count(*) >= 90
    """,
)
def x6_group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — GROUP BY + HAVING (post-aggregation filter)."""
    part = load(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
        )
        .filter(F.col("n_parts") >= 90)
    )
