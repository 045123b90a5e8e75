"""TPC-H query-shape completion: q7/q8/q13/q15/q22 directly; q9/q11/q16
REAL as of round 8 (VERDICT r7 item 4) against the derived deterministic
``partsupp`` (catalog/partsupp.py — identical integer derivation in Spark
and the DuckDB oracle); q21 REAL as of round 9 (VERDICT r8 item 3)
against derived receipt/commit dates (see its docstring) — all 22 TPC-H
shapes now run their real semantics.

Extension surface (SURVEY.md §2 x6): the reference
(sarafa19/Data-Lakes-tp2-student) contains zero joins (SURVEY §2.C,
/root/reference/src/preprocess_to_staging.py has none); these queries prove
the relational layer the reference never exercises.

Determinism rules (PERF.md): money sums in DECIMAL (associative, bit-stable
at any parallelism); ratios divide double-cast SUMS in a fixed order; scalar
thresholds are derived from exact sums so both engines compare identical
doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.money import SQL_DISC_PRICE, dec2, disc_price
from ..registry import load, register
from .partsupp import PARTSUPP_SQL, partsupp


@register(
    "x6_tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l.l_shipdate) AS l_year, {SQL_DISC_PRICE} AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                               AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def x6_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — TPC-H Q7 (volume shipping): bilateral trade between two nations
    by year. Both nation dims broadcast; the disjunctive nation-pair
    predicate lands post-join on broadcast columns, so lineitem is scanned
    once and never shuffled for the joins."""
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "x6_tpch_q8",
    oracle=f"""
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_5' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
        SELECT year(o.o_orderdate) AS o_year, {SQL_DISC_PRICE} AS volume,
               n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
          AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                AND TIMESTAMP '1997-12-31'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def x6_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — TPC-H Q8 (national market share): one supplier nation's share of
    regional PROMO revenue per year. Seven-way star join — every dim
    broadcast, lineitem scanned once; the share is a conditional-sum /
    total-sum ratio computed on exact decimal sums, divided in double in a
    fixed order (engine-portable, PERF.md #9)."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    zero = F.lit(0).cast("decimal(18,4)")
    vol = disc_price()
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("nation") == "NATION_5", vol).otherwise(zero)).alias(
                "_nat"
            ),
            F.sum(vol).alias("_tot"),
        )
        .select(
            "o_year",
            F.round(
                F.col("_nat").cast("double") / F.col("_tot").cast("double"), 6
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


@register(
    "x6_tpch_q9",
    oracle=f"""
    WITH partsupp AS ({PARTSUPP_SQL})
    SELECT nation, o_year,
           CAST(sum(volume) AS DOUBLE)
             - CAST(sum(cost_cents) AS DOUBLE) / 100.0 AS sum_profit
    FROM (
        SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
               {SQL_DISC_PRICE} AS volume,
               ps.ps_supplycost_cents * CAST(l.l_quantity AS BIGINT)
                   AS cost_cents
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                        AND ps.ps_suppkey = l.l_suppkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%r%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def x6_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — TPC-H Q9 (product-type profit), REAL as of round 8: profit =
    revenue − ps_supplycost·quantity against the derived partsupp
    (catalog/partsupp.py), joined on BOTH keys exactly like dbgen's. The
    profit splits into two exact sums per group — revenue in DECIMAL,
    cost in BIGINT cents (quantities are integral) — combined in double
    only at the output edge, so both engines emit identical doubles with
    no rounding step. Plan: part filter and partsupp both broadcast into
    the lineitem scan; one shuffle for the orders join; nation broadcast."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%r%"))
    ps = partsupp(spark, sf_dir)
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    cost_cents = F.col("ps_supplycost_cents") * F.col("l_quantity").cast(
        "bigint"
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(
            F.broadcast(ps),
            (l.l_partkey == ps.ps_partkey) & (l.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            (
                F.sum(disc_price()).cast("double")
                - F.sum(cost_cents).cast("double") / 100.0
            ).alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "x6_tpch_q11",
    oracle=f"""
    WITH partsupp AS ({PARTSUPP_SQL}),
    scoped AS (
        SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS v_cents
        FROM partsupp
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT ps_partkey, CAST(sum(v_cents) AS DOUBLE) / 100.0 AS value
    FROM scoped GROUP BY ps_partkey
    HAVING CAST(sum(v_cents) AS DOUBLE) >
           (SELECT CAST(sum(v_cents) AS DOUBLE) * 0.0005 FROM scoped)
    ORDER BY value DESC, ps_partkey
    """,
)
def x6_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — TPC-H Q11 (important stock), REAL as of round 8:
    ``sum(ps_supplycost * ps_availqty)`` per part over the derived
    partsupp, scoped to one region's suppliers (EUROPE stands in for the
    single-nation scope — the driver's synthetic nations don't all carry
    suppliers at every SF), kept against a scalar
    fraction-of-global-total subquery over the SAME aggregate. Money in
    BIGINT cents: both the per-part values and the threshold are exact
    integers cast to double once, so the HAVING compares identical
    doubles on both engines. Plan: one hash agg persisted and reused by
    both sides; the 1-row total broadcast cross-joins (no re-scan)."""
    ps = partsupp(spark, sf_dir)
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_sup = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    scoped = ps.join(
        F.broadcast(eu_sup), ps.ps_suppkey == eu_sup.s_suppkey
    ).select(
        "ps_partkey",
        (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("v_cents"),
    )
    pv = scoped.groupBy("ps_partkey").agg(F.sum("v_cents").alias("_v"))
    pv = pv.persist()
    total = pv.agg(
        (F.sum("_v").cast("double") * F.lit(0.0005)).alias("_threshold")
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("_v").cast("double") > F.col("_threshold"))
        .select(
            "ps_partkey",
            (F.col("_v").cast("double") / 100.0).alias("value"),
        )
        .orderBy(F.desc("value"), "ps_partkey")
    )


@register(
    "x6_tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def x6_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — TPC-H Q13 (customer distribution): left outer join with a
    filter INSIDE the join condition (customers with zero qualifying orders
    must survive with count 0 — the semantics that distinguish ON-clause
    from WHERE-clause filtering), then a distribution-of-counts re-agg.
    The ``o_comment NOT LIKE`` filter is replaced by an o_orderpriority
    predicate (no comment column in the driver schema)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "x6_tpch_q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, sum({SQL_DISC_PRICE}) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def x6_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — TPC-H Q15 (top supplier): quarterly revenue per supplier, keep
    the max (ties preserved — exact decimal revenue makes tie equality
    well-defined, unlike doubles). The revenue aggregate is computed once
    (persisted) and feeds both the max scalar and the probe side."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = load(spark, sf_dir, "supplier")
    revenue = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(disc_price()).alias("total_revenue"))
        .persist()
    )
    mx = revenue.agg(F.max("total_revenue").alias("_max_rev"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "x6_tpch_q16",
    oracle=f"""
    WITH partsupp AS ({PARTSUPP_SQL})
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type NOT IN ('PROMO', 'ECONOMY')
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND ps.ps_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def x6_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — TPC-H Q16 (parts/supplier relationship), REAL as of round 8:
    distinct-count of suppliers per part attribute group over the derived
    PARTSUPP (the dbgen relation, not a lineitem stand-in), excluding a
    NOT IN-subquery supplier set (negative-balance suppliers substitute
    the comment-matched complaint suppliers — the driver schema has no
    s_comment). NOT IN on a non-nullable key → left anti join; both the
    excluded-supplier set and the filtered part dim broadcast."""
    ps = partsupp(spark, sf_dir)
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").isin("PROMO", "ECONOMY"))
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "x6_tpch_q21",
    oracle="""
    WITH l AS (
        SELECT l_orderkey, l_suppkey,
               CAST(l_shipdate AS DATE)
                   + CAST((l_orderkey*31 + l_linenumber*7) % 30 AS INT)
                   AS l_commitdate,
               CAST(l_shipdate AS DATE)
                   + CAST((l_orderkey*17 + l_linenumber*13) % 45 AS INT)
                   AS l_receiptdate
        FROM lineitem
    )
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN l l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_receiptdate > l1.l_commitdate
      AND r.r_name = 'EUROPE'
      AND EXISTS (SELECT 1 FROM l l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_receiptdate > l3.l_commitdate)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def x6_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — TPC-H Q21, REAL as of round 9 (VERDICT r8 item 3): suppliers
    who kept finalized orders waiting — the sole LATE supplier
    (``l_receiptdate > l_commitdate``) on multi-supplier 'F' orders.

    The driver schema ships no receipt/commit dates, so both are DERIVED
    deterministically from columns that do exist, with the identical
    integer-day expression in Spark and the oracle CTE (the
    ``catalog/partsupp.py`` technique):

    - ``l_commitdate  = date(l_shipdate) + (l_orderkey*31 + l_linenumber*7)  % 30 days``
    - ``l_receiptdate = date(l_shipdate) + (l_orderkey*17 + l_linenumber*13) % 45 days``

    Both engines add integer days to the same DATE, so the late predicate
    is bit-identical (~65% of rows late; the NOT EXISTS then keeps only
    orders where exactly one supplier was late).

    The correlated EXISTS / NOT EXISTS pair — the hard part of q21 — is
    computed from ONE lineitem scan (round 16, guide §2.4/§3.3; the
    previous semi+anti form scanned lineitem three times and built two
    lineitem-sized broadcast relations): every decision both subqueries
    encode is a function of the per-(order, supplier) late-row profile, so
    hash-partition the narrow (orderkey, suppkey, late) projection by
    ``l_orderkey`` once, aggregate late-row counts per (order, supplier)
    exchange-free, and read the per-order distinct-supplier /
    distinct-late-supplier counts off a window over the SAME partitioning:

    - EXISTS other-supplier        ⇔ n_supp  ≥ 2 (I am one of them)
    - NOT EXISTS other-late-supplier ⇔ n_late = 1 (I am late, so ≥ 1)
    - numwait counts late ROWS     ⇔ sum of the per-pair late-row counts

    One exchange of fixed-width rows replaces three full lineitem legs at
    any scale (measured: sf0.1 best 1.20 → 0.94 s, 10× fixture best
    6.43 → 3.10 s, results row-identical both scales)."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    commit = F.expr(
        "date_add(CAST(l_shipdate AS DATE), "
        "CAST((l_orderkey*31 + l_linenumber*7) % 30 AS INT))"
    )
    receipt = F.expr(
        "date_add(CAST(l_shipdate AS DATE), "
        "CAST((l_orderkey*17 + l_linenumber*13) % 45 AS INT))"
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", (receipt > commit).alias("_late"))
        .repartition("l_orderkey")
    )
    pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.count(F.when(F.col("_late"), F.lit(1))).alias("_late_rows")
    )
    w = Window.partitionBy("l_orderkey")
    prof = pair.select(
        "l_orderkey",
        "l_suppkey",
        "_late_rows",
        F.count(F.lit(1)).over(w).alias("_n_supp"),
        F.sum((F.col("_late_rows") > 0).cast("int")).over(w).alias("_n_late"),
    )
    qual = prof.filter(
        (F.col("_late_rows") > 0)
        & (F.col("_n_supp") >= 2)
        & (F.col("_n_late") == 1)
    )
    return (
        qual.join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("s_name")
        .agg(F.sum("_late_rows").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@register(
    "x6_tpch_q22",
    oracle="""
    WITH pool AS (
        SELECT c_custkey, c_nationkey % 10 AS cntrycode,
               CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        FROM customer WHERE c_nationkey % 10 IN (1, 2, 3, 4, 5, 6, 7)
    ),
    threshold AS (
        SELECT CAST(sum(bal) AS DOUBLE) / count(*) AS avg_bal
        FROM pool WHERE bal > 0
    )
    SELECT cntrycode, count(*) AS numcust,
           CAST(sum(bal) AS DOUBLE) AS totacctbal
    FROM pool, threshold
    WHERE CAST(bal AS DOUBLE) > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = pool.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def x6_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x6 — TPC-H Q22 (global sales opportunity): rich-but-inactive
    customers per country code. The phone-prefix country code becomes
    ``c_nationkey % 10`` (no phone column). The scalar-average threshold is
    computed as exact-decimal sum / count, divided in double once — the
    membership predicate is then bit-identical in both engines (a plain
    double avg() would drift with partitioning and could flip a borderline
    customer). NOT EXISTS(urgent orders) → left anti join (the priority
    filter keeps the anti-join non-vacuous on the driver data, where every
    customer has at least one order)."""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    pool = c.filter((F.col("c_nationkey") % 10).isin(1, 2, 3, 4, 5, 6, 7)).select(
        "c_custkey",
        (F.col("c_nationkey") % 10).alias("cntrycode"),
        dec2("c_acctbal").alias("bal"),
    )
    pool = pool.persist()
    threshold = pool.filter(F.col("bal") > 0).agg(
        (F.sum("bal").cast("double") / F.count("*")).alias("avg_bal")
    )
    return (
        pool.crossJoin(F.broadcast(threshold))
        .filter(F.col("bal").cast("double") > F.col("avg_bal"))
        .join(o, pool.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.sum("bal").cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
