"""Time-series / product-analytics coverage sweep: resample+gap-fill,
funnel, cohort retention, quantile bucketing, stratified sampling, and
per-class embedding centroids.

These extend SURVEY.md §2 groups E/F/X with the event-table analytics a
training-data pipeline runs next to its relational workload. Every query is
DuckDB-oracle-checked; scale notes are per-query docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..registry import load, register


@register(
    "x11_resample_gapfill",
    oracle="""
    WITH b AS (SELECT event_type,
                      time_bucket(INTERVAL '1 hour', ts) AS hour
               FROM events),
    counts AS (SELECT event_type, hour, count(*) AS n_obs
               FROM b GROUP BY event_type, hour),
    bounds AS (SELECT event_type, min(hour) AS lo, max(hour) AS hi
               FROM b GROUP BY event_type),
    spine AS (SELECT event_type,
                     unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour
              FROM bounds)
    SELECT s.event_type, s.hour, coalesce(c.n_obs, 0) AS n
    FROM spine s LEFT JOIN counts c USING (event_type, hour)
    """,
)
def x11_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x11 — resample events to a fixed hourly grid per event_type and
    zero-fill the gaps (the time-series densification every downstream
    model/monitor needs).

    Scale shape: the dense spine is built from per-group (min,max) bounds via
    ``sequence``+``explode`` — its size is groups × time-range, independent of
    event count; the left join is a broadcast of the tiny spine at any data
    scale (the counts side stays hash-partitioned by (type, hour))."""
    ev = load(spark, sf_dir, "events")
    b = ev.select("event_type", F.date_trunc("hour", "ts").alias("hour"))
    counts = b.groupBy("event_type", "hour").agg(F.count(F.lit(1)).alias("n_obs"))
    bounds = b.groupBy("event_type").agg(
        F.min("hour").alias("lo"), F.max("hour").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    return spine.join(counts, ["event_type", "hour"], "left").select(
        "event_type", "hour", F.coalesce("n_obs", F.lit(0)).alias("n")
    )


@register(
    "x12_funnel",
    oracle="""
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2
           FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t3
           FROM events e JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
    SELECT '1_signup' AS step, count(*) AS n_users FROM s1
    UNION ALL SELECT '2_click', count(*) FROM s2
    UNION ALL SELECT '3_purchase', count(*) FROM s3
    """,
)
def x12_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x12 — ordered funnel (signup → later click → later purchase): users
    surviving each step, with strict event-time ordering between steps.

    Scale shape: each step is a hash agg down to one row per surviving user,
    then an equi-join against the (shrinking) prior-step user set — at 100 TB
    the step tables are ≪ the event table and broadcastable; the event scan's
    type filter is pushed to parquet."""
    ev = load(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def step(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("step"), "n_users"
        )

    return (
        step(s1, "1_signup")
        .unionByName(step(s2, "2_click"))
        .unionByName(step(s3, "3_purchase"))
    )


@register(
    "x13_cohort_retention",
    oracle="""
    WITH first AS (SELECT user_id,
                          CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
                   FROM events GROUP BY user_id),
    act AS (SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS DATE) AS act_week
            FROM events)
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.act_week) / 7 AS INT)
               AS week_offset,
           count(*) AS n_users
    FROM act a JOIN first f USING (user_id)
    GROUP BY f.cohort_week, week_offset
    """,
)
def x13_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x13 — weekly cohort retention: users grouped by first-activity week,
    counted per week-offset of later activity (the classic retention
    triangle).

    Scale shape: ``distinct`` collapses events to one row per (user, week)
    before any join — the join input is bounded by users × weeks, not events;
    the first-activity table is one row per user (broadcast at dim scale,
    hash-join on user_id beyond). Week truncation is Monday-based ISO in both
    engines, so offsets are exact multiples of 7 days."""
    ev = load(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    act = ev.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("act_week")
    ).distinct()
    return (
        act.join(first, "user_id")
        .select(
            "cohort_week",
            F.floor(F.datediff("act_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "e3c_ntile_buckets",
    oracle="""
    WITH q AS (SELECT o_orderpriority,
                      CAST(o_totalprice AS DECIMAL(18,2)) AS p,
                      ntile(4) OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice, o_orderkey)
                          AS quartile
               FROM orders)
    SELECT o_orderpriority, quartile, count(*) AS n, sum(p) AS sum_price
    FROM q GROUP BY o_orderpriority, quartile
    """,
)
def e3c_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e3 extension — ntile quantile bucketing: quartiles of order value per
    priority class, then per-bucket count + exact decimal sum.

    Determinism: the window orders by (o_totalprice, o_orderkey) — a total
    order — so bucket assignment is engine-portable; sums are DECIMAL so they
    are associative under any partitioning. Scale shape: one hash exchange on
    o_orderpriority feeds both the window and the final agg."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    q = o.select(
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
        F.ntile(4).over(w).alias("quartile"),
    )
    return q.groupBy("o_orderpriority", "quartile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("p").alias("sum_price")
    )


@register(
    "f6_stratified_sample",
    oracle="""
    WITH r AS (SELECT source, doc_id,
                      row_number() OVER (
                          PARTITION BY source
                          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                          AS rn
               FROM documents)
    SELECT source, doc_id, rn FROM r WHERE rn <= 5
    """,
)
def f6_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f-group extension — deterministic stratified sample: exactly k rows
    per stratum, chosen by md5-hash order (so the sample is stable under any
    partitioning AND reproducible by any engine — the same portability trick
    as the e2 split shuffle key).

    Scale shape: one hash exchange by stratum, and Catalyst inserts
    WindowGroupLimit (verified in tests/test_plan_quality.py): each map task
    keeps only its local top-k per stratum before shuffling, so the exchange
    carries ~k·strata rows, never the table."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
    )


@register(
    "x15_embedding_centroids",
    oracle="""
    WITH flat AS (SELECT label, CAST(t.pos AS INT) AS pos,
                         embedding[CAST(t.pos AS INT) + 1] AS val
                  FROM embeddings, unnest(range(len(embedding))) AS t(pos)),
    q AS (SELECT label, pos,
                 CAST(floor(CAST(val AS DOUBLE) * 1000000) AS BIGINT) AS qv
          FROM flat)
    SELECT label, pos, count(*) AS n,
           CAST(sum(qv) AS DOUBLE) / count(*) / 1000000.0 AS centroid
    FROM q GROUP BY label, pos
    """,
)
def x15_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x15 — per-label embedding centroid (the class-prototype step of IVF /
    dedup clustering), computed per dimension.

    Engine-portable float math: summing raw doubles is order-dependent, so
    each value is fixed-point-quantized (floor(val·1e6) — exact IEEE multiply
    + exact floor) and summed as BIGINT; the average divides once, in a fixed
    order, in double. Result is bit-identical under any partitioning and in
    any engine. Scale shape: posexplode fans out dim× rows but they partial-
    aggregate map-side down to labels × dims before the one shuffle."""
    e = load(spark, sf_dir, "embeddings")
    flat = e.select("label", F.posexplode("embedding").alias("pos", "val"))
    q = flat.select(
        "label",
        "pos",
        F.floor(F.col("val").cast("double") * 1000000).cast("bigint").alias("qv"),
    )
    return q.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("qv").cast("double") / F.count(F.lit(1)) / F.lit(1000000.0)).alias(
            "centroid"
        ),
    )
