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
    SELECT o_orderpriority, CAST(quartile AS BIGINT) AS quartile,
           count(*) AS n, CAST(sum(p) AS DOUBLE) AS sum_price
    FROM q GROUP BY o_orderpriority, quartile
    """,
)
def e3c_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e3 extension — ntile quantile bucketing: quartiles of order value per
    priority class, then per-bucket count + exact decimal sum (emitted as
    double for pandas-landing portability).

    Scale shape (two-phase rank, no per-group single-task sort): a naive
    `ntile OVER (PARTITION BY o_orderpriority)` makes each of the ~5 priority
    values ONE window task sorting ~20% of the table — a straggler at 100 TB.
    Instead: (1) band rows by a DETERMINISTIC pure function of the sort key
    (value-range slices from the global min/max — not repartitionByRange +
    spark_partition_id, whose sampled boundaries may differ between the two
    plan branches that reference them); (2) per-(band, group) counts give
    each band's rank offset (tiny aggregate, broadcast); (3) per-band local
    row_number + offset = exact global rank — each window task sorts only
    its band; (4) ntile is pure arithmetic on (rank, group count). Bucket
    assignment is engine-portable because (o_totalprice, o_orderkey) is a
    total order and bands are monotone in it."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    slices = 32
    stats = o.agg(
        F.min("o_totalprice").alias("_lo"), F.max("o_totalprice").alias("_hi")
    )
    band = F.least(
        F.lit(slices - 1),
        F.floor(
            (F.col("o_totalprice") - F.col("_lo"))
            / ((F.col("_hi") - F.col("_lo") + F.lit(1e-6)) / slices)
        ),
    ).cast("int")
    banded = o.crossJoin(F.broadcast(stats)).withColumn("_band", band)
    # Tiny: (band, group) row counts -> cumulative offset per band, and
    # the group totals off the SAME window pass (round 16, guide §2.4):
    # the two frames share one partitionBy, so both window functions ride
    # one exchange+sort of the ~(slices × |priorities|)-row aggregate —
    # the previous separate `totals` branch recomputed the whole
    # banded→pc chain (scan + two exchanges) and paid a second broadcast
    # join below.
    pc = banded.groupBy("_band", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    w_off = (
        Window.partitionBy("o_orderpriority")
        .orderBy("_band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy("o_orderpriority")
    offsets = pc.select(
        "_band",
        "o_orderpriority",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(w_tot).alias("_n"),
    )
    # Local sort covers only one band (bands are disjoint and monotone in
    # the total order, so offset + local row_number is the exact global
    # rank; a same-price tie can never straddle bands).
    w_local = Window.partitionBy("_band", "o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    ranked = (
        banded.withColumn("_lrn", F.row_number().over(w_local))
        .join(F.broadcast(offsets), ["_band", "o_orderpriority"])
        .withColumn("_rn", F.col("_off") + F.col("_lrn"))
    )
    # ntile(k): first (n % k) buckets hold ceil(n/k) rows, the rest floor.
    k = 4
    q_sz = F.col("_n") / k  # floor via div below
    big = (F.col("_n") % k) * (F.floor(q_sz) + 1)
    quartile = F.when(
        F.col("_rn") <= big, F.ceil(F.col("_rn") / (F.floor(q_sz) + 1))
    ).otherwise(
        (F.col("_n") % k)
        + F.ceil((F.col("_rn") - big) / F.greatest(F.floor(q_sz), F.lit(1)))
    )
    return (
        ranked.withColumn("quartile", quartile.cast("bigint"))
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("p").cast("double").alias("sum_price"),
        )
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
        d.select(
            "source", "doc_id", F.row_number().over(w).cast("bigint").alias("rn")
        )
        .filter(F.col("rn") <= 5)
    )


@register(
    "d8b_group_median",
    oracle="""
    SELECT o_orderpriority,
           round(median(o_totalprice), 6) AS median_price,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def d8b_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d8 extension — exact per-group median (the grouped form of the
    notebook's global median, data_analysis.ipynb:261 in the reference).
    Exact median sorts within groups; at 100 TB swap for
    percentile_approx (d8x) — the API shape is identical."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.median("o_totalprice"), 6).alias("median_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "d8c_group_quantiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), 6) AS q25,
           round(quantile_cont(o_totalprice, 0.50), 6) AS q50,
           round(quantile_cont(o_totalprice, 0.75), 6) AS q75
    FROM orders GROUP BY o_orderpriority
    """,
)
def d8c_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d8 extension — exact multi-quantile per group, emitted as SCALAR
    q25/q50/q75 columns (array outputs crash the driver's canonicalizer —
    VERDICT r2 item 3). Internally still ONE array-valued percentile
    aggregate (one sort per group serves all three cut points; both engines
    share the linear-interpolation definition — verified bit-exact, the
    round(…,6) is belt-and-braces). At 100 TB swap for percentile_approx
    with the identical call shape."""
    o = load(spark, sf_dir, "orders")
    qs = o.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))").alias("_qs")
    )
    return qs.select(
        "o_orderpriority",
        F.round(F.col("_qs")[0], 6).alias("q25"),
        F.round(F.col("_qs")[1], 6).alias("q50"),
        F.round(F.col("_qs")[2], 6).alias("q75"),
    )


@register(
    "h5b_string_functions",
    oracle="""
    SELECT doc_id,
           upper(source) AS src_up,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS id_pad,
           substring(text, 1, 10) AS prefix10,
           concat_ws('|', lang, source) AS lang_src,
           replace(substring(text, 1, 20), ' ', '_') AS snake20,
           length(text) - length(replace(text, ' ', '')) AS n_spaces
    FROM documents
    """,
)
def h5b_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h5 — string scalar set: case, padding, substring, multi-column
    concat, replace, and occurrence counting via length delta (all
    JVM-side, whole-stage codegen — the reference does string work
    row-at-a-time in Python, e.g. .apply(len))."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("source").alias("src_up"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("id_pad"),
        F.substring("text", 1, 10).alias("prefix10"),
        F.concat_ws("|", "lang", "source").alias("lang_src"),
        F.replace(
            F.substring("text", 1, 20), F.lit(" "), F.lit("_")
        ).alias("snake20"),
        (
            F.length("text") - F.length(F.replace("text", F.lit(" "), F.lit("")))
        ).alias("n_spaces"),
    )


@register(
    "x16_pmi_cooccurrence",
    oracle="""
    WITH words AS (SELECT DISTINCT doc_id,
                          unnest(string_split(text, ' ')) AS word
                   FROM documents),
    dfreq AS (SELECT word, count(*) AS df FROM words GROUP BY word),
    vocab AS (SELECT word, df FROM dfreq ORDER BY df DESC, word LIMIT 100),
    w AS (SELECT words.doc_id, words.word, vocab.df
          FROM words JOIN vocab USING (word)),
    n AS (SELECT count(*) AS n_docs FROM documents),
    pairs AS (SELECT a.word AS w1, b.word AS w2,
                     a.df AS df1, b.df AS df2, count(*) AS n_ab
              FROM w a JOIN w b ON a.doc_id = b.doc_id AND a.word < b.word
              GROUP BY a.word, b.word, a.df, b.df)
    SELECT w1, w2, n_ab,
           round(ln(CAST(n_ab AS DOUBLE) * n.n_docs / (df1 * df2)), 6) AS pmi
    FROM pairs CROSS JOIN n
    ORDER BY n_ab DESC, w1, w2 LIMIT 20
    """,
)
def x16_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x16 — pointwise mutual information over word co-occurrence (the
    collocation/phrase-mining primitive): top document-level co-occurring
    pairs among the 100 highest-document-frequency words.

    Scale shape: the quadratic blowup is tamed BEFORE the self-join — the
    vocabulary is pruned to a bounded top-V (broadcast), so pair volume is
    ≤ V²/2 per doc regardless of corpus size; the self-join shuffles on
    doc_id only. PMI math stays in exact integers until one fixed-order
    double divide + ln, so it is engine- and partitioning-portable.

    Persisting the multiply-referenced subtrees here was measured-REJECTED
    (PERF.md #17, re-confirmed round 16: `eager(words)` best 1.55 s vs
    1.20 s plain in the same session) — the recomputed explode+distinct is
    cheaper than the cache write+read+materialize round-trip at this
    shape, and the r4 ">2× baseline" flag was median-vs-best-of bias, not
    a plan defect (best-of 1.16 s vs the 0.72 s best-of-2 baseline row).

    Round 16 (guide §2.4, the r15 one-exchange shingle trick): the DOCS
    are hash-partitioned by doc_id BEFORE the explode — Generate preserves
    partitioning, so the (doc_id, word) dedup aggregates exchange-free and
    each copy of the subtree exchanges document rows, not word rows. The
    wa⋈wb self-join on doc_id then sees two co-partitioned children and
    plans with ZERO extra exchange (plan: the word-row hash exchanges are
    gone; sf0.1 a wash — best 1.20 vs 1.19 s — but the 10× fixture reads
    best 3.57 → 1.69 s, and at 100 TB the self-join no longer reshuffles
    the exploded corpus)."""
    docs = load(spark, sf_dir, "documents")
    words = (
        docs.repartition("doc_id")
        .select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .dropDuplicates(["doc_id", "word"])
    )
    dfreq = words.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    vocab = dfreq.orderBy(F.desc("df"), "word").limit(100)
    w = words.join(F.broadcast(vocab), "word")
    wa = w.select("doc_id", F.col("word").alias("w1"), F.col("df").alias("df1"))
    wb = w.select(
        F.col("doc_id").alias("doc_b"),
        F.col("word").alias("w2"),
        F.col("df").alias("df2"),
    )
    pairs = (
        wa.join(wb, (wa.doc_id == wb.doc_b) & (F.col("w1") < F.col("w2")))
        .groupBy("w1", "w2", "df1", "df2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        pairs.crossJoin(n)
        .select(
            "w1",
            "w2",
            "n_ab",
            F.round(
                F.log(
                    F.col("n_ab").cast("double")
                    * F.col("n_docs")
                    / (F.col("df1") * F.col("df2"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("n_ab"), "w1", "w2")
        .limit(20)
    )


@register(
    "c6b_interval_join_banded",
    oracle="""
    WITH p AS (SELECT event_id AS purchase_id, epoch_us(ts) AS p_us
               FROM events WHERE event_type = 'purchase'),
    v AS (SELECT event_id AS view_id, epoch_us(ts) AS v_us
          FROM events WHERE event_type = 'view')
    SELECT p.purchase_id, v.view_id, p.p_us - v.v_us AS us_apart
    FROM p JOIN v ON abs(p.p_us - v.v_us) <= 300000000
    """,
)
def c6b_interval_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c6 scale path — purchases × views within ±5 minutes, both sides
    fact-sized: the banded-equi-join form of a range join (see
    operators/windows.py:banded_interval_join for the scale argument). The
    oracle states the plain |Δt| ≤ tolerance predicate — banding is pure
    execution strategy, invisible in the result."""
    from ..operators.windows import banded_interval_join

    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("p_us"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.unix_micros("ts").alias("v_us"),
    )
    joined = banded_interval_join(p, v, "p_us", "v_us", 300_000_000)
    return joined.select(
        "purchase_id", "view_id", (F.col("p_us") - F.col("v_us")).alias("us_apart")
    )


@register(
    "x17_event_transitions",
    oracle="""
    WITH o AS (SELECT user_id, event_type,
                      lag(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS prev
               FROM events)
    SELECT prev, event_type AS next, count(*) AS n
    FROM o WHERE prev IS NOT NULL GROUP BY prev, next
    """,
)
def x17_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x17 — event-type transition matrix (first-order Markov counts over
    per-user event sequences): the behavioral-modeling / next-event-
    prediction feature table.

    Scale shape: one hash exchange by user feeds the lag window; the bigram
    agg then reduces to |types|² rows with map-side partials. Ordering is
    (ts, event_id) — a total order per user, so counts are partitioning-
    and engine-stable."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    return (
        o.groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _hex6(strtype: str) -> str:
    """First 6 md5 hex digits of doc_id as an integer in [0, 16^6) — the
    engine-portable uniform hash fraction (`strtype` differs per dialect:
    STRING for Spark, VARCHAR for DuckDB)."""
    return (
        "CAST("
        + " + ".join(
            f"(instr('0123456789abcdef', "
            f"substr(md5(CAST(doc_id AS {strtype})), {i + 1}, 1)) - 1)"
            f" * {16 ** (5 - i)}"
            for i in range(6)
        )
        + " AS BIGINT)"
    )


@register(
    "x21_balanced_sample",
    oracle=f"""
    WITH counts AS (SELECT lang, count(*) AS n_cls FROM documents GROUP BY lang),
    scored AS (
        SELECT d.doc_id, d.lang,
               {_hex6('VARCHAR')} AS hexval,
               CAST(floor(least(1.0, 100.0 / c.n_cls) * 16777216.0) AS BIGINT)
                   AS keep_below
        FROM documents d JOIN counts c USING (lang)
    )
    SELECT doc_id, lang FROM scored WHERE hexval < keep_below
    """,
)
def x21_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x21 — class-balanced deterministic downsampling: each language keeps
    ~min(1, target/|class|) of its rows, so hot classes shrink toward the
    target while rare classes pass through whole — the data-mixing step that
    applies d9-style class weights at the ROW level when building a training
    corpus.

    The keep decision is a pure function of the row key: the first 6 md5 hex
    digits as an integer in [0, 16^6), kept when below floor(p·16^6) — same
    digits, same arithmetic, in any engine at any parallelism (`sample()`'s
    seed is partition-dependent and not portable). Scale shape: class counts
    are a broadcast dim; the filter is a codegen'd scan predicate."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_cls"))
    hexval = F.expr(_hex6("STRING"))
    keep_below = F.floor(
        F.least(F.lit(1.0), F.lit(100.0) / F.col("n_cls")) * F.lit(16777216.0)
    ).cast("bigint")
    return (
        d.join(F.broadcast(counts), "lang")
        .filter(hexval < keep_below)
        .select("doc_id", "lang")
    )


@register(
    "x18_data_quality_audit",
    oracle="""
    WITH dup AS (SELECT count(*) AS v FROM (
             SELECT doc_id FROM documents GROUP BY doc_id HAVING count(*) > 1)),
    scan AS (SELECT
        sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS null_doc_id,
        sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END)
            AS empty_text,
        sum(CASE WHEN n_chars != length(text) THEN 1 ELSE 0 END)
            AS n_chars_mismatch,
        sum(CASE WHEN lang IS NULL
                      OR lang NOT IN ('de','en','es','fr','zh')
                 THEN 1 ELSE 0 END) AS lang_unknown,
        sum(CASE WHEN n_chars < 50 THEN 1 ELSE 0 END) AS text_below_min
        FROM documents)
    SELECT 'null_doc_id' AS check_name,
           CAST(null_doc_id AS BIGINT) AS violations FROM scan
    UNION ALL SELECT 'empty_text', CAST(empty_text AS BIGINT) FROM scan
    UNION ALL SELECT 'n_chars_mismatch',
                     CAST(n_chars_mismatch AS BIGINT) FROM scan
    UNION ALL SELECT 'lang_unknown', CAST(lang_unknown AS BIGINT) FROM scan
    UNION ALL SELECT 'text_below_min', CAST(text_below_min AS BIGINT) FROM scan
    UNION ALL SELECT 'dup_doc_id', CAST(v AS BIGINT) FROM dup
    """,
)
def x18_data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x18 — declarative data-quality audit (the expectations/constraints
    gate a lake pipeline runs before promoting a zone): null keys, duplicate
    keys, empty payloads, derived-column consistency (n_chars==length(text)),
    categorical domain, and minimum-length policy — one row per check with
    its violation count.

    Scale shape: all row-local checks ride ONE scan as conditional partial
    aggregates (a single 1-row-per-partition shuffle); only the uniqueness
    check needs a keyed exchange, and it aggregates to violating keys, not
    rows. At 100 TB this is the cheapest possible full-table audit: no
    second scan, no sort."""
    d = load(spark, sf_dir, "documents")
    one = F.lit(1)
    zero = F.lit(0)
    scan = d.agg(
        F.sum(F.when(F.col("doc_id").isNull(), one).otherwise(zero)).alias(
            "null_doc_id"
        ),
        F.sum(
            F.when(
                F.col("text").isNull() | (F.length("text") == 0), one
            ).otherwise(zero)
        ).alias("empty_text"),
        F.sum(
            F.when(F.col("n_chars") != F.length("text"), one).otherwise(zero)
        ).alias("n_chars_mismatch"),
        F.sum(
            F.when(
                F.col("lang").isNull()
                | ~F.col("lang").isin("de", "en", "es", "fr", "zh"),
                one,
            ).otherwise(zero)
        ).alias("lang_unknown"),
        F.sum(F.when(F.col("n_chars") < 50, one).otherwise(zero)).alias(
            "text_below_min"
        ),
    )
    long = scan.select(
        F.expr(
            "stack(5, 'null_doc_id', null_doc_id, 'empty_text', empty_text, "
            "'n_chars_mismatch', n_chars_mismatch, 'lang_unknown', lang_unknown, "
            "'text_below_min', text_below_min) AS (check_name, violations)"
        )
    )
    dup = (
        d.groupBy("doc_id")
        .agg(F.count(one).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(one).alias("violations"))
        .select(F.lit("dup_doc_id").alias("check_name"), "violations")
    )
    return long.unionByName(dup)


@register(
    "x19_bm25_topk",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs,
                     (SELECT avg(dl) FROM dl) AS avgdl
              FROM documents),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    query AS (SELECT term, df FROM dfreq ORDER BY df DESC, term LIMIT 3),
    contrib AS (
        SELECT tf.doc_id,
               CAST(floor(
                   ln(1.0 + (s.n_docs - q.df + 0.5) / (q.df + 0.5))
                   * ((CAST(tf.tf AS DOUBLE) * 2.2)
                      / (tf.tf + 1.2 * (0.25 + 0.75
                         * (CAST(dl.dl AS DOUBLE) / s.avgdl))))
                   * 1000000000.0) AS BIGINT) AS qs
        FROM tf JOIN query q USING (term)
               JOIN dl USING (doc_id)
               CROSS JOIN stats s
    )
    SELECT doc_id, count(*) AS n_terms,
           CAST(sum(qs) AS DOUBLE) / 1000000000.0 AS score
    FROM contrib GROUP BY doc_id
    ORDER BY sum(qs) DESC, doc_id LIMIT 10
    """,
)
def x19_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x19 — BM25 ranked retrieval (k1=1.2, b=0.75) for the corpus's 3
    highest-df terms: the lexical-search/quality-scoring complement to the
    embedding kNN path.

    Engine-portable float policy: each term's contribution is computed in
    one fixed expression shape (identical parenthesization in the oracle),
    then fixed-point-quantized to BIGINT before the per-doc sum — double
    addition is not associative across partitionings, integer addition is.
    Scale shape: TF/DL are map-side-combined aggregates of one exploded
    scan; the query table (top-V terms) broadcasts; stats is a 1-row
    crossJoin."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = docs.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        dl.agg(F.avg("dl").alias("avgdl"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    query = dfreq.orderBy(F.desc("df"), "term").limit(3)
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf").cast("double") * F.lit(2.2)) / (
        F.col("tf")
        + 1.2 * (F.lit(0.25) + F.lit(0.75) * (F.col("dl").cast("double") / F.col("avgdl")))
    )
    contrib = (
        tf.join(F.broadcast(query), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.floor(idf * tf_part * F.lit(1000000000.0)).cast("bigint").alias("qs"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("qs").alias("_sqs"),
        )
        .select(
            "doc_id",
            "n_terms",
            (F.col("_sqs").cast("double") / F.lit(1000000000.0)).alias("score"),
            F.col("_sqs"),
        )
        .orderBy(F.desc("_sqs"), "doc_id")
        .limit(10)
        .drop("_sqs")
    )


@register(
    "x15_embedding_centroids",
    oracle="""
    WITH flat AS (SELECT label, CAST(t.pos AS INT) AS pos,
                         embedding[CAST(t.pos AS INT) + 1] AS val
                  FROM embeddings, unnest(range(len(embedding))) AS t(pos)),
    q AS (SELECT label, pos,
                 CAST(least(greatest(floor(CAST(val AS DOUBLE) * 1000000),
                                     -1000000000000.0), 1000000000000.0)
                      AS BIGINT) AS qv
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
    # clamp to +-1e12 (coords beyond +-1e6 saturate): a garbage row must
    # not ANSI-overflow the BIGINT sum and kill the job at scale
    q = flat.select(
        "label",
        "pos",
        F.least(
            F.greatest(
                F.floor(F.col("val").cast("double") * 1000000), F.lit(-1e12)
            ),
            F.lit(1e12),
        )
        .cast("bigint")
        .alias("qv"),
    )
    return q.groupBy("label", "pos").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("qv").cast("double") / F.count(F.lit(1)) / F.lit(1000000.0)).alias(
            "centroid"
        ),
    )
