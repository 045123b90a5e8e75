"""Catalog entries for event-time windows (i1-i3 batch, i4-i5 streaming)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
from ..registry import load, register
from ..streaming.jobs import stream_dedup, stream_session_agg, stream_tumbling_agg

_TUMBLING_ORACLE = """
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY window_start, event_type
"""


@register("i1_tumbling_window", oracle=_TUMBLING_ORACLE)
def i1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i1 — 10-minute tumbling windows by event_type."""
    ev = load(spark, sf_dir, "events")
    return tumbling_window_agg(ev, "ts", ["event_type"])


@register(
    "i2_sliding_window",
    oracle="""
    WITH assigned AS (
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
               event_type, value
        FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'
                   AS window_start,
               event_type, value
        FROM events
    )
    SELECT window_start, event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM assigned GROUP BY window_start, event_type
    """,
)
def i2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i2 — 10-minute windows sliding by 5 (each event in 2 windows; the
    oracle materializes the two bucket assignments with UNION ALL)."""
    ev = load(spark, sf_dir, "events")
    return sliding_window_agg(ev, "ts", ["event_type"])


_SESSION_ORACLE = """
    WITH o AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL '5 minutes'
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    s AS (
        SELECT user_id, ts,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM o
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '5 minutes' AS session_end,
           count(*) AS n
    FROM s GROUP BY user_id, session_id
    """


@register("i3_session_window", oracle=_SESSION_ORACLE)
def i3_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i3 — per-user session windows (5-minute gap); the oracle is the
    classic gaps-and-islands rewrite (lag + running sum), window end =
    last event + gap ([start, end), Spark semantics)."""
    ev = load(spark, sf_dir, "events")
    return session_window_agg(ev, "ts", "user_id")


@register("i4_stream_tumbling", oracle=_TUMBLING_ORACLE)
def i4_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i4 — Structured Streaming tumbling agg with watermark, drained via
    memory sink in complete mode — batch-equivalent, so the i1 oracle
    applies verbatim."""
    return stream_tumbling_agg(spark, sf_dir)


@register("i8_stream_session", oracle=_SESSION_ORACLE)
def i8_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i8 — Structured Streaming session windows (the merging stateful
    aggregation), drained via memory sink in complete mode — batch-
    equivalent, so the i3 gaps-and-islands oracle applies verbatim."""
    return stream_session_agg(spark, sf_dir)


@register("i5_stream_dedup", oracle="SELECT DISTINCT event_id FROM events")
def i5_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i5 — stateful streaming dropDuplicates on event_id (append mode);
    the emitted set is the distinct ids regardless of arrival order."""
    return stream_dedup(spark, sf_dir)


@register(
    "e3b_sessionize",
    oracle="""
    WITH s AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         > INTERVAL '300 seconds'
                    THEN 1 ELSE 0 END AS brk
        FROM events
    ),
    sess AS (
        SELECT user_id, ts,
               CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM s
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def e3b_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e3 — gap-based sessionization with stable 0-based session ids
    (lag + running-sum-of-breaks over one partitioning by user); the
    window-function dual of i3's session_window."""
    from ..operators.windows import sessionize

    ev = load(spark, sf_dir, "events")
    return sessionize(ev, "ts", "user_id", "event_id", gap_seconds=300)


@register(
    "i10_stream_static_join",
    oracle="""
    WITH profile AS (
        SELECT user_id,
               CASE WHEN count(*) >= 200 THEN 'heavy'
                    WHEN count(*) >= 100 THEN 'mid'
                    ELSE 'light' END AS tier
        FROM events GROUP BY user_id
    )
    SELECT e.user_id, e.event_id, p.tier
    FROM events e JOIN profile p ON e.user_id = p.user_id
    WHERE e.event_type = 'purchase'
    """,
)
def i10_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i10 — stream-static enrichment: purchases on the stream join a
    batch-computed per-user tier dim (no stream state for the static side;
    broadcast per micro-batch on a cluster). Drained inner join = batch
    join, so the SQL oracle applies verbatim."""
    from ..streaming.jobs import stream_static_join

    return stream_static_join(spark, sf_dir)


@register(
    "i7_stream_interval_join",
    oracle="""
    SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
           v.ts AS view_ts, p.ts AS purchase_ts
    FROM events v
    JOIN events p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL '10 minutes'
    WHERE v.event_type = 'view' AND p.event_type = 'purchase'
    """,
)
def i7_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i7 — watermarked stream-stream interval join; inner-join emission
    makes the drained result equal the batch join (SQL oracle)."""
    from ..streaming.jobs import stream_interval_join

    return stream_interval_join(spark, sf_dir)


@register(
    "i11_stream_outer_join",
    oracle="""
    SELECT v.user_id, v.event_id AS view_id, v.ts AS view_ts,
           p.event_id AS purchase_id, p.ts AS purchase_ts
    FROM events v
    LEFT JOIN events p
      ON p.user_id = v.user_id AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL '10 minutes'
    WHERE v.event_type = 'view'
    """,
)
def i11_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i11 — stream-stream LEFT OUTER interval join, drained with a
    max-timestamp sentinel event pair (VERDICT r4 item 3): the sentinel
    pushes the terminal watermark past every real view's join horizon, so
    every unmatched view provably expires and null-extends — the drained
    result equals the batch left-outer join and the SQL oracle applies.
    The raw watermark-dependent drain (no sentinel) keeps its bounded-state
    contract in tests/test_stream_outer_join.py."""
    from ..streaming.jobs import stream_outer_interval_join

    out = stream_outer_interval_join(spark, sf_dir, with_sentinel=True)
    return out.withColumnRenamed("v_user", "user_id")


@register(
    "i12_stream_variant",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k
    FROM events GROUP BY window_start, event_type
    """,
)
def i12_stream_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i12 — streaming VariantType extraction + watermarked tumbling agg
    (streaming/jobs.py:stream_variant_agg); drained complete-mode, so the
    batch `json_extract` oracle applies verbatim."""
    from ..streaming.jobs import stream_variant_agg

    return stream_variant_agg(spark, sf_dir)
