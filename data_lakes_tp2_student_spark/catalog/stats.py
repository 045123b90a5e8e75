"""Group D (+h1) catalog entries: descriptive statistics on `documents`
(`text` ≈ sequence, `source` ≈ family_accession — SURVEY.md §7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import stats as S
from ..registry import load, register


@register(
    "flagship_summary",
    oracle="""
    WITH sizes AS (
        SELECT source, count(*) AS n FROM documents GROUP BY source
    ),
    size_stats AS (
        SELECT count(*) AS n_classes,
               min(n) AS min_class_size,
               max(n) AS max_class_size,
               round(avg(n), 6) AS avg_class_size
        FROM sizes
    ),
    row_stats AS (
        SELECT count(*) AS n_rows,
               min(length(text)) AS min_len,
               max(length(text)) AS max_len,
               median(length(text)) AS median_len
        FROM documents
    )
    SELECT * FROM row_stats CROSS JOIN size_stats
    """,
)
def flagship_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Notebook `munge_data` stats re-targeted at documents (d1-d8+h1)."""
    return S.table_summary(load(spark, sf_dir, "documents"), "text", "source")


@register("d1_count", oracle="SELECT count(*) AS n_rows FROM documents")
def d1_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d1 — row count (ref: data_analysis.ipynb cell 10)."""
    return S.count_rows(load(spark, sf_dir, "documents"))


@register(
    "d2_count_distinct",
    oracle="SELECT count(DISTINCT source) AS n_distinct FROM documents",
)
def d2_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d2 — exact distinct count (ref: `.nunique()`)."""
    return S.count_distinct(load(spark, sf_dir, "documents"), "source")


@register(
    "d2x_approx_count_distinct",
    # HLL sketch: exact hash match impossible, but the bound IS checkable
    # (VERDICT r9 item 5). approx_count_distinct's rsd=0.05 is a relative
    # STANDARD DEVIATION, not a hard guarantee (ADVICE r10) — the bound
    # here is PROBABILISTIC: +/-4 sigma = +/-20%, P(outside) < 1e-4 per
    # run under HLL++'s near-Gaussian error, so a gate failure means a
    # broken sketch, not bad luck. A regenerated fixture or different
    # source cardinality stays inside with the same confidence.
    tol_oracle="""
    SELECT CAST(floor(count(DISTINCT source) * 0.80) AS BIGINT) AS n_distinct_lo,
           CAST(ceil(count(DISTINCT source) * 1.20) AS BIGINT) AS n_distinct_hi
    FROM documents
    """,
)
def d2x_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d2 scale variant — approx_count_distinct (HyperLogLog++)."""
    return S.count_distinct(load(spark, sf_dir, "documents"), "source", approx=True)


@register(
    "d3_group_sizes",
    oracle="SELECT source, count(*) AS n FROM documents GROUP BY source",
)
def d3_group_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d3 — per-class sizes (ref: `.groupby('family_accession').size()`)."""
    return S.group_sizes(load(spark, sf_dir, "documents"), "source")


@register(
    "d4_group_size_stats",
    oracle="""
    WITH sizes AS (SELECT source, count(*) AS n FROM documents GROUP BY source)
    SELECT count(*) AS n_groups, min(n) AS min_size, max(n) AS max_size,
           round(avg(n), 6) AS avg_size
    FROM sizes
    """,
)
def d4_group_size_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d4 — agg-of-agg over class sizes."""
    return S.group_size_stats(load(spark, sf_dir, "documents"), "source")


@register(
    "d5_value_counts",
    oracle="""
    SELECT lang, count(*) AS count FROM documents
    GROUP BY lang ORDER BY count DESC, lang
    """,
)
def d5_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d5 — value_counts (ref: src/preprocess_to_staging.py:172)."""
    return S.value_counts(load(spark, sf_dir, "documents"), "lang")


@register(
    "d6_distribution_of_sizes",
    oracle="""
    WITH sizes AS (SELECT source, count(*) AS n FROM documents GROUP BY source)
    SELECT n, count(*) AS n_groups FROM sizes GROUP BY n ORDER BY n
    """,
)
def d6_distribution_of_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d6 — histogram of class sizes (ref: ipynb cell 15)."""
    return S.distribution_of_sizes(load(spark, sf_dir, "documents"), "source")


@register(
    "d7_d8_length_stats",
    oracle="""
    SELECT min(length(text)) AS min_len, max(length(text)) AS max_len,
           median(length(text)) AS median_len
    FROM documents
    """,
)
def d7_d8_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d7+d8+h1 — min/max/median of text length, no Python in the loop."""
    return S.length_stats(load(spark, sf_dir, "documents"), "text")


@register(
    "d8x_percentiles_approx",
    # percentile_approx (Greenwald-Khanna) guarantees rank error
    # <= N/accuracy with the default accuracy 10000; the returned value is
    # an actual dataset element, so the exact discrete quantiles at
    # p -/+ 2/10000 (2x the guarantee for slack) bound it (VERDICT r9
    # item 5). DuckDB quantile_disc is the exact discrete quantile.
    tol_oracle="""
    WITH lens AS (SELECT length(text) AS ln FROM documents)
    SELECT quantile_disc(ln, 0.4998) AS p50_lo, quantile_disc(ln, 0.5002) AS p50_hi,
           quantile_disc(ln, 0.8998) AS p90_lo, quantile_disc(ln, 0.9002) AS p90_hi,
           quantile_disc(ln, 0.9898) AS p99_lo, quantile_disc(ln, 0.9902) AS p99_hi
    FROM lens
    """,
)
def d8x_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d8 scale variant — percentile_approx sketch."""
    return S.length_percentiles_approx(load(spark, sf_dir, "documents"), "text")


@register(
    "d11_histogram",
    oracle="""
    SELECT CAST(floor(n_chars / 100.0) * 100.0 AS DOUBLE) AS bin,
           count(*) AS count
    FROM documents GROUP BY bin ORDER BY bin
    """,
)
def d11_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d11 — fixed-width histogram over n_chars (ref: ipynb cells 15/17)."""
    return S.histogram(load(spark, sf_dir, "documents"), "n_chars", 100.0)
