"""Descriptive-statistics operators (SURVEY.md §2 group D + h1).

Reference behavior: the analysis notebook's ``munge_data`` and distribution
cells (/root/reference/data_analysis.ipynb cells 10/15/17) and the class-count
math in /root/reference/src/preprocess_to_staging.py:172-179 — all eager
pandas with row-wise ``.apply(len)``. Here every statistic is a declarative
aggregate: Catalyst plans a partial (map-side) + final hash aggregation, the
length expression runs in whole-stage codegen, and nothing ever leaves the
executors until the final handful of rows.

Scale notes (100 TB): group-by cardinality here is "classes" (~18K in the
reference workload) — tiny relative to rows, so partial aggregation collapses
the shuffle to ~K rows per task. Global (grouping-less) aggregates reduce to
one row per partition before the single-row final stage; there is no
``collect()``-then-compute anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def count_rows(df: DataFrame) -> DataFrame:
    """d1 — total row count (ref: data_analysis.ipynb cell 10 `data.shape[0]`)."""
    return df.agg(F.count(F.lit(1)).alias("n_rows"))


def count_distinct(df: DataFrame, col: str, approx: bool = False) -> DataFrame:
    """d2 — distinct count (ref: `.nunique()`); approx variant for scale."""
    agg = (
        F.approx_count_distinct(col) if approx else F.countDistinct(col)
    ).alias("n_distinct")
    return df.agg(agg)


def group_sizes(df: DataFrame, key: str) -> DataFrame:
    """d3 — per-group row counts (ref: `.groupby(col).size()`)."""
    return df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))


def group_size_stats(df: DataFrame, key: str) -> DataFrame:
    """d4 — min/max/mean over the d3 group sizes (two-level aggregation)."""
    return group_sizes(df, key).agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("n").alias("min_size"),
        F.max("n").alias("max_size"),
        F.round(F.avg("n"), 6).alias("avg_size"),
    )


def value_counts(df: DataFrame, col: str) -> DataFrame:
    """d5 — group counts, descending (ref: `.value_counts()`)."""
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.col(col))
    )


def distribution_of_sizes(df: DataFrame, key: str) -> DataFrame:
    """d6 — histogram of group sizes: how many groups have each size
    (ref: `family_size.value_counts().sort_index()`, two chained group-bys)."""
    return (
        group_sizes(df, key)
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .orderBy("n")
    )


def length_stats(df: DataFrame, text_col: str) -> DataFrame:
    """d7+d8+h1 — min/max/median over `length(text)`.

    The reference computes this with per-row Python ``.apply(len)``
    (data_analysis.ipynb cell 10); `F.length` is codegen'd JVM-side.
    Median is exact here; `percentile_approx` is the 100 TB-scale variant.
    """
    ln = F.length(text_col).cast("bigint")
    return df.agg(
        F.min(ln).alias("min_len"),
        F.max(ln).alias("max_len"),
        F.median(ln).alias("median_len"),
    )


def length_percentiles_approx(df: DataFrame, text_col: str) -> DataFrame:
    """d8 scale variant — approximate percentiles (single-pass sketch)."""
    ln = F.length(text_col).cast("bigint")
    return df.agg(
        F.percentile_approx(ln, F.lit(0.5)).alias("p50"),
        F.percentile_approx(ln, F.lit(0.9)).alias("p90"),
        F.percentile_approx(ln, F.lit(0.99)).alias("p99"),
    )


def histogram(df: DataFrame, col, width: float) -> DataFrame:
    """d11 — fixed-width histogram binning (ref: sns.histplot bins),
    as a pure expression: floor(x/width)*width → groupBy bin."""
    c = F.col(col) if isinstance(col, str) else col
    bin_col = (F.floor(c / F.lit(width)) * F.lit(width)).cast("double").alias("bin")
    return (
        df.select(bin_col)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("bin")
    )


def table_summary(df: DataFrame, text_col: str, class_col: str) -> DataFrame:
    """Flagship stats query — the notebook's ``munge_data`` cell re-targeted
    (ref: data_analysis.ipynb:243-261): one row with row count, class count,
    class-size min/max/avg, and text-length min/max/median.

    Two independent aggregation branches (row-level length stats; class-size
    stats over the d3 aggregate) combined with a 1-row × 1-row cross join —
    no data-sized shuffle beyond the class-count hash agg.
    """
    ln = F.length(text_col).cast("bigint")
    row_stats = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(ln).alias("min_len"),
        F.max(ln).alias("max_len"),
        F.median(ln).alias("median_len"),
    )
    size_stats = group_sizes(df, class_col).agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("n").alias("min_class_size"),
        F.max("n").alias("max_class_size"),
        F.round(F.avg("n"), 6).alias("avg_class_size"),
    )
    return row_stats.crossJoin(size_stats)
