"""Class-weight computation (SURVEY.md §2 d9/d10).

Reference behavior (/root/reference/src/preprocess_to_staging.py:172-179):
``w = 1/count`` per class, normalized ``w /= w.sum()``, rescaled
``w *= 1/w.max()`` so the rarest class gets weight 1.0 (the reference's
``min_weight`` variable actually holds the max — a naming bug, not a
semantics one).

Spark-first: one hash agg to class sizes (K rows), then two unpartitioned
window aggregates over those K rows. The empty-partition window is a single-
partition exchange of K rows only — bounded by class cardinality, never by
data size, so it holds at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .stats import group_sizes


def class_weights(
    df: DataFrame, class_col: str, weight_col: str = "weight", decimals: int = 6
) -> DataFrame:
    """Per-class weights: (1/n) / sum, rescaled so max weight == 1.0.

    Rounded to `decimals` so double bit-patterns are portable across engines
    (summation order differs between Spark and any oracle).
    """
    w_all = Window.partitionBy()  # single K-row frame; see module docstring
    sizes = group_sizes(df, class_col)
    w = F.lit(1.0) / F.col("n")
    wn = w / F.sum(w).over(w_all)
    weight = F.round(wn / F.max(wn).over(w_all), decimals)
    return sizes.select(F.col(class_col), weight.alias(weight_col))
