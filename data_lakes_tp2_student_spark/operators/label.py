"""Label encoding + mapping application (SURVEY.md §2 e1 + c1).

Reference behavior: sklearn ``LabelEncoder.fit_transform`` assigns dense codes
0..K-1 in sorted (``np.unique``) order of the class values, in-place on the
pandas frame (/root/reference/src/preprocess_to_staging.py:124-128, repeated
via ``astype('category').cat.codes`` at :141). Spark has no stable row order,
so the in-place trick becomes its honest relational form: build a small
mapping dimension, then broadcast-join it back.

Scale notes: the mapping is bounded by class cardinality (~18K in the
reference workload) — the ``row_number`` over a global order is a single-
partition exchange over K rows only (never over the fact table), and the
apply side is a broadcast hash join: zero shuffle of the big table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def label_mapping(df: DataFrame, class_col: str, code_col: str = "class_encoded") -> DataFrame:
    """e1 — dense codes 0..K-1 in lexicographic class order (exact sklearn
    LabelEncoder semantics)."""
    w = Window.orderBy(F.col(class_col))
    return (
        df.select(class_col)
        .distinct()
        .select(
            F.col(class_col),
            (F.row_number().over(w) - F.lit(1)).cast("bigint").alias(code_col),
        )
    )


def apply_label_mapping(
    df: DataFrame, mapping: DataFrame, class_col: str
) -> DataFrame:
    """c1 — attach the per-class code via a broadcast hash join (the
    reference does this positionally in-place; relationally it is an
    equi-join on the class column)."""
    return df.join(F.broadcast(mapping), on=class_col, how="inner")


def label_encode(
    df: DataFrame, class_col: str, code_col: str = "class_encoded"
) -> DataFrame:
    """e1+c1 composed: df with a dense `class_encoded` column."""
    return apply_label_mapping(df, label_mapping(df, class_col, code_col), class_col)
