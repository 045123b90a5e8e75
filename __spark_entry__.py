"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query on sf0.001 (smoke).
``queries()`` — every implemented operator from SURVEY.md §2, keyed by its
stable id; each callable is ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — DuckDB-runnable SQL per query id (omitted for the
genuinely non-SQL-expressible ones → rows-only check).

Implementation lives in ``data_lakes_tp2_student_spark``; this file is a shim
over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from data_lakes_tp2_student_spark.catalog import REGISTRY  # noqa: E402
from data_lakes_tp2_student_spark.operators.stats import table_summary  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return table_summary(docs, text_col="text", class_col="source")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each query id that is SQL-expressible."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
