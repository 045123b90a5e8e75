"""Differential test: every registered query vs its DuckDB oracle.

This is the same gate the driver runs (CORRECTNESS_r{N}.json), executed
locally at a small scale factor so regressions surface before commit.
"""

from __future__ import annotations

import pytest

import data_lakes_tp2_student_spark.catalog  # noqa: F401  (populates REGISTRY)
from data_lakes_tp2_student_spark.registry import REGISTRY

from .oracle import compare_query


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    compare_query(spark, name, sf_dir)
