"""Operator library: each module re-expresses one SURVEY.md §2 group as
idiomatic Spark DataFrame transforms (functions take DataFrames, return
DataFrames; no actions, no collect)."""
