"""Reusable column-expression builders (portable across Spark and the
DuckDB oracle)."""
