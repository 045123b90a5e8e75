"""IO layer: sources (CSV with imposed schema, multi-path), sinks
(Parquet/CSV writers), zones (raw/staging/curated dirs), and s3a config."""
