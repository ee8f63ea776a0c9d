"""Sources/sinks: synthetic fixture generators, the reference text format,
and parquet helpers."""
