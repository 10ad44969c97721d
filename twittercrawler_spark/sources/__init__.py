"""Sources/sinks: synthetic corpus generator + committed parquet tables."""
