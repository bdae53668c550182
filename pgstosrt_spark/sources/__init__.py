"""Table sources: declared schemas, Iceberg-first readers with parquet
fallback, and the driver test tables."""
