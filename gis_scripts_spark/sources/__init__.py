"""Sources/sinks: deterministic synthetic tables, snapshot-versioned
parquet tables (Iceberg-like), manifest scans."""
