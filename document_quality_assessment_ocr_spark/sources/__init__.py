"""Sources/sinks (SURVEY.md §2.1): parquet/Iceberg-style table readers with
explicit schemas, plus the deterministic fixture corpus generator."""
