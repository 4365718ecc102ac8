"""Table storage layer (Iceberg when available, parquet-dir fallback)."""
