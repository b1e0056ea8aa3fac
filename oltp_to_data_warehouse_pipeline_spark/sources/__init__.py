"""Batch sources/sinks: parquet layout helpers, JDBC wrappers, and the
idempotent key-upsert sink (SURVEY.md §2.1)."""
