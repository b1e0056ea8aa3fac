"""Composite DataFrame operators: deduplication, similarity search, data
quality — SURVEY.md §2.4/2.5 plus the LLM-data-pipeline extensions."""
