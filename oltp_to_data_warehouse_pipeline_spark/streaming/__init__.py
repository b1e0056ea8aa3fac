"""Streaming CDC path (SURVEY.md §2.8, §3.3): JSON normalization, dynamic
schema inference with deterministic widening, last-writer-wins upsert, and
event-time window aggregates — all on Structured Streaming."""
