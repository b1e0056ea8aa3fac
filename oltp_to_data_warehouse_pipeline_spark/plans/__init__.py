"""End-to-end pipelines: cleaning ETL, star-schema warehouse build, and the
analytic (dashboard) query set — SURVEY.md §3."""
