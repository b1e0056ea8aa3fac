"""Column-expression libraries (SURVEY.md §2.7).

All functions here return :class:`pyspark.sql.Column` (or build one), so they
compose inside whole-stage codegen — no Python UDFs.  The escape hatch for
genuinely non-SQL logic (vector math batches, future multimodal decode) is
the Arrow-vectorized helpers in :mod:`.similarity` / :mod:`.multimodal`.
"""
