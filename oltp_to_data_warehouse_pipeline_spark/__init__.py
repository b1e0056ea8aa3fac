"""PySpark-native analytics engine with the query/data-processing surface of
OGsiji/OLTP-TO-DATA-WAREHOUSE-Pipeline, rebuilt Spark-first.

Subpackages
-----------
- ``functions``  — column-expression libraries (cleaning, dates, JSON/CDC
  normalization, text analysis, similarity) — SURVEY.md §2.7.
- ``operators``  — composite DataFrame operators (dedup, top-k similarity,
  quality checks) — SURVEY.md §2.4/2.5 + LLM-pipeline extensions.
- ``plans``      — end-to-end pipelines (cleaning ETL, warehouse build,
  dashboard query set) — SURVEY.md §3.
- ``sources``    — batch sources/sinks (parquet/JDBC wrappers, upsert sink).
- ``streaming``  — CDC normalizer + Structured Streaming wiring — SURVEY.md §2.8.

Everything is DataFrame-first: logical plans go through Catalyst/AQE; no
driver-side row loops, no RDDs, no row-at-a-time Python UDFs in hot paths.
"""

from oltp_to_data_warehouse_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
