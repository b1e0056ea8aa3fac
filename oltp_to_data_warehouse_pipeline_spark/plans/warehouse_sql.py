"""The SQL warehouse-build path — `DB.sql` as Spark SQL (S7/S8, SURVEY §3.2).

The DataFrame builders in plans.warehouse and this SQL path produce the same
tables; this module exists because the reference's users drive the build
with SQL scripts, and Spark SQL hits the identical Catalyst plans.  Each
statement set is idempotent (DROP TABLE IF EXISTS → CTAS), the reference's
rebuild pattern (`DB.sql:24,51`).

Tables land in the session catalog (``spark.sql.warehouse.dir``); on a real
deployment the same statements target an external metastore and
date-partitioned parquet (PARTITIONED BY clause below) for partition
pruning (§4).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from oltp_to_data_warehouse_pipeline_spark.catalog import register_views

CUSTOMER_DIM_SQL = """
CREATE TABLE {target} USING parquet AS
SELECT c_custkey   AS customer_id,
       c_name      AS customer_name,
       CAST(c_nationkey AS INT)    AS nation_id,
       CAST(c_acctbal AS DOUBLE)   AS account_balance,
       c_mktsegment AS segment
FROM customer
"""

TRANSACTION_DIM_SQL = """
CREATE TABLE {target} USING parquet AS
SELECT concat_ws('-', l_orderkey, l_linenumber) AS transaction_id,
       CAST(l_shipdate AS DATE)                 AS transaction_date,
       CAST(l_extendedprice AS DOUBLE)          AS transaction_amount,
       CAST(abs(l_extendedprice) AS DOUBLE)     AS amount_updated,
       l_returnflag                             AS narration
FROM lineitem
"""

DIM_DATE_SQL = """
CREATE TABLE {target} USING parquet AS
SELECT DISTINCT
       date_format(o_orderdate, 'yyyyMMdd')         AS date_id,
       to_date(o_orderdate)                         AS date_full,
       CAST(year(o_orderdate) AS BIGINT)            AS year,
       CAST(month(o_orderdate) AS STRING)           AS month,
       CAST(quarter(o_orderdate) AS STRING)         AS quarter,
       CAST(weekofyear(o_orderdate) AS STRING)      AS week,
       CAST(day(o_orderdate) AS INT)                AS day,
       CAST(dayofweek(o_orderdate) - 1 AS INT)      AS day_of_week,
       date_format(o_orderdate, 'EEEE')             AS day_name,
       date_format(o_orderdate, 'MMMM')             AS month_name,
       CAST(CASE WHEN dayofweek(o_orderdate) IN (1, 7) THEN 0 ELSE 1 END AS INT) AS is_weekday,
       CAST(CASE WHEN (year(o_orderdate) % 4 = 0 AND year(o_orderdate) % 100 != 0)
                      OR year(o_orderdate) % 400 = 0 THEN 1 ELSE 0 END AS INT)   AS is_leapyear
FROM orders
WHERE o_orderdate IS NOT NULL
"""

FACT_SQL = """
CREATE TABLE {target} USING parquet
PARTITIONED BY (order_year) AS
SELECT xxhash64(o_orderkey)                 AS fact_id,
       o_orderkey                           AS order_id,
       o_custkey                            AS customer_id,
       to_date(o_orderdate)                 AS order_date,
       date_format(o_orderdate, 'yyyyMMdd') AS date_id,
       CAST(o_totalprice AS DOUBLE)         AS amount,
       o_orderstatus                        AS status,
       CAST(year(o_orderdate) AS INT)       AS order_year
FROM orders
"""

ANALYTIC_SQL = """
SELECT r.r_name AS region, n.n_name AS nation,
       round(sum(f.amount), 2) AS total_revenue,
       count(*)                AS num_orders
FROM {fact} f
JOIN {cust} c ON f.customer_id = c.customer_id
JOIN nation n ON c.nation_id = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""

BUILD_ORDER = (
    ("customer_dim", CUSTOMER_DIM_SQL),
    ("transaction_dim", TRANSACTION_DIM_SQL),
    ("dim_date", DIM_DATE_SQL),
    ("loan_facts", FACT_SQL),
)


def build_warehouse(spark: SparkSession, sf_dir: str, prefix: str = "wh_") -> list[str]:
    """Run the full DDL+transform script: register sources, rebuild each
    warehouse table idempotently, return the table names created."""
    register_views(spark, sf_dir)
    created = []
    for name, stmt in BUILD_ORDER:
        target = f"{prefix}{name}"
        spark.sql(f"DROP TABLE IF EXISTS {target}")  # S8 idempotent rebuild
        spark.sql(stmt.format(target=target))
        created.append(target)
    return created


def analytic_query(spark: SparkSession, prefix: str = "wh_"):
    """The star-join analytic aggregate over the SQL-built warehouse
    (`DB.sql:109-124`, B7 fixed)."""
    return spark.sql(ANALYTIC_SQL.format(fact=f"{prefix}loan_facts", cust=f"{prefix}customer_dim"))
