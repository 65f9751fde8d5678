"""Data-quality / governance operators (SURVEY §2.9 Q1–Q4, §2.3 J6/J7).

Re-expresses the reference's dbt business-rule macro
(``.kiro/specs/batch-analytics-layer/design.md:824-850``), the
one-row-per-date completeness test (design.md:734-742), the Lambda
reconciliation comparator with 5 % tolerance (design.md:749-814), and
referential-integrity anti-joins (batch requirements.md:110-111).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipe_spark.functions import money
from datapipe_spark.plans.marts import daily_business_metrics
from datapipe_spark.sources.tables import load_table


def rule_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 + U1: business-rule violation scan → UNION ALL of per-rule
    result sets (one row per violating entity), mirroring the dbt
    macro's shape (rule_name, entity_id, detail)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    neg_balance = customer.filter(F.col("c_acctbal") < 0).select(
        F.lit("negative_account_balance").alias("rule_name"),
        F.col("c_custkey").cast("long").alias("entity_id"),
        money("c_acctbal").cast("string").alias("detail"),
    )
    neg_amount = orders.filter(F.col("o_totalprice") < 0).select(
        F.lit("negative_order_amount").alias("rule_name"),
        F.col("o_orderkey").cast("long").alias("entity_id"),
        money("o_totalprice").cast("string").alias("detail"),
    )
    invalid_status = orders.filter(~F.col("o_orderstatus").isin("O", "F", "P")).select(
        F.lit("invalid_order_status").alias("rule_name"),
        F.col("o_orderkey").cast("long").alias("entity_id"),
        F.col("o_orderstatus").alias("detail"),
    )
    bad_qty = lineitem.filter(
        (F.col("l_quantity") <= 0) | (F.col("l_quantity") >= 50)
    ).select(
        F.lit("quantity_out_of_range").alias("rule_name"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long").alias("entity_id"),
        F.col("l_quantity").cast("int").cast("string").alias("detail"),
    )
    neg_price = part.filter(F.col("p_retailprice") < 0).select(
        F.lit("negative_product_price").alias("rule_name"),
        F.col("p_partkey").cast("long").alias("entity_id"),
        money("p_retailprice").cast("string").alias("detail"),
    )
    return (
        neg_balance.unionByName(neg_amount)
        .unionByName(invalid_status)
        .unionByName(bad_qty)
        .unionByName(neg_price)
    )


RULE_VIOLATIONS_SQL = """
SELECT 'negative_account_balance' AS rule_name,
       CAST(c_custkey AS BIGINT) AS entity_id,
       CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS detail
FROM customer WHERE c_acctbal < 0
UNION ALL
SELECT 'negative_order_amount', CAST(o_orderkey AS BIGINT),
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
FROM orders WHERE o_totalprice < 0
UNION ALL
SELECT 'invalid_order_status', CAST(o_orderkey AS BIGINT), o_orderstatus
FROM orders WHERE o_orderstatus NOT IN ('O', 'F', 'P')
UNION ALL
SELECT 'quantity_out_of_range',
       CAST(l_orderkey * 10 + l_linenumber AS BIGINT),
       CAST(CAST(l_quantity AS INT) AS VARCHAR)
FROM lineitem WHERE l_quantity <= 0 OR l_quantity >= 50
UNION ALL
SELECT 'negative_product_price', CAST(p_partkey AS BIGINT),
       CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS VARCHAR)
FROM part WHERE p_retailprice < 0
"""


def daily_completeness_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2: one-row-per-date completeness test over the daily mart
    (dbt singular test, design.md:734-742). Healthy data → 0 rows."""
    dbm = daily_business_metrics(spark, sf_dir)
    return (
        dbm.groupBy("order_date")
        .agg(F.count("*").alias("record_count"))
        .filter(F.col("record_count") != 1)
    )


DAILY_COMPLETENESS_SQL_TEMPLATE = """
WITH dbm AS ({dbm_sql})
SELECT order_date, COUNT(*) AS record_count
FROM dbm GROUP BY order_date HAVING COUNT(*) <> 1
"""


def orphan_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: referential-integrity anti-join — order_items whose order or
    product is missing (batch requirements.md:110-111). Healthy
    testdata → 0 rows; the operator is the deliverable."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    no_order = li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti").select(
        F.lit("missing_order").alias("violation"),
        F.col("l_orderkey").alias("fk_value"),
    )
    no_part = li.join(part, li.l_partkey == part.p_partkey, "left_anti").select(
        F.lit("missing_part").alias("violation"),
        F.col("l_partkey").alias("fk_value"),
    )
    return no_order.unionByName(no_part)


ORPHAN_LINEITEMS_SQL = """
SELECT 'missing_order' AS violation, l_orderkey AS fk_value
FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
UNION ALL
SELECT 'missing_part', l_partkey
FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
"""


def reconciliation(spark: SparkSession, sf_dir: str, tolerance: float = 0.05) -> DataFrame:
    """Q3 + J6: Lambda cross-layer reconciliation (design.md:749-814).

    Compares the same daily revenue metric computed through two
    independent paths — order headers (batch layer) vs line items
    (speed-layer stand-in) — joined per date with absolute/percent
    difference and a 5 % tolerance flag. TPC-H's invariant
    (totalprice = Σ extendedprice·(1+tax)·(1−discount)) makes the two
    paths agree on healthy data; the diff columns are the operator.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    batch_side = (
        orders.groupBy(F.to_date("o_orderdate").alias("metric_date"))
        .agg(
            F.sum(money("o_totalprice")).alias("_batch_rev"),
            F.count("*").alias("batch_orders"),
        )
    )
    line_rev = (
        money("l_extendedprice")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
        * (F.lit(1) + F.col("l_tax").cast("decimal(4,2)"))
    )
    speed_side = (
        li.join(orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.to_date("o_orderdate").alias("metric_date"))
        .agg(
            F.sum(line_rev).alias("_speed_rev"),
            F.countDistinct("l_orderkey").alias("speed_orders"),
        )
    )
    joined = batch_side.join(speed_side, "metric_date", "full_outer")
    batch_rev = F.coalesce(F.col("_batch_rev").cast("double"), F.lit(0.0))
    speed_rev = F.coalesce(F.col("_speed_rev").cast("double"), F.lit(0.0))
    pct_diff = F.when(
        batch_rev > 0, F.abs(batch_rev - speed_rev) / batch_rev
    ).otherwise(F.lit(1.0))
    return joined.select(
        "metric_date",
        batch_rev.alias("batch_revenue"),
        speed_rev.alias("speed_revenue"),
        F.coalesce("batch_orders", F.lit(0)).alias("batch_orders"),
        F.coalesce("speed_orders", F.lit(0)).alias("speed_orders"),
        F.abs(batch_rev - speed_rev).alias("abs_diff"),
        pct_diff.alias("pct_diff"),
        (pct_diff <= tolerance).alias("within_tolerance"),
    )


RECONCILIATION_SQL = """
WITH batch_side AS (
  SELECT CAST(o_orderdate AS DATE) AS metric_date,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS batch_rev,
         COUNT(*) AS batch_orders
  FROM orders GROUP BY 1
), speed_side AS (
  SELECT CAST(o.o_orderdate AS DATE) AS metric_date,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
             * (1 + CAST(l.l_tax AS DECIMAL(4,2)))) AS speed_rev,
         COUNT(DISTINCT l.l_orderkey) AS speed_orders
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1
)
SELECT COALESCE(b.metric_date, s.metric_date) AS metric_date,
  COALESCE(CAST(b.batch_rev AS DOUBLE), 0.0) AS batch_revenue,
  COALESCE(CAST(s.speed_rev AS DOUBLE), 0.0) AS speed_revenue,
  COALESCE(b.batch_orders, 0) AS batch_orders,
  COALESCE(s.speed_orders, 0) AS speed_orders,
  ABS(COALESCE(CAST(b.batch_rev AS DOUBLE), 0.0)
      - COALESCE(CAST(s.speed_rev AS DOUBLE), 0.0)) AS abs_diff,
  CASE WHEN COALESCE(CAST(b.batch_rev AS DOUBLE), 0.0) > 0 THEN
    ABS(COALESCE(CAST(b.batch_rev AS DOUBLE), 0.0)
        - COALESCE(CAST(s.speed_rev AS DOUBLE), 0.0))
      / COALESCE(CAST(b.batch_rev AS DOUBLE), 0.0)
    ELSE 1.0 END AS pct_diff,
  (CASE WHEN COALESCE(CAST(b.batch_rev AS DOUBLE), 0.0) > 0 THEN
    ABS(COALESCE(CAST(b.batch_rev AS DOUBLE), 0.0)
        - COALESCE(CAST(s.speed_rev AS DOUBLE), 0.0))
      / COALESCE(CAST(b.batch_rev AS DOUBLE), 0.0)
    ELSE 1.0 END) <= 0.05 AS within_tolerance
FROM batch_side b FULL OUTER JOIN speed_side s ON b.metric_date = s.metric_date
"""
