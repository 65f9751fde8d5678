"""Batch analytics marts (reference Snowflake/dbt layer).

Re-expresses the four marts of
``.kiro/specs/batch-analytics-layer/design.md:491-614`` and the dbt
``daily_business_metrics`` model (design.md:658-730) over the driver
testdata (domain mapping FIXTURES.md §6: customer≈users, part≈products,
orders≈orders, lineitem≈order_items; ``c_mktsegment``≈tier,
``p_brand``≈category).

Scale notes (100 TB):
- All aggregations are single-shuffle groupBys with map-side partial
  aggregation (Catalyst HashAggregate pairs).
- ``first_order`` per customer is an aggregate of orders, then joined
  back on the grouping key — at scale both sides are shuffle-partitioned
  on ``o_custkey`` so the join reuses the aggregation's partitioning
  (no extra shuffle; AQE handles skew).
- Money stays DECIMAL(18,2) until the final projection so partial sums
  are exact and order-independent across any number of partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipe_spark.functions import money, ratio
from datapipe_spark.sources.tables import load_table

def _zero_money():
    return F.lit(0).cast("decimal(18,2)")


def _global_cume_dist(
    df: DataFrame, val_col: str, id_col: str, out_col: str, n_buckets: int = 32
) -> DataFrame:
    """``CUME_DIST() OVER (ORDER BY val, id)`` without a
    single-partition global window — the 100 TB-safe formulation.

    A plain unpartitioned window moves EVERY row to one task (Spark
    warns "No Partition Defined"); fine for thousands of customers,
    fatal for hundreds of millions. Distributed equivalent, exact for
    unique ``id``: (1) one tiny action computes ``percentile_approx``
    bucket boundaries of ``val`` (any boundaries are *correct* — they
    only balance work; offsets repair whatever split results), (2)
    rows bucket by boundary comparison (ties on a boundary stay in one
    bucket, so buckets are contiguous in (val, id) order), (3)
    row_number within each bucket's window + the broadcast-joined
    cumulative count of earlier buckets gives the exact global rank;
    rank/N is CUME_DIST because ``id`` makes the sort key unique.
    Per-bucket windows parallelize; the counts table is O(n_buckets).
    """
    from pyspark.sql import Window

    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.agg(F.percentile_approx(val_col, qs, 10_000).alias("b")).first()["b"]
    bounds = sorted(set(bounds or []))
    bucket = sum(
        (F.when(F.col(val_col) > F.lit(b), 1).otherwise(0) for b in bounds),
        start=F.lit(0),
    )
    b = df.withColumn("_bkt", bucket)
    counts = (
        b.groupBy("_bkt")
        .agg(F.count("*").alias("_cnt"))
        .select(
            "_bkt",
            (
                F.sum("_cnt").over(
                    Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
                )
            ).alias("_off"),
            F.sum("_cnt").over(Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )).alias("_tot"),
        )
    )
    w = Window.partitionBy("_bkt").orderBy(F.col(val_col), F.col(id_col))
    return (
        b.join(F.broadcast(counts), "_bkt")
        .withColumn(
            out_col,
            (F.row_number().over(w) + F.coalesce("_off", F.lit(0))).cast("double")
            / F.col("_tot"),
        )
        .drop("_bkt", "_off", "_tot")
    )


def _orders_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized orders: event date + exact money amount."""
    return load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("order_date"),
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        money("o_totalprice").alias("amount"),
    )


def daily_business_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 1-row-per-date business rollup.

    Reference: dbt model ``daily_business_metrics``
    (batch design.md:658-730) — daily order counts, conditional
    status counts (A2), new-vs-returning customer split via first
    order date (A3/A4, design.md:677-685), revenue, and zero-guarded
    ratio KPIs (A11, design.md:717-724).

    Status mapping (testdata TPC-H codes): F=completed, O=open,
    P=partial ≈ delivered/pending/processing.
    """
    o = _orders_base(spark, sf_dir)
    first = o.groupBy("o_custkey").agg(F.min("order_date").alias("first_order_date"))
    # join back on the grouping key: co-partitioned with the agg above
    enriched = o.join(first, "o_custkey")
    is_new = F.col("first_order_date") == F.col("order_date")
    # Two-level aggregation instead of groupBy(date) with two
    # countDistincts: multiple distinct aggregates plan as an Expand
    # that triples the shuffled rows. Level 1 groups by (date,
    # customer) — after it, customers are unique per date, so the
    # distincts become plain counts. Same result, 1/3 the shuffle
    # volume at any scale.
    per_dc = enriched.groupBy("order_date", "o_custkey").agg(
        F.count("*").alias("_n"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("_nf"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("_no"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("_np"),
        # is_new is constant within the (date, customer) group
        F.max(is_new.cast("int")).alias("_is_new"),
        F.sum("amount").alias("_amt"),
    )
    daily = per_dc.groupBy("order_date").agg(
        F.sum("_n").alias("total_orders"),
        F.sum("_nf").alias("completed_orders"),
        F.sum("_no").alias("open_orders"),
        F.sum("_np").alias("partial_orders"),
        F.count("*").alias("unique_customers"),
        F.sum("_is_new").alias("new_customers"),
        F.sum("_amt").alias("_rev"),
        F.sum(F.when(F.col("_is_new") == 1, F.col("_amt")).otherwise(_zero_money())).alias(
            "_new_rev"
        ),
    )
    return daily.select(
        "order_date",
        "total_orders",
        "completed_orders",
        "open_orders",
        "partial_orders",
        "unique_customers",
        "new_customers",
        (F.col("unique_customers") - F.col("new_customers")).alias("returning_customers"),
        F.col("_rev").cast("double").alias("total_revenue"),
        F.col("_new_rev").cast("double").alias("new_customer_revenue"),
        (F.col("_rev").cast("double") / F.col("total_orders")).alias("avg_order_value"),
        ratio(F.col("new_customers"), F.col("unique_customers")).alias("acquisition_rate"),
        ratio(F.col("completed_orders"), F.col("total_orders")).alias("completion_rate"),
    )


DAILY_BUSINESS_METRICS_SQL = """
WITH o AS (
  SELECT CAST(o_orderdate AS DATE) AS order_date, o_orderkey, o_custkey,
         o_orderstatus, CAST(o_totalprice AS DECIMAL(18,2)) AS amount
  FROM orders
), first_order AS (
  SELECT o_custkey, MIN(order_date) AS first_order_date FROM o GROUP BY o_custkey
)
SELECT order_date,
  COUNT(*) AS total_orders,
  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS completed_orders,
  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS open_orders,
  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS partial_orders,
  COUNT(DISTINCT o.o_custkey) AS unique_customers,
  COUNT(DISTINCT CASE WHEN first_order_date = order_date THEN o.o_custkey END)
    AS new_customers,
  COUNT(DISTINCT o.o_custkey)
    - COUNT(DISTINCT CASE WHEN first_order_date = order_date THEN o.o_custkey END)
    AS returning_customers,
  CAST(SUM(amount) AS DOUBLE) AS total_revenue,
  CAST(SUM(CASE WHEN first_order_date = order_date THEN amount
                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
    AS new_customer_revenue,
  CAST(SUM(amount) AS DOUBLE) / COUNT(*) AS avg_order_value,
  CASE WHEN COUNT(DISTINCT o.o_custkey) > 0 THEN
    CAST(COUNT(DISTINCT CASE WHEN first_order_date = order_date
                             THEN o.o_custkey END) AS DOUBLE)
      / COUNT(DISTINCT o.o_custkey) ELSE 0.0 END AS acquisition_rate,
  CASE WHEN COUNT(*) > 0 THEN
    CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS DOUBLE) / COUNT(*)
    ELSE 0.0 END AS completion_rate
FROM o JOIN first_order ON o.o_custkey = first_order.o_custkey
GROUP BY order_date
"""


def customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer 360 metrics: users ⟕ orders ⟕ order_items + multi-agg.

    Reference: ``calculateCustomerMetrics`` (batch design.md:158-177,
    J1 + A1): count/sum/avg/max/min/countDistinct per customer.

    Implemented as two key-local aggregations (orders→customer,
    lineitem→order→customer) joined to the dimension, instead of the
    reference's single fanned-out join+agg — same result, but no
    row-multiplication before aggregation (at 100 TB the pre-agg
    shrinks the shuffle by ~|lineitem|/|customer|).
    """
    customer = load_table(spark, sf_dir, "customer")
    o = _orders_base(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")

    per_cust_orders = o.groupBy("o_custkey").agg(
        F.count("*").alias("total_orders"),
        F.sum("amount").alias("_spent"),
        F.min("order_date").alias("first_order_date"),
        F.max("order_date").alias("last_order_date"),
    )
    # lineitem → order-level key, then customer-level rollup
    li_cost = (money("l_extendedprice") * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))).alias(
        "net_price"
    )
    items = li.select("l_orderkey", "l_partkey", "l_quantity", li_cost)
    per_cust_items = (
        items.join(o.select("o_orderkey", "o_custkey"), items.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("total_items"),
            F.sum("l_quantity").alias("total_quantity"),
            F.sum("net_price").alias("_item_value"),
            F.countDistinct("l_partkey").alias("distinct_parts"),
        )
    )
    out = (
        customer.withColumnRenamed("c_custkey", "customer_id")
        .join(per_cust_orders.withColumnRenamed("o_custkey", "customer_id"), "customer_id", "left")
        .join(per_cust_items.withColumnRenamed("o_custkey", "customer_id"), "customer_id", "left")
    )
    return out.select(
        "customer_id",
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("market_segment"),
        F.coalesce("total_orders", F.lit(0)).alias("total_orders"),
        F.coalesce(F.col("_spent"), _zero_money()).cast("double").alias("total_spent"),
        F.when(
            F.col("total_orders") > 0, F.col("_spent").cast("double") / F.col("total_orders")
        ).otherwise(F.lit(0.0)).alias("avg_order_value"),
        "first_order_date",
        "last_order_date",
        F.coalesce("total_items", F.lit(0)).alias("total_items"),
        F.coalesce("total_quantity", F.lit(0.0)).alias("total_quantity"),
        F.coalesce(F.col("_item_value"), _zero_money()).cast("double").alias("gross_item_value"),
        F.coalesce("distinct_parts", F.lit(0)).alias("distinct_parts"),
    )


CUSTOMER_METRICS_SQL = """
WITH o AS (
  SELECT CAST(o_orderdate AS DATE) AS order_date, o_orderkey, o_custkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS amount
  FROM orders
), per_cust_orders AS (
  SELECT o_custkey AS customer_id, COUNT(*) AS total_orders,
         SUM(amount) AS spent,
         MIN(order_date) AS first_order_date, MAX(order_date) AS last_order_date
  FROM o GROUP BY o_custkey
), per_cust_items AS (
  SELECT o.o_custkey AS customer_id,
         COUNT(*) AS total_items,
         SUM(l.l_quantity) AS total_quantity,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS item_value,
         COUNT(DISTINCT l.l_partkey) AS distinct_parts
  FROM lineitem l JOIN o ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey
)
SELECT c.c_custkey AS customer_id,
       c.c_name AS customer_name,
       c.c_mktsegment AS market_segment,
       COALESCE(po.total_orders, 0) AS total_orders,
       CAST(COALESCE(po.spent, 0) AS DOUBLE) AS total_spent,
       CASE WHEN COALESCE(po.total_orders, 0) > 0
            THEN CAST(po.spent AS DOUBLE) / po.total_orders ELSE 0.0 END
         AS avg_order_value,
       po.first_order_date, po.last_order_date,
       COALESCE(pi.total_items, 0) AS total_items,
       COALESCE(pi.total_quantity, 0.0) AS total_quantity,
       CAST(COALESCE(pi.item_value, 0) AS DOUBLE) AS gross_item_value,
       COALESCE(pi.distinct_parts, 0) AS distinct_parts
FROM customer c
LEFT JOIN per_cust_orders po ON c.c_custkey = po.customer_id
LEFT JOIN per_cust_items pi ON c.c_custkey = pi.customer_id
"""


def product_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product mart with in-category ranks + top-performer flag.

    Reference: ``product_performance`` mart (batch design.md:556-572):
    J4 order_items⋈products, W1 rank within category by revenue/units,
    W2 top-20 %-in-category flag via percent_rank.

    The part dimension is broadcast (small vs lineitem at any scale);
    ranks are computed per category partition — bounded cardinality, so
    the window shuffle is cheap.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    net = money("l_extendedprice") * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    per_product = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_retailprice")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_partkey", "p_brand")
        .agg(
            F.count("*").alias("order_lines"),
            F.sum("l_quantity").alias("units_sold"),
            F.sum(net).alias("_revenue"),
        )
    )
    w_rev = Window.partitionBy("p_brand").orderBy(F.col("_revenue").desc(), F.col("p_partkey"))
    w_units = Window.partitionBy("p_brand").orderBy(
        F.col("units_sold").desc(), F.col("p_partkey")
    )
    return per_product.select(
        F.col("p_partkey").alias("product_id"),
        F.col("p_brand").alias("category"),
        "order_lines",
        "units_sold",
        F.col("_revenue").cast("double").alias("revenue"),
        F.rank().over(w_rev).alias("revenue_rank_in_category"),
        F.rank().over(w_units).alias("units_rank_in_category"),
        (F.percent_rank().over(w_rev) <= 0.2).alias("is_top_performer"),
    )


PRODUCT_PERFORMANCE_SQL = """
WITH per_product AS (
  SELECT p.p_partkey AS product_id, p.p_brand AS category,
         COUNT(*) AS order_lines,
         SUM(l.l_quantity) AS units_sold,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS revenue_d
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_partkey, p.p_brand
)
SELECT product_id, category, order_lines, units_sold,
       CAST(revenue_d AS DOUBLE) AS revenue,
       RANK() OVER (PARTITION BY category ORDER BY revenue_d DESC, product_id)
         AS revenue_rank_in_category,
       RANK() OVER (PARTITION BY category ORDER BY units_sold DESC, product_id)
         AS units_rank_in_category,
       PERCENT_RANK() OVER (PARTITION BY category ORDER BY revenue_d DESC, product_id) <= 0.2
         AS is_top_performer
FROM per_product
"""


GLOBAL_SORT_MAX_ROWS = 1_000_000  # single-task window cutover


def customer_analytics(
    spark: SparkSession, sf_dir: str, distributed_quantiles: bool | None = None
) -> DataFrame:
    """Customer lifetime analytics with tier assignment.

    Reference: ``customer_analytics`` mart (batch design.md:576-614):
    W3 avg days between orders (lag-based in the reference; computed
    here with the algebraically-equal closed form
    (last-first)/(n-1)), W4 first/last order dates, F9 date diffs, and
    W9 spend-quantile tier assignment (bronze 60% / silver 25% /
    gold 12% / platinum 3% — batch tasks.md:236-241) via cume_dist.

    Activity flags use the dataset's max order date as "today" so the
    query is deterministic (reference uses current_date, design.md:606).
    """
    o = _orders_base(spark, sf_dir)
    per_cust = o.groupBy("o_custkey").agg(
        F.count("*").alias("order_count"),
        F.sum("amount").alias("_spent"),
        F.min("order_date").alias("first_order_date"),
        F.max("order_date").alias("last_order_date"),
    )
    # The spend CUME_DIST needs a global (val, id) order. A plain
    # unpartitioned window moves every customer to ONE task — fine for
    # thousands, fatal for the hundreds of millions a 100 TB corpus
    # holds. Adaptive cutover ("measure, don't guess"): a parquet
    # METADATA count of the customer dimension (row-group stats, no
    # scan) picks the single-window form below GLOBAL_SORT_MAX_ROWS
    # and the bucketed distributed form (`_global_cume_dist`,
    # output-identical) above it. Both paths are oracle-checked.
    if distributed_quantiles is None:
        distributed_quantiles = (
            load_table(spark, sf_dir, "customer").count() > GLOBAL_SORT_MAX_ROWS
        )
    if distributed_quantiles:
        # three consumers (quantile boundaries, anchor scalar, ranked
        # output): checkpoint once so the orders scan+aggregation
        # doesn't re-run per consumer — blocks are freed by the
        # ContextCleaner when the result frame is dropped
        per_cust = per_cust.localCheckpoint(eager=True)
        ranked = _global_cume_dist(per_cust, "_spent", "o_custkey", "_spend_pct")
    else:
        from pyspark.sql import Window

        ranked = per_cust.withColumn(
            "_spend_pct",
            F.cume_dist().over(
                Window.partitionBy().orderBy(F.col("_spent"), F.col("o_custkey"))
            ),
        )
    # dataset anchor date as a broadcast scalar either way (a
    # global-window MAX would also single-task the big table)
    anchor_df = per_cust.agg(F.max("last_order_date").alias("_anchor"))
    anchor = F.col("_anchor")
    enriched = ranked.crossJoin(F.broadcast(anchor_df)).select(
        F.col("o_custkey").alias("customer_id"),
        "order_count",
        F.col("_spent").cast("double").alias("total_spent"),
        "first_order_date",
        "last_order_date",
        F.when(
            F.col("order_count") > 1,
            F.datediff("last_order_date", "first_order_date")
            / (F.col("order_count") - F.lit(1)).cast("double"),
        ).alias("avg_days_between_orders"),
        F.datediff(anchor, F.col("last_order_date")).alias("days_since_last_order"),
        (F.datediff(anchor, F.col("last_order_date")) <= 90).alias("is_active_90d"),
        (F.datediff(anchor, F.col("last_order_date")) <= 180).alias("is_active_180d"),
        "_spend_pct",
    )
    tier = (
        F.when(F.col("_spend_pct") <= 0.60, "bronze")
        .when(F.col("_spend_pct") <= 0.85, "silver")
        .when(F.col("_spend_pct") <= 0.97, "gold")
        .otherwise("platinum")
    )
    return enriched.withColumn("customer_tier", tier).drop("_spend_pct")


CUSTOMER_ANALYTICS_SQL = """
WITH o AS (
  SELECT CAST(o_orderdate AS DATE) AS order_date, o_custkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS amount
  FROM orders
), per_cust AS (
  SELECT o_custkey AS customer_id, COUNT(*) AS order_count,
         SUM(amount) AS spent,
         MIN(order_date) AS first_order_date, MAX(order_date) AS last_order_date
  FROM o GROUP BY o_custkey
), anchored AS (
  SELECT *, MAX(last_order_date) OVER () AS anchor,
         CUME_DIST() OVER (ORDER BY spent, customer_id) AS spend_pct
  FROM per_cust
)
SELECT customer_id, order_count, CAST(spent AS DOUBLE) AS total_spent,
       first_order_date, last_order_date,
       CASE WHEN order_count > 1 THEN
         CAST(DATEDIFF('day', first_order_date, last_order_date) AS DOUBLE)
           / (order_count - 1) END AS avg_days_between_orders,
       DATEDIFF('day', last_order_date, anchor) AS days_since_last_order,
       DATEDIFF('day', last_order_date, anchor) <= 90 AS is_active_90d,
       DATEDIFF('day', last_order_date, anchor) <= 180 AS is_active_180d,
       CASE WHEN spend_pct <= 0.60 THEN 'bronze'
            WHEN spend_pct <= 0.85 THEN 'silver'
            WHEN spend_pct <= 0.97 THEN 'gold'
            ELSE 'platinum' END AS customer_tier
FROM anchored
"""


def market_segment_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-segment rollup (customer_tier_analytics stand-in).

    Reference: ``customer_tier_analytics`` mart — date × tier grain
    (batch design.md:517-553); testdata tier ≈ ``c_mktsegment``.
    J2 inner join orders⋈users (design.md:681-682).

    Customer dim joins broadcast at test SF; at 100 TB the join keys
    are shuffle-partitioned and AQE picks sort-merge vs broadcast.
    """
    o = _orders_base(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = o.join(c, o.o_custkey == c.c_custkey)
    return (
        joined.groupBy("order_date", F.col("c_mktsegment").alias("market_segment"))
        .agg(
            F.count("*").alias("total_orders"),
            F.countDistinct("o_custkey").alias("unique_customers"),
            F.sum("amount").alias("_rev"),
        )
        .select(
            "order_date",
            "market_segment",
            "total_orders",
            "unique_customers",
            F.col("_rev").cast("double").alias("total_revenue"),
            (F.col("_rev").cast("double") / F.col("total_orders")).alias("avg_order_value"),
        )
    )


MARKET_SEGMENT_DAILY_SQL = """
SELECT CAST(o.o_orderdate AS DATE) AS order_date,
       c.c_mktsegment AS market_segment,
       COUNT(*) AS total_orders,
       COUNT(DISTINCT o.o_custkey) AS unique_customers,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
         AS avg_order_value
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1, 2
"""


def product_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: per-product repeat-buyer analytics — "customer bought this
    product on an earlier date before" (batch design.md:566-567),
    expressed as a two-level aggregation instead of the reference's
    self-join: (customer, product) purchase-date spans first, then a
    product rollup. Same semantics, no row-multiplying self-join —
    at 100 TB the (custkey, partkey) pre-aggregation is one shuffle
    and the second rollup is map-side-combinable.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = _orders_base(spark, sf_dir).select("o_orderkey", "o_custkey", "order_date")
    per_cust_prod = (
        li.join(o, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_partkey", "o_custkey")
        .agg(F.countDistinct("order_date").alias("n_dates"))
    )
    return per_cust_prod.groupBy(F.col("l_partkey").alias("product_id")).agg(
        F.count("*").alias("n_buyers"),
        F.count(F.when(F.col("n_dates") >= 2, 1)).alias("repeat_buyers"),
        F.when(
            F.count("*") > 0,
            F.count(F.when(F.col("n_dates") >= 2, 1)).cast("double") / F.count("*"),
        )
        .otherwise(F.lit(0.0))
        .alias("repeat_rate"),
    )


PRODUCT_REPEAT_CUSTOMERS_SQL = """
WITH per_cp AS (
  SELECT l_partkey, o_custkey, COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS n_dates
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_partkey, o_custkey
)
SELECT l_partkey AS product_id,
       COUNT(*) AS n_buyers,
       COUNT(CASE WHEN n_dates >= 2 THEN 1 END) AS repeat_buyers,
       CASE WHEN COUNT(*) > 0 THEN
         CAST(COUNT(CASE WHEN n_dates >= 2 THEN 1 END) AS DOUBLE) / COUNT(*)
       ELSE 0.0 END AS repeat_rate
FROM per_cp GROUP BY l_partkey
"""
