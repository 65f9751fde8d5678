"""Time-series and multidimensional analytics: moving windows, anomaly
scores, pivots, rollups (SURVEY §2.4/§2.5 — the aggregate/window
families — extended with the Spark operator surfaces the inventory
had not yet exercised: RANGE window frames, ``pivot``, ``rollup`` /
``grouping_id``).

Engine-parity discipline: every score here is built from integer or
DECIMAL window sums (exact, order-independent) with at most ONE
double division/sqrt at the end — deterministic IEEE ops — so the
oracle comparison is bit-strict without ROUND guards.

Scale notes:
- RANGE frames order within a partition; `daily_revenue_rolling`
  windows over the *daily* rollup (≤ a few thousand rows per year at
  any corpus size) — the raw-fact shuffle happens once in the keyed
  pre-aggregation, never in the window.
- ``pivot`` with an explicit value list is a single groupBy with
  conditional aggregates — one pass, no distinct-value collect.
- ``rollup`` computes all grouping sets in one shuffle via Expand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datapipe_spark.functions import money
from datapipe_spark.sources.tables import load_table

ROLLING_DAYS = 7  # trailing window width (days, inclusive of current)


def daily_revenue_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order revenue with a trailing 7-day moving sum/average
    (RANGE frame over a day index, so calendar gaps shorten the
    window instead of silently stretching it the way a ROWS frame
    would).

    Money stays DECIMAL(18,2) through every sum — the window sum is
    exact and order-independent — and casts to double only in the
    final projection (one deterministic division).
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("day"), money("o_totalprice").alias("rev")
    )
    daily = o.groupBy("day").agg(
        F.sum("rev").alias("revenue"), F.count("*").alias("n_orders")
    )
    # RANGE frame needs a numeric ordering key: days since epoch.
    # Unpartitioned window BY DESIGN: it runs over the daily rollup,
    # whose row count is calendar-bounded (≤ 366/year at ANY corpus
    # size) — the data-sized shuffle happened in the groupBy above.
    w = (
        Window.orderBy(F.datediff("day", F.lit("1970-01-01")))
        .rangeBetween(-(ROLLING_DAYS - 1), 0)
    )
    return daily.select(
        "day",
        F.col("revenue").cast("double").alias("revenue"),
        "n_orders",
        F.sum("revenue").over(w).cast("double").alias("rev_7d_sum"),
        (
            F.sum("revenue").over(w).cast("double")
            / F.sum("n_orders").over(w).cast("double")
        ).alias("rev_per_order_7d"),
        F.count("*").over(w).cast("long").alias("days_in_window"),
    )


DAILY_REVENUE_ROLLING_SQL = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue,
         COUNT(*) AS n_orders
  FROM orders GROUP BY CAST(o_orderdate AS DATE)
)
SELECT day,
  CAST(revenue AS DOUBLE) AS revenue,
  n_orders,
  CAST(SUM(revenue) OVER w AS DOUBLE) AS rev_7d_sum,
  CAST(SUM(revenue) OVER w AS DOUBLE) / CAST(SUM(n_orders) OVER w AS DOUBLE)
    AS rev_per_order_7d,
  CAST(COUNT(*) OVER w AS BIGINT) AS days_in_window
FROM daily
WINDOW w AS (ORDER BY datediff('day', DATE '1970-01-01', day)
             RANGE BETWEEN {ROLLING_DAYS - 1} PRECEDING AND CURRENT ROW)
"""

ZSCORE_FLAG = 2.0  # |z| beyond this flags the day as anomalous


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, day) volume anomaly score: z-score of the
    day's event count against that type's full-history mean/stddev
    (population form, computed from exact integer window sums — no
    engine stddev builtin, whose sample/population defaults and
    summation order differ).
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    )
    daily = e.groupBy("event_type", "day").agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type")
    sum_n = F.sum("n").over(w).cast("double")
    sum_n2 = F.sum(F.col("n") * F.col("n")).over(w).cast("double")
    cnt = F.count("*").over(w).cast("double")
    mean = sum_n / cnt
    var = sum_n2 / cnt - mean * mean
    z = F.when(var > 0, (F.col("n") - mean) / F.sqrt(var)).otherwise(F.lit(0.0))
    return daily.select(
        "event_type",
        "day",
        "n",
        mean.alias("mean_n"),
        z.alias("zscore"),
        (F.abs(z) > ZSCORE_FLAG).alias("is_anomaly"),
    )


EVENTS_ANOMALY_ZSCORE_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), scored AS (
  SELECT event_type, day, n,
    CAST(SUM(n) OVER w AS DOUBLE) / CAST(COUNT(*) OVER w AS DOUBLE) AS mean_n,
    CAST(SUM(n * n) OVER w AS DOUBLE) / CAST(COUNT(*) OVER w AS DOUBLE) AS m2
  FROM daily
  WINDOW w AS (PARTITION BY event_type)
)
SELECT event_type, day, n, mean_n,
  CASE WHEN m2 - mean_n * mean_n > 0
       THEN (n - mean_n) / sqrt(m2 - mean_n * mean_n)
       ELSE 0.0 END AS zscore,
  CASE WHEN m2 - mean_n * mean_n > 0
       THEN abs((n - mean_n) / sqrt(m2 - mean_n * mean_n)) > {ZSCORE_FLAG}
       ELSE FALSE END AS is_anomaly
FROM scored
"""

# explicit pivot values: one-pass plan, no distinct-value collect; new
# event types in future data fail loudly in tests rather than silently
# growing the schema
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def event_type_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts pivoted to one column per event type (the
    wide dashboard shape; Spark's ``pivot`` operator with an explicit
    value list)."""
    e = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type"
    )
    wide = e.groupBy("day").pivot("event_type", list(EVENT_TYPES)).count()
    return wide.select(
        "day",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


EVENT_TYPE_DAILY_PIVOT_SQL = f"""
SELECT CAST(ts AS DATE) AS day,
  {", ".join(f"CAST(COUNT(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}" for t in EVENT_TYPES)}
FROM events GROUP BY CAST(ts AS DATE)
"""


def orders_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts and revenue at every grain of
    (status, priority) at once — Spark's ``rollup`` (one shuffle via
    Expand, grouping sets identified by ``grouping_id``). The
    subtotal/grand-total rows dashboards read without re-querying.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority", money("o_totalprice").alias("rev")
    )
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("rev").cast("double").alias("revenue"),
            F.grouping_id().cast("int").alias("grain"),
        )
        .select("o_orderstatus", "o_orderpriority", "grain", "n_orders", "revenue")
    )


ORDERS_STATUS_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS grain,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def segment_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four grains of (market segment × order status) in one pass —
    Spark's ``cube`` (Expand + one shuffle), the GROUPING SETS
    companion to ``orders_status_rollup``'s hierarchy form.

    Scale: the customer dimension joins BROADCAST (orders carry only
    custkey); the cube's Expand emits 4 grouping-set copies of the
    (segment, status) pair — a 2-column payload, so the fan-out ships
    grouping keys, not fact rows' full width.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", money("o_totalprice").alias("rev")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .cube("c_mktsegment", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("rev").cast("double").alias("revenue"),
            F.grouping_id().cast("int").alias("grain"),
        )
        .select("c_mktsegment", "o_orderstatus", "grain", "n_orders", "revenue")
    )


SEGMENT_STATUS_CUBE_SQL = """
SELECT c_mktsegment, o_orderstatus,
       CAST(GROUPING(c_mktsegment, o_orderstatus) AS INT) AS grain,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (c_mktsegment, o_orderstatus)
"""


BASKET_TOP_K = 50  # co-occurrence pairs reported


def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top part co-occurrence pairs across order baskets (market-basket
    affinity): lineitem self-joined per order, pair counts, top-k with
    deterministic tie-break.

    Scale: ONE scan + ONE hash shuffle of lineitem (groupBy orderkey →
    basket arrays), then the pair expansion as a JVM array expression —
    the self-join form scans and shuffles the fact table TWICE for the
    same pairs (r13 A/B at sf0.1: 2.4-2.9 s join vs 1.7-2.3 s this
    form, identical output by exceptAll both ways). Per-order expansion
    is bounded by the max basket size squared — baskets are
    single-digit rows in any order system, so the blow-up is a
    constant, not a data term; collect_list order does not matter
    because the y > x filter + count are order-invariant. The final
    top-k is TakeOrderedAndProject (no global sort materialization).
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_list("l_partkey").alias("parts")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, x ->"
                " transform(filter(parts, y -> y > x),"
                " y -> struct(x AS part_a, y AS part_b))))"
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(BASKET_TOP_K)
    )


MARKET_BASKET_PAIRS_SQL = f"""
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders
FROM lineitem a
JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY a.l_partkey, b.l_partkey
ORDER BY n_orders DESC, part_a, part_b
LIMIT {BASKET_TOP_K}
"""

RFM_BUCKETS = 4  # quartile scores per dimension


def _ntile_from_rownum(rn, total: int, tiles: int):
    """Exact SQL ``NTILE(tiles)`` from a 1-based global row-number
    Column over ``total`` rows: the first ``total % tiles`` buckets
    take ``total div tiles + 1`` rows, the rest one fewer. Integer
    division is computed as ``(a - a % b) / b`` — the numerator is an
    exact multiple of b, so the double division is exact (correctly
    rounded integral result), with no float-boundary risk."""

    def idiv(a, b: int):  # exact a div b for non-negative long Columns
        a = a.cast("long")
        return ((a - a % F.lit(b)) / F.lit(b)).cast("long")

    q, r = divmod(total, tiles)
    if q == 0:  # fewer rows than tiles: bucket == row number
        return rn.cast("int")
    big = r * (q + 1)  # rows covered by the wide buckets
    wide = idiv(rn + F.lit(q), q + 1)  # == ceil(rn / (q+1))
    narrow = F.lit(r) + idiv(rn - F.lit(big) + F.lit(q - 1), q)
    return F.when(rn <= F.lit(big), wide).otherwise(narrow).cast("int")


def customer_rfm(
    spark: SparkSession, sf_dir: str, distributed_quantiles: bool | None = None
) -> DataFrame:
    """RFM segmentation: per-customer recency (days since last order,
    vs the corpus max date — a 1-row broadcast anchor), frequency
    (order count), monetary (DECIMAL revenue); each dimension scored
    into quartiles with NTILE over a deterministic
    (metric, customer) order, concatenated into the RFM segment code.

    Scale: one keyed aggregation to |customers| rows; then the same
    adaptive cutover as ``customer_analytics`` (marts.py): below
    ``GLOBAL_SORT_MAX_ROWS`` customers, plain single-window NTILEs;
    above, each dimension's NTILE is recovered exactly from
    ``marts._global_cume_dist`` (bucketed, distributed — no
    unpartitioned window anywhere) as ``rn = round(cume_dist * N)``
    plus the integer NTILE formula. Both paths are output-identical
    and oracle-locked (forced-distributed equivalence test in
    tests/test_analytics.py).
    """
    from datapipe_spark.plans import marts as _m
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", money("o_totalprice").alias("rev")
    )
    anchor = o.agg(F.max("o_orderdate").alias("max_date"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum("rev").alias("monetary_dec"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("max_date", "last_order").cast("int").alias("recency_days"),
            F.col("frequency").cast("long").alias("frequency"),
            "monetary_dec",
        )
    )
    if distributed_quantiles is None:
        distributed_quantiles = (
            load_table(spark, sf_dir, "customer").count() > _m.GLOBAL_SORT_MAX_ROWS
        )
    if distributed_quantiles:
        # one materialization feeds the per-dimension quantile actions,
        # the total-count action, and the ranked output
        per_cust = per_cust.localCheckpoint(eager=True)
        n = per_cust.count()
        # DESC dimensions rank by the negated value so every dimension
        # is an ASC (val, o_custkey) order — exactly the NTILE sort key
        scored = (
            per_cust.withColumn("_f_neg", -F.col("frequency"))
            .withColumn("_m_neg", -F.col("monetary_dec"))
        )
        for val, out in (
            ("recency_days", "r_score"),
            ("_f_neg", "f_score"),
            ("_m_neg", "m_score"),
        ):
            scored = _m._global_cume_dist(scored, val, "o_custkey", "_pct")
            rn = F.round(F.col("_pct") * F.lit(n)).cast("long")
            scored = scored.withColumn(out, _ntile_from_rownum(rn, n, RFM_BUCKETS)).drop(
                "_pct"
            )
        scored = scored.drop("_f_neg", "_m_neg").withColumn(
            "monetary", F.col("monetary_dec").cast("double")
        )
    else:
        w_r = Window.orderBy(F.asc("recency_days"), F.asc("o_custkey"))
        w_f = Window.orderBy(F.desc("frequency"), F.asc("o_custkey"))
        w_m = Window.orderBy(F.desc("monetary_dec"), F.asc("o_custkey"))
        scored = (
            per_cust.withColumn("monetary", F.col("monetary_dec").cast("double"))
            .withColumn("r_score", F.ntile(RFM_BUCKETS).over(w_r))
            .withColumn("f_score", F.ntile(RFM_BUCKETS).over(w_f))
            .withColumn("m_score", F.ntile(RFM_BUCKETS).over(w_m))
        )
    return scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.col("r_score").cast("int").alias("r_score"),
        F.col("f_score").cast("int").alias("f_score"),
        F.col("m_score").cast("int").alias("m_score"),
        F.concat_ws(
            "", F.col("r_score"), F.col("f_score"), F.col("m_score")
        ).alias("rfm_segment"),
    )


CUSTOMER_RFM_SQL = f"""
WITH o AS (
  SELECT o_custkey, o_orderdate, CAST(o_totalprice AS DECIMAL(18,2)) AS rev
  FROM orders
), per_cust AS (
  SELECT o_custkey,
         CAST(datediff('day', MAX(o_orderdate), (SELECT MAX(o_orderdate) FROM o)) AS INT)
           AS recency_days,
         COUNT(*) AS frequency,
         SUM(rev) AS monetary_dec
  FROM o GROUP BY o_custkey
), scored AS (
  SELECT o_custkey, recency_days, frequency,
         CAST(monetary_dec AS DOUBLE) AS monetary,
         NTILE({RFM_BUCKETS}) OVER (ORDER BY recency_days, o_custkey) AS r_score,
         NTILE({RFM_BUCKETS}) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
         NTILE({RFM_BUCKETS}) OVER (ORDER BY monetary_dec DESC, o_custkey) AS m_score
  FROM per_cust
)
SELECT o_custkey, recency_days, frequency, monetary,
       CAST(r_score AS INT) AS r_score,
       CAST(f_score AS INT) AS f_score,
       CAST(m_score AS INT) AS m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR)
         AS rfm_segment
FROM scored
"""
