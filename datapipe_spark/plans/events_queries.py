"""Speed-layer analytics in batch form (SURVEY §2.4 A5/A6/A9/A10, §2.8).

Re-expresses the three ClickHouse materialized views and the
sessionization operator of
``.kiro/specs/realtime-analytics-speed-layer/design.md:255-383`` over
the testdata ``events`` table (event types: view/click/purchase/
signup/error ≈ the reference's 9-type funnel). The streaming forms of
these live in ``datapipe_spark.streaming``; these batch forms are the
deterministic, oracle-checkable semantics (same aggregation logic —
streaming equivalence is asserted in tests).

Scale notes: all rollups are single-shuffle groupBys on bounded-
cardinality keys; sessionization shuffles once on user_id (same
distribution a stateful streaming job would use). Exact
count-distincts here are oracle-checkable; the 100 TB path swaps
``countDistinct`` → ``approx_count_distinct`` (A6, the reference's
ClickHouse ``uniq()``) — provided as separate ``*_approx`` queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datapipe_spark.functions import epoch_us, json_amount, money, ratio
from datapipe_spark.sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def funnel_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3/A9/A11: daily conversion-funnel rollup (the
    ``conversion_funnel_mv`` SummingMergeTree MV, realtime
    design.md:256-272) with exact uniques for oracle parity."""
    e = _events(spark, sf_dir)
    cnt = lambda t: F.count(F.when(F.col("event_type") == t, 1)).alias(f"{t}s")  # noqa: E731
    daily = e.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.count("*").alias("total_events"),
        cnt("view"),
        cnt("click"),
        cnt("purchase"),
        cnt("signup"),
        cnt("error"),
        F.countDistinct("user_id").alias("unique_users"),
        F.sum(F.when(F.col("event_type") == "purchase", money("value"))).alias("_rev"),
    )
    return funnel_kpis(daily)


def funnel_kpis(daily: DataFrame) -> DataFrame:
    """The funnel's KPI tail, spelled once for the batch form and its
    streaming MV twin (r12 review — two copies under ONE oracle could
    drift until a driver run failed): stable column order, the decimal
    revenue cast to double in the final projection only, zero-guarded
    ratios."""
    return daily.select(
        "event_date",
        "total_events",
        "views",
        "clicks",
        "purchases",
        "signups",
        "errors",
        "unique_users",
        F.col("_rev").cast("double").alias("purchase_revenue"),
        ratio(F.col("clicks"), F.col("views")).alias("click_through_rate"),
        ratio(F.col("purchases"), F.col("views")).alias("conversion_rate"),
    )


FUNNEL_DAILY_SQL = """
SELECT CAST(ts AS DATE) AS event_date,
  COUNT(*) AS total_events,
  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS views,
  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signups,
  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS errors,
  COUNT(DISTINCT user_id) AS unique_users,
  CAST(SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_revenue,
  CASE WHEN COUNT(CASE WHEN event_type = 'view' THEN 1 END) > 0 THEN
    CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS DOUBLE)
      / COUNT(CASE WHEN event_type = 'view' THEN 1 END) ELSE 0.0 END
    AS click_through_rate,
  CASE WHEN COUNT(CASE WHEN event_type = 'view' THEN 1 END) > 0 THEN
    CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE)
      / COUNT(CASE WHEN event_type = 'view' THEN 1 END) ELSE 0.0 END
    AS conversion_rate
FROM events
GROUP BY 1
"""


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/F5/F6: hourly activity rollup (date × hour grain — the
    ClickHouse hourly MV shape, realtime design.md:259-262)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(
            F.to_date("ts").alias("event_date"),
            F.hour("ts").alias("event_hour"),
        )
        .agg(
            F.count("*").alias("total_events"),
            F.countDistinct("user_id").alias("unique_users"),
            F.sum(money("value")).alias("_val"),
        )
        .select(
            "event_date",
            "event_hour",
            "total_events",
            "unique_users",
            F.col("_val").cast("double").alias("total_value"),
        )
    )


EVENTS_HOURLY_SQL = """
SELECT CAST(ts AS DATE) AS event_date,
       EXTRACT(hour FROM ts) AS event_hour,
       COUNT(*) AS total_events,
       COUNT(DISTINCT user_id) AS unique_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""


def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11: JSON property extraction (``JSONExtractFloat(properties,
    'amount')`` realtime design.md:285) + A5 conditional aggregation
    over the extracted field."""
    e = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .withColumn("k_avg", F.col("k_sum").cast("double") / F.col("n"))
    )


EVENTS_JSON_STATS_SQL = """
WITH e AS (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k
  FROM events
)
SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS k_sum,
       MIN(k) AS k_min, MAX(k) AS k_max,
       CAST(SUM(k) AS DOUBLE) / COUNT(*) AS k_avg
FROM e WHERE k IS NOT NULL
GROUP BY event_type
"""


def sessionize(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """T2 (event-time form): 30-minute-inactivity sessionization over
    the events table. See ``sessionize_frame`` for the semantics."""
    return sessionize_frame(_events(spark, sf_dir), gap_minutes)


def sessionize_frame(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-and-island sessionization of any (user_id, ts, event_id,
    event_type, value) frame.

    The reference's ``flatMapGroupsWithState`` session machine
    (realtime design.md:311-383) computed per-session: event-type
    counters, spend, duration, conversion flag (output schema
    design.md:463-487). Batch equivalent: gap-and-island via lag +
    running sum — one shuffle on user_id, windows run partition-local.
    The streaming twins (``streaming.jobs``) assert equality with this
    in tests; property tests check it against a brute-force model.
    """
    e = events.select("user_id", "ts", "event_id", "event_type", "value")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = gap_minutes * 60
    new_sess = (
        F.when(
            (epoch_us(F.col("ts")) - epoch_us(F.lag("ts").over(w_user)))
            > gap_s * 1_000_000,
            1,
        )
        .otherwise(0)
    )
    with_sess = e.withColumn("_new", new_sess).withColumn(
        "session_seq",
        F.sum("_new").over(w_user.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sess = with_sess.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("views"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
        F.sum(F.when(F.col("event_type") == "purchase", money("value"))).alias("_spent"),
    )
    return sess.select(
        "user_id",
        "session_seq",
        "session_start",
        "session_end",
        (
            (epoch_us("session_end") - epoch_us("session_start")) / 60_000_000.0
        ).alias("session_duration_minutes"),
        "n_events",
        "views",
        "clicks",
        "purchases",
        F.coalesce(F.col("_spent").cast("double"), F.lit(0.0)).alias("total_spent"),
        (F.col("purchases") > 0).alias("converted_to_purchase"),
    )


SESSIONIZE_SQL = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type, value FROM events
), flagged AS (
  SELECT *, CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 30*60*1000000
                 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
-- CAST: DuckDB's windowed SUM(int) yields HUGEINT (float64 via pandas),
-- Spark yields BIGINT — same canonicalization trap as token_profile.
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
  MIN(ts) AS session_start, MAX(ts) AS session_end,
  (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 60000000.0 AS session_duration_minutes,
  COUNT(*) AS n_events,
  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS views,
  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
  COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0)
    AS total_spent,
  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) > 0 AS converted_to_purchase
FROM numbered
GROUP BY user_id, session_seq
"""


_ERROR_WINDOW_MINUTES = 10


def error_purchase_windows(
    spark: SparkSession, sf_dir: str, window_minutes: int = _ERROR_WINDOW_MINUTES
) -> DataFrame:
    """Temporal range join as a first-class query: purchases landing
    inside the ``window_minutes`` window after an error by the same
    user ("purchases at risk" — the incident-impact join every ops
    dashboard runs).

    Built on ``operators.rangejoin.point_in_interval_join`` — the
    bucketed equi-join formulation, NOT a BroadcastNestedLoopJoin:
    points (purchases) and intervals (error windows) meet on
    (user_id, time-bucket), so the join hash-partitions and scales
    like any other; the exact BETWEEN predicate re-checks inside each
    bucket. Bucket size = the window length, so each interval explodes
    to ≤ 2 bucket rows.
    """
    from datapipe_spark.operators.rangejoin import point_in_interval_join

    e = _events(spark, sf_dir)
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_event_id"),
        F.col("ts").alias("error_ts"),
        (F.col("ts") + F.expr(f"INTERVAL {window_minutes} MINUTES")).alias("window_end"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("purchase_ts"),
        money("value").alias("_amount"),
    )
    joined = point_in_interval_join(
        purchases,
        errors,
        point_ts="purchase_ts",
        start_ts="error_ts",
        end_ts="window_end",
        bucket_seconds=window_minutes * 60,
        extra_keys=("user_id",),
    )
    return joined.select(
        "user_id",
        "error_event_id",
        "purchase_event_id",
        ((epoch_us("purchase_ts") - epoch_us("error_ts")) / 1_000_000.0).alias(
            "seconds_after_error"
        ),
        F.col("_amount").cast("double").alias("purchase_amount"),
    )


# Oracle interval derives from the SAME constant as the query default,
# so a parameter drift cannot silently diverge them (r6 advisory).
ERROR_PURCHASE_WINDOWS_SQL = f"""
SELECT p.user_id,
       e.event_id AS error_event_id,
       p.event_id AS purchase_event_id,
       (epoch_us(p.ts) - epoch_us(e.ts)) / 1000000.0 AS seconds_after_error,
       CAST(CAST(p.value AS DECIMAL(18,2)) AS DOUBLE) AS purchase_amount
FROM events p
JOIN events e
  ON p.user_id = e.user_id
 AND e.event_type = 'error'
 AND p.event_type = 'purchase'
 AND p.ts >= e.ts
 AND p.ts <= e.ts + INTERVAL {_ERROR_WINDOW_MINUTES} MINUTES
"""


def events_hopping_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 extended: HOPPING (sliding) window aggregation — 1-hour
    windows advancing every 30 minutes, so each event lands in exactly
    two windows. The smoothing form dashboards use when tumbling-hour
    edges hide bursts.

    Spark-first: the built-in ``window(ts, '1 hour', '30 minutes')``
    generates the window copies inside codegen (no self-union, no
    explode of user data); one shuffle on the window key.
    """
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count("*").alias("total_events"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
            F.sum(
                F.when(F.col("event_type") == "purchase", money("value"))
            ).alias("_rev"),
        )
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "total_events",
            "purchases",
            F.col("_rev").cast("double").alias("purchase_revenue"),
        )
    )


# DuckDB twin: each event belongs to the windows starting at
# floor(ts, 30m) and floor(ts, 30m) - 30m — enumerate both per event,
# keep starts whose [start, start+1h) actually contains ts.
EVENTS_HOPPING_HOURLY_SQL = """
WITH starts AS (
  SELECT e.*, s.window_start
  FROM events e,
       UNNEST([
         to_timestamp(CAST(floor(epoch_us(e.ts) / 1800000000) AS BIGINT) * 1800),
         to_timestamp(CAST(floor(epoch_us(e.ts) / 1800000000) AS BIGINT) * 1800
           - 1800)
       ]) AS s(window_start)
)
SELECT CAST(window_start AS TIMESTAMP) AS window_start,
       COUNT(*) AS total_events,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
       CAST(SUM(CASE WHEN event_type = 'purchase'
                     THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
         AS purchase_revenue
FROM starts
WHERE ts >= window_start AND ts < window_start + INTERVAL 1 HOUR
GROUP BY window_start
"""


def sessionize_session_window(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """T2 "simpler alt" (SURVEY §2.8: ``session_window(ts, '30
    minutes')``): the same session rollup as ``sessionize`` computed
    with Spark's built-in session-window aggregate instead of
    gap-and-island lag windows.

    Boundary alignment: ``session_window`` starts a new session when
    the gap is *reached* (next event at exactly last_ts + gap splits),
    while the lag-based oracle splits only when it is *exceeded*
    (strict >) — one extra microsecond (the data's timestamp
    granularity) makes the two identical, the same trick the streaming
    twin uses (streaming/jobs.py:178-183).

    Scale: ONE shuffle on user_id with native session merging in the
    aggregation — no ordered per-user window pass at all, so it also
    avoids the lag form's second sort. The per-user ``session_seq``
    renumbering window that follows runs over O(sessions), not
    O(events). Oracled against SESSIONIZE_SQL.
    """
    e = _events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type", "value")
    gap_us = gap_minutes * 60 * 1_000_000 + 1
    sess = (
        e.groupBy(F.session_window("ts", f"{gap_us} microseconds"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.count(F.when(F.col("event_type") == "view", 1)).alias("views"),
            F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
            F.sum(
                F.when(F.col("event_type") == "purchase", money("value"))
            ).alias("_spent"),
        )
        .drop("session_window")
    )
    seq = Window.partitionBy("user_id").orderBy("session_start")
    return sess.select(
        "user_id",
        (F.row_number().over(seq) - 1).cast("long").alias("session_seq"),
        "session_start",
        "session_end",
        (
            (epoch_us("session_end") - epoch_us("session_start")) / 60_000_000.0
        ).alias("session_duration_minutes"),
        "n_events",
        "views",
        "clicks",
        "purchases",
        F.coalesce(F.col("_spent").cast("double"), F.lit(0.0)).alias("total_spent"),
        (F.col("purchases") > 0).alias("converted_to_purchase"),
    )


def top_events_per_user(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """W7/W8 + W1: top-k rows per key (rank over value with
    deterministic tie-break, then limit-per-group)."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        e.withColumn("value_rank", F.row_number().over(w))
        .filter(F.col("value_rank") <= k)
        .select("user_id", "event_id", "event_type", "value", "ts", "value_rank")
    )


TOP_EVENTS_PER_USER_SQL = """
WITH ranked AS (
  SELECT user_id, event_id, event_type, value, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id)
           AS value_rank
  FROM events
)
SELECT user_id, event_id, event_type, value, ts, value_rank
FROM ranked WHERE value_rank <= 3
"""


def purchases_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3/P5 + W6/W8: predicate + projection + ordered limit — the
    ad-hoc query-tool surface (s3_parquet_query.py:136-156) on events."""
    e = _events(spark, sf_dir)
    return (
        e.filter(
            (F.col("event_type").isin("purchase", "signup"))
            & F.col("value").isNotNull()
            & (F.col("value") > 100.0)
        )
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy(F.col("value").desc(), "event_id")
        .limit(200)
    )


PURCHASES_FILTERED_SQL = """
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE event_type IN ('purchase', 'signup') AND value IS NOT NULL AND value > 100.0
ORDER BY value DESC, event_id
LIMIT 200
"""


def event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: p50/p95/p99 latency-style percentile stats per event type
    (the benchmark harness's percentile reporting, reference
    ``data-generator.py:184-199``, ``task8-phase5-performance.py:167-182``).

    Exact ``percentile`` here for oracle parity; the 100 TB path is
    ``percentile_approx`` (single-pass sketch, no global sort) —
    provided by ``funnel_daily_approx``'s family of approx variants.
    """
    e = _events(spark, sf_dir)
    return (
        e.filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("v_min"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
            F.expr("percentile(value, 0.99)").alias("p99"),
            F.max("value").alias("v_max"),
        )
    )


EVENT_VALUE_PERCENTILES_SQL = """
SELECT event_type, COUNT(*) AS n,
       MIN(value) AS v_min,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.95) AS p95,
       quantile_cont(value, 0.99) AS p99,
       MAX(value) AS v_max
FROM events WHERE value IS NOT NULL
GROUP BY event_type
"""


def funnel_daily_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: the funnel rollup with ``approx_count_distinct`` — the
    reference's ClickHouse ``uniq()`` (realtime design.md:269-270) and
    the 100 TB scale path (HLL sketch: one pass, mergeable, no
    distinct-shuffle). Rows-only check; the exact twin
    ``funnel_daily`` is the oracled variant, and tests bound the
    relative error between the two."""
    e = _events(spark, sf_dir)
    cnt = lambda t: F.count(F.when(F.col("event_type") == t, 1)).alias(f"{t}s")  # noqa: E731
    return e.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.count("*").alias("total_events"),
        cnt("view"),
        cnt("purchase"),
        F.approx_count_distinct("user_id").alias("approx_unique_users"),
    )


def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase enriched with the same
    user's latest preceding view/click — the **as-of join**, the
    canonical temporal operator Spark's built-in joins lack (a naive
    range join is O(purchases × touches) per user).

    Spark-native scalable form: union both sides tagged, ONE window
    per user ordered by (time, side, id), and `last(ignorenulls)`
    carries the most recent touch forward onto each purchase row —
    one shuffle on user_id total, O(n log n) per user, no pairwise
    term. Touches are pre-deduped to one per (user, ts) (max
    event_id) so the result is deterministic under timestamp ties in
    BOTH engines; at equal timestamps the touch sorts before the
    purchase, matching the oracle's ``t.ts <= p.ts``. Purchases with
    no prior touch keep NULL attribution (left semantics).

    Oracle: DuckDB's native ``ASOF LEFT JOIN`` — an independent
    implementation of the operator, not a replay of this plan.
    """
    e = _events(spark, sf_dir)
    touches = (
        e.filter(F.col("event_type").isin("view", "click"))
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("touch_event_id"),
            F.max_by("event_type", "event_id").alias("touch_type"),
        )
        .select(
            "user_id",
            F.col("ts").alias("t"),
            "touch_event_id",
            "touch_type",
            F.col("ts").alias("touch_ts"),
            F.lit(0).alias("is_p"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(None).cast("long").alias("touch_event_id"),
        F.lit(None).cast("string").alias("touch_type"),
        F.lit(None).cast(e.schema["ts"].dataType).alias("touch_ts"),
        F.lit(1).alias("is_p"),
        "event_id",
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_p", "touch_event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rows = touches.unionByName(purchases)
    out = (
        rows.withColumn("a_eid", F.last("touch_event_id", ignorenulls=True).over(w))
        .withColumn("a_type", F.last("touch_type", ignorenulls=True).over(w))
        .withColumn("a_ts", F.last("touch_ts", ignorenulls=True).over(w))
        .filter(F.col("is_p") == 1)
    )
    secs = F.round(
        (epoch_us(F.col("t")) - epoch_us(F.col("a_ts"))).cast("double") / 1e6, 6
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("t").alias("ts"),
        "value",
        F.col("a_eid").alias("touch_event_id"),
        F.col("a_type").alias("touch_type"),
        F.col("a_ts").alias("touch_ts"),
        secs.alias("secs_since_touch"),
    )


PURCHASE_ATTRIBUTION_SQL = """
WITH touches AS (
  SELECT user_id, ts,
         MAX(event_id) AS touch_event_id,
         arg_max(event_type, event_id) AS touch_type
  FROM events WHERE event_type IN ('view', 'click')
  GROUP BY user_id, ts
), purchases AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, p.value,
       t.touch_event_id, t.touch_type, t.ts AS touch_ts,
       ROUND((epoch_us(p.ts) - epoch_us(t.ts)) / 1000000.0, 6) AS secs_since_touch
FROM purchases p ASOF LEFT JOIN touches t
  ON p.user_id = t.user_id AND t.ts <= p.ts
"""
