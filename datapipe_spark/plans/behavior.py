"""User-behavior analytics over the event stream: ordered funnels,
retention cohorts, and event-transition matrices (SURVEY §2.4/§2.5
speed-layer analytics, the query family the reference's realtime
dashboards serve — realtime design.md's funnel/session surfaces —
re-expressed as declarative DataFrame plans).

Scale design:
- The ordered funnel is three keyed aggregations joined on
  ``(user_id, day)`` — each stage is a map-side-combinable groupBy on
  the same key, so AQE plans one shuffle per stage and the joins
  co-locate on the already-shuffled key. No windows, no per-user
  event-list materialization.
- Retention cohorts reduce events to one row per (user, week) FIRST
  (distinct on a 2-int key), then join the per-user cohort week — the
  join input is |users|×|weeks|, orders of magnitude below the raw
  event count at 100 TB.
- Transitions use one per-user window (shuffle on user_id, the same
  partitioning every other per-user op here uses) and aggregate the
  (from, to) pairs — the output is |event_types|² regardless of scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datapipe_spark.sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered per-user-day funnel: view → first click AFTER
    the first view → first purchase AFTER that click (event-ORDER
    funnel, not the presence-only ``funnel_daily`` rollup: a purchase
    that precedes every view does not count).

    Output: one row per day — users entering each stage plus the
    stage-to-stage and overall conversion rates.
    """
    e = _events(spark, sf_dir).select(
        F.to_date("ts").alias("day"), "user_id", "event_type", "ts"
    )
    return event_funnel_frame(e)


def event_funnel_frame(e: DataFrame) -> DataFrame:
    """Ordered-funnel core over any (day, user_id, event_type, ts)
    frame — factored out so the property test can drive it with
    arbitrary event streams (brute-force model equivalence)."""
    fv = (
        e.filter(F.col("event_type") == "view")
        .groupBy("day", "user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    fc = (
        e.filter(F.col("event_type") == "click")
        .join(fv, ["day", "user_id"])
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("day", "user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .join(fc, ["day", "user_id"])
        .filter(F.col("ts") > F.col("first_click"))
        .groupBy("day", "user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    staged = (
        fv.join(fc.select("day", "user_id", "first_click"), ["day", "user_id"], "left")
        .join(fp.select("day", "user_id", "first_purchase"), ["day", "user_id"], "left")
    )
    return (
        staged.groupBy("day")
        .agg(
            F.count("*").alias("viewers"),
            F.count("first_click").alias("clickers"),
            F.count("first_purchase").alias("purchasers"),
        )
        .select(
            "day",
            "viewers",
            "clickers",
            "purchasers",
            (F.col("clickers").cast("double") / F.col("viewers")).alias("view_to_click"),
            F.when(
                F.col("clickers") > 0,
                F.col("purchasers").cast("double") / F.col("clickers"),
            )
            .otherwise(F.lit(0.0))
            .alias("click_to_purchase"),
            (F.col("purchasers").cast("double") / F.col("viewers")).alias("overall_conversion"),
        )
    )


EVENT_FUNNEL_CONVERSION_SQL = """
WITH e AS (
  SELECT CAST(ts AS DATE) AS day, user_id, event_type, ts FROM events
), fv AS (
  SELECT day, user_id, MIN(ts) AS first_view FROM e
  WHERE event_type = 'view' GROUP BY day, user_id
), fc AS (
  SELECT e.day, e.user_id, MIN(e.ts) AS first_click
  FROM e JOIN fv ON e.day = fv.day AND e.user_id = fv.user_id
  WHERE e.event_type = 'click' AND e.ts > fv.first_view
  GROUP BY e.day, e.user_id
), fp AS (
  SELECT e.day, e.user_id, MIN(e.ts) AS first_purchase
  FROM e JOIN fc ON e.day = fc.day AND e.user_id = fc.user_id
  WHERE e.event_type = 'purchase' AND e.ts > fc.first_click
  GROUP BY e.day, e.user_id
), staged AS (
  SELECT fv.day, fv.user_id, fc.first_click, fp.first_purchase
  FROM fv
  LEFT JOIN fc ON fv.day = fc.day AND fv.user_id = fc.user_id
  LEFT JOIN fp ON fv.day = fp.day AND fv.user_id = fp.user_id
)
SELECT day,
  COUNT(*) AS viewers,
  COUNT(first_click) AS clickers,
  COUNT(first_purchase) AS purchasers,
  CAST(COUNT(first_click) AS DOUBLE) / COUNT(*) AS view_to_click,
  CASE WHEN COUNT(first_click) > 0
       THEN CAST(COUNT(first_purchase) AS DOUBLE) / COUNT(first_click)
       ELSE 0.0 END AS click_to_purchase,
  CAST(COUNT(first_purchase) AS DOUBLE) / COUNT(*) AS overall_conversion
FROM staged GROUP BY day
"""

# Week index anchor for cohort math: weeks are counted as whole
# 7-day blocks since this date (engine-portable arithmetic — both
# engines' date_trunc('week') conventions stay out of the query).
_COHORT_EPOCH = "2024-01-01"


def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-activity week;
    for each (cohort_week, week_offset) the count of cohort members
    active that week and the retention rate vs the cohort size.
    """
    e = _events(spark, sf_dir).select(
        "user_id",
        F.floor(F.datediff(F.to_date("ts"), F.lit(_COHORT_EPOCH)) / 7).alias("week"),
    )
    user_weeks = e.distinct()
    cohorts = user_weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohorts.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    active = (
        user_weeks.join(cohorts, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count("*").alias("n_active"))
    )
    return (
        active.join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            (F.col("n_active").cast("double") / F.col("cohort_size")).alias("retention"),
        )
    )


USER_RETENTION_COHORTS_SQL = f"""
WITH uw AS (
  SELECT DISTINCT user_id,
    CAST(FLOOR(datediff('day', DATE '{_COHORT_EPOCH}', CAST(ts AS DATE)) / 7.0) AS BIGINT)
      AS week
  FROM events
), cohorts AS (
  SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id
), sizes AS (
  SELECT cohort_week, COUNT(*) AS cohort_size FROM cohorts GROUP BY cohort_week
), active AS (
  SELECT c.cohort_week, uw.week - c.cohort_week AS week_offset, COUNT(*) AS n_active
  FROM uw JOIN cohorts c USING (user_id)
  GROUP BY c.cohort_week, uw.week - c.cohort_week
)
SELECT a.cohort_week, a.week_offset, a.n_active, s.cohort_size,
       CAST(a.n_active AS DOUBLE) / s.cohort_size AS retention
FROM active a JOIN sizes s USING (cohort_week)
"""


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (first-order Markov
    estimate): for each ordered (from_type → to_type) adjacency in a
    user's timeline, the transition count and its probability among
    all transitions leaving ``from_type``.
    """
    e = _events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .select(F.col("event_type").alias("from_type"), "to_type")
    )
    return transition_matrix(pairs)


def transition_matrix(pairs: DataFrame) -> DataFrame:
    """(from_type, to_type) adjacency rows → counts + row-normalized
    probabilities — spelled once for the batch window form and the
    streaming per-user-state form (r12 review: the tail lived in two
    files under one oracle)."""
    counts = pairs.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    w_from = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w_from)).alias("p"),
    )


EVENT_TRANSITIONS_SQL = """
WITH pairs AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
), counts AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM pairs WHERE to_type IS NOT NULL GROUP BY from_type, to_type
)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type) AS p
FROM counts
"""


PATH_LEN = 3  # leading events per session in the path signature
PATH_TOP_K = 25  # paths reported


def session_path_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top session-opening paths: the first ``PATH_LEN`` event types of
    each 30-minute-gap session (the ``sessionize`` islands), joined
    into a path signature and counted across sessions — the "how do
    sessions start" product question.

    Scale: same per-user gap-and-island shuffle as ``sessionize``; the
    path assembly keeps only ``PATH_LEN`` rows per session before the
    (path) aggregation, and the top-k is TakeOrderedAndProject.
    """
    from datapipe_spark.functions import epoch_us

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_sess = F.when(
        (epoch_us(F.col("ts")) - epoch_us(F.lag("ts").over(w_user)))
        > 30 * 60 * 1_000_000,
        1,
    ).otherwise(0)
    numbered = (
        e.withColumn("_new", new_sess)
        .withColumn(
            "session_seq",
            F.sum("_new").over(w_user.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
            ),
        )
        .filter(F.col("rn") <= PATH_LEN)
    )
    paths = numbered.groupBy("user_id", "session_seq").agg(
        F.concat_ws(
            ">",
            F.expr("transform(array_sort(collect_list(struct(rn, event_type))), s -> s.event_type)"),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(PATH_TOP_K)
    )


SESSION_PATH_COUNTS_SQL = f"""
WITH e AS (
  SELECT user_id, ts, event_id, event_type FROM events
), flagged AS (
  SELECT *, CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 30*60*1000000
                 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
), numbered AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
                               ORDER BY ts, event_id) AS rn
  FROM sessions
), heads AS (
  SELECT user_id, session_seq,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM numbered WHERE rn <= {PATH_LEN}
  GROUP BY user_id, session_seq
)
SELECT path, COUNT(*) AS n_sessions
FROM heads GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT {PATH_TOP_K}
"""
