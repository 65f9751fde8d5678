"""Oracle parity for speed-layer batch queries and quality operators."""

from __future__ import annotations

import pytest

from datapipe_spark.functions import epoch_us
from datapipe_spark.plans import events_queries as ev
from datapipe_spark.plans import quality as q
from datapipe_spark.plans.marts import DAILY_BUSINESS_METRICS_SQL
from tests.oracle import compare_to_oracle

CASES = [
    (ev.funnel_daily, ev.FUNNEL_DAILY_SQL),
    (ev.events_hourly, ev.EVENTS_HOURLY_SQL),
    (ev.events_json_stats, ev.EVENTS_JSON_STATS_SQL),
    (ev.sessionize, ev.SESSIONIZE_SQL),
    (ev.sessionize_session_window, ev.SESSIONIZE_SQL),
    (ev.error_purchase_windows, ev.ERROR_PURCHASE_WINDOWS_SQL),
    (ev.events_hopping_hourly, ev.EVENTS_HOPPING_HOURLY_SQL),
    (ev.top_events_per_user, ev.TOP_EVENTS_PER_USER_SQL),
    (ev.purchases_filtered, ev.PURCHASES_FILTERED_SQL),
    (ev.purchase_attribution, ev.PURCHASE_ATTRIBUTION_SQL),
    (q.rule_violations, q.RULE_VIOLATIONS_SQL),
    (
        q.daily_completeness_violations,
        q.DAILY_COMPLETENESS_SQL_TEMPLATE.format(dbm_sql=DAILY_BUSINESS_METRICS_SQL),
    ),
    (q.orphan_lineitems, q.ORPHAN_LINEITEMS_SQL),
    (q.reconciliation, q.RECONCILIATION_SQL),
]


@pytest.mark.parametrize("fn,sql", CASES, ids=[c[0].__name__ for c in CASES])
def test_matches_oracle(spark, sf_dir, fn, sql):
    compare_to_oracle(spark, fn, sql, sf_dir)


def test_violations_nonempty(spark, sf_dir):
    # negative acctbals exist in TPC-H-ish data, so the scan must fire
    assert q.rule_violations(spark, sf_dir).count() > 0


def test_sessionize_gap_property(spark, sf_dir):
    # no session may contain a gap > 30 min; consecutive sessions of a
    # user must be separated by > 30 min
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    sess = ev.sessionize(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("session_seq")
    gaps = sess.withColumn("prev_end", F.lag("session_end").over(w)).filter(
        F.col("prev_end").isNotNull()
    )
    bad = gaps.filter(
        (epoch_us("session_start") - epoch_us("prev_end")) <= 30 * 60 * 1_000_000
    )
    assert bad.count() == 0


def test_sessionize_frame_empty_input(spark):
    import pyspark.sql.functions as F  # noqa: F401

    from datapipe_spark.plans.events_queries import sessionize_frame

    empty = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_id long, event_type string, value double"
    )
    assert sessionize_frame(empty).count() == 0


def test_compact_latest_empty_changelog(spark):
    from datapipe_spark.sources.cdc import compact_latest

    empty = spark.createDataFrame([], "id long, __op string, __source_lsn long")
    assert compact_latest(empty).count() == 0


def test_single_event_session(spark):
    import datetime

    from datapipe_spark.plans.events_queries import sessionize_frame

    one = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 0, "purchase", 5.0)],
        "user_id long, ts timestamp, event_id long, event_type string, value double",
    )
    r = sessionize_frame(one).collect()
    assert len(r) == 1
    assert r[0]["session_duration_minutes"] == 0.0
    assert r[0]["converted_to_purchase"] is True
    assert abs(r[0]["total_spent"] - 5.0) < 1e-9


def test_purchase_attribution_tie_and_no_touch(spark, tmp_path):
    """The as-of join's subtle cases, pinned on a crafted stream: a
    touch at the SAME timestamp as the purchase attributes (<= rule,
    matching DuckDB ASOF), a purchase with no prior touch keeps NULL
    attribution, and the latest touch wins over earlier ones."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 0, 0), 7, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 10, 0, 0), 7, "purchase", 9.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 9, 0, 0), 8, "purchase", 5.0, "{}"),
        (4, dt.datetime(2024, 1, 1, 11, 0, 0), 7, "click", 1.0, "{}"),
        (5, dt.datetime(2024, 1, 1, 12, 0, 0), 7, "purchase", 3.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r["event_id"]: r
        for r in ev.purchase_attribution(spark, str(tmp_path)).collect()
    }
    assert set(out) == {2, 3, 5}
    assert out[2]["touch_event_id"] == 1 and out[2]["secs_since_touch"] == 0.0
    assert out[3]["touch_event_id"] is None
    assert out[3]["secs_since_touch"] is None
    assert out[5]["touch_event_id"] == 4 and out[5]["secs_since_touch"] == 3600.0
