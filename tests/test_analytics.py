"""Oracle parity + semantics for the time-series/multidimensional
analytics family (RANGE-frame moving windows, z-score anomalies,
pivot, rollup)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipe_spark.plans import analytics
from tests.oracle import compare_to_oracle

CASES = [
    (analytics.daily_revenue_rolling, analytics.DAILY_REVENUE_ROLLING_SQL),
    (analytics.events_anomaly_zscore, analytics.EVENTS_ANOMALY_ZSCORE_SQL),
    (analytics.event_type_daily_pivot, analytics.EVENT_TYPE_DAILY_PIVOT_SQL),
    (analytics.orders_status_rollup, analytics.ORDERS_STATUS_ROLLUP_SQL),
]


@pytest.mark.parametrize("fn,sql", CASES, ids=[c[0].__name__ for c in CASES])
def test_matches_oracle(spark, sf_dir, fn, sql):
    compare_to_oracle(spark, fn, sql, sf_dir)


def test_rolling_window_bounds(spark, sf_dir):
    out = analytics.daily_revenue_rolling(spark, sf_dir)
    # the trailing window can never exceed its width or drop below 1 day
    assert (
        out.filter(
            (F.col("days_in_window") < 1)
            | (F.col("days_in_window") > analytics.ROLLING_DAYS)
        ).count()
        == 0
    )
    # a single-day window equals that day's revenue exactly
    solo = out.filter(F.col("days_in_window") == 1)
    assert solo.filter(F.col("rev_7d_sum") != F.col("revenue")).count() == 0


def test_pivot_counts_reconcile_with_total(spark, sf_dir):
    from datapipe_spark.sources.tables import load_table

    wide = analytics.event_type_daily_pivot(spark, sf_dir)
    total_wide = (
        wide.select(
            sum(
                (F.col(f"n_{t}") for t in analytics.EVENT_TYPES),
                start=F.lit(0),
            ).alias("n")
        )
        .agg(F.sum("n"))
        .first()[0]
    )
    total = load_table(spark, sf_dir, "events").count()
    # explicit pivot values must cover every type in the data
    assert total_wide == total


def test_rollup_grand_total(spark, sf_dir):
    from datapipe_spark.sources.tables import load_table

    out = analytics.orders_status_rollup(spark, sf_dir)
    grand = out.filter(F.col("grain") == 3).collect()
    assert len(grand) == 1
    assert grand[0].n_orders == load_table(spark, sf_dir, "orders").count()
    # each grain's order count re-adds to the grand total
    for g in (0, 1):
        s = out.filter(F.col("grain") == g).agg(F.sum("n_orders")).first()[0]
        assert s == grand[0].n_orders


def test_zscore_zero_variance_guard(spark, sf_dir):
    out = analytics.events_anomaly_zscore(spark, sf_dir)
    # finite scores only; zero-variance partitions must emit z=0
    assert out.filter(F.isnan("zscore") | F.col("zscore").isNull()).count() == 0


def test_batch6_oracle(spark, sf_dir):
    from datapipe_spark.plans import behavior

    for fn, sql in [
        (analytics.market_basket_pairs, analytics.MARKET_BASKET_PAIRS_SQL),
        (analytics.customer_rfm, analytics.CUSTOMER_RFM_SQL),
        (behavior.session_path_counts, behavior.SESSION_PATH_COUNTS_SQL),
        (analytics.segment_status_cube, analytics.SEGMENT_STATUS_CUBE_SQL),
    ]:
        compare_to_oracle(spark, fn, sql, sf_dir)


def test_cube_reconciles_with_grand_total(spark, sf_dir):
    """grain=3 row (both dims aggregated) must equal the plain total,
    and each grain level must sum to it."""
    from datapipe_spark.sources.tables import load_table

    out = analytics.segment_status_cube(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "orders").count()
    by_grain = {}
    for r in out:
        by_grain[r["grain"]] = by_grain.get(r["grain"], 0) + r["n_orders"]
    assert by_grain == {0: total, 1: total, 2: total, 3: total}


def test_rfm_scores_in_range_and_cover(spark, sf_dir):
    out = analytics.customer_rfm(spark, sf_dir)
    for c in ("r_score", "f_score", "m_score"):
        assert (
            out.filter(
                (F.col(c) < 1) | (F.col(c) > analytics.RFM_BUCKETS)
            ).count()
            == 0
        )
    # quartiles must be near-balanced: bucket sizes differ by at most 1
    sizes = [
        r.n
        for r in out.groupBy("r_score").agg(F.count("*").alias("n")).collect()
    ]
    assert max(sizes) - min(sizes) <= 1


def test_rfm_distributed_quantiles_equal_ntile_oracle(spark, sf_dir):
    """Forced-distributed path (bucketed `_global_cume_dist` + integer
    NTILE recovery — no unpartitioned window) must be byte-identical to
    the single-window NTILE oracle. This is the 100 TB path the
    metadata-count cutover selects above GLOBAL_SORT_MAX_ROWS."""
    compare_to_oracle(
        spark,
        lambda s, d: analytics.customer_rfm(s, d, distributed_quantiles=True),
        analytics.CUSTOMER_RFM_SQL,
        sf_dir,
    )
    plan = (
        analytics.customer_rfm(spark, sf_dir, distributed_quantiles=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # no single-window NTILE anywhere in the distributed plan; the
    # per-customer windows are partitioned by the quantile bucket
    assert "ntile" not in plan.lower(), plan
    assert "_bkt" in plan, plan


def test_market_basket_pairs_ordered_and_bounded(spark, sf_dir):
    rows = analytics.market_basket_pairs(spark, sf_dir).collect()
    assert 0 < len(rows) <= analytics.BASKET_TOP_K
    # part_a < part_b on every pair; counts non-increasing
    assert all(r.part_a < r.part_b for r in rows)
    ns = [r.n_orders for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_session_paths_match_session_count(spark, sf_dir):
    from datapipe_spark.plans import behavior
    from datapipe_spark.plans.events_queries import sessionize

    total_paths = (
        behavior.session_path_counts(spark, sf_dir)
        .agg(F.sum("n_sessions"))
        .first()[0]
    )
    n_sessions = sessionize(spark, sf_dir).count()
    # top-k covers at most all sessions; with a tiny path alphabet the
    # 25 top paths must cover the overwhelming majority
    assert total_paths <= n_sessions
    assert total_paths >= n_sessions * 0.5


def test_rolling_window_matches_pandas_model(spark, sf_dir):
    """Trailing 7-day RANGE sums must equal a brute-force pandas
    rolling model over the same daily aggregate (calendar gaps
    included)."""
    import pandas as pd

    out = analytics.daily_revenue_rolling(spark, sf_dir).toPandas()
    daily = out[["day", "revenue", "n_orders"]].sort_values("day").reset_index(drop=True)
    days = pd.to_datetime(daily["day"])
    for i in range(len(daily)):
        lo = days[i] - pd.Timedelta(days=analytics.ROLLING_DAYS - 1)
        mask = (days >= lo) & (days <= days[i])
        exp_sum = daily.loc[mask, "revenue"].sum()
        got = out.loc[out["day"] == daily.loc[i, "day"]].iloc[0]
        assert abs(got["rev_7d_sum"] - exp_sum) < 1e-6, daily.loc[i, "day"]
        assert got["days_in_window"] == int(mask.sum())
