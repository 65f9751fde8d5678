"""Oracle-parity tests for the batch marts (SURVEY §2.3–2.5 coverage)."""

from __future__ import annotations

import pytest

from datapipe_spark.plans import marts
from tests.oracle import compare_to_oracle

CASES = [
    (marts.daily_business_metrics, marts.DAILY_BUSINESS_METRICS_SQL),
    (marts.customer_metrics, marts.CUSTOMER_METRICS_SQL),
    (marts.product_performance, marts.PRODUCT_PERFORMANCE_SQL),
    (marts.customer_analytics, marts.CUSTOMER_ANALYTICS_SQL),
    (marts.market_segment_daily, marts.MARKET_SEGMENT_DAILY_SQL),
]


@pytest.mark.parametrize("fn,sql", CASES, ids=[c[0].__name__ for c in CASES])
def test_mart_matches_oracle(spark, sf_dir, fn, sql):
    compare_to_oracle(spark, fn, sql, sf_dir)


def test_daily_business_metrics_one_row_per_date(spark, sf_dir):
    # completeness property (reference dbt test, batch design.md:734-742)
    df = marts.daily_business_metrics(spark, sf_dir)
    assert df.groupBy("order_date").count().filter("count != 1").count() == 0


def test_customer_analytics_tier_distribution(spark, sf_dir):
    # W9: bronze 60 / silver 25 / gold 12 / platinum 3 (±5pp at small SF)
    df = marts.customer_analytics(spark, sf_dir)
    total = df.count()
    frac = {
        r["customer_tier"]: r["count"] / total
        for r in df.groupBy("customer_tier").count().collect()
    }
    assert abs(frac.get("bronze", 0) - 0.60) < 0.05
    assert abs(frac.get("platinum", 0) - 0.03) < 0.03


def test_customer_analytics_distributed_quantiles_identical(spark, sf_dir):
    """The bucketed distributed CUME_DIST (the 100 TB path, chosen
    automatically above GLOBAL_SORT_MAX_ROWS customers) must be
    bit-identical to the single-window form."""
    small = {
        tuple(r)
        for r in marts.customer_analytics(
            spark, sf_dir, distributed_quantiles=False
        ).collect()
    }
    big = {
        tuple(r)
        for r in marts.customer_analytics(
            spark, sf_dir, distributed_quantiles=True
        ).collect()
    }
    assert small == big
