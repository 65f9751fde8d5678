"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``datapipe_spark`` (see SURVEY.md §2 for the
operator inventory each query covers).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: daily_business_metrics (reference dbt model,
    batch design.md:658-730) at sf0.001."""
    from datapipe_spark.plans.marts import daily_business_metrics

    return daily_business_metrics(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from datapipe_spark.plans import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    from datapipe_spark.plans import registry

    return registry.oracle_sql()
