"""Layout-rewrite maintenance as a driver-oracled query (SURVEY §4).

The reference relies on Iceberg's ``rewrite_data_files`` table
maintenance (task6-ecommerce-tables-config.yaml:51-61; batch
design.md:193). ``operators/maintenance.py`` carries the parquet
stand-ins (compaction, range clustering, z-order); this module drives
the clustering rewrite end to end as a registry query so the driver's
hash oracle attests content-preservation — the data-skipping win
itself (file-footer min/max disjointness, minority-touch predicates)
is stats-gated in tests/test_pipeline_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipe_spark.operators.maintenance import cluster_parquet
from datapipe_spark.sources.tables import load_table
from datapipe_spark.util import fresh_dir


def lineitem_cluster_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy lineitem to scratch, range-cluster it by ``l_shipdate``
    (one sampled range shuffle + per-file sort + atomic dir swap),
    then read the REWRITTEN table back through a first-ship-year
    predicate — the scan that now file-skips on footer stats — and
    roll up by ship month.

    The oracle aggregates the ORIGINAL table: hash equality proves the
    rewrite dropped, duplicated, and corrupted nothing. Money/quantity
    are summed as DECIMAL(18,2) and cast to double only in the final
    projection (oracle decimal discipline).
    """
    path = fresh_dir("lineitem_clustered")
    src = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_quantity", "l_extendedprice"
    )
    src.write.mode("overwrite").parquet(path)
    cluster_parquet(spark, path, ["l_shipdate"], target_bytes=4 * 1024 * 1024)
    t = spark.read.parquet(path)
    first_year = src.select(F.min(F.year("l_shipdate"))).first()[0]
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        t.filter(F.year("l_shipdate") == first_year)
        .groupBy(
            F.year("l_shipdate").alias("ship_year"),
            F.month("l_shipdate").alias("ship_month"),
        )
        .agg(
            F.count("*").alias("n_items"),
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_price"),
        )
    )


LINEITEM_CLUSTER_REWRITE_SQL = """
WITH fy AS (SELECT MIN(YEAR(l_shipdate)) AS y FROM lineitem)
SELECT YEAR(l_shipdate) AS ship_year,
       MONTH(l_shipdate) AS ship_month,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem, fy
WHERE YEAR(l_shipdate) = fy.y
GROUP BY 1, 2
"""
