"""Bucketed-table layout: co-located joins without a shuffle (SURVEY
§6 scale strategy; the storage-level complement to broadcast joins).

The reference's batch layer repeatedly joins the same big tables on
the same keys (orders ⋈ lineitem / users ⋈ orders — batch
design.md:97-100 tunes shuffle partitions for exactly these). At
100 TB the dominant cost of every such join is re-shuffling both
fact tables on the key each run. Spark's storage bucketing
(`DataFrameWriter.bucketBy` + `saveAsTable`) pays that shuffle ONCE
at write time: both tables are hash-partitioned into the same number
of buckets on the join key, so every subsequent equi-join on that key
is planned bucket-to-bucket — `SortMergeJoin` with NO Exchange on
either side (asserted in tests/test_plan_quality.py). `sortBy` on the
same key additionally persists within-bucket order so re-joins skip
the per-task sort when files-per-bucket is 1.

Scratch-dir scoping: bucketed tables must be *managed* (the bucket
metadata lives in the catalog), so the helpers create a dedicated
database whose LOCATION is under the engine's scratch root — nothing
is written into the caller's working directory and `drop_bucket_db`
removes all trace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datapipe_spark.util import scratch_root

BUCKET_DB = "datapipe_buckets"


def ensure_bucket_db(spark: SparkSession, database: str = BUCKET_DB) -> str:
    """Create (once) the scratch-located database for bucketed tables."""
    import os

    loc = os.path.join(scratch_root(), f"{database}.db")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database} LOCATION '{loc}'")
    return database


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int = 32,
    sort_cols: tuple[str, ...] | None = None,
    database: str = BUCKET_DB,
) -> str:
    """Write ``df`` as a managed parquet table bucketed (and optionally
    sorted) on ``bucket_cols``; returns the qualified table name.

    Both sides of a co-located join MUST use the same ``num_buckets``
    and bucket on the join key — Spark only elides the Exchange when
    the output partitionings line up. At 100 TB, size ``num_buckets``
    so one bucket of the LARGER table is O(100 MB–1 GB) (same rule as
    shuffle-partition sizing — bucket width is the unit a join task
    reads).
    """
    db = ensure_bucket_db(df.sparkSession, database)
    qualified = f"{db}.{table}"
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(qualified)
    return qualified


def drop_bucket_db(spark: SparkSession, database: str = BUCKET_DB) -> None:
    """Drop the scratch database and every bucketed table in it."""
    spark.sql(f"DROP DATABASE IF EXISTS {database} CASCADE")
