"""Incremental aggregate maintenance (SURVEY §2.4 A14, §2.2 P8).

The reference's dbt model is ``materialized='incremental',
unique_key='date'`` with the high-watermark predicate
``DATE(created_at) > (SELECT MAX(date) FROM {{ this }})``
(batch design.md:651-670). The Spark-native equivalent implemented
here:

- the serving table is *time*-partitioned parquet with a configurable
  unit (``partition_unit``: "year" default, "month" for larger
  volumes — the partition unit must track data volume, not the metric
  grain: partitioning the 7-year/2.4k-row testdata by month meant 80
  directories whose dynamic-overwrite commit protocol cost ~1.4 s per
  increment vs 0.4 s at year grain; a 100 TB deployment sizes this to
  month or day so each partition holds O(100 MB–1 GB)); an increment
  recomputes ONLY the partitions that received new dates and swaps
  them in with *dynamic partition overwrite* (the ``replaceWhere``
  pattern — idempotent on re-run, no read-modify-write of untouched
  partitions). A partition straddling the watermark is recomputed in
  full from source, which is exactly dbt's ``unique_key`` replace
  semantics at partition grain;
- the one cross-date dependency in the metric — each customer's
  *first* order date, which drives the new-vs-returning split
  (A3/A4) — is carried as a tiny keyed *state table* that each
  increment merges (``min`` of old state and the chunk's mins) before
  aggregating. This is the part a naive partition recompute gets
  wrong: a returning customer must not be re-counted as new just
  because the increment can't see their history.

At 100 TB: each increment touches O(new data) + O(customers-in-chunk)
state rows; the state merge is a groupBy on the customer key (same
partitioning as the metric's own pre-aggregation), and the serving
table is never fully rewritten.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipe_spark.functions import ratio
from datapipe_spark.plans.marts import _orders_base, _zero_money


def _state_path(base: str) -> str:
    return os.path.join(base, "state_first_order")


def _table_path(base: str) -> str:
    return os.path.join(base, "daily_business_metrics")


def high_watermark(spark: SparkSession, base: str):
    """P8: ``SELECT MAX(date) FROM this`` over the serving table."""
    path = _table_path(base)
    # cheap local existence probe — the exception-based probe paid a
    # full (warn-logged) JVM analysis round trip on every first run.
    # The read stays guarded: a dir a crashed prior write left behind
    # (only _temporary/, no committed part files) must mean "first
    # run", not an aborted pipeline.
    if not os.path.isdir(path):
        return None
    try:
        return spark.read.parquet(path).agg(F.max("order_date")).first()[0]
    except Exception:
        return None


PARTITION_UNIT = "year"  # single default for the serving table's grain:
# partition_start and apply_increment MUST agree on it — dynamic
# partition overwrite only replaces same-valued partitions, so a
# mixed-grain table would silently duplicate rows (see guard below)
PARTITION_FMT = {"year": "yyyy", "month": "yyyy-MM"}
_PART_RE = {"year": r"\d{4}", "month": r"\d{4}-\d{2}"}


def _check_unit(unit: str) -> None:
    if unit not in PARTITION_FMT:
        raise ValueError(
            f"unsupported partition unit {unit!r}: expected one of "
            f"{sorted(PARTITION_FMT)}"
        )


def partition_start(wm, unit: str = PARTITION_UNIT):
    """First date of the partition containing the watermark — the
    straddling-partition recompute boundary."""
    _check_unit(unit)
    return wm.replace(month=1, day=1) if unit == "year" else wm.replace(day=1)


def apply_increment(
    spark: SparkSession, orders_chunk: DataFrame, base: str, unit: str = PARTITION_UNIT
) -> None:
    """Merge one chunk of new orders into the serving table.

    ``orders_chunk`` must contain only dates past the current
    high-watermark (the caller filters with ``high_watermark``, exactly
    like the dbt ``is_incremental()`` guard).
    """
    _check_unit(unit)
    state_p, table_p = _state_path(base), _table_path(base)
    # mixed-grain guard: an increment written at a different unit than
    # the table's existing partitions would DUPLICATE rows (dynamic
    # overwrite replaces order_part=2024-03, leaving order_part=2024
    # intact with the same dates inside) — refuse loudly instead
    if os.path.isdir(table_p):
        import re

        bad = [
            d
            for d in os.listdir(table_p)
            if d.startswith("order_part=")
            # the hive null partition (a NULL order_date) is not a
            # grain signal — only a value matching the OTHER unit's
            # shape (or garbage) indicates a mixed-grain table
            and d.split("=", 1)[1] != "__HIVE_DEFAULT_PARTITION__"
            and not re.fullmatch(_PART_RE[unit], d.split("=", 1)[1])
        ]
        if bad:
            raise ValueError(
                f"serving-table partition grain mismatch: unit={unit!r} "
                f"but existing partitions include {sorted(bad)[:3]}"
            )

    chunk_first = orders_chunk.groupBy("o_custkey").agg(
        F.min("order_date").alias("first_order_date")
    )
    if os.path.isdir(state_p):
        merged_state = (
            spark.read.parquet(state_p)
            .unionByName(chunk_first)
            .groupBy("o_custkey")
            .agg(F.min("first_order_date").alias("first_order_date"))
        )
    else:
        merged_state = chunk_first
    # the merged state feeds BOTH the durability commit and the
    # enrichment join: persist it so the merge aggregation runs once
    # and the join doesn't wait on (or re-read) the parquet commit
    merged_state = merged_state.persist()
    # state is rebuilt atomically beside the old copy, then swapped in;
    # one file — the state table is O(customers) keys, tiny next to
    # data. repartition(1), not coalesce(1): coalesce would collapse
    # the upstream state-merge aggregation into the single writer task
    # (measured ~0.5 s/increment at sf0.1); repartition keeps the agg
    # parallel and shuffles only the small result to one writer.
    # r5 (round-3 ask): the state commit and the serving write are
    # independent consumers of the persisted merge — submit the state
    # write from a helper thread so it overlaps the (bigger) serving
    # aggregation instead of serializing ~0.5 s in front of it. The
    # rename below still happens only after BOTH finish, so the
    # durability order (state swap after a complete serving write) is
    # unchanged.
    tmp = state_p + "_next"
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1)
    committed = False
    try:
        state_fut = pool.submit(
            lambda: merged_state.repartition(1).write.mode("overwrite").parquet(tmp)
        )
        enriched = orders_chunk.join(merged_state, "o_custkey")
        is_new = F.col("first_order_date") == F.col("order_date")
        # two-level aggregation (same shape as the full-recompute mart):
        # pre-aggregate per (date, customer) so the distinct customer
        # counts become plain counts — no Expand fan-out over the chunk
        per_cust = enriched.groupBy("order_date", "o_custkey").agg(
            F.count("*").alias("_n"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("_f"),
            F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("_o"),
            F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("_p"),
            F.sum("amount").alias("_amt"),
            F.first(is_new).alias("_is_new"),
        )
        daily = per_cust.groupBy("order_date").agg(
            F.sum("_n").alias("total_orders"),
            F.sum("_f").alias("completed_orders"),
            F.sum("_o").alias("open_orders"),
            F.sum("_p").alias("partial_orders"),
            F.count("*").alias("unique_customers"),
            F.count(F.when(F.col("_is_new"), 1)).alias("new_customers"),
            F.sum("_amt").alias("_rev"),
            F.sum(
                F.when(F.col("_is_new"), F.col("_amt")).otherwise(_zero_money())
            ).alias("_new_rev"),
        )
        result = daily.select(
            F.date_format("order_date", PARTITION_FMT[unit]).alias("order_part"),
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
        (
            # the daily mart is O(dates) rows — one writer task emits one
            # file per partition (dynamic overwrite sorts by partition key
            # internally), avoiding a per-partition task fleet for a few
            # KB each (repartition(partition_key) benched 0.6 s/increment
            # slower at sf0.1). A cluster deployment with a fact-sized
            # result re-sizes this to `repartition(n, partition_key)` so
            # each partition still lands in O(1) files.
            result.repartition(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("order_part")
            .parquet(table_p)
        )
        state_fut.result()  # surface any state-write failure before the swap
        committed = True
    finally:
        # runs on EVERY exit — including an AnalysisException while the
        # serving plan is still being built: join the state thread
        # unconditionally (shutdown is safe with no submitted work, and
        # must precede the tmp cleanup so a still-running writer cannot
        # race it) and release the cache (the round-2
        # plan-cache-leak class). On failure the staging dir is removed
        # rather than left for a retry to overwrite.
        pool.shutdown(wait=True)
        merged_state.unpersist()
        if not committed:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)

    import shutil

    shutil.rmtree(state_p, ignore_errors=True)
    os.rename(tmp, state_p)


def incremental_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable end-to-end: build ``daily_business_metrics``
    in two increments split at the 60 % date point, then read the
    serving table back. Must equal the full recompute
    (oracle: ``DAILY_BUSINESS_METRICS_SQL``)."""
    from datapipe_spark.util import fresh_dir

    base = fresh_dir("incremental_dbm")
    o = _orders_base(spark, sf_dir).persist()
    lo, hi = o.agg(F.min("order_date"), F.max("order_date")).first()
    cutoff = lo + (hi - lo) * 6 // 10

    apply_increment(spark, o.filter(F.col("order_date") <= F.lit(cutoff)), base)
    wm = high_watermark(spark, base)
    # chunk 2 = everything in any partition past the watermark's:
    # partition-grain replacement recomputes the straddler whole
    start = partition_start(wm)
    apply_increment(spark, o.filter(F.col("order_date") >= F.lit(start)), base)
    o.unpersist()

    out = spark.read.parquet(_table_path(base))
    return out.select(
        "order_date",
        "total_orders", "completed_orders", "open_orders", "partial_orders",
        "unique_customers", "new_customers", "returning_customers",
        "total_revenue", "new_customer_revenue", "avg_order_value",
        "acquisition_rate", "completion_rate",
    )
