"""Queryable CDC operators (SURVEY §2.1 S1, §2.2 P6, §2.5 W5/W6, §2.4 A7).

These re-express the reference's ad-hoc parquet query tool
(``utils-dev/s3_parquet_query.py``) and archive invariants over the
synthesized deterministic changelog, so each is DuckDB-oracle-checkable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipe_spark.functions import op_label
from datapipe_spark.sources.cdc import (
    SYNTH_CHANGELOG_SQL_BODY,
    compact_latest,
    synth_changelog,
)


def cdc_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: the flattened CDC stream itself (schema parity check)."""
    return synth_changelog(spark, sf_dir)


CDC_CHANGELOG_SQL = SYNTH_CHANGELOG_SQL_BODY


def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 + F15: snapshot compaction by newest LSN per key, with the
    stringified CDC decimal re-cast for arithmetic
    (utils-dev/read_s3_parquet.py:51; users-debezium-connector.json:38)."""
    latest = compact_latest(synth_changelog(spark, sf_dir))
    return latest.select(
        "id",
        "user_id",
        "status",
        F.col("total_amount").cast("decimal(18,2)").cast("double").alias("total_amount"),
        "created_at",
        "__op",
        "__source_lsn",
    )


CDC_LATEST_STATE_SQL = f"""
WITH changelog AS ({SYNTH_CHANGELOG_SQL_BODY}),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY __source_lsn DESC) AS rn
  FROM changelog
)
SELECT id, user_id, status,
       CAST(CAST(total_amount AS DECIMAL(18,2)) AS DOUBLE) AS total_amount,
       created_at, __op, __source_lsn
FROM ranked WHERE rn = 1 AND __op <> 'd'
"""


def cdc_op_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 + F3: per-operation record count and first/last source
    timestamp, with op codes mapped to labels
    (s3_parquet_query.py:191-210)."""
    return (
        synth_changelog(spark, sf_dir)
        .groupBy(op_label("__op").alias("operation"))
        .agg(
            F.count("*").alias("record_count"),
            F.min("__source_ts_ms").alias("first_ts"),
            F.max("__source_ts_ms").alias("last_ts"),
        )
    )


CDC_OP_SUMMARY_SQL = f"""
WITH changelog AS ({SYNTH_CHANGELOG_SQL_BODY})
SELECT CASE __op WHEN 'c' THEN 'CREATE' WHEN 'u' THEN 'UPDATE'
                 WHEN 'd' THEN 'DELETE' WHEN 'r' THEN 'READ'
                 ELSE __op END AS operation,
       COUNT(*) AS record_count,
       MIN(__source_ts_ms) AS first_ts,
       MAX(__source_ts_ms) AS last_ts
FROM changelog GROUP BY 1
"""


def cdc_deleted_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: deleted-only filter (s3_parquet_query.py:160-166) — delete
    rows are rewritten with full payload, not tombstoned."""
    return synth_changelog(spark, sf_dir).filter(F.col("__op") == "d")


CDC_DELETED_RECORDS_SQL = f"""
WITH changelog AS ({SYNTH_CHANGELOG_SQL_BODY})
SELECT * FROM changelog WHERE __op = 'd'
"""


def cdc_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3 + W6: per-user change history — membership filter on a
    user set, projected and orderable by __ts_ms
    (s3_parquet_query.py:139-142,176-179). Row order is not part of
    the contract (hash is order-insensitive); the sort exists for the
    human-facing tool."""
    return (
        synth_changelog(spark, sf_dir)
        .filter(F.col("user_id").isin([1, 2, 3, 4, 5]))
        .select("id", "user_id", "status", "__op", "__ts_ms", "__source_lsn")
        .orderBy("__ts_ms", "__source_lsn")
    )


CDC_USER_HISTORY_SQL = f"""
WITH changelog AS ({SYNTH_CHANGELOG_SQL_BODY})
SELECT id, user_id, status, __op, __ts_ms, __source_lsn
FROM changelog WHERE user_id IN (1, 2, 3, 4, 5)
ORDER BY __ts_ms, __source_lsn
"""


def cdc_archive_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 + S6 + F18 end-to-end: write the changelog as a
    time-partitioned snappy-parquet archive (hive layout
    ``year=/month=/day=/hour=`` keyed off ``__source_ts_ms``,
    task10-s3-sink-connector-config.json:14-21), then scan it back with
    a partition predicate — Spark's FileIndex prunes directories the
    same way the pandas query tool hand-listed them
    (s3_parquet_query.py:62-132; asserted in tests via the physical
    plan). Returns per-partition record counts + LSN bounds for the
    first calendar year of the stream.

    Archived at *month* granularity: the synthetic changelog spans ~7
    years at low density, where hourly dirs would be the small-file
    pathology (see ``write_archive``); hour-level layout is exercised
    by the unit tests on a bounded slice.
    """
    from datapipe_spark.sources.cdc import write_archive
    from datapipe_spark.util import fresh_dir

    path = fresh_dir("cdc_archive")
    changelog = synth_changelog(spark, sf_dir)
    write_archive(changelog, path, granularity="month")

    # min year comes from the hive layout the write just produced (one
    # directory listing), not a second full changelog computation — the
    # archive is partitioned by year, so its year= dirs ARE the year set
    first_year = min(
        int(d.split("=", 1)[1])
        for d in os.listdir(path)
        if d.startswith("year=")
    )
    archived = spark.read.parquet(path)
    return (
        archived.filter(F.col("year") == first_year)
        .groupBy("year", "month")
        .agg(
            F.count("*").alias("n_records"),
            F.min("__source_lsn").alias("min_lsn"),
            F.max("__source_lsn").alias("max_lsn"),
            F.count(F.when(F.col("__op") == "d", 1)).alias("n_deletes"),
        )
    )


CDC_ARCHIVE_ROLLUP_SQL = f"""
WITH changelog AS ({SYNTH_CHANGELOG_SQL_BODY})
SELECT YEAR(__source_ts_ms) AS year, MONTH(__source_ts_ms) AS month,
       COUNT(*) AS n_records,
       MIN(__source_lsn) AS min_lsn,
       MAX(__source_lsn) AS max_lsn,
       COUNT(CASE WHEN __op = 'd' THEN 1 END) AS n_deletes
FROM changelog
WHERE YEAR(__source_ts_ms) = (SELECT MIN(YEAR(__source_ts_ms)) FROM changelog)
GROUP BY 1, 2
"""


def cdc_multi_table_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 breadth: per-(table, op) stream accounting across all
    captured tables — record counts, distinct keys, high-watermark LSN
    (the shape of the reference's per-topic monitoring,
    task8-phase3 CDC checks)."""
    from datapipe_spark.sources.cdc import synth_changelog_multi

    return (
        synth_changelog_multi(spark, sf_dir)
        .groupBy("table_name", "__op")
        .agg(
            F.count("*").alias("record_count"),
            F.countDistinct("id").alias("unique_keys"),
            F.max("__source_lsn").alias("max_lsn"),
        )
    )


def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 build from the changelog: one
    row per key VERSION with ``valid_from``/``valid_to`` effectivity
    and an ``is_current`` flag — the warehouse-dimension companion to
    ``cdc_latest_state``'s Type-1 compaction (reference archival layer,
    s3-sink + batch design "latest state vs full history" split).

    Semantics: versions order by LSN per key; ``valid_to`` = next
    version's ``__ts_ms`` (open for the last version); a delete op
    closes history — the tombstone itself is not a dimension row, but
    it bounds the prior version's validity. ``is_current`` marks the
    open, non-deleted version.

    Scale: ONE shuffle on the primary key; the effectivity window
    (lead) runs partition-local after it. Same distribution a MERGE
    INTO an Iceberg SCD2 table would use.
    """
    log = synth_changelog(spark, sf_dir)
    from pyspark.sql.window import Window

    w = Window.partitionBy("id").orderBy("__source_lsn")
    versions = log.withColumn("valid_to", F.lead("__ts_ms").over(w)).withColumn(
        "is_current", F.col("valid_to").isNull() & (F.col("__op") != "d")
    )
    return versions.filter(F.col("__op") != "d").select(
        "id",
        "user_id",
        "status",
        F.col("total_amount").cast("decimal(18,2)").cast("double").alias("total_amount"),
        F.col("__ts_ms").alias("valid_from"),
        "valid_to",
        "is_current",
        "__source_lsn",
    )


CDC_SCD2_HISTORY_SQL = f"""
WITH changelog AS ({SYNTH_CHANGELOG_SQL_BODY}),
versions AS (
  SELECT *,
         LEAD(__ts_ms) OVER (PARTITION BY id ORDER BY __source_lsn) AS valid_to
  FROM changelog
)
SELECT id, user_id, status,
       CAST(CAST(total_amount AS DECIMAL(18,2)) AS DOUBLE) AS total_amount,
       __ts_ms AS valid_from,
       valid_to,
       (valid_to IS NULL AND __op <> 'd') AS is_current,
       __source_lsn
FROM versions WHERE __op <> 'd'
"""


# oracle for scd2_store_purged (compliance erasure): the batch SCD2
# build with the purged keys' versions excluded entirely
CDC_SCD2_HISTORY_PURGED_SQL = f"""
WITH changelog AS ({SYNTH_CHANGELOG_SQL_BODY}),
versions AS (
  SELECT *,
         LEAD(__ts_ms) OVER (PARTITION BY id ORDER BY __source_lsn) AS valid_to
  FROM changelog
)
SELECT id, user_id, status,
       CAST(CAST(total_amount AS DECIMAL(18,2)) AS DOUBLE) AS total_amount,
       __ts_ms AS valid_from,
       valid_to,
       (valid_to IS NULL AND __op <> 'd') AS is_current,
       __source_lsn
FROM versions WHERE __op <> 'd' AND id % 97 <> 0
"""


# oracle for scd2_store_expired (history retention): the batch SCD2
# build with the retention horizon applied to valid_to — open rows
# (valid_to NULL) always survive; closed rows survive iff they ended
# at or after the cutoff (operators/scd2.py SCD2_EXPIRE_CUTOFF)
CDC_SCD2_HISTORY_EXPIRED_SQL = f"""
WITH changelog AS ({SYNTH_CHANGELOG_SQL_BODY}),
versions AS (
  SELECT *,
         LEAD(__ts_ms) OVER (PARTITION BY id ORDER BY __source_lsn) AS valid_to
  FROM changelog
)
SELECT id, user_id, status,
       CAST(CAST(total_amount AS DECIMAL(18,2)) AS DOUBLE) AS total_amount,
       __ts_ms AS valid_from,
       valid_to,
       (valid_to IS NULL AND __op <> 'd') AS is_current,
       __source_lsn
FROM versions
WHERE __op <> 'd'
  AND (valid_to IS NULL OR valid_to >= TIMESTAMP '1998-07-01 00:00:00')
"""


# oracle for scd2_store_evolved (schema evolution): the batch SCD2
# build over the changelog with the evolved schema — 'u' rows (the
# post-evolution tail) carry the new nullable channel column, 'c'
# rows (pre-evolution) read back null
CDC_SCD2_HISTORY_EVOLVED_SQL = f"""
WITH changelog AS ({SYNTH_CHANGELOG_SQL_BODY}),
ev AS (
  SELECT *,
         CASE WHEN __op = 'u'
              THEN 'ch-' || CAST(id % 5 AS VARCHAR) END AS channel
  FROM changelog
),
versions AS (
  SELECT *,
         LEAD(__ts_ms) OVER (PARTITION BY id ORDER BY __source_lsn) AS valid_to
  FROM ev
)
SELECT id, user_id, status,
       CAST(CAST(total_amount AS DECIMAL(18,2)) AS DOUBLE) AS total_amount,
       __ts_ms AS valid_from,
       valid_to,
       (valid_to IS NULL AND __op <> 'd') AS is_current,
       __source_lsn,
       channel
FROM versions WHERE __op <> 'd'
"""


# oracle for scd2_keyed_history (key-pruned full-history read): the
# batch SCD2 build trimmed to the deterministic key set
CDC_SCD2_HISTORY_KEYED_SQL = f"""
WITH changelog AS ({SYNTH_CHANGELOG_SQL_BODY}),
versions AS (
  SELECT *,
         LEAD(__ts_ms) OVER (PARTITION BY id ORDER BY __source_lsn) AS valid_to
  FROM changelog
)
SELECT id, user_id, status,
       CAST(CAST(total_amount AS DECIMAL(18,2)) AS DOUBLE) AS total_amount,
       __ts_ms AS valid_from,
       valid_to,
       (valid_to IS NULL AND __op <> 'd') AS is_current,
       __source_lsn
FROM versions WHERE __op <> 'd' AND id % 53 = 0
"""


# oracle for scd2_store_evolved_asof (evolution × time travel): the
# state BEFORE the evolving increment is the creates-only build —
# every version open, the evolved column typed but null everywhere
CDC_SCD2_AS_OF_C_EVOLVED_SQL = f"""
WITH changelog AS ({SYNTH_CHANGELOG_SQL_BODY})
SELECT id, user_id, status,
       CAST(CAST(total_amount AS DECIMAL(18,2)) AS DOUBLE) AS total_amount,
       __ts_ms AS valid_from,
       CAST(NULL AS TIMESTAMP) AS valid_to,
       TRUE AS is_current,
       __source_lsn,
       CAST(NULL AS VARCHAR) AS channel
FROM changelog WHERE __op = 'c'
"""


# oracle for scd2_dimension_as_of (time travel to the pre-delete
# batch): SCD2 built over the changelog PREFIX — creates + updates
# only, every delete still in the future
CDC_SCD2_AS_OF_CU_SQL = f"""
WITH changelog AS ({SYNTH_CHANGELOG_SQL_BODY}),
cu AS (SELECT * FROM changelog WHERE __op IN ('c', 'u')),
versions AS (
  SELECT *,
         LEAD(__ts_ms) OVER (PARTITION BY id ORDER BY __source_lsn) AS valid_to
  FROM cu
)
SELECT id, user_id, status,
       CAST(CAST(total_amount AS DECIMAL(18,2)) AS DOUBLE) AS total_amount,
       __ts_ms AS valid_from,
       valid_to,
       (valid_to IS NULL AND __op <> 'd') AS is_current,
       __source_lsn
FROM versions WHERE __op <> 'd'
"""


def lineitem_pit_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct dimension enrichment — the feature-store
    join that keeps training data leak-free: each lineitem picks the
    order-status VERSION whose SCD2 effectivity window contains its
    ship time (never the current status, which would leak the future
    into features computed "as of" ship time). Items shipped after the
    order's delete-tombstone closed its history enrich to NULL — the
    dimension genuinely had no row then.

    Composition: ``cdc_scd2_history`` (the versioned dimension) left-
    joined on (order key, ``valid_from ≤ ship_ts < valid_to``), rolled
    up by status × ship month so the result is audit-sized.

    Scale: ONE hash shuffle on the order key for the join (versions
    per key are bounded — ≤2 dimension rows — so the range predicate
    filters inside each key group; no interval explosion, no BNLJ),
    then a map-side-combinable rollup. The same plan a feature store
    runs at 100 TB: facts shuffle once, dimension history co-partitions.
    """
    hist = cdc_scd2_history(spark, sf_dir).select(
        "id", "status", "valid_from", "valid_to"
    )
    return _pit_status_rollup(spark, sf_dir, hist)


def _lineitem_facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact side of every PIT form: lineitems as (key, event time,
    decimal measure)."""
    from datapipe_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("id"),
        F.col("l_shipdate").cast("timestamp").alias("ship_ts"),
        F.col("l_quantity").cast("decimal(18,2)").alias("_qty"),
    )


def _pit_rollup_agg(joined: DataFrame) -> DataFrame:
    """Shared rollup tail: PIT-enriched facts → status × ship month
    audit (decimal-summed, double only in the final projection)."""
    return joined.groupBy(
        F.col("status").alias("status_at_ship"),
        F.year("ship_ts").alias("ship_year"),
        F.month("ship_ts").alias("ship_month"),
    ).agg(
        F.count("*").alias("n_items"),
        F.sum("_qty").cast("double").alias("sum_qty"),
    )


def _pit_status_rollup(spark: SparkSession, sf_dir: str, hist: DataFrame) -> DataFrame:
    """The fact-side half, shared with the materialized-store form
    (``lineitem_pit_stored``): PIT-join lineitems to ANY SCD2 history
    frame and roll up by status × ship month."""
    from datapipe_spark.operators.rangejoin import point_in_time_join

    joined = point_in_time_join(
        _lineitem_facts(spark, sf_dir), hist, key="id", fact_ts="ship_ts"
    )
    return _pit_rollup_agg(joined)


LINEITEM_PIT_STATUS_ROLLUP_SQL = f"""
WITH hist AS ({CDC_SCD2_HISTORY_SQL})
SELECT h.status AS status_at_ship,
       YEAR(CAST(l.l_shipdate AS TIMESTAMP)) AS ship_year,
       MONTH(CAST(l.l_shipdate AS TIMESTAMP)) AS ship_month,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem l
LEFT JOIN hist h
  ON l.l_orderkey = h.id
 AND CAST(l.l_shipdate AS TIMESTAMP) >= h.valid_from
 AND (h.valid_to IS NULL OR CAST(l.l_shipdate AS TIMESTAMP) < h.valid_to)
GROUP BY 1, 2, 3
"""


# oracle for lineitem_pit_as_of (r8 verdict ask #5 — time-traveled PIT
# read path): the same rollup against SCD2 built over the changelog
# PREFIX (creates + updates only), i.e. the dimension as it stood at
# store increment 1, before any delete committed
LINEITEM_PIT_AS_OF_SQL = f"""
WITH hist AS ({CDC_SCD2_AS_OF_CU_SQL})
SELECT h.status AS status_at_ship,
       YEAR(CAST(l.l_shipdate AS TIMESTAMP)) AS ship_year,
       MONTH(CAST(l.l_shipdate AS TIMESTAMP)) AS ship_month,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem l
LEFT JOIN hist h
  ON l.l_orderkey = h.id
 AND CAST(l.l_shipdate AS TIMESTAMP) >= h.valid_from
 AND (h.valid_to IS NULL OR CAST(l.l_shipdate AS TIMESTAMP) < h.valid_to)
GROUP BY 1, 2, 3
"""


def _multi_summary_sql() -> str:
    from datapipe_spark.sources.cdc import CDC_TABLES

    parts = []
    for topic, (tbl, key) in CDC_TABLES.items():
        for op, v, pred in (
            ("c", 1, "TRUE"),
            ("u", 2, f"{key} % 3 = 0"),
            ("d", 3, f"{key} % 7 = 0"),
        ):
            parts.append(
                f"SELECT '{topic}' AS table_name, '{op}' AS __op, "
                f"COUNT(*) AS record_count, COUNT(DISTINCT {key}) AS unique_keys, "
                f"MAX({key} * 10 + {v}) AS max_lsn FROM {tbl} WHERE {pred}"
            )
    return " UNION ALL ".join(parts)


CDC_MULTI_TABLE_SUMMARY_SQL = _multi_summary_sql()
