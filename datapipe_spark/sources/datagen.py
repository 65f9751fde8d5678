"""Synthetic row generation (SURVEY §2.1 S12, §2.7 F16/F17).

Re-expresses the reference's SQL data generator — ``generate_series``
driven INSERT...SELECT with random array-element picks
(``1-data-ingestion-pipeline/sample_data_postgres.sql:17-64``,
``data-generator.py:109-142``) — as ``spark.range`` + column
arithmetic.

Determinism: the reference uses ``random()``; we swap in an explicit
LCG (``r = (id*1103515245 + 12345) mod 2^31``) so the same rows come
out of Spark and the DuckDB oracle. Same shape, same value
distributions, reproducible.

Scale: ``spark.range(n)`` parallelizes row synthesis across executors
with no input I/O and no shuffle — generation throughput scales
linearly with cores (this is also how the 10k events/sec ingest
harness would be driven on a cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_ROWS = 10_000
_STATUSES = ("pending", "processing", "shipped", "delivered", "cancelled")
_LCG_A, _LCG_C, _LCG_M = 1103515245, 12345, 2**31


def synthetic_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generate N orders: LCG-derived user assignment, status pick from
    the 5-value enum (F17 random-array-element), money amount, and a
    created_at spread over a day (F16 generate_series ≡ spark.range)."""
    r = (F.col("id") * _LCG_A + _LCG_C) % _LCG_M
    status = F.element_at(
        F.array(*[F.lit(s) for s in _STATUSES]), (r % 5 + 1).cast("int")
    )
    return spark.range(1, N_ROWS + 1).select(
        F.col("id"),
        (r % 1500 + 1).alias("user_id"),
        F.concat(F.lit("user_"), (r % 1500 + 1).cast("string"), F.lit("@example.com")).alias(
            "email"
        ),
        status.alias("status"),
        # decimal(10,2) pins the cent grid; the final DOUBLE cast follows
        # the engine-wide money→double output convention (raw decimals
        # hash differently across engines in the driver's comparator)
        ((r % 99000 + 1000) / F.lit(100.0))
        .cast("decimal(10,2)")
        .cast("double")
        .alias("total_amount"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=(r % 86400).cast("double"))
        ).alias("created_at"),
    )


SYNTHETIC_ORDERS_SQL = f"""
WITH g AS (
  SELECT i AS id, (i * {_LCG_A} + {_LCG_C}) % {_LCG_M} AS r
  FROM generate_series(1, {N_ROWS}) t(i)
)
SELECT id,
  r % 1500 + 1 AS user_id,
  'user_' || CAST(r % 1500 + 1 AS VARCHAR) || '@example.com' AS email,
  (ARRAY[{", ".join(f"'{s}'" for s in _STATUSES)}])[CAST(r % 5 + 1 AS INT)] AS status,
  CAST(CAST((r % 99000 + 1000) / 100.0 AS DECIMAL(10,2)) AS DOUBLE) AS total_amount,
  TIMESTAMP '2024-01-01 00:00:00' + to_seconds(r % 86400) AS created_at
FROM g
"""
