"""Fault-tolerant batch sink (SURVEY §2.1 S9, §2.8 T6).

The reference's ClickHouse writer appends in 10k-row batches with no
isolation and, on failure, re-serializes the batch to a Kafka retry
topic instead of failing the stream (realtime design.md:516-540).
File-backed equivalent: a ``foreachBatch`` writer that attempts the
primary sink and, when a write raises, diverts the whole micro-batch
to a retry directory as JSON rows (``to_json(struct(*))`` — F12) with
error metadata. The stream keeps running either way, matching the
reference's at-least-once posture; the retry dir is the re-drive
queue.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resilient_writer(primary_path: str, retry_path: str, write_fn=None):
    """Build a foreachBatch function writing to ``primary_path`` with
    whole-batch diversion to ``retry_path`` on failure.

    ``write_fn(df, path)`` is injectable for tests (default: parquet
    append). At 100 TB the same shape wraps a JDBC writer with
    ``option("batchsize", 10000).option("isolationLevel", "NONE")``.
    """
    do_write = write_fn or (lambda df, path: df.write.mode("append").parquet(path))

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        try:
            do_write(batch, primary_path)
        except Exception as exc:  # divert, don't fail the stream
            (
                batch.select(
                    F.to_json(F.struct("*")).alias("payload"),
                    F.lit(str(exc)[:500]).alias("error"),
                    F.lit(batch_id).alias("batch_id"),
                )
                .write.mode("append")
                .parquet(retry_path)
            )

    return write_batch


def redrive(spark, retry_path: str, schema: str) -> DataFrame:
    """Read diverted batches back for re-processing (the retry-topic
    consumer): parse the JSON payloads with the target schema."""
    raw = spark.read.parquet(retry_path)
    return raw.select(F.from_json("payload", schema).alias("r"), "batch_id").select(
        "r.*", "batch_id"
    )
