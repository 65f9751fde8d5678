"""Table maintenance: small-file compaction (SURVEY §4).

The reference targets 128 MB data files with auto-compaction via
Iceberg table properties (``task6-ecommerce-tables-config.yaml:51-61``,
batch design.md:193; requirements.md:41). Plain-parquet tables don't
get that for free — this job is the stand-in for Iceberg's
``rewrite_data_files``: rewrite each (optionally partitioned) table
into ⌈bytes/target⌉ files, atomically (write beside, swap).

Why it matters at 100 TB: streaming sinks and per-batch appends
produce files sized by *trigger cadence*, not by optimal scan width;
a 128 MB target keeps scan task counts ≈ data size / target and
avoids driver-side file-listing blowup (millions of tiny files is the
classic lakehouse failure mode).
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024


def table_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files if f.endswith(".parquet"))
    return total


def parquet_file_count(path: str) -> int:
    return sum(
        1 for root, _d, files in os.walk(path) for f in files if f.endswith(".parquet")
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = TARGET_FILE_BYTES,
    partition_cols: list[str] | None = None,
) -> int:
    """Rewrite ``path`` into ⌈size/target⌉ files; returns new file count.

    Partitioned tables keep their layout (each partition is rewritten
    through a repartition on the partition key so one task owns one
    partition's output). The swap is atomic at the directory level:
    readers either see the old or the new table, never a mix.
    """
    df = spark.read.parquet(path)
    n_files = max(1, math.ceil(table_bytes(path) / target_bytes))
    tmp = path.rstrip("/") + "__compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    writer = df.repartition(n_files, *partition_cols) if partition_cols else df.coalesce(n_files)
    if partition_cols:
        writer.write.mode("overwrite").partitionBy(*partition_cols).parquet(tmp)
    else:
        writer.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return parquet_file_count(path)
