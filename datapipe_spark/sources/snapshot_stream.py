"""Streaming SOURCE over the versioned snapshot table (S8 × S2).

The reference's consumers tail its Iceberg tables incrementally (the
batch layer's downstream marts re-read only new snapshots; Iceberg
exposes this as the changelog/incremental scan). Spark 4's Python
DataSource API makes that a first-class STREAM here: offsets are
committed snapshot versions, each micro-batch is the manifest
file-diff between two versions, and every data file is one input
partition read EXECUTOR-SIDE as Arrow batches
(``DataSourceStreamReader``, not the driver-funneling
``SimpleDataSourceStreamReader`` — a 100 TB table's increment must
never serialize through the driver).

Semantics:

- ``initialOffset`` = version 0, so a fresh query first consumes the
  table's current snapshot as its initial load, then each subsequent
  batch consumes exactly the files new versions appended — the same
  file-set diff ``snapshots.read_incremental`` serves in batch form.
- Versions consumed PAST the initial load must be appends: an
  overwrite/rewrite/delete/merge in the range REPLACED history, so
  the planner raises instead of silently re-emitting rewritten rows
  (Iceberg's incremental read makes the same refusal).
- Offsets live in the checkpoint's offset log; replaying a batch
  yields the identical file list, so a downstream idempotent sink
  gets exactly-once content.
- ``Trigger.AvailableNow`` on a Python source falls back to Spark's
  single-batch execution (everything up to ``latestOffset`` in one
  batch per run) — restart-resumes from the committed offset, which
  the exactly-once test pins; a live ``processingTime`` trigger gets
  the ordinary one-batch-per-new-version cadence.
- Hive partition columns are reconstructed from each file's directory
  path and cast to the snapshot's PINNED schema (the same
  partition-type discipline ``read_snapshot`` applies); columns added
  by later schema evolution read back NULL for older files.

ISOLATION NOTE: Spark runs Python data sources in dedicated worker
processes (the streaming-source runner on the driver side, task
workers on the executor side) that import NOTHING of this repo — the
class ships to them via cloudpickle. This module is therefore
deliberately SELF-CONTAINED (its few snapshot-layout helpers are
re-implemented inline instead of importing ``operators.snapshots``)
and registers ITSELF for by-value pickling, so the class unpickles
anywhere pyspark + pyarrow exist. Keep it dependency-free.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

FORMAT_NAME = "datapipe_snapshot_stream"

# max input partitions per micro-batch (files are bundled round-robin)
_MAX_SLICES = 32


# -- snapshot-layout helpers, duplicated from operators.snapshots on
# -- purpose (see ISOLATION NOTE): pointer file, per-version metadata,
# -- manifest with pre-r13 directory-walk fallback


def _current_version(table_dir: str) -> int | None:
    try:
        with open(os.path.join(table_dir, "_LATEST")) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def _read_meta(table_dir: str, version: int) -> dict:
    path = os.path.join(table_dir, "_meta", f"v{version:05d}.json")
    with open(path) as f:
        return json.load(f)


def _manifest(table_dir: str, version: int) -> list[str]:
    try:
        meta = _read_meta(table_dir, version)
    except FileNotFoundError:
        meta = {}
    files = meta.get("files")
    if files is not None:
        return list(files)
    root = os.path.join(table_dir, f"v{version:05d}")
    out = []
    for dirpath, _dirs, names in os.walk(root):
        for n in names:
            if n.endswith(".parquet"):
                out.append(
                    os.path.relpath(os.path.join(dirpath, n), table_dir)
                )
    return sorted(out)


def _pinned_schema(table_dir: str) -> StructType:
    cur = _current_version(table_dir)
    if cur is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    sj = _read_meta(table_dir, cur).get("schema")
    if sj is None:
        raise ValueError(
            f"snapshot table {table_dir} has no pinned schema "
            "(pre-r5 layout) — not streamable"
        )
    return StructType.fromJson(sj)


class _FileSlice(InputPartition):
    def __init__(self, table_dir: str, rel_paths: list[str], schema_json: str):
        self.table_dir = table_dir
        self.rel_paths = rel_paths
        self.schema_json = schema_json


class SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, table_dir: str, schema: StructType):
        self._table_dir = table_dir
        self._schema_json = schema.json()

    def initialOffset(self) -> dict:
        return {"version": 0}

    def latestOffset(self) -> dict:
        return {"version": _current_version(self._table_dir) or 0}

    def partitions(self, start: dict, end: dict):
        v0, v1 = int(start["version"]), int(end["version"])
        if v1 <= v0:
            return []
        # v0 == 0 is the genesis batch: the diff against an empty base
        # IS the end version's snapshot — the initial load, valid for
        # ANY commit-mode history (a compacted or DML-touched table
        # must stay streamable for NEW consumers). Past genesis, two
        # loud refusals:
        #
        # 1. retention cliff — if the start version's metadata was
        #    EXPIRED, its manifest is gone and the file-diff would
        #    silently degrade to "everything is new" (duplicates, the
        #    one thing a change feed must never emit);
        # 2. replaced history — a non-append commit inside the range,
        #    checked in O(1) via the carried ``lineage_base`` (the
        #    most recent non-append version at-or-before the end),
        #    which stays answerable even when tag-pinned expiry
        #    leaves holes where a per-version mode walk would crash.
        if v0 > 0:
            try:
                _read_meta(self._table_dir, v0)
            except FileNotFoundError:
                raise ValueError(
                    f"snapshot stream offset version {v0} has been "
                    f"expired from {self._table_dir}: the consumer fell "
                    "behind retention — reset the checkpoint (re-consume "
                    "from the current snapshot) or keep more history"
                ) from None
            to_meta = _read_meta(self._table_dir, v1)
            base = to_meta.get("lineage_base")
            if base is None:
                # pre-lineage metadata: per-version mode walk
                for v in range(v0 + 1, v1 + 1):
                    mode = _read_meta(self._table_dir, v).get("mode")
                    if mode != "append":
                        raise ValueError(
                            "snapshot stream cannot cross non-append "
                            f"version {v} (mode={mode!r}): its commit "
                            "replaced history"
                        )
            elif int(base) > v0:
                raise ValueError(
                    "snapshot stream cannot cross non-append version "
                    f"{int(base)}: its commit replaced history"
                )
        base = set(_manifest(self._table_dir, v0)) if v0 else set()
        new = [
            f for f in _manifest(self._table_dir, v1) if f not in base
        ]
        if not new:
            return []
        # bundle files into bounded slices: each slice is one Python
        # worker invocation, so per-file roundtrips would dominate a
        # many-small-files increment (measured ~2× on the 60-file
        # events feed); 32 slices saturates local[32] and any larger
        # increment is bytes-bound anyway
        n_slices = min(len(new), _MAX_SLICES)
        buckets: list[list[str]] = [[] for _ in range(n_slices)]
        for i, rel in enumerate(new):
            buckets[i % n_slices].append(rel)
        return [
            _FileSlice(self._table_dir, b, self._schema_json)
            for b in buckets
        ]

    def read(self, partition: _FileSlice):
        """One slice of manifest files → Arrow batches matching the
        pinned schema: hive partition columns from each file's path,
        evolution gaps NULL, everything cast to the schema's exact
        Arrow types. Runs inside the executor's Python worker."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        schema = StructType.fromJson(json.loads(partition.schema_json))
        target = to_arrow_schema(schema)
        from urllib.parse import unquote

        for rel in partition.rel_paths:
            tbl = pq.read_table(os.path.join(partition.table_dir, rel))
            # hive dir names percent-encode special chars and spell
            # NULL as __HIVE_DEFAULT_PARTITION__ — decode both, so
            # the feed's VALUES equal what read_snapshot returns,
            # not the escaped path spelling
            part_vals = {}
            for seg in rel.split(os.sep)[:-1]:
                if "=" in seg:
                    k, val = seg.split("=", 1)
                    part_vals[k] = (
                        None
                        if val == "__HIVE_DEFAULT_PARTITION__"
                        else unquote(val)
                    )
            n = tbl.num_rows
            cols = []
            for field in target:
                if field.name in tbl.column_names:
                    cols.append(tbl.column(field.name).cast(field.type))
                elif field.name in part_vals:
                    raw = pa.array(
                        [part_vals[field.name]] * n, type=pa.string()
                    )
                    cols.append(raw.cast(field.type))
                else:
                    cols.append(pa.nulls(n, type=field.type))
            yield from pa.table(cols, schema=target).to_batches(
                max_chunksize=1 << 16
            )

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the checkpoint's offset log


class SnapshotTableStreamSource(DataSource):
    """``spark.readStream.format("datapipe_snapshot_stream")
    .option("path", table_dir).load()`` — register once per session
    via ``register_snapshot_stream(spark)``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        return _pinned_schema(self.options["path"])

    def streamReader(self, schema: StructType) -> SnapshotStreamReader:
        return SnapshotStreamReader(self.options["path"], schema)


def register_snapshot_stream(spark) -> None:
    # ship by VALUE: the data-source runner / task workers import
    # nothing of this repo (see ISOLATION NOTE)
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(SnapshotTableStreamSource)


def read_snapshot_stream(spark, table_dir: str):
    register_snapshot_stream(spark)
    return (
        spark.readStream.format(FORMAT_NAME).option("path", table_dir).load()
    )
