#!/usr/bin/env python
"""Round-12 stress additions (r11 verdict asks #2 and #6).

1. ``queue_depth`` — read-side drag of a LONG-lived SCD2 tombstone
   queue (merge-on-read erasure, Q7): a 400k-key store takes 0 / 5 /
   50 queued purge requests (8 keys each, never folded), and we
   measure the full-history read and the keyed probe at each depth,
   then the compaction fold and the post-fold read. r11 pinned
   fold-EQUALITY; this pins fold-COST guidance: the reader's
   tombstone anti-join is a count-gated broadcast, so the drag should
   stay near-flat until the queue is large — the curve says where
   "fold when queue exceeds X" actually bites.

2. ``ingest_variance`` — N back-to-back replays of the bench's
   streaming ingest metric (``streaming_dedup_events`` at
   $SPARK_GRAFT_SF_DIR) to bound run-to-run variance: the r10→r11
   decline (75.0k → 55.6k → 45.6k ev/s across three measurements)
   needs either a regression cause or a variance envelope showing the
   measurements are one distribution.

Usage: python scripts/stress_r12.py [queue_depth|ingest_variance ...]
Prints one JSON line per experiment.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stress_r10 import _bulk_load  # noqa: E402  (same store fixture)


def _link_clone(src: str, dst: str) -> None:
    """Hardlink-tree clone: store data files are immutable (writers
    only create, rename, or delete whole files), so a link tree is a
    safe mutable clone at zero copy cost."""
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(src, dst, copy_function=os.link)


def _median_wall(fn, n: int = 3) -> float:
    walls = []
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        walls.append(time.monotonic() - t0)
    return statistics.median(walls)


def queue_depth(spark, scratch: str) -> None:
    from pyspark.sql import functions as F

    from datapipe_spark.operators import scd2

    n_keys = 400_000
    base = os.path.join(scratch, "qd_base")
    _bulk_load(spark, base, n_keys, 16)
    probe_ids = [int(i * (n_keys // 100) + 1) for i in range(100)]
    rows = []
    for depth in (0, 5, 50):
        store = os.path.join(scratch, f"qd_{depth}")
        _link_clone(base, store)
        # `depth` separate erasure requests, 8 disjoint keys each,
        # queued and never folded — the long-lived-queue state
        for req in range(depth):
            ids = [int(req * 8_000 + j * 997 + 3) for j in range(8)]
            keys = spark.createDataFrame([(i,) for i in ids], "id long")
            scd2.scd2_queue_purge(spark, store, keys)
        n_tomb = int(scd2._meta(store).get("n_tombstones", 0))
        read_w = _median_wall(
            lambda: scd2.scd2_read_history(spark, store).count()
        )
        keys_df = spark.createDataFrame([(i,) for i in probe_ids], "id long")
        probe_w = _median_wall(
            lambda: scd2.scd2_history_for_keys(spark, store, keys_df).count()
        )
        t0 = time.monotonic()
        scd2.scd2_compact_closed(spark, store)
        fold_w = time.monotonic() - t0
        folded_read_w = _median_wall(
            lambda: scd2.scd2_read_history(spark, store).count()
        )
        rows.append({
            "depth": depth,
            "n_tombstones": n_tomb,
            "read_wall_s": round(read_w, 2),
            "probe_wall_s": round(probe_w, 2),
            "fold_wall_s": round(fold_w, 2),
            "post_fold_read_wall_s": round(folded_read_w, 2),
        })
        print(json.dumps({"experiment": "queue_depth", **rows[-1]}), flush=True)
    print(
        json.dumps({"experiment": "queue_depth_summary", "rows": rows}),
        flush=True,
    )


def ingest_variance(spark, scratch: str) -> None:  # noqa: ARG001
    from datapipe_spark.plans import registry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_events = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    fn = registry.queries()["streaming_dedup_events"]
    fn(spark, sf_dir).count()  # warm the drop-set / state scaffolding
    walls = []
    for _ in range(9):
        t0 = time.monotonic()
        fn(spark, sf_dir).count()
        walls.append(time.monotonic() - t0)
    rates = sorted(round(n_events / w, 1) for w in walls)
    print(
        json.dumps({
            "experiment": "ingest_variance",
            "n_events": n_events,
            "runs": len(walls),
            "rate_min": rates[0],
            "rate_median": rates[len(rates) // 2],
            "rate_max": rates[-1],
            "rate_stdev": round(statistics.stdev(rates), 1),
            "walls_s": [round(w, 2) for w in walls],
        }),
        flush=True,
    )


def snapshot_files_scale(spark, scratch: str) -> None:
    """The ``.files``/``.partitions`` metadata tables at file-count
    scale: an (event_date, hour)-partitioned snapshot of the sf0.1
    events table (~720 hive dirs, one file each) — the listing is a
    driver-side name walk, the footer reads are distributed, so the
    wall should track file count with a small constant, never data
    bytes (no data pages are read)."""
    from pyspark.sql import functions as F

    from datapipe_spark.operators import snapshots as snap

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ev = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .withColumn("event_date", F.to_date("ts").cast("string"))
        .withColumn("hour", F.hour("ts"))
        .repartition("event_date", "hour")
    )
    tbl = os.path.join(scratch, "files_scale")
    snap.commit_snapshot(ev, tbl, partition_by=("event_date", "hour"))
    t0 = time.monotonic()
    files = snap.snapshot_files(spark, tbl)
    n_files = files.count()
    t_files = time.monotonic() - t0
    t0 = time.monotonic()
    n_parts = snap.snapshot_partitions(spark, tbl).count()
    t_parts = time.monotonic() - t0
    total_rows = files.agg(F.sum("record_count")).collect()[0][0]
    print(
        json.dumps({
            "experiment": "snapshot_files_scale",
            "n_files": n_files,
            "n_partitions": n_parts,
            "total_rows": int(total_rows),
            "files_wall_s": round(t_files, 2),
            "partitions_wall_s": round(t_parts, 2),
        }),
        flush=True,
    )


def main() -> None:
    from datapipe_spark import get_spark

    which = set(sys.argv[1:]) or {
        "queue_depth", "ingest_variance", "snapshot_files_scale"
    }
    spark = get_spark()
    scratch = "/tmp/datapipe_spark_stress_r12"
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch, exist_ok=True)
    try:
        if "queue_depth" in which:
            queue_depth(spark, scratch)
        if "ingest_variance" in which:
            ingest_variance(spark, scratch)
        if "snapshot_files_scale" in which:
            snapshot_files_scale(spark, scratch)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
