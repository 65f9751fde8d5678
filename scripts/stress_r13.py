#!/usr/bin/env python
"""Round-13 stress additions (r12 verdict asks #1, #2, #5, #6).

1. ``state_store_scale`` — the one component the r12 verdict called
   un-survivable at 100 TB state: all stateful streaming ran on the
   default HDFS-backed provider, which keeps EVERY state row on the
   executor heap. Run an identical 2M-distinct-key streaming dedup on
   both providers (fresh checkpoints; provider pinned per query) and
   record wall + post-GC JVM heap growth + checkpoint state bytes.
   The claim under test: RocksDB's heap envelope is flat in key count
   (state lives off-heap/on-disk), the HDFS provider's grows
   linearly.

2. ``snapshot_append_scale`` — r13 rewrote ``commit_snapshot`` to
   manifest-linked appends. Append a FIXED 20k-row increment onto
   bases of 1M / 4M / 16M rows (~170 B/row): the commit wall must be
   flat in base size (the pre-r13 copy-on-write shape — re-written
   here as the explicit ``rewrite`` control — grows linearly), and
   so must the manifest-diff incremental read of that increment.

3. ``tombstone_gate_cliff`` — r12 measured tombstone-queue read drag
   only in the broadcast regime; the post-gate shuffle anti-join
   regime was extrapolated. Sweep queue depths across the PRODUCTION
   2M-row gate on a 4M-key store (200k → 3M tombstones), with a
   forced-other-regime control at each depth: the curve locates the
   actual step between regimes at the gate the fold guidance cites.

4. ``salted_join_curve`` — ``operators/skew.salted_join`` was
   equality-tested only. One hot key owning 25% of a 32M-row fact
   joined to a 1M-row dim, too big to broadcast (threshold forced
   off, the large-large case salting exists for): plain shuffle join
   vs AQE skew-split vs salt 8/32. AQE's skew thresholds are scaled
   down (256 MB → 8 MB) so its split logic engages at bench volume —
   the same RATIO a 100 TB run hits with default thresholds.

Usage: python scripts/stress_r13.py [experiment ...]
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
from stress_r12 import _link_clone, _median_wall  # noqa: E402


def _heap_used_bytes(spark) -> int:
    """Post-GC used heap of the local-mode JVM (driver+executors share
    it on local[N], so retained state shows up here)."""
    jvm = spark.sparkContext._jvm
    jvm.java.lang.System.gc()
    time.sleep(1.0)
    jvm.java.lang.System.gc()
    rt = jvm.java.lang.Runtime.getRuntime()
    return int(rt.totalMemory() - rt.freeMemory())


def _dir_bytes(root: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(root):
        for n in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, n))
            except OSError:
                pass
    return total


def state_store_scale(spark, scratch: str) -> None:
    from datapipe_spark.streaming.jobs import _STATE_STORE_PROVIDERS

    n_keys = 2_000_000
    drops = os.path.join(scratch, "state_drops")
    # 4 drop files; every 10th key re-delivered so dedup state does
    # real work; keys shuffled across files (worst-case state churn)
    (
        spark.range(n_keys)
        .selectExpr(
            "id AS k",
            "CAST(id % 1000 AS STRING) AS attr",
        )
        .unionAll(
            spark.range(0, n_keys, 10).selectExpr(
                "id AS k", "CAST(id % 1000 AS STRING) AS attr"
            )
        )
        .repartition(4)
        .write.mode("overwrite")
        .parquet(drops)
    )
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf_key, None)
    results = {}
    for provider in ("rocksdb", "hdfs"):
        ckpt = os.path.join(scratch, f"state_ckpt_{provider}")
        sink = os.path.join(scratch, f"state_sink_{provider}")
        spark.conf.set(conf_key, _STATE_STORE_PROVIDERS[provider])
        heap0 = _heap_used_bytes(spark)
        t0 = time.monotonic()
        q = (
            spark.readStream.schema("k long, attr string")
            .option("maxFilesPerTrigger", "2")
            .parquet(drops)
            .dropDuplicates(["k"])
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.monotonic() - t0
        heap1 = _heap_used_bytes(spark)
        n_out = spark.read.parquet(sink).count()
        assert n_out == n_keys, (provider, n_out)
        results[provider] = {
            "wall_s": round(wall, 2),
            "heap_growth_mb": round((heap1 - heap0) / 1e6, 1),
            "ckpt_state_mb": round(
                _dir_bytes(os.path.join(ckpt, "state")) / 1e6, 1
            ),
        }
        print(
            json.dumps({
                "experiment": "state_store_scale",
                "provider": provider,
                "n_distinct_keys": n_keys,
                **results[provider],
            }),
            flush=True,
        )
    if prev is None:
        spark.conf.unset(conf_key)
    else:
        spark.conf.set(conf_key, prev)


def snapshot_append_scale(spark, scratch: str) -> None:
    from datapipe_spark.operators import snapshots as snap

    increment = 20_000
    # ~170B pseudo-random payload per row: wide enough that writes are
    # byte-bound (not task-overhead-bound) and immune to RLE collapse
    payload = [
        "id",
        "CAST(id % 97 AS DOUBLE) AS v",
        "concat(md5(CAST(id AS STRING)), md5(CAST(id + 1 AS STRING)), "
        "md5(CAST(id + 2 AS STRING)), md5(CAST(id + 3 AS STRING)), "
        "md5(CAST(id + 4 AS STRING))) AS s",
    ]
    rows = []
    for base_rows in (1_000_000, 4_000_000, 16_000_000):
        table = os.path.join(scratch, f"snap_{base_rows}")
        base = spark.range(base_rows).selectExpr(*payload)
        snap.commit_snapshot(base.repartition(8), table)
        inc = spark.range(base_rows, base_rows + increment).selectExpr(*payload)
        t0 = time.monotonic()
        v2 = snap.commit_snapshot(inc, table, mode="append")
        append_wall = time.monotonic() - t0
        # incremental scan: the manifest file-diff must also be flat
        # in base size (it reads only the appended files)
        t0 = time.monotonic()
        n_inc = snap.read_incremental(spark, table, v2 - 1, v2).count()
        incr_read_wall = time.monotonic() - t0
        assert n_inc == increment, n_inc
        t0 = time.monotonic()
        snap.read_snapshot(spark, table).count()
        full_read_wall = time.monotonic() - t0
        # control: the pre-r13 copy-on-write shape (base ∪ increment
        # fully rewritten) — what an O(table) append costs
        rewrite_dir = os.path.join(scratch, f"snap_rw_{base_rows}")
        t0 = time.monotonic()
        base.unionByName(inc).write.mode("overwrite").parquet(rewrite_dir)
        rewrite_wall = time.monotonic() - t0
        n = snap.read_snapshot(spark, table).count()
        assert n == base_rows + increment, n
        rows.append({
            "base_rows": base_rows,
            "append_wall_s": round(append_wall, 2),
            "cow_rewrite_wall_s": round(rewrite_wall, 2),
            "incremental_read_wall_s": round(incr_read_wall, 2),
            "full_read_wall_s": round(full_read_wall, 2),
        })
        print(
            json.dumps({"experiment": "snapshot_append_scale", **rows[-1]}),
            flush=True,
        )
    print(
        json.dumps({"experiment": "snapshot_append_scale_summary", "rows": rows}),
        flush=True,
    )


def tombstone_gate_cliff(spark, scratch: str) -> None:
    """Queue depths straddle the PRODUCTION 2M-row broadcast gate on a
    4M-key store — no gate-lowering: the depths where the regime flips
    are the depths the fold guidance actually talks about. The r12
    sweep (depth ≤ 400 tombstones) saw only the flat broadcast step;
    this locates what the reader pays when the queue outgrows the gate
    and the anti-join falls back to a shuffle, and the forced-broadcast
    control shows what staying map-side would cost at that depth."""
    from pyspark.sql import functions as F  # noqa: F401

    from datapipe_spark.operators import scd2

    n_keys = 4_000_000
    gate = scd2.SCD2_BROADCAST_MAX_ROWS
    base = os.path.join(scratch, "cliff_base")
    _bulk_load(spark, base, n_keys, 16)
    rows = []
    for n_tomb in (0, 200_000, 1_000_000, 1_900_000, 2_200_000, 3_000_000):
        store = os.path.join(scratch, f"cliff_{n_tomb}")
        _link_clone(base, store)
        if n_tomb:
            stride = max(1, n_keys // n_tomb)
            keys = spark.range(n_tomb).selectExpr(
                f"CAST(id * {stride} AS LONG) AS id"
            )
            scd2.scd2_queue_purge(spark, store, keys)
        queued = int(scd2._meta(store).get("n_tombstones", 0))
        read_w = _median_wall(
            lambda: scd2.scd2_read_history(spark, store).count()
        )
        # control: force the other regime at the same depth, so the
        # step (if any) is attributable to the regime, not the depth
        forced_gate = 10**9 if queued > gate else 0
        try:
            scd2.SCD2_BROADCAST_MAX_ROWS = forced_gate
            control_w = _median_wall(
                lambda: scd2.scd2_read_history(spark, store).count()
            )
        finally:
            scd2.SCD2_BROADCAST_MAX_ROWS = gate
        rows.append({
            "n_tombstones": queued,
            "gate": gate,
            "regime": "broadcast" if queued <= gate else "shuffle",
            "read_wall_s": round(read_w, 2),
            "other_regime_wall_s": round(control_w, 2),
        })
        print(
            json.dumps({"experiment": "tombstone_gate_cliff", **rows[-1]}),
            flush=True,
        )
    print(
        json.dumps({"experiment": "tombstone_gate_cliff_summary", "rows": rows}),
        flush=True,
    )


def salted_join_curve(spark, scratch: str) -> None:  # noqa: ARG001
    from pyspark.sql import functions as F

    from datapipe_spark.operators.skew import salted_join

    n_fact, n_dim = 32_000_000, 1_000_000
    # one key owns 25% of the fact — at 32 shuffle partitions the hot
    # reducer carries ~8M rows vs the ~750k average, a 10×+ long pole
    fact = spark.range(n_fact).select(
        F.when(F.col("id") % 4 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_dim)))
        .cast("long")
        .alias("user_id"),
        (F.col("id") % 1000).cast("double").alias("amount"),
    )
    dim = spark.range(n_dim).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 7).cast("string").alias("tier"),
    )
    fact.persist().count()
    dim.persist().count()

    def run(df):
        return df.groupBy("tier").agg(
            F.count("*").alias("n"), F.sum("amount").alias("amt")
        ).collect()

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    prev_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    prev_thresh = spark.conf.get(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
    )
    prev_advis = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    for k, v in confs.items():
        spark.conf.set(k, v)
    rows = []
    try:
        variants = [
            ("plain", "off", lambda: fact.join(dim, "user_id")),
            ("aqe_skew", "scaled", lambda: fact.join(dim, "user_id")),
            ("salt8", "off", lambda: salted_join(fact, dim, "user_id", n_salt=8)),
            ("salt32", "off", lambda: salted_join(fact, dim, "user_id", n_salt=32)),
        ]
        for name, skew_mode, build in variants:
            if skew_mode == "off":
                spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
                spark.conf.set(
                    "spark.sql.adaptive.skewJoin."
                    "skewedPartitionThresholdInBytes",
                    prev_thresh,
                )
                spark.conf.set(
                    "spark.sql.adaptive.advisoryPartitionSizeInBytes", prev_advis
                )
            else:
                # scale AQE's skew thresholds to bench volume: default
                # 256 MB assumes production partitions; our hot key is
                # ~10% of ~150 MB — same ratio, smaller absolute
                spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
                spark.conf.set(
                    "spark.sql.adaptive.skewJoin."
                    "skewedPartitionThresholdInBytes",
                    "8m",
                )
                spark.conf.set(
                    "spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m"
                )
            w = _median_wall(lambda b=build: run(b()), n=3)
            rows.append({"variant": name, "wall_s": round(w, 2)})
            print(
                json.dumps({"experiment": "salted_join_curve", **rows[-1]}),
                flush=True,
            )
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prev_skew)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            prev_thresh,
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", prev_advis
        )
        fact.unpersist()
        dim.unpersist()
    print(
        json.dumps({"experiment": "salted_join_curve_summary", "rows": rows}),
        flush=True,
    )


def main() -> None:
    from datapipe_spark import get_spark

    which = set(sys.argv[1:]) or {
        "state_store_scale", "snapshot_append_scale",
        "tombstone_gate_cliff", "salted_join_curve",
    }
    spark = get_spark()
    scratch = "/tmp/datapipe_spark_stress_r13"
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch, exist_ok=True)
    try:
        if "state_store_scale" in which:
            state_store_scale(spark, scratch)
        if "snapshot_append_scale" in which:
            snapshot_append_scale(spark, scratch)
        if "tombstone_gate_cliff" in which:
            tombstone_gate_cliff(spark, scratch)
        if "salted_join_curve" in which:
            salted_join_curve(spark, scratch)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
