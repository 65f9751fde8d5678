#!/usr/bin/env python
"""Round-10 stress additions: scale shape of the two new SCD2 store
maintenance writers.

1. ``purge`` — compliance-erasure wall vs store size. Stores of
   200k / 800k / 3.2M keys (size-targeted buckets, ~25k keys/bucket)
   with a 10%-of-keys closed-history slice take the same fixed 8-key
   purge: the open side rewrites min(buckets, keys) size-targeted
   buckets (flat in store size), the closed side is one filter scan +
   clustered rewrite of the history slice (∝ closed bytes, BY DESIGN —
   erasure covers all history). The row separates the two terms so the
   100 TB reading is honest: batching erasure requests amortizes the
   closed-side pass, the open-side cost tracks the request.

2. ``migrate`` — in-place layout migration wall vs store size
   (200k / 800k keys with the same 10% closed slice): one bucket
   shuffle of the open slice + one (cbucket, inc) range-cluster of the
   history slice, O(store) once per layout generation. Content
   row-counts asserted after each run.

Usage: python scripts/stress_r10.py [purge|migrate ...]
Prints one JSON line per experiment.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bulk_load(spark, store: str, n_keys: int, n_buckets: int) -> None:
    from pyspark.sql import functions as F

    from datapipe_spark.operators import scd2

    scd2.scd2_init(spark, store, n_buckets=n_buckets)
    load = spark.range(n_keys).select(
        "id",
        (F.col("id") % 1000).alias("user_id"),
        F.lit("s0").alias("status"),
        (F.col("id") % 997).cast("decimal(18,2)").cast("string").alias("total_amount"),
        F.lit("c").alias("__op"),
        F.expr("timestamp'2024-01-01'").alias("__ts_ms"),
        (F.col("id") * 100_000).alias("__source_lsn"),
    )
    scd2.scd2_upsert(spark, store, load, batch_id=0)
    # close 10% of keys' first versions (an update tail) so the store
    # carries a real closed/ slice for the history-side term
    upd = spark.range(0, n_keys, 10).select(
        "id",
        (F.col("id") % 1000).alias("user_id"),
        F.lit("s1").alias("status"),
        (F.col("id") % 997 + 1).cast("decimal(18,2)").cast("string").alias("total_amount"),
        F.lit("u").alias("__op"),
        F.expr("timestamp'2024-01-01' + make_interval(0,0,0,0,0,1)").alias("__ts_ms"),
        (F.col("id") * 100_000 + 1).alias("__source_lsn"),
    )
    scd2.scd2_upsert(spark, store, upd, batch_id=1)


def purge(spark, scratch: str) -> None:
    from datapipe_spark.operators import scd2
    from datapipe_spark.operators.maintenance import table_bytes

    keys_per_bucket = 25_000
    rows = []
    for n_keys in (200_000, 800_000, 3_200_000):
        n_buckets = max(8, n_keys // keys_per_bucket)
        store = os.path.join(scratch, f"purge_{n_keys}")
        t0 = time.monotonic()
        _bulk_load(spark, store, n_keys, n_buckets)
        t_load = time.monotonic() - t0
        open_bytes = table_bytes(os.path.join(store, "current"))
        closed_bytes = table_bytes(os.path.join(store, "closed"))
        # fixed 8-key purge: keys spread across the id space, half of
        # them with closed history (ids ≡ 0 mod 10)
        ids = [i * (n_keys // 8) + (0 if i % 2 else 5) for i in range(8)]
        keys = spark.createDataFrame([(int(i),) for i in ids], "id long")
        before = scd2.scd2_read_history(spark, store).count()
        t0 = time.monotonic()
        scd2.scd2_purge_keys(spark, store, keys)
        wall = time.monotonic() - t0
        after = scd2.scd2_read_history(spark, store).count()
        purged = before - after
        assert purged >= 8, (before, after)
        rows.append({
            "n_keys": n_keys,
            "n_buckets": n_buckets,
            "load_s": round(t_load, 1),
            "open_mb": round(open_bytes / 1e6, 1),
            "closed_mb": round(closed_bytes / 1e6, 1),
            "purge_wall_s": round(wall, 2),
            "versions_purged": purged,
        })
        print(json.dumps({"experiment": "purge", **rows[-1]}), flush=True)
    print(json.dumps({"experiment": "purge_summary", "rows": rows}), flush=True)


def migrate(spark, scratch: str) -> None:
    from datapipe_spark.operators import scd2

    rows = []
    for n_keys in (200_000, 800_000):
        modern = os.path.join(scratch, f"mig_src_{n_keys}")
        _bulk_load(spark, modern, n_keys, max(8, n_keys // 25_000))
        hist = scd2.scd2_read_history(spark, modern)
        want = hist.count()
        legacy = os.path.join(scratch, f"mig_{n_keys}")
        scd2._write_legacy_store(spark, hist, legacy)
        t0 = time.monotonic()
        assert scd2.scd2_migrate(spark, legacy) is True
        wall = time.monotonic() - t0
        got = scd2.scd2_read_history(spark, legacy).count()
        assert got == want, (got, want)
        rows.append({
            "n_keys": n_keys,
            "history_rows": want,
            "migrate_wall_s": round(wall, 2),
        })
        print(json.dumps({"experiment": "migrate", **rows[-1]}), flush=True)
    print(json.dumps({"experiment": "migrate_summary", "rows": rows}), flush=True)


def expire(spark, scratch: str) -> None:
    """History-retention wall vs store size: stores of 200k / 800k /
    3.2M keys with a 10%-of-keys closed slice expire half that slice
    (horizon between the two closed generations... here: all closed
    rows end at +1min, so a post-horizon cutoff retires the WHOLE
    slice — the bulk-retirement case retention exists for). One filter
    scan + clustered rewrite of closed/, O(closed)."""
    import datetime as dt

    from datapipe_spark.operators import scd2
    from datapipe_spark.operators.maintenance import table_bytes

    rows = []
    for n_keys in (200_000, 800_000, 3_200_000):
        store = os.path.join(scratch, f"expire_{n_keys}")
        _bulk_load(spark, store, n_keys, max(8, n_keys // 25_000))
        closed_mb = table_bytes(os.path.join(store, "closed")) / 1e6
        t0 = time.monotonic()
        stats = scd2.scd2_expire_closed(spark, store, dt.datetime(2024, 1, 2))
        wall = time.monotonic() - t0
        assert stats["expired_versions"] == n_keys // 10, stats
        rows.append({
            "n_keys": n_keys,
            "closed_mb": round(closed_mb, 1),
            "expired_versions": stats["expired_versions"],
            "expire_wall_s": round(wall, 2),
        })
        print(json.dumps({"experiment": "expire", **rows[-1]}), flush=True)
    print(json.dumps({"experiment": "expire_summary", "rows": rows}), flush=True)


def index_purge(spark, scratch: str) -> None:
    """Band-index erasure wall vs index size: indexes over 20k / 80k /
    320k docs (~20% verbatim copies) take the same fixed 16-doc purge.
    The purge is ONE map-only pass per part behind broadcasts, so the
    wall is expected to grow with index bytes (the inherent full
    rewrite of immutable files) — the row quantifies that slope so the
    'batch your erasure backlog' guidance is backed by numbers."""
    from pyspark.sql import functions as F

    from datapipe_spark.operators import dedup_index as di
    from datapipe_spark.operators.maintenance import table_bytes

    rows = []
    for n_docs in (20_000, 80_000, 320_000):
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.expr(
                # ~20% verbatim copies: content keyed by id mod (4n/5)
                f"concat_ws(' ', transform(sequence(1, 12), "
                f"i -> concat('w', pmod(hash(pmod(id, {n_docs * 4 // 5}), i), 5000))))"
            ).alias("text"),
        )
        idx = os.path.join(scratch, f"bidx_{n_docs}")
        t0 = time.monotonic()
        di.build_minhash_index(spark, docs, idx)
        t_build = time.monotonic() - t0
        idx_mb = sum(
            table_bytes(os.path.join(idx, p)) for p in ("mem", "sigs", "bands")
        ) / 1e6
        ids = [i * (n_docs // 16) for i in range(16)]
        backlog = spark.createDataFrame([(int(i),) for i in ids], "doc_id long")
        t0 = time.monotonic()
        stats = di.purge_minhash_index(spark, idx, backlog)
        wall = time.monotonic() - t0
        assert stats["purged_docs"] == 16, stats
        rows.append({
            "n_docs": n_docs,
            "build_s": round(t_build, 1),
            "index_mb": round(idx_mb, 1),
            "purge_wall_s": round(wall, 2),
            **stats,
        })
        print(json.dumps({"experiment": "index_purge", **rows[-1]}), flush=True)
    print(json.dumps({"experiment": "index_purge_summary", "rows": rows}), flush=True)


def ivf_purge(spark, scratch: str) -> None:
    """IVF-index erasure wall vs index size: indexes over 100k / 400k /
    1.6M dim-64 vectors take the same fixed 16-id purge. Unlike the
    band index, the hive qcell= layout means only TOUCHED partitions
    rewrite — measured 2.8× wall across the 16× decade, the slope
    being per-touched-cell bytes (n/nlist grows with n at fixed-√n
    nlist) plus the per-file listing tax of the uncompacted fresh
    build (the tax compact_ivf_index removes)."""
    from pyspark.sql import functions as F

    from datapipe_spark.operators import similarity as sim
    from datapipe_spark.operators.maintenance import table_bytes

    rows = []
    for n_vecs in (100_000, 400_000, 1_600_000):
        sf = os.path.join(scratch, f"ivf_sf_{n_vecs}")
        os.makedirs(sf, exist_ok=True)
        spark.range(n_vecs).select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(1, 64), "
                "i -> cast(pmod(hash(id, i), 1000) as double) / 1000.0)"
            ).alias("embedding"),
        ).write.mode("overwrite").parquet(os.path.join(sf, "embeddings.parquet"))
        idx = os.path.join(scratch, f"ivf_{n_vecs}")
        t0 = time.monotonic()
        meta = sim.build_ivf_index(spark, sf, idx)
        t_build = time.monotonic() - t0
        idx_mb = table_bytes(os.path.join(idx, "cells")) / 1e6
        ids = [i * (n_vecs // 16) for i in range(16)]
        backlog = spark.createDataFrame([(int(i),) for i in ids], "vec_id long")
        t0 = time.monotonic()
        stats = sim.purge_ivf_index(spark, idx, backlog)
        wall = time.monotonic() - t0
        assert stats["purged_vecs"] == 16, stats
        rows.append({
            "n_vecs": n_vecs,
            "nlist": meta["nlist"],
            "build_s": round(t_build, 1),
            "cells_mb": round(idx_mb, 1),
            "purge_wall_s": round(wall, 2),
            "touched_cells": stats["touched_cells"],
        })
        print(json.dumps({"experiment": "ivf_purge", **rows[-1]}), flush=True)
    print(json.dumps({"experiment": "ivf_purge_summary", "rows": rows}), flush=True)


def main() -> None:
    import tempfile

    from datapipe_spark import get_spark

    which = set(sys.argv[1:]) or {
        "purge", "migrate", "expire", "index_purge", "ivf_purge"
    }
    spark = get_spark("stress-r10")
    scratch = tempfile.mkdtemp(prefix="stress_r10_")
    try:
        if "purge" in which:
            purge(spark, scratch)
        if "migrate" in which:
            migrate(spark, scratch)
        if "expire" in which:
            expire(spark, scratch)
        if "index_purge" in which:
            index_purge(spark, scratch)
        if "ivf_purge" in which:
            ivf_purge(spark, scratch)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
