#!/usr/bin/env python
"""Round-9 stress additions (r8 verdict ask #8): the SCD2 store's
scale behavior after the bucketed-current/ rewrite, plus the
incremental BPE trainer's per-round cost shape.

1. ``scd2_buckets`` — upsert wall-time vs store size, bucketed vs the
   pre-r9 behavior (``n_buckets=1`` ≡ the old full current/ rewrite).
   Stores of 200k / 800k / 3.2M keys with size-targeted buckets
   (~25k keys/bucket) take a fixed 8-key increment: the bucketed
   rewrite cost is min(buckets, keys) × bucket_size — flat in store
   size once buckets are size-targeted — while n_buckets=1 rewrites
   O(live keys) and grows linearly. This is the row that proves r8
   verdict ask #1 landed.

2. ``scd2_maintenance`` — 100-increment maintenance: hot-key version
   chains (every increment updates a shared hot key plus a moving
   window of cold keys), closed/ small-file growth, compaction
   (file count before/after), and deep time travel (``as_of`` at
   mid-lineage) row-equal pre/post compaction.

3. ``bpe_incremental`` — the incremental pair-count trainer vs the
   full-recount reference on the sf0.1 word-type table at k=1024:
   rank-for-rank equality asserted, total wall compared, and the
   per-round cost curve (first vs last quartile of rounds) showing
   work shrinking as merges specialize.

Usage: python scripts/stress_r9.py [buckets|maintenance|bpe ...]
Prints one JSON line per experiment.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

INC_SCHEMA = (
    "id long, user_id long, status string, total_amount string, "
    "__op string, __ts_ms timestamp, __source_lsn long"
)


def _mk_increment(spark, ids, batch: int):
    """Deterministic changelog increment for the given key ids."""
    from pyspark.sql import functions as F

    return (
        spark.createDataFrame([(int(i),) for i in ids], "id long")
        .select(
            "id",
            (F.col("id") % 1000).alias("user_id"),
            F.concat(F.lit("s"), F.lit(batch % 5)).alias("status"),
            (F.col("id") % 997 + F.lit(batch))
            .cast("decimal(18,2)")
            .cast("string")
            .alias("total_amount"),
            F.lit("u" if batch else "c").alias("__op"),
            F.expr(
                f"timestamp'2024-01-01' + make_interval(0,0,0,0,0,{batch})"
            ).alias("__ts_ms"),
            (F.col("id") * 100_000 + batch).alias("__source_lsn"),
        )
    )


def _bulk_load(spark, store: str, n_keys: int, n_buckets: int) -> float:
    from pyspark.sql import functions as F

    from datapipe_spark.operators import scd2

    scd2.scd2_init(spark, store, n_buckets=n_buckets)
    load = (
        spark.range(n_keys)
        .select(
            "id",
            (F.col("id") % 1000).alias("user_id"),
            F.lit("s0").alias("status"),
            (F.col("id") % 997).cast("decimal(18,2)").cast("string").alias("total_amount"),
            F.lit("c").alias("__op"),
            F.expr("timestamp'2024-01-01'").alias("__ts_ms"),
            (F.col("id") * 100_000).alias("__source_lsn"),
        )
    )
    t0 = time.monotonic()
    scd2.scd2_upsert(spark, store, load, batch_id=0)
    return time.monotonic() - t0


def scd2_buckets(spark, scratch: str) -> None:
    from datapipe_spark.operators import scd2

    keys_per_bucket = 25_000
    inc_keys = 8
    rows = []
    for n_keys in (200_000, 800_000, 3_200_000):
        for mode, n_buckets in (
            ("bucketed", max(8, n_keys // keys_per_bucket)),
            ("full-rewrite", 1),
        ):
            store = os.path.join(scratch, f"scd2_{n_keys}_{n_buckets}")
            t_load = _bulk_load(spark, store, n_keys, n_buckets)
            walls = []
            for b in range(1, 4):
                ids = [i * (n_keys // inc_keys) + b for i in range(inc_keys)]
                inc = _mk_increment(spark, ids, b)
                t0 = time.monotonic()
                assert scd2.scd2_upsert(spark, store, inc, batch_id=b)
                walls.append(round(time.monotonic() - t0, 2))
            hist_n = scd2.scd2_read_history(spark, store).count()
            assert hist_n == n_keys + 3 * inc_keys, (hist_n, n_keys)
            rows.append(
                {
                    "n_keys": n_keys,
                    "mode": mode,
                    "n_buckets": n_buckets,
                    "load_s": round(t_load, 1),
                    "upsert_walls_s": walls,
                    "upsert_median_s": sorted(walls)[1],
                }
            )
            print(json.dumps({"experiment": "scd2_buckets", **rows[-1]}), flush=True)
    print(json.dumps({"experiment": "scd2_buckets_summary", "rows": rows}), flush=True)


def scd2_maintenance(spark, scratch: str) -> None:
    from datapipe_spark.operators import scd2
    from datapipe_spark.operators.maintenance import parquet_file_count

    n_keys, n_inc, cold_per_inc = 100_000, 100, 1_000
    store = os.path.join(scratch, "scd2_maint")
    _bulk_load(spark, store, n_keys, n_buckets=8)
    t0 = time.monotonic()
    for b in range(1, n_inc + 1):
        # hot key 0 flaps every increment (deep version chain); a
        # moving window of cold keys updates once each
        ids = [0] + [
            1 + ((b - 1) * cold_per_inc + j) % (n_keys - 1)
            for j in range(cold_per_inc)
        ]
        scd2.scd2_upsert(spark, store, _mk_increment(spark, ids, b), batch_id=b)
    t_maint = time.monotonic() - t0

    mid = n_inc // 2
    pre_hist = scd2.scd2_read_history(spark, store).count()
    t0 = time.monotonic()
    pre_as_of = scd2.scd2_as_of(spark, store, mid).count()
    t_as_of_pre = time.monotonic() - t0
    files_before, files_after = scd2.scd2_compact_closed(spark, store)
    t0 = time.monotonic()
    post_as_of = scd2.scd2_as_of(spark, store, mid).count()
    t_as_of_post = time.monotonic() - t0
    assert post_as_of == pre_as_of
    assert scd2.scd2_read_history(spark, store).count() == pre_hist
    # the hot key's chain is n_inc+1 versions deep
    hot_versions = scd2.scd2_read_history(spark, store).filter("id = 0").count()
    print(
        json.dumps(
            {
                "experiment": "scd2_maintenance",
                "n_increments": n_inc,
                "maintenance_wall_s": round(t_maint, 1),
                "per_increment_s": round(t_maint / n_inc, 2),
                "hot_key_versions": hot_versions,
                "closed_files_before_compact": files_before,
                "closed_files_after_compact": files_after,
                "as_of_mid_rows": pre_as_of,
                "as_of_s_pre_compact": round(t_as_of_pre, 2),
                "as_of_s_post_compact": round(t_as_of_post, 2),
            }
        ),
        flush=True,
    )


def scd2_reads(spark, scratch: str) -> None:
    """Key-pruned reads vs full-scan filters at store scale: on an
    800k-key bucketed store with closed history (3 increments,
    compacted), time `scd2_lookup` / `scd2_history_for_keys` for 8
    keys against the naive read_history().filter(isin) plan."""
    from pyspark.sql import functions as F

    from datapipe_spark.operators import scd2

    n_keys = 800_000
    store = os.path.join(scratch, "scd2_reads")
    _bulk_load(spark, store, n_keys, n_buckets=32)
    for b in (1, 2, 3):  # 50k hot keys flap every increment → 150k
        ids = list(range(50_000))  # closed versions, real history bulk
        scd2.scd2_upsert(spark, store, _mk_increment(spark, ids, b), batch_id=b)
    # small file target: the 15k-row closed history clusters into ~50
    # cbucket-sliced files, the shape a 100 TB store's 128 MB-target
    # compaction produces — at file granularity the cbucket pruning
    # becomes measurable
    scd2.scd2_compact_closed(spark, store, target_bytes=16 * 1024)

    probe = [i * 100_000 + 7 for i in range(8)]
    keys = spark.createDataFrame([(i,) for i in probe], "id long")

    def timed(fn):
        fn()  # warm file listing / codegen
        t0 = time.monotonic()
        n = fn()
        return round(time.monotonic() - t0, 3), n

    t_lookup, n_lookup = timed(lambda: scd2.scd2_lookup(spark, store, probe).count())
    t_hist, n_hist = timed(
        lambda: scd2.scd2_history_for_keys(spark, store, keys).count()
    )
    t_naive, n_naive = timed(
        lambda: scd2.scd2_read_history(spark, store)
        .filter(F.col("id").isin(probe))
        .count()
    )
    assert n_hist == n_naive

    # wall time at this scale is dominated by the fixed per-job
    # overhead (the store scan is tiny on local NVMe); the structural
    # claim is SCAN SURFACE — bytes/files a 100 TB store would read
    import pyarrow.parquet as pq

    tb = sorted(
        {r[0] for r in keys.select(scd2._bucket_of(32).alias("b")).collect()}
    )
    cbs = {
        r[0]
        for r in keys.select(
            F.pmod(F.xxhash64("id"), F.lit(scd2.SCD2_CLOSED_KEY_BUCKETS))
            .cast("int")
            .alias("c")
        ).collect()
    }
    cur_root = scd2._p(store, "current")
    cur_all = cur_pruned = 0
    for bdir in os.listdir(cur_root):
        for f in os.listdir(os.path.join(cur_root, bdir)):
            if f.endswith(".parquet"):
                sz = os.path.getsize(os.path.join(cur_root, bdir, f))
                cur_all += sz
                if int(bdir.split("=")[1]) in tb:
                    cur_pruned += sz
    closed_root = scd2._p(store, "closed")
    cl_all = cl_pruned = 0
    for f in os.listdir(closed_root):
        if not f.endswith(".parquet"):
            continue
        p = os.path.join(closed_root, f)
        sz = os.path.getsize(p)
        cl_all += sz
        md = pq.ParquetFile(p).metadata
        ci = {c.path_in_schema: i for i, c in enumerate(
            md.row_group(0).column(j) for j in range(md.num_columns)
        )}
        hit = False
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(ci["cbucket"])
            st = col.statistics
            if st is None or any(st.min <= c <= st.max for c in cbs):
                hit = True
                break
        if hit:
            cl_pruned += sz
    print(
        json.dumps(
            {
                "experiment": "scd2_reads",
                "store_keys": n_keys,
                "probe_keys": len(probe),
                "lookup_s": t_lookup,
                "history_for_keys_s": t_hist,
                "naive_full_filter_s": t_naive,
                "history_rows": n_hist,
                "current_bytes_fraction_scanned": round(cur_pruned / cur_all, 3),
                "closed_bytes_fraction_scanned": (
                    round(cl_pruned / cl_all, 3) if cl_all else None
                ),
            }
        ),
        flush=True,
    )


def bpe_incremental(spark) -> None:
    from pyspark.sql import functions as F

    from datapipe_spark.operators.textstats import (
        BPE_EOW,
        _bpe_train_driver,
        _bpe_train_driver_recount,
    )
    from datapipe_spark.sources.tables import load_table

    # the sf0.1 synthetic corpus has only ~31 word types — far too
    # small to expose trainer scaling. Build a realistic type table:
    # the real types plus 50k deterministic syllable words under a
    # Zipf weight curve (the shape of any natural-language vocabulary)
    word_types = (
        load_table(spark, BASE_SF, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .count()
        .collect()
    )
    tt: dict = {}
    for r in word_types:
        t = tuple([*r["word"], BPE_EOW])
        tt[t] = tt.get(t, 0) + int(r["count"])
    syll = [c + v for c in "bcdfghjklmnpqrstvwz" for v in "aeiou"]
    n_synth = 50_000
    for i in range(n_synth):
        j, parts = i, []
        for _ in range(2 + (i % 3)):
            parts.append(syll[j % len(syll)])
            j //= len(syll)
        w = "".join(parts) + ("x" if i % 7 == 0 else "")
        t = tuple([*w, BPE_EOW])
        tt[t] = tt.get(t, 0) + max(1, n_synth // (i + 1))

    k = 512
    t0 = time.monotonic()
    inc = _bpe_train_driver(dict(tt), k)
    t_inc = time.monotonic() - t0
    t0 = time.monotonic()
    ref = _bpe_train_driver_recount(dict(tt), k)
    t_ref = time.monotonic() - t0
    assert inc == ref, "incremental trainer diverged from recount reference"
    assert len(inc) == k, len(inc)

    # per-round cost curve: run the incremental trainer in quartile
    # slices by re-entering with growing budgets (cheap — the trainer
    # is deterministic) and difference the walls
    q = max(1, len(inc) // 4)
    walls = []
    prev = 0.0
    for budget in (q, 2 * q, 3 * q, len(inc)):
        t0 = time.monotonic()
        _bpe_train_driver(dict(tt), budget)
        w = time.monotonic() - t0
        walls.append(round(w - prev, 3))
        prev = w
    print(
        json.dumps(
            {
                "experiment": "bpe_incremental",
                "n_types": len(tt),
                "k": k,
                "merges_learned": len(inc),
                "incremental_wall_s": round(t_inc, 2),
                "recount_wall_s": round(t_ref, 2),
                "speedup": round(t_ref / t_inc, 1) if t_inc else None,
                "quartile_marginal_walls_s": walls,
            }
        ),
        flush=True,
    )


def main() -> None:
    import shutil
    import tempfile

    from datapipe_spark import get_spark

    which = set(sys.argv[1:]) or {"buckets", "maintenance", "reads", "bpe"}
    spark = get_spark()
    scratch = tempfile.mkdtemp(prefix="stress_r9_")
    try:
        if "buckets" in which:
            scd2_buckets(spark, scratch)
        if "maintenance" in which:
            scd2_maintenance(spark, scratch)
        if "reads" in which:
            scd2_reads(spark, scratch)
        if "bpe" in which:
            bpe_incremental(spark)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
