#!/usr/bin/env python
"""Round-11 stress additions (r10 verdict asks #1, #5, #6, #7).

1. ``pruned_purge`` — the r11 file-pruned SCD2 erasure vs history
   size: stores of 200k / 800k / 3.2M keys are COMPACTED (closed/
   range-clustered on (cbucket, inc)) and take the same fixed 8-key
   purge. r10's rows showed the closed-side wall growing with history
   (full-slice rewrite); the footer-pruned rewrite must hold flat —
   cost ∝ touched files, not history bytes.

2. ``index_purge_knee`` — push the band-index purge decade to 1.28M
   docs (r10 stopped at 320k where fixed job overhead dominated): the
   row either shows the O(parts) term's knee or demonstrates it is
   still absent at ~0.6 GB of index.

3. ``cc`` — the distributed connected-components path (forced
   ``driver_max_edges=0``): chain graphs of fixed diameter at rising
   edge counts (wall vs edges at constant rounds), plus a deep-chain
   graph (rounds ≈ diameter — the O(diameter) convergence claim,
   measured). The non-convergence guard is exercised by the paired
   regression test, not here.

4. ``bpe_largek`` — the incremental BPE trainer at k=8192 vs the
   full-recount oracle on the same types dict: rank-for-rank equality
   at the large k, total walls, and the incremental path's per-round
   cost by quartile (shrinking) vs the recount's (flat).

Usage: python scripts/stress_r11.py [pruned_purge|index_purge_knee|cc|bpe_largek ...]
Prints one JSON line per experiment.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stress_r10 import _bulk_load  # noqa: E402  (same store fixture)


def pruned_purge(spark, scratch: str) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from datapipe_spark.operators import scd2
    from datapipe_spark.operators.maintenance import table_bytes

    rows = []
    for n_keys in (200_000, 800_000, 3_200_000):
        store = os.path.join(scratch, f"ppurge_{n_keys}")
        _bulk_load(spark, store, n_keys, max(8, n_keys // 25_000))
        # two more update generations over 25% of keys: a real closed
        # slice (~60% of n_keys versions), so the clustered rewrite
        # splits into enough files for footer pruning to matter
        for gen in (2, 3):
            upd = spark.range(0, n_keys, 4).select(
                "id",
                (F.col("id") % 1000).alias("user_id"),
                F.lit(f"s{gen}").alias("status"),
                (F.col("id") % 997 + gen).cast("decimal(18,2)").cast("string")
                .alias("total_amount"),
                F.lit("u").alias("__op"),
                F.expr(
                    f"timestamp'2024-01-01' + make_interval(0,0,0,0,0,{gen})"
                ).alias("__ts_ms"),
                (F.col("id") * 100_000 + gen).alias("__source_lsn"),
            )
            scd2.scd2_upsert(spark, store, upd, batch_id=gen)
        # cluster history so footer pruning has narrow cbucket ranges
        scd2.scd2_compact_closed(spark, store, target_bytes=512 << 10)
        closed_mb = table_bytes(os.path.join(store, "closed")) / 1e6
        n_files = sum(
            1
            for n in os.listdir(os.path.join(store, "closed"))
            if n.endswith(".parquet")
        )
        ids = [i * (n_keys // 8) + (0 if i % 2 else 5) for i in range(8)]
        keys = spark.createDataFrame([(int(i),) for i in ids], "id long")
        cbs = sorted(
            {
                r[0]
                for r in keys.select(
                    F.pmod(
                        F.xxhash64(F.col("id")),
                        F.lit(scd2.SCD2_CLOSED_KEY_BUCKETS),
                    ).cast("int")
                ).collect()
            }
        )
        touched = len(
            scd2._closed_files_touching(os.path.join(store, "closed"), cbs)
        )
        before = scd2.scd2_read_history(spark, store).count()
        t0 = time.monotonic()
        scd2.scd2_purge_keys(spark, store, keys)
        wall = time.monotonic() - t0
        purged = before - scd2.scd2_read_history(spark, store).count()
        assert purged >= 8, (before, purged)
        rows.append({
            "n_keys": n_keys,
            "closed_mb": round(closed_mb, 1),
            "closed_files": n_files,
            "touched_files": touched,
            "purge_wall_s": round(wall, 2),
            "versions_purged": purged,
        })
        print(json.dumps({"experiment": "pruned_purge", **rows[-1]}), flush=True)
    print(
        json.dumps({"experiment": "pruned_purge_summary", "rows": rows}),
        flush=True,
    )


def index_purge_knee(spark, scratch: str) -> None:
    from pyspark.sql import functions as F

    from datapipe_spark.operators import dedup_index as di
    from datapipe_spark.operators.maintenance import table_bytes

    rows = []
    for n_docs in (320_000, 1_280_000):
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.expr(
                f"concat_ws(' ', transform(sequence(1, 12), "
                f"i -> concat('w', pmod(hash(pmod(id, {n_docs * 4 // 5}), i), 5000))))"
            ).alias("text"),
        )
        idx = os.path.join(scratch, f"knee_{n_docs}")
        t0 = time.monotonic()
        di.build_minhash_index(spark, docs, idx, hash="xxhash64")
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
        print(
            json.dumps({"experiment": "index_purge_knee", **rows[-1]}),
            flush=True,
        )
    print(
        json.dumps({"experiment": "index_purge_knee_summary", "rows": rows}),
        flush=True,
    )


def _chain_pairs(spark, n_chains: int, depth: int):
    """n_chains disjoint paths of ``depth`` edges each: node ids are
    chain*1_000_000 + position, so canonical = chain*1_000_000."""
    from pyspark.sql import functions as F

    return (
        spark.range(n_chains)
        .select(F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("pos"), "id")
        .select(
            (F.col("id") * 1_000_000 + F.col("pos")).alias("doc_a"),
            (F.col("id") * 1_000_000 + F.col("pos") + 1).alias("doc_b"),
        )
    )


def cc(spark, scratch: str) -> None:
    from datapipe_spark.operators.dedup import connected_components

    rows = []
    # wall vs edges at FIXED diameter (16): rounds must stay constant
    for n_chains in (12_500, 50_000, 200_000):
        stats: dict = {}
        t0 = time.monotonic()
        out = connected_components(
            _chain_pairs(spark, n_chains, 16), max_iters=40, driver_max_edges=0,
            stats=stats,
        )
        n_bad = out.filter("canonical_id % 1000000 != 0").count()
        wall = time.monotonic() - t0
        assert n_bad == 0, n_bad
        rows.append({
            "n_chains": n_chains, "depth": 16, **stats,
            "wall_s": round(wall, 1),
        })
        print(json.dumps({"experiment": "cc", **rows[-1]}), flush=True)
    # rounds vs diameter at fixed edges: O(diameter) convergence
    for depth in (16, 64, 256):
        stats = {}
        t0 = time.monotonic()
        out = connected_components(
            _chain_pairs(spark, 200_000 * 16 // depth, depth),
            max_iters=depth + 8, driver_max_edges=0, stats=stats,
        )
        n_bad = out.filter("canonical_id % 1000000 != 0").count()
        wall = time.monotonic() - t0
        assert n_bad == 0, n_bad
        rows.append({
            "depth": depth, **stats, "wall_s": round(wall, 1),
        })
        print(json.dumps({"experiment": "cc_depth", **rows[-1]}), flush=True)
    print(json.dumps({"experiment": "cc_summary", "rows": rows}), flush=True)


def bpe_largek(spark, scratch: str) -> None:
    from pyspark.sql import functions as F

    from datapipe_spark.operators import textstats as ts

    # the driver testdata's documents vocabulary is 31 synthetic words
    # — far too small to sustain 8192 merges — so the large-k row uses
    # a seeded synthetic vocabulary with a rich character-pair
    # distribution (Zipf-ish frequencies, word lengths 6-14). Both
    # trainers see the SAME types dict; the comparison is shape, not
    # corpus realism.
    import random

    rng = random.Random(11)
    types: dict = {}
    while len(types) < 6_000:
        n = rng.randint(6, 14)
        w = "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(n)
        )
        t = tuple(w) + ("</w>",)
        if t not in types:
            types[t] = max(1, int(5_000 / (len(types) + 1) ** 0.7))
    _ = F  # spark unused on this path; keep the import uniform

    def _timed(fn, k):
        t0 = time.monotonic()
        merges = fn(dict(types), k)
        return merges, time.monotonic() - t0

    # two k points: the recount's wall grows ~linearly in k (flat per
    # round), the incremental trainer's sub-linearly (per-round cost
    # shrinks as merges specialize) — the SHAPE is the claim
    for k in (2048, 8192):
        inc_merges, inc_wall = _timed(ts._bpe_train_driver, k)
        rec_merges, rec_wall = _timed(ts._bpe_train_driver_recount, k)
        assert inc_merges == rec_merges, (
            f"rank-for-rank divergence at k={k}",
            next((a, b) for a, b in zip(inc_merges, rec_merges) if a != b),
        )
        row = {
            "n_types": len(types),
            "k": k,
            "merges_produced": len(inc_merges),
            "incremental_wall_s": round(inc_wall, 1),
            "recount_wall_s": round(rec_wall, 1),
            "speedup": round(rec_wall / max(inc_wall, 1e-9), 1),
        }
        print(json.dumps({"experiment": "bpe_largek", **row}), flush=True)


def main() -> None:
    from datapipe_spark import get_spark

    which = set(sys.argv[1:]) or {
        "pruned_purge", "index_purge_knee", "cc", "bpe_largek"
    }
    spark = get_spark()
    scratch = "/tmp/datapipe_spark_stress_r11"
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch, exist_ok=True)
    try:
        if "pruned_purge" in which:
            pruned_purge(spark, scratch)
        if "index_purge_knee" in which:
            index_purge_knee(spark, scratch)
        if "cc" in which:
            cc(spark, scratch)
        if "bpe_largek" in which:
            bpe_largek(spark, scratch)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
