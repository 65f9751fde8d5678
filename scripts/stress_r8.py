#!/usr/bin/env python
"""Round-8 stress additions (r7 verdict ask #6): the r7 newcomers that
do not fit the replica-corpus harness in scale_smoke.py.

1. PIT hot-key skew — ``point_in_time_join`` with one SCD2 key holding
   thousands of versions (a status-flapping megakey) against a fact
   side that hammers that key. Asserts the plan stays a keyed
   equi-join (no BNLJ/cartesian) and reports the versions-per-key
   decade (V=500 → V=5000) wall time: the range predicate filters
   inside each key group, so cost tracks facts×versions of the HOT
   key only, not the corpus.

2. Stream-stream interval join state vs window width — the
   ``interval_join_error_purchases`` plan replayed over the sf0.1
   event drops at 30/120/480-minute windows, recording the state
   operator's max buffered rows: state must grow ~with the window
   (traffic × window), never with stream lifetime.

Usage: python scripts/stress_r8.py [pit|stream ...]   (default: both)
Prints one JSON line per experiment.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def pit_hot_key(spark) -> None:
    from pyspark.sql import functions as F

    from datapipe_spark.operators.rangejoin import point_in_time_join

    n_keys, hot_facts, cold_facts = 100_000, 200_000, 1_000_000
    for v_hot in (500, 5000):
        # dimension: every key gets 2 versions; key 0 gets v_hot
        base = spark.range(n_keys).select(
            F.col("id").alias("key"),
            F.expr("CASE WHEN id = 0 THEN " + str(v_hot) + " ELSE 2 END").alias("nv"),
        )
        vdf = base.select(
            "key", "nv", F.explode(F.expr("sequence(0, nv - 1)")).alias("vi")
        ).select(
            "key",
            F.concat(F.lit("s"), F.col("vi") % 7).alias("label"),
            F.expr("timestamp'2024-01-01' + make_interval(0,0,0,0,0,vi)").alias(
                "valid_from"
            ),
            F.expr(
                "IF(vi = nv - 1, NULL,"
                " timestamp'2024-01-01' + make_interval(0,0,0,0,0,vi+1))"
            ).alias("valid_to"),
        )
        # facts: hot_facts rows on key 0 spread across its version range,
        # cold_facts rows uniform over the other keys
        hot = spark.range(hot_facts).select(
            F.lit(0).cast("long").alias("key"),
            F.expr(
                f"timestamp'2024-01-01' + make_interval(0,0,0,0,0,"
                f"cast(pmod(xxhash64(id), {v_hot}) as int), 30)"
            ).alias("ts"),
        )
        cold = spark.range(cold_facts).select(
            (F.pmod(F.xxhash64("id"), F.lit(n_keys - 1)) + 1).alias("key"),
            F.expr(
                "timestamp'2024-01-01' + make_interval(0,0,0,0,0,"
                "cast(pmod(xxhash64(id + 7), 2) as int), 30)"
            ).alias("ts"),
        )
        facts = hot.unionByName(cold)
        joined = point_in_time_join(facts, vdf, key="key", fact_ts="ts")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan and "Cartesian" not in plan, (
            "PIT join degenerated under hot-key versions"
        )
        t0 = time.perf_counter()
        n = joined.count()
        wall = round(time.perf_counter() - t0, 2)
        print(
            json.dumps(
                {
                    "exp": "pit_hot_key",
                    "versions_hot_key": v_hot,
                    "facts": hot_facts + cold_facts,
                    "rows_out": n,
                    "wall_s": wall,
                    "plan_keyed_join": True,
                }
            ),
            flush=True,
        )


def stream_state_vs_window(spark) -> None:
    from pyspark.sql import functions as F

    from datapipe_spark.streaming import jobs, source as src
    from datapipe_spark.util import fresh_dir

    # 30 chronological drops @ 1 file/trigger: the watermark advances
    # ~per-day, so state eviction is WINDOW-driven (the registry form's
    # 2-3 giant batches make state batch-dominated and the window knob
    # invisible)
    drops = src.prepare_event_drops(spark, BASE_SF, n_drops=30, sentinel=True)
    for wm in (30, 120, 480):
        out = fresh_dir(f"stress_ssjoin_{wm}")
        sink, cp = os.path.join(out, "sink"), os.path.join(out, "cp")
        events = src.read_event_stream(spark, drops, files_per_trigger=1).filter(
            F.col("event_type") != src.SENTINEL_TYPE
        )
        joined = jobs.interval_join_error_purchases(events, window_minutes=wm)
        t0 = time.perf_counter()
        q = (
            joined.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = round(time.perf_counter() - t0, 2)
        max_state = max(
            (
                op.get("numRowsTotal", 0)
                for p in q.recentProgress
                for op in p["stateOperators"]
            ),
            default=0,
        )
        rows = spark.read.parquet(sink).count()
        print(
            json.dumps(
                {
                    "exp": "interval_join_state",
                    "window_minutes": wm,
                    "rows_out": rows,
                    "max_state_rows": max_state,
                    "wall_s": wall,
                }
            ),
            flush=True,
        )


def main() -> None:
    which = set(sys.argv[1:]) or {"pit", "stream"}
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from datapipe_spark import get_spark

    spark = get_spark("stress-r8")
    if "pit" in which:
        pit_hot_key(spark)
    if "stream" in which:
        stream_state_vs_window(spark)
    spark.stop()


if __name__ == "__main__":
    main()
