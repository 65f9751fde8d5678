#!/usr/bin/env python
"""Time named registry entries at a given sf dir (iteration harness).

Usage: python scripts/time_ops.py [--repeat N] [op ...]
(env SPARK_GRAFT_SF_DIR). Prints one JSON line with per-RUN wall
seconds and row counts: each run is recorded under ``name`` for the
first and ``name#k`` for repeats, so cold and warm timings are both
visible (a repeated name used to overwrite its cold timing).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from datapipe_spark import get_spark
    from datapipe_spark.plans import registry

    spark = get_spark("time-ops")
    qs = registry.queries()
    args = sys.argv[1:]
    repeat = 1
    if "--repeat" in args:
        i = args.index("--repeat")
        repeat = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    names = args or ["dedup_simhash"]
    names = [n for n in names for _ in range(repeat)]
    unknown = [n for n in set(names) if n not in qs]
    if unknown:
        print(f"unknown ops: {unknown}", file=sys.stderr)
        sys.exit(2)
    # warm scan
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    timings, rows = {}, {}
    seen: dict[str, int] = {}
    for name in names:
        seen[name] = seen.get(name, 0) + 1
        key = name if seen[name] == 1 else f"{name}#{seen[name]}"
        t0 = time.perf_counter()
        rows[key] = qs[name](spark, sf_dir).count()
        timings[key] = round(time.perf_counter() - t0, 2)
    print(json.dumps({"sf_dir": sf_dir, "timings": timings, "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
