#!/usr/bin/env python
"""Time named registry entries at a given sf dir (iteration harness).

Usage: python scripts/time_ops.py [op ...]   (env SPARK_GRAFT_SF_DIR)
Prints one JSON line with per-op wall seconds and row counts.
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
    names = sys.argv[1:] or ["dedup_simhash"]
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown ops: {unknown}", file=sys.stderr)
        sys.exit(2)
    # warm scan
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    timings, rows = {}, {}
    for name in names:
        t0 = time.perf_counter()
        rows[name] = qs[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 2)
    print(json.dumps({"sf_dir": sf_dir, "timings": timings, "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
