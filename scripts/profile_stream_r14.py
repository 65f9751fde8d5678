#!/usr/bin/env python
"""r14 profiling harness: run ONE registry entry and dump the Spark
REST API job list (name, submission/completion times, stage info) so
the wall decomposes into Spark-job compute vs framework gaps (micro-
batch planning/commit, driver-side work).

Usage: python scripts/profile_stream_r14.py <entry> [--repeat N] [--out FILE]
(env SPARK_GRAFT_SF_DIR, default sf0.1). Prints one JSON line with the
entry wall(s) and writes the full job table to --out (default
/tmp/profile_<entry>.json).
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _jobs(ui: str) -> list[dict]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    return json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
        )
    ) + json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/jobs?status=failed"
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    args = sys.argv[1:]
    repeat, out_path = 1, None
    if "--repeat" in args:
        i = args.index("--repeat")
        repeat = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    name = args[0]
    out_path = out_path or f"/tmp/profile_{name}.json"

    from datapipe_spark import get_spark
    from datapipe_spark.plans import registry

    spark = get_spark("profile-r14")
    qs = registry.queries()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    ui = spark.sparkContext.uiWebUrl

    walls = []
    runs = []
    for k in range(repeat):
        before = {j["jobId"] for j in _jobs(ui)} if ui else set()
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        wall = round(time.perf_counter() - t0, 3)
        walls.append(wall)
        jobs = [j for j in _jobs(ui) if j["jobId"] not in before] if ui else []
        jobs.sort(key=lambda j: j["jobId"])
        runs.append(
            {
                "run": k,
                "wall_s": wall,
                "rows": n,
                "n_jobs": len(jobs),
                "jobs": [
                    {
                        "id": j["jobId"],
                        "name": j.get("name", "")[:160],
                        "submitted": j.get("submissionTime"),
                        "completed": j.get("completionTime"),
                        "stages": j.get("numCompletedStages"),
                        "tasks": j.get("numCompletedTasks"),
                    }
                    for j in jobs
                ],
            }
        )
    with open(out_path, "w") as f:
        json.dump({"entry": name, "sf_dir": sf_dir, "runs": runs}, f, indent=1)
    print(json.dumps({"entry": name, "walls": walls, "out": out_path}))
    spark.stop()


if __name__ == "__main__":
    main()
