"""Standalone replica of the external driver's correctness sweep.

Builds a VANILLA SparkSession (no engine confs — the driver's shape),
imports ``__spark_entry__`` by path, runs ``entry`` plus every
``queries()`` entry at sf0.01, and compares each oracled query against
DuckDB with the order-insensitive value comparison from tests/oracle.py.

Usage: ``python tests/driver_replica.py [sf_dir]`` — prints one line per
query (PASS / ROWS-ONLY / FAIL / ERR) and a final summary; exit code 1
if anything fails.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle import _canon, duckdb_con  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("driver-replica")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(root, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    n = mod.entry(spark).count()
    print(f"entry: {n} rows", flush=True)
    assert n > 0

    qs = mod.queries()
    oracles = mod.oracle_sql()
    con = duckdb_con(sf_dir)

    n_pass = n_rows_only = n_fail = n_err = 0
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            n_err += 1
            print(f"ERR  {name}\n{traceback.format_exc()[-1500:]}", flush=True)
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            n_rows_only += 1
            print(f"ROWS {name}: {len(s_rows)} rows ({dt:.1f}s)", flush=True)
            continue
        try:
            res = con.sql(oracles[name])
            o_cols = res.columns
            o_rows = res.fetchall()
        except Exception:
            n_err += 1
            print(f"ERR  {name} (oracle)\n{traceback.format_exc()[-1500:]}", flush=True)
            continue
        problems = []
        if sorted(s_cols) != sorted(o_cols):
            problems.append(f"cols {sorted(s_cols)} != {sorted(o_cols)}")
        if len(s_rows) != len(o_rows):
            problems.append(f"rows {len(s_rows)} != {len(o_rows)}")
        if not problems:
            sc, oc = _canon(s_rows, s_cols), _canon(o_rows, o_cols)
            bad = [(a, b) for a, b in zip(sc, oc) if a != b]
            if bad:
                problems.append(f"{len(bad)} value mismatches; first: {bad[0]}")
        if problems:
            n_fail += 1
            print(f"FAIL {name}: {'; '.join(problems)}", flush=True)
        else:
            n_pass += 1
            print(f"PASS {name}: {len(s_rows)} rows ({dt:.1f}s)", flush=True)

    con.close()
    spark.stop()
    print(
        f"SUMMARY pass={n_pass} rows_only={n_rows_only} fail={n_fail} err={n_err} "
        f"total={len(qs)}"
    )
    return 1 if (n_fail or n_err) else 0


if __name__ == "__main__":
    sys.exit(main())
