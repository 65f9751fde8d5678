"""Standalone replica of the external driver's correctness sweep.

Builds a VANILLA SparkSession (no engine confs — the driver's shape),
imports ``__spark_entry__`` by path, runs ``entry`` plus every
``queries()`` entry at sf0.01, and compares each oracled query against
DuckDB.

Canonicalization mirrors the driver's *pandas* path (observed in
CORRECTNESS_r02 tracebacks: ``DataFrame.sort_values`` over all columns),
not ``fetchall``. That matters for two failure modes the fetchall
comparison cannot see:

- DuckDB HUGEINT (e.g. ``SUM(INT)``) becomes float64 in ``.df()`` while
  Spark returns int64 — hash mismatch in the driver even though the
  Python values compare equal (r02 ``events_json_stats``).
- list-valued cells make ``sort_values`` raise ``unhashable type:
  'list'`` — the driver records ERR (r02 ``winnow_fingerprints`` /
  ``multimodal_features``).

Rows-only queries are also canonicalized (the driver does), so an
unsortable result is an ERR here too.

Usage: ``python tests/driver_replica.py [sf_dir]`` — prints one line per
query (PASS / ROWS-ONLY / FAIL / ERR) and a final summary; exit code 1
if anything fails.
"""

from __future__ import annotations

import datetime
import importlib.util
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle import duckdb_con  # noqa: E402


def _canon_pdf(pdf):
    """Driver-shaped canonical form: columns sorted by name, rows sorted
    by every column, cells normalized to hashable scalars. Raises on
    unsortable cells, exactly like the driver's sweep."""
    import pandas as pd

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    cells = []
    for row in pdf.itertuples(index=False, name=None):
        out = []
        for v in row:
            if v is None or v is pd.NaT or (isinstance(v, float) and v != v):
                out.append(None)
            elif isinstance(v, pd.Timestamp):
                out.append(v.tz_localize(None).isoformat() if v.tzinfo else v.isoformat())
            elif isinstance(v, datetime.date):
                # DATE arrives as datetime.date from Spark but as a
                # midnight datetime64 from DuckDB .df(); the driver
                # hash-matches these (r02: funnel_daily et al. PASS), so
                # normalize both to the midnight ISO form.
                out.append(f"{v.isoformat()}T00:00:00")
            else:
                out.append(v)
        cells.append(tuple(out))
    return cells


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--only=")]
    only = [
        q
        for a in sys.argv[1:]
        if a.startswith("--only=")
        for q in a.split("=", 1)[1].split(",")
        if q
    ]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
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

    # drift gate vs the latest driver-recorded artifact (r5 ask #4):
    # at the driver's own scale factor, any entry the driver recorded
    # must reproduce the exact recorded row counts here.
    import glob
    import json

    driver_art: dict = {}
    if os.path.basename(sf_dir.rstrip("/")) == "sf0.01":
        arts = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
        if arts:
            driver_art = json.load(open(arts[-1]))

    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    n_pass = n_rows_only = n_fail = n_err = 0
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            s_pdf = sdf.toPandas()
            s_canon = _canon_pdf(s_pdf)
        except Exception:
            n_err += 1
            print(f"ERR  {name}\n{traceback.format_exc()[-1500:]}", flush=True)
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            n_rows_only += 1
            print(f"ROWS {name}: {len(s_pdf)} rows ({dt:.1f}s)", flush=True)
            continue
        try:
            o_pdf = con.sql(oracles[name]).df()
            o_canon = _canon_pdf(o_pdf)
        except Exception:
            n_err += 1
            print(f"ERR  {name} (oracle)\n{traceback.format_exc()[-1500:]}", flush=True)
            continue
        problems = []
        if sorted(s_pdf.columns) != sorted(o_pdf.columns):
            problems.append(f"cols {sorted(s_pdf.columns)} != {sorted(o_pdf.columns)}")
        if len(s_pdf) != len(o_pdf):
            problems.append(f"rows {len(s_pdf)} != {len(o_pdf)}")
        if not problems:
            bad = [(a, b) for a, b in zip(s_canon, o_canon) if repr(a) != repr(b)]
            if bad:
                problems.append(f"{len(bad)} value mismatches; first: {bad[0]}")
        rec = driver_art.get(name)
        if rec and rec.get("err") is None:
            if rec.get("spark_rows") != len(s_pdf) or rec.get("oracle_rows") != len(o_pdf):
                problems.append(
                    f"drift vs driver artifact: recorded "
                    f"spark={rec.get('spark_rows')}/oracle={rec.get('oracle_rows')}, "
                    f"replica got spark={len(s_pdf)}/oracle={len(o_pdf)}"
                )
        if problems:
            n_fail += 1
            print(f"FAIL {name}: {'; '.join(problems)}", flush=True)
        else:
            n_pass += 1
            print(f"PASS {name}: {len(s_pdf)} rows ({dt:.1f}s)", flush=True)

    con.close()
    spark.stop()
    print(
        f"SUMMARY pass={n_pass} rows_only={n_rows_only} fail={n_fail} err={n_err} "
        f"total={len(qs)}"
    )
    return 1 if (n_fail or n_err) else 0


if __name__ == "__main__":
    sys.exit(main())
