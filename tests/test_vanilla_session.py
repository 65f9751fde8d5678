"""Regression: the driver contract must hold on a VANILLA SparkSession.

The external driver builds its own session with none of the engine's
confs (no nanosAsLong, no UTC timezone, default shuffle partitions).
Round 1 lost all 16 events/streaming oracle checks to exactly this gap:
the engine's session factory set ``spark.sql.legacy.parquet.nanosAsLong``
but ``load_table`` didn't, so ``events.parquet`` (TIMESTAMP(NANOS)) was
unreadable outside ``get_spark()``. Round 2 lost them again when the
regenerated testdata switched to TIMESTAMP(MICROS, adjusted=false) —
read as TIMESTAMP_NTZ, which ``unix_micros`` and watermarks reject.

Runs in a subprocess so the session really is vanilla — inside the test
process ``getOrCreate`` would reuse the conf-laden test session.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

_SCRIPT = textwrap.dedent(
    """
    import importlib.util
    from pyspark.sql import SparkSession

    # the driver's shape: a bare builder, engine confs absent
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("vanilla-driver-harness")
        .getOrCreate()
    )
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    sf = "/root/testdata/sf0.001"
    qs = mod.queries()
    # events-reading batch query (the round-1 failure mode), a marts
    # query (timezone-sensitive date math), a streaming query (events
    # drop-set preparation also reads events.parquet), sessionize
    # (epoch arithmetic on the NTZ ts — the round-2 failure mode), and
    # a complex-output query (array columns must arrive JSON-serialized
    # so the driver's pandas sort doesn't crash on list cells)
    for name in [
        "funnel_daily",
        "daily_business_metrics",
        "streaming_dedup_events",
        "sessionize",
        "winnow_fingerprints",
        "multimodal_features",
    ]:
        df = qs[name](spark, sf)
        assert not any(
            t.startswith(("array", "map", "struct")) for _c, t in df.dtypes
        ), f"{name}: complex-typed driver output {df.dtypes}"
        n = df.count()
        assert n > 0, f"{name}: expected rows, got {n}"
        print(f"OK {name} rows={n}", flush=True)
    spark.stop()
    print("VANILLA_OK", flush=True)
    """
)


def test_driver_contract_on_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    assert "VANILLA_OK" in proc.stdout
