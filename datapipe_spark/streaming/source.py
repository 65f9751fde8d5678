"""Streaming source simulation (SURVEY §2.1 S2/S4, §2.8 T1/T8).

No Kafka exists in this sandbox, so the event stream is simulated the
idiomatic Spark way: the ``events`` table is split into N time-ordered
micro-batch "drops" (parquet or raw-JSON text files) and consumed with
``spark.readStream`` + ``maxFilesPerTrigger=1`` — one file per
micro-batch, which is exactly the unit-of-progress role Kafka offsets
play in the reference (realtime design.md:105-112; backpressure via
``maxOffsetsPerTrigger`` design.md:88-89 maps to ``maxFilesPerTrigger``).

Determinism: drop boundaries are fixed time ranges, drops are written
sequentially (strictly increasing mtimes) so the file source replays
them in order; every generator knob (duplicates, corruption, sentinel)
is a pure function of ``event_id``. Downstream streaming results are
therefore bit-reproducible and DuckDB-oracle-checkable.

Flush sentinels: bounded replays of an unbounded stream need a way to
close watermark/state at end-of-input. The final drop carries per-user
``__flush__`` rows 30 days past max(ts); they advance the watermark
(closing every real session/window) while their own groups never emit.
The production path has no sentinels — state closes via watermark /
GroupStateTimeout as events keep flowing.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datapipe_spark.functions import epoch_us
from datapipe_spark.sources.tables import ensure_session_confs, load_table
from datapipe_spark.util import fresh_dir, scratch_root  # noqa: F401 (re-export)

SENTINEL_TYPE = "__flush__"

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        # LTZ: watermarks/session_window reject TIMESTAMP_NTZ
        # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), so the driver
        # testdata's NTZ ts is cast to an instant when the drops are
        # materialized — exact under the UTC session timezone tables.py
        # pins. Streaming jobs cast timestamp outputs back to NTZ so
        # results compare bit-for-bit with the batch twins + oracle.
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

_EVENT_COLS = [f.name for f in EVENT_SCHEMA.fields]


def _drops_key(sf_dir: str, n_drops: int, dup_every: int, sentinel: bool, as_json: bool,
               corrupt_every: int) -> str:
    sf = os.path.basename(os.path.normpath(sf_dir))
    mode = "json" if as_json else "parquet"
    return f"drops-{sf}-n{n_drops}-d{dup_every}-s{int(sentinel)}-c{corrupt_every}-{mode}"


def prepare_event_drops(
    spark: SparkSession,
    sf_dir: str,
    n_drops: int = 4,
    dup_every: int = 0,
    sentinel: bool = False,
    as_json: bool = False,
    corrupt_every: int = 0,
) -> str:
    """Materialize the events table as N sequential micro-batch files.

    - ``dup_every``: re-emit every k-th event (by id) a second time in
      the same drop — exercises streaming dedup (T4).
    - ``sentinel``: append per-user ``__flush__`` rows in a final drop
      (state/watermark close for bounded replay).
    - ``as_json``/``corrupt_every``: raw Kafka-value simulation — each
      record is a JSON string; every k-th is truncated mid-string to
      exercise the validation split + DLQ (S4/T9/S11).

    Returns the drops directory; cached per parameter set (a ``_READY``
    marker) so sibling streaming queries share one materialization.
    """
    key = _drops_key(sf_dir, n_drops, dup_every, sentinel, as_json, corrupt_every)
    out = os.path.join(scratch_root(), key)
    if os.path.exists(os.path.join(out, "_READY")):
        # cache hit skips load_table, but downstream event-time casts
        # still require the UTC session timezone — pin it here too, so
        # a fresh session consuming a warm scratch dir stays exact
        ensure_session_confs(spark)
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)

    e = (
        load_table(spark, sf_dir, "events")
        .select(*_EVENT_COLS)
        .withColumn("ts", F.col("ts").cast(EVENT_SCHEMA["ts"].dataType.simpleString()))
    )
    lo_us, hi_us = e.agg(F.min(epoch_us("ts")), F.max(epoch_us("ts"))).first()
    span_us = max(hi_us - lo_us, 1)
    # fixed time-range chunks: batch k covers [lo + k*span/n, ...) so
    # per-user event order is preserved across drops (required by the
    # stateful session operator; mirrors Kafka per-key ordering)
    batch = F.least(
        F.lit(n_drops - 1),
        F.floor((epoch_us("ts") - F.lit(lo_us)) * F.lit(n_drops) / F.lit(span_us + 1)),
    ).cast("int")
    e = e.withColumn("_batch", batch)
    if dup_every:
        dups = e.filter(F.col("event_id") % dup_every == 0)
        e = e.unionByName(dups)
    parts = e
    if sentinel:
        flush = (
            e.select("user_id").distinct()
            .select(
                (-F.col("user_id") - 1).alias("event_id"),
                (
                    F.timestamp_micros(F.lit(hi_us))
                    .cast(EVENT_SCHEMA["ts"].dataType.simpleString())
                    + F.expr("INTERVAL 30 DAYS")
                ).alias("ts"),
                "user_id",
                F.lit(SENTINEL_TYPE).alias("event_type"),
                F.lit(None).cast("double").alias("value"),
                F.lit(None).cast("string").alias("props"),
            )
            .withColumn("_batch", F.lit(n_drops).cast("int"))
        )
        parts = e.unionByName(flush)
    # ONE Spark job writes every drop (r14, guide §1.2 — the last
    # N-jobs-per-write loop in the tree, the same fold
    # write_sequential_drops already carries): the batch index becomes
    # a dynamic partition column and one staged write replaces the old
    # persist + N × (filter → coalesce(1) → write) loop. Repartitioning
    # on the index keeps one file per drop (the micro-batch unit the
    # maxFilesPerTrigger=1 consumers define); the corruption rule is
    # keyed on event_id exactly as before and never touches the flush
    # drop (the old loop passed corrupt_every=0 for it). An empty
    # chunk (possible only for degenerate time distributions) still
    # materializes a typed empty drop so batch numbering holds.
    n_total = n_drops + (1 if sentinel else 0)
    staged = out + ".part"
    if not as_json:
        (
            parts.repartition(n_total, "_batch")
            .write.mode("overwrite")
            .partitionBy("_batch")
            .parquet(staged)
        )
    else:
        raw = parts.select(
            F.col("event_id").alias("_id"),
            F.to_json(F.struct(*_EVENT_COLS)).alias("value"),
            "_batch",
        )
        if corrupt_every:
            raw = raw.select(
                F.when(
                    (F.col("_id") % corrupt_every == 0)
                    & (F.col("_batch") < n_drops),
                    F.expr("substring(value, 1, length(value) - 5)"),
                )
                .otherwise(F.col("value"))
                .alias("value"),
                "_batch",
            )
        else:
            raw = raw.select("value", "_batch")
        (
            raw.repartition(n_total, "_batch")
            .write.mode("overwrite")
            .partitionBy("_batch")
            .text(staged)
        )
    schema_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in EVENT_SCHEMA.fields
    )
    for i in range(n_total):
        part_dir = os.path.join(staged, f"_batch={i}")
        name = f"drop_{i:02d}" if i < n_drops else f"drop_{n_drops:02d}_flush"
        drop_dir = os.path.join(out, name)
        if os.path.isdir(part_dir):
            os.rename(part_dir, drop_dir)
        elif not as_json:
            from datapipe_spark.util import write_empty_parquet

            write_empty_parquet(drop_dir, schema_ddl)
        else:
            os.makedirs(drop_dir, exist_ok=True)
            open(os.path.join(drop_dir, "part-00000.txt"), "w").close()
    shutil.rmtree(staged, ignore_errors=True)
    # pin strictly increasing mtimes in drop order (the r6 advisory the
    # per-job drop writers already carry, applied to the SHARED drop
    # set too — r12 review): FileStreamSource orders replay by
    # timestamp, and sequential writes on a coarse-mtime filesystem can
    # collide — a swapped drop, or the +30d flush sentinel replaying
    # early, jumps the watermark and silently drops events as late.
    # Lexicographic dir order IS arrival order (drop_00..drop_NN, then
    # drop_{n}_flush carrying the max index).
    import time as _time

    base = _time.time()
    for i, name in enumerate(sorted(os.listdir(out))):
        d = os.path.join(out, name)
        if os.path.isdir(d):
            for fn in sorted(os.listdir(d)):
                if not fn.startswith((".", "_")):
                    os.utime(os.path.join(d, fn), (base + i, base + i))
    open(os.path.join(out, "_READY"), "w").close()
    return out


def write_sequential_drops(
    parent: DataFrame, preds, drops_root: str
) -> None:
    """Write micro-batch drops ``drop_{i:02d}`` — one per predicate
    over ``parent`` — with the invariants every streaming job needs,
    spelled once (r12 review: four hand-repeated copies):

    - ONE Spark job writes every drop (r13, guide §1.2 fewer passes):
      the predicate list folds into a first-match-wins drop index and
      a single dynamic-partitioned write replaces the old
      persist + N × (filter → coalesce(1) → write) loop — one source
      scan, one commit, no cache. All call sites pass disjoint
      predicates, so first-match-wins is observably identical; rows
      matching no predicate are dropped (unchanged). Repartitioning
      on the drop index keeps the one-file-per-drop invariant the
      ``maxFilesPerTrigger=1`` consumers define a micro-batch by. A
      predicate with NO rows still yields a (typed, empty) drop file
      so batch numbering is preserved.
    - file mtimes are pinned strictly increasing in drop order (the
      r6 advisory): FileStreamSource orders replay by timestamp, and
      sequential writes on a coarse-mtime filesystem can collide —
      swapped arrival order silently diverges the stateful operators'
      arrival-order oracles.
    """
    import shutil
    import time as _time

    from datapipe_spark.util import write_empty_parquet

    preds = list(preds)
    idx = F.when(preds[0], F.lit(0))
    for i, pred in enumerate(preds[1:], start=1):
        idx = idx.when(pred, F.lit(i))
    schema_ddl = parent.schema.simpleString()
    staged = drops_root + ".part"
    (
        parent.withColumn("_drop", idx)
        .filter(F.col("_drop").isNotNull())
        .repartition(len(preds), "_drop")
        .write.mode("overwrite")
        .partitionBy("_drop")
        .parquet(staged)
    )
    base = _time.time()
    os.makedirs(drops_root, exist_ok=True)
    for i in range(len(preds)):
        part_dir = os.path.join(staged, f"_drop={i}")
        drop_dir = os.path.join(drops_root, f"drop_{i:02d}")
        shutil.rmtree(drop_dir, ignore_errors=True)
        if os.path.isdir(part_dir):
            os.rename(part_dir, drop_dir)
        else:
            write_empty_parquet(drop_dir, schema_ddl)
        for name in sorted(os.listdir(drop_dir)):
            if name.endswith(".parquet"):
                os.utime(os.path.join(drop_dir, name), (base + i, base + i))
    shutil.rmtree(staged, ignore_errors=True)


def read_event_stream(spark: SparkSession, drops_dir: str, files_per_trigger: int = 1) -> DataFrame:
    """S2 stand-in: typed micro-batch stream, one drop per trigger."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(os.path.join(drops_dir, "drop_*"))
    )


def read_raw_stream(spark: SparkSession, drops_dir: str, files_per_trigger: int = 1) -> DataFrame:
    """Raw Kafka-value simulation: one string column ``value``."""
    return (
        spark.readStream.schema(T.StructType([T.StructField("value", T.StringType())]))
        .option("maxFilesPerTrigger", files_per_trigger)
        .text(os.path.join(drops_dir, "drop_*"))
    )


def parse_events(raw: DataFrame) -> DataFrame:
    """S4: ``from_json(value, schema)`` parse; malformed rows keep the
    raw string with null parse (realtime design.md:115-123)."""
    return raw.select("value", F.from_json("value", EVENT_SCHEMA).alias("event"))


def split_valid(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """T9: validation split — parse failures and key-less records go to
    the DLQ side (realtime design.md:493-511)."""
    ok = F.col("event.event_id").isNotNull() & F.col("event.ts").isNotNull()
    valid = parsed.filter(ok).select("event.*")
    invalid = parsed.filter(~ok).select(
        "value", F.lit("parse_or_key_failure").alias("error_reason")
    )
    return valid, invalid
