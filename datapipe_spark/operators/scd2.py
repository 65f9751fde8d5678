"""Materialized SCD2 dimension store — build / incremental upsert / read.

``plans.cdc_queries.cdc_scd2_history`` computes the Type-2 dimension on
the fly from the full changelog; a feature store MATERIALIZES it and
maintains it from changelog increments (r7 verdict ask #8; the
reference's "latest state vs full history" split — its S3 archival
connector keeps the raw changelog,
1-data-ingestion-pipeline/task10-s3-sink-connector-config.json, and
its Iceberg tables retain snapshot history,
2-batch-analytics-layer/task6-ecommerce-tables-config.yaml:56-57).
Layout under ``dim_dir``::

    meta.json            {"last_batch_id": N}   upsert high-watermark
    current/             the OPEN version per live key (swapped
                         wholesale per upsert — it is the compact
                         Type-1-sized slice, O(keys) not O(history))
    closed/inc=<batch>/  versions CLOSED by that increment
                         (append-only history, one dir per increment)

The current/closed split is the hive form of partitioning by
``is_current``: the hot "current dimension" read touches one compact
slice; history dirs are write-once. Full SCD2 history =
``current ∪ closed`` (``scd2_read_history``) and equals the batch
``CDC_SCD2_HISTORY_SQL`` oracle row for row — the registry entry
``scd2_dimension_store`` drives build + two increments end-to-end
under that hash oracle.

Exactly-once by idempotence (the T10 per-batch-overwrite shape, not a
journal): an increment's closed rows land in a deterministic
``closed/inc=<batch_id>`` dir via write-aside + atomic rename; the
current swap is an atomic dir rename with crash recovery at every
entry; ``meta.json`` advances LAST. A replayed ``batch_id`` ≤ the
watermark is skipped wholesale; a replay after any mid-upsert crash
recomputes byte-identical artifacts (the merge is idempotent against
an already-swapped ``current/`` because stored open rows dedupe with
their increment twins on (id, lsn)) and never regenerates an
already-committed ``closed/inc=`` dir.

Increments must arrive in per-key LSN order (the CDC stream contract —
Debezium preserves per-key order within a topic partition).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# stored rows additionally carry _written_inc — the batch that WROTE
# the version (its closing batch is the closed/inc= partition it lands
# in). Together they are the lineage that makes `scd2_as_of` (Iceberg
# time travel on this artifact) a pure metadata reconstruction.
_STORE_SCHEMA = (
    "id long, user_id long, status string, total_amount double, "
    "valid_from timestamp, valid_to timestamp, is_current boolean, "
    "__source_lsn long, _written_inc int"
)

_HISTORY_COLS = [
    "id", "user_id", "status", "total_amount",
    "valid_from", "valid_to", "is_current", "__source_lsn",
]

_STORE_COLS = [*_HISTORY_COLS, "_written_inc"]


def _p(dim_dir: str, part: str) -> str:
    return dim_dir.rstrip("/") + "/" + part


def _write_meta(dim_dir: str, meta: dict) -> None:
    tmp = _p(dim_dir, f"meta.json.tmp-{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _p(dim_dir, "meta.json"))


def _meta(dim_dir: str) -> dict:
    with open(_p(dim_dir, "meta.json")) as f:
        return json.load(f)


def _recover(dim_dir: str) -> None:
    """Crash recovery for the current-dir swap: the swap renames
    ``current`` → ``current.old`` then ``current.tmp-*`` → ``current``;
    a crash between the two leaves only ``current.old`` — restore it
    (the replay will redo the whole upsert). Leftover tmp dirs are
    debris from a crash before their rename — delete."""
    cur, old = _p(dim_dir, "current"), _p(dim_dir, "current.old")
    if not os.path.exists(cur) and os.path.exists(old):
        os.rename(old, cur)
    shutil.rmtree(old, ignore_errors=True)
    for name in os.listdir(dim_dir):
        if name.startswith("current.tmp-") or name.startswith("closed.tmp-"):
            shutil.rmtree(os.path.join(dim_dir, name), ignore_errors=True)


def scd2_init(spark: SparkSession, dim_dir: str) -> None:
    """Create an empty store: typed empty ``current/``, no history,
    watermark −1."""
    os.makedirs(dim_dir, exist_ok=True)
    spark.createDataFrame([], _STORE_SCHEMA).write.mode("overwrite").parquet(
        _p(dim_dir, "current")
    )
    _write_meta(dim_dir, {"last_batch_id": -1})


def _normalize_increment(inc: DataFrame) -> DataFrame:
    """Changelog rows → chain rows: the CDC string decimal re-cast once
    (F15), ``__ts_ms`` carried as the effectivity timestamp."""
    return inc.select(
        "id",
        "user_id",
        "status",
        F.col("total_amount").cast("decimal(18,2)").cast("double").alias("total_amount"),
        F.col("__ts_ms").alias("valid_from"),
        "__op",
        "__source_lsn",
    )


def _merge_plan(spark: SparkSession, dim_dir: str, increment: DataFrame, batch_id: int):
    """The upsert's un-materialized plans — split out so the plan gate
    can assert the dimension store is only ever map-side probed (the
    touched-key set broadcasts into BOTH ``current/`` scans; the store
    is the big side by definition and must never shuffle on more than
    the touched keys). Returns ``(chained, cur_untouched)``."""
    inc = (
        _normalize_increment(increment)
        .withColumn("_written_inc", F.lit(batch_id).cast("int"))
        .localCheckpoint(eager=True)
    )
    touched = inc.select("id").distinct()
    cur = spark.read.parquet(_p(dim_dir, "current"))
    cur_untouched = cur.join(F.broadcast(touched), "id", "left_anti")
    # stored open rows re-enter the chain as pseudo-log rows, KEEPING
    # their original _written_inc lineage; a replay against an
    # already-swapped current/ makes them (id, lsn) twins of increment
    # rows — the dedupe collapses them (op differs only in label, never
    # 'd' for a stored row, and a twin's _written_inc is necessarily
    # this batch's id, so either survivor is identical)
    pseudo = cur.join(F.broadcast(touched), "id").select(
        "id", "user_id", "status", "total_amount", "valid_from",
        F.lit("u").alias("__op"), "__source_lsn", "_written_inc",
    )
    merged = pseudo.unionByName(inc).dropDuplicates(["id", "__source_lsn"])
    w = Window.partitionBy("id").orderBy("__source_lsn")
    chained = (
        merged.withColumn("valid_to", F.lead("valid_from").over(w))
        .withColumn(
            "is_current", F.col("valid_to").isNull() & (F.col("__op") != "d")
        )
        .filter(F.col("__op") != "d")
        .select(*_STORE_COLS)
    )
    return chained, cur_untouched


def scd2_upsert(spark: SparkSession, dim_dir: str, increment: DataFrame, batch_id: int) -> bool:
    """Apply one changelog increment: close the open version of every
    touched key whose history advanced, open the new latest version,
    drop keys whose increment ends in a delete tombstone (the tombstone
    bounds the prior version's validity but is not a dimension row —
    same semantics as ``cdc_scd2_history``).

    Cost shape at 100 TB: the increment's touched-key set broadcasts
    into the ``current/`` scan (map-side probe — the dimension is never
    shuffled on more than the touched keys), the version re-chain is
    one hash shuffle of O(touched keys × versions-in-increment) rows,
    ``closed/`` is append-only, and the ``current/`` rewrite is
    O(live keys) — the same copy-on-write a MERGE INTO an Iceberg SCD2
    table performs. Returns True if applied, False if skipped (replay).
    """
    _recover(dim_dir)
    meta = _meta(dim_dir)
    if batch_id <= int(meta.get("last_batch_id", -1)):
        return False
    chained, cur_untouched = _merge_plan(spark, dim_dir, increment, batch_id)
    chained = chained.localCheckpoint(eager=True)
    closed_dir = _p(dim_dir, f"closed/inc={batch_id}")
    if not os.path.exists(closed_dir):
        # committed closed dirs are never regenerated: after a
        # post-swap crash the pre-increment versions are gone from
        # current/, so a recompute could not reproduce them
        tmp = _p(dim_dir, f"closed.tmp-{batch_id}-{os.getpid()}")
        chained.filter(~F.col("is_current")).write.mode("overwrite").parquet(tmp)
        os.makedirs(_p(dim_dir, "closed"), exist_ok=True)
        os.rename(tmp, closed_dir)
    new_current = cur_untouched.select(*_STORE_COLS).unionByName(
        chained.filter("is_current")
    )
    tmp_cur = _p(dim_dir, f"current.tmp-{batch_id}-{os.getpid()}")
    new_current.write.mode("overwrite").parquet(tmp_cur)
    cur_p, old_p = _p(dim_dir, "current"), _p(dim_dir, "current.old")
    shutil.rmtree(old_p, ignore_errors=True)
    os.rename(cur_p, old_p)
    os.rename(tmp_cur, cur_p)
    shutil.rmtree(old_p, ignore_errors=True)
    _write_meta(dim_dir, {"last_batch_id": batch_id})
    return True


def scd2_read_history(spark: SparkSession, dim_dir: str) -> DataFrame:
    """The full Type-2 dimension: closed versions ∪ open versions —
    row-identical to the batch ``cdc_scd2_history`` over the same
    changelog (hash-oracled by the registry entry)."""
    _recover(dim_dir)
    cur = spark.read.parquet(_p(dim_dir, "current"))
    closed_root = _p(dim_dir, "closed")
    if os.path.exists(closed_root) and any(
        n.startswith("inc=") for n in os.listdir(closed_root)
    ):
        closed = spark.read.parquet(closed_root).drop("inc")
        return closed.select(*_HISTORY_COLS).unionByName(cur.select(*_HISTORY_COLS))
    return cur.select(*_HISTORY_COLS)


def scd2_as_of(spark: SparkSession, dim_dir: str, batch_id: int) -> DataFrame:
    """Time travel (Iceberg ``VERSION AS OF``, on OUR artifact): the
    dimension history exactly as it stood after increment ``batch_id``
    committed — a pure metadata reconstruction from the store's batch
    lineage, no changelog replay and no data rewrite:

    - versions written later (``_written_inc`` > N) don't exist yet;
    - versions closed by an increment ≤ N keep their closed form
      (their closing batch IS their ``closed/inc=`` partition, so
      partition pruning discards every later closing wholesale);
    - versions closed only by a LATER increment — plus today's open
      rows — were the open versions as of N (valid_to reopened to
      null; stored rows are never tombstones, so open ⟹ current).

    Row-identical to rebuilding SCD2 from the changelog prefix
    (hash-oracled by ``scd2_dimension_as_of``; ``as_of(last batch)``
    ≡ ``scd2_read_history`` is asserted in tests)."""
    _recover(dim_dir)
    cur = (
        spark.read.parquet(_p(dim_dir, "current"))
        .filter(F.col("_written_inc") <= batch_id)
        .select(*_HISTORY_COLS)
    )
    closed_root = _p(dim_dir, "closed")
    if not (
        os.path.exists(closed_root)
        and any(n.startswith("inc=") for n in os.listdir(closed_root))
    ):
        return cur
    closed = spark.read.parquet(closed_root).filter(
        F.col("_written_inc") <= batch_id
    )
    closed_by_now = closed.filter(F.col("inc") <= batch_id).select(*_HISTORY_COLS)
    reopened = (
        closed.filter(F.col("inc") > batch_id)
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
        .select(*_HISTORY_COLS)
    )
    return closed_by_now.unionByName(reopened).unionByName(cur)


def scd2_dimension_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry form of time travel: the cached store holds three
    committed increments (initial load, update tail, delete tail);
    travel back to batch 1 — creates + updates applied, every delete
    still in the future — and require row equality with an SCD2 build
    over the changelog PREFIX (``CDC_SCD2_AS_OF_CU_SQL``). Versions
    deleted today must reappear open; versions closed by batch-1
    updates must stay closed."""
    store = _cached_scd2_store(spark, sf_dir)
    return scd2_as_of(spark, store, batch_id=1)


def _cached_scd2_store(spark: SparkSession, sf_dir: str) -> str:
    """Build-once cache of the materialized store for a testdata dir
    (the ``_cached_corpus_index`` posture): keyed by the orders
    parquet's identity, built privately, published with one atomic
    rename. The feature-store READ path (``lineitem_pit_stored``)
    probes this; the registry build entry deliberately rebuilds from
    scratch each call — it is attesting the incremental writer."""
    import hashlib

    from datapipe_spark.sources.cdc import synth_changelog

    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    key = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}:scd2v2".encode()
    ).hexdigest()[:16]
    root = os.environ.get("SPARK_GRAFT_SCD2_DIR", "/tmp/datapipe_spark_scd2")
    out = os.path.join(root, key)
    if not os.path.exists(os.path.join(out, "_READY")):
        tmp = f"{out}.tmp-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        log = synth_changelog(spark, sf_dir)
        scd2_init(spark, tmp)
        # three increments (initial load, update tail, delete tail) so
        # scd2_as_of has nontrivial intermediate states to travel to
        for b, op in enumerate(("c", "u", "d")):
            scd2_upsert(spark, tmp, log.filter(F.col("__op") == op), batch_id=b)
        open(os.path.join(tmp, "_READY"), "w").close()
        try:
            os.makedirs(root, exist_ok=True)
            os.rename(tmp, out)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # another builder won
    return out


def lineitem_pit_stored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The feature-store READ path end-to-end: the point-in-time
    status rollup served from the MATERIALIZED dimension store instead
    of an on-the-fly SCD2 build — the plan a feature platform actually
    runs (facts shuffle once; the dimension history is a parquet scan
    of current ∪ closed). Shares ``LINEITEM_PIT_STATUS_ROLLUP_SQL``:
    the hash oracle attests store materialization + incremental upsert
    + PIT join compose to exactly the on-the-fly answer."""
    from datapipe_spark.plans.cdc_queries import _pit_status_rollup

    hist = scd2_read_history(spark, _cached_scd2_store(spark, sf_dir)).select(
        "id", "status", "valid_from", "valid_to"
    )
    return _pit_status_rollup(spark, sf_dir, hist)


def scd2_dimension_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry form (r7 verdict ask #8): build the materialized store
    from a realistic two-increment arrival — the initial load (every
    create op) then the CDC tail (updates + deletes), so EVERY tail row
    closes or tombstones a window the first increment opened — and read
    the full history back. Shares ``CDC_SCD2_HISTORY_SQL``: the hash
    oracle attests the incremental writer reproduces the one-shot batch
    build exactly (the content-preservation contract
    ``lineitem_cluster_rewrite`` pins for source tables, applied to the
    dimension store)."""
    from datapipe_spark.sources.cdc import synth_changelog
    from datapipe_spark.util import fresh_dir

    log = synth_changelog(spark, sf_dir)
    store = fresh_dir("scd2_store")
    scd2_init(spark, store)
    scd2_upsert(spark, store, log.filter(F.col("__op") == "c"), batch_id=0)
    scd2_upsert(spark, store, log.filter(F.col("__op") != "c"), batch_id=1)
    return scd2_read_history(spark, store)
