"""CDC semantics tests: oracle parity + reference round-trip properties
(task9-validate-cdc.sh round-trips; read_s3_parquet.py:51 invariant)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datapipe_spark.plans import cdc_queries as cq
from datapipe_spark.sources import cdc
from tests.oracle import compare_to_oracle

CASES = [
    (cq.cdc_changelog, cq.CDC_CHANGELOG_SQL),
    (cq.cdc_latest_state, cq.CDC_LATEST_STATE_SQL),
    (cq.cdc_op_summary, cq.CDC_OP_SUMMARY_SQL),
    (cq.cdc_deleted_records, cq.CDC_DELETED_RECORDS_SQL),
    (cq.cdc_user_history, cq.CDC_USER_HISTORY_SQL),
    (cq.cdc_scd2_history, cq.CDC_SCD2_HISTORY_SQL),
]


def test_scd2_effectivity_chain(spark, sf_dir):
    """SCD2 invariants: per key, versions tile time (valid_from of
    version k+1 == valid_to of version k), exactly one open version
    unless the key was deleted, and is_current ⇔ open + not deleted."""
    from pyspark.sql import functions as F

    hist = cq.cdc_scd2_history(spark, sf_dir)
    # chain: the lead over the same order must reproduce valid_to
    from pyspark.sql.window import Window

    w = Window.partitionBy("id").orderBy("__source_lsn")
    bad_chain = (
        hist.withColumn("nxt", F.lead("valid_from").over(w))
        .filter(F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("nxt")))
        .count()
    )
    assert bad_chain == 0
    per_key_open = hist.groupBy("id").agg(
        F.count(F.when(F.col("valid_to").isNull(), 1)).alias("open_n"),
        F.count(F.when(F.col("is_current"), 1)).alias("cur_n"),
    )
    assert per_key_open.filter(F.col("open_n") > 1).count() == 0
    # deleted keys (id % 7 == 0): history fully closed, no current row
    assert (
        per_key_open.filter((F.col("id") % 7 == 0) & (F.col("cur_n") > 0)).count() == 0
    )
    # non-deleted keys: exactly one current version
    assert (
        per_key_open.filter((F.col("id") % 7 != 0) & (F.col("cur_n") != 1)).count() == 0
    )


@pytest.mark.parametrize("fn,sql", CASES, ids=[c[0].__name__ for c in CASES])
def test_cdc_matches_oracle(spark, sf_dir, fn, sql):
    compare_to_oracle(spark, fn, sql, sf_dir)


def test_envelope_flatten_roundtrip(spark, sf_dir):
    """flatten(nest(changelog)) == changelog (ExtractNewRecordState)."""
    log = cdc.synth_changelog(spark, sf_dir)
    roundtrip = cdc.flatten_envelope(cdc.nest_envelope(log))
    assert roundtrip.columns == log.columns
    assert roundtrip.exceptAll(log).count() == 0
    assert log.exceptAll(roundtrip).count() == 0


def test_compaction_equals_sequential_apply(spark, sf_dir):
    """Property: compaction == applying c/u/d sequentially per key."""
    log = cdc.synth_changelog(spark, sf_dir).collect()
    state: dict = {}
    for row in sorted(log, key=lambda r: r["__source_lsn"]):
        if row["__op"] == "d":
            state.pop(row["id"], None)
        else:
            state[row["id"]] = row
    compacted = {r["id"]: r for r in cdc.compact_latest(cdc.synth_changelog(spark, sf_dir)).collect()}
    assert set(compacted) == set(state)
    for k in state:
        assert compacted[k]["status"] == state[k]["status"]
        assert compacted[k]["__source_lsn"] == state[k]["__source_lsn"]


def test_newest_by_key_equals_newest_by_lsn(spark, sf_dir):
    """read_s3_parquet.py:51: ordering by key agrees with ordering by
    commit LSN for the newest record (LSN is monotone per key)."""
    log = cdc.synth_changelog(spark, sf_dir)
    by_lsn = log.orderBy(F.desc("__source_lsn")).limit(1).collect()[0]
    max_id = log.agg(F.max("id")).collect()[0][0]
    assert by_lsn["id"] == max_id


def test_archive_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    """S5/S6: time-partitioned archive write, partition-pruned read."""
    log = cdc.synth_changelog(spark, sf_dir)
    path = os.path.join(str(tmp_path), "archive")
    cdc.write_archive(log, path)
    back = cdc.read_archive(spark, path)
    assert back.count() == log.count()
    one_year = back.filter(F.col("year") == 1995)
    plan = one_year._jdf.queryExecution().executedPlan().toString()
    # partition filter must reach the scan, not a post-filter
    assert one_year.count() == log.filter(F.year("__source_ts_ms") == 1995).count()
    assert "PartitionFilters: [isnotnull(year" in plan or "year#" in plan


def test_scd2_store_matches_batch_oracle(spark, sf_dir):
    """r7 verdict ask #8: the materialized store — initial load + CDC
    tail applied incrementally — must reproduce the one-shot batch
    SCD2 build under the same DuckDB oracle."""
    from datapipe_spark.operators.scd2 import scd2_dimension_store

    compare_to_oracle(spark, scd2_dimension_store, cq.CDC_SCD2_HISTORY_SQL, sf_dir)


def test_scd2_store_split_invariance_and_replay(spark, sf_dir, tmp_path, monkeypatch):
    """The incremental writer's contract: (a) ANY per-key-ordered
    increment split yields the same history as the full batch build,
    (b) a replayed batch_id is skipped wholesale with the store
    untouched, (c) a crash AFTER the commit journal lands is completed
    by the next entry (reader or writer) — no torn increment is ever
    visible — and the replay then skips, (c') a crash BEFORE the
    journal leaves zero visible change and the batch replays
    wholesale."""
    from datapipe_spark.operators import scd2

    log = cdc.synth_changelog(spark, sf_dir)
    want = {tuple(r) for r in cq.cdc_scd2_history(spark, sf_dir).collect()}

    # (a) three-way split by op keeps per-key LSN order (c < u < d)
    d3 = str(tmp_path / "s3way")
    scd2.scd2_init(spark, d3)
    for i, op in enumerate(("c", "u", "d")):
        scd2.scd2_upsert(spark, d3, log.filter(F.col("__op") == op), batch_id=i)
    got3 = {tuple(r) for r in scd2.scd2_read_history(spark, d3).collect()}
    assert got3 == want

    # (b) replay skip: re-applying the last increment changes nothing
    assert scd2.scd2_upsert(spark, d3, log.filter("__op = 'd'"), batch_id=2) is False
    assert {tuple(r) for r in scd2.scd2_read_history(spark, d3).collect()} == want

    # (c) crash AFTER the commit point: journal written, roll-forward
    # dies after one closed-file move — buckets and meta untouched.
    # The next READ entry must complete the commit (r8 advisory: no
    # reader may ever see the torn increment), then the replay skips.
    import json as _json
    import os as _os

    dt = str(tmp_path / "storn")
    scd2.scd2_init(spark, dt)
    scd2.scd2_upsert(spark, dt, log.filter("__op = 'c'"), batch_id=0)
    real_rf = scd2._roll_forward

    def crash_mid_commit(dim_dir, sweep=False):
        jp = scd2._p(dim_dir, scd2._JOURNAL)
        if not _os.path.exists(jp):  # the entry-recovery call: run real
            return real_rf(dim_dir, sweep=sweep)
        with open(jp) as f:
            j = _json.load(f)
        if j["moves"]:
            src, dst = j["moves"][0]
            _os.makedirs(_os.path.dirname(dst), exist_ok=True)
            _os.replace(src, dst)  # one closed file lands, nothing else
        raise RuntimeError("simulated crash mid-commit")

    monkeypatch.setattr(scd2, "_roll_forward", crash_mid_commit)
    with pytest.raises(RuntimeError, match="mid-commit"):
        scd2.scd2_upsert(spark, dt, log.filter("__op != 'c'"), batch_id=1)
    monkeypatch.undo()
    assert _os.path.exists(scd2._p(dt, scd2._JOURNAL))
    assert scd2._meta(dt)["last_batch_id"] == 0  # watermark not yet moved

    gott = {tuple(r) for r in scd2.scd2_read_history(spark, dt).collect()}
    assert gott == want  # reader entry completed the journaled commit
    assert scd2._meta(dt)["last_batch_id"] == 1
    assert not _os.path.exists(scd2._p(dt, scd2._JOURNAL))
    assert scd2.scd2_upsert(spark, dt, log.filter("__op != 'c'"), batch_id=1) is False
    assert {tuple(r) for r in scd2.scd2_read_history(spark, dt).collect()} == want

    # (c') crash BEFORE the commit point: only invisible staging debris
    # — the store is byte-unchanged for readers and the batch replays
    dp = str(tmp_path / "spre")
    scd2.scd2_init(spark, dp)
    scd2.scd2_upsert(spark, dp, log.filter("__op = 'c'"), batch_id=0)
    after_b0 = {tuple(r) for r in scd2.scd2_read_history(spark, dp).collect()}

    def no_journal(dim_dir, journal):
        raise RuntimeError("simulated crash pre-commit")

    monkeypatch.setattr(scd2, "_write_journal", no_journal)
    with pytest.raises(RuntimeError, match="pre-commit"):
        scd2.scd2_upsert(spark, dp, log.filter("__op != 'c'"), batch_id=1)
    monkeypatch.undo()
    assert scd2._meta(dp)["last_batch_id"] == 0
    assert {tuple(r) for r in scd2.scd2_read_history(spark, dp).collect()} == after_b0
    assert scd2.scd2_upsert(spark, dp, log.filter("__op != 'c'"), batch_id=1) is True
    assert {tuple(r) for r in scd2.scd2_read_history(spark, dp).collect()} == want
    assert not [n for n in _os.listdir(dp) if n.startswith(".staging-")]


def test_scd2_store_current_slice_is_type1(spark, sf_dir, tmp_path):
    """current/ must equal the Type-1 compaction keyed view: one open
    row per live key, none for tombstoned keys — the compact slice a
    feature server reads."""
    from datapipe_spark.operators import scd2

    log = cdc.synth_changelog(spark, sf_dir)
    d = str(tmp_path / "scur")
    scd2.scd2_init(spark, d)
    scd2.scd2_upsert(spark, d, log.filter("__op = 'c'"), batch_id=0)
    scd2.scd2_upsert(spark, d, log.filter("__op != 'c'"), batch_id=1)
    cur = spark.read.parquet(scd2._p(d, "current"))
    latest = cdc.compact_latest(cdc.synth_changelog(spark, sf_dir))
    assert cur.filter(~F.col("is_current")).count() == 0
    got = {(r["id"], r["status"], r["__source_lsn"]) for r in cur.collect()}
    want_cur = {(r["id"], r["status"], r["__source_lsn"]) for r in latest.collect()}
    assert got == want_cur


def test_lineitem_pit_stored_matches_oracle_and_reuses_store(spark, sf_dir, monkeypatch, tmp_path):
    """The feature-store READ path: the PIT rollup served from the
    materialized store equals the on-the-fly oracle, and a second call
    reuses the cached store (no rebuild — booby-trap gated)."""
    from datapipe_spark.operators import scd2

    monkeypatch.setenv("SPARK_GRAFT_SCD2_DIR", str(tmp_path / "scd2_cache"))
    compare_to_oracle(
        spark, scd2.lineitem_pit_stored, cq.LINEITEM_PIT_STATUS_ROLLUP_SQL, sf_dir
    )
    first = {tuple(r) for r in scd2.lineitem_pit_stored(spark, sf_dir).collect()}

    def boom(*_a, **_k):
        raise AssertionError("store rebuilt despite cache")

    monkeypatch.setattr(scd2, "scd2_upsert", boom)
    again = {tuple(r) for r in scd2.lineitem_pit_stored(spark, sf_dir).collect()}
    assert again == first


def test_scd2_store_edge_increments(spark, tmp_path):
    """Degenerate increments must be clean no-ops or partial applies:
    an EMPTY increment advances the watermark without touching rows; a
    delete for a never-seen key contributes nothing; an increment of
    only-creates closes nothing (empty closed/inc=N stays readable)."""
    from datapipe_spark.operators import scd2

    schema = (
        "id long, user_id long, status string, total_amount string, "
        "created_at timestamp, __op string, __ts_ms timestamp, __source_lsn long"
    )
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)  # noqa: E731
    d = str(tmp_path / "edges")
    scd2.scd2_init(spark, d)

    # only-creates: closed/inc=0 is empty but must stay readable
    creates = spark.createDataFrame(
        [(1, 10, "A", "5.00", t(0), "c", t(1), 1), (2, 20, "A", "6.00", t(0), "c", t(2), 2)],
        schema,
    )
    assert scd2.scd2_upsert(spark, d, creates, batch_id=0) is True
    hist = scd2.scd2_read_history(spark, d)
    assert hist.count() == 2 and hist.filter("NOT is_current").count() == 0

    # empty increment: watermark advances, rows untouched
    empty = spark.createDataFrame([], schema)
    assert scd2.scd2_upsert(spark, d, empty, batch_id=1) is True
    assert scd2._meta(d)["last_batch_id"] == 1
    assert scd2.scd2_read_history(spark, d).count() == 2

    # delete for a never-seen key: nothing opens, nothing closes
    ghost_d = spark.createDataFrame([(99, 0, "X", "0.00", t(0), "d", t(3), 3)], schema)
    assert scd2.scd2_upsert(spark, d, ghost_d, batch_id=2) is True
    got = {(r["id"], r["is_current"]) for r in scd2.scd2_read_history(spark, d).collect()}
    assert got == {(1, True), (2, True)}


def test_lineitem_pit_stored_plan_is_keyed_join(spark, sf_dir, monkeypatch, tmp_path):
    """The stored-PIT read path must keep the keyed equi-join plan
    (same gate as the on-the-fly form): no BNLJ/cartesian."""
    from datapipe_spark.operators import scd2

    monkeypatch.setenv("SPARK_GRAFT_SCD2_DIR", str(tmp_path / "scd2_plan_cache"))
    df = scd2.lineitem_pit_stored(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "Cartesian" not in plan
    assert any(
        j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    ), plan


def test_scd2_as_of_time_travel(spark, sf_dir, monkeypatch, tmp_path):
    """Time travel: as_of(1) (pre-delete) equals the changelog-prefix
    oracle; as_of(last) equals the full history read; as_of(0) is the
    all-open initial load."""
    from datapipe_spark.operators import scd2

    monkeypatch.setenv("SPARK_GRAFT_SCD2_DIR", str(tmp_path / "scd2_tt"))
    compare_to_oracle(
        spark, scd2.scd2_dimension_as_of, cq.CDC_SCD2_AS_OF_CU_SQL, sf_dir
    )
    store = scd2._cached_scd2_store(spark, sf_dir)
    full = {tuple(r) for r in scd2.scd2_read_history(spark, store).collect()}
    as_of_last = {tuple(r) for r in scd2.scd2_as_of(spark, store, 2).collect()}
    assert as_of_last == full
    t0 = scd2.scd2_as_of(spark, store, 0)
    n_orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).count()
    assert t0.count() == n_orders
    assert t0.filter("NOT is_current OR valid_to IS NOT NULL").count() == 0


def test_scd2_upsert_rewrites_only_touched_buckets(spark, sf_dir, tmp_path):
    """r8 verdict ask #1: the bucketed current/ slice makes upsert cost
    ∝ touched buckets, not store size — files in UNTOUCHED buckets must
    be byte-identical (same path, size, mtime, content hash) across an
    upsert that touches a single bucket."""
    import hashlib

    from datapipe_spark.operators import scd2

    log = cdc.synth_changelog(spark, sf_dir)
    d = str(tmp_path / "sbuckets")
    scd2.scd2_init(spark, d)
    scd2.scd2_upsert(spark, d, log.filter("__op = 'c'"), batch_id=0)
    n_buckets = scd2._meta(d)["n_buckets"]

    # pick ONE bucket's keys for the next increment
    tail = log.filter("__op != 'c'")
    target = tail.select(scd2._bucket_of(n_buckets).alias("b")).first()["b"]
    one_bucket = tail.filter(scd2._bucket_of(n_buckets) == target)
    assert one_bucket.count() > 0

    def snapshot(skip_bucket):
        out = {}
        root = scd2._p(d, "current")
        for bdir in sorted(os.listdir(root)):
            b = int(bdir.split("=")[1])
            if b == skip_bucket:
                continue
            for name in sorted(os.listdir(os.path.join(root, bdir))):
                p = os.path.join(root, bdir, name)
                st = os.stat(p)
                out[p] = (
                    st.st_size,
                    st.st_mtime_ns,
                    hashlib.md5(open(p, "rb").read()).hexdigest(),
                )
        return out

    before = snapshot(target)
    assert before  # there are untouched buckets to compare
    assert scd2.scd2_upsert(spark, d, one_bucket, batch_id=1) is True
    assert snapshot(target) == before  # untouched buckets byte-identical

    # and the store is still correct: equal to replaying the same
    # increments through a fresh store the ordinary way
    d2 = str(tmp_path / "sbuckets_ref")
    scd2.scd2_init(spark, d2)
    scd2.scd2_upsert(spark, d2, log.filter("__op = 'c'"), batch_id=0)
    scd2.scd2_upsert(spark, d2, one_bucket, batch_id=1)
    got = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
    want = {tuple(r) for r in scd2.scd2_read_history(spark, d2).collect()}
    assert got == want


def test_scd2_compact_closed_preserves_history_and_time_travel(
    spark, sf_dir, tmp_path
):
    """r8 verdict ask #3: compacting the append-only closed/ files
    (one small set per increment) must preserve the full history AND
    every committed as_of(k) reconstruction, while cutting file count
    to the size target."""
    from datapipe_spark.operators import scd2
    from datapipe_spark.operators.maintenance import parquet_file_count

    log = cdc.synth_changelog(spark, sf_dir)
    d = str(tmp_path / "scompact")
    scd2.scd2_init(spark, d)
    for i, op in enumerate(("c", "u", "d")):
        scd2.scd2_upsert(spark, d, log.filter(F.col("__op") == op), batch_id=i)

    pre_hist = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
    pre_as_of = {
        k: {tuple(r) for r in scd2.scd2_as_of(spark, d, k).collect()}
        for k in (0, 1, 2)
    }
    files_before = parquet_file_count(scd2._p(d, "closed"))
    before, after = scd2.scd2_compact_closed(spark, d, target_bytes=1 << 30)
    assert before == files_before and after == 1  # tiny data → one file
    assert scd2._meta(d)["last_batch_id"] == 2  # watermark untouched
    assert {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()} == pre_hist
    for k, want_k in pre_as_of.items():
        got_k = {tuple(r) for r in scd2.scd2_as_of(spark, d, k).collect()}
        assert got_k == want_k, f"as_of({k}) diverged after compaction"


def test_lineitem_pit_as_of_matches_prefix_oracle(spark, sf_dir, monkeypatch, tmp_path):
    """r8 verdict ask #5: the time-traveled PIT read path — features
    exactly as the store stood at increment 1 — equals the PIT rollup
    over the changelog prefix, and differs from the current-store
    rollup (the deletes that committed later must be visible again)."""
    from datapipe_spark.operators import scd2

    monkeypatch.setenv("SPARK_GRAFT_SCD2_DIR", str(tmp_path / "scd2_pit_tt"))
    compare_to_oracle(
        spark, scd2.lineitem_pit_as_of, cq.LINEITEM_PIT_AS_OF_SQL, sf_dir
    )
    travelled = {tuple(r) for r in scd2.lineitem_pit_as_of(spark, sf_dir).collect()}
    today = {tuple(r) for r in scd2.lineitem_pit_stored(spark, sf_dir).collect()}
    assert travelled != today  # time travel genuinely changes the features


def test_scd2_lookup_prunes_to_key_buckets(spark, sf_dir, tmp_path):
    """Feature-serving point lookup: correct rows (the open versions of
    exactly the asked live keys) AND the scan partition-prunes to the
    keys' buckets with the key set broadcast — never a full dimension
    scan."""
    from datapipe_spark.operators import scd2

    log = cdc.synth_changelog(spark, sf_dir)
    d = str(tmp_path / "slookup")
    scd2.scd2_init(spark, d)
    scd2.scd2_upsert(spark, d, log.filter("__op = 'c'"), batch_id=0)
    scd2.scd2_upsert(spark, d, log.filter("__op != 'c'"), batch_id=1)

    live = [r["id"] for r in cdc.compact_latest(log).select("id").limit(3).collect()]
    deleted = [r["id"] for r in log.filter("__op = 'd'").select("id").limit(1).collect()]
    got = scd2.scd2_lookup(spark, d, live + deleted)
    want = {
        tuple(r)
        for r in scd2.scd2_read_history(spark, d)
        .filter(F.col("is_current") & F.col("id").isin(live + deleted))
        .collect()
    }
    assert {tuple(r) for r in got.collect()} == want
    assert {r["id"] for r in got.collect()} == set(live)  # tombstoned keys absent

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "PartitionFilters: [" in plan and "bucket" in plan.split(
        "PartitionFilters: ["
    )[1].split("]")[0], plan


def test_scd2_rebucket_preserves_store_and_updates_layout(spark, sf_dir, tmp_path):
    """Bucket-count evolution: rebucketing the current/ slice must be
    content-preserving (history, as_of, lookup all row-equal), update
    the layout + meta atomically, and keep subsequent upserts correct
    under the new bucket count."""
    from datapipe_spark.operators import scd2

    log = cdc.synth_changelog(spark, sf_dir)
    d = str(tmp_path / "srebucket")
    scd2.scd2_init(spark, d, n_buckets=8)
    scd2.scd2_upsert(spark, d, log.filter("__op = 'c'"), batch_id=0)
    scd2.scd2_upsert(spark, d, log.filter("__op = 'u'"), batch_id=1)

    pre_hist = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
    pre_as_of = {tuple(r) for r in scd2.scd2_as_of(spark, d, 0).collect()}
    live = [r["id"] for r in cdc.compact_latest(log).select("id").limit(4).collect()]
    pre_lookup = {tuple(r) for r in scd2.scd2_lookup(spark, d, live).collect()}

    scd2.scd2_rebucket(spark, d, 32)
    assert scd2._meta(d)["n_buckets"] == 32
    buckets = [n for n in os.listdir(scd2._p(d, "current")) if n.startswith("bucket=")]
    assert len(buckets) > 8
    assert {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()} == pre_hist
    assert {tuple(r) for r in scd2.scd2_as_of(spark, d, 0).collect()} == pre_as_of
    assert {tuple(r) for r in scd2.scd2_lookup(spark, d, live).collect()} == pre_lookup

    # the delete tail applies correctly under the new layout
    assert scd2.scd2_upsert(spark, d, log.filter("__op = 'd'"), batch_id=2) is True
    want = {tuple(r) for r in cq.cdc_scd2_history(spark, sf_dir).collect()}
    assert {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()} == want

    # shrink is equally content-preserving
    scd2.scd2_rebucket(spark, d, 4)
    assert scd2._meta(d)["n_buckets"] == 4
    assert {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()} == want


def test_scd2_history_for_keys_equals_filtered_full_read(spark, sf_dir, tmp_path):
    """The key-pruned history read must equal the full read filtered to
    the same keys (updated, untouched, and tombstoned keys alike),
    survive a rebucket (cbucket is fixed-modulus, decoupled from the
    layout bucket count), and keep its pruned plan: bucket partition
    filter on current/, cbucket pushed filter on closed/, broadcast
    semi join."""
    from datapipe_spark.operators import scd2

    log = cdc.synth_changelog(spark, sf_dir)
    d = str(tmp_path / "shfk")
    scd2.scd2_init(spark, d)
    for i, op in enumerate(("c", "u", "d")):
        scd2.scd2_upsert(spark, d, log.filter(F.col("__op") == op), batch_id=i)

    updated = [r["id"] for r in log.filter("__op = 'u'").select("id").limit(3).collect()]
    deleted = [r["id"] for r in log.filter("__op = 'd'").select("id").limit(2).collect()]
    ids = updated + deleted
    keys = spark.createDataFrame([(i,) for i in ids], "id long")

    want = {
        tuple(r)
        for r in scd2.scd2_read_history(spark, d).filter(F.col("id").isin(ids)).collect()
    }
    got_df = scd2.scd2_history_for_keys(spark, d, keys)
    assert {tuple(r) for r in got_df.collect()} == want

    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert any(  # the current/ scan partition-prunes to the key buckets
        "bucket" in seg.split("]")[0]
        for seg in plan.split("PartitionFilters: [")[1:]
    ), plan
    assert any(  # the closed/ scan prunes on the fixed-modulus bucket
        "cbucket" in seg.split("]")[0]
        for seg in plan.split("PushedFilters: [")[1:]
    ), plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan

    # compaction clusters on (cbucket, inc); equality must hold after
    scd2.scd2_compact_closed(spark, d, target_bytes=1 << 30)
    assert {
        tuple(r) for r in scd2.scd2_history_for_keys(spark, d, keys).collect()
    } == want

    # rebucketing the layout does not disturb the fixed-modulus reads
    scd2.scd2_rebucket(spark, d, 32)
    assert {
        tuple(r) for r in scd2.scd2_history_for_keys(spark, d, keys).collect()
    } == want


def test_scd2_commit_crash_sweep_every_fs_step(spark, tmp_path, monkeypatch):
    """Exhaustive torn-commit sweep: inject a crash after EVERY
    store-directory filesystem operation of the journaled commit in
    turn (journal rename, each closed-file move, each bucket-swap
    step, meta write, journal retirement, staging sweep). After each
    crash, entry recovery + batch replay must converge to exactly the
    never-crashed twin — no duplicate versions, no lost closes, no
    stuck journal."""
    import datetime as dt
    import os as _os
    import shutil as _shutil

    from datapipe_spark.operators import scd2

    schema = (
        "id long, user_id long, status string, total_amount string, "
        "created_at timestamp, __op string, __ts_ms timestamp, __source_lsn long"
    )
    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)  # noqa: E731
    creates = spark.createDataFrame(
        [(i, i * 10, "A", "5.00", t(0), "c", t(i), i) for i in range(1, 7)], schema
    )
    tail = spark.createDataFrame(
        [
            (1, 10, "B", "6.00", t(0), "u", t(10), 101),
            (2, 20, "C", "7.00", t(0), "u", t(11), 102),
            (3, 30, "X", "0.00", t(0), "d", t(12), 103),
        ],
        schema,
    )

    # never-crashed twin
    clean = str(tmp_path / "clean")
    scd2.scd2_init(spark, clean, n_buckets=4)
    scd2.scd2_upsert(spark, clean, creates, batch_id=0)
    scd2.scd2_upsert(spark, clean, tail, batch_id=1)
    want = {tuple(r) for r in scd2.scd2_read_history(spark, clean).collect()}

    budget = {"n": None, "root": None}
    reals = {
        "rename": _os.rename,
        "replace": _os.replace,
        "remove": _os.remove,
        "rmtree": _shutil.rmtree,
    }

    def gate(real):
        def wrapper(*a, **k):
            p = a[0] if a else ""
            if (
                budget["n"] is not None
                and isinstance(p, str)
                and budget["root"] in p
            ):
                if budget["n"] <= 0:
                    raise RuntimeError("crash-inject")
                budget["n"] -= 1
            return real(*a, **k)
        return wrapper

    monkeypatch.setattr(_os, "rename", gate(reals["rename"]))
    monkeypatch.setattr(_os, "replace", gate(reals["replace"]))
    monkeypatch.setattr(_os, "remove", gate(reals["remove"]))
    monkeypatch.setattr(_shutil, "rmtree", gate(reals["rmtree"]))

    completed_without_crash = False
    for k in range(0, 40):
        d = str(tmp_path / f"sweep_{k}")
        budget["n"], budget["root"] = None, d
        scd2.scd2_init(spark, d, n_buckets=4)
        scd2.scd2_upsert(spark, d, creates, batch_id=0)
        budget["n"] = k
        crashed = False
        try:
            scd2.scd2_upsert(spark, d, tail, batch_id=1)
        except RuntimeError as e:
            assert "crash-inject" in str(e)
            crashed = True
        budget["n"] = None
        # recovery happens at the next entry; replay must be exact-once
        scd2.scd2_upsert(spark, d, tail, batch_id=1)
        got = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
        assert got == want, f"diverged after crash at fs-op {k}"
        assert scd2._meta(d)["last_batch_id"] == 1
        assert not _os.path.exists(scd2._p(d, scd2._JOURNAL))
        assert not [n for n in _os.listdir(d) if n.startswith(".staging-")]
        if not crashed:
            completed_without_crash = True
            break
    assert completed_without_crash, "sweep never reached the clean-run budget"


def test_scd2_rebucket_torn_swap_recovers(spark, sf_dir, tmp_path, monkeypatch):
    """A crash between rebucket's journal write and its whole-dir swap
    must be invisible: the next read entry completes the swap and
    meta, and the store equals the uncrashed rebucket exactly."""
    from datapipe_spark.operators import scd2

    log = cdc.synth_changelog(spark, sf_dir)
    d = str(tmp_path / "srbtorn")
    scd2.scd2_init(spark, d, n_buckets=8)
    scd2.scd2_upsert(spark, d, log.filter("__op = 'c'"), batch_id=0)
    scd2.scd2_upsert(spark, d, log.filter("__op != 'c'"), batch_id=1)
    want = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}

    def crash(dim_dir, sweep=False):  # journal persisted, nothing rolled forward
        raise RuntimeError("simulated crash post-journal")

    monkeypatch.setattr(scd2, "_roll_forward", crash)
    with pytest.raises(RuntimeError, match="post-journal"):
        scd2.scd2_rebucket(spark, d, 32)
    monkeypatch.undo()
    assert os.path.exists(scd2._p(d, scd2._JOURNAL))
    assert scd2._meta(d)["n_buckets"] == 8  # not yet advanced

    got = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
    assert got == want  # reader entry completed the rebucket
    assert scd2._meta(d)["n_buckets"] == 32
    buckets = [n for n in os.listdir(scd2._p(d, "current")) if n.startswith("bucket=")]
    assert len(buckets) > 8
    # and the watermark survived the recovery: committed batches skip
    assert scd2.scd2_upsert(spark, d, log.filter("__op != 'c'"), batch_id=1) is False
    assert {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()} == want


def test_scd2_key_reads_empty_key_set(spark, sf_dir, tmp_path):
    """Degenerate inputs: an empty key set returns an empty,
    correctly-schema'd frame from both key-pruned readers."""
    from datapipe_spark.operators import scd2

    log = cdc.synth_changelog(spark, sf_dir)
    d = str(tmp_path / "sempty")
    scd2.scd2_init(spark, d)
    scd2.scd2_upsert(spark, d, log.filter("__op = 'c'"), batch_id=0)
    assert scd2.scd2_lookup(spark, d, []).count() == 0
    empty_keys = spark.createDataFrame([], "id long")
    got = scd2.scd2_history_for_keys(spark, d, empty_keys)
    assert got.count() == 0
    assert got.columns == scd2._HISTORY_COLS


def _mini_store(spark, scd2, d, n_buckets=4):
    """Tiny deterministic two-increment store (shared by the r10
    crash-safety tests): 6 creates then update/update/delete."""
    import datetime as dt

    schema = (
        "id long, user_id long, status string, total_amount string, "
        "created_at timestamp, __op string, __ts_ms timestamp, __source_lsn long"
    )
    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)  # noqa: E731
    creates = spark.createDataFrame(
        [(i, i * 10, "A", "5.00", t(0), "c", t(i), i) for i in range(1, 7)], schema
    )
    tail = spark.createDataFrame(
        [
            (1, 10, "B", "6.00", t(0), "u", t(10), 101),
            (2, 20, "C", "7.00", t(0), "u", t(11), 102),
            (3, 30, "X", "0.00", t(0), "d", t(12), 103),
        ],
        schema,
    )
    scd2.scd2_init(spark, d, n_buckets=n_buckets)
    scd2.scd2_upsert(spark, d, creates, batch_id=0)
    scd2.scd2_upsert(spark, d, tail, batch_id=1)


def test_scd2_compact_closed_torn_swap_recovers(spark, tmp_path, monkeypatch):
    """r9 advisory (medium #1): a crash between compaction's journal
    write and its closed/ swap must be invisible — the pre-fix rename
    pair could leave NO closed/ dir, and readers then silently served
    current-only history. Now the next entry completes the journaled
    swap and history + time travel are exactly the pre-compaction
    answer."""
    import os as _os

    from datapipe_spark.operators import scd2

    d = str(tmp_path / "ctorn")
    _mini_store(spark, scd2, d)
    want = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
    want_asof0 = {tuple(r) for r in scd2.scd2_as_of(spark, d, 0).collect()}

    def crash(dim_dir, sweep=False):  # journal persisted, nothing rolled forward
        raise RuntimeError("simulated crash post-journal")

    monkeypatch.setattr(scd2, "_roll_forward", crash)
    with pytest.raises(RuntimeError, match="post-journal"):
        scd2.scd2_compact_closed(spark, d, target_bytes=1 << 30)
    monkeypatch.undo()
    assert _os.path.exists(scd2._p(d, scd2._JOURNAL))
    # the live closed/ dir was never touched pre-swap: history intact
    assert scd2._has_closed(d)

    # a READER entry completes the journaled swap
    got = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
    assert got == want
    assert not _os.path.exists(scd2._p(d, scd2._JOURNAL))
    assert scd2._has_closed(d)
    assert {tuple(r) for r in scd2.scd2_as_of(spark, d, 0).collect()} == want_asof0
    # a writer entry sweeps the leftover staging wrapper
    scd2.scd2_compact_closed(spark, d, target_bytes=1 << 30)
    assert not [n for n in _os.listdir(d) if n.startswith(".staging-")]
    assert {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()} == want


def test_scd2_compact_crash_sweep_every_fs_step(spark, tmp_path, monkeypatch):
    """Exhaustive torn-compaction sweep (r9 advisory, medium #1):
    inject a crash after EVERY store-directory filesystem op of the
    journaled compaction in turn. After each crash, entry recovery
    must leave history AND time travel exactly equal to the
    uncompacted store — closed/ may never vanish."""
    import os as _os
    import shutil as _shutil

    from datapipe_spark.operators import scd2

    template = str(tmp_path / "tmpl")
    _mini_store(spark, scd2, template)
    want = {tuple(r) for r in scd2.scd2_read_history(spark, template).collect()}
    want_asof0 = {tuple(r) for r in scd2.scd2_as_of(spark, template, 0).collect()}

    budget = {"n": None, "root": None}
    reals = {
        "rename": _os.rename,
        "replace": _os.replace,
        "remove": _os.remove,
        "rmtree": _shutil.rmtree,
    }

    def gate(real):
        def wrapper(*a, **k):
            p = a[0] if a else ""
            if budget["n"] is not None and isinstance(p, str) and budget["root"] in p:
                if budget["n"] <= 0:
                    raise RuntimeError("crash-inject")
                budget["n"] -= 1
            return real(*a, **k)
        return wrapper

    monkeypatch.setattr(_os, "rename", gate(reals["rename"]))
    monkeypatch.setattr(_os, "replace", gate(reals["replace"]))
    monkeypatch.setattr(_os, "remove", gate(reals["remove"]))
    monkeypatch.setattr(_shutil, "rmtree", gate(reals["rmtree"]))

    completed_without_crash = False
    for k in range(0, 25):
        d = str(tmp_path / f"csweep_{k}")
        budget["n"], budget["root"] = None, d
        _shutil.copytree(template, d)
        budget["n"] = k
        crashed = False
        try:
            scd2.scd2_compact_closed(spark, d, target_bytes=1 << 30)
        except RuntimeError as e:
            assert "crash-inject" in str(e)
            crashed = True
        budget["n"] = None
        # recovery at the next entry (reader completes any journal;
        # the retry is a writer entry that also sweeps)
        scd2.scd2_compact_closed(spark, d, target_bytes=1 << 30)
        assert scd2._has_closed(d), f"closed/ vanished after crash at fs-op {k}"
        got = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
        assert got == want, f"history diverged after crash at fs-op {k}"
        asof = {tuple(r) for r in scd2.scd2_as_of(spark, d, 0).collect()}
        assert asof == want_asof0, f"as_of diverged after crash at fs-op {k}"
        assert not _os.path.exists(scd2._p(d, scd2._JOURNAL))
        assert not [n for n in _os.listdir(d) if n.startswith(".staging-")]
        if not crashed:
            completed_without_crash = True
            break
    assert completed_without_crash, "sweep never reached the clean-run budget"


def test_scd2_reader_never_sweeps_live_staging(spark, tmp_path):
    """r9 advisory (medium #2, sweep half): a reader entry must NOT
    delete .staging-* dirs — they may belong to a LIVE writer that has
    not journaled yet; sweeping them would lose its increment after
    the journal lands. Only writer entries sweep."""
    import os as _os

    from datapipe_spark.operators import scd2

    d = str(tmp_path / "rsweep")
    _mini_store(spark, scd2, d)
    live = _os.path.join(d, ".staging-inflight")
    _os.makedirs(_os.path.join(live, "closed"))
    open(_os.path.join(live, "closed", "part-0.parquet"), "w").close()

    scd2.scd2_read_history(spark, d).count()
    scd2.scd2_as_of(spark, d, 0).count()
    scd2.scd2_lookup(spark, d, [1, 2]).count()
    keys = spark.createDataFrame([(1,)], "id long")
    scd2.scd2_history_for_keys(spark, d, keys).count()
    assert _os.path.isdir(live), "a reader swept a live writer's staging"

    # a writer entry (single writer by contract ⟹ debris) sweeps it
    scd2.scd2_compact_closed(spark, d, target_bytes=1 << 30)
    assert not _os.path.isdir(live)


def test_scd2_roll_forward_raises_on_lost_staging(spark, tmp_path):
    """r9 advisory (medium #2, raise half): a journaled move/swap whose
    source AND destination are both missing means the staged increment
    was destroyed after the commit point — completing the commit would
    advance the watermark past a lost batch. The old code skipped
    silently; it must raise."""
    import json as _json
    import os as _os

    from datapipe_spark.operators import scd2

    d = str(tmp_path / "lost")
    _mini_store(spark, scd2, d)
    meta = scd2._meta(d)

    # lost MOVE: neither staged src nor committed dst exists
    scd2._write_journal(
        d,
        {
            "moves": [[scd2._p(d, ".staging-gone/closed/part-0.parquet"),
                       scd2._p(d, "closed/gone-part-0.parquet")]],
            "swaps": [],
            "meta": {**meta, "last_batch_id": 99},
        },
    )
    with pytest.raises(RuntimeError, match="both missing"):
        scd2.scd2_read_history(spark, d).count()
    assert scd2._meta(d)["last_batch_id"] != 99  # watermark NOT advanced
    _os.remove(scd2._p(d, scd2._JOURNAL))

    # lost SWAP: staged dir gone and live target absent
    scd2._write_journal(
        d,
        {
            "moves": [],
            "swaps": [[scd2._p(d, ".staging-gone/newpart"), scd2._p(d, "newpart")]],
            "meta": {**meta, "last_batch_id": 99},
        },
    )
    with pytest.raises(RuntimeError, match="both missing"):
        scd2.scd2_as_of(spark, d, 0).count()
    assert scd2._meta(d)["last_batch_id"] != 99
    _os.remove(scd2._p(d, scd2._JOURNAL))

    # and the legal idempotent-replay state (src gone, dst present)
    # still completes silently: replay the journal with dst existing
    _os.makedirs(scd2._p(d, ".ok"), exist_ok=True)
    scd2._write_journal(
        d,
        {
            "moves": [],
            "swaps": [[scd2._p(d, ".staging-gone/x"), scd2._p(d, ".ok")]],
            "meta": meta,
        },
    )
    scd2.scd2_read_history(spark, d).count()  # completes, no raise
    assert not _os.path.exists(scd2._p(d, scd2._JOURNAL))


def test_scd2_legacy_layout_rejected(spark, tmp_path):
    """r9 advisory (low): a store whose meta.json predates the layout
    field would be silently misread (flat current/ has no bucket
    column; legacy closed/inc=N subdirs are invisible). Every entry —
    reads included — must refuse it loudly instead."""
    import json as _json

    from datapipe_spark.operators import scd2

    d = str(tmp_path / "legacy")
    _mini_store(spark, scd2, d)
    legacy = {k: v for k, v in scd2._meta(d).items() if k != "layout"}
    with open(scd2._p(d, "meta.json"), "w") as f:
        _json.dump(legacy, f)

    for entry in (
        lambda: scd2.scd2_read_history(spark, d).count(),
        lambda: scd2.scd2_as_of(spark, d, 0).count(),
        lambda: scd2.scd2_lookup(spark, d, [1]).count(),
        lambda: scd2.scd2_upsert(
            spark, d, spark.createDataFrame([], (
                "id long, user_id long, status string, total_amount string, "
                "created_at timestamp, __op string, __ts_ms timestamp, "
                "__source_lsn long")), batch_id=9),
        lambda: scd2.scd2_compact_closed(spark, d),
        lambda: scd2.scd2_rebucket(spark, d, 16),
    ):
        with pytest.raises(RuntimeError, match="layout"):
            entry()


def test_scd2_migrate_legacy_store(spark, tmp_path, monkeypatch):
    """The 'migrate' arm of the layout gate: a legacy layout-less store
    (flat current/, hive closed/inc=N, no lineage columns) raises at
    every entry, migrates in place preserving every version and the
    watermark, keeps accepting increments afterwards, and a crash
    after the migration's commit journal is completed by the next
    READER entry."""
    import json as _json
    import os as _os

    from datapipe_spark.operators import scd2

    # the modern twin supplies the expected history rows
    modern = str(tmp_path / "modern")
    _mini_store(spark, scd2, modern)
    hist = scd2.scd2_read_history(spark, modern)
    want = {tuple(r) for r in hist.collect()}

    def build_legacy(d):
        scd2._write_legacy_store(spark, hist, d)
        with open(scd2._p(d, "meta.json")) as f:
            assert "layout" not in _json.load(f)

    # (a) pre-migration every entry raises; migration preserves content
    d = str(tmp_path / "legacy_a")
    build_legacy(d)
    with pytest.raises(RuntimeError, match="layout"):
        scd2.scd2_read_history(spark, d).count()
    assert scd2.scd2_migrate(spark, d) is True
    got = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
    assert got == want
    assert scd2._meta(d)["layout"] == scd2._LAYOUT
    assert scd2._meta(d)["last_batch_id"] == 1  # watermark preserved
    # second call is a no-op writer entry
    assert scd2.scd2_migrate(spark, d) is False
    assert {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()} == want

    # (b) the migrated store keeps accepting increments: a replayed
    # batch skips (watermark), a new one applies through the merge
    import datetime as dt

    schema = (
        "id long, user_id long, status string, total_amount string, "
        "created_at timestamp, __op string, __ts_ms timestamp, __source_lsn long"
    )
    t9 = dt.datetime(2024, 1, 2)
    inc = spark.createDataFrame(
        [(4, 40, "Z", "9.00", t9, "u", t9, 999)], schema
    )
    assert scd2.scd2_upsert(spark, d, inc, batch_id=1) is False  # replay
    assert scd2.scd2_upsert(spark, d, inc, batch_id=2) is True
    post = scd2.scd2_read_history(spark, d)
    assert post.filter("id = 4 AND status = 'Z' AND is_current").count() == 1
    assert post.filter("id = 4").count() == 2  # old version closed

    # (c) crash after the migration journal: the next reader entry
    # completes it and sees the full migrated history
    d2 = str(tmp_path / "legacy_b")
    build_legacy(d2)

    def crash(dim_dir, sweep=False):
        raise RuntimeError("simulated crash post-journal")

    monkeypatch.setattr(scd2, "_roll_forward", crash)
    with pytest.raises(RuntimeError, match="post-journal"):
        scd2.scd2_migrate(spark, d2)
    monkeypatch.undo()
    assert _os.path.exists(scd2._p(d2, scd2._JOURNAL))
    got2 = {tuple(r) for r in scd2.scd2_read_history(spark, d2).collect()}
    assert got2 == want
    assert scd2._meta(d2)["layout"] == scd2._LAYOUT

    # (d) a legacy store with NO closed/ slice (never-updated keys)
    d3 = str(tmp_path / "legacy_c")
    scd2._write_legacy_store(spark, hist.filter("is_current"), d3)
    import shutil as _sh

    _sh.rmtree(scd2._p(d3, "closed"), ignore_errors=True)
    assert scd2.scd2_migrate(spark, d3) is True
    got3 = {tuple(r) for r in scd2.scd2_read_history(spark, d3).collect()}
    assert got3 == {t for t in want if t[6]}  # is_current rows only


def test_scd2_maintenance_interleaved_with_upserts(spark, sf_dir, tmp_path):
    """Maintenance DURING ingestion (what the journaled compaction
    makes safe): compaction and rebucketing interleave with increments
    and the final history still equals the uninterrupted batch build —
    plus time travel to every committed increment still reconstructs."""
    from datapipe_spark.operators import scd2

    log = cdc.synth_changelog(spark, sf_dir)
    d = str(tmp_path / "inter")
    scd2.scd2_init(spark, d)
    scd2.scd2_upsert(spark, d, log.filter("__op = 'c'"), batch_id=0)
    asof0 = {tuple(r) for r in scd2.scd2_as_of(spark, d, 0).collect()}
    scd2.scd2_upsert(spark, d, log.filter("__op = 'u'"), batch_id=1)
    scd2.scd2_compact_closed(spark, d, target_bytes=1 << 30)
    asof1 = {tuple(r) for r in scd2.scd2_as_of(spark, d, 1).collect()}
    scd2.scd2_rebucket(spark, d, 16)
    scd2.scd2_upsert(spark, d, log.filter("__op = 'd'"), batch_id=2)
    scd2.scd2_compact_closed(spark, d, target_bytes=1 << 30)

    want = {tuple(r) for r in cq.cdc_scd2_history(spark, sf_dir).collect()}
    got = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
    assert got == want
    # as_of still reconstructs the exact mid-maintenance states
    assert {tuple(r) for r in scd2.scd2_as_of(spark, d, 0).collect()} == asof0
    assert {tuple(r) for r in scd2.scd2_as_of(spark, d, 1).collect()} == asof1


def test_scd2_purge_keys_erases_all_history(spark, tmp_path, monkeypatch):
    """Compliance erasure: every version of the purged keys disappears
    from history, lookups, and every time-travel point; all other
    versions are byte-identical; the purge commits atomically (torn
    commit completed by a reader, pre-journal crash leaves the store
    unchanged); purged keys can re-enter later as fresh history."""
    import os as _os

    from datapipe_spark.operators import scd2

    d = str(tmp_path / "purge")
    _mini_store(spark, scd2, d)
    before = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
    keys = spark.createDataFrame([(1,), (5,)], "id long")

    scd2.scd2_purge_keys(spark, d, keys)
    got = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
    assert got == {t for t in before if t[0] not in (1, 5)}
    assert scd2.scd2_lookup(spark, d, [1, 5]).count() == 0
    for b in (0, 1):
        asof = scd2.scd2_as_of(spark, d, b)
        assert asof.filter(F.col("id").isin(1, 5)).count() == 0
    assert scd2._meta(d)["last_batch_id"] == 1  # not an increment

    # purged keys re-enter as fresh history
    import datetime as dt

    schema = (
        "id long, user_id long, status string, total_amount string, "
        "created_at timestamp, __op string, __ts_ms timestamp, __source_lsn long"
    )
    t9 = dt.datetime(2024, 1, 3)
    assert scd2.scd2_upsert(
        spark, d,
        spark.createDataFrame([(1, 10, "NEW", "1.00", t9, "c", t9, 500)], schema),
        batch_id=2,
    ) is True
    assert scd2.scd2_lookup(spark, d, [1]).filter("status = 'NEW'").count() == 1

    # torn purge: journal lands, roll-forward crashes — reader completes
    d2 = str(tmp_path / "purge_torn")
    _mini_store(spark, scd2, d2)
    want2 = {
        t
        for t in {tuple(r) for r in scd2.scd2_read_history(spark, d2).collect()}
        if t[0] != 2
    }

    def crash(dim_dir, sweep=False):
        raise RuntimeError("simulated crash post-journal")

    monkeypatch.setattr(scd2, "_roll_forward", crash)
    with pytest.raises(RuntimeError, match="post-journal"):
        scd2.scd2_purge_keys(spark, d2, spark.createDataFrame([(2,)], "id long"))
    monkeypatch.undo()
    assert _os.path.exists(scd2._p(d2, scd2._JOURNAL))
    assert {tuple(r) for r in scd2.scd2_read_history(spark, d2).collect()} == want2
    assert not _os.path.exists(scd2._p(d2, scd2._JOURNAL))

    # pre-journal crash leaves the store unchanged (keys still there)
    d3 = str(tmp_path / "purge_pre")
    _mini_store(spark, scd2, d3)
    before3 = {tuple(r) for r in scd2.scd2_read_history(spark, d3).collect()}

    def no_journal(dim_dir, journal):
        raise RuntimeError("simulated crash pre-commit")

    monkeypatch.setattr(scd2, "_write_journal", no_journal)
    with pytest.raises(RuntimeError, match="pre-commit"):
        scd2.scd2_purge_keys(spark, d3, spark.createDataFrame([(2,)], "id long"))
    monkeypatch.undo()
    assert {tuple(r) for r in scd2.scd2_read_history(spark, d3).collect()} == before3

    # empty key set: no-op
    scd2.scd2_purge_keys(spark, d3, spark.createDataFrame([], "id long"))
    assert {tuple(r) for r in scd2.scd2_read_history(spark, d3).collect()} == before3


def test_scd2_schema_evolution_lifecycle(spark, tmp_path):
    """r10 verdict ask #3: an increment carrying a new nullable column
    evolves the store in place — meta records the column, new files
    carry it, pre-evolution files back-fill null at read with ZERO
    data rewritten (untouched bucket files stay byte-identical). The
    evolved column must survive every store surface: history, lookup,
    key-pruned reads, time travel, compaction, rebucketing, and purge;
    a post-evolution increment WITHOUT the column (a lagging producer)
    writes null."""
    import datetime as dt
    import hashlib
    import os as _os

    from datapipe_spark.operators import scd2

    d = str(tmp_path / "evolved")
    base_schema = (
        "id long, user_id long, status string, total_amount string, "
        "created_at timestamp, __op string, __ts_ms timestamp, __source_lsn long"
    )
    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)  # noqa: E731
    creates = spark.createDataFrame(
        [(i, i * 10, "A", "5.00", t(0), "c", t(i), i) for i in range(1, 7)],
        base_schema,
    )
    scd2.scd2_init(spark, d, n_buckets=4)
    scd2.scd2_upsert(spark, d, creates, batch_id=0)

    # pre-evolution bucket files that inc1 won't touch must not move
    def _bucket_file_hashes():
        out = {}
        croot = scd2._p(d, "current")
        for b in sorted(_os.listdir(croot)):
            for f in sorted(_os.listdir(_os.path.join(croot, b))):
                if f.endswith(".parquet"):
                    with open(_os.path.join(croot, b, f), "rb") as fh:
                        out[f"{b}/{f}"] = hashlib.md5(fh.read()).hexdigest()
        return out

    before_files = _bucket_file_hashes()

    ev_schema = base_schema + ", channel string"
    inc1 = spark.createDataFrame(
        [(1, 10, "B", "6.00", t(0), "u", t(10), 101, "web")], ev_schema
    )
    assert scd2.scd2_upsert(spark, d, inc1, batch_id=1) is True
    assert scd2._extras(scd2._meta(d)) == [("channel", "string")]

    hist = {r["id"]: r for r in scd2.scd2_read_history(spark, d).collect()}
    assert "channel" in scd2.scd2_read_history(spark, d).columns
    # key 1 now has two versions: take the open one via lookup
    assert scd2.scd2_lookup(spark, d, [1]).collect()[0]["channel"] == "web"
    assert all(
        r["channel"] is None
        for r in scd2.scd2_read_history(spark, d).filter("id != 1").collect()
    )
    # untouched buckets: byte-identical (zero-rewrite column add)
    after_files = _bucket_file_hashes()
    touched_bucket = [
        r[0]
        for r in spark.range(1).select(
            F.pmod(F.xxhash64(F.lit(1).cast("long")), F.lit(4)).cast("int")
        ).collect()
    ][0]
    untouched = {
        k: v
        for k, v in before_files.items()
        if not k.startswith(f"bucket={touched_bucket}/")
    }
    assert untouched, "fixture needs at least one untouched bucket"
    for k, v in untouched.items():
        assert after_files.get(k) == v, f"{k} rewritten by a column add"

    # a lagging producer without the column writes null
    inc2 = spark.createDataFrame(
        [(2, 20, "C", "7.00", t(0), "u", t(11), 201)], base_schema
    )
    scd2.scd2_upsert(spark, d, inc2, batch_id=2)
    assert scd2.scd2_lookup(spark, d, [2]).collect()[0]["channel"] is None

    want = sorted(tuple(r) for r in scd2.scd2_read_history(spark, d).collect())

    # time travel: pre-evolution state reads the evolved schema, null
    asof0 = scd2.scd2_as_of(spark, d, 0)
    assert "channel" in asof0.columns
    assert all(r["channel"] is None for r in asof0.collect())
    asof1 = {r["id"]: r for r in scd2.scd2_as_of(spark, d, 1).filter("is_current").collect()}
    assert asof1[1]["channel"] == "web"

    # maintenance preserves the evolved column exactly
    scd2.scd2_compact_closed(spark, d)
    assert sorted(tuple(r) for r in scd2.scd2_read_history(spark, d).collect()) == want
    scd2.scd2_rebucket(spark, d, 8)
    assert sorted(tuple(r) for r in scd2.scd2_read_history(spark, d).collect()) == want
    kf = scd2.scd2_history_for_keys(
        spark, d, spark.createDataFrame([(1,)], "id long")
    ).collect()
    assert {r["channel"] for r in kf} == {None, "web"}

    # purge composes with evolution
    scd2.scd2_purge_keys(spark, d, spark.createDataFrame([(1,)], "id long"))
    got = sorted(tuple(r) for r in scd2.scd2_read_history(spark, d).collect())
    assert got == [r for r in want if r[0] != 1]


def test_scd2_queued_purges_equal_immediate_purges(spark, tmp_path):
    """r10 verdict ask #2 property: k queued purges (with interleaved
    upserts, including a re-insert of a queued key) read back — and,
    after compaction folds them, physically equal — the same k purges
    applied immediately at the same points. Sequence scoping is the
    load-bearing part: the version a LATER increment writes for a
    queued key must survive, exactly as it does after
    physical-purge-then-reinsert."""
    import datetime as dt
    import os as _os

    from datapipe_spark.operators import scd2

    schema = (
        "id long, user_id long, status string, total_amount string, "
        "created_at timestamp, __op string, __ts_ms timestamp, __source_lsn long"
    )
    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)  # noqa: E731
    creates = spark.createDataFrame(
        [(i, i * 10, "A", "5.00", t(0), "c", t(i), i) for i in range(1, 9)],
        schema,
    )
    inc1 = spark.createDataFrame(
        [
            (1, 10, "R", "9.00", t(0), "u", t(20), 201),  # re-insert queued key
            (3, 30, "B", "6.00", t(0), "u", t(21), 203),
        ],
        schema,
    )

    def hist(d):
        return sorted(
            tuple(r) for r in scd2.scd2_read_history(spark, d).collect()
        )

    qd = str(tmp_path / "queued")
    pd_ = str(tmp_path / "immediate")
    for d in (qd, pd_):
        scd2.scd2_init(spark, d, n_buckets=4)
        scd2.scd2_upsert(spark, d, creates, batch_id=0)
    k12 = spark.createDataFrame([(1,), (2,)], "id long")
    scd2.scd2_queue_purge(spark, qd, k12)
    scd2.scd2_purge_keys(spark, pd_, k12)
    for d in (qd, pd_):
        scd2.scd2_upsert(spark, d, inc1, batch_id=1)
    k3 = spark.createDataFrame([(3,)], "id long")
    scd2.scd2_queue_purge(spark, qd, k3)
    scd2.scd2_purge_keys(spark, pd_, k3)

    # merge-on-read BEFORE any fold must already match
    assert hist(qd) == hist(pd_)
    assert scd2._meta(qd)["n_tombstones"] == 3
    # every read surface folds tombstones: lookup, key-pruned, as_of
    assert scd2.scd2_lookup(spark, qd, [2, 3]).count() == 0
    assert scd2.scd2_lookup(spark, qd, [1]).filter("status='R'").count() == 1
    kf = scd2.scd2_history_for_keys(
        spark, qd, spark.createDataFrame([(1,), (2,), (3,)], "id long")
    )
    assert sorted(tuple(r) for r in kf.collect()) == sorted(
        tuple(r)
        for r in scd2.scd2_history_for_keys(
            spark, pd_, spark.createDataFrame([(1,), (2,), (3,)], "id long")
        ).collect()
    )
    for b in (0, 1):
        assert sorted(
            tuple(r) for r in scd2.scd2_as_of(spark, qd, b).collect()
        ) == sorted(tuple(r) for r in scd2.scd2_as_of(spark, pd_, b).collect())

    # compaction folds the queue physically and clears it
    scd2.scd2_compact_closed(spark, qd)
    scd2.scd2_compact_closed(spark, pd_)
    assert hist(qd) == hist(pd_)
    assert scd2._meta(qd).get("n_tombstones", 0) == 0
    assert not scd2._has_tombstones(qd)
    # post-fold, the physical bytes hold no trace of the purged keys
    purged_in_files = (
        spark.read.parquet(scd2._p(qd, "closed"))
        .filter(F.col("id").isin(2, 3))
        .count()
    )
    assert purged_in_files == 0

    # a torn fold (journal written, roll-forward crashes) is completed
    # by the next reader: queue k purges, crash the fold, read
    d3 = str(tmp_path / "torn_fold")
    scd2.scd2_init(spark, d3, n_buckets=4)
    scd2.scd2_upsert(spark, d3, creates, batch_id=0)
    scd2.scd2_upsert(spark, d3, inc1, batch_id=1)
    scd2.scd2_queue_purge(spark, d3, k12)
    want = sorted(tuple(r) for r in scd2.scd2_read_history(spark, d3).collect())
    import pytest as _pytest

    real = scd2._roll_forward

    def crash(dim_dir, sweep=False):
        raise RuntimeError("simulated crash post-journal")

    scd2._roll_forward = crash
    try:
        with _pytest.raises(RuntimeError, match="post-journal"):
            scd2.scd2_purge_keys(spark, d3, None)
    finally:
        scd2._roll_forward = real
    assert _os.path.exists(scd2._p(d3, scd2._JOURNAL))
    assert (
        sorted(tuple(r) for r in scd2.scd2_read_history(spark, d3).collect())
        == want
    )
    assert scd2._meta(d3).get("n_tombstones", 0) == 0


def test_scd2_tombstones_compose_with_expiry_and_rebucket(spark, tmp_path):
    """A queued (unfolded) erasure must survive every other
    maintenance writer: expiry rewrites closed/ and rebucketing
    rewrites current/ while tombstones are still queued — reads keep
    hiding the queued keys throughout, and the eventual compaction
    fold leaves exactly the expired+purged history."""
    import datetime as dt

    from datapipe_spark.operators import scd2

    d = str(tmp_path / "compose")
    schema = (
        "id long, user_id long, status string, total_amount string, "
        "created_at timestamp, __op string, __ts_ms timestamp, __source_lsn long"
    )
    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)  # noqa: E731
    creates = spark.createDataFrame(
        [(i, i * 10, "A", "5.00", t(0), "c", t(i), i) for i in range(1, 9)],
        schema,
    )
    updates = spark.createDataFrame(
        [(i, i * 10, "B", "6.00", t(0), "u", t(30 + i), 100 + i) for i in range(1, 9)],
        schema,
    )
    scd2.scd2_init(spark, d, n_buckets=4)
    scd2.scd2_upsert(spark, d, creates, batch_id=0)
    scd2.scd2_upsert(spark, d, updates, batch_id=1)

    scd2.scd2_queue_purge(spark, d, spark.createDataFrame([(3,)], "id long"))

    def ids(df):
        return sorted(r["id"] for r in df.collect())

    # closed rows: creates 1..8 closed at t(31..38); expire the first 4
    scd2.scd2_expire_closed(spark, d, t(35))
    hist = scd2.scd2_read_history(spark, d)
    pre_rebucket_ids = ids(hist)  # materialize BEFORE the next rewrite
    assert 3 not in pre_rebucket_ids, "queued key visible after expiry rewrite"
    # keys 1-4's closed versions expired (valid_to < t(35)); key 3 hidden
    assert ids(hist.filter("is_current")) == [1, 2, 4, 5, 6, 7, 8]
    assert ids(hist.filter("NOT is_current")) == [5, 6, 7, 8]

    scd2.scd2_rebucket(spark, d, 8)
    hist2 = scd2.scd2_read_history(spark, d)
    assert ids(hist2) == pre_rebucket_ids, "rebucket changed visible history"
    assert scd2._meta(d)["n_tombstones"] == 1, "rebucket must not drop the queue"

    want = sorted(tuple(r) for r in hist2.collect())
    scd2.scd2_compact_closed(spark, d)  # folds the queue
    assert scd2._meta(d).get("n_tombstones", 0) == 0
    assert sorted(tuple(r) for r in scd2.scd2_read_history(spark, d).collect()) == want
    # post-fold, key 3 is physically gone from both slices
    for part in ("current", "closed"):
        assert (
            spark.read.parquet(scd2._p(d, part)).filter("id = 3").count() == 0
        ), part


def test_scd2_writer_lease_blocks_second_writer(spark, tmp_path):
    """r10 verdict ask #8: the single-writer-per-store contract is now
    ENFORCED — a second writer finding a live lease raises and the
    store is untouched; a stale lease (dead holder pid, or TTL
    exceeded) is stolen and the writer proceeds; in-process writer
    composition re-enters its own lease instead of deadlocking."""
    import json as _json
    import os as _os
    import subprocess
    import time as _time

    import pytest as _pytest

    from datapipe_spark.operators import lease, scd2

    d = str(tmp_path / "leased")
    _mini_store(spark, scd2, d)
    before = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}

    # a live foreign holder: a real sleeping process, fresh lease
    holder = subprocess.Popen(["sleep", "60"])
    try:
        with open(lease._lease_path(d), "w") as f:
            _json.dump(
                {"pid": holder.pid, "token": "other", "acquired": _time.time()},
                f,
            )
        with _pytest.raises(lease.StoreLockedError, match="live writer"):
            scd2.scd2_purge_keys(
                spark, d, spark.createDataFrame([(1,)], "id long")
            )
        got = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
        assert got == before, "a blocked writer must not touch the store"

        # TTL arm: same live holder, but the lease is past the horizon
        _os.utime(lease._lease_path(d), (0, 0))
        scd2.scd2_purge_keys(spark, d, spark.createDataFrame([(1,)], "id long"))
        assert scd2.scd2_lookup(spark, d, [1]).count() == 0
    finally:
        holder.kill()
        holder.wait()

    # dead-pid arm: holder process is gone → lease stolen immediately
    with open(lease._lease_path(d), "w") as f:
        _json.dump(
            {"pid": holder.pid, "token": "other", "acquired": _time.time()}, f
        )
    scd2.scd2_purge_keys(spark, d, spark.createDataFrame([(5,)], "id long"))
    assert scd2.scd2_lookup(spark, d, [5]).count() == 0
    assert not _os.path.exists(lease._lease_path(d)), "lease released after"

    # reentrancy: nested acquires share the token; file drops at depth 0
    t1 = lease.acquire(d)
    t2 = lease.acquire(d)
    assert t1 == t2
    lease.release(d, t2)
    assert _os.path.exists(lease._lease_path(d))
    lease.release(d, t1)
    assert not _os.path.exists(lease._lease_path(d))


def test_scd2_lease_thread_ownership_and_steal_verify(tmp_path):
    """r11 advisory (lease): (a) a second THREAD of the same process is
    a concurrent writer, not a reentrant call — acquire raises
    ``StoreLockedError`` while the owning thread holds, and succeeds
    after release; (b) the stale-steal path re-verifies the tombstone's
    token after the rename, so a lease that changed hands between the
    staleness read and the rename (stale holder released, NEW writer
    acquired) is restored intact instead of being destroyed — the
    two-concurrent-writers window is closed."""
    import json as _json
    import os as _os
    import subprocess
    import threading
    import time as _time

    import pytest as _pytest

    from datapipe_spark.operators import lease

    d = str(tmp_path / "thr")
    _os.makedirs(d)

    # (a) cross-thread acquire is a concurrent writer
    t1 = lease.acquire(d)
    seen: list[str] = []

    def second():
        try:
            lease.acquire(d)
            seen.append("acquired")
        except lease.StoreLockedError:
            seen.append("locked")

    th = threading.Thread(target=second)
    th.start()
    th.join()
    assert seen == ["locked"], "a second thread must not co-hold the lease"
    lease.release(d, t1)

    got: list[str] = []

    def third():
        tok = lease.acquire(d)
        got.append(tok)
        lease.release(d, tok)

    th = threading.Thread(target=third)
    th.start()
    th.join()
    assert got and not _os.path.exists(lease._lease_path(d))

    # (b) TOCTOU on steal: the lease changes hands between the
    # staleness read and the rename — simulate the handover inside a
    # patched os.rename, scoped to this lease path only
    holder = subprocess.Popen(["sleep", "60"])
    try:
        path = lease._lease_path(d)
        with open(path, "w") as f:
            _json.dump({"pid": 999_999_999, "token": "stale", "acquired": 0.0}, f)
        real_rename = _os.rename
        fired = {"n": 0}

        def handover_rename(src, dst):
            if src == path and fired["n"] == 0:
                fired["n"] = 1
                with open(path, "w") as f:
                    _json.dump(
                        {"pid": holder.pid, "token": "newholder",
                         "acquired": _time.time()},
                        f,
                    )
            real_rename(src, dst)

        _os.rename = handover_rename
        try:
            with _pytest.raises(lease.StoreLockedError, match="live writer"):
                lease.acquire(d)
        finally:
            _os.rename = real_rename
        with open(path) as f:
            assert _json.load(f)["token"] == "newholder", (
                "the new holder's live lease must be restored, not removed"
            )

        # (c) torn tombstone: the lease changed hands to a holder whose
        # body is still mid-write (unparseable) — restore it, never
        # remove it; the stuck-churn exit leaves the file in place
        with open(path, "w") as f:
            _json.dump({"pid": 999_999_999, "token": "stale", "acquired": 0.0}, f)
        fired["n"] = 0

        def torn_rename(src, dst):
            if src == path and fired["n"] == 0:
                fired["n"] = 1
                with open(path, "w") as f:
                    f.write("{torn")  # new holder's write not yet complete
            real_rename(src, dst)

        _os.rename = torn_rename
        try:
            with _pytest.raises(lease.StoreLockedError):
                lease.acquire(d)
        finally:
            _os.rename = real_rename
        assert _os.path.exists(path), "a torn lease must be restored"

        # (d) restore must never clobber a THIRD writer's fresh lease
        # that landed between the rename-away and the restore
        with open(path, "w") as f:
            _json.dump({"pid": 999_999_999, "token": "stale", "acquired": 0.0}, f)
        fired["n"] = 0

        def third_writer_rename(src, dst):
            if src == path and fired["n"] == 0:
                fired["n"] = 1
                with open(path, "w") as f:
                    _json.dump(
                        {"pid": holder.pid, "token": "newholder",
                         "acquired": _time.time()},
                        f,
                    )
                real_rename(src, dst)
                with open(path, "w") as f:  # third writer wins path
                    _json.dump(
                        {"pid": holder.pid, "token": "third",
                         "acquired": _time.time()},
                        f,
                    )
                return
            real_rename(src, dst)

        _os.rename = third_writer_rename
        try:
            with _pytest.raises(lease.StoreLockedError, match="live writer"):
                lease.acquire(d)
        finally:
            _os.rename = real_rename
        with open(path) as f:
            assert _json.load(f)["token"] == "third", (
                "the restore must not overwrite the third writer's lease"
            )
    finally:
        holder.kill()
        holder.wait()
        _os.remove(lease._lease_path(d))


_LEASE_RACE_WRITER = """
import os, sys, time, datetime as dt
from pyspark.sql import SparkSession
sys.path.insert(0, "/root/repo")
from datapipe_spark.operators import scd2, lease

store, scratch, role = sys.argv[1], sys.argv[2], sys.argv[3]
spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"lease-race-{role}")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
schema = (
    "id long, user_id long, status string, total_amount string, "
    "created_at timestamp, __op string, __ts_ms timestamp, __source_lsn long"
)
t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)
updates = spark.createDataFrame(
    [(1, 10, "B", "6.00", t(0), "u", t(10), 101),
     (2, 20, "C", "7.00", t(0), "u", t(11), 102)], schema)
deletes = spark.createDataFrame(
    [(3, 30, "X", "0.00", t(0), "d", t(12), 103)], schema)

def wait_for(name, deadline=120.0):
    end = time.time() + deadline
    while time.time() < end:
        if os.path.exists(os.path.join(scratch, name)):
            return
        time.sleep(0.05)
    raise TimeoutError(name)

def mark(name):
    open(os.path.join(scratch, name), "w").close()

if role == "A":
    # the composition API: one job holding the writer lease across its
    # critical section, with a REAL writer entry re-entering it
    with lease.writer_lease(store):
        mark("A_HOLDING")
        wait_for("B_LOCKED")
        scd2.scd2_upsert(spark, store, updates, batch_id=1)
    mark("A_DONE")
    print("A_APPLIED", flush=True)
else:
    wait_for("A_HOLDING")
    try:
        scd2.scd2_upsert(spark, store, deletes, batch_id=2)
        print("B_UNEXPECTED_SUCCESS", flush=True)
        sys.exit(3)
    except lease.StoreLockedError:
        print("B_LOCKED_OK", flush=True)
    mark("B_LOCKED")
    wait_for("A_DONE")
    scd2.scd2_upsert(spark, store, deletes, batch_id=2)
    print("B_APPLIED", flush=True)
spark.stop()
"""


def test_scd2_lease_two_process_race_and_dead_holder_steal(spark, tmp_path):
    """r11 verdict ask #4 — the writer lease under REAL concurrency:
    two separate Spark driver processes race writer entries on one
    store. The process that finds the live lease raises
    ``StoreLockedError`` and touches nothing; after the holder
    releases, its retry applies cleanly, and the final history is
    hash-identical to the sequential build. Then the steal path with a
    genuinely dead cross-process holder: a third process acquires the
    lease and is SIGKILLed mid-hold; the next writer steals the
    dead-pid lease and proceeds."""
    import datetime as dt
    import signal
    import subprocess
    import sys
    import time as _time

    from datapipe_spark.operators import lease, scd2

    d = str(tmp_path / "raced")
    scratch = str(tmp_path / "scratch")
    os.makedirs(scratch)
    schema = (
        "id long, user_id long, status string, total_amount string, "
        "created_at timestamp, __op string, __ts_ms timestamp, __source_lsn long"
    )
    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)  # noqa: E731
    creates = spark.createDataFrame(
        [(i, i * 10, "A", "5.00", t(0), "c", t(i), i) for i in range(1, 7)],
        schema,
    )
    scd2.scd2_init(spark, d, n_buckets=4)
    scd2.scd2_upsert(spark, d, creates, batch_id=0)

    # expected end state: the same increments applied sequentially
    ref = str(tmp_path / "ref")
    scd2.scd2_init(spark, ref, n_buckets=4)
    scd2.scd2_upsert(spark, ref, creates, batch_id=0)
    updates = spark.createDataFrame(
        [(1, 10, "B", "6.00", t(0), "u", t(10), 101),
         (2, 20, "C", "7.00", t(0), "u", t(11), 102)], schema)
    deletes = spark.createDataFrame(
        [(3, 30, "X", "0.00", t(0), "d", t(12), 103)], schema)
    scd2.scd2_upsert(spark, ref, updates, batch_id=1)
    scd2.scd2_upsert(spark, ref, deletes, batch_id=2)
    want = {tuple(r) for r in scd2.scd2_read_history(spark, ref).collect()}

    pa = subprocess.Popen(
        [sys.executable, "-c", _LEASE_RACE_WRITER, d, scratch, "A"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd="/root/repo",
    )
    pb = subprocess.Popen(
        [sys.executable, "-c", _LEASE_RACE_WRITER, d, scratch, "B"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd="/root/repo",
    )
    out_a, err_a = pa.communicate(timeout=300)
    out_b, err_b = pb.communicate(timeout=300)
    assert pa.returncode == 0, f"A failed:\n{out_a}\n{err_a[-3000:]}"
    assert pb.returncode == 0, f"B failed:\n{out_b}\n{err_b[-3000:]}"
    assert "A_APPLIED" in out_a
    assert "B_LOCKED_OK" in out_b and "B_APPLIED" in out_b
    got = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
    assert got == want, "raced store must equal the sequential build"

    # dead-holder steal: a third process acquires and dies mid-hold
    holder = subprocess.Popen(
        [
            sys.executable, "-c",
            "import sys, time; sys.path.insert(0, '/root/repo'); "
            "from datapipe_spark.operators import lease; "
            f"lease.acquire({d!r}); print('HELD', flush=True); time.sleep(120)",
        ],
        stdout=subprocess.PIPE, text=True,
    )
    deadline = _time.time() + 60
    while _time.time() < deadline:
        if os.path.exists(lease._lease_path(d)):
            break
        _time.sleep(0.05)
    assert os.path.exists(lease._lease_path(d)), holder.stdout
    holder.send_signal(signal.SIGKILL)
    holder.wait()
    # next writer steals the dead-pid lease and proceeds
    reinsert = spark.createDataFrame(
        [(3, 30, "A", "5.00", t(0), "c", t(20), 201)], schema)
    scd2.scd2_upsert(spark, d, reinsert, batch_id=3)
    assert scd2.scd2_lookup(spark, d, [3]).count() == 1
    assert not os.path.exists(lease._lease_path(d)), "lease released after"


def test_recovery_guard_serializes_blocks_and_is_independent(tmp_path):
    """r12 review: journal replay runs under a dedicated recovery lock
    (readers roll forward too and never hold the writer lease). The
    guard must (a) BLOCK a second acquirer until release — recovery is
    fast, so waiting beats failing a probe — (b) release its file, and
    (c) be independent of the writer lease (a writer holding the store
    lease takes the recovery lock without deadlock, the nested-call
    shape of every journaled writer entry)."""
    import os as _os
    import threading
    import time as _time

    from datapipe_spark.operators import lease

    d = str(tmp_path / "rg")
    _os.makedirs(d)
    order = []
    with lease.recovery_guard(d):
        assert _os.path.exists(lease._lease_path(d, lease.RECOVERY_LOCK))

        def second():
            with lease.recovery_guard(d, timeout_seconds=30):
                order.append("second")

        th = threading.Thread(target=second)
        th.start()
        _time.sleep(0.3)
        order.append("first-releasing")
    th.join(30)
    assert order == ["first-releasing", "second"]
    assert not _os.path.exists(lease._lease_path(d, lease.RECOVERY_LOCK))

    # independence from the writer lease: the nested writer shape
    t = lease.acquire(d)
    with lease.recovery_guard(d):
        assert _os.path.exists(lease._lease_path(d, lease.RECOVERY_LOCK))
    lease.release(d, t)
    assert not _os.path.exists(lease._lease_path(d))


def test_scd2_precbucket_closed_rows_survive_keyed_reads_and_heal(
    spark, tmp_path
):
    """r11 advisory (medium): closed files written before the
    ``cbucket`` column read back null under the explicit schema — the
    keyed history read must keep those rows (IS NULL pruning arm), and
    a closed rewrite (compaction) must HEAL the column by recomputing
    it from the key, never persist the null."""
    import os as _os
    import shutil as _sh

    from pyspark.sql import functions as F

    from datapipe_spark.operators import scd2

    d = str(tmp_path / "precb")
    _mini_store(spark, scd2, d)
    keys = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    want_hist = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
    want_keyed = {
        tuple(r) for r in scd2.scd2_history_for_keys(spark, d, keys).collect()
    }
    assert any(not r[6] for r in want_keyed), "fixture must have closed rows"

    # simulate the pre-cbucket store: rewrite closed/ without the column
    closed_root = scd2._p(d, "closed")
    legacy_out = str(tmp_path / "legacy_closed")
    spark.read.parquet(closed_root).drop("cbucket").coalesce(1).write.mode(
        "overwrite"
    ).parquet(legacy_out)
    _sh.rmtree(closed_root)
    _os.makedirs(closed_root)
    for i, n in enumerate(sorted(_os.listdir(legacy_out))):
        if n.endswith(".parquet"):
            _sh.copy(
                _os.path.join(legacy_out, n),
                _os.path.join(closed_root, f"legacy-{i}.parquet"),
            )

    got_keyed = {
        tuple(r) for r in scd2.scd2_history_for_keys(spark, d, keys).collect()
    }
    assert got_keyed == want_keyed, (
        "null-backfilled cbucket rows must not be dropped from keyed reads"
    )
    assert {
        tuple(r) for r in scd2.scd2_read_history(spark, d).collect()
    } == want_hist

    # compaction heals: every closed row comes out with the recomputed
    # fixed-modulus cbucket, and the keyed read (now IN-pruned) agrees
    scd2.scd2_compact_closed(spark, d)
    healed = spark.read.parquet(closed_root)
    assert "cbucket" in healed.columns
    expect = F.pmod(
        F.xxhash64("id"), F.lit(scd2.SCD2_CLOSED_KEY_BUCKETS)
    ).cast("int")
    assert (
        healed.filter(
            F.col("cbucket").isNull() | (F.col("cbucket") != expect)
        ).count()
        == 0
    ), "rewrite must recompute cbucket for legacy rows"
    assert {
        tuple(r) for r in scd2.scd2_history_for_keys(spark, d, keys).collect()
    } == want_keyed


def test_scd2_evolved_column_name_collision_rejected(spark, tmp_path):
    """r11 advisory (low): an increment attribute named like a
    store-internal column (``bucket``, ``inc``, ``cbucket``,
    ``valid_from``, ...) must be rejected up front — accepting it
    would duplicate a column in the store DDL and corrupt meta
    irreversibly."""
    import datetime as dt

    import pytest as _pytest
    from pyspark.sql import functions as F

    from datapipe_spark.operators import scd2

    d = str(tmp_path / "collide")
    _mini_store(spark, scd2, d)
    want = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
    schema = (
        "id long, user_id long, status string, total_amount string, "
        "created_at timestamp, __op string, __ts_ms timestamp, __source_lsn long"
    )
    t0 = dt.datetime(2024, 1, 1)
    for bad in ("bucket", "inc", "cbucket", "valid_from", "_written_inc"):
        inc = spark.createDataFrame(
            [(1, 10, "Z", "9.00", t0, "u", t0, 999)], schema
        ).withColumn(bad, F.lit(1))
        with _pytest.raises(ValueError, match="collides"):
            scd2.scd2_upsert(spark, d, inc, batch_id=2)
    meta = scd2._meta(d)
    assert meta.get("extra_cols", []) == [], "no collision may reach meta"
    assert meta["last_batch_id"] == 1, "rejected increments advance nothing"
    assert {
        tuple(r) for r in scd2.scd2_read_history(spark, d).collect()
    } == want


def test_scd2_purge_closed_rewrite_prunes_to_touched_files(spark, tmp_path):
    """r10 verdict ask #1: once compaction clusters ``closed/`` on
    ``(cbucket, inc)``, a small purge backlog rewrites ONLY the files
    whose cbucket footer range intersects the purged keys' cbuckets.
    Untouched files must remain byte-identical at the same path, the
    touched originals must be gone, and the surviving history must be
    exactly the pre-purge history minus the purged keys."""
    import datetime as dt
    import hashlib
    import os as _os

    from datapipe_spark.operators import scd2

    d = str(tmp_path / "pruned_purge")
    schema = (
        "id long, user_id long, status string, total_amount string, "
        "created_at timestamp, __op string, __ts_ms timestamp, __source_lsn long"
    )
    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)  # noqa: E731
    n = 400
    creates = spark.createDataFrame(
        [(i, i * 10, "A", "5.00", t(0), "c", t(1), i) for i in range(1, n + 1)],
        schema,
    )
    updates = spark.createDataFrame(
        [(i, i * 10, "B", "6.00", t(0), "u", t(2), 10_000 + i) for i in range(1, n + 1)],
        schema,
    )
    scd2.scd2_init(spark, d, n_buckets=4)
    scd2.scd2_upsert(spark, d, creates, batch_id=0)
    scd2.scd2_upsert(spark, d, updates, batch_id=1)
    # tiny file target → many narrow-cbucket files after clustering
    scd2.scd2_compact_closed(spark, d, target_bytes=2048)
    closed_root = scd2._p(d, "closed")
    files = sorted(
        f for f in _os.listdir(closed_root) if f.endswith(".parquet")
    )
    assert len(files) >= 4, "fixture must split closed/ into several files"

    def _md5(p):
        with open(p, "rb") as fh:
            return hashlib.md5(fh.read()).hexdigest()

    before_hashes = {f: _md5(_os.path.join(closed_root, f)) for f in files}
    before = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}

    purge_id = 7
    cb = [
        r[0]
        for r in spark.range(1).select(
            F.pmod(F.xxhash64(F.lit(purge_id).cast("long")),
                   F.lit(scd2.SCD2_CLOSED_KEY_BUCKETS)).cast("int")
        ).collect()
    ]
    touched = {
        _os.path.basename(p)
        for p in scd2._closed_files_touching(closed_root, sorted(cb))
    }
    untouched = set(files) - touched
    assert touched, "purged key must touch at least one file"
    assert untouched, "pruning is vacuous if every file is touched"

    scd2.scd2_purge_keys(spark, d, spark.createDataFrame([(purge_id,)], "id long"))

    after_files = {
        f for f in _os.listdir(closed_root) if f.endswith(".parquet")
    }
    for f in untouched:
        assert f in after_files, f"untouched file {f} must survive the purge"
        assert _md5(_os.path.join(closed_root, f)) == before_hashes[f], (
            f"untouched file {f} must be byte-identical across the purge"
        )
    for f in touched:
        assert f not in after_files, f"touched file {f} must be replaced"
    got = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
    assert got == {r for r in before if r[0] != purge_id}


def test_scd2_purge_above_broadcast_gate_still_exact(spark, tmp_path, monkeypatch):
    """A purge backlog past the broadcast gate must fall back to a
    shuffle anti-join (no forced driver broadcast) and still erase
    exactly the requested keys."""
    from datapipe_spark.operators import scd2

    monkeypatch.setattr(scd2, "SCD2_BROADCAST_MAX_ROWS", 0)
    d = str(tmp_path / "purge_big")
    _mini_store(spark, scd2, d)
    before = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
    scd2.scd2_purge_keys(spark, d, spark.createDataFrame([(1,), (5,)], "id long"))
    got = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
    assert got == {t for t in before if t[0] not in (1, 5)}


def test_scd2_expire_closed_retention_semantics(spark, tmp_path, monkeypatch):
    """History retention: closed versions ending before the horizon
    disappear; open rows and in-horizon closed rows are untouched; the
    watermark is unmoved (expiry is not an increment); re-expiry is a
    no-op; time travel still reconstructs every RETAINED version; a
    torn commit is completed by the next reader."""
    import datetime as dt
    import os as _os

    from datapipe_spark.operators import scd2

    d = str(tmp_path / "expire")
    _mini_store(spark, scd2, d)
    before = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
    cutoff = dt.datetime(2024, 1, 1, 0, 11)

    stats = scd2.scd2_expire_closed(spark, d, cutoff)
    assert stats == {"expired_versions": 1}  # key 1's create, closed 00:10
    got = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
    assert got == {t for t in before if t[5] is None or t[5] >= cutoff}
    assert scd2._meta(d)["last_batch_id"] == 1

    # idempotent at the same horizon
    assert scd2.scd2_expire_closed(spark, d, cutoff) == {"expired_versions": 0}

    # time travel: retained versions reconstruct, expired ones are gone
    asof0 = scd2.scd2_as_of(spark, d, 0)
    assert asof0.filter("id = 1").count() == 0  # expired out of history
    assert asof0.filter("id = 2 AND status = 'A'").count() == 1  # retained

    # a store with no closed slice: no-op
    d2 = str(tmp_path / "expire_open")
    scd2.scd2_init(spark, d2, n_buckets=4)
    assert scd2.scd2_expire_closed(spark, d2, cutoff) == {"expired_versions": 0}

    # torn commit: journal lands, roll-forward crashes — reader completes
    d3 = str(tmp_path / "expire_torn")
    _mini_store(spark, scd2, d3)
    want3 = {
        t
        for t in {tuple(r) for r in scd2.scd2_read_history(spark, d3).collect()}
        if t[5] is None or t[5] >= cutoff
    }

    def crash(dim_dir, sweep=False):
        raise RuntimeError("simulated crash post-journal")

    monkeypatch.setattr(scd2, "_roll_forward", crash)
    with pytest.raises(RuntimeError, match="post-journal"):
        scd2.scd2_expire_closed(spark, d3, cutoff)
    monkeypatch.undo()
    assert _os.path.exists(scd2._p(d3, scd2._JOURNAL))
    assert {tuple(r) for r in scd2.scd2_read_history(spark, d3).collect()} == want3
    assert not _os.path.exists(scd2._p(d3, scd2._JOURNAL))


def test_scd2_expiry_interleaved_with_upserts(spark, tmp_path):
    """Retention DURING ingestion: an expiry between increments
    removes exactly the versions out-of-horizon AT THAT MOMENT;
    later increments keep applying (the watermark is untouched) and
    versions they close are retained even when their event-time end
    predates the horizon — retention is a maintenance pass over the
    store as it stood, not a standing filter."""
    import datetime as dt

    from datapipe_spark.operators import scd2

    schema = (
        "id long, user_id long, status string, total_amount string, "
        "created_at timestamp, __op string, __ts_ms timestamp, __source_lsn long"
    )
    t = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)  # noqa: E731
    d = str(tmp_path / "expire_inter")
    scd2.scd2_init(spark, d, n_buckets=4)
    creates = spark.createDataFrame(
        [(i, i * 10, "A", "5.00", t(0), "c", t(i), i) for i in range(1, 5)], schema
    )
    scd2.scd2_upsert(spark, d, creates, batch_id=0)
    # close keys 1 and 2 early (valid_to 00:05 / 00:06)
    upd = spark.createDataFrame(
        [
            (1, 10, "B", "6.00", t(0), "u", t(5), 101),
            (2, 20, "B", "6.00", t(0), "u", t(6), 102),
        ],
        schema,
    )
    scd2.scd2_upsert(spark, d, upd, batch_id=1)

    pre = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
    cutoff = t(6)  # expires key 1's create (ended 00:05), keeps key 2's
    assert scd2.scd2_expire_closed(spark, d, cutoff) == {"expired_versions": 1}
    expired = {p for p in pre if p[5] is not None and p[5] < cutoff}
    assert len(expired) == 1

    # a LATE increment closes key 3's create with an event-time end
    # BEFORE the horizon — retained, because expiry already ran
    late = spark.createDataFrame(
        [(3, 30, "C", "7.00", t(0), "u", t(4), 103)], schema
    )
    assert scd2.scd2_upsert(spark, d, late, batch_id=2) is True

    final = {tuple(r) for r in scd2.scd2_read_history(spark, d).collect()}
    # key 3's create now closed at 00:04 (< cutoff) yet present
    assert any(r[0] == 3 and r[5] == t(4) for r in final)
    # the expired version stayed gone; everything else from pre either
    # survived verbatim or was re-chained by the late increment
    assert not expired & final
    assert scd2._meta(d)["last_batch_id"] == 2
    # a second expiry pass at the same horizon now retires the
    # late-closed version too — the scheduled-cadence model
    assert scd2.scd2_expire_closed(spark, d, cutoff) == {"expired_versions": 1}
    assert not any(
        r[0] == 3 and r[5] == t(4)
        for r in {tuple(x) for x in scd2.scd2_read_history(spark, d).collect()}
    )


def test_scd2_expire_all_closed_leaves_open_history_intact(spark, tmp_path):
    """The expire-everything branch: a horizon past every closed
    version empties closed/ entirely — open rows survive untouched,
    reads and time travel still work (current-only history, the same
    state as a never-updated store)."""
    import datetime as dt

    from datapipe_spark.operators import scd2

    d = str(tmp_path / "exp_all")
    _mini_store(spark, scd2, d)
    far = dt.datetime(2030, 1, 1)
    stats = scd2.scd2_expire_closed(spark, d, far)
    assert stats["expired_versions"] == 3  # creates of keys 1, 2, 3
    hist = scd2.scd2_read_history(spark, d).collect()
    assert len(hist) == 5 and all(r["valid_to"] is None for r in hist)
    assert scd2.scd2_as_of(spark, d, 0).count() > 0  # travel still runs
    assert scd2.scd2_expire_closed(spark, d, far) == {"expired_versions": 0}
