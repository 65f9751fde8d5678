"""Property-based tests (hypothesis) for the two stateful cores.

SURVEY §5: the reference's strongest correctness ideas are the CDC
round-trip (#2) and cross-representation consistency (#4). Here they
become properties over arbitrary inputs: snapshot compaction must equal
sequentially applying the ops, and gap-and-island sessionization must
match a brute-force model.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datapipe_spark.plans.events_queries import sessionize_frame
from datapipe_spark.sources.cdc import compact_latest
from datapipe_spark.streaming.sessions import make_session_fn

BASE_TS = datetime.datetime(2024, 1, 1)

# --- CDC compaction property -------------------------------------------------

ops = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),  # key
        st.sampled_from(["c", "u", "d"]),  # op
        st.integers(min_value=0, max_value=999),  # payload
    ),
    min_size=0,
    max_size=40,
)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(op_seq=ops)
def test_compaction_equals_sequential_apply(spark_prop, op_seq):
    rows = [
        (key, op, payload, lsn) for lsn, (key, op, payload) in enumerate(op_seq, start=1)
    ]
    # model: apply ops in LSN order; delete removes the key
    model: dict[int, tuple] = {}
    for key, op, payload, lsn in rows:
        if op == "d":
            model.pop(key, None)
        else:
            model[key] = (key, op, payload, lsn)
    if rows:
        df = spark_prop.createDataFrame(
            rows, "id long, __op string, payload long, __source_lsn long"
        )
        got = {
            r["id"]: (r["id"], r["__op"], r["payload"], r["__source_lsn"])
            for r in compact_latest(df).collect()
        }
    else:
        got = {}
    # compaction keeps the newest non-delete version per key... but a
    # key whose newest op is 'd' must be gone entirely
    expect = {
        k: v
        for k, v in (
            (k, max((r for r in rows if r[0] == k), key=lambda r: r[3]))
            for k in {r[0] for r in rows}
        )
        if v[1] != "d"
    }
    assert got == expect
    # and the kept versions are exactly the model's live rows for keys
    # whose final op isn't a delete-then-reinsert edge case
    for k, v in got.items():
        assert model.get(k) == v or model.get(k) is None


# --- sessionization property -------------------------------------------------

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user
        st.integers(min_value=0, max_value=400),  # minutes offset
        st.sampled_from(["view", "click", "purchase"]),
    ),
    min_size=1,
    max_size=30,
)


def _brute_sessions(evs, gap_min=30):
    """Brute-force model: per user, sort by ts, split on gap > 30 min."""
    out = []
    by_user: dict[int, list] = {}
    for i, (u, m, t) in enumerate(evs):
        by_user.setdefault(u, []).append((m, i, t))
    for u, items in by_user.items():
        items.sort()
        sessions, cur = [], [items[0]]
        for prev, nxt in zip(items, items[1:]):
            if (nxt[0] - prev[0]) > gap_min:
                sessions.append(cur)
                cur = []
            cur.append(nxt)
        sessions.append(cur)
        for seq, s in enumerate(sessions):
            out.append(
                (u, seq, s[0][0], s[-1][0], len(s), sum(1 for e in s if e[2] == "purchase"))
            )
    return sorted(out)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(evs=events_strategy)
def test_sessionize_matches_brute_force(spark_prop, evs):
    rows = [
        (u, BASE_TS + datetime.timedelta(minutes=m), i, t, 10.0)
        for i, (u, m, t) in enumerate(evs)
    ]
    df = spark_prop.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string, value double"
    )
    got = sorted(
        (
            r["user_id"],
            r["session_seq"],
            int((r["session_start"] - BASE_TS).total_seconds() // 60),
            int((r["session_end"] - BASE_TS).total_seconds() // 60),
            r["n_events"],
            r["purchases"],
        )
        for r in sessionize_frame(df).collect()
    )
    assert got == _brute_sessions(evs)


# --- session state machine unit coverage ------------------------------------


class FakeState:
    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        if self._v is None:
            raise ValueError("no state")
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v, self.removed = None, True

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def _pdf(rows):
    import pandas as pd

    return pd.DataFrame(
        rows, columns=["user_id", "ts", "event_id", "event_type", "value"]
    ).astype({"ts": "datetime64[ns]"})


def test_state_fn_splits_on_gap_and_carries_seq():
    fn = make_session_fn(30)
    state = FakeState()
    t0 = BASE_TS
    batch1 = _pdf(
        [
            (1, t0, 0, "view", None),
            (1, t0 + datetime.timedelta(minutes=5), 1, "purchase", 12.31),
        ]
    )
    assert list(fn((1,), [batch1], state)) == []  # session still open
    assert state.exists and state.get[0] == 0  # seq 0 open
    batch2 = _pdf([(1, t0 + datetime.timedelta(minutes=90), 2, "click", None)])
    out = list(fn((1,), [batch2], state))  # gap 85 min → close seq 0
    assert len(out) == 1 and out[0].iloc[0]["session_seq"] == 0
    assert out[0].iloc[0]["n_events"] == 2
    assert abs(out[0].iloc[0]["total_spent"] - 12.31) < 1e-9
    assert state.get[0] == 1  # seq 1 now open


def test_state_fn_timeout_closes_open_session():
    """T2 ProcessingTimeTimeout transition (realtime design.md:378-379).
    r12: the close keeps a seq-memory marker so the user's NEXT session
    continues the per-user-monotone session_seq (remove() restarted at
    seq 0, duplicating (user_id, session_seq) keys); the marker itself
    expires after SESSION_SEQ_MEMORY_GAPS further idle gaps."""
    import datapipe_spark.streaming.sessions as sess

    fn = make_session_fn(30, use_timeout=True)
    open_state = (0, 0, 5 * 60_000_000, 3, 1, 1, 1, 999)
    state = FakeState(value=open_state, timed_out=True)
    out = list(fn((7,), [], state))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert row["session_seq"] == 0 and row["n_events"] == 3
    assert abs(row["total_spent"] - 9.99) < 1e-9
    # seq memory kept, horizon armed
    assert not state.removed
    assert state.get == (1, -1, 0, 0, 0, 0, 0, 0)
    assert state.timeout_set == 30 * 60 * 1000 * sess.SESSION_SEQ_MEMORY_GAPS

    # a reconnecting user CONTINUES the sequence from the marker
    state.hasTimedOut = False
    t1 = BASE_TS + datetime.timedelta(hours=5)
    assert list(fn((7,), [_pdf([(7, t1, 9, "view", None)])], state)) == []
    assert state.get[0] == 1 and state.get[1] >= 0  # seq 1 open

    # a marker that times out AGAIN is the memory horizon: dropped
    state2 = FakeState(value=(4, -1, 0, 0, 0, 0, 0, 0), timed_out=True)
    assert list(fn((7,), [], state2)) == []
    assert state2.removed


def test_state_fn_arms_timeout_when_enabled():
    fn = make_session_fn(30, use_timeout=True)
    state = FakeState()
    list(fn((1,), [_pdf([(1, BASE_TS, 0, "view", None)])], state))
    assert state.timeout_set == 30 * 60 * 1000


# --- sequence-packing property ----------------------------------------------

pack_docs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # doc_id
        st.integers(min_value=1, max_value=700),  # n_tokens (oversize possible)
    ),
    min_size=0,
    max_size=60,
    unique_by=lambda t: t[0],
)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=pack_docs)
def test_pack_token_budget_matches_sequential_fill(spark_prop, docs):
    """The window formulation must equal the obvious sequential
    reference: walk each shard in doc_id order accumulating tokens;
    pack_id = completed-budget count before the doc."""
    from datapipe_spark.operators import decontam

    budget, shards = decontam._PACK_BUDGET, decontam._PACK_SHARDS
    df = spark_prop.createDataFrame(
        [(i, "x " * (n - 1) + "x") for i, n in docs] or [(0, "x")],
        "doc_id long, text string",
    ).limit(0 if not docs else len(docs))
    # run the same plan the operator builds, on an in-memory frame
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    n_tokens = F.size(F.split("text", " "))
    shard = (F.col("doc_id") % shards).cast("int")
    w = Window.partitionBy("shard").orderBy("doc_id")
    out = (
        df.select("doc_id", shard.alias("shard"), n_tokens.alias("n_tokens"))
        .withColumn(
            "cum_before",
            F.coalesce(
                F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .select(
            "doc_id", "shard",
            F.floor(F.col("cum_before") / budget).cast("long").alias("pack_id"),
        )
    )
    got = {r["doc_id"]: (r["shard"], r["pack_id"]) for r in out.collect()}

    expect = {}
    per_shard = {}
    for doc_id, n in sorted(docs):
        s = doc_id % shards
        cum = per_shard.get(s, 0)
        expect[doc_id] = (s, cum // budget)
        per_shard[s] = cum + n
    assert got == expect


# --- Avro binary codec: random-record round-trip (S3 jarless path) ---

_avro_value = st.fixed_dictionaries(
    {
        "a": st.one_of(st.none(), st.integers(min_value=-(2**62), max_value=2**62)),
        "b": st.text(max_size=40),
        "c": st.one_of(
            st.none(),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
        ),
        "d": st.booleans(),
        "e": st.one_of(st.none(), st.binary(max_size=32)),
    }
)

_AVRO_TEST_SCHEMA = {
    "type": "record",
    "name": "P",
    "fields": [
        {"name": "a", "type": ["null", "long"], "default": None},
        {"name": "b", "type": "string"},
        {"name": "c", "type": ["null", "double"], "default": None},
        {"name": "d", "type": "boolean"},
        {"name": "e", "type": ["null", "bytes"], "default": None},
    ],
}


@given(rec=_avro_value, sid=st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=200, deadline=None)
def test_avro_codec_roundtrip_random_records(rec, sid):
    """Every record the schema admits must survive Confluent-framed
    encode→decode byte-exactly: zigzag varints at the extremes,
    unicode strings, null union branches, IEEE doubles, raw bytes."""
    from datapipe_spark.sources.avro_py import decode_record, encode_record

    got_sid, got = decode_record(encode_record(rec, _AVRO_TEST_SCHEMA, sid), _AVRO_TEST_SCHEMA)
    assert got_sid == sid
    assert got == rec


# --- simhash band-guard property ---------------------------------------------

_GUARD_VOCAB = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta",
    "eta", "theta", "iota", "kappa", "mu", "nu",
]

_guard_corpora = st.lists(
    st.lists(st.sampled_from(_GUARD_VOCAB), min_size=3, max_size=16).map(" ".join),
    min_size=4,
    max_size=40,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_guard_corpora, cap=st.sampled_from([1, 2, 4, 8]))
def test_simhash_guard_output_is_always_true_pair_subset(spark_prop, texts, cap):
    """For ANY corpus and ANY bucket cap, the three guard levels
    (fingerprint collapse, adjacent-band sub-split, star fallback) may
    only REMOVE true pairs — never invent one, never corrupt a
    Hamming value. The tiny vocabulary forces heavy fingerprint
    collisions (level 1 active) and caps 1-8 force the sub-split and
    star levels, so every guard arm executes."""
    from datapipe_spark.operators.dedup import simhash_dedup_frame

    docs = spark_prop.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    ung = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_dedup_frame(docs, bucket_cap=10**9).collect()
    }
    forced = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_dedup_frame(docs, bucket_cap=cap).collect()
    }
    assert set(forced) <= set(ung)
    for (a, b), h in forced.items():
        assert a < b
        assert 0 <= h <= 7
        assert ung[(a, b)] == h


# --- as-of join property (vs DuckDB's native ASOF JOIN) ----------------------

asof_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),  # user
        st.integers(min_value=0, max_value=20),  # ts offset (minutes) — ties likely
        st.sampled_from(["view", "click", "purchase"]),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(evs=asof_events)
def test_purchase_attribution_matches_duckdb_asof(spark_prop, evs, tmp_path_factory):
    """The union-window as-of join must equal DuckDB's native ASOF
    LEFT JOIN on arbitrary tie-heavy event streams — two independent
    implementations of the temporal-join semantics."""
    import duckdb

    from datapipe_spark.plans.events_queries import (
        PURCHASE_ATTRIBUTION_SQL,
        purchase_attribution,
    )

    rows = [
        (i, BASE_TS + datetime.timedelta(minutes=m), u, t, float(i), "{}")
        for i, (u, m, t) in enumerate(evs, start=1)
    ]
    d = tmp_path_factory.mktemp("asof")
    spark_prop.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(d / "events.parquet"))

    got = {
        (r["event_id"], r["touch_event_id"], r["secs_since_touch"])
        for r in purchase_attribution(spark_prop, str(d)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet/*.parquet')"
    )
    want = {
        (eid, tid, secs)
        for eid, tid, secs in con.execute(
            "SELECT event_id, touch_event_id, secs_since_touch FROM ("
            + PURCHASE_ATTRIBUTION_SQL
            + ")"
        ).fetchall()
    }
    con.close()
    assert got == want


# --- ordered-funnel property -------------------------------------------------

funnel_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),  # user
        st.sampled_from(["view", "click", "purchase"]),
        st.integers(min_value=0, max_value=3600),  # seconds offset
    ),
    min_size=0,
    max_size=60,
)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(evs=funnel_events)
def test_ordered_funnel_matches_brute_force(spark_prop, evs):
    """event_funnel_frame must equal the obvious per-user model:
    first view; first click strictly after it; first purchase strictly
    after that click — including tie handling (equal timestamps never
    advance the funnel)."""
    from datapipe_spark.plans.behavior import event_funnel_frame

    day = datetime.date(2024, 1, 1)
    rows = [
        (day, user, typ, BASE_TS + datetime.timedelta(seconds=s))
        for user, typ, s in evs
    ]
    # brute-force model
    per_user: dict[int, list] = {}
    for _, user, typ, ts in rows:
        per_user.setdefault(user, []).append((ts, typ))
    viewers = clickers = purchasers = 0
    for user, seq in per_user.items():
        views = sorted(ts for ts, t in seq if t == "view")
        if not views:
            continue
        viewers += 1
        fv = views[0]
        clicks = sorted(ts for ts, t in seq if t == "click" and ts > fv)
        if not clicks:
            continue
        clickers += 1
        fc = clicks[0]
        if any(t == "purchase" and ts > fc for ts, t in seq):
            purchasers += 1

    if not rows:
        return
    df = spark_prop.createDataFrame(rows, "day date, user_id long, event_type string, ts timestamp")
    out = event_funnel_frame(df).collect()
    if viewers == 0:
        assert out == []
        return
    assert len(out) == 1
    r = out[0]
    assert (r.viewers, r.clickers, r.purchasers) == (viewers, clickers, purchasers)


# --- cross-corpus minhash probe properties -----------------------------------

cross_docs = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), min_size=0, max_size=6),
    min_size=2,
    max_size=12,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(ws=cross_docs)
def test_cross_corpus_minhash_precision_and_orientation(spark_prop, ws):
    """On arbitrary tie/dup-heavy corpora split by id parity: every
    emitted pair crosses sides, carries the EXACT shingle jaccard of
    its two documents (≥ threshold), and every verbatim cross-side
    copy (≥3 words) is found at jaccard 1.0 — the deterministic
    completeness LSH guarantees for identical signatures."""
    from datapipe_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        cross_corpus_minhash_frame,
    )

    rows = [(i, " ".join(w), i % 2 == 1) for i, w in enumerate(ws)]
    docs = spark_prop.createDataFrame(rows, "doc_id long, text string, is_new boolean")
    out = cross_corpus_minhash_frame(docs).collect()

    texts = {i: t for i, t, _ in rows}
    news = {i for i, _, n in rows if n}

    def sh(t):
        w = t.split(" ")
        return (
            {" ".join(w[i : i + 3]) for i in range(len(w) - 2)} if len(w) >= 3 else set()
        )

    for r in out:
        a, b, j = r["new_doc_id"], r["corpus_doc_id"], r["jaccard"]
        assert a in news and b not in news
        sa, sb = sh(texts[a]), sh(texts[b])
        assert sa and sb
        true_j = len(sa & sb) / len(sa | sb)
        assert abs(true_j - j) < 1e-9
        assert true_j >= JACCARD_THRESHOLD - 1e-9
    pairs = {(r["new_doc_id"], r["corpus_doc_id"]) for r in out}
    for a in news:
        for b in set(texts) - news:
            if texts[a] == texts[b] and len(texts[a].split(" ")) >= 3:
                assert (a, b) in pairs


# --- staged dedup pipeline properties ----------------------------------------

pipeline_docs = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=5),
    min_size=1,
    max_size=10,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(ws=pipeline_docs)
def test_dedup_pipeline_verbatim_completeness_model(spark_prop, ws):
    """Brute-force model on tie/dup-heavy corpora: (1) exactly one row
    per doc; (2) docs sharing text collapse to the group min as
    exact_dup (always — exact dedup has no probabilistic step);
    (3) the group min of a duplicated ≥3-word text is NEVER kept if a
    lower-id survivor shares its full shingle set (signature-identical
    ⟹ all bands collide ⟹ LSH candidate at jaccard 1.0 — the
    deterministic completeness slice of the pipeline); (4) sub-shingle
    docs (<3 words) can only be kept or exact_dup."""
    from datapipe_spark.operators.dedup import dedup_pipeline_frame

    rows = [(i, " ".join(w)) for i, w in enumerate(ws)]
    docs = spark_prop.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_pipeline_frame(docs).collect()}
    assert len(out) == len(rows)

    texts = dict(rows)
    by_text: dict[str, list[int]] = {}
    for i, t in texts.items():
        by_text.setdefault(t, []).append(i)
    for t, ids in by_text.items():
        mn = min(ids)
        for i in ids:
            if i != mn:
                assert out[i]["status"] == "exact_dup"
                assert out[i]["canonical_id"] == mn

    def sh(t):
        w = t.split(" ")
        return frozenset(
            " ".join(w[i : i + 3]) for i in range(len(w) - 2)
        ) if len(w) >= 3 else frozenset()

    survivors = sorted(min(ids) for ids in by_text.values())
    for i in survivors:
        if not sh(texts[i]):
            assert out[i]["status"] in ("kept", "exact_dup")
            continue
        same_sig = [j for j in survivors if j < i and sh(texts[j]) == sh(texts[i])]
        if same_sig:
            assert out[i]["status"] == "near_dup"
            assert out[i]["canonical_id"] <= min(same_sig)


# --- point-in-time join property ---------------------------------------------

_pit_versions = st.dictionaries(
    st.integers(min_value=1, max_value=4),  # dimension key
    st.tuples(
        st.lists(
            st.integers(min_value=0, max_value=100), min_size=1, max_size=4,
            unique=True,
        ),
        st.booleans(),  # history closed by a tombstone?
    ),
    min_size=1,
    max_size=4,
)
_pit_facts = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),  # key (5 = may miss history)
        st.integers(min_value=-5, max_value=110),  # fact ts
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(vspec=_pit_versions, facts=_pit_facts)
def test_point_in_time_join_matches_brute_force(spark_prop, vspec, facts):
    """For arbitrary non-overlapping version histories (optionally
    tombstone-closed) and arbitrary facts, the PIT join must pick
    exactly the version whose [valid_from, valid_to) window contains
    the fact ts — and null where no window does."""
    from datapipe_spark.operators.rangejoin import point_in_time_join

    versions = []  # (key, label, valid_from, valid_to|None)
    for k, (bounds, closed) in vspec.items():
        b = sorted(bounds)
        wins = [(b[i], b[i + 1]) for i in range(len(b) - 1)]
        if closed:
            # last boundary is the tombstone ts closing history; with a
            # single boundary the history is create+delete → no rows
            if not wins:
                continue
        else:
            wins.append((b[-1], None))
        for i, (vf, vt) in enumerate(wins):
            versions.append((k, f"k{k}v{i}", vf, vt))
    if not versions:
        versions = [(1, "k1v0", 0, None)]

    vdf = spark_prop.createDataFrame(
        versions, "id int, label string, valid_from int, valid_to int"
    )
    fdf = spark_prop.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(facts)], "fid int, id int, ts int"
    )
    got = {
        r["fid"]: r["label"]
        for r in point_in_time_join(fdf, vdf, key="id", fact_ts="ts").collect()
    }

    def model(k, ts):
        for kk, label, vf, vt in versions:
            if kk == k and vf <= ts and (vt is None or ts < vt):
                return label
        return None

    assert len(got) == len(facts)  # left join: every fact exactly once
    for i, (k, ts) in enumerate(facts):
        assert got[i] == model(k, ts), (k, ts, got[i], model(k, ts))


# --- int8 quantization property ----------------------------------------------

_quant_tables = st.lists(
    st.lists(
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
        ),
        min_size=3,
        max_size=3,
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(vecs=_quant_tables)
def test_quantize_int8_matches_numpy_model(spark_prop, vecs):
    """Codes and reconstruction MSE must equal a numpy reference of the
    same affine formula — including constant dimensions (span 0 → code
    -128, zero error contribution) and extreme values."""
    import numpy as np

    from datapipe_spark.operators.similarity import quantize_int8_frame

    e = spark_prop.createDataFrame(
        [(i, list(map(float, v))) for i, v in enumerate(vecs)],
        "vec_id long, v array<double>",
    )
    got = {r["vec_id"]: r for r in quantize_int8_frame(spark_prop, e).collect()}

    x = np.asarray(vecs, dtype=np.float64)
    mn, mx = x.min(axis=0), x.max(axis=0)
    span = mx - mn
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.floor((x - mn) / span * 255 + 0.5)
    q = np.where(span > 0, np.clip(q, 0, 255), 0).astype(int)
    xhat = mn + q / 255.0 * span
    mse = ((x - xhat) ** 2).sum(axis=1) / x.shape[1]

    assert set(got) == set(range(len(vecs)))
    for i in range(len(vecs)):
        assert got[i]["codes"] == ",".join(str(c - 128) for c in q[i])
        assert abs(got[i]["mse"] - mse[i]) <= 1e-9 + 1e-6 * abs(mse[i])

def test_quantize_int8_dim1024_exploded_stats_path(spark_prop):
    """r7 verdict ask #4 'Done' gate: at embedding dim 1024 the stats
    pass runs posexplode+groupBy(pos) (the flat form would be 2048
    aggregate expressions in one plan) and must equal the numpy model —
    and the two stats paths must agree exactly at a shared dim."""
    import numpy as np

    from datapipe_spark.operators import similarity as sim

    rng = np.random.default_rng(7)
    dim, n = 1024, 40
    x = np.round(rng.uniform(-50, 50, size=(n, dim)), 6)
    e = spark_prop.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(n)],
        "vec_id long, v array<double>",
    )
    assert dim > sim._INT8_FLAT_AGG_MAX_DIM
    got = {r["vec_id"]: r for r in sim.quantize_int8_frame(spark_prop, e).collect()}

    mn, mx = x.min(axis=0), x.max(axis=0)
    span = mx - mn
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.floor((x - mn) / span * 255 + 0.5)
    q = np.where(span > 0, np.clip(q, 0, 255), 0).astype(int)
    xhat = mn + q / 255.0 * span
    mse = ((x - xhat) ** 2).sum(axis=1) / dim
    for i in range(n):
        assert got[i]["codes"] == ",".join(str(c - 128) for c in q[i])
        assert abs(got[i]["mse"] - mse[i]) <= 1e-9 + 1e-6 * abs(mse[i])


def test_quantize_int8_stats_paths_agree_at_boundary(spark_prop, monkeypatch):
    """Flat-aggregate vs exploded stats must be bit-identical on the
    same frame (the dispatch is a plan-size decision, not a semantic
    one)."""
    import numpy as np

    from datapipe_spark.operators import similarity as sim

    rng = np.random.default_rng(11)
    x = np.round(rng.uniform(-5, 5, size=(25, 16)), 6)
    e = spark_prop.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, v array<double>",
    )
    flat = sorted(map(tuple, sim.quantize_int8_frame(spark_prop, e).collect()))
    monkeypatch.setattr(sim, "_INT8_FLAT_AGG_MAX_DIM", 0)
    exploded = sorted(map(tuple, sim.quantize_int8_frame(spark_prop, e).collect()))
    assert exploded == flat


def test_quantize_int8_rejects_null_and_ragged_vectors(spark_prop):
    """r7 advisory: a null first vector or ragged dimensions must fail
    fast with a clear contract error, not a mid-plan TypeError."""
    import pytest

    from datapipe_spark.operators import similarity as sim

    nulls = spark_prop.createDataFrame(
        [(0, None), (1, [1.0, 2.0])], "vec_id long, v array<double>"
    )
    with pytest.raises(ValueError, match="null vector"):
        sim.quantize_int8_frame(spark_prop, nulls)
    ragged = spark_prop.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])], "vec_id long, v array<double>"
    )
    with pytest.raises(ValueError, match="ragged"):
        sim.quantize_int8_frame(spark_prop, ragged)


# --- SCD2 incremental store property ------------------------------------------

_scd2_ops = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=6),  # key
        st.sampled_from(["c", "u", "u", "d"]),  # op (updates weighted)
        st.integers(min_value=0, max_value=99),  # payload → status/amount
    ),
    min_size=1,
    max_size=30,
)
_scd2_splits = st.lists(st.integers(min_value=1, max_value=29), max_size=3)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(op_seq=_scd2_ops, splits=_scd2_splits)
def test_scd2_store_random_increments_match_model(
    spark_prop, tmp_path_factory, op_seq, splits
):
    """Any LSN-ordered increment split applied through the store must
    equal an independent Python SCD2 model over the whole changelog:
    per key, versions chain by LSN, valid_to = next version's ts,
    delete rows bound validity but emit nothing, is_current marks the
    open non-deleted version."""
    from datapipe_spark.operators import scd2

    rows = [
        (
            key,
            key * 10,  # user_id
            f"s{payload % 5}",  # status
            str(payload) + ".25",  # total_amount (CDC string decimal)
            BASE_TS + datetime.timedelta(days=lsn - 1),  # created_at (unused)
            op,
            BASE_TS + datetime.timedelta(minutes=lsn),  # __ts_ms
            lsn,
        )
        for lsn, (key, op, payload) in enumerate(op_seq, start=1)
    ]
    schema = (
        "id long, user_id long, status string, total_amount string, "
        "created_at timestamp, __op string, __ts_ms timestamp, __source_lsn long"
    )
    # model: full chain per key in lsn order
    want = set()
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r[0], []).append(r)
    for key, krows in by_key.items():
        krows.sort(key=lambda r: r[7])
        for i, r in enumerate(krows):
            nxt = krows[i + 1][6] if i + 1 < len(krows) else None
            if r[5] == "d":
                continue
            want.add(
                (
                    r[0], r[1], r[2], float(r[3]),
                    r[6].isoformat(),
                    nxt.isoformat() if nxt else None,
                    nxt is None,  # is_current: open and not deleted
                    r[7],
                )
            )
    d = str(tmp_path_factory.mktemp("scd2_prop"))
    scd2.scd2_init(spark_prop, d)
    cuts = sorted({c for c in splits if c < len(rows)})
    bounds = [0, *cuts, len(rows)]
    for b, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
        chunk = rows[lo:hi]
        if not chunk:
            continue
        scd2.scd2_upsert(
            spark_prop, d, spark_prop.createDataFrame(chunk, schema), batch_id=b
        )
    got = {
        (
            r["id"], r["user_id"], r["status"], r["total_amount"],
            r["valid_from"].isoformat(),
            r["valid_to"].isoformat() if r["valid_to"] else None,
            r["is_current"], r["__source_lsn"],
        )
        for r in scd2.scd2_read_history(spark_prop, d).collect()
    }
    assert got == want


# --- incremental BPE trainer property ----------------------------------------

word_tables = st.dictionaries(
    st.text(
        alphabet=st.sampled_from("abcdexyz"),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=50),
    min_size=0,
    max_size=30,
)


@settings(max_examples=100, deadline=None, suppress_health_check=list(HealthCheck))
@given(words=word_tables, k=st.integers(min_value=0, max_value=64))
def test_bpe_incremental_trainer_property(words, k):
    """r9: the incremental pair-count trainer must be rank-for-rank
    identical to the full-recount reference on ARBITRARY weighted word
    tables and merge budgets — the heap lazy-deletion + delta
    bookkeeping can't diverge on any tie/collision pattern hypothesis
    finds (repeated merges into identical types, single-char words,
    pairs whose count rises back to a stale heap entry's value)."""
    from datapipe_spark.operators.textstats import (
        BPE_EOW,
        _bpe_train_driver,
        _bpe_train_driver_recount,
    )

    tt = {tuple([*w, BPE_EOW]): f for w, f in words.items()}
    assert _bpe_train_driver(dict(tt), k) == _bpe_train_driver_recount(dict(tt), k)


# --- band-index purge property ----------------------------------------------

# small synthetic corpora: a handful of content "templates" so verbatim
# groups of varying sizes arise naturally, plus random purge backlogs
# that may hit reps, whole groups, non-members, or nothing
_purge_cases = st.tuples(
    st.lists(  # doc -> template assignment (content id per doc)
        st.integers(min_value=0, max_value=4), min_size=2, max_size=12
    ),
    st.sets(st.integers(min_value=0, max_value=14), max_size=8),  # purge ids
)

_TEMPLATES = [
    "alpha beta gamma delta epsilon zeta eta theta common text one",
    "one two three four five six seven eight nine boilerplate footer",
    "a wholly different document about completely other topics here",
    "the final lonely document speaks its own words quietly tonight",
    "pack my box with five dozen liquor jugs tonight ok thanks much",
]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(case=_purge_cases)
def test_purge_minhash_random_backlog_equals_rebuild(spark, tmp_path_factory, case):
    """For ANY corpus of verbatim groups and ANY purge backlog, the
    purged never-appended index equals a fresh build over the
    survivors part-for-part — the crafted-case rebuild-equality test
    generalized by hypothesis (random rep hits, whole-group erasures,
    unknown ids, empty backlogs)."""
    from datapipe_spark.operators import dedup_index as di

    assignment, purge_ids = case
    tmp = tmp_path_factory.mktemp("purge_prop")
    corpus = spark.createDataFrame(
        [(i, _TEMPLATES[t]) for i, t in enumerate(assignment)],
        "doc_id long, text string",
    )
    idx, ref = str(tmp / "purged"), str(tmp / "ref")
    di.build_minhash_index(spark, corpus, idx)
    di.purge_minhash_index(
        spark,
        idx,
        spark.createDataFrame([(int(i),) for i in purge_ids] or [(10**9,)], "doc_id long"),
    )
    survivors = corpus.filter(~corpus.doc_id.isin([int(i) for i in purge_ids]))
    di.build_minhash_index(spark, survivors, ref)
    for p in ("mem", "sigs", "bands"):
        a = sorted(map(repr, spark.read.parquet(f"{idx}/{p}").collect()))
        b = sorted(map(repr, spark.read.parquet(f"{ref}/{p}").collect()))
        assert a == b, p


# --- snapshot lifecycle model property (r13) ---------------------------------

_snap_cmds = st.lists(
    st.one_of(
        st.tuples(st.just("overwrite"), st.integers(min_value=1, max_value=4)),
        st.tuples(st.just("append"), st.integers(min_value=1, max_value=4)),
        st.tuples(st.just("expire"), st.integers(min_value=1, max_value=3)),
        st.tuples(st.just("sweep"), st.just(0)),
        # COW DML: delete ids divisible by k; merge k new/replacing ids
        st.tuples(st.just("delete"), st.integers(min_value=2, max_value=4)),
        st.tuples(st.just("merge"), st.integers(min_value=1, max_value=3)),
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(cmds=_snap_cmds)
def test_snapshot_lifecycle_matches_model(spark_prop, cmds, tmp_path_factory):
    """For ANY interleaving of overwrite/append commits, expiries, and
    orphan sweeps, the manifest-linked snapshot table must agree with
    a trivial dict model: history lists exactly the surviving
    committed versions, expiry drops exactly `all but newest keep`,
    and EVERY surviving version still reads back its exact row set —
    the reachability property (expiring an appended-onto ancestor
    never breaks a descendant) under arbitrary schedules, not just
    the crafted chains in test_pipeline_ops."""
    from datapipe_spark.operators import snapshots as snap

    table = str(tmp_path_factory.mktemp("snap_model") / "tbl")
    model: dict[int, frozenset[int]] = {}
    cur = 0
    next_id = 0
    for op, arg in cmds:
        if op in ("overwrite", "append"):
            ids = frozenset(range(next_id, next_id + arg))
            next_id += arg
            df = spark_prop.createDataFrame(
                [(i,) for i in sorted(ids)], "id long"
            )
            v = snap.commit_snapshot(df, table, mode=op)
            base = model.get(cur, frozenset()) if op == "append" else frozenset()
            model[v] = base | ids
            cur = v
        elif op == "delete" and model:
            v = snap.delete_rows(spark_prop, table, f"id % {arg} = 0")
            model[v] = frozenset(
                i for i in model[cur] if i % arg != 0
            )
            cur = v
        elif op == "merge" and model:
            ids = frozenset(range(next_id, next_id + arg))
            low = sorted(model[cur])[:1]  # replace the lowest key too
            next_id += arg
            src = spark_prop.createDataFrame(
                [(i,) for i in sorted(ids | frozenset(low))], "id long"
            )
            v = snap.merge_snapshot(spark_prop, table, src, on="id")
            model[v] = model[cur] | ids
            cur = v
        elif op == "expire":
            expected_drop = set(sorted(model)[:-arg]) - {cur}
            assert set(snap.expire_snapshots(table, keep=arg)) == expected_drop
            model = {v: s for v, s in model.items() if v not in expected_drop}
        elif op == "sweep":
            snap.remove_orphan_files(table, older_than_s=0)
        assert [h["version"] for h in snap.history(table)] == sorted(model)
        if model:
            got = {
                r["id"]
                for r in snap.read_snapshot(spark_prop, table).collect()
            }
            assert got == set(model[cur])
    # final deep check: every surviving version's exact row set
    for v, ids in model.items():
        got = {
            r["id"]
            for r in snap.read_snapshot(spark_prop, table, version=v).collect()
        }
        assert got == set(ids), v


_batch_plan = st.lists(
    st.integers(min_value=0, max_value=5), min_size=1, max_size=10
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(plan=_batch_plan)
def test_snapshot_batch_commits_idempotent_under_replay(
    spark_prop, plan, tmp_path_factory
):
    """For ANY micro-batch schedule with replays (the at-least-once
    delivery Structured Streaming gives a foreachBatch sink — batch
    ids are MONOTONIC, so anything at-or-below the committed maximum
    is a replay), the snapshot table must equal exactly-once
    processing: each advancing id commits exactly once, every replay
    is a no-op, and the final table holds precisely the committed
    batches' rows."""
    from datapipe_spark.operators import snapshots as snap

    table = str(tmp_path_factory.mktemp("snap_batches") / "tbl")
    last = -1
    committed: list[int] = []
    expected: set[int] = set()
    for bid in plan:
        ids = {bid * 100 + j for j in range(3)}
        df = spark_prop.createDataFrame([(i,) for i in sorted(ids)], "id long")
        v = snap.commit_snapshot_batch(df, table, batch_id=bid)
        if bid > last:
            assert v is not None
            last = bid
            committed.append(bid)
            expected |= ids
        else:
            assert v is None
    got = {
        r["id"] for r in snap.read_snapshot(spark_prop, table).collect()
    }
    assert got == expected
    hist = snap.history(table)
    assert [h["batch_id"] for h in hist] == committed
    assert hist[-1]["row_count"] == len(expected)
