"""Stateful sessionization — the reference's one bespoke operator.

Re-expresses the ``flatMapGroupsWithState`` session machine of
realtime design.md:126-141 (state class :311-326, update fn :328-383,
output schema :463-487) as PySpark ``applyInPandasWithState``: per-user
state carrying the open session's accumulators; a session closes when
the event gap exceeds 30 minutes, emitting one session row (append
mode).

Determinism contract (what makes this oracle-checkable, unlike the
reference's processing-time timeouts — SURVEY §7 risk 1): gaps are
measured in *event time*; micro-batch drops are time-range-ordered so
each user's events arrive in order across batches (Kafka gives the
same per-key guarantee); the ``__flush__`` sentinel closes tail
sessions at end-of-replay. Production swaps the sentinel for
``GroupStateTimeout.ProcessingTimeTimeout`` — same state machine, the
timeout path calls the same ``_close`` transition.

Scale: state is one fixed-width tuple per active user (the reference
budgets 100k sessions ≈ 50 MB, design.md:385-387); shuffle is on
user_id only. Arrow batches both directions — no row-at-a-time Python.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from datapipe_spark.streaming.source import SENTINEL_TYPE

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_seq", T.LongType()),
        # LTZ like the stream's event time; the state fn emits naive UTC
        # wall times, which Arrow binds to instants via the UTC session
        # timezone. ``jobs._ntz`` converts back for oracle comparison.
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("session_duration_minutes", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("views", T.LongType()),
        T.StructField("clicks", T.LongType()),
        T.StructField("purchases", T.LongType()),
        T.StructField("total_spent", T.DoubleType()),
        T.StructField("converted_to_purchase", T.BooleanType()),
    ]
)

# (next_seq, start_us, last_us, n, views, clicks, purchases, spent_cents)
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("views", T.LongType()),
        T.StructField("clicks", T.LongType()),
        T.StructField("purchases", T.LongType()),
        T.StructField("spent_cents", T.LongType()),
    ]
)

_OUT_COLS = [f.name for f in SESSION_OUTPUT_SCHEMA.fields]


def _close(user_id: int, st: tuple) -> dict[str, Any]:
    seq, start_us, last_us, n, views, clicks, purchases, cents = st
    return {
        "user_id": user_id,
        "session_seq": seq,
        "session_start": pd.Timestamp(start_us, unit="us"),
        "session_end": pd.Timestamp(last_us, unit="us"),
        "session_duration_minutes": (last_us - start_us) / 60_000_000.0,
        "n_events": n,
        "views": views,
        "clicks": clicks,
        "purchases": purchases,
        "total_spent": cents / 100.0,
        "converted_to_purchase": purchases > 0,
    }


# how long (in gap units) a timed-out user's session_seq counter stays
# remembered after the close: the timeout transition keeps a tiny
# "closed" marker instead of dropping state, so a reconnecting user
# continues the per-user-monotone session_seq the batch twin defines
# (r12 review: remove() restarted every post-timeout session at seq 0,
# emitting duplicate (user_id, session_seq) keys). After this many
# further idle gaps the marker itself expires and the counter resets —
# the documented bound any fixed-size-state design must pick.
SESSION_SEQ_MEMORY_GAPS = 10


def _cents(value: float) -> int:
    """Exact cents of a purchase value, matching the batch twin's
    ``CAST(value AS DECIMAL(18,2))`` (shortest-decimal-repr HALF_UP —
    r12 review: ``int(round(v*100))`` banker's-rounded the FLOAT
    PRODUCT, so 2.675 → 267 while both engines' decimal cast says
    268)."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        Decimal(repr(value)).quantize(Decimal("0.01"), ROUND_HALF_UP) * 100
    )


def make_session_fn(gap_minutes: float = 30, use_timeout: bool = False):
    gap_us = int(gap_minutes * 60 * 1_000_000)

    def _run_loop(user_id, st, ts_us, etypes, values) -> tuple:
        """Reference per-event state walk — kept as the exact-semantics
        fallback for the one input shape the vectorized core does not
        model (a sentinel sorting BEFORE later real events, impossible
        in any real replay where the sentinel is max(ts)+30d but
        reachable through direct fn calls). Returns (rows, st)."""
        rows: list[dict[str, Any]] = []
        for t_us, etype, value in zip(ts_us, etypes, values):
            if etype == SENTINEL_TYPE:
                if st is not None and st[1] >= 0:
                    rows.append(_close(user_id, st))
                st = None
                continue
            if st is not None and st[1] < 0:
                # seq-memory marker: open the next session at the
                # remembered sequence number
                st = (st[0], t_us, t_us, 0, 0, 0, 0, 0)
            elif st is not None and t_us - st[2] > gap_us:
                rows.append(_close(user_id, st))
                st = (st[0] + 1, t_us, t_us, 0, 0, 0, 0, 0)
            elif st is None:
                st = (0, t_us, t_us, 0, 0, 0, 0, 0)
            seq, start_us, _, n, views, clicks, purchases, cents = st
            is_purchase = etype == "purchase"
            if is_purchase and value is not None and value == value:
                cents += _cents(value)
            st = (
                seq, start_us, t_us, n + 1,
                views + (etype == "view"),
                clicks + (etype == "click"),
                purchases + is_purchase,
                cents,
            )
        return rows, st

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (user_id,) = key
        st = state.get if state.exists else None

        # ProcessingTimeTimeout path (the reference's 30-min wall-clock
        # expiry, realtime design.md:378-379): the group is invoked with
        # no data after its timeout fires. An OPEN session closes with
        # the same _close transition as the event-time gap, and the
        # state becomes a seq-memory marker (start_us = -1) so the next
        # session continues the per-user sequence; an already-marker
        # state timing out again is the memory horizon — drop it.
        if getattr(state, "hasTimedOut", False):
            rows: list[dict[str, Any]] = []
            if st is not None and st[1] >= 0:
                rows.append(_close(user_id, st))
                state.update((st[0] + 1, -1, 0, 0, 0, 0, 0, 0))
                state.setTimeoutDuration(
                    int(gap_minutes * 60 * 1000) * SESSION_SEQ_MEMORY_GAPS
                )
            else:
                state.remove()
            if rows:
                yield pd.DataFrame(rows, columns=_OUT_COLS)
            return

        # --- vectorized session walk (guide §4.2: batch-native numpy
        # instead of a per-event Python loop — measured ~5× less
        # Python CPU per group, bit-identical output/state equality
        # property-tested against the loop fallback below) ---
        chunks = list(pdfs)
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        ts_ns = pdf["ts"].to_numpy("datetime64[ns]").view("int64")
        order = np.lexsort((pdf["event_id"].to_numpy(), ts_ns))
        ts_us = ts_ns[order] // 1000
        etype = pdf["event_type"].to_numpy()[order]
        value = pdf["value"].to_numpy()[order]

        sent = etype == SENTINEL_TYPE
        flush = bool(sent.any())
        if flush:
            first_sent = int(np.argmax(sent))
            if not sent[first_sent:].all():
                # real events after a sentinel: the loop fallback is
                # the semantics of record (sentinel resets seq to 0)
                rows, st = _run_loop(user_id, st, ts_us, etype, value)
                if st is None:
                    state.remove()
                else:
                    state.update(st)
                    if use_timeout:
                        state.setTimeoutDuration(int(gap_minutes * 60 * 1000))
                if rows:
                    yield pd.DataFrame(rows, columns=_OUT_COLS)
                return
            keep = ~sent
            ts_us, etype, value = ts_us[keep], etype[keep], value[keep]
        n = len(ts_us)
        if n == 0:
            if flush:
                rows = []
                if st is not None and st[1] >= 0:
                    rows.append(_close(user_id, st))
                state.remove()
                if rows:
                    yield pd.DataFrame(rows, columns=_OUT_COLS)
            # no data and no sentinel: nothing changes
            return

        # session boundaries: split where the gap is strictly exceeded
        new_sess = np.empty(n, dtype=bool)
        new_sess[0] = True
        np.greater(ts_us[1:] - ts_us[:-1], gap_us, out=new_sess[1:])
        merge_first = st is not None and st[1] >= 0 and ts_us[0] - st[2] <= gap_us
        sess = np.cumsum(new_sess) - 1
        nsess = int(sess[-1]) + 1
        starts_idx = np.flatnonzero(new_sess)
        bounds = np.append(starts_idx[1:], n)

        start_us = ts_us[starts_idx]
        last_us = ts_us[bounds - 1]
        cnt = bounds - starts_idx
        views = np.bincount(sess[etype == "view"], minlength=nsess)
        clicks = np.bincount(sess[etype == "click"], minlength=nsess)
        is_p = etype == "purchase"
        purchases = np.bincount(sess[is_p], minlength=nsess)
        cents = np.zeros(nsess, dtype=np.int64)
        if is_p.any():
            # exact decimal cents per purchase (the oracle's HALF_UP
            # money cast) — a short loop over purchases only
            for si, v in zip(sess[is_p], value[is_p]):
                if v is not None and v == v:
                    cents[si] += _cents(v)

        # sequence numbering + carried-state merge
        if st is None:
            base = 0
        elif st[1] < 0:  # seq-memory marker continues the sequence
            base = st[0]
        elif merge_first:
            base = st[0]
            start_us[0] = st[1]
            cnt[0] += st[3]
            views[0] += st[4]
            clicks[0] += st[5]
            purchases[0] += st[6]
            cents[0] += st[7]
        else:
            base = st[0] + 1
        seqs = base + np.arange(nsess, dtype=np.int64)

        # an open carried session that does NOT merge closes first
        prepend = st is not None and st[1] >= 0 and not merge_first
        hi = nsess if flush else nsess - 1  # last session stays open unless flushed
        out_n = hi + (1 if prepend else 0)
        if out_n:
            off = 1 if prepend else 0
            o_seq = np.empty(out_n, dtype=np.int64)
            o_start = np.empty(out_n, dtype=np.int64)
            o_end = np.empty(out_n, dtype=np.int64)
            o_cnt = np.empty(out_n, dtype=np.int64)
            o_v = np.empty(out_n, dtype=np.int64)
            o_c = np.empty(out_n, dtype=np.int64)
            o_p = np.empty(out_n, dtype=np.int64)
            o_cents = np.empty(out_n, dtype=np.int64)
            if prepend:
                o_seq[0], o_start[0], o_end[0] = st[0], st[1], st[2]
                o_cnt[0], o_v[0], o_c[0], o_p[0], o_cents[0] = (
                    st[3], st[4], st[5], st[6], st[7],
                )
            o_seq[off:] = seqs[:hi]
            o_start[off:] = start_us[:hi]
            o_end[off:] = last_us[:hi]
            o_cnt[off:] = cnt[:hi]
            o_v[off:] = views[:hi]
            o_c[off:] = clicks[:hi]
            o_p[off:] = purchases[:hi]
            o_cents[off:] = cents[:hi]
            out = pd.DataFrame(
                {
                    "user_id": np.full(out_n, user_id, dtype=np.int64),
                    "session_seq": o_seq,
                    "session_start": pd.to_datetime(o_start, unit="us"),
                    "session_end": pd.to_datetime(o_end, unit="us"),
                    "session_duration_minutes": (o_end - o_start) / 60_000_000.0,
                    "n_events": o_cnt,
                    "views": o_v,
                    "clicks": o_c,
                    "purchases": o_p,
                    "total_spent": o_cents / 100.0,
                    "converted_to_purchase": o_p > 0,
                }
            )
        else:
            out = None

        if flush:
            state.remove()
        else:
            li = nsess - 1
            state.update(
                (
                    int(seqs[li]), int(start_us[li]), int(last_us[li]),
                    int(cnt[li]), int(views[li]), int(clicks[li]),
                    int(purchases[li]), int(cents[li]),
                )
            )
            if use_timeout:
                state.setTimeoutDuration(int(gap_minutes * 60 * 1000))
        if out is not None:
            yield out

    return fn


def apply_session_state(
    events: DataFrame, gap_minutes: float = 30, use_timeout: bool = False
) -> DataFrame:
    """T2: streaming per-user session machine (append mode).

    ``use_timeout=True`` arms ``GroupStateTimeout.ProcessingTimeTimeout``
    — the reference's wall-clock session expiry. The bounded replays
    used for oracle checks keep it off (wall-clock firing is
    nondeterministic; the ``__flush__`` sentinel closes tails instead);
    the timeout transition itself is unit-tested with a fake state.
    """
    return (
        events.select("user_id", "ts", "event_id", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_fn(gap_minutes, use_timeout=use_timeout),
            SESSION_OUTPUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming last-touch attribution (the as-of join, stateful form) --------

ATTRIBUTION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("touch_event_id", T.LongType()),
        T.StructField("touch_type", T.StringType()),
        T.StructField("touch_ts", T.TimestampType()),
        T.StructField("secs_since_touch", T.DoubleType()),
    ]
)

# (touch_event_id, touch_type, touch_ts_us)
ATTRIBUTION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("eid", T.LongType()),
        T.StructField("ttype", T.StringType()),
        T.StructField("t_us", T.LongType()),
    ]
)

_ATTR_COLS = [f.name for f in ATTRIBUTION_OUTPUT_SCHEMA.fields]


def make_attribution_fn():
    """Per-user state machine for streaming last-touch attribution:
    state = the latest view/click seen; each purchase emits
    immediately, enriched with that state (or NULLs before any touch).

    Equal-timestamp semantics match the batch as-of join
    (``plans.events_queries.purchase_attribution``): within a batch
    events sort by (ts, is_purchase, event_id), so at a tied timestamp
    every touch precedes the purchase and the max-event_id touch wins —
    the batch form's ``t.ts <= p.ts`` + per-(user, ts) dedup rule.
    Cross-batch, the drop replay preserves per-user time order (the
    same Kafka per-key guarantee sessionization relies on). State is
    one fixed-width tuple per user, never closed — no sentinel or
    timeout transition needed; flush rows are skipped.
    """

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (user_id,) = key
        st = state.get if state.exists else None
        chunks = list(pdfs)
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        real = (pdf["event_type"] != SENTINEL_TYPE).to_numpy()
        if not real.any():
            return
        ts_ns = pdf["ts"].to_numpy("datetime64[ns]").view("int64")[real]
        eid = pdf["event_id"].to_numpy()[real].astype(np.int64)
        etype = pdf["event_type"].to_numpy()[real]
        value = pdf["value"].to_numpy()[real]
        is_p = etype == "purchase"
        # (ts, is_purchase, event_id) order: at a tied timestamp every
        # touch precedes the purchase — the batch as-of tie rule
        order = np.lexsort((eid, is_p, ts_ns))
        ts_us = ts_ns[order] // 1000
        eid, etype, value, is_p = eid[order], etype[order], value[order], is_p[order]

        # vectorized last-touch: index of the latest preceding view/click
        touch = (etype == "view") | (etype == "click")
        li = np.maximum.accumulate(np.where(touch, np.arange(len(eid)), -1))

        p_idx = np.flatnonzero(is_p)
        if len(p_idx):
            lt = li[p_idx]
            has = lt >= 0
            t_eid = np.empty(len(p_idx), dtype=np.float64)
            t_ts = np.empty(len(p_idx), dtype=np.int64)
            t_type = np.empty(len(p_idx), dtype=object)
            t_eid[has] = eid[lt[has]]
            t_ts[has] = ts_us[lt[has]]
            t_type[has] = etype[lt[has]]
            if st is not None:
                t_eid[~has], t_ts[~has], t_type[~has] = st[0], st[2], st[1]
                valid = np.ones(len(p_idx), dtype=bool)
            else:
                valid = has
            p_us = ts_us[p_idx]
            secs = np.round((p_us - t_ts) / 1e6, 6)
            out = pd.DataFrame(
                {
                    "event_id": eid[p_idx],
                    "user_id": np.full(len(p_idx), user_id, dtype=np.int64),
                    "ts": pd.to_datetime(p_us, unit="us"),
                    "value": value[p_idx].astype(np.float64),
                    "touch_event_id": pd.array(
                        np.where(valid, t_eid, np.nan), dtype="Int64"
                    ),
                    "touch_type": np.where(valid, t_type, None),
                    "touch_ts": pd.to_datetime(
                        np.where(valid, t_ts, np.int64(0)), unit="us"
                    ).where(valid),
                    "secs_since_touch": np.where(valid, secs, np.nan),
                }
            )
        else:
            out = None

        lt_last = li[-1]
        if lt_last >= 0:
            state.update((int(eid[lt_last]), str(etype[lt_last]), int(ts_us[lt_last])))
        elif st is not None:
            state.update(st)
        if out is not None:
            yield out

    return fn


def apply_attribution_state(events: DataFrame) -> DataFrame:
    """Streaming as-of join (last-touch attribution) — append mode,
    one fixed-width state tuple per user, shuffle on user_id only."""
    return (
        events.select("user_id", "ts", "event_id", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_attribution_fn(),
            ATTRIBUTION_OUTPUT_SCHEMA,
            ATTRIBUTION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


TRANSITION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("from_type", T.StringType()),
        T.StructField("to_type", T.StringType()),
    ]
)

TRANSITION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def make_transition_fn():
    """Per-user state machine for streaming event-type transitions:
    state = the last event seen; each arriving event emits one
    (from_type → to_type) adjacency row (nothing for the user's first
    event). In-batch sort (ts, event_id) + the replay's per-user
    cross-batch order reproduce the batch window's LEAD order exactly,
    so the aggregated stream equals ``plans.behavior.event_transitions``
    and its oracle. State is one fixed-width tuple per user.
    """

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        st = state.get if state.exists else None
        chunks = list(pdfs)
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        real = (pdf["event_type"] != SENTINEL_TYPE).to_numpy()
        if not real.any():
            return
        ts_ns = pdf["ts"].to_numpy("datetime64[ns]").view("int64")[real]
        eid = pdf["event_id"].to_numpy()[real]
        etype = pdf["event_type"].to_numpy()[real]
        order = np.lexsort((eid, ts_ns))
        ts_us = ts_ns[order] // 1000
        eid, etype = eid[order], etype[order]

        # vectorized adjacency: froms = shift(etype), first edge from
        # the carried last-event state (none for the user's first event)
        if st is not None:
            froms = np.concatenate(([st[2]], etype[:-1]))
            tos = etype
        else:
            froms = etype[:-1]
            tos = etype[1:]
        n = len(etype)
        state.update((int(ts_us[n - 1]), int(eid[n - 1]), str(etype[n - 1])))
        if len(froms):
            yield pd.DataFrame({"from_type": froms, "to_type": tos})

    return fn


def apply_transition_state(events: DataFrame) -> DataFrame:
    """Streaming adjacency extraction — append mode, one fixed-width
    state tuple per user, shuffle on user_id only."""
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_transition_fn(),
            TRANSITION_OUTPUT_SCHEMA,
            TRANSITION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
