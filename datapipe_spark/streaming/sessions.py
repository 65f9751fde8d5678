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


def _coalesce_sorted(
    pdfs: Iterable[pd.DataFrame],
    sort_cols: list,
    drop_sentinel: bool = False,
) -> pd.DataFrame:
    """The micro-batch coalescing invariant every state fn needs,
    spelled once (r12 review — three hand copies): concatenate the
    Arrow chunks and stable-sort on the event-order key."""
    chunks = list(pdfs)
    pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
    if drop_sentinel:
        pdf = pdf[pdf["event_type"] != SENTINEL_TYPE]
    return pdf.sort_values(sort_cols, kind="mergesort")


def make_session_fn(gap_minutes: float = 30, use_timeout: bool = False):
    gap_us = int(gap_minutes * 60 * 1_000_000)

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows: list[dict[str, Any]] = []
        st = state.get if state.exists else None

        # ProcessingTimeTimeout path (the reference's 30-min wall-clock
        # expiry, realtime design.md:378-379): the group is invoked with
        # no data after its timeout fires. An OPEN session closes with
        # the same _close transition as the event-time gap, and the
        # state becomes a seq-memory marker (start_us = -1) so the next
        # session continues the per-user sequence; an already-marker
        # state timing out again is the memory horizon — drop it.
        if getattr(state, "hasTimedOut", False):
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

        pdf = _coalesce_sorted(pdfs, ["ts", "event_id"])
        ts_us = pdf["ts"].astype("int64") // 1000  # ns → µs
        for t_us, etype, value in zip(ts_us, pdf["event_type"], pdf["value"]):
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

        if st is None:
            state.remove()
        else:
            state.update(st)
            if use_timeout:
                state.setTimeoutDuration(int(gap_minutes * 60 * 1000))
        if rows:
            yield pd.DataFrame(rows, columns=_OUT_COLS)

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
        (user_id,) = key
        st = state.get if state.exists else None
        chunks = list(pdfs)
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        pdf = pdf[pdf["event_type"] != SENTINEL_TYPE]
        if pdf.empty:
            return
        pdf = pdf.assign(_is_p=(pdf["event_type"] == "purchase").astype("int64"))
        pdf = pdf.sort_values(["ts", "_is_p", "event_id"], kind="mergesort")  # _coalesce_sorted shape + the _is_p tie key
        rows: list[dict] = []
        ts_us = pdf["ts"].astype("int64") // 1000  # ns → µs
        for eid, t_us, etype, value, is_p in zip(
            pdf["event_id"], ts_us, pdf["event_type"], pdf["value"], pdf["_is_p"]
        ):
            if is_p:
                rows.append(
                    {
                        "event_id": eid,
                        "user_id": user_id,
                        "ts": pd.Timestamp(t_us, unit="us"),
                        "value": value,
                        "touch_event_id": st[0] if st else None,
                        "touch_type": st[1] if st else None,
                        "touch_ts": pd.Timestamp(st[2], unit="us") if st else None,
                        "secs_since_touch": round((t_us - st[2]) / 1e6, 6)
                        if st
                        else None,
                    }
                )
            elif etype in ("view", "click"):
                st = (int(eid), etype, int(t_us))
        if st is not None:
            state.update(st)
        if rows:
            yield pd.DataFrame(rows, columns=_ATTR_COLS)

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
        st = state.get if state.exists else None
        pdf = _coalesce_sorted(pdfs, ["ts", "event_id"], drop_sentinel=True)
        if pdf.empty:
            return
        ts_us = pdf["ts"].astype("int64") // 1000
        froms: list[str] = []
        tos: list[str] = []
        for eid, t_us, etype in zip(pdf["event_id"], ts_us, pdf["event_type"]):
            if st is not None:
                froms.append(st[2])
                tos.append(etype)
            st = (int(t_us), int(eid), etype)
        state.update(st)
        if froms:
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
