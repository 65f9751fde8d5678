"""r13 optimization: the three streaming state fns were vectorized
(numpy session walk / last-touch / adjacency instead of per-event
Python loops — guide §4.2). These tests pin the rewrite to the
original per-event reference semantics over randomized groups:
outputs AND final state tuples must be identical, including carried
open sessions, seq-memory markers, sentinels, tied timestamps,
multi-chunk input, and NULL purchase values.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from datapipe_spark.streaming.sessions import (
    SENTINEL_TYPE,
    _ATTR_COLS,
    _OUT_COLS,
    _cents,
    _close,
    make_attribution_fn,
    make_session_fn,
    make_transition_fn,
)


class FakeState:
    def __init__(self, value=None, timed_out=False):
        self._v = tuple(value) if value is not None else None
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v, self.removed = None, True

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


# --- reference implementations: the pre-r13 per-event loops ---------------


def _ref_session_fn(gap_minutes=30, use_timeout=False):
    gap_us = int(gap_minutes * 60 * 1_000_000)

    def fn(key, pdfs, state):
        (user_id,) = key
        rows = []
        st = state.get if state.exists else None
        chunks = list(pdfs)
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = pdf["ts"].astype("int64") // 1000
        for t_us, etype, value in zip(ts_us, pdf["event_type"], pdf["value"]):
            if etype == SENTINEL_TYPE:
                if st is not None and st[1] >= 0:
                    rows.append(_close(user_id, st))
                st = None
                continue
            if st is not None and st[1] < 0:
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
        if rows:
            yield pd.DataFrame(rows, columns=_OUT_COLS)

    return fn


def _ref_attribution_fn():
    def fn(key, pdfs, state):
        (user_id,) = key
        st = state.get if state.exists else None
        chunks = list(pdfs)
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        pdf = pdf[pdf["event_type"] != SENTINEL_TYPE]
        if pdf.empty:
            return
        pdf = pdf.assign(_is_p=(pdf["event_type"] == "purchase").astype("int64"))
        pdf = pdf.sort_values(["ts", "_is_p", "event_id"], kind="mergesort")
        rows = []
        ts_us = pdf["ts"].astype("int64") // 1000
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


def _ref_transition_fn():
    def fn(key, pdfs, state):
        st = state.get if state.exists else None
        chunks = list(pdfs)
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        pdf = pdf[pdf["event_type"] != SENTINEL_TYPE]
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        if pdf.empty:
            return
        ts_us = pdf["ts"].astype("int64") // 1000
        froms, tos = [], []
        for eid, t_us, etype in zip(pdf["event_id"], ts_us, pdf["event_type"]):
            if st is not None:
                froms.append(st[2])
                tos.append(etype)
            st = (int(t_us), int(eid), etype)
        state.update(st)
        if froms:
            yield pd.DataFrame({"from_type": froms, "to_type": tos})

    return fn


# --- randomized group generator -------------------------------------------


def _random_groups(seed: int, n_groups: int = 400):
    rng = np.random.default_rng(seed)
    groups, states = [], []
    for uid in range(n_groups):
        n = int(rng.integers(1, 90))
        ts = pd.to_datetime(
            1_700_000_000_000_000
            + np.cumsum(rng.integers(1, 4_000_000_000, n))
            # tied timestamps now and then (exercise the event_id tiebreak)
            - (rng.random(n) < 0.2) * 0,
            unit="us",
        ).to_numpy()
        dup = rng.random(n) < 0.15
        ts[dup] = ts[np.maximum(np.where(dup)[0] - 1, 0)]  # copy prior ts → tie
        et = rng.choice(["view", "click", "purchase", "signup", "error"], n).astype(
            object
        )
        if rng.random() < 0.5:  # flush sentinel as the (time-)last row
            et[-1] = SENTINEL_TYPE
            ts[-1] = ts.max() + np.timedelta64(30, "D")
        vals = np.where(rng.random(n) < 0.85, rng.random(n) * 100, np.nan)
        pdf = pd.DataFrame(
            {
                "user_id": np.full(n, uid),
                "ts": pd.to_datetime(ts),
                "event_id": rng.permutation(n).astype("int64"),
                "event_type": et,
                "value": vals,
            }
        ).sample(frac=1.0, random_state=uid)  # arrival order is shuffled
        if n > 3 and rng.random() < 0.5:  # multi-chunk Arrow delivery
            cut = n // 2
            groups.append((uid, [pdf.iloc[:cut], pdf.iloc[cut:]]))
        else:
            groups.append((uid, [pdf]))
        r = rng.random()
        if r < 0.4:
            states.append(None)  # fresh user
        elif r < 0.6:
            states.append((int(rng.integers(0, 5)), -1, 0, 0, 0, 0, 0, 0))  # marker
        else:  # open carried session
            t0 = 1_700_000_000_000_000 - int(rng.integers(0, 5_000_000_000))
            states.append(
                (int(rng.integers(0, 5)), t0 - 1_000_000, t0,
                 int(rng.integers(1, 50)), 3, 2, 1, 1234)
            )
    return groups, states


def _attr_state(rng):
    if rng.random() < 0.5:
        return None
    return (int(rng.integers(0, 100)), str(rng.choice(["view", "click"])),
            1_700_000_000_000_000 - int(rng.integers(0, 5_000_000_000)))


def _run_all(fn, groups, states):
    outs, finals = [], []
    for (uid, pdfs), st0 in zip(groups, states):
        st = FakeState(st0)
        for out in fn((uid,), pdfs, st):
            outs.append(out)
        finals.append(st._v)
    out = pd.concat(outs, ignore_index=True) if outs else pd.DataFrame()
    return out, finals


@pytest.mark.parametrize("seed", [7, 23])
def test_vectorized_session_fn_equals_loop(seed):
    groups, states = _random_groups(seed)
    ref_out, ref_fin = _run_all(_ref_session_fn(30), groups, states)
    new_out, new_fin = _run_all(make_session_fn(30), groups, states)
    assert ref_fin == new_fin
    assert len(ref_out) == len(new_out)
    key = ["user_id", "session_seq"]
    r = ref_out.sort_values(key).reset_index(drop=True)
    n = new_out.sort_values(key).reset_index(drop=True)[list(ref_out.columns)]
    pd.testing.assert_frame_equal(r, n.astype(r.dtypes.to_dict()), check_exact=True)


@pytest.mark.parametrize("seed", [11, 29])
def test_vectorized_attribution_fn_equals_loop(seed):
    groups, _ = _random_groups(seed)
    rng = np.random.default_rng(seed + 1)
    states = [_attr_state(rng) for _ in groups]
    ref_out, ref_fin = _run_all(_ref_attribution_fn(), groups, states)
    new_out, new_fin = _run_all(make_attribution_fn(), groups, states)
    assert ref_fin == new_fin
    assert len(ref_out) == len(new_out)
    key = ["user_id", "event_id"]
    r = ref_out.sort_values(key).reset_index(drop=True)
    n = new_out.sort_values(key).reset_index(drop=True)[list(ref_out.columns)]
    # reference builds object columns from dict rows; compare on values
    # (NaN/None/NaT all normalize to isna) and exact non-null equality
    for c in ref_out.columns:
        rn, nn = r[c].isna(), n[c].isna()
        assert rn.tolist() == nn.tolist(), c
        rv = r[c][~rn].tolist()
        nv = n[c][~nn].tolist()
        assert rv == nv, c


@pytest.mark.parametrize("seed", [13, 31])
def test_vectorized_transition_fn_equals_loop(seed):
    groups, _ = _random_groups(seed)
    rng = np.random.default_rng(seed + 2)
    states = [
        None
        if rng.random() < 0.5
        else (
            1_700_000_000_000_000 - int(rng.integers(0, 1_000_000_000)),
            int(rng.integers(0, 100)),
            str(rng.choice(["view", "click", "purchase"])),
        )
        for _ in groups
    ]
    ref_out, ref_fin = _run_all(_ref_transition_fn(), groups, states)
    new_out, new_fin = _run_all(make_transition_fn(), groups, states)
    assert ref_fin == new_fin
    # adjacency rows are order-sensitive per group but the consumer
    # aggregates; compare the full multiset AND the per-group order by
    # comparing the concatenated frames directly (group order is fixed)
    pd.testing.assert_frame_equal(
        ref_out.reset_index(drop=True),
        new_out.reset_index(drop=True).astype(ref_out.dtypes.to_dict()),
        check_exact=True,
    )


def test_vectorized_session_fn_midstream_sentinel_falls_back():
    """A sentinel followed by later real events (impossible in real
    replays, reachable by direct calls) must keep the loop semantics:
    the sentinel closes the open session and RESETS seq to 0."""
    ts0 = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 1],
            "ts": [ts0, ts0 + pd.Timedelta(minutes=1), ts0 + pd.Timedelta(minutes=2)],
            "event_id": [0, 1, 2],
            "event_type": ["view", SENTINEL_TYPE, "click"],
            "value": [None, None, None],
        }
    )
    for fn in (_ref_session_fn(30), make_session_fn(30)):
        st = FakeState()
        out = list(fn((1,), [pdf], st))
        assert len(out) == 1 and out[0].iloc[0]["session_seq"] == 0
        assert out[0].iloc[0]["n_events"] == 1
        assert st._v is not None and st._v[0] == 0 and st._v[3] == 1
