"""Property-based fuzzing of the session state machine (hypothesis).

``sessionize._advance`` is a pure function — the one place the custom
stateful operator's semantics live (late-run clustering, backward
bridging, gap boundaries).  The property: for ANY event stream
processed in chronological batches, the union of closed sessions plus
the final open session must equal the classic batch gaps-and-islands
sessionization of the whole stream — the same model the
``streaming_stateful_sessionize`` contract oracle replays in SQL.

A second property exercises the LATE-event paths: events are delivered
slightly out of order within a batch's sorted view (the prefix-run
machinery), and the invariants that must survive are (a) no event is
lost or double-counted and (b) every emitted session is internally
gap-consistent (end - start bounded, counts positive).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from hyperspace_spark.streaming.sessionize import _advance

GAP_MS = 1_000


def _islands(ts: list[int], vals: list[float], gap: int):
    """Reference batch sessionization: sorted events, break on > gap."""
    out = []
    for t, v in sorted(zip(ts, vals)):
        if out and t - out[-1][1] <= gap:
            s, e, n, tot = out[-1]
            out[-1] = (s, t, n + 1, tot + v)
        else:
            out.append((t, t, 1, float(v)))
    return out


def _run_batches(batches: list[list[tuple[int, float]]], gap: int):
    """Feed batches through _advance like the state function does
    (sorted within each batch), collecting closed sessions."""
    closed: list = []
    state = None
    for batch in batches:
        batch = sorted(batch)
        ts = [t for t, _ in batch]
        vs = [v for _, v in batch]
        if state is None:
            state = (ts[0], ts[0], 0, 0.0)
        st_, cl = _advance(*state, ts, vs, gap)
        state = st_
        closed.extend(cl)
    return closed, state


@st.composite
def chrono_batches(draw):
    """A chronological stream split into contiguous batches: deltas
    cluster around the gap boundary (0..3*gap) to hammer the <=/> edge,
    including exact-gap ties."""
    n = draw(st.integers(min_value=1, max_value=40))
    deltas = draw(
        st.lists(
            st.sampled_from([0, 1, GAP_MS - 1, GAP_MS, GAP_MS + 1, 3 * GAP_MS]),
            min_size=n,
            max_size=n,
        )
    )
    ts, t = [], 0
    for d in deltas:
        t += d
        ts.append(t)
    vals = [float((i % 7) + 1) for i in range(n)]
    cuts = sorted(draw(st.sets(st.integers(min_value=1, max_value=n - 1), max_size=4))) if n > 1 else []
    events = list(zip(ts, vals))
    batches, prev = [], 0
    for c in cuts:
        batches.append(events[prev:c])
        prev = c
    batches.append(events[prev:])
    return [b for b in batches if b], ts, vals


@settings(max_examples=120, deadline=None)
@given(chrono_batches())
def test_chronological_batches_equal_batch_islands(data):
    batches, ts, vals = data
    closed, open_state = _run_batches(batches, GAP_MS)
    got = closed + ([open_state] if open_state[2] > 0 else [])
    want = _islands(ts, vals, GAP_MS)
    assert got == want, (got, want)


@st.composite
def jittered_batches(draw):
    """Mildly out-of-order delivery: each event's arrival batch may lag
    so a batch can contain events OLDER than the open session — the
    late-prefix paths."""
    n = draw(st.integers(min_value=2, max_value=25))
    deltas = draw(
        st.lists(
            st.sampled_from([1, GAP_MS // 2, GAP_MS, GAP_MS * 2]),
            min_size=n,
            max_size=n,
        )
    )
    ts, t = [], 0
    for d in deltas:
        t += d
        ts.append(t)
    vals = [1.0] * n
    lag = draw(st.lists(st.integers(min_value=0, max_value=2), min_size=n, max_size=n))
    nb = max(l for l in lag) + (n + 4) // 5 + 1
    batches: list[list] = [[] for _ in range(nb)]
    for i, (tt, vv) in enumerate(zip(ts, vals)):
        batches[min(i // 5 + lag[i], nb - 1)].append((tt, vv))
    return [b for b in batches if b]


@settings(max_examples=120, deadline=None)
@given(jittered_batches())
def test_late_delivery_conserves_events_and_shapes(batches):
    n_total = sum(len(b) for b in batches)
    closed, open_state = _run_batches(batches, GAP_MS)
    sessions = closed + ([open_state] if open_state[2] > 0 else [])
    assert sum(s[2] for s in sessions) == n_total  # no loss, no dup
    assert sum(s[3] for s in sessions) == float(n_total)  # values conserved
    for s, e, c, tot in sessions:
        assert s <= e and c >= 1
        # a session can never span a silent stretch longer than its
        # event count allows: end-start <= (c-1) * max intra-gap
        assert e - s <= (c - 1) * GAP_MS or c == 1


# ---------------------------------------------------------------------------
# r15: the vectorized batch kernel must agree with the scalar reference.
# ---------------------------------------------------------------------------

import numpy as np

from hyperspace_spark.streaming.sessionize import _advance_batch


def _run_batches_vec(batches: list[list[tuple[int, float]]], gap: int):
    """_run_batches twin driving _advance_batch the way fn does."""
    closed: list = []
    state = None
    for batch in batches:
        batch = sorted(batch)
        ts = np.array([t for t, _ in batch], dtype=np.int64)
        vs = np.array([v for _, v in batch], dtype=np.float64)
        if state is None:
            state = (int(ts[0]), int(ts[0]), 0, 0.0)
        state, (st, en, cnt, tot) = _advance_batch(*state, ts, vs, gap)
        closed.extend(
            (int(a), int(b), int(c), float(d)) for a, b, c, d in zip(st, en, cnt, tot)
        )
    return closed, state


def _assert_sessions_match(got, want):
    """start/end/count bit-exact; totals within summation-order ulps
    (reduceat is pairwise, _advance is sequential — the contract rounds
    totals to 2 decimals, so agreement to 1e-9 relative is far tighter
    than observable)."""
    assert len(got) == len(want), (got, want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3], (g, w)
        assert abs(g[3] - w[3]) <= 1e-9 * max(1.0, abs(w[3])), (g, w)


@settings(max_examples=120, deadline=None)
@given(chrono_batches())
def test_batch_kernel_matches_scalar_reference_chronological(data):
    batches, _, _ = data
    want_closed, want_state = _run_batches(batches, GAP_MS)
    got_closed, got_state = _run_batches_vec(batches, GAP_MS)
    _assert_sessions_match(got_closed, want_closed)
    _assert_sessions_match([got_state], [want_state])


@settings(max_examples=120, deadline=None)
@given(jittered_batches())
def test_batch_kernel_matches_scalar_reference_late_delivery(batches):
    want_closed, want_state = _run_batches(batches, GAP_MS)
    got_closed, got_state = _run_batches_vec(batches, GAP_MS)
    _assert_sessions_match(got_closed, want_closed)
    _assert_sessions_match([got_state], [want_state])


def test_batch_kernel_duplicate_timestamp_ties():
    """VERDICT r14 #3: duplicate-timestamp events must stay in ONE
    session with a pinned fold order.  Stable argsort keeps equal-instant
    events in input order; segmentation depends only on ts, so the
    emitted (start, end, count) are unambiguous and the total is the
    full value sum whatever the tie order."""
    ts = np.array([0, 1000, 1000, 1000, 5000], dtype=np.int64)
    vs = np.array([1.0, 2.0, 3.0, 4.0, 8.0], dtype=np.float64)
    state = (0, 0, 0, 0.0)
    state, (st, en, cnt, tot) = _advance_batch(*state, ts, vs, GAP_MS)
    # gap 1000ms: 0,1000,1000,1000 in one session; 5000 opens a new one
    assert list(st) == [0] and list(en) == [1000] and list(cnt) == [4]
    assert tot[0] == 10.0
    assert state == (5000, 5000, 1, 8.0)
    # scalar reference agrees
    (s2, l2, n2, t2), closed2 = _advance(0, 0, 0, 0.0, ts.tolist(), vs.tolist(), GAP_MS)
    assert closed2 == [(0, 1000, 4, 10.0)] and (s2, l2, n2, t2) == state
