"""Differential tests: closed-form vectorized replay == state machine, for
ts-sorted input (the engine's pinned ingestion order)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from statefulstreamprocessor_ray.state.stream_buffer import OrderedJoinState
from statefulstreamprocessor_ray.state.vectorized import (
    carry_start,
    sorted_replay_pairs,
)


def machine_pairs(ts, side, delta=None):
    st_ = OrderedJoinState(delta_time=delta)
    for i, (s, t) in enumerate(zip(side, ts)):
        st_.ingest(int(s), int(t), i)
    l, r, c = st_.drain()
    return list(zip(l, r, c))


def vector_pairs(ts, side, delta=None):
    l, r, c = sorted_replay_pairs(np.asarray(ts), np.asarray(side), delta)
    return list(zip(l.tolist(), r.tolist(), c.tolist()))


def _sorted_events(raw):
    """raw: list of (side, gap); build events sorted by (ts, side)."""
    evs = []
    t = 0
    for s, gap in raw:
        t += gap
        evs.append((t, s))
    evs.sort(key=lambda e: (e[0], e[1]))
    ts = [e[0] for e in evs]
    side = [e[1] for e in evs]
    return ts, side


@settings(max_examples=120, deadline=None)
@given(
    raw=st.lists(st.tuples(st.integers(0, 1), st.integers(0, 3)), max_size=80),
    delta=st.sampled_from([None, 1, 2, 5, 1000]),
)
def test_differential_sorted(raw, delta):
    # small gaps (incl. 0) force heavy timestamp ties across and within sides
    ts, side = _sorted_events(raw)
    assert vector_pairs(ts, side, delta) == machine_pairs(ts, side, delta)


def test_alternating_reference_count():
    ts = list(range(100))
    side = [i % 2 for i in range(100)]
    assert len(vector_pairs(ts, side)) == 99  # reference tester F1


def test_five_five_reference_count():
    order = ([0] * 5 + [1] * 5) * 2
    ts = list(range(20))
    assert len(vector_pairs(ts, order)) == 23  # F2
    assert len(vector_pairs(ts, order, delta=3)) == 13  # F5


def test_multiway_tie_stripping():
    # L,L,R,R all at ts=t: JS2 of the second R must pair the LIVE tie (L2),
    # because L1 is stripped when R1 arrives.
    ts = [5, 5, 5, 5]
    side = [0, 0, 1, 1]
    assert vector_pairs(ts, side) == machine_pairs(ts, side)


@settings(max_examples=40, deadline=None)
@given(
    raw=st.lists(st.tuples(st.integers(0, 1), st.integers(0, 3)), min_size=4, max_size=80),
    cut_frac=st.floats(0.2, 0.8),
)
def test_carry_resume_equivalence(raw, cut_frac):
    """Replaying [carry_start(prefix):] context + suffix and keeping only the
    pairs triggered in the suffix reproduces the full run's suffix pairs —
    the epoch/chunk decomposition invariant."""
    ts, side = _sorted_events(raw)
    n = len(ts)
    cut = max(1, min(n - 1, int(n * cut_frac)))
    fl, fr, fc, ft = sorted_replay_pairs(
        np.asarray(ts), np.asarray(side), None, return_trigger=True
    )
    expect = [
        (int(l), int(r), int(c))
        for l, r, c, t in zip(fl, fr, fc, ft)
        if t >= cut
    ]

    # recompute from the carry context of the prefix only
    cs = carry_start(np.asarray(ts[:cut]), np.asarray(side[:cut]))
    l, r, c, t = sorted_replay_pairs(
        np.asarray(ts[cs:]), np.asarray(side[cs:]), None, return_trigger=True
    )
    got = [
        (int(li) + cs, int(ri) + cs, int(ci))
        for li, ri, ci, ti in zip(l, r, c, t)
        if ti + cs >= cut
    ]
    assert got == expect
