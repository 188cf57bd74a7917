"""Conformance tests for the ordered-join state machine.

Expected counts are the reference's own asserted values
(``/root/reference/05_LocalStreamBuffer/tester.py``: 99 / 23 / 20 / 20 / 13 /
16 / 179987 / 23041 / 13702); the differential tests check the optimized
machine against the naive oracle on randomized sequences.
"""

import random
import time

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from statefulstreamprocessor_ray.fixtures import scenario_sequence
from statefulstreamprocessor_ray.state.stream_buffer import OrderedJoinState, case_name

from .oracle import oracle_pairs


def run_machine(seq, delta=None):
    st_ = OrderedJoinState(delta_time=delta)
    for i, (side, ts) in enumerate(seq):
        st_.ingest(side, ts, i)
    left, right, case = st_.drain()
    return [(l, r, case_name(c)) for l, r, c in zip(left, right, case)], st_


@pytest.mark.parametrize("name", ["F1", "F2", "F3", "F4", "F5", "F6"])
def test_reference_counts(name):
    seq, delta, expected = scenario_sequence(name)
    pairs, _ = run_machine(seq, delta)
    assert len(pairs) == expected


def test_golden_pair_f3():
    # Reference tester.py:209-211 golden tuple: r.ts=+6, s.ts=+5.5.
    seq, delta, _ = scenario_sequence("F3")
    pairs, _ = run_machine(seq, delta)
    ts_pairs = {(seq[l][1], seq[r][1]) for l, r, _ in pairs}
    assert (1600000006.0, 1600000005.5) in ts_pairs


def test_orientation_left_is_left():
    seq, delta, _ = scenario_sequence("F4")
    pairs, _ = run_machine(seq, delta)
    for l, r, _ in pairs:
        assert seq[l][0] == 0 and seq[r][0] == 1


@pytest.mark.parametrize(
    "name,expected_joins",
    [("F7", 179_987), ("F7b", 23_041)],
)
def test_perf_counts(name, expected_joins):
    seq, delta, expected = scenario_sequence(name)
    t0 = time.time()
    pairs, _ = run_machine(seq, delta)
    dt = time.time() - t0
    assert len(pairs) == expected_joins
    # Reference asserts <12s / <2s for these on one core; we should be far under.
    assert dt < 5.0


def test_oracle_agreement_on_scenarios():
    for name in ["F1", "F2", "F3", "F4", "F5", "F6"]:
        seq, delta, _ = scenario_sequence(name)
        pairs, _ = run_machine(seq, delta)
        expected = oracle_pairs([(s, t, i) for i, (s, t) in enumerate(seq)], delta)
        assert pairs == expected, name


def test_retired_frontier_and_buffers_bounded():
    seq, delta, _ = scenario_sequence("F7")
    retired_log = []
    st_ = OrderedJoinState(
        delta_time=delta, on_retire=lambda side, ref, ts: retired_log.append((side, ref))
    )
    max_buf = 0
    for i, (side, ts) in enumerate(seq):
        st_.ingest(side, ts, i)
        max_buf = max(max_buf, sum(st_.buffer_sizes()))
    # balanced 5/5 interleave keeps buffers tiny (reference held 1+6 after 20)
    assert max_buf <= 16
    assert len(retired_log) > 99_000  # nearly everything retires
    # frontier refs are monotone per side
    for side in (0, 1):
        refs = [r for s, r in retired_log if s == side]
        assert refs == sorted(refs)


def test_snapshot_restore_resumes_identically():
    seq, delta, _ = scenario_sequence("F4")
    cut = len(seq) // 2
    full, _ = run_machine(seq, delta)

    st1 = OrderedJoinState(delta_time=delta)
    for i, (side, ts) in enumerate(seq[:cut]):
        st1.ingest(side, ts, i)
    head = st1.drain()
    snap = st1.snapshot()

    st2 = OrderedJoinState.restore(snap)
    for i, (side, ts) in enumerate(seq[cut:], start=cut):
        st2.ingest(side, ts, i)
    tail = st2.drain()

    merged = [
        (l, r, case_name(c))
        for l, r, c in zip(head[0] + tail[0], head[1] + tail[1], head[2] + tail[2])
    ]
    assert merged == full


@settings(max_examples=60, deadline=None)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 50)), min_size=0, max_size=60
    ),
    delta=st.sampled_from([None, 1, 3, 1000]),
)
def test_differential_vs_oracle(data, delta):
    """Machine == naive oracle on arbitrary interleaves with per-side
    monotone timestamps (the reference's stated precondition)."""
    last = {0: -1.0, 1: -1.0}
    seq = []
    for side, gap in data:
        last[side] += 1 + gap / 10.0  # strictly increasing per side, ties across sides possible
        seq.append((side, last[side]))
    pairs, _ = run_machine(seq, delta)
    expected = oracle_pairs([(s, t, i) for i, (s, t) in enumerate(seq)], delta)
    assert pairs == expected


def test_cross_side_ties_join_both_ways():
    # A tie makes a record both predecessor and successor (SURVEY §2.3.1).
    seq = [(0, 1.0), (1, 1.0), (0, 2.0)]
    pairs, _ = run_machine(seq)
    expected = oracle_pairs([(s, t, i) for i, (s, t) in enumerate(seq)], None)
    assert pairs == expected
    assert (0, 1, "JS2") in pairs
