"""Closed-form vectorized replay of the ordered join for ts-sorted input.

When a key's events are ingested in the engine's pinned order — sorted by
(ts, stream_side, tie) — the state machine's buffer contents admit a closed
form, because (a) a record's JR1 ``x_prev`` is always its stream predecessor,
(b) exterior partners in (x_prev.ts, x.ts] can never have been stripped before
x's ingest (their successor would need a smaller timestamp), and (c) strips
run on every ingest once both sides are non-empty, so the buffers equal an
index-suffix determined by the other side's tail. The full emitted pair set
for an ingest at position i with previous same-side timestamp tp is then:

- JR2: i x every opposite j < i with ts[j] > tp (ascending),
- JR1: prev(i) x the same set minus its first element (ascending, only when a
  same-side predecessor exists),
- JS2: i x the first opposite j < i with ts[j] >= ts[i] (a tie, given the
  sort) — all expressible with searchsorted + ragged ranges, no Python loop.

Emission order is (trigger position, JR1 block, JR2 block, JS2), matching the
machine exactly; ``delta_time`` pairs are dropped at pair level without
affecting emission positions. Differentially tested against the state machine
(tests/test_vectorized.py). ~50x faster than the per-row loop.
"""

from __future__ import annotations

import numpy as np

_NEG_INF = np.iinfo(np.int64).min


def _ragged_ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenation of arange(starts[i], starts[i]+counts[i]) for counts>0."""
    nz = counts > 0
    starts = starts[nz]
    counts = counts[nz]
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    out = np.ones(total, dtype=np.int64)
    out[0] = starts[0]
    ends = np.cumsum(counts)[:-1]
    out[ends] = starts[1:] - (starts[:-1] + counts[:-1] - 1)
    return np.cumsum(out)


def sorted_replay_pairs(
    ts: np.ndarray,
    side: np.ndarray,
    delta_us: int | None = None,
    return_trigger: bool = False,
):
    """Pairs for one key, events pre-sorted by (ts, side, tie).

    Returns (left_idx, right_idx, case_id) in exact emission order; indices
    are positions into the sorted arrays, orientation left=side 0. With
    ``return_trigger`` also returns the triggering ingest position per pair
    (used by the chunked/salted and epoch decompositions).
    """
    ts = np.ascontiguousarray(ts, dtype=np.int64)
    side = np.asarray(side)
    n = len(ts)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        out = (z, z, z.astype(np.int8))
        return out + (z,) if return_trigger else out

    pos = np.arange(n, dtype=np.int64)
    trig_parts, part_parts, case_parts, prev_flag_parts = [], [], [], []

    for x_side in (0, 1):
        xs = pos[side == x_side]
        opp = pos[side != x_side]
        if len(xs) == 0 or len(opp) == 0:
            continue
        ts_x = ts[xs]
        ts_o = ts[opp]
        tp = np.concatenate(([_NEG_INF], ts_x[:-1]))

        b = np.searchsorted(opp, xs)  # arrived opposite count (pos < x)
        a = np.searchsorted(ts_o, tp, side="right")  # first opp with ts > tp
        has_prev = np.arange(len(xs)) > 0

        # JR2: x pairs opp[a..b)
        c2 = np.maximum(b - a, 0)
        jr2_trig = np.repeat(xs, c2)
        jr2_part = opp[_ragged_ranges(a, c2)]

        # JR1: x_prev pairs opp[a+1..b), trigger is still x
        c1 = np.where(has_prev, np.maximum(b - a - 1, 0), 0)
        jr1_trig = np.repeat(xs, c1)
        jr1_prev = np.repeat(np.concatenate(([0], xs[:-1])), c1)  # x_prev index
        jr1_part = opp[_ragged_ranges(a + 1, c1)]

        # JS2: first LIVE opp with ts >= ts_x among arrived. Under the sort all
        # candidates are timestamp ties; when tp == ts_x an earlier tie can
        # already be stripped, so bound by the buffer head h = first arrived
        # opp whose successor's ts exceeds tp (the closed-form strip frontier).
        c_js = np.searchsorted(ts_o, ts_x, side="left")
        if len(ts_o) > 1:
            h = np.searchsorted(ts_o[1:], tp, side="right")
        else:
            h = np.zeros(len(xs), dtype=np.int64)
        # a strip needs an *arrived* successor: clamp the head to b-1
        h = np.minimum(h, np.maximum(b - 1, 0))
        c_js = np.maximum(c_js, h)
        js_ok = c_js < b
        js_trig = xs[js_ok]
        js_part = opp[c_js[js_ok]]

        # assemble this side's pairs with block ranks for ordering
        trig_parts.extend([jr1_trig, jr2_trig, js_trig])
        part_parts.extend([jr1_part, jr2_part, js_part])
        case_parts.extend(
            [
                np.zeros(len(jr1_trig), np.int8),
                np.ones(len(jr2_trig), np.int8),
                np.full(len(js_trig), 2, np.int8),
            ]
        )
        prev_flag_parts.extend(
            [jr1_prev, jr2_trig, js_trig]  # the pivotal-side member of each pair
        )

    if not trig_parts:
        z = np.empty(0, dtype=np.int64)
        out = (z, z, z.astype(np.int8))
        return out + (z,) if return_trigger else out

    trig = np.concatenate(trig_parts)
    part = np.concatenate(part_parts)
    case = np.concatenate(case_parts)
    pivot = np.concatenate(prev_flag_parts)

    # emission order: trigger position, then JR1 < JR2 < JS2, then partner order
    order = np.lexsort((part, case, trig))
    trig, part, case, pivot = trig[order], part[order], case[order], pivot[order]

    if delta_us:
        keep = np.abs(ts[pivot] - ts[part]) <= delta_us
        trig, part, case, pivot = trig[keep], part[keep], case[keep], pivot[keep]

    # orientation: left = side-0 member
    pivot_is_left = side[pivot] == 0
    left = np.where(pivot_is_left, pivot, part)
    right = np.where(pivot_is_left, part, pivot)
    out = (left.astype(np.int64), right.astype(np.int64), case)
    return out + (trig,) if return_trigger else out


def carry_start(ts: np.ndarray, side: np.ndarray) -> int:
    """Start index of the minimal state-carrying suffix for sorted events:
    everything from the last record of the side whose last record is older
    (the live buffers + JR1 context). With only one side present, the whole
    array carries (nothing can be stripped)."""
    n = len(ts)
    lasts = []
    for s in (0, 1):
        w = np.flatnonzero(np.asarray(side) == s)
        if len(w) == 0:
            return 0
        lasts.append(int(w[-1]))
    return min(lasts)
