"""Per-key ordered-join state machine (the LocalStreamBuffer semantics).

From-scratch implementation of the event-time-ordered two-stream join whose
observable behavior is specified in SURVEY.md §2.3.1 and whose reference
implementation lives at
``/root/reference/05_LocalStreamBuffer/local_stream_buffer.py:104-396``
(linked-list buffers + per-ingest emit cases JR1/JR2/JS2 + strip/commit).

This implementation is designed for an Arrow engine: instead of Record objects
and linked lists it operates on primitive ``(ts, ref)`` pairs, where ``ts`` is
any comparable number (int64 microseconds in the engine; float seconds in the
conformance tests) and ``ref`` is an opaque caller token (a row index into the
group's Arrow arrays in the batch path; an index into an actor-held record
store in the streaming path). Buffers are flat Python lists with a moving head
index (the reference only ever appends at the tail and removes at the head, so
a windowed list replaces its doubly-linked list with O(1) amortized ops and
far less per-record overhead).

Semantics contract (each ingest of record ``x`` into the *pivotal* stream X,
with exterior stream Y; Y-buffer entries are in arrival == time order):

- If the exterior buffer is empty, only the append happens (no joins, no strip).
- JR1: let ``x_prev`` be x's predecessor *in the X buffer* (if any). Consider
  the exterior records with ``x_prev.ts < y.ts <= x.ts`` in order; pair
  ``x_prev`` with all of them except the first (that one was already paired
  with ``x_prev`` by an earlier JS2/JR2).
- JR2: pair ``x`` with every exterior ``y`` with ``x_prev.ts < y.ts <= x.ts``
  (from the buffer head when there is no ``x_prev``).
- JS2: pair ``x`` with the first exterior ``y`` with ``y.ts >= x.ts``, if any.
- Pairs violating ``|t_x - t_y| > delta_time`` are dropped silently at pair
  time (not counted). ``delta_time`` of None/0 disables the check (the
  reference tests truthiness).
- Output orientation is by stream side: the left-stream record is always the
  left member of the emitted pair, regardless of which side was pivotal.
- Strip: after the joins (only on ingests where both buffers are non-empty),
  first the pivotal then the exterior buffer drop head records: head ``r0`` is
  retired while its buffer successor ``r1`` has ``r1.ts <= other.tail.ts``.
  Each retirement updates the per-side retired frontier (the commit cursor /
  low-watermark analog of the reference's ``last_removed_left/right`` +
  ``commit_function``).

End-of-stream truncation is inherent: pairs whose emission would require a
future trigger record are simply never emitted (verified against the
reference's asserted counts: 99 / 23 / 20 / 20 / 13 / 16 / 179987 / 23041 /
13702 — see tests/test_stream_buffer.py).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

LEFT = 0
RIGHT = 1

_CASE_NAMES = ("JR1", "JR2", "JS2")


class OrderedJoinState:
    """State for one key of the ordered two-stream join.

    Emitted pairs accumulate in ``out_left`` / ``out_right`` / ``out_case``
    (parallel lists of left-ref, right-ref, case-id 0/1/2); the caller drains
    them with :meth:`drain`.
    """

    __slots__ = (
        "delta",
        "_ts",
        "_ref",
        "_head",
        "count_ingest",
        "count_joins",
        "retired",
        "on_retire",
        "out_left",
        "out_right",
        "out_case",
    )

    def __init__(
        self,
        delta_time: Optional[float] = None,
        on_retire: Optional[Callable[[int, Any, Any], None]] = None,
    ) -> None:
        # Falsy delta_time (None or 0) disables the constraint, mirroring the
        # reference's `if self.delta_time` truthiness check.
        self.delta = delta_time if delta_time else None
        self._ts: list[list] = [[], []]  # per-side buffer timestamps
        self._ref: list[list] = [[], []]  # per-side buffer refs (caller tokens)
        self._head = [0, 0]  # per-side buffer head index
        self.count_ingest = [0, 0]
        self.count_joins = 0
        self.retired: list[Any] = [None, None]  # last retired ref per side
        self.on_retire = on_retire
        self.out_left: list[Any] = []
        self.out_right: list[Any] = []
        self.out_case: list[int] = []

    # -- introspection -----------------------------------------------------

    def buffer_sizes(self) -> tuple[int, int]:
        return (
            len(self._ts[LEFT]) - self._head[LEFT],
            len(self._ts[RIGHT]) - self._head[RIGHT],
        )

    def drain(self) -> tuple[list, list, list]:
        """Return and clear the accumulated (left_ref, right_ref, case_id) pairs."""
        out = (self.out_left, self.out_right, self.out_case)
        self.out_left, self.out_right, self.out_case = [], [], []
        return out

    # -- state snapshot (for checkpointing in the streaming path) ----------

    def snapshot(self) -> dict:
        """Live-buffer contents + counters, JSON-serializable if refs are."""
        return {
            "delta": self.delta,
            "ts": [self._ts[s][self._head[s]:] for s in (LEFT, RIGHT)],
            "ref": [self._ref[s][self._head[s]:] for s in (LEFT, RIGHT)],
            "count_ingest": list(self.count_ingest),
            "count_joins": self.count_joins,
            "retired": list(self.retired),
        }

    @classmethod
    def restore(cls, snap: dict, on_retire=None) -> "OrderedJoinState":
        st = cls(delta_time=snap["delta"], on_retire=on_retire)
        st._ts = [list(snap["ts"][0]), list(snap["ts"][1])]
        st._ref = [list(snap["ref"][0]), list(snap["ref"][1])]
        st.count_ingest = list(snap["count_ingest"])
        st.count_joins = snap["count_joins"]
        st.retired = list(snap["retired"])
        return st

    # -- the state machine -------------------------------------------------

    def ingest(self, side: int, ts, ref) -> int:
        """Feed one record; returns the number of pairs emitted by this ingest."""
        p_ts = self._ts[side]
        p_ref = self._ref[side]
        p_ts.append(ts)
        p_ref.append(ref)
        self.count_ingest[side] += 1

        e_side = 1 - side
        e_ts = self._ts[e_side]
        e_head = self._head[e_side]
        ne = len(e_ts)
        if e_head == ne:  # exterior buffer empty: no joins, no strip
            return 0

        e_ref = self._ref[e_side]
        p_head = self._head[side]
        emitted = 0
        join = self._pair

        # JR1 — x_prev pairs with the (x_prev.ts, x.ts] exterior run minus its
        # first element.
        i_prev = len(p_ts) - 2
        if i_prev >= p_head:
            tp = p_ts[i_prev]
            j = e_head
            while j < ne and e_ts[j] <= tp:
                j += 1
            j += 1  # skip the first strictly-greater exterior record
            prev_ref = p_ref[i_prev]
            while j < ne and e_ts[j] <= ts:
                emitted += join(side, tp, prev_ref, e_ts[j], e_ref[j], 0)
                j += 1
            # JR2 start: first exterior strictly after x_prev
            j2 = e_head
            while j2 < ne and e_ts[j2] <= tp:
                j2 += 1
        else:
            j2 = e_head

        # JR2 — x pairs with every exterior record in (x_prev.ts, x.ts].
        while j2 < ne and e_ts[j2] <= ts:
            emitted += join(side, ts, ref, e_ts[j2], e_ref[j2], 1)
            j2 += 1

        # JS2 — x pairs with the first exterior record at-or-after x.ts.
        j3 = e_head
        while j3 < ne and e_ts[j3] < ts:
            j3 += 1
        if j3 < ne:
            emitted += join(side, ts, ref, e_ts[j3], e_ref[j3], 2)

        # Strip: pivotal first, then exterior (reference emit():310-312).
        self._strip(side)
        self._strip(e_side)
        return emitted

    def ingest_left(self, ts, ref) -> int:
        return self.ingest(LEFT, ts, ref)

    def ingest_right(self, ts, ref) -> int:
        return self.ingest(RIGHT, ts, ref)

    def _pair(self, p_side: int, p_t, p_ref, e_t, e_ref, case: int) -> int:
        delta = self.delta
        if delta is not None:
            d = p_t - e_t
            if (d if d >= 0 else -d) > delta:
                return 0
        self.count_joins += 1
        if p_side == LEFT:
            self.out_left.append(p_ref)
            self.out_right.append(e_ref)
        else:
            self.out_left.append(e_ref)
            self.out_right.append(p_ref)
        self.out_case.append(case)
        return 1

    def _strip(self, side: int) -> None:
        """Retire buffer[side] head records superseded by the other side's tail."""
        o_ts = self._ts[1 - side]
        if not o_ts or self._head[1 - side] == len(o_ts):
            return
        t_ts = self._ts[side]
        h = self._head[side]
        n = len(t_ts)
        if h == n:
            return
        bound = o_ts[-1]
        t_ref = self._ref[side]
        on_retire = self.on_retire
        while h + 1 < n and t_ts[h + 1] <= bound:
            self.retired[side] = t_ref[h]
            if on_retire is not None:
                on_retire(side, t_ref[h], t_ts[h])
            h += 1
        self._head[side] = h
        # Amortized compaction of the dead prefix.
        if h > 4096 and h * 2 > n:
            del t_ts[:h]
            del t_ref[:h]
            self._head[side] = 0


def case_name(case_id: int) -> str:
    return _CASE_NAMES[case_id]
