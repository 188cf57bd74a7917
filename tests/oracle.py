"""Naive in-process oracle for the ordered-join semantics (SURVEY.md §2.3.1).

Deliberately written in the most literal/naive way possible (list scans and
comprehensions over dict records, recomputed per ingest) so it is independent
of the engine's optimized windowed-buffer implementation in
``statefulstreamprocessor_ray/state/stream_buffer.py``. Used only by tests for
differential checking; the engine never imports this module.
"""

from __future__ import annotations

import json


class NaiveOrderedJoin:
    def __init__(self, delta_time=None):
        self.delta = delta_time if delta_time else None
        self.buf = {"L": [], "R": []}  # lists of {"ts","ref"} in arrival order
        self.pairs = []  # emitted (left_ref, right_ref, case)
        self.retired = {"L": None, "R": None}
        self.n_joins = 0

    def ingest(self, side, ts, ref):
        piv, ext = ("L", "R") if side == 0 else ("R", "L")
        self.buf[piv].append({"ts": ts, "ref": ref})
        if not self.buf[ext]:
            return

        x = self.buf[piv][-1]
        x_prev = self.buf[piv][-2] if len(self.buf[piv]) >= 2 else None

        # JR1: x_prev × exterior records in (x_prev.ts, x.ts], skipping the
        # first exterior record strictly newer than x_prev.
        if x_prev is not None:
            newer = [y for y in self.buf[ext] if y["ts"] > x_prev["ts"]]
            for y in [y for y in newer[1:] if y["ts"] <= x["ts"]]:
                self._emit(piv, x_prev, y, "JR1")

        # JR2: x × every exterior record in (x_prev.ts, x.ts].
        lo = x_prev["ts"] if x_prev is not None else None
        for y in self.buf[ext]:
            if (lo is None or y["ts"] > lo) and y["ts"] <= x["ts"]:
                self._emit(piv, x, y, "JR2")

        # JS2: x × first exterior record with ts >= x.ts.
        later = [y for y in self.buf[ext] if y["ts"] >= x["ts"]]
        if later:
            self._emit(piv, x, later[0], "JS2")

        # Strip pivotal then exterior against the other buffer's tail.
        for trim, cur in ((piv, ext), (ext, piv)):
            if not self.buf[cur]:
                continue
            bound = self.buf[cur][-1]["ts"]
            while len(self.buf[trim]) >= 2 and self.buf[trim][1]["ts"] <= bound:
                gone = self.buf[trim].pop(0)
                self.retired[trim] = gone["ref"]

    def _emit(self, piv_side, u, v, case):
        if self.delta is not None and abs(u["ts"] - v["ts"]) > self.delta:
            return
        self.n_joins += 1
        if piv_side == "L":
            self.pairs.append((u["ref"], v["ref"], case))
        else:
            self.pairs.append((v["ref"], u["ref"], case))


def oracle_pairs(ingest_seq, delta_time=None):
    """ingest_seq: iterable of (side, ts, ref). Returns ordered pair list."""
    o = NaiveOrderedJoin(delta_time=delta_time)
    for side, ts, ref in ingest_seq:
        o.ingest(side, ts, ref)
    return o.pairs
