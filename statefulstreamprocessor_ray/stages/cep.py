"""CEP sequence-pattern detection over keyed event streams.

The reference engine's CEP surface is its ordered pairwise join
(``05_LocalStreamBuffer/local_stream_buffer.py:104-396`` — a 2-event
"pattern"); this module generalizes to L-step sequence detection, the
MATCH_RECOGNIZE / FlinkCEP-style operator a streaming engine is expected to
carry. Semantics (pinned, SQL-oracle-checkable):

- events are ordered per key by ``(ts, tie)`` — the engine's global pinned
  order;
- ``contiguity="strict"``: a **match** is L *consecutive* rows of one key
  whose ``event_col`` values equal ``pattern[0..L-1]`` (MATCH_RECOGNIZE
  without gaps); every position is tested, so matches may overlap;
- ``contiguity="skip"``: skip-till-next-match (FlinkCEP ``followedBy``) — a
  match starts at every row equal to ``pattern[0]`` and each later step binds
  to the key's *next* occurrence of that step after the previous binding
  (gaps of other events allowed); one match per start row;
- both optionally constrained to span ``within_s`` seconds end-to-start.

Physical plan: the same explicit partitioned pattern as the ordered join —
one ``map_batches`` adds ``_shard = hash(key) % P``, one int-keyed shuffle,
then each shard sorts once and evaluates the whole pattern with ~L shifted
numpy comparisons (no per-row Python, no per-key loop).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

US = 1_000_000


def _match_group(
    group: pa.Table,
    pattern: Sequence[str],
    within_us: int | None,
    key_col: str,
    ts_col: str,
    event_col: str,
    tie_col: str,
    contiguity: str = "strict",
) -> pa.Table:
    """Vectorized multi-key sequence scan over one shard."""
    L = len(pattern)
    idx = pc.sort_indices(
        group,
        sort_keys=[
            (key_col, "ascending"),
            (ts_col, "ascending"),
            (tie_col, "ascending"),
        ],
    )
    g = group.take(idx).combine_chunks()
    n = g.num_rows
    empty = pa.table(
        {
            key_col: pa.array([], g[key_col].type),
            "start_ts_us": pa.array([], pa.int64()),
            "end_ts_us": pa.array([], pa.int64()),
            "start_event_id": pa.array([], pa.int64()),
            "end_event_id": pa.array([], pa.int64()),
            "span_us": pa.array([], pa.int64()),
        }
    )
    if n < L:
        return empty
    et = g[event_col].to_numpy(zero_copy_only=False)
    ts = pc.cast(pc.cast(g[ts_col], pa.timestamp("us")), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    tie = g[tie_col].to_numpy(zero_copy_only=False)
    codes = (
        pc.dictionary_encode(g[key_col])
        .combine_chunks()
        .indices.to_numpy(zero_copy_only=False)
    )
    if contiguity == "strict":
        m = n - L + 1
        ok = np.ones(m, bool)
        for j, step in enumerate(pattern):
            ok &= et[j : m + j] == step
        ok &= codes[:m] == codes[L - 1 :]  # whole window inside one key
        if within_us is not None:
            ok &= (ts[L - 1 :] - ts[:m]) <= within_us
        starts = np.flatnonzero(ok)
        ends = starts + L - 1
    else:  # skip-till-next-match
        # key segments are contiguous after the sort, so "next occurrence of
        # step s after row i within i's key" = first global position of s
        # after i, valid iff it lies before the segment end — one
        # searchsorted per step, no per-key loop
        seg_b = np.flatnonzero(np.diff(codes) != 0) + 1
        seg_ends = np.concatenate((seg_b, [n]))  # exclusive
        row_end = np.repeat(seg_ends, np.diff(np.concatenate(([0], seg_ends))))
        cur = np.flatnonzero(et == pattern[0])  # candidate current positions
        starts = cur
        alive = np.ones(len(cur), bool)
        for step in pattern[1:]:
            pos = np.flatnonzero(et == step)
            if len(pos) == 0:
                alive[:] = False
                break
            nxt = np.searchsorted(pos, cur + 1)
            hit = nxt < len(pos)
            cand = np.where(hit, pos[np.minimum(nxt, len(pos) - 1)], n)
            alive &= hit & (cand < row_end[np.minimum(cur, n - 1)])
            cur = cand
        ends = cur
        if within_us is not None:
            safe_ends = np.minimum(ends, n - 1)
            alive &= (ts[safe_ends] - ts[np.minimum(starts, n - 1)]) <= within_us
        starts = starts[alive]
        ends = ends[alive]
    return pa.table(
        {
            key_col: g[key_col].take(pa.array(starts, pa.int64())),
            "start_ts_us": pa.array(ts[starts], pa.int64()),
            "end_ts_us": pa.array(ts[ends], pa.int64()),
            "start_event_id": pa.array(tie[starts].astype(np.int64), pa.int64()),
            "end_event_id": pa.array(tie[ends].astype(np.int64), pa.int64()),
            "span_us": pa.array(ts[ends] - ts[starts], pa.int64()),
        }
    )


def _absence_group(
    group: pa.Table,
    first: str,
    absent: str,
    within_us: int,
    key_col: str,
    ts_col: str,
    event_col: str,
    tie_col: str,
) -> pa.Table:
    """Vectorized absence scan: rows of ``first`` with NO ``absent`` event of
    the same key in (ts, ts + within]."""
    idx = pc.sort_indices(
        group,
        sort_keys=[
            (key_col, "ascending"),
            (ts_col, "ascending"),
            (tie_col, "ascending"),
        ],
    )
    g = group.take(idx).combine_chunks()
    n = g.num_rows
    if n == 0:
        return pa.table(
            {
                key_col: pa.array([], g[key_col].type),
                "ts_us": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "deadline_us": pa.array([], pa.int64()),
            }
        )
    et = g[event_col].to_numpy(zero_copy_only=False)
    ts = pc.cast(pc.cast(g[ts_col], pa.timestamp("us")), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    tie = g[tie_col].to_numpy(zero_copy_only=False)
    codes = (
        pc.dictionary_encode(g[key_col])
        .combine_chunks()
        .indices.to_numpy(zero_copy_only=False)
    )
    seg_b = np.flatnonzero(np.diff(codes) != 0) + 1
    seg_ends = np.concatenate((seg_b, [n]))
    row_end = np.repeat(seg_ends, np.diff(np.concatenate(([0], seg_ends))))

    starts = np.flatnonzero(et == first)
    pos = np.flatnonzero(et == absent)
    if len(pos) == 0:
        hit = np.zeros(len(starts), bool)
    else:
        nxt = np.searchsorted(pos, starts + 1)
        in_range = nxt < len(pos)
        cand = pos[np.minimum(nxt, len(pos) - 1)]
        hit = (
            in_range
            & (cand < row_end[starts])
            & (ts[np.minimum(cand, n - 1)] - ts[starts] <= within_us)
        )
    keep = starts[~hit]
    return pa.table(
        {
            key_col: g[key_col].take(pa.array(keep, pa.int64())),
            "ts_us": pa.array(ts[keep], pa.int64()),
            "event_id": pa.array(tie[keep].astype(np.int64), pa.int64()),
            "deadline_us": pa.array(ts[keep] + within_us, pa.int64()),
        }
    )


def detect_absence(
    ds: ray.data.Dataset,
    first: str,
    absent: str,
    within_s: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    tie_col: str = "event_id",
    n_shards: int | None = None,
    exchange: str | None = None,
) -> ray.data.Dataset:
    """CEP absence / timeout pattern: every ``first`` event NOT followed by an
    ``absent`` event of the same key within ``within_s`` seconds (ties: an
    ``absent`` at exactly ts+within still counts as followed; an ``absent`` at
    the same (ts, tie)-order position after the trigger counts).

    NOTE: on an unbounded stream this fires once the watermark passes
    ts+within; in this batch/replay form the end of input is the horizon.
    """
    from statefulstreamprocessor_ray.functions.ops import shard_map

    within_us = int(within_s * US)

    def fn(group: pa.Table) -> pa.Table:
        return _absence_group(
            group.drop_columns(["_shard"]),
            first,
            absent,
            within_us,
            key_col,
            ts_col,
            event_col,
            tie_col,
        )

    return shard_map(ds, key_col, fn, n_shards, exchange=exchange)


def match_sequence(
    ds: ray.data.Dataset,
    pattern: Sequence[str],
    within_s: float | None = None,
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    tie_col: str = "event_id",
    n_shards: int | None = None,
    contiguity: str = "strict",
    exchange: str | None = None,
) -> ray.data.Dataset:
    """Detect ``pattern`` per key (see module docstring for the two
    contiguity modes).

    Returns one row per match: (key, start_ts_us, end_ts_us, start_event_id,
    end_event_id, span_us). Overlapping matches are all reported.
    """
    if len(pattern) < 1:
        raise ValueError("pattern must have at least one step")
    if contiguity not in ("strict", "skip"):
        raise ValueError("contiguity must be 'strict' or 'skip'")
    from statefulstreamprocessor_ray.functions.ops import shard_map

    within_us = int(within_s * US) if within_s is not None else None
    pat = list(pattern)

    def fn(group: pa.Table) -> pa.Table:
        return _match_group(
            group.drop_columns(["_shard"]),
            pat,
            within_us,
            key_col,
            ts_col,
            event_col,
            tie_col,
            contiguity,
        )

    return shard_map(ds, key_col, fn, n_shards, exchange=exchange)
