"""Ordered two-stream join as a Ray Data stage.

The reference runs one LocalStreamBuffer per process fed by a Kafka poll loop
(``05_LocalStreamBuffer/ts_join_with_kafka_eos.py:119-183``). Here the same
per-key state machine (``state/stream_buffer.py``) replays each key group of a
hash-partitioned Dataset:

    tagged-events ──groupby(key)──> map_groups(replay) ──> joined rows

The groupby is the pipeline's single wide (all-to-all) step; everything else
is embarrassingly parallel ``map_batches``. Within a group the deterministic
ingestion order is the pinned sort (ts, stream_side, tie) — FIXTURES.md T1.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from statefulstreamprocessor_ray.functions.streams import StreamSpec, derive_streams
from statefulstreamprocessor_ray.state.stream_buffer import OrderedJoinState
from statefulstreamprocessor_ray.state.vectorized import sorted_replay_pairs

_CASE_DICT = np.array(["JR1", "JR2", "JS2"])


def replay_join_table(
    group: pa.Table,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    tie_col: str = "turn_idx",
    payload_cols: Sequence[str] = ("turn_idx", "text", "tool"),
    delta_us: int | None = None,
    side_col: str = "stream_side",
    presorted: bool = False,
) -> pa.Table:
    """Replay one key group through the ordered-join state machine.

    Emits one row per joined pair with ``r_*``/``s_*`` prefixed payloads (the
    default-merge projection analog, reference ``local_stream_buffer.py:383-389``),
    plus ``join_case`` and a per-key ``emit_seq`` pinning stable order.
    """
    if not presorted:
        idx = pc.sort_indices(
            group,
            sort_keys=[(ts_col, "ascending"), (side_col, "ascending"), (tie_col, "ascending")],
        )
        group = group.take(idx)
    group = group.combine_chunks()

    ts_us = pc.cast(group[ts_col], pa.int64()).to_numpy(zero_copy_only=False).tolist()
    sides = group[side_col].to_numpy(zero_copy_only=False).tolist()

    st = OrderedJoinState(delta_time=delta_us)
    ingest = st.ingest
    for i, side in enumerate(sides):
        ingest(side, ts_us[i], i)
    left_idx, right_idx, cases = st.drain()

    lt = group.take(pa.array(left_idx, pa.int64()))
    rt = group.take(pa.array(right_idx, pa.int64()))
    cols: dict[str, pa.Array | pa.ChunkedArray] = {key_col: lt[key_col]}
    cols["r_ts"] = lt[ts_col]
    for c in payload_cols:
        cols[f"r_{c}"] = lt[c]
    cols["s_ts"] = rt[ts_col]
    for c in payload_cols:
        cols[f"s_{c}"] = rt[c]
    cols["join_case"] = pa.array(_CASE_DICT[np.asarray(cases, dtype=np.int8)] if cases else [], pa.string())
    cols["emit_seq"] = pa.array(np.arange(len(left_idx), dtype=np.int64))
    return pa.table(cols)


def replay_join_multikey(
    shard: pa.Table,
    key_col: str,
    ts_col: str,
    tie_col: str,
    payload_cols: Sequence[str],
    delta_us: int | None,
    side_col: str = "stream_side",
) -> pa.Table:
    """Replay a whole hash shard (many keys) in one call.

    One vectorized sort by (key, ts, side, tie), key-run boundaries via
    dictionary codes, then the tight per-key state-machine loop; a single
    ``take`` materializes all pairs. Amortizes per-group overhead that makes
    one-map_groups-call-per-conv slow at millions of keys.
    """
    idx = pc.sort_indices(
        shard,
        sort_keys=[
            (key_col, "ascending"),
            (ts_col, "ascending"),
            (side_col, "ascending"),
            (tie_col, "ascending"),
        ],
    )
    shard = shard.take(idx).combine_chunks()
    n = shard.num_rows
    if n == 0:
        return replay_join_table(shard, key_col, ts_col, tie_col, payload_cols, delta_us, presorted=True)

    key_codes = pc.dictionary_encode(shard[key_col]).combine_chunks().indices.to_numpy(
        zero_copy_only=False
    )
    bounds = np.flatnonzero(np.diff(key_codes) != 0) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [n]))

    ts_np = pc.cast(shard[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
    side_np = shard[side_col].to_numpy(zero_copy_only=False)
    ts_list = sides_list = None  # lazily materialized for the small-key path

    parts_l, parts_r, parts_c, parts_seq = [], [], [], []
    for i0, i1 in zip(starts.tolist(), ends.tolist()):
        if i1 - i0 >= 32:
            # closed-form vectorized replay (exact; differential-tested)
            l, r, c = sorted_replay_pairs(ts_np[i0:i1], side_np[i0:i1], delta_us)
            parts_l.append(l + i0)
            parts_r.append(r + i0)
            parts_c.append(c)
            parts_seq.append(np.arange(len(l), dtype=np.int64))
        else:
            # tiny keys: the per-row machine beats numpy call overhead
            if ts_list is None:
                ts_list = ts_np.tolist()
                sides_list = side_np.tolist()
            st = OrderedJoinState(delta_time=delta_us)
            ingest = st.ingest
            for i in range(i0, i1):
                ingest(sides_list[i], ts_list[i], i)
            l, r, c = st.drain()
            parts_l.append(np.asarray(l, dtype=np.int64))
            parts_r.append(np.asarray(r, dtype=np.int64))
            parts_c.append(np.asarray(c, dtype=np.int8))
            parts_seq.append(np.arange(len(l), dtype=np.int64))

    all_l = np.concatenate(parts_l) if parts_l else np.empty(0, np.int64)
    all_r = np.concatenate(parts_r) if parts_r else np.empty(0, np.int64)
    all_c = np.concatenate(parts_c) if parts_c else np.empty(0, np.int8)
    all_seq = np.concatenate(parts_seq) if parts_seq else np.empty(0, np.int64)

    lt = shard.take(pa.array(all_l, pa.int64()))
    rt = shard.take(pa.array(all_r, pa.int64()))
    cols: dict = {key_col: lt[key_col], "r_ts": lt[ts_col]}
    for c_ in payload_cols:
        cols[f"r_{c_}"] = lt[c_]
    cols["s_ts"] = rt[ts_col]
    for c_ in payload_cols:
        cols[f"s_{c_}"] = rt[c_]
    cols["join_case"] = pa.array(_CASE_DICT[all_c] if len(all_c) else [], pa.string())
    cols["emit_seq"] = pa.array(all_seq)
    return pa.table(cols)


def ordered_join_events(
    events: ray.data.Dataset,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    tie_col: str = "turn_idx",
    payload_cols: Sequence[str] = ("turn_idx", "text", "tool"),
    delta_time: float | None = None,
    n_shards: int | None = None,
    num_cpus: float = 1,
) -> ray.data.Dataset:
    """Join an already-tagged event stream (has ``stream_side``).

    Physical plan: one map_batches adds ``_shard = hash(key) % P`` (P defaults
    to 4x cluster CPUs), then a single int-keyed shuffle co-locates each key's
    rows, and each shard replays all its keys in one vectorized call — the
    explicit partitioned-join pattern (cheaper than a per-key groupby when
    keys number in the millions)."""
    import pandas as pd
    import ray as _ray

    delta_us = int(delta_time * 1_000_000) if delta_time else None
    if n_shards is None:
        # ~2 shards per core: enough slots to balance, few enough that the
        # sort shuffle's M x R object matrix stays small (block count is the
        # dominant cost of Ray's sort shuffle on one node).
        try:
            n_shards = max(8, int(_ray.cluster_resources().get("CPU", 8)) * 2)
        except Exception:
            n_shards = 32

    def add_shard(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_pandas()
        h = pd.util.hash_array(keys.to_numpy(), categorize=False)
        return b.append_column(
            "_shard", pa.array((h % np.uint64(n_shards)).astype(np.int32), pa.int32())
        )

    def fn(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["_shard"])
        return replay_join_multikey(
            group,
            key_col=key_col,
            ts_col=ts_col,
            tie_col=tie_col,
            payload_cols=payload_cols,
            delta_us=delta_us,
        )

    tagged = events.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("_shard").map_groups(
        fn, batch_format="pyarrow", num_cpus=num_cpus
    )


def asof_join_tagged(
    tagged: ray.data.Dataset,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    tie_col: str = "turn_idx",
    left_cols: Sequence[str] = ("turn_idx", "text"),
    right_cols: Sequence[str] = ("text",),
    side_col: str = "stream_side",
) -> ray.data.Dataset:
    """Per-key as-of join: each left record (side 0) matched with the latest
    right record (side 1) at-or-before its timestamp; ties among right records
    resolve to the last in (ts, tie) order. Vectorized searchsorted per group
    (the ``merge_asof`` pattern from the as-of join playbook)."""

    def fn(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[(ts_col, "ascending"), (tie_col, "ascending")]
        )
        group = group.take(idx).combine_chunks()
        side = group[side_col].to_numpy(zero_copy_only=False)
        t = pc.cast(pc.cast(group[ts_col], pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        li = np.flatnonzero(side == 0)
        ri = np.flatnonzero(side == 1)
        lt = group.take(pa.array(li, pa.int64()))
        cols: dict = {key_col: lt[key_col], "l_ts": lt[ts_col]}
        for c in left_cols:
            cols[f"l_{c}"] = lt[c]
        if len(ri) == 0:
            cols["r_ts"] = pa.array([None] * len(li), pa.timestamp("us"))
            for c in right_cols:
                cols[f"r_{c}"] = pa.array([None] * len(li), group.schema.field(c).type)
            return pa.table(cols)
        pos = np.searchsorted(t[ri], t[li], side="right") - 1
        matched = pos >= 0
        rt_full = group.take(pa.array(ri[np.clip(pos, 0, None)], pa.int64()))
        null_mask = pa.array(~matched)
        cols["r_ts"] = pc.if_else(
            null_mask, pa.scalar(None, pa.timestamp("us")), rt_full[ts_col].combine_chunks()
        )
        for c in right_cols:
            typ = group.schema.field(c).type
            cols[f"r_{c}"] = pc.if_else(
                null_mask, pa.scalar(None, typ), rt_full[c].combine_chunks()
            )
        return pa.table(cols)

    return tagged.groupby(key_col).map_groups(fn, batch_format="pyarrow")


def ordered_join(
    transcripts: ray.data.Dataset,
    spec: StreamSpec | None = None,
    delta_time: float | None = None,
    payload_cols: Sequence[str] = ("turn_idx", "text", "tool"),
) -> ray.data.Dataset:
    """Derive left/right streams from a transcript Dataset and join them."""
    spec = spec or StreamSpec()
    events = derive_streams(transcripts, spec)
    return ordered_join_events(
        events,
        key_col=spec.key_col,
        ts_col=spec.ts_col,
        tie_col=spec.tie_col,
        payload_cols=payload_cols,
        delta_time=delta_time,
    )
