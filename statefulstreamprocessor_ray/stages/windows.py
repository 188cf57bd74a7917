"""Event-time windows: tumbling / sliding assignment, session windows, and the
windowed interpolation join (the Flink pendant).

Reference semantics (``05_Flink_Java/.../StreamJoiner.java:87-194``):
``keyBy(machine) -> SlidingEventTimeWindows(1 s, 250 ms) -> allowedLateness(250 ms)
-> aggregate``: sort the window by event time, walk from the latest record down,
carrying the nearest following record of each stream ("INTERPOLATE ON PREVIOUS
VALUE"); for every window position where both streams have a following record,
emit power = |2π/60 · r · s| clamped to 20000 with a 5-bucket level label and
the smaller of the two timestamps.

Ray Data mapping: window assignment is a vectorized ``map_batches`` (sliding
windows replicate each row into size/slide windows); the per-(key, window)
aggregate is a ``groupby([key, window_id]).map_groups`` whose walk is computed
with numpy suffix scans — no Python per-row loop.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

US = 1_000_000

LEVEL_LABELS = [
    "  0% ...  20%",
    " 20% ...  40%",
    " 40% ...  60%",
    " 60% ...  80%",
    " 80% ... 100%",
]


def _ts_us(col) -> pa.Array:
    return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())


def assign_tumbling(
    ds: ray.data.Dataset, size_s: float, ts_col: str = "ts"
) -> ray.data.Dataset:
    """Add window_id / window_start / window_end for tumbling windows."""
    size_us = int(size_s * US)

    def fn(batch: pa.Table) -> pa.Table:
        t = _ts_us(batch[ts_col])
        wid = pc.floor(pc.divide(pc.cast(t, pa.float64()), size_us))
        wid = pc.cast(wid, pa.int64())
        start = pc.multiply(wid, size_us)
        batch = batch.append_column("window_id", wid)
        batch = batch.append_column("window_start", pc.cast(start, pa.timestamp("us")))
        batch = batch.append_column(
            "window_end", pc.cast(pc.add(start, size_us), pa.timestamp("us"))
        )
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def assign_sliding(
    ds: ray.data.Dataset, size_s: float, slide_s: float, ts_col: str = "ts"
) -> ray.data.Dataset:
    """Replicate each row into its sliding windows (window start = id·slide).

    An event at time t belongs to windows n·slide <= t < n·slide + size, i.e.
    n in [floor((t-size)/slide)+1, floor(t/slide)] — size/slide copies when
    slide divides size. Replication is a vectorized concat of shifted copies,
    the ``flat_map`` analog of Flink's window assignment.
    """
    size_us, slide_us = int(size_s * US), int(slide_s * US)
    n_copies = -(-size_us // slide_us)  # ceil

    def fn(batch: pa.Table) -> pa.Table:
        t = _ts_us(batch[ts_col]).to_numpy(zero_copy_only=False)
        n_max = np.floor_divide(t, slide_us)
        n_min = np.floor_divide(t - size_us, slide_us) + 1
        parts = []
        for i in range(n_copies):
            n = n_max - i
            mask = n >= n_min
            sel = batch.filter(pa.array(mask)) if not mask.all() else batch
            wid = n[mask]
            start = wid * slide_us
            sel = sel.append_column("window_id", pa.array(wid, pa.int64()))
            sel = sel.append_column(
                "window_start", pa.array(start, pa.int64()).cast(pa.timestamp("us"))
            )
            sel = sel.append_column(
                "window_end", pa.array(start + size_us, pa.int64()).cast(pa.timestamp("us"))
            )
            parts.append(sel)
        return pa.concat_tables(parts)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _session_map(
    ds: ray.data.Dataset,
    key_col: str,
    n_shards: int | None,
    fn,
    exchange: str | None = None,
):
    """The ordered-join `_shard` exchange — hash(key) % P, ONE task per
    partition — instead of one task per key (the per-group-overhead trap at
    millions of keys). Delegates to the shared shard_map helper ("auto"
    routing by default: measured local path under ~32 MB, sort above;
    see stages/exchange.shard_exchange_map)."""
    from statefulstreamprocessor_ray.functions.ops import shard_map

    return shard_map(ds, key_col, fn, n_shards, exchange=exchange)


def _session_breaks(group: pa.Table, gap_us: int, key_col: str, ts_col: str):
    """Sort a shard by (key, ts) and return (sorted group, ts array, per-row
    key codes, new-session mask, new-key mask) — the segmented session scan
    across ALL of the shard's keys in one vectorized pass."""
    import pandas as pd

    idx = pc.sort_indices(
        group, sort_keys=[(key_col, "ascending"), (ts_col, "ascending")]
    )
    group = group.take(idx).combine_chunks()
    t = _ts_us(group[ts_col]).to_numpy(zero_copy_only=False)
    codes, _ = pd.factorize(group[key_col].to_pandas(), sort=False)
    n = len(t)
    newk = np.ones(n, dtype=bool)
    new = np.ones(n, dtype=bool)
    if n > 1:
        newk[1:] = codes[1:] != codes[:-1]
        new[1:] = newk[1:] | (np.diff(t) > gap_us)
    return group, t, codes, new, newk


def assign_session_ids(
    ds: ray.data.Dataset,
    gap_s: float,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    n_shards: int | None = None,
    exchange: str | None = None,
) -> ray.data.Dataset:
    """Per-key session windows: a new session starts when the gap to the
    previous event exceeds ``gap_s``. Session ids restart at 0 per key;
    the whole shard is scanned in one numpy pass (no per-key tasks)."""
    gap_us = int(gap_s * US)

    def fn(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["_shard"])
        group, t, codes, new, newk = _session_breaks(group, gap_us, key_col, ts_col)
        sid = np.cumsum(new) - 1  # global session ordinal over the shard
        # rebase per key: subtract each key's first session ordinal
        key_counts = np.diff(np.append(np.flatnonzero(newk), len(t)))
        base = np.repeat(sid[newk], key_counts)
        return group.append_column("session_id", pa.array(sid - base, pa.int64()))

    return _session_map(ds, key_col, n_shards, fn, exchange=exchange)


def session_windows(
    ds: ray.data.Dataset,
    gap_s: float,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    n_shards: int | None = None,
    exchange: str | None = None,
) -> ray.data.Dataset:
    """Per-session summaries (key, session_id, session_start, session_end, n_rows),
    computed in the same per-shard pass as the assignment (no second shuffle)."""
    gap_us = int(gap_s * US)

    def fn(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["_shard"])
        group, t, codes, new, newk = _session_breaks(group, gap_us, key_col, ts_col)
        sess_first = np.flatnonzero(new)  # first row of each session
        starts = t[sess_first]
        ends = np.maximum.reduceat(t, sess_first) if len(t) else np.array([], np.int64)
        counts = np.diff(np.append(sess_first, len(t)))
        # per-key session ids: arange rebased at each key's first session
        first_sess_of_key = np.flatnonzero(newk[sess_first])
        sess_per_key = np.diff(np.append(first_sess_of_key, len(sess_first)))
        sid = np.arange(len(sess_first)) - np.repeat(
            first_sess_of_key, sess_per_key
        )
        return pa.table(
            {
                key_col: group[key_col].take(pa.array(sess_first, pa.int64())),
                "session_id": pa.array(sid, pa.int64()),
                "session_start_us": pa.array(starts, pa.int64()),
                "session_end_us": pa.array(ends, pa.int64()),
                "n_rows": pa.array(counts, pa.int64()),
            }
        )

    return _session_map(ds, key_col, n_shards, fn, exchange=exchange)


def interpolation_join_group(
    group: pa.Table,
    key_col: str,
    ts_col: str,
    tie_col: str,
    side_col: str = "stream_side",
    left_value_col: str | None = None,
    right_value_col: str | None = None,
    text_cols: tuple[str, str] | None = None,
) -> pa.Table:
    """Vectorized desc-walk interpolation join for one (key, window) group.

    For each window position idx (ascending output), pair the nearest left and
    right records at-or-after idx; emit while both exist. Numeric mode (value
    columns) computes the reference's power/clamp/level; text mode concatenates
    payloads (transcript analog).
    """
    idx = pc.sort_indices(
        group, sort_keys=[(ts_col, "ascending"), (tie_col, "ascending")]
    )
    group = group.take(idx).combine_chunks()
    n = group.num_rows
    t = _ts_us(group[ts_col]).to_numpy(zero_copy_only=False)
    side = group[side_col].to_numpy(zero_copy_only=False)

    pos = np.arange(n)
    big = n + 1
    next_l = np.minimum.accumulate(np.where(side == 0, pos, big)[::-1])[::-1]
    next_r = np.minimum.accumulate(np.where(side == 1, pos, big)[::-1])[::-1]
    valid = (next_l < big) & (next_r < big)
    li = next_l[valid]
    ri = next_r[valid]

    out_ts = np.minimum(t[li], t[ri])
    key = group[key_col].take(pa.array(np.flatnonzero(valid), pa.int64()))
    cols: dict = {
        key_col: key,
        "window_id": group["window_id"].take(pa.array(np.flatnonzero(valid), pa.int64())),
        "window_start": group["window_start"].take(pa.array(np.flatnonzero(valid), pa.int64())),
        "window_end": group["window_end"].take(pa.array(np.flatnonzero(valid), pa.int64())),
        "ts": pa.array(out_ts, pa.int64()).cast(pa.timestamp("us")),
    }

    if left_value_col is not None and right_value_col is not None:
        lv = pc.cast(group[left_value_col], pa.float64()).to_numpy(zero_copy_only=False)
        rv = pc.cast(group[right_value_col], pa.float64()).to_numpy(zero_copy_only=False)
        res = np.abs((2 * np.pi / 60) * lv[li] * rv[ri])
        res = np.minimum(res, 20000.0)
        level = (res / 20000.1 * 5).astype(np.int64)
        cols["result"] = pa.array(res, pa.float64())
        cols["level"] = pa.array(level.astype(np.int8), pa.int8())
        cols["level_label"] = pa.array(np.array(LEVEL_LABELS)[level], pa.string())
        cols["duration"] = pa.array(np.ones(len(res), dtype=np.int32), pa.int32())
    if text_cols is not None:
        lt_col, rt_col = text_cols
        lt = group[lt_col].take(pa.array(li, pa.int64()))
        rt = group[rt_col].take(pa.array(ri, pa.int64()))
        cols["r_text"] = lt
        cols["s_text"] = rt
        cols["result_text"] = pc.binary_join_element_wise(lt, rt, "x")
    return pa.table(cols)


def interpolation_join_shard(
    shard: pa.Table,
    key_col: str,
    ts_col: str,
    tie_col: str,
    side_col: str = "stream_side",
    left_value_col: str | None = None,
    right_value_col: str | None = None,
    text_cols: tuple[str, str] | None = None,
) -> pa.Table:
    """All (key, window) groups of a shard in ONE vectorized pass.

    Segmented nearest-following-record scan via an encoding trick: reversed
    ``np.minimum.accumulate`` over ``seg_rank * OFFSET + pos`` (side-matching
    rows only) never lets a later segment's candidate win inside an earlier
    one, and leakage is detected by ``value // OFFSET != seg_rank``. Replaces
    one map_groups call per window (the per-group overhead dominated at
    thousands of small windows).
    """
    idx = pc.sort_indices(
        shard,
        sort_keys=[
            (key_col, "ascending"),
            ("window_id", "ascending"),
            (ts_col, "ascending"),
            (tie_col, "ascending"),
        ],
    )
    shard = shard.take(idx).combine_chunks()
    n = shard.num_rows
    if n == 0:
        return interpolation_join_group(
            shard, key_col=key_col, ts_col=ts_col, tie_col=tie_col,
            left_value_col=left_value_col, right_value_col=right_value_col,
            text_cols=text_cols,
        )

    key_codes = pc.dictionary_encode(shard[key_col]).combine_chunks().indices.to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    wid = shard["window_id"].to_numpy(zero_copy_only=False)
    new_seg = np.ones(n, dtype=bool)
    new_seg[1:] = (np.diff(key_codes) != 0) | (np.diff(wid) != 0)
    seg_rank = np.cumsum(new_seg) - 1

    side = shard[side_col].to_numpy(zero_copy_only=False)
    t = _ts_us(shard[ts_col]).to_numpy(zero_copy_only=False)
    pos = np.arange(n, dtype=np.int64)
    offset = np.int64(n + 1)
    big = seg_rank * offset + offset - 1  # in-segment "no candidate" sentinel

    def next_of(side_val: int) -> tuple[np.ndarray, np.ndarray]:
        enc = np.where(side == side_val, seg_rank * offset + pos, big)
        acc = np.minimum.accumulate(enc[::-1])[::-1]
        ok = (acc // offset == seg_rank) & (acc % offset != offset - 1)
        return acc % offset, ok

    next_l, ok_l = next_of(0)
    next_r, ok_r = next_of(1)
    valid = ok_l & ok_r
    li = next_l[valid]
    ri = next_r[valid]
    vsel = pa.array(np.flatnonzero(valid), pa.int64())

    out_ts = np.minimum(t[li], t[ri])
    cols: dict = {
        key_col: shard[key_col].take(vsel),
        "window_id": shard["window_id"].take(vsel),
        "window_start": shard["window_start"].take(vsel),
        "window_end": shard["window_end"].take(vsel),
        "ts": pa.array(out_ts, pa.int64()).cast(pa.timestamp("us")),
    }
    if left_value_col is not None and right_value_col is not None:
        lv = pc.cast(shard[left_value_col], pa.float64()).to_numpy(zero_copy_only=False)
        rv = pc.cast(shard[right_value_col], pa.float64()).to_numpy(zero_copy_only=False)
        res = np.abs((2 * np.pi / 60) * lv[li] * rv[ri])
        res = np.minimum(res, 20000.0)
        level = (res / 20000.1 * 5).astype(np.int64)
        cols["result"] = pa.array(res, pa.float64())
        cols["level"] = pa.array(level.astype(np.int8), pa.int8())
        cols["level_label"] = pa.array(np.array(LEVEL_LABELS)[level], pa.string())
        cols["duration"] = pa.array(np.ones(len(res), dtype=np.int32), pa.int32())
    if text_cols is not None:
        lt_col, rt_col = text_cols
        lt = shard[lt_col].take(pa.array(li, pa.int64()))
        rt = shard[rt_col].take(pa.array(ri, pa.int64()))
        cols["r_text"] = lt
        cols["s_text"] = rt
        cols["result_text"] = pc.binary_join_element_wise(lt, rt, "x")
    return pa.table(cols)


def windowed_interpolation_join(
    tagged: ray.data.Dataset,
    size_s: float,
    slide_s: float | None = None,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    tie_col: str = "turn_idx",
    n_shards: int | None = None,
    exchange: str | None = None,
    **mode_cols,
) -> ray.data.Dataset:
    """Flink-pendant windowed join over a tagged (stream_side) event Dataset.

    ``slide_s=None`` gives tumbling windows. Physical plan: hash-bucket
    (key, window_id), one int-keyed exchange (linear hash repartition by
    default, ``exchange="sort"`` = the old map_groups plan), then each
    partition computes ALL its windows in one segmented vectorized pass.
    """
    import pandas as pd
    import ray as _ray

    if slide_s is None or slide_s == size_s:
        win = assign_tumbling(tagged, size_s, ts_col)
    else:
        win = assign_sliding(tagged, size_s, slide_s, ts_col)

    if n_shards is None:
        # 8 shards/core: low-cardinality shard keys collapse the sort
        # shuffle's sampled partition boundaries (see stages/join.py)
        try:
            n_shards = max(32, int(_ray.cluster_resources().get("CPU", 8)) * 8)
        except Exception:
            n_shards = 64

    def add_shard(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_pandas()
        h = pd.util.hash_array(keys.to_numpy(), categorize=False)
        h = h * np.uint64(1_000_003) + b["window_id"].to_numpy(
            zero_copy_only=False
        ).astype(np.uint64)
        return b.append_column(
            "_wshard", pa.array((h % np.uint64(n_shards)).astype(np.int32), pa.int32())
        )

    def fn(group: pa.Table) -> pa.Table:
        return interpolation_join_shard(
            group.drop_columns(["_wshard"]),
            key_col=key_col, ts_col=ts_col, tie_col=tie_col, **mode_cols,
        )

    bucketed = win.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
    from statefulstreamprocessor_ray.stages.exchange import shard_exchange_map

    return shard_exchange_map(bucketed, fn, exchange=exchange, shard_col="_wshard")
