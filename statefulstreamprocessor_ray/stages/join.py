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


from dataclasses import dataclass


@dataclass
class JoinSpec:
    """Config-surface parity with the reference ``StreamBuffer`` constructor
    (``local_stream_buffer.py:110-167``). ``instant_emit=False`` and
    ``max_latency`` are declared-but-unimplemented in the reference (they
    raise) — we reserve them identically. ``join_fn`` is the batch-UDF form of
    the reference's ``join_function`` (a projection over joined batches);
    ``buffer_results=False`` drops the output rows (side-effect-only runs)."""

    instant_emit: bool = True
    delta_time: float | None = None
    max_latency: float | None = None
    buffer_results: bool = True
    join_fn: "Callable[[pa.Table], pa.Table] | None" = None

    def __post_init__(self):
        if not self.instant_emit:
            raise NotImplementedError(
                "trigger-based emission is reserved (reference parity: "
                "local_stream_buffer.py:155-157 raises the same way)"
            )
        if self.max_latency:
            raise NotImplementedError(
                "max_latency is reserved (reference parity: "
                "local_stream_buffer.py:164-166 raises the same way)"
            )


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
    hot_key_threshold: int | None = None,
    hot_chunk_rows: int = 250_000,
    exchange: str | None = None,
) -> ray.data.Dataset:
    """Join an already-tagged event stream (has ``stream_side``).

    Physical plan: one map_batches adds ``_shard = hash(key) % P`` (P defaults
    to 2x cluster CPUs), then a single int-keyed exchange co-locates each
    key's rows, and each partition replays all its keys in one vectorized
    call — the explicit partitioned-join pattern (cheaper than a per-key
    groupby when keys number in the millions).

    ``exchange``: routed via ``stages/exchange.shard_exchange_map`` —
    "auto" (default) measures the tagged payload and takes the single-task
    local path under ~32 MB or the sort shuffle (on the materialized
    input) above it; "sort"/"hash" force a plan. The round-5 measurements
    behind the routing (hash refuted at the flagship's own volume points)
    live in shard_exchange_map's docstring.

    Skew: with ``hot_key_threshold`` set, keys whose row count exceeds it are
    routed through :func:`salted_hot_key_join` — time-chunked with exact
    carry-suffix warm-up — so one hot conversation no longer serializes a
    whole shard. Output (including per-key emit_seq) is byte-identical to the
    unsalted plan (tested on FIXTURES.md F9)."""
    import pandas as pd
    import ray as _ray

    delta_us = int(delta_time * 1_000_000) if delta_time else None

    if hot_key_threshold is not None:
        # the > threshold filter runs IN the Dataset, so the driver frame
        # holds only the hot tail (O(hot keys)), never every key's count
        counts = (
            events.select_columns([key_col])
            .groupby(key_col)
            .count()
            .map_batches(
                lambda t: t.filter(pc.greater(t["count()"], hot_key_threshold)),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .to_pandas()
        )
        hot = set(counts[key_col]) if len(counts) else set()
        if hot:
            def in_hot(b: pa.Table, keep: bool) -> pa.Table:
                mask = pc.is_in(b[key_col], value_set=pa.array(sorted(hot)))
                return b.filter(mask if keep else pc.invert(mask))

            cold = events.map_batches(
                lambda b: in_hot(b, False), batch_format="pyarrow", zero_copy_batch=True
            )
            hot_ds = events.map_batches(
                lambda b: in_hot(b, True), batch_format="pyarrow", zero_copy_batch=True
            )
            cold_out = ordered_join_events(
                cold, key_col, ts_col, tie_col, payload_cols, delta_time,
                n_shards, num_cpus, hot_key_threshold=None, exchange=exchange,
            )
            hot_out = salted_hot_key_join(
                hot_ds, key_col, ts_col, tie_col, payload_cols, delta_us,
                chunk_rows=hot_chunk_rows,
            )
            out_cols = (
                [key_col, "r_ts"]
                + [f"r_{c}" for c in payload_cols]
                + ["s_ts"]
                + [f"s_{c}" for c in payload_cols]
                + ["join_case", "emit_seq"]
            )
            return cold_out.select_columns(out_cols).union(
                hot_out.select_columns(out_cols)
            )
    if n_shards is None:
        # ~8 shards per core = ~4x the conventional 2-blocks-per-core input
        # block count. Ray's sort shuffle cuts output partitions from sampled
        # key quantiles; with too FEW distinct shard values per partition the
        # boundaries collapse (empty partitions + mega-partitions: measured
        # 19.6s -> 5.2s on a 40M-turn corpus going 64 -> 256 shards at 32
        # CPUs, while a 10M corpus pays <15%). Shard count is NOT block
        # count — the object-matrix cost follows blocks, the balance follows
        # shards-per-partition.
        try:
            n_shards = max(32, int(_ray.cluster_resources().get("CPU", 8)) * 8)
        except Exception:
            n_shards = 64

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

    # prune to the columns the replay needs BEFORE the exchange — derived
    # streams may still carry source columns (e.g. transcript `role`) that
    # would otherwise ride the all-to-all shuffle for nothing
    needed = list(
        dict.fromkeys(
            [key_col, ts_col, tie_col, "stream_side", *payload_cols]
        )
    )
    events = events.select_columns(needed)
    tagged = events.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
    from statefulstreamprocessor_ray.stages.exchange import shard_exchange_map

    return shard_exchange_map(tagged, fn, exchange=exchange, num_cpus=num_cpus)


def salted_hot_key_join(
    hot_events: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    tie_col: str,
    payload_cols: Sequence[str],
    delta_us: int | None,
    chunk_rows: int = 250_000,
    side_col: str = "stream_side",
    plan: str = "timecut",
) -> ray.data.Dataset:
    """Exact parallel join of hot (skewed) keys by time-chunking.

    SURVEY.md §4 skew design, made exact by the closed-form carry invariant
    (state/vectorized.py): a chunk's replay only needs the carry suffix of its
    prefix — everything from the last record of the side whose last record is
    older. Plan:

    1. per hot key: assign chunk ids every ``chunk_rows`` sorted rows and
       *duplicate* each chunk's carry-suffix rows into it as warm-up
       (vectorized; no replay here),
    2. shuffle by (key, chunk): each chunk replays independently, keeping only
       pairs triggered by non-warm-up rows,
    3. exact global ``emit_seq`` from per-(key, chunk) pair-count prefix sums
       broadcast to a stateless map — no per-key gather of the output (the
       former rank-per-key pass would hold a 10^9-pair key in one task).

    Crossover note (measured): the vectorized replay runs ~10M rows/s/core,
    so a key only bottlenecks its shard once its rows rival (total rows /
    shards) x ~constant — on one node, salting an 8M-row hot key among 10M
    total LOSES (extra count pass + two filter scans outweigh the serial
    replay it removes). Enable ``hot_key_threshold`` for 10^8+-row keys or
    expensive ``join_fn``s, where serial replay minutes dominate.

    ``plan``: step 1 has two implementations.
    - ``"timecut"`` (default, SURVEY §4's time-cut design): NO per-key
      gather anywhere. Three map_batches passes — (a) per-key count/min/max
      -> uniform time cuts, (b) per-(key, chunk, side) max-ts partials ->
      per-cut carry thresholds ``thr[j] = min over sides of (that side's
      last ts before cut j)`` (= ts at ``carry_start``; prefix maxes are
      non-decreasing so thresholds are sorted), (c) chunk assignment +
      forward warm-up duplication ``j in (chunk, hi]`` via two
      searchsorteds. The warm-up is a SUPERSET of the exact carry suffix
      (ties on ts included), which is safe: a longer warm-up replays to the
      identical state at the cut, and warm-triggered pairs are dropped.
    - ``"gather"``: one task per hot key sorts the key's rows and computes
      exact ``carry_start`` suffixes — simpler, but a 10^9-row key holds
      10^9 rows in one planning task (kept for differential testing).
    """
    from statefulstreamprocessor_ray.state.vectorized import (
        carry_start,
        sorted_replay_pairs,
    )

    def plan_chunks(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[(ts_col, "ascending"), (side_col, "ascending"), (tie_col, "ascending")],
        )
        group = group.take(idx).combine_chunks()
        n = group.num_rows
        ts = pc.cast(pc.cast(group[ts_col], pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        side = group[side_col].to_numpy(zero_copy_only=False)
        cuts = list(range(0, n, chunk_rows)) + [n]
        take_idx, chunk_ids, warm_flags = [], [], []
        for k in range(len(cuts) - 1):
            c0, c1 = cuts[k], cuts[k + 1]
            if k > 0:
                cs = carry_start(ts[:c0], side[:c0])
                warm = np.arange(cs, c0, dtype=np.int64)
                take_idx.append(warm)
                chunk_ids.append(np.full(len(warm), k, np.int64))
                warm_flags.append(np.ones(len(warm), np.int8))
            real = np.arange(c0, c1, dtype=np.int64)
            take_idx.append(real)
            chunk_ids.append(np.full(len(real), k, np.int64))
            warm_flags.append(np.zeros(len(real), np.int8))
        ti = np.concatenate(take_idx)
        out = group.take(pa.array(ti, pa.int64()))
        out = out.append_column("_chunk", pa.array(np.concatenate(chunk_ids)))
        out = out.append_column("_warm", pa.array(np.concatenate(warm_flags)))
        return out

    def replay_chunk(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[(ts_col, "ascending"), (side_col, "ascending"), (tie_col, "ascending")],
        )
        group = group.take(idx).combine_chunks()
        ts = pc.cast(pc.cast(group[ts_col], pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        side = group[side_col].to_numpy(zero_copy_only=False)
        warm = group["_warm"].to_numpy(zero_copy_only=False)
        l, r, c, t = sorted_replay_pairs(ts, side, delta_us, return_trigger=True)
        keep = warm[t] == 0
        l, r, c = l[keep], r[keep], c[keep]
        lt = group.take(pa.array(l, pa.int64()))
        rt = group.take(pa.array(r, pa.int64()))
        cols: dict = {key_col: lt[key_col], "r_ts": lt[ts_col]}
        for pcol in payload_cols:
            cols[f"r_{pcol}"] = lt[pcol]
        cols["s_ts"] = rt[ts_col]
        for pcol in payload_cols:
            cols[f"s_{pcol}"] = rt[pcol]
        cols["join_case"] = pa.array(
            _CASE_DICT[c] if len(c) else [], pa.string()
        )
        cols["_chunk"] = lt["_chunk"]
        cols["_local_seq"] = pa.array(np.arange(len(l), dtype=np.int64))
        return pa.table(cols)

    import pandas as _pd
    import ray as _ray2

    NEG = -(2**62)

    def _ts_i64(b: pa.Table) -> np.ndarray:
        return pc.cast(pc.cast(b[ts_col], pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )

    def _timecut_plan(ds: ray.data.Dataset) -> ray.data.Dataset:
        # pass (a): per-key count/min/max ts — tiny partials, driver merge
        def p_stats(b: pa.Table) -> pa.Table:
            df = _pd.DataFrame({"k": b[key_col].to_pandas(), "t": _ts_i64(b)})
            g = df.groupby("k")["t"].agg(["count", "min", "max"]).reset_index()
            return pa.table(
                {
                    "k": pa.array(g["k"]),
                    "n": pa.array(g["count"].to_numpy(np.int64)),
                    "tmin": pa.array(g["min"].to_numpy(np.int64)),
                    "tmax": pa.array(g["max"].to_numpy(np.int64)),
                }
            )

        st = (
            ds.map_batches(p_stats, batch_format="pyarrow")
            .to_pandas()
            .groupby("k")
            .agg(n=("n", "sum"), tmin=("tmin", "min"), tmax=("tmax", "max"))
        )
        cuts: dict = {}
        for k, row in st.iterrows():
            n_chunks = max(1, -(-int(row.n) // chunk_rows))
            cuts[k] = (
                np.linspace(row.tmin, row.tmax, n_chunks + 1)[1:-1].astype(np.int64)
                if n_chunks > 1
                else np.array([], np.int64)
            )
        cuts_ref = _ray2.put(cuts)

        # pass (b): per (key, chunk, side) max ts — partials, driver merge
        def p_side_max(b: pa.Table) -> pa.Table:
            cc = _ray2.get(cuts_ref)
            t = _ts_i64(b)
            keys = b[key_col].to_pandas().to_numpy()
            side = b[side_col].to_numpy(zero_copy_only=False)
            out_k, out_c, out_s, out_t = [], [], [], []
            for k in _pd.unique(keys):
                m = keys == k
                c = np.searchsorted(cc[k], t[m], side="right")
                df = _pd.DataFrame({"c": c, "s": side[m], "t": t[m]})
                g = df.groupby(["c", "s"])["t"].max().reset_index()
                out_k.extend([k] * len(g))
                out_c.append(g["c"].to_numpy(np.int64))
                out_s.append(g["s"].to_numpy(np.int64))
                out_t.append(g["t"].to_numpy(np.int64))
            return pa.table(
                {
                    "k": pa.array(out_k),
                    "c": pa.array(
                        np.concatenate(out_c) if out_c else np.array([], np.int64)
                    ),
                    "s": pa.array(
                        np.concatenate(out_s) if out_s else np.array([], np.int64)
                    ),
                    "t": pa.array(
                        np.concatenate(out_t) if out_t else np.array([], np.int64)
                    ),
                }
            )

        sm = (
            ds.map_batches(p_side_max, batch_format="pyarrow")
            .to_pandas()
            .groupby(["k", "c", "s"])["t"]
            .max()
            .reset_index()
        )
        thr: dict = {}
        for k, cut_arr in cuts.items():
            n_chunks = len(cut_arr) + 1
            pm = np.full((2, n_chunks), NEG, np.int64)  # per-side per-chunk max
            sub = sm[sm["k"] == k]
            pm[sub["s"].to_numpy(np.int64), sub["c"].to_numpy(np.int64)] = sub[
                "t"
            ].to_numpy(np.int64)
            # prefix max per side over chunks < j, then min across sides
            pref = np.maximum.accumulate(pm, axis=1)
            thr[k] = np.minimum(pref[0, : n_chunks - 1], pref[1, : n_chunks - 1])

        plan_ref = _ray2.put((cuts, thr))

        # pass (c): chunk assignment + forward warm-up duplication
        def p_assign(b: pa.Table) -> pa.Table:
            cc, tt = _ray2.get(plan_ref)
            t = _ts_i64(b)
            keys = b[key_col].to_pandas().to_numpy()
            pieces = []
            for k in _pd.unique(keys):
                rows = np.flatnonzero(keys == k)
                c = np.searchsorted(cc[k], t[rows], side="right").astype(np.int64)
                sub = b.take(pa.array(rows, pa.int64()))
                real = sub.append_column("_chunk", pa.array(c))
                real = real.append_column(
                    "_warm", pa.array(np.zeros(len(rows), np.int8))
                )
                pieces.append(real)
                # dup into chunks j in (c, hi]: thr is sorted (prefix maxes
                # are non-decreasing), so hi = #thresholds <= ts
                hi = np.searchsorted(tt[k], t[rows], side="right").astype(np.int64)
                counts = np.maximum(hi - c, 0)
                total = int(counts.sum())
                if total:
                    cum = np.concatenate(([0], np.cumsum(counts)))
                    rep = np.repeat(np.arange(len(rows)), counts)
                    dup_j = (
                        np.arange(total) - np.repeat(cum[:-1], counts)
                        + np.repeat(c + 1, counts)
                    )
                    dup = sub.take(pa.array(rep, pa.int64()))
                    dup = dup.append_column("_chunk", pa.array(dup_j))
                    dup = dup.append_column(
                        "_warm", pa.array(np.ones(total, np.int8))
                    )
                    pieces.append(dup)
            if not pieces:
                e = b.append_column("_chunk", pa.array([], pa.int64()))
                return e.append_column("_warm", pa.array([], pa.int8()))
            return pa.concat_tables(pieces)

        return ds.map_batches(p_assign, batch_format="pyarrow", zero_copy_batch=True)

    if plan == "timecut":
        planned = _timecut_plan(hot_events)
    else:
        planned = hot_events.groupby(key_col).map_groups(
            plan_chunks, batch_format="pyarrow"
        )
    chunked = planned.groupby([key_col, "_chunk"]).map_groups(
        replay_chunk, batch_format="pyarrow"
    ).materialize()  # consumed twice: per-chunk counts, then seq assignment

    # exact global emit_seq WITHOUT gathering a key's pairs into one task:
    # per-(key, chunk) pair counts are a tiny aggregate; their prefix sums are
    # each chunk's emit_seq offset, broadcast once and added per batch.
    import pandas as pd
    import ray as _ray

    def _counts(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"k": b[key_col].to_pandas(), "c": b["_chunk"].to_pandas()}
        )
        vc = df.groupby(["k", "c"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "k": pa.array(vc["k"]),
                "c": pa.array(vc["c"], pa.int64()),
                "n": pa.array(vc["n"], pa.int64()),
            }
        )

    counts = (
        chunked.map_batches(_counts, batch_format="pyarrow")
        .to_pandas()
        .groupby(["k", "c"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    counts["offset"] = counts.groupby("k")["n"].cumsum() - counts["n"]
    offsets = {
        (k, int(c)): int(o)
        for k, c, o in zip(counts["k"], counts["c"], counts["offset"])
    }
    ref = _ray.put(offsets)

    def add_seq(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            out = b.drop_columns(["_chunk", "_local_seq"])
            return out.append_column("emit_seq", pa.array([], pa.int64()))
        offs = _ray.get(ref)
        cs = b["_chunk"].to_numpy(zero_copy_only=False)
        ls = b["_local_seq"].to_numpy(zero_copy_only=False)
        k0, kN = b[key_col][0].as_py(), b[key_col][b.num_rows - 1].as_py()
        if k0 == kN and cs[0] == cs[-1]:
            # fast path: map_groups emits one (key, chunk) per block
            base = np.full(b.num_rows, offs[(k0, int(cs[0]))], np.int64)
        else:
            ks = b[key_col].to_pylist()
            base = np.fromiter(
                (offs[(k, int(c))] for k, c in zip(ks, cs)), np.int64, len(ks)
            )
        out = b.drop_columns(["_chunk", "_local_seq"])
        return out.append_column("emit_seq", pa.array(base + ls, pa.int64()))

    return chunked.map_batches(add_seq, batch_format="pyarrow", zero_copy_batch=True)


def session_bounded_join(
    tagged: ray.data.Dataset,
    gap_s: float,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    tie_col: str = "turn_idx",
    payload_cols: Sequence[str] = ("turn_idx", "text", "tool"),
    delta_time: float | None = None,
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Ordered join scoped to session windows: pairs only form inside one
    per-key session (gap rule), the "assistant-turn ⋈ tool-call within a
    session window" shape. Implemented as session-id assignment fused into the
    shard replay (the session boundary splits the key into independent
    sub-keys, so the single shuffle is preserved)."""
    from statefulstreamprocessor_ray.stages.windows import assign_session_ids

    with_sessions = assign_session_ids(tagged, gap_s=gap_s, key_col=key_col, ts_col=ts_col)

    def composite(b: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(b[key_col], pa.string()),
            pc.cast(b["session_id"], pa.string()),
            "#s",
        )
        return b.append_column("_skey", key)

    keyed = with_sessions.map_batches(composite, batch_format="pyarrow", zero_copy_batch=True)
    out = ordered_join_events(
        keyed,
        key_col="_skey",
        ts_col=ts_col,
        tie_col=tie_col,
        payload_cols=tuple(payload_cols) + (key_col, "session_id"),
        delta_time=delta_time,
        n_shards=n_shards,
    )

    def project(b: pa.Table) -> pa.Table:
        b = b.append_column(key_col, b[f"r_{key_col}"])
        b = b.append_column("session_id", b["r_session_id"])
        return b.drop_columns(
            ["_skey", f"r_{key_col}", f"s_{key_col}", "r_session_id", "s_session_id"]
        )

    return out.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def asof_join_tagged(
    tagged: ray.data.Dataset,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    tie_col: str = "turn_idx",
    left_cols: Sequence[str] = ("turn_idx", "text"),
    right_cols: Sequence[str] = ("text",),
    side_col: str = "stream_side",
    n_shards: int | None = None,
    exchange: str | None = None,
) -> ray.data.Dataset:
    """Per-key as-of join: each left record (side 0) matched with the latest
    right record (side 1) at-or-before its timestamp; ties among right records
    resolve to the last in (ts, tie) order.

    Physical plan: the same ``_shard = hash(key) % P`` exchange as
    ``ordered_join_events`` (ONE task per partition, not one per key —
    per-group task overhead is the millions-of-keys trap; linear hash
    exchange by default, ``exchange="sort"`` = the old map_groups plan),
    then a single vectorized multi-key as-of inside each partition: sort by
    (key, ts, tie), then one merged lexsort of right rows and left probes
    counts, for every probe, the right rows lexicographically at-or-before
    it — a segmented ``searchsorted`` across ALL keys at once."""
    import pandas as pd

    from statefulstreamprocessor_ray.functions.ops import shard_by_key

    def fn(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["_shard"])
        idx = pc.sort_indices(
            group,
            sort_keys=[
                (key_col, "ascending"),
                (ts_col, "ascending"),
                (tie_col, "ascending"),
            ],
        )
        group = group.take(idx).combine_chunks()
        side = group[side_col].to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(group[key_col].to_pandas(), sort=False)
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
        # merged lexsort: rights sort BEFORE probes on equal (key, ts)
        # (flag 0 < 1), so a probe's rights-before count is exactly the
        # number of right rows with (k, t) <= (k_probe, t_probe) — the
        # side='right' searchsorted, segmented per key, in one pass
        k_all = np.concatenate([codes[ri], codes[li]])
        t_all = np.concatenate([t[ri], t[li]])
        flag = np.concatenate(
            [np.zeros(len(ri), np.int8), np.ones(len(li), np.int8)]
        )
        order = np.lexsort((flag, t_all, k_all))
        rights_before = np.cumsum(flag[order] == 0)
        probe_rank = np.empty(len(order), np.int64)
        probe_rank[order] = np.arange(len(order))
        count = rights_before[probe_rank[len(ri):]]  # per left probe
        # count includes rights of EARLIER keys too; matched iff the
        # count-1-th right row belongs to the probe's own key
        pos = count - 1
        matched = (count > 0) & (codes[ri][np.clip(pos, 0, None)] == codes[li])
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

    from statefulstreamprocessor_ray.functions.ops import shard_map

    return shard_map(tagged, key_col, fn, n_shards, exchange=exchange)


def ordered_join(
    transcripts: ray.data.Dataset,
    spec: StreamSpec | None = None,
    delta_time: float | None = None,
    payload_cols: Sequence[str] = ("turn_idx", "text", "tool"),
    join_spec: JoinSpec | None = None,
    hot_key_threshold: int | None = None,
) -> ray.data.Dataset:
    """Derive left/right streams from a transcript Dataset and join them.

    ``join_spec`` carries the reference's extension surface: ``delta_time``
    (overridden by the explicit arg when both set), a ``join_fn`` batch
    projection applied to the joined rows, and ``buffer_results``."""
    spec = spec or StreamSpec()
    js = join_spec or JoinSpec()
    if delta_time is None:
        delta_time = js.delta_time
    events = derive_streams(transcripts, spec)
    out = ordered_join_events(
        events,
        key_col=spec.key_col,
        ts_col=spec.ts_col,
        tie_col=spec.tie_col,
        payload_cols=payload_cols,
        delta_time=delta_time,
        hot_key_threshold=hot_key_threshold,
    )
    if js.join_fn is not None:
        out = out.map_batches(js.join_fn, batch_format="pyarrow", zero_copy_batch=True)
    if not js.buffer_results:
        out = out.map_batches(
            lambda b: b.slice(0, 0), batch_format="pyarrow", zero_copy_batch=True
        )
    return out
