"""Stateless per-batch operators (SURVEY.md §2.2 P-series), all vectorized.

Each function takes and returns a ``ray.data.Dataset``; the per-batch bodies
are pyarrow.compute / numpy kernels (no Python row loops). Reference cites in
each docstring point at the behavior being re-expressed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from statefulstreamprocessor_ray.schema import normalize_epoch_to_seconds

US = 1_000_000


def filter_prefix(
    ds: ray.data.Dataset, col: str, prefixes: tuple[str, ...]
) -> ray.data.Dataset:
    """P1/P7: substring/prefix pre-filter (reference ``simulator.py:31``,
    ``StreamJoiner.java:89,207-215``)."""

    def fn(b: pa.Table) -> pa.Table:
        mask = None
        for p in prefixes:
            m = pc.starts_with(b[col], p)
            mask = m if mask is None else pc.or_(mask, m)
        return b.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def drop_nulls(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    """P6: null/empty guard filter (``StreamJoiner.java:88``)."""
    return ds.map_batches(
        lambda b: b.filter(pc.is_valid(b[col])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def explode_events(ds: ray.data.Dataset) -> ray.data.Dataset:
    """P2: wide-row -> narrow-records explode (reference
    ``stream_connector.py:40-52``: one record per quantity column).

    Over the events test table the wide row's quantities are ``value`` and the
    ``props`` JSON's ``k``; each input row emits two narrow
    (event_id, quantity, result) rows via a vectorized concat — the unpivot
    form of ``flat_map``.
    """

    def fn(b: pa.Table) -> pa.Table:
        n = b.num_rows
        k = pc.extract_regex(b["props"], r'"k": (?P<k>-?\d+)')
        k_val = pc.cast(pc.struct_field(k, "k"), pa.float64())
        return pa.table(
            {
                "event_id": pa.concat_arrays(
                    [b["event_id"].combine_chunks(), b["event_id"].combine_chunks()]
                ),
                "quantity": pa.array(["value"] * n + ["k"] * n, pa.string()),
                "result": pa.concat_arrays(
                    [
                        pc.cast(b["value"], pa.float64()).combine_chunks(),
                        k_val.combine_chunks(),
                    ]
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def normalize_ts_seconds(ds: ray.data.Dataset, ts_col: str = "ts") -> ray.data.Dataset:
    """P4: timestamp normalization (``local_stream_buffer.py:70-82``): numeric
    epochs ÷1000 while >= 1e11, vectorized."""

    def fn(b: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")), pa.int64())
        sec = normalize_epoch_to_seconds(us)
        return pa.table({"event_id": b["event_id"], "ts_sec": sec})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def key_suffix(ds: ray.data.Dataset, col: str, n: int = 3) -> ray.data.Dataset:
    """P8: key-extraction scalar fn (``StreamJoiner.java:217-221``:
    ``quantity_group(q) = q[-3:]``), as the shuffle-key derivation."""

    def fn(b: pa.Table) -> pa.Table:
        # per-row negative-start slicing isn't in utf8_slice_codeunits, so
        # take the suffix by reversing twice (keys are ASCII identifiers).
        rev = pc.utf8_reverse(b[col])
        key = pc.utf8_reverse(pc.utf8_slice_codeunits(rev, 0, n))
        return b.append_column("group_key", key)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def clamp_level(ds: ray.data.Dataset, col: str = "value") -> ray.data.Dataset:
    """P11: clamp + 5-bucket level (``StreamJoiner.java:150-172``):
    clamped = min(|v|, 20000); level = int(clamped/20000.1*5)."""

    def fn(b: pa.Table) -> pa.Table:
        v = pc.cast(b[col], pa.float64()).to_numpy(zero_copy_only=False)
        clamped = np.minimum(np.abs(v), 20000.0)
        level = np.floor(clamped / 20000.1 * 5).astype(np.int32)
        return pa.table(
            {
                "event_id": b["event_id"],
                "clamped": pa.array(clamped, pa.float64()),
                "level": pa.array(level, pa.int32()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def shard_by_key(
    ds: ray.data.Dataset,
    key_cols: str | list[str],
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Append ``_shard = mix(hash(keys)) % P`` (P defaults to 8x cluster
    CPUs — enough distinct values that the sort shuffle's sampled partition
    boundaries stay balanced; see stages/join.py). THE shared shard-tagging
    step: every shard-vectorized operator funnels through here so the
    hashing/sizing policy lives in exactly one place."""
    import pandas as pd

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if n_shards is None:
        try:
            import ray as _ray

            n_shards = max(32, int(_ray.cluster_resources().get("CPU", 8)) * 8)
        except Exception:
            n_shards = 64

    def add_shard(t: pa.Table) -> pa.Table:
        h = None
        for k in keys:
            hk = pd.util.hash_array(t[k].to_pandas().to_numpy(), categorize=False)
            h = hk if h is None else (h * np.uint64(1_000_003)) ^ hk
        # splitmix finalizer: low-entropy key combinations still spread
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = h ^ (h >> np.uint64(31))
        return t.append_column(
            "_shard", pa.array((h % np.uint64(n_shards)).astype(np.int32), pa.int32())
        )

    return ds.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)


def default_exchange() -> str:
    """Re-export of :func:`stages.exchange.default_exchange` (the
    ``SSP_CORE_EXCHANGE`` A/B knob)."""
    from statefulstreamprocessor_ray.stages.exchange import default_exchange as de

    return de()


def shard_map(
    ds: ray.data.Dataset,
    key_cols: str | list[str],
    fn,
    n_shards: int | None = None,
    exchange: str | None = None,
    num_cpus: float = 1,
    batch_format: str = "pyarrow",
) -> ray.data.Dataset:
    """THE shared shard-vectorized exchange+map: tag ``_shard`` via
    :func:`shard_by_key`, then route through
    ``stages/exchange.shard_exchange_map`` — "auto" (default) measures the
    payload and takes the single-task local path under ~32 MB or the sort
    shuffle above it; "sort"/"hash" force a plan (see the routing verdict
    in shard_exchange_map's docstring for the measurements).

    fn contract: a Table/frame holding a UNION of complete key groups with
    the ``_shard`` column still attached — every caller fn groups by its
    real keys internally (they are shard-vectorized by design)."""
    from statefulstreamprocessor_ray.stages.exchange import shard_exchange_map

    sharded = shard_by_key(ds, key_cols, n_shards)
    return shard_exchange_map(
        sharded, fn, exchange=exchange, num_cpus=num_cpus, batch_format=batch_format
    )


def order_check(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> ray.data.Dataset:
    """P14: per-key monotonicity validator (``01_Simulator/checkOrder.py:8-20``):
    count of arrival-order records whose event time regressed.

    Shard-vectorized (hash(key) % P exchange, one task per shard): the shard
    sorts once by (key, seq) and counts regressions for ALL its keys in one
    numpy pass — per-key map_groups tasks would hit the task-overhead cliff
    at millions of keys."""
    import pandas as pd

    def fn(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["_shard"])
        idx = pc.sort_indices(
            group, sort_keys=[(key_col, "ascending"), (seq_col, "ascending")]
        )
        g = group.take(idx).combine_chunks()
        t = pc.cast(pc.cast(g[ts_col], pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        codes, _ = pd.factorize(g[key_col].to_pandas(), sort=False)
        n = len(t)
        newk = np.ones(n, dtype=bool)
        if n > 1:
            newk[1:] = codes[1:] != codes[:-1]
        # a regression only counts within a key: mask out key boundaries
        reg = np.zeros(n, dtype=np.int64)
        if n > 1:
            reg[1:] = (np.diff(t) < 0) & ~newk[1:]
        key_first = np.flatnonzero(newk)
        viol = np.add.reduceat(reg, key_first) if n else np.array([], np.int64)
        return pa.table(
            {
                key_col: g[key_col].take(pa.array(key_first, pa.int64())),
                "violations": pa.array(viol, pa.int64()),
            }
        )

    return shard_map(ds, key_col, fn)


def power_join_projection(
    batch: pa.Table, left_col: str = "r_value", right_col: str = "s_value"
) -> pa.Table:
    """P9: the reference's custom ``join_function`` blueprint
    (``ts_join_with_kafka_eos.py:86-106``): power = |2π/60 · speed · torque|,
    output ts = midpoint of the pair — as a vectorized batch UDF usable as
    ``JoinSpec.join_fn``."""
    lv = pc.cast(batch[left_col], pa.float64()).to_numpy(zero_copy_only=False)
    rv = pc.cast(batch[right_col], pa.float64()).to_numpy(zero_copy_only=False)
    lt = pc.cast(pc.cast(batch["r_ts"], pa.timestamp("us")), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    rt = pc.cast(pc.cast(batch["s_ts"], pa.timestamp("us")), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    res = np.abs((2 * np.pi / 60) * lv * rv)
    key_col = batch.schema.names[0]
    return pa.table(
        {
            key_col: batch[key_col],
            "ts": pa.array((lt + rt) // 2, pa.int64()).cast(pa.timestamp("us")),
            "result": pa.array(res, pa.float64()),
        }
    )


def word_count(ds: ray.data.Dataset, col: str = "text") -> ray.data.Dataset:
    """P16: grouped word count (``05_Flink_Python/WordCount.py:45-49``),
    scale-shaped: per-batch partial counts (combiner) then one int-shard
    group-sum over (word, partial) rows instead of shuffling every token."""

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        toks = (
            pc.split_pattern_regex(pc.utf8_lower(b[col]), r"\s+")
            .combine_chunks()
            .flatten()
        )
        s = pd.Series(toks.to_pandas())
        s = s[s != ""]
        vc = s.value_counts()
        return pa.table(
            {
                "word": pa.array(vc.index.astype(str), pa.string()),
                "partial": pa.array(vc.values.astype(np.int64), pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return sharded_group_sum(partials, keys=["word"], sums={"partial": "n"})


def sharded_group_sum(
    ds: ray.data.Dataset,
    keys: list[str],
    sums: dict[str, str],
    n_shards: int | None = None,
    dropna: bool = True,
) -> ray.data.Dataset:
    """Grouped sum via ONE int32-shard exchange + a per-shard pandas
    group-sum — measured ~3x faster than the generic multi-column
    sort-shuffle ``groupby().aggregate(Sum)`` at sf0.1 (the sort pays
    quantile sampling + wide-key comparisons that a fixed-key hash shard
    doesn't need). ``sums`` maps input column -> output name; callers
    pre-aggregate per batch (map-side combiner) before calling, so the
    exchange carries partials, not rows. ``dropna=False`` keeps NULL key
    groups (SQL GROUP BY semantics) — the default drops them (pandas
    semantics; most callers pre-filter nulls)."""
    import pandas as pd

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(keys, sort=False, as_index=False, dropna=dropna)[
            list(sums)
        ].sum()
        return out.rename(columns=sums)

    return shard_map(ds, keys, agg, n_shards, batch_format="pandas")
