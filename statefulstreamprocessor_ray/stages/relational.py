"""Plain relational equi-joins — the attach-metadata primitive a training
pipeline needs around the stream operators (join scores onto documents,
embeddings onto ids, shard stats onto outputs):

- ``broadcast_join``: small side collected once, shipped via ``ray.put``,
  merged per batch in the workers — the 100-TB shape when one side fits in
  memory (lookup tables, per-source aggregates). No shuffle.
- ``partitioned_join``: both sides large — ONE int-keyed co-shuffle
  (``_shard = hash(key) % P``, the ordered-join exchange) and an Arrow
  (Acero) hash-join per shard. The honest fallback when neither side
  broadcasts. The merge is done in Arrow, not pandas: pandas widens
  int columns with NaN-backed nulls to float64 (silently lossy above
  2^53 and shard-hash-incompatible with the int representation), while
  Arrow keeps each side's declared types end to end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _collect_small(ds: ray.data.Dataset) -> pd.DataFrame:
    parts = [b for b in ds.iter_batches(batch_size=65536, batch_format="pandas")]
    return (
        pd.concat(parts, ignore_index=True)
        if parts
        else pd.DataFrame()
    )


def broadcast_join(
    big: ray.data.Dataset,
    small: ray.data.Dataset | pd.DataFrame,
    left_on: str,
    right_on: str | None = None,
    how: str = "inner",
) -> ray.data.Dataset:
    """Join a large Dataset with a SMALL side (lookup-table scale): the small
    frame is put in the object store once and read zero-copy per actor;
    each batch does one vectorized pandas merge. ``how`` in inner/left."""
    import ray as _ray

    if how not in ("inner", "left"):
        raise ValueError("broadcast_join supports how='inner'|'left'")
    right_on = right_on or left_on
    sm = small if isinstance(small, pd.DataFrame) else _collect_small(small)
    ref = _ray.put(sm)

    class Joiner:
        def __init__(self):
            self.small = _ray.get(ref)  # once per actor

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(
                self.small, how=how, left_on=left_on, right_on=right_on
            )

    return big.map_batches(Joiner, batch_format="pandas", concurrency=(1, 8))


def _common_key_type(lt: pa.DataType, rt: pa.DataType) -> pa.DataType:
    """Reconcile the two sides' join-key types to ONE Arrow type before the
    shard-tagging exchange: ``shard_by_key`` hashes the physical values, so
    int64 and float64 representations of equal keys land on different shards
    and matching rows would be silently lost. Equal types pass through;
    integer families widen to int64; string families widen to large_string;
    anything else (notably int vs float — lossy above 2^53) raises."""
    if lt.equals(rt):
        return lt
    if pa.types.is_integer(lt) and pa.types.is_integer(rt):
        if pa.uint64() in (lt, rt):
            raise ValueError(
                f"partitioned_join: cannot reconcile key types {lt} vs {rt} "
                "(uint64 does not fit int64); cast one side explicitly"
            )
        return pa.int64()
    str_like = (pa.types.is_string, pa.types.is_large_string)
    if any(f(lt) for f in str_like) and any(f(rt) for f in str_like):
        return pa.large_string()
    raise ValueError(
        f"partitioned_join: key type mismatch {lt} vs {rt} — equal values "
        "would hash to different shards; cast both keys to one type first"
    )


def partitioned_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_on: str,
    right_on: str | None = None,
    how: str = "inner",
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Equi-join of two large Datasets: tag each side, co-shuffle once by
    ``hash(key) % P``, join each shard with one Arrow (Acero) hash-join —
    each side's declared types survive the merge exactly (no pandas
    NaN-driven int→float64 widening). Output column order is pinned to
    left columns then right columns (minus the duplicate key when both
    sides share the key name), matching pandas merge.

    NULL join keys follow SQL semantics (Acero): a null key matches
    NOTHING — inner drops the row, left emits it with null right columns.
    This matches the DuckDB oracle; pandas merge would have matched
    NaN↔NaN keys (documented, tested divergence from pandas)."""
    import ray as _ray

    right_on = right_on or left_on
    if how not in ("inner", "left"):
        raise ValueError("partitioned_join supports how='inner'|'left'")
    from statefulstreamprocessor_ray.functions.ops import shard_by_key

    if n_shards is None:
        try:
            n_shards = max(32, int(_ray.cluster_resources().get("CPU", 8)) * 8)
        except Exception:
            n_shards = 64

    l_schema, r_schema = left.schema(), right.schema()
    left_cols = list(l_schema.names)
    right_cols = list(r_schema.names)
    # a shared name is only legitimate when it is the join key on BOTH sides;
    # subtracting both key names unconditionally would let e.g. right-side
    # column 'k' slip past when left_on='k', right_on='rk' (silent _x/_y
    # suffixes downstream)
    allowed = {left_on} if left_on == right_on else set()
    overlap = (set(left_cols) & set(right_cols)) - allowed
    if overlap:
        raise ValueError(
            f"partitioned_join: rename overlapping non-key columns {sorted(overlap)}"
        )

    # both sides are projected to ONE superset schema (missing columns
    # null-typed per the other side's arrow type) so the union rides a
    # single shuffle with a stable schema
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    superset = left_cols + [c for c in right_cols if c not in left_cols]
    key_type = _common_key_type(l_types[left_on], r_types[right_on])
    l_types[left_on] = key_type
    r_types[right_on] = key_type
    types = {**r_types, **l_types}

    def widen(fn_side: int):
        key_col = left_on if fn_side == 0 else right_on

        def fn(b: pa.Table) -> pa.Table:
            cols = {}
            for c in superset:
                if c not in b.schema.names:
                    cols[c] = pa.nulls(b.num_rows, types[c])
                elif c == key_col and not b.schema.field(c).type.equals(key_type):
                    cols[c] = pc.cast(b[c], key_type)
                else:
                    cols[c] = b[c]
            t = pa.table(cols)
            return t.append_column(
                "_jside", pa.array(np.full(b.num_rows, fn_side, np.int8))
            )

        return fn

    lt = left.map_batches(widen(0), batch_format="pyarrow", zero_copy_batch=True)
    lt = shard_by_key(lt, left_on, n_shards)
    rt = right.map_batches(widen(1), batch_format="pyarrow", zero_copy_batch=True)
    rt = shard_by_key(rt, right_on, n_shards)

    join_type = {"inner": "inner", "left": "left outer"}[how]
    # pandas-merge column order: left cols, then right cols; the right key
    # column appears only when the two sides name their keys differently
    out_cols = left_cols + (
        right_cols if left_on != right_on else [c for c in right_cols if c != right_on]
    )

    def merge_shard(g: pa.Table) -> pa.Table:
        side = g["_jside"]
        lf = g.filter(pc.equal(side, 0)).select(left_cols)
        rf = g.filter(pc.equal(side, 1)).select(right_cols)
        joined = lf.join(
            rf,
            keys=left_on,
            right_keys=right_on,
            join_type=join_type,
            coalesce_keys=(left_on == right_on),
        )
        return joined.select(out_cols)

    u = lt.union(rt)
    return u.groupby("_shard").map_groups(merge_shard, batch_format="pyarrow")
