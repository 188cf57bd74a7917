"""Plain relational equi-joins — the attach-metadata primitive a training
pipeline needs around the stream operators (join scores onto documents,
embeddings onto ids, shard stats onto outputs):

- ``broadcast_join``: small side collected once, shipped via ``ray.put``,
  merged per batch in the workers — the 100-TB shape when one side fits in
  memory (lookup tables, per-source aggregates). No shuffle.
- ``partitioned_join``: both sides large — ONE int-keyed co-shuffle
  (``_shard = hash(key) % P``, the ordered-join exchange) and a vectorized
  pandas merge per shard. The honest fallback when neither side broadcasts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
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


def partitioned_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_on: str,
    right_on: str | None = None,
    how: str = "inner",
    n_shards: int | None = None,
) -> ray.data.Dataset:
    """Equi-join of two large Datasets: tag each side, co-shuffle once by
    ``hash(key) % P``, merge each shard with one vectorized pandas merge.
    Column collisions get pandas' _x/_y suffixes (callers project)."""
    import ray as _ray

    right_on = right_on or left_on
    from statefulstreamprocessor_ray.functions.ops import shard_by_key

    if n_shards is None:
        try:
            n_shards = max(32, int(_ray.cluster_resources().get("CPU", 8)) * 8)
        except Exception:
            n_shards = 64

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column(
                "_jside", pa.array(np.full(b.num_rows, side, np.int8))
            )

        return fn

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
    types = {**r_types, **l_types}

    def widen(fn_side: int):
        def fn(b: pa.Table) -> pa.Table:
            cols = {}
            for c in superset:
                if c in b.schema.names:
                    cols[c] = b[c]
                else:
                    cols[c] = pa.nulls(b.num_rows, types[c])
            t = pa.table(cols)
            return t.append_column(
                "_jside", pa.array(np.full(b.num_rows, fn_side, np.int8))
            )

        return fn

    lt = left.map_batches(widen(0), batch_format="pyarrow", zero_copy_batch=True)
    lt = shard_by_key(lt, left_on, n_shards)
    rt = right.map_batches(widen(1), batch_format="pyarrow", zero_copy_batch=True)
    rt = shard_by_key(rt, right_on, n_shards)

    def merge_shard(g: pd.DataFrame) -> pd.DataFrame:
        side = g["_jside"].to_numpy()
        lf = g.loc[side == 0, left_cols]
        rf = g.loc[side == 1, right_cols]
        return lf.merge(rf, how=how, left_on=left_on, right_on=right_on)

    u = lt.union(rt)
    return u.groupby("_shard").map_groups(merge_shard, batch_format="pandas")
