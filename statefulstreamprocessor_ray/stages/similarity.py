"""Similarity search over an embedding column (list<float>).

- ``brute_force_topk``: exact cosine top-k. The query matrix is broadcast once
  via ``ray.put`` and read per actor in ``__init__`` (never re-shipped per
  batch); each batch contributes a partial top-k via one numpy matmul, and the
  driver merges the tiny partials.
- ``lsh_topk``: random-hyperplane LSH variant — per-batch bucket codes from
  broadcast planes; only rows whose bucket is within the probe Hamming radius
  of a query's bucket enter that query's matmul, so per-batch work shrinks by
  the bucket selectivity while the data never leaves the workers.
- ``ivf_topk``: IVF variant — k-means centroids trained on a driver-side
  sample, broadcast once; each batch assigns rows to their nearest centroid
  and only rows landing in a query's ``nprobe`` closest lists are scored.
  The scale path: centroid training cost is O(sample), scoring cost drops to
  ~nprobe/n_list of brute force, and everything between sample and final
  merge is map_batches over streaming blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _to_matrix(col) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> / fixed_size_list column —
    via the flat Arrow values buffer (one copy for the dtype cast), never a
    per-row to_pylist() Pythonization."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ExtensionArray):  # e.g. Ray's ArrowTensorArray
        return np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.float64)
    if col.null_count or len(col) == 0:
        return np.asarray(col.to_pylist(), dtype=np.float64)  # slow, rare path
    if pa.types.is_fixed_size_list(col.type):
        d = col.type.list_size
        flat = col.values.to_numpy(zero_copy_only=False)
        # a sliced FixedSizeListArray's .values still spans the parent buffer
        flat = flat[col.offset * d : (col.offset + len(col)) * d]
        return flat.reshape(len(col), d).astype(np.float64, copy=False)
    # variable-length list: require uniform row lengths (embedding columns)
    lengths = np.diff(col.offsets.to_numpy(zero_copy_only=False))
    if lengths.size and (lengths != lengths[0]).any():
        return np.asarray(col.to_pylist(), dtype=np.float64)  # ragged fallback
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(col), -1).astype(np.float64, copy=False)


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    return mat / n[:, None]


class PartialTopK:
    """map_batches actor: per-batch cosine partial top-k vs broadcast queries."""

    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str):
        q = ray.get(queries_ref)  # fetched once per actor
        self.q_ids = q["ids"]
        self.q_unit = q["unit"]
        self.k, self.vec_col, self.id_col = k, vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        unit = _normalize(_to_matrix(batch[self.vec_col]))
        sims = self.q_unit @ unit.T  # (n_queries, batch)
        k = min(self.k, sims.shape[1])
        out_q, out_n, out_s = [], [], []
        for qi in range(sims.shape[0]):
            part = np.argpartition(-sims[qi], k - 1)[:k]
            out_q.extend([self.q_ids[qi]] * k)
            out_n.extend(ids[part])
            out_s.extend(sims[qi][part])
        return pa.table(
            {
                "query_id": pa.array(np.asarray(out_q, np.int64)),
                "neighbor_id": pa.array(np.asarray(out_n, np.int64)),
                "sim": pa.array(np.asarray(out_s, np.float64)),
            }
        )


def _fetch_queries(ds, query_ids, vec_col, id_col) -> dict:
    """Pull just the query rows to the driver (pushdown filter on the id
    column; at 100 TB the query set is a handful of rows)."""
    want = list(query_ids)
    batches = list(
        ds.select_columns([id_col, vec_col])
        .map_batches(
            lambda t: t.filter(
                pa.compute.is_in(t[id_col], value_set=pa.array(want, t[id_col].type))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .iter_batches(batch_size=65536, batch_format="pyarrow")
    )
    q_tbl = pa.concat_tables(batches) if batches else None
    if q_tbl is None or q_tbl.num_rows == 0:
        return {"ids": np.array([], np.int64), "unit": np.zeros((0, 1))}
    return {
        "ids": q_tbl[id_col].to_numpy(zero_copy_only=False),
        "unit": _normalize(_to_matrix(q_tbl[vec_col])),
    }


_EMPTY_TOPK = pa.table(
    {
        "query_id": pa.array([], pa.int64()),
        "neighbor_id": pa.array([], pa.int64()),
        "sim_r": pa.array([], pa.float64()),
        "rank": pa.array([], pa.int64()),
    }
)


def _merge_partials(partials: ray.data.Dataset, k: int) -> pa.Table:
    """Driver-side merge of tiny per-block partial top-k tables: round sims,
    rank by (sim desc, neighbor_id asc), keep k per query."""
    df = partials.to_pandas()  # tiny: n_queries * k * n_blocks rows
    df = df.drop_duplicates(subset=["query_id", "neighbor_id"])
    df["sim_r"] = df["sim"].round(6)
    df = df.sort_values(
        ["query_id", "sim_r", "neighbor_id"], ascending=[True, False, True]
    )
    df = df.groupby("query_id", as_index=False).head(k)
    df["rank"] = df.groupby("query_id").cumcount() + 1
    out = df[["query_id", "neighbor_id", "sim_r", "rank"]].reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False).cast(
        pa.schema(
            [
                ("query_id", pa.int64()),
                ("neighbor_id", pa.int64()),
                ("sim_r", pa.float64()),
                ("rank", pa.int64()),
            ]
        )
    )


def brute_force_topk(
    ds: ray.data.Dataset,
    query_ids: list[int],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact top-k cosine neighbors for the given query ids (queries are rows
    of the same dataset). Ties broken by (rounded sim desc, neighbor_id asc)."""
    q = _fetch_queries(ds, query_ids, vec_col, id_col)
    if len(q["ids"]) == 0:
        return _EMPTY_TOPK
    ref = ray.put(q)

    partials = ds.select_columns([id_col, vec_col]).map_batches(
        PartialTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": k, "vec_col": vec_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=2,
    )
    return _merge_partials(partials, k)


class _BucketedPartialTopK:
    """map_batches actor: partial top-k where each query scores only the batch
    rows its candidate rule admits (LSH bucket radius / IVF probed lists)."""

    def __init__(self, bcast_ref, k: int, vec_col: str, id_col: str):
        b = ray.get(bcast_ref)  # once per actor
        self.q_ids = b["ids"]
        self.q_unit = b["unit"]
        self.mode = b["mode"]
        if self.mode == "lsh":
            self.planes = b["planes"]
            self.q_bits = b["q_bits"]  # (nq, n_planes) bool
            self.radius = b["radius"]
        else:  # ivf
            self.centroids = b["centroids"]  # (n_list, d) unit rows
            self.q_probe = b["q_probe"]  # (nq, nprobe) list ids
        self.k, self.vec_col, self.id_col = k, vec_col, id_col

    def _candidates(self, unit: np.ndarray) -> list[np.ndarray]:
        """Per-query candidate row indices within this batch."""
        if self.mode == "lsh":
            bits = (unit @ self.planes.T) >= 0  # (n, n_planes)
            return [
                np.flatnonzero((bits != qb).sum(axis=1) <= self.radius)
                for qb in self.q_bits
            ]
        assign = np.argmax(unit @ self.centroids.T, axis=1)  # (n,)
        return [np.flatnonzero(np.isin(assign, probe)) for probe in self.q_probe]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        unit = _normalize(_to_matrix(batch[self.vec_col]))
        out_q, out_n, out_s = [], [], []
        for qi, cand in enumerate(self._candidates(unit)):
            if len(cand) == 0:
                continue
            sims = unit[cand] @ self.q_unit[qi]
            kk = min(self.k, len(cand))
            part = np.argpartition(-sims, kk - 1)[:kk]
            out_q.extend([self.q_ids[qi]] * kk)
            out_n.extend(ids[cand[part]])
            out_s.extend(sims[part])
        return pa.table(
            {
                "query_id": pa.array(np.asarray(out_q, np.int64)),
                "neighbor_id": pa.array(np.asarray(out_n, np.int64)),
                "sim": pa.array(np.asarray(out_s, np.float64)),
            }
        )


def lsh_topk(
    ds: ray.data.Dataset,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 8,
    n_probe_hamming: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 13,
) -> pa.Table:
    """Approximate top-k: random-hyperplane buckets; candidates = vectors whose
    bucket is within Hamming ``n_probe_hamming`` of the query's bucket.

    Bucket codes are computed per batch from broadcast planes inside
    map_batches — the corpus never leaves the workers; only per-block partial
    top-k tables reach the driver."""
    q = _fetch_queries(ds, query_ids, vec_col, id_col)
    if len(q["ids"]) == 0:
        return _EMPTY_TOPK
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, q["unit"].shape[1]))
    ref = ray.put(
        {
            "mode": "lsh",
            "ids": q["ids"],
            "unit": q["unit"],
            "planes": planes,
            "q_bits": (q["unit"] @ planes.T) >= 0,
            "radius": n_probe_hamming,
        }
    )
    partials = ds.select_columns([id_col, vec_col]).map_batches(
        _BucketedPartialTopK,
        fn_constructor_kwargs={"bcast_ref": ref, "k": k, "vec_col": vec_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=2,
    )
    return _merge_partials(partials, k)


def _train_centroids(
    sample_unit: np.ndarray, n_list: int, n_iter: int = 10, seed: int = 17
) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample. Empty clusters
    keep their previous centroid."""
    rng = np.random.default_rng(seed)
    n = len(sample_unit)
    cent = sample_unit[rng.choice(n, size=min(n_list, n), replace=False)].copy()
    for _ in range(n_iter):
        assign = np.argmax(sample_unit @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample_unit[assign == c]
            if len(members):
                m = members.mean(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    cent[c] = m / nrm
    return cent


def ivf_topk(
    ds: ray.data.Dataset,
    query_ids: list[int],
    k: int = 10,
    n_list: int = 16,
    nprobe: int = 4,
    train_sample: int = 65536,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 17,
    centroid_ids: list[int] | None = None,
) -> pa.Table:
    """Approximate top-k via an IVF (inverted-file) index: spherical-k-means
    centroids trained on a bounded sample, broadcast once; each batch assigns
    its rows to the nearest centroid and a query scores only rows in its
    ``nprobe`` closest lists. ``nprobe == n_list`` degrades to exact brute
    force (asserted in tests).

    ``centroid_ids``: use the normalized vectors of these corpus rows as the
    centroids instead of k-means (sorted by id, so centroid index order is
    deterministic). Slightly coarser lists than k-means, but the whole index
    — assignment, probing, pruning — becomes closed-form and reproducible by
    a SQL oracle, which is how the driver checks this query end-to-end."""
    q = _fetch_queries(ds, query_ids, vec_col, id_col)
    if len(q["ids"]) == 0:
        return _EMPTY_TOPK
    if centroid_ids is not None:
        c = _fetch_queries(ds, centroid_ids, vec_col, id_col)
        order = np.argsort(c["ids"])
        cent = c["unit"][order]
    else:
        sample_tbl = pa.concat_tables(
            b
            for b in ds.select_columns([vec_col])
            .limit(train_sample)
            .iter_batches(batch_size=65536, batch_format="pyarrow")
        )
        cent = _train_centroids(
            _normalize(_to_matrix(sample_tbl[vec_col])), n_list, seed=seed
        )
    q_probe = np.argsort(-(q["unit"] @ cent.T), axis=1)[:, : min(nprobe, len(cent))]
    ref = ray.put(
        {
            "mode": "ivf",
            "ids": q["ids"],
            "unit": q["unit"],
            "centroids": cent,
            "q_probe": q_probe,
        }
    )
    partials = ds.select_columns([id_col, vec_col]).map_batches(
        _BucketedPartialTopK,
        fn_constructor_kwargs={"bcast_ref": ref, "k": k, "vec_col": vec_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=2,
    )
    return _merge_partials(partials, k)


def group_centroids(
    ds: ray.data.Dataset,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Per-group mean-pooled embedding centroids — the cluster-summary /
    per-source-prototype op of an embedding-curation loop. Output one row
    per (group, dim): ``(group, dim, s_micro, n, centroid)`` with ``dim``
    1-based (the SQL list-index convention).

    Vector components quantize to integer micro-units BEFORE any sum
    (``round(float64(x) * 1e6)``; float32 -> float64 is exact), so partial
    sums + the one group-keyed exchange are associative int64 arithmetic
    and the mean is the single identical ``s / n / 1e6`` division chain on
    both sides (the bigram_surprisal discipline — a float mean's addition
    order is partition-dependent and unprovable vs an oracle). Scale
    shape: per-batch (group, dim) partials (|groups-in-block| x d rows per
    block, never the vectors), one linear group-sum exchange, ragged list
    lengths handled via the Arrow offsets buffer — no per-row Python."""
    import pandas as pd

    from statefulstreamprocessor_ray.functions.ops import sharded_group_sum

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                group_col: pa.array([], pa.int64()),
                "dim": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        mask = pa.compute.and_(
            pa.compute.is_valid(t[group_col]), pa.compute.is_valid(t[vec_col])
        )
        t = t.filter(mask)
        if t.num_rows == 0:
            return empty
        col = t[vec_col].combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offs)
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        lab = t[group_col].to_numpy(zero_copy_only=False).astype(np.int64)
        g = np.repeat(lab, lens)
        dim = (np.arange(len(flat), dtype=np.int64) - np.repeat(offs[:-1], lens)) + 1
        sm = np.round(flat * 1e6).astype(np.int64)
        p = (
            pd.DataFrame({group_col: g, "dim": dim, "sm": sm})
            .groupby([group_col, "dim"], sort=False)
            .agg(s=("sm", "sum"), n=("sm", "size"))
            .reset_index()
        )
        return pa.table(
            {
                group_col: pa.array(p[group_col].to_numpy(np.int64), pa.int64()),
                "dim": pa.array(p["dim"].to_numpy(np.int64), pa.int64()),
                "s": pa.array(p["s"].to_numpy(np.int64), pa.int64()),
                "n": pa.array(p["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    sums = sharded_group_sum(
        ds.select_columns([group_col, vec_col]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=[group_col, "dim"],
        sums={"s": "s_micro", "n": "n"},
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        s = b["s_micro"].to_numpy(np.int64)
        n = b["n"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                group_col: b[group_col].to_numpy(np.int64),
                "dim": b["dim"].to_numpy(np.int64),
                "s_micro": s,
                "n": n,
                # identical IEEE chain both sides; deliberately unrounded
                "centroid": s.astype(np.float64) / n / 1e6,
            }
        )

    return sums.map_batches(finish, batch_format="pandas")
