"""Similarity search over an embedding column (list<float>).

- ``brute_force_topk``: exact cosine top-k. The query matrix is broadcast once
  via ``ray.put`` and read per actor in ``__init__`` (never re-shipped per
  batch); each batch contributes a partial top-k via one numpy matmul, and the
  driver merges the tiny partials.
- ``lsh_topk``: random-hyperplane LSH variant — candidates restricted to
  matching buckets (the 100 TB scale path: one groupby over bucket ids instead
  of scanning the corpus per query).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _to_matrix(col) -> np.ndarray:
    return np.asarray(col.to_pylist(), dtype=np.float64)


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


def brute_force_topk(
    ds: ray.data.Dataset,
    query_ids: list[int],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact top-k cosine neighbors for the given query ids (queries are rows
    of the same dataset). Ties broken by (rounded sim desc, neighbor_id asc)."""
    q_tbl = pa.concat_tables(
        b
        for b in ds.select_columns([id_col, vec_col]).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        )
    )
    q_ids_np = q_tbl[id_col].to_numpy(zero_copy_only=False)
    mask = np.isin(q_ids_np, query_ids)
    queries = {
        "ids": q_ids_np[mask],
        "unit": _normalize(_to_matrix(q_tbl[vec_col]))[mask],
    }
    ref = ray.put(queries)

    partials = ds.select_columns([id_col, vec_col]).map_batches(
        PartialTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": k, "vec_col": vec_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=2,
    )
    df = partials.to_pandas()  # tiny: n_queries * k * n_blocks rows
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
    bucket is within Hamming ``n_probe_hamming`` of the query's bucket."""
    tbl = pa.concat_tables(
        b
        for b in ds.select_columns([id_col, vec_col]).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        )
    )
    ids = tbl[id_col].to_numpy(zero_copy_only=False)
    unit = _normalize(_to_matrix(tbl[vec_col]))
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, unit.shape[1]))
    codes = ((unit @ planes.T) >= 0) @ (1 << np.arange(n_planes))

    mask = np.isin(ids, query_ids)
    rows = []
    for qi in np.flatnonzero(mask):
        d = np.array([bin(int(codes[qi]) ^ int(c)).count("1") for c in codes])
        cand = np.flatnonzero(d <= n_probe_hamming)
        sims = unit[cand] @ unit[qi]
        order = np.lexsort((ids[cand], -np.round(sims, 6)))[:k]
        for rank, oi in enumerate(order, 1):
            rows.append(
                (int(ids[qi]), int(ids[cand[oi]]), round(float(sims[oi]), 6), rank)
            )
    rows.sort(key=lambda r: (r[0], r[3]))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "neighbor_id": pa.array([r[1] for r in rows], pa.int64()),
            "sim_r": pa.array([r[2] for r in rows], pa.float64()),
            "rank": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
