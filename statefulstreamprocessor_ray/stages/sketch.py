"""Mergeable sketch operators: heavy hitters and distinct counting.

Two classic 100-TB pipeline shapes the batch `groupby` family can't serve at
scale without shuffling every token/value once per query:

- :func:`heavy_hitters` — top-k items by count via capacity-bounded,
  SpaceSaving-style map-side partials (Metwally et al., "Efficient
  computation of frequent and top-k elements in data streams", ICDT'05).
  Each batch keeps only its ``capacity`` most frequent items and records the
  largest count it dropped; the merged drop total is an explicit error bound
  carried on every output row (``err_bound``). With ``capacity`` above the
  distinct-item count nothing is dropped and the result is EXACT
  (err_bound 0) — the regime the DuckDB oracle checks; at corpus scale the
  exchange carries at most ``capacity`` rows per input block instead of the
  full vocabulary.
- :func:`distinct_count` — per-group COUNT(DISTINCT) via a
  sparse-exact/dense-estimate summary in the HyperLogLog style (Flajolet et
  al., AofA'07; the sparse→dense promotion is the standard production
  refinement, e.g. Heule et al., "HyperLogLog in practice", EDBT'13). Each
  batch emits per group either the exact set of 64-bit value hashes (while
  ≤ ``sparse_limit``) or 2^precision max-rank registers; merges union sets
  until the limit, then fold to registers. Sparse all the way through ==
  exact answer (the oracle regime); dense == the HLL estimate with the
  standard linear-counting small-range correction.

Both are map-side partials + ONE small keyed exchange (the partials are
bounded by capacity/registers, not by data volume), following the
word-count combiner pattern (`functions/ops.py::word_count`).
No reference counterpart — these extend the engine for training-data
pipelines (SURVEY.md §2 "beyond the reference" additions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from statefulstreamprocessor_ray.functions.ops import shard_map, sharded_group_sum

# sentinel item for per-partial dropped-count rows: tokenize mode filters
# empty tokens and raw mode drops null/empty values, so "" never collides
# with a real item
_ERR_ITEM = ""


def _top_counts(arr, capacity: int):
    """Arrow value_counts + deterministic capacity truncation.

    ``arr`` is a pyarrow (Chunked)Array. Returns (items pa.Array, counts
    ndarray[int64], dropped_max int) with ties inside the capacity boundary
    broken by item ascending, so a re-run over re-ordered batches truncates
    identically. The count reduction runs in Arrow's C++ hash kernel — the
    pandas object-string groupby this replaced was the whole cost of the
    4 GiB probe (per-batch token counts over ~500M mostly-distinct tokens).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    vc = pc.value_counts(arr)
    items = vc.field("values")
    counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
    if len(counts) <= capacity:
        return items, counts, 0
    # deterministic truncation: top-capacity by (count desc, item asc). The
    # item tie-break only matters AT the boundary count; sort only that
    # count's items lexically instead of lexsorting the whole vocabulary
    order = np.argsort(-counts, kind="stable")
    boundary_n = int(counts[order[capacity - 1]])
    sure = order[counts[order] > boundary_n]  # strictly above: all kept
    tied = order[counts[order] == boundary_n]
    need = capacity - len(sure)
    if len(tied) > need:
        tied_items = items.take(pa.array(tied))
        tie_order = pc.sort_indices(tied_items)
        tied = tied[np.asarray(tie_order)[:need]]
    keep = np.concatenate([sure, tied])
    dropped = np.setdiff1d(order, keep, assume_unique=False)
    dropped_max = int(counts[dropped].max())
    return items.take(pa.array(keep)), counts[keep], dropped_max


def heavy_hitters(
    ds: ray.data.Dataset,
    col: str = "text",
    k: int = 20,
    capacity: int = 4096,
    tokenize: bool = True,
) -> ray.data.Dataset:
    """Top-``k`` items by count with an explicit merged error bound.

    Output columns: ``item`` (string), ``n`` (int64 lower-bound count; exact
    when ``err_bound`` is 0), ``err_bound`` (int64, the sum over partials of
    the largest dropped count — 0 whenever every batch's distinct items fit
    ``capacity``). Top-k ties break by item ascending (matches the oracle's
    ``ORDER BY n DESC, item ASC LIMIT k``).

    ``tokenize=True`` counts whitespace-split lowercased tokens of ``col``
    (the word-count tokenization); ``tokenize=False`` counts raw values of
    ``col`` (null/empty dropped).
    """
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        if tokenize:
            vals = (
                pc.split_pattern_regex(pc.utf8_lower(b[col]), r"\s+")
                .combine_chunks()
                .flatten()
            )
            vals = vals.filter(pc.not_equal(vals, ""))
        else:
            arr = b[col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            vals = arr.filter(pc.and_kleene(arr.is_valid(), pc.not_equal(arr, "")))
        if len(vals) == 0:
            return pa.table(
                {"item": pa.array([], pa.string()), "partial": pa.array([], pa.int64())}
            )
        items, counts, dropped_max = _top_counts(vals, capacity)
        if dropped_max:
            items = pa.concat_arrays(
                [items.cast(pa.string()), pa.array([_ERR_ITEM], pa.string())]
            )
            counts = np.concatenate([counts, np.array([dropped_max], np.int64)])
        return pa.table(
            {"item": items, "partial": pa.array(counts, pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = sharded_group_sum(partials, keys=["item"], sums={"partial": "n"})

    # per-block top-k: every item's rows were co-located by the group-sum, so
    # the global top-k is a subset of the per-block top-k under the same
    # comparator; the error sentinel is carried, never ranked
    def block_topk(g: pd.DataFrame) -> pd.DataFrame:
        err = g[g["item"] == _ERR_ITEM]
        real = g[g["item"] != _ERR_ITEM]
        real = real.sort_values(["n", "item"], ascending=[False, True], kind="stable")
        return pd.concat([real.iloc[:k], err], ignore_index=True)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        err_bound = int(g.loc[g["item"] == _ERR_ITEM, "n"].sum())
        real = g[g["item"] != _ERR_ITEM]
        real = real.sort_values(["n", "item"], ascending=[False, True], kind="stable")
        out = real.iloc[:k].reset_index(drop=True).copy()
        out["err_bound"] = np.int64(err_bound)
        return out

    return (
        merged.map_batches(block_topk, batch_format="pandas", batch_size=None)
        .repartition(1)
        .map_batches(final_topk, batch_format="pandas", batch_size=None)
    )


def _compact_weighted(v: np.ndarray, w: np.ndarray, limit: int):
    """Deterministic equal-weight-strata compaction of a sorted-by-merge
    weighted sample down to ``limit`` points. Keeps the LAST point of each of
    ``limit`` equal-weight strata with the stratum's total weight, so total
    weight is preserved and any rank query moves by at most W/limit — the
    standard mergeable quantile-summary error model (cf. Greenwald-Khanna /
    KLL; this is the simple deterministic variant)."""
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cw = np.cumsum(w)
    W = int(cw[-1])
    strata = np.minimum((cw - 1) * limit // W, limit - 1)
    last = np.flatnonzero(np.diff(np.append(strata, limit)) != 0)
    wq = np.diff(np.append(np.int64(0), cw[last]))
    return v[last], wq.astype(np.int64)


def quantile_sketch(
    ds: ray.data.Dataset,
    col: str,
    qs=(0.25, 0.5, 0.9),
    group_col: str | None = None,
    limit: int = 65536,
) -> ray.data.Dataset:
    """Per-group discrete quantiles via a mergeable weighted-sample summary.

    EXACT (selects the same element as DuckDB's ``quantile_disc``: sorted
    index ``max(0, ceil(q*n)-1)``, same float64 arithmetic) while each
    group's summary stays ≤ ``limit`` points — the oracle regime; beyond
    that, partials and merges compact to ``limit`` equal-weight strata and
    any reported quantile's rank is off by at most W/limit per compaction
    level — ≤ 2W/limit end-to-end (partial compactions sum to ≤ W/limit
    total, the merge adds ≤ W/limit).

    Output: (``group_col``, ``q`` float64, ``value`` float64) — nulls/NaNs in
    ``col`` ignored (quantile_disc semantics).
    """
    import pandas as pd

    _GROUP = group_col or "_all"
    qs = [float(q) for q in qs]

    def partial(b: pa.Table) -> pa.Table:
        df = b.select([c for c in ([group_col] if group_col else []) + [col]]).to_pandas()
        if group_col is None:
            df[_GROUP] = ""
        vals = pd.to_numeric(df[col], errors="coerce")
        keep = vals.notna()
        df, vals = df[keep], vals[keep].to_numpy(np.float64)
        out_g, out_v, out_w = [], [], []
        for gval, idx in df.groupby(_GROUP, sort=False).indices.items():
            v = np.sort(vals[idx])
            w = np.ones(len(v), np.int64)
            if len(v) > limit:
                v, w = _compact_weighted(v, w, limit)
            out_g.append(np.repeat(np.asarray([gval], object), len(v)))
            out_v.append(v)
            out_w.append(w)
        if not out_g:
            return pa.table(
                {
                    _GROUP: pa.array([], pa.string()),
                    "value": pa.array([], pa.float64()),
                    "weight": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                _GROUP: pa.array(np.concatenate(out_g), pa.string()),
                "value": pa.array(np.concatenate(out_v), pa.float64()),
                "weight": pa.array(np.concatenate(out_w), pa.int64()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out_g, out_q, out_v = [], [], []
        for gval, sub in g.groupby(_GROUP, sort=False):
            v = sub["value"].to_numpy(np.float64)
            w = sub["weight"].to_numpy(np.int64)
            order = np.argsort(v, kind="stable")
            v, w = v[order], w[order]
            if len(v) > limit:
                v, w = _compact_weighted(v, w, limit)
            cw = np.cumsum(w)
            W = int(cw[-1])
            for q in qs:
                # DuckDB quantile_disc: sorted index max(0, ceil(q*n)-1);
                # weighted form: first point whose cumweight reaches that
                # 1-based target rank (identical when all weights are 1)
                target = max(1, int(np.ceil(q * W)))
                i = int(np.searchsorted(cw, target, side="left"))
                out_g.append(gval)
                out_q.append(q)
                out_v.append(v[i])
        return pd.DataFrame(
            {
                _GROUP: out_g,
                "q": np.asarray(out_q, np.float64),
                "value": np.asarray(out_v, np.float64),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = shard_map(partials, [_GROUP], merge, batch_format="pandas")
    if group_col is None:
        out = out.drop_columns([_GROUP])
    return out


def _hll_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """Dense HLL registers from uint64 hashes: index = top ``p`` bits,
    register = 1 + leading-zero count of the remaining ``64-p`` bits
    (capped at 64-p+1)."""
    m = 1 << p
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)  # remaining bits, left-aligned
    # rank = 1 + clz(rest) over 64-p bits; rest==0 -> max rank
    ranks = np.full(len(hashes), 64 - p + 1, np.uint8)
    nz = rest != 0
    # clz via bit_length: 64 - bit_length(rest)
    bl = np.zeros(len(hashes), np.int64)
    r = rest[nz]
    # vectorized bit_length for uint64
    bl_nz = np.zeros(r.shape, np.int64)
    v = r.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        ge = v >= (np.uint64(1) << np.uint64(shift))
        bl_nz[ge] += shift
        v[ge] >>= np.uint64(shift)
    bl_nz += 1  # bit_length
    bl[np.flatnonzero(nz)] = bl_nz
    ranks[nz] = (64 - bl[nz] + 1).astype(np.uint8)
    ranks = np.minimum(ranks, np.uint8(64 - p + 1))
    regs = np.zeros(m, np.uint8)
    np.maximum.at(regs, idx, ranks)
    return regs


def _hll_estimate(regs: np.ndarray) -> int:
    """Standard HLL estimator with the linear-counting small-range
    correction (Flajolet et al. '07)."""
    m = len(regs)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return int(round(est))


def distinct_count(
    ds: ray.data.Dataset,
    col: str,
    group_col: str | None = None,
    precision: int = 12,
    sparse_limit: int = 65536,
) -> ray.data.Dataset:
    """Per-group approximate COUNT(DISTINCT ``col``) — EXACT while each
    group's distinct count stays ≤ ``sparse_limit`` (the sparse summary is
    the exact 64-bit hash set), the HLL register estimate beyond.

    Output: (``group_col``, ``n_distinct`` int64) — or a single
    ``n_distinct`` row when ``group_col`` is None. Nulls in ``col`` are
    ignored (COUNT(DISTINCT) semantics).
    """
    import pandas as pd

    _GROUP = group_col or "_all"

    def partial(b: pa.Table) -> pa.Table:
        df = b.select([c for c in ([group_col] if group_col else []) + [col]]).to_pandas()
        if group_col is None:
            df[_GROUP] = ""
        df = df[df[col].notna()]
        rows_g, rows_mode, rows_payload = [], [], []
        for gval, sub in df.groupby(_GROUP, sort=False):
            hashes = np.unique(pd.util.hash_array(sub[col].to_numpy()))
            if len(hashes) <= sparse_limit:
                rows_mode.append("sparse")
                rows_payload.append(hashes.tobytes())
            else:
                rows_mode.append("dense")
                rows_payload.append(_hll_registers(hashes, precision).tobytes())
            rows_g.append(gval)
        return pa.table(
            {
                _GROUP: pa.array(rows_g, pa.string()),
                "mode": pa.array(rows_mode, pa.string()),
                "payload": pa.array(rows_payload, pa.binary()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out_g, out_n = [], []
        for gval, sub in g.groupby(_GROUP, sort=False):
            sparse_parts = [
                np.frombuffer(p, np.uint64)
                for p in sub.loc[sub["mode"] == "sparse", "payload"]
            ]
            dense_parts = [
                np.frombuffer(p, np.uint8)
                for p in sub.loc[sub["mode"] == "dense", "payload"]
            ]
            union = (
                np.unique(np.concatenate(sparse_parts))
                if sparse_parts
                else np.array([], np.uint64)
            )
            if not dense_parts and len(union) <= sparse_limit:
                n = len(union)  # sparse all the way: exact
            else:
                regs = _hll_registers(union, precision)
                for d in dense_parts:
                    regs = np.maximum(regs, d)
                n = _hll_estimate(regs)
            out_g.append(gval)
            out_n.append(n)
        return pd.DataFrame({_GROUP: out_g, "n_distinct": np.asarray(out_n, np.int64)})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = shard_map(partials, [_GROUP], merge, batch_format="pandas")
    if group_col is None:
        out = out.drop_columns([_GROUP])
    return out
