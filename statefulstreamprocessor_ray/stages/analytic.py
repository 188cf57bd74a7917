"""Analytic / window-function operators over keyed event streams.

The SQL-window-function family a curation pipeline reaches for when it
needs per-entity sequence features (lag deltas, running totals, rolling
sums), corpus-relative distribution positions (rank / percent_rank /
cume_dist), wide per-entity activity matrices (pivoted counts), exact
grouped sufficient statistics (moments), and value-ordered per-group
top-k. The reference engine (ChristophSchranz/StatefulStreamProcessor)
expresses the per-key ordered pass as its LocalStreamBuffer consume loop
(`local_stream_buffer.py`); here each family is one keyed exchange plus a
shard-vectorized numpy kernel — no per-row Python anywhere.

Scale shapes
------------
- ``window_functions``: ONE key exchange (shard_map on the partition key),
  then a lexsort + grouped cumulative kernel over each shard's union of
  complete key groups. Running/rolling sums accumulate in uint64 with
  wraparound: the global (per-shard) cumsum may exceed 2^63, but each
  emitted value is a DIFFERENCE of two prefix sums, and modular
  subtraction recovers the exact per-group value whenever the TRUE
  per-group total fits int64 — so correctness is bounded by the per-key
  window total, not the shard total.
- ``percent_rank``: per-batch value-count partials (bounded by the metric's
  cardinality, e.g. document length), tiny driver-side prefix merge,
  broadcast lookup via ``ray.put`` + ``np.searchsorted`` — no global sort,
  no shuffle of the corpus.
- ``pivot_counts`` / ``group_moments``: map-side combiners emit fixed-width
  per-group partials; ONE group-keyed exchange merges them (sums are
  associative; min/max merge by min/max).
- ``topk_per_group_by_value``: partial top-k per batch (associative), one
  group-keyed exchange, final top-k — the exchange carries at most
  k rows per (batch, group), never the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from statefulstreamprocessor_ray.functions.ops import shard_map, sharded_group_sum

MICRO = 1_000_000.0
CENTI = 100.0


def _group_starts(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start indices + run lengths of the (already sorted) key array."""
    n = len(key)
    st = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
    counts = np.diff(np.r_[st, n])
    return st, counts


def window_functions(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    roll_rows: int = 4,
) -> ray.data.Dataset:
    """Per-key ordered analytics in one exchange: for every event, its
    ``rn`` (1-based row number within the key ordered by ``(ts, id)``),
    ``prev_value`` (LAG of the raw value; NULL at the key's first row),
    ``delta_us`` (microseconds since the previous event; NULL at first),
    ``cum_micro`` (running sum of ``round(value*1e6)``), and
    ``roll{R}_micro`` (sum over the trailing ``roll_rows`` rows including
    the current one — SQL ``ROWS BETWEEN R-1 PRECEDING AND CURRENT ROW``).

    Mirrors the reference's per-key ordered consume loop
    (``local_stream_buffer.py`` ingestion order) as a single lexsorted
    numpy pass per shard. Sums quantize to integer micro-units first so
    the result is provable against a SQL oracle (the group_centroids
    discipline); the uint64 modular-prefix-sum trick keeps differences
    exact even when a shard's total overflows int64.
    """
    roll_name = f"roll{roll_rows}_micro"

    def kernel(t: pa.Table) -> pa.Table:
        key_field = t.schema.field(key_col).type
        is_int_key = pa.types.is_integer(key_field)
        empty_key_type = pa.int64() if is_int_key else pa.large_string()
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                key_col: pa.array([], empty_key_type),
                "rn": pa.array([], pa.int64()),
                "prev_value": pa.array([], pa.float64()),
                "delta_us": pa.array([], pa.float64()),
                "cum_micro": pa.array([], pa.int64()),
                roll_name: pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        if is_int_key:
            key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
            key_out = None  # emit the sorted int codes directly
        else:
            # string (or other) keys: factorize to int codes for the sort /
            # group kernel, emit the original values
            raw = t[key_col].to_pandas().to_numpy(object)
            uniq, key = np.unique(raw, return_inverse=True)
            key = key.astype(np.int64)
            key_out = raw
        ts = (
            pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        val = (
            pc.cast(t[value_col], pa.float64())
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        order = np.lexsort((eid, ts, key))
        key, ts, eid, val = key[order], ts[order], eid[order], val[order]
        if key_out is not None:
            key_out = key_out[order]
        n = len(key)
        st, counts = _group_starts(key)
        gstart = np.repeat(st, counts)
        idx = np.arange(n, dtype=np.int64)
        rn = idx - gstart + 1
        first = idx == gstart

        prev_value = np.empty(n, dtype=np.float64)
        prev_value[0] = np.nan
        prev_value[1:] = val[:-1]
        prev_value[first] = np.nan

        delta = np.empty(n, dtype=np.float64)
        delta[0] = np.nan
        delta[1:] = (ts[1:] - ts[:-1]).astype(np.float64)
        delta[first] = np.nan

        vm = np.round(val * MICRO).astype(np.int64)
        # modular prefix sums: differences are exact for any per-group
        # window total < 2^63 even if the shard-wide cumsum wraps
        ext = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(vm.astype(np.uint64), out=ext[1:])
        cum = (ext[idx + 1] - ext[gstart]).astype(np.int64)
        lookback = np.minimum(rn, roll_rows)
        roll = (ext[idx + 1] - ext[idx + 1 - lookback]).astype(np.int64)

        key_arr = (
            pa.array(key, pa.int64())
            if key_out is None
            else pa.array(key_out, empty_key_type)
        )
        return pa.table(
            {
                id_col: pa.array(eid, pa.int64()),
                key_col: key_arr,
                "rn": pa.array(rn, pa.int64()),
                "prev_value": pa.array(prev_value, pa.float64()),
                "delta_us": pa.array(delta, pa.float64()),
                "cum_micro": pa.array(cum, pa.int64()),
                roll_name: pa.array(roll, pa.int64()),
            }
        )

    return shard_map(
        ds.select_columns([id_col, key_col, ts_col, value_col]),
        key_col,
        kernel,
    )


def percent_rank(
    ds: ray.data.Dataset,
    col: str = "n_chars",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Corpus-relative distribution position of every row: SQL
    ``rank() / percent_rank() / cume_dist() OVER (ORDER BY col)`` without a
    global sort. Two passes: (1) per-batch value-count partials — bounded by
    the metric's CARDINALITY (a length-like metric has thousands of distinct
    values at any corpus size), merged driver-side into prefix sums; (2) a
    broadcast ``np.searchsorted`` lookup per batch. rank is the tie-stable
    SQL rank (1 + count of strictly smaller); percent_rank = (rank-1)/(n-1)
    and cume_dist = count(<=)/n reproduce the oracle's exact division."""

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, cnts = np.unique(v, return_counts=True)
        return pa.table(
            {
                "val": pa.array(vals, pa.int64()),
                "cnt": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    partials_df = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    if "val" not in partials_df.columns:
        # zero-row datasets drop their schema through to_pandas()
        partials_df = pd.DataFrame({"val": [], "cnt": []})
    counts = partials_df.groupby("val", sort=True)["cnt"].sum()
    vals = counts.index.to_numpy(np.int64)
    cnt = counts.to_numpy(np.int64)
    n = int(cnt.sum())
    cle = np.cumsum(cnt)  # count <= val
    rnk = np.r_[np.int64(0), cle[:-1]] + 1  # 1 + count <  val
    table_ref = ray.put((vals, rnk, cle, n))

    def lookup(t: pa.Table) -> pa.Table:
        vals_b, rnk_b, cle_b, n_b = ray.get(table_ref)
        v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(vals_b, v)
        r = rnk_b[pos]
        le = cle_b[pos]
        pr = (
            np.zeros(len(v), dtype=np.float64)
            if n_b <= 1
            else (r - 1).astype(np.float64) / (n_b - 1)
        )
        return pa.table(
            {
                id_col: t[id_col],
                col: t[col],
                "rnk": pa.array(r, pa.int64()),
                "pr": pa.array(pr, pa.float64()),
                "cd": pa.array(le.astype(np.float64) / n_b, pa.float64()),
            }
        )

    return ds.select_columns([id_col, col]).map_batches(
        lookup, batch_format="pyarrow", zero_copy_batch=True
    )


def pivot_counts(
    ds: ray.data.Dataset,
    group_col: str = "user_id",
    cat_col: str = "event_type",
    categories: tuple[str, ...] = ("click", "error", "purchase", "signup", "view"),
) -> ray.data.Dataset:
    """Long->wide activity matrix: one row per group with ``n_<cat>`` counts
    for a FIXED category vocabulary plus ``n_total``. Map-side combiner
    pivots each batch to the fixed width (|groups-in-batch| x (|cats|+1)
    partial rows), then ONE group-keyed exchange sums partials — the
    exchange never carries raw events. Categories outside the vocabulary
    still count toward ``n_total`` (the SQL CASE semantics)."""
    cols = [f"n_{c}" for c in categories]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(df[group_col], df[cat_col])
        ct = ct.reindex(columns=list(categories), fill_value=0)
        ct.columns = cols
        ct["n_total"] = df.groupby(group_col, sort=False).size()
        return ct.reset_index().astype({c: np.int64 for c in cols + ["n_total"]})

    partials = ds.select_columns([group_col, cat_col]).map_batches(
        partial, batch_format="pandas"
    )
    return sharded_group_sum(
        partials,
        keys=[group_col],
        sums={c: c for c in cols + ["n_total"]},
    )


def group_moments(
    ds: ray.data.Dataset,
    group_col: str = "event_type",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Exact per-group sufficient statistics: ``n``, ``s_micro`` (sum of
    ``round(v*1e6)``), ``min_micro`` / ``max_micro``, ``ssq_centi`` (sum of
    squared ``round(v*100)`` centi-units) and ``mean`` (the one shared
    ``s/n/1e6`` IEEE division). NULL values are dropped (SQL aggregate
    semantics). Integer partials are associative, so map-side combine +
    one tiny group-keyed exchange is exact; the centi-unit square bound
    (|v| <= ~9.6e6 for 1e9 rows) is documented in lieu of HUGEINT."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[value_col].notna() & df[group_col].notna()]
        v = df[value_col].to_numpy(np.float64)
        vm = np.round(v * MICRO).astype(np.int64)
        vc = np.round(v * CENTI).astype(np.int64)
        p = pd.DataFrame(
            {group_col: df[group_col].to_numpy(), "vm": vm, "ssq": vc * vc}
        )
        out = p.groupby(group_col, sort=False).agg(
            n=("vm", "size"),
            s_micro=("vm", "sum"),
            min_micro=("vm", "min"),
            max_micro=("vm", "max"),
            ssq_centi=("ssq", "sum"),
        )
        return out.reset_index()

    partials = ds.select_columns([group_col, value_col]).map_batches(
        partial, batch_format="pandas"
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(group_col, sort=False, as_index=False).agg(
            n=("n", "sum"),
            s_micro=("s_micro", "sum"),
            min_micro=("min_micro", "min"),
            max_micro=("max_micro", "max"),
            ssq_centi=("ssq_centi", "sum"),
        )
        out["mean"] = (
            out["s_micro"].to_numpy(np.float64) / out["n"].to_numpy(np.int64) / MICRO
        )
        return out

    return shard_map(partials, group_col, merge, batch_format="pandas")


def topk_per_group_by_value(
    ds: ray.data.Dataset,
    group_col: str = "source",
    value_col: str = "n_chars",
    id_col: str = "doc_id",
    k: int = 3,
) -> ray.data.Dataset:
    """Top-k rows per group ordered by ``(value DESC, id ASC)`` with a
    1-based ``rk`` — the "longest/highest-scoring k docs per source" query.
    Partial top-k per batch is associative (a group's global top-k is in
    the union of per-batch top-ks), so the exchange carries at most
    k·|groups-in-batch| rows per batch. Distinct from hash-ordered
    ``group_sample_exact_k``: this one ranks by a VALUE column."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            [group_col, value_col, id_col], ascending=[True, False, True]
        )
        return df.groupby(group_col, sort=False).head(k)

    partials = ds.select_columns([group_col, value_col, id_col]).map_batches(
        partial, batch_format="pandas"
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            [group_col, value_col, id_col], ascending=[True, False, True]
        )
        df = df.groupby(group_col, sort=False).head(k).copy()
        df["rk"] = df.groupby(group_col, sort=False).cumcount() + 1
        return df[[group_col, id_col, value_col, "rk"]]

    return shard_map(partials, group_col, final, batch_format="pandas")


def histogram(
    ds: ray.data.Dataset,
    col: str = "value",
    width: float = 25.0,
) -> ray.data.Dataset:
    """Fixed-width histogram of a numeric column: one row per occupied bin
    with ``(bin, lo, hi, n)``. ``bin = floor(v / width)`` is the identical
    single IEEE division+floor on both sides; per-batch bincount partials
    make the exchange carry |occupied-bins-in-batch| rows per batch — the
    distribution-sketch complement of percent_rank (which needs the exact
    per-row rank, this needs only the binned shape)."""

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(t[col], pa.float64()).to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        bins = np.floor(v / width).astype(np.int64)
        u, c = np.unique(bins, return_counts=True)
        return pa.table(
            {
                "bin": pa.array(u, pa.int64()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    sums = sharded_group_sum(
        ds.select_columns([col]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=["bin"],
        sums={"n": "n"},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        b = df["bin"].to_numpy(np.int64).astype(np.float64)
        df = df.copy()
        df["lo"] = b * width
        df["hi"] = (b + 1) * width
        return df[["bin", "lo", "hi", "n"]]

    return sums.map_batches(finish, batch_format="pandas")


def rollup_aggregate(
    ds: ray.data.Dataset,
    keys: tuple[str, str] = ("l_returnflag", "l_linestatus"),
    value_col: str = "l_quantity",
    cube: bool = False,
) -> ray.data.Dataset:
    """SQL ``GROUP BY ROLLUP (k1, k2)``: the finest (k1, k2) level plus the
    (k1) subtotals plus the grand total, each row carrying ``grouping()``
    markers (1 = rolled up). ``cube=True`` adds the (k2) subtotal level —
    the full ``GROUP BY CUBE (k1, k2)`` lattice. ONE exchange moves only
    the finest-level integer partials; the coarser levels are derived from
    the aggregated finest table in a single task — exact because integer
    sums re-aggregate associatively. That single task holds
    |distinct k1 x k2| rows, so this shape is for low-cardinality grouping
    keys (the SQL use case); a high-cardinality rollup would derive each
    level with its own keyed exchange instead."""
    k1, k2 = keys

    def partial(t: pa.Table) -> pa.Table:
        v = pc.cast(t[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                k1: t[k1].to_pandas(),
                k2: t[k2].to_pandas(),
                "s": np.round(v * MICRO).astype(np.int64),
            }
        )
        out = df.groupby([k1, k2], sort=False, dropna=False).agg(
            n=("s", "size"), s=("s", "sum")
        )
        return pa.Table.from_pandas(out.reset_index(), preserve_index=False)

    finest = sharded_group_sum(
        ds.select_columns([k1, k2, value_col]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=[k1, k2],
        sums={"n": "n", "s": "s"},
        dropna=False,  # SQL GROUP BY keeps NULL key groups
    )

    def levels(df: pd.DataFrame) -> pd.DataFrame:
        fine = df.copy()
        fine["g1"], fine["g2"] = 0, 0
        sub = df.groupby(k1, sort=False, as_index=False, dropna=False)[
            ["n", "s"]
        ].sum()
        sub[k2] = None
        sub["g1"], sub["g2"] = 0, 1
        tot = pd.DataFrame(
            {
                k1: [None],
                k2: [None],
                "n": [df["n"].sum()],
                "s": [df["s"].sum()],
                "g1": [1],
                "g2": [1],
            }
        )
        parts = [fine, sub, tot]
        if cube:  # the (k2) subtotal level completes the CUBE lattice
            sub2 = df.groupby(k2, sort=False, as_index=False, dropna=False)[
                ["n", "s"]
            ].sum()
            sub2[k1] = None
            sub2["g1"], sub2["g2"] = 1, 0
            parts.append(sub2)
        out = pd.concat(parts, ignore_index=True)
        out = out.rename(
            columns={"g1": f"g_{k1}", "g2": f"g_{k2}", "s": "sum_micro"}
        )
        return out[[k1, k2, f"g_{k1}", f"g_{k2}", "n", "sum_micro"]].astype(
            {"n": np.int64, "sum_micro": np.int64}
        )

    return finest.repartition(1).map_batches(
        levels, batch_format="pandas", batch_size=None
    )


def group_comoments(
    ds: ray.data.Dataset,
    group_col: str = "l_returnflag",
    x_col: str = "l_quantity",
    y_col: str = "l_extendedprice",
    x_scale: float = 100.0,
    y_scale: float = 1.0,
) -> ray.data.Dataset:
    """Exact bivariate sufficient statistics per group — n, sum(x), sum(y),
    sum(x²), sum(y²), sum(xy) over fixed-point quantized values — plus the
    Pearson ``corr`` derived through the one shared IEEE chain
    ``(n·sxy − sx·sy) / sqrt(n·sxx − sx²) / sqrt(n·syy − sy²)`` (every
    operand promoted to float64 first; sqrt is correctly rounded per IEEE,
    so engine and oracle agree bit-for-bit). Rows where either side is NULL
    are dropped (SQL corr semantics). int64 bound: sum(q²) caps rows per
    group at ~2^63/max(q²) — pick scales so quantized magnitudes keep that
    above the corpus size (the group_moments discipline)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[x_col].notna() & df[y_col].notna() & df[group_col].notna()]
        x = np.round(df[x_col].to_numpy(np.float64) * x_scale).astype(np.int64)
        y = np.round(df[y_col].to_numpy(np.float64) * y_scale).astype(np.int64)
        p = pd.DataFrame(
            {
                group_col: df[group_col].to_numpy(),
                "n": np.ones(len(x), np.int64),
                "sx": x,
                "sy": y,
                "sxx": x * x,
                "syy": y * y,
                "sxy": x * y,
            }
        )
        return p.groupby(group_col, sort=False, as_index=False).sum()

    sums = sharded_group_sum(
        ds.select_columns([group_col, x_col, y_col]).map_batches(
            partial, batch_format="pandas"
        ),
        keys=[group_col],
        sums={c: c for c in ["n", "sx", "sy", "sxx", "syy", "sxy"]},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.int64).astype(np.float64)
        sx = df["sx"].to_numpy(np.int64).astype(np.float64)
        sy = df["sy"].to_numpy(np.int64).astype(np.float64)
        sxx = df["sxx"].to_numpy(np.int64).astype(np.float64)
        syy = df["syy"].to_numpy(np.int64).astype(np.float64)
        sxy = df["sxy"].to_numpy(np.int64).astype(np.float64)
        df = df.copy()
        df["corr"] = (
            (n * sxy - sx * sy)
            / np.sqrt(n * sxx - sx * sx)
            / np.sqrt(n * syy - sy * sy)
        )
        return df

    return sums.map_batches(finish, batch_format="pandas")


def latest_per_key(
    ds: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> ray.data.Dataset:
    """Upsert / CDC compaction: the most recent full row per key by
    ``(ts DESC, tie DESC)`` — the "current state of every entity" pass a
    changelog or event stream needs before joining as a dimension. Argmax
    is associative: each batch forwards at most one row per key it saw, one
    group-keyed exchange, final argmax per key — the exchange carries
    |keys-in-batch| rows per batch, never the history."""

    def keep_latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_shard"], errors="ignore")
        df = df.sort_values(
            [key_col, ts_col, tie_col], ascending=[True, False, False]
        )
        return df.groupby(key_col, sort=False).head(1)

    partials = ds.map_batches(keep_latest, batch_format="pandas")
    return shard_map(partials, key_col, keep_latest, batch_format="pandas")
