"""Deduplication operators for training-data pipelines.

- exact dedup: content-hash groupby, keep min id (hash-partition + per-group
  first — the only shuffle is over (hash, id) pairs, not documents),
- n-gram Jaccard dedup: exact-complete — candidate pairs via shared-shingle
  blocking (any pair with Jaccard > 0 shares a shingle, so blocking loses
  nothing), verified with exact Jaccard,
- MinHash + LSH near-dup: shingle -> minhash signature -> banded LSH buckets
  -> candidate pairs -> exact-Jaccard verify (probabilistic recall, scale path),
- SimHash near-dup: 64-bit simhash + banded blocking, Hamming-distance verify,
- embedding cosine near-dup over a list<float> column.

All stages are distributed: shingling/hashing/banding run in map_batches,
pair generation in groupby(bucket).map_groups, and verification (exact
Jaccard / Hamming / cosine) happens IN THE WORKERS — only the final pair set
(O(duplicates), not O(corpus)) ever reaches the driver.

All shingling/hashing is deterministic — ``pd.util.hash_array`` (fixed-key
SipHash, stable cross-process) by default, never Python's salted ``hash``;
one vectorized hash call per batch instead of a per-shingle digest loop.
``hash_fn="md5"`` switches to DuckDB-reproducible ``md5_number_lower``
semantics (``int.from_bytes(md5(s)[8:16], 'little')``) so sketches can be
verified end-to-end by a SQL oracle. Pairs are emitted once with a < b.

Hot keys: ``max_df`` caps the document frequency of a blocking key (shingle /
band bucket). Because each bucket fully contains its keys, the in-bucket
group IS the key's global doc set, so the cap is exact global-``max_df``
semantics at zero extra shuffle cost. Skipped keys are counted and surfaced
in the result table's schema metadata (``hot_keys_skipped``) — capping is the
standard quadratic-blowup guard for shingle blocking at corpus scale. Cost:
a pair whose ONLY shared shingles are hot is never emitted (lost recall),
and a pair sharing both hot and non-hot shingles has its shared-shingle
count ``inter`` undercounted (hot shingles don't contribute), biasing its
reported Jaccard downward — possibly below threshold.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Min

MERSENNE = (1 << 61) - 1

# Identity of the content_hash128 scheme, INCLUDING the pandas version:
# hash_array is pandas-internal SipHash, so a pandas upgrade could silently
# change digests. Persistent state that stores digests (streaming-dedup
# delta checkpoints) stamps this tag and aborts restore on mismatch —
# re-deduping an epoch from scratch is correct, comparing digests from two
# different hash functions is not (ADVICE r3).
CONTENT_HASH_SCHEME = f"siphash128/v1/pandas={pd.__version__}"


def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Group identical texts; emit (text, doc_id=min id, n_dups)."""
    out = ds.groupby(text_col).aggregate(
        Min(id_col, alias_name=id_col), Count(alias_name="n_dups")
    )
    return out


def content_hash128(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """128-bit content identity as (lo, hi) uint64 arrays — 64-bit identity
    is not enough for 'exact' dedup at the 10^12-doc target; 128 bits
    keeps birthday collisions negligible. Two independent fixed-key
    SipHash passes (``pd.util.hash_array`` with distinct keys): vectorized
    C per batch, deterministic cross-process — stable across epochs, runs
    and machines, so checkpointed digests compare against future batches.
    THE canonical scheme: both batch ``exact_dup_pairs`` and the streaming
    dedup job use this helper; change it in one place only."""
    vals = texts.fillna("").to_numpy(dtype=object)
    lo = pd.util.hash_array(vals, hash_key="0123456789123456", categorize=False)
    hi = pd.util.hash_array(vals, hash_key="6543210987654321", categorize=False)
    return lo.astype(np.uint64, copy=False), hi.astype(np.uint64, copy=False)


def exact_dup_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int | None = None,
    exchange: str = "hash",
) -> pa.Table:
    """Exact-duplicate STAR edges ``(doc_a = keeper = min id, doc_b =
    dropped dup)`` — the scale shape of exact dedup when the output feeds a
    cluster/apply step (``cluster_duplicates`` + ``apply_dedup``).

    Only ``(hash128, id)`` rows ever leave a batch — never document text.
    Content identity is ``content_hash128`` (shared with the streaming
    dedup job). The exchange groups by a coarse
    ``mix(h_lo) % n_buckets`` bucket (each bucket fully contains its
    hashes, see ``_bucket_pairs``); workers sort each bucket by (hash, id)
    once and emit one edge per NON-first member — a group of m identical
    texts costs m-1 edges, not m(m-1)/2 pairs — so the driver-side result
    is O(duplicates)."""
    if n_buckets is None:
        try:
            import ray as _ray

            n_buckets = max(64, int(_ray.cluster_resources().get("CPU", 8)) * 8)
        except Exception:
            n_buckets = 64

    def hash_ids(df: pd.DataFrame) -> pd.DataFrame:
        lo, hi = content_hash128(df[text_col])
        cols = {
            "h_lo": lo,
            "h_hi": hi,
            id_col: df[id_col].to_numpy(np.int64),
        }
        if exchange != "hash":  # sort path groups by a coarse mixed bucket
            m = (lo ^ (lo >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            m = (m ^ (m >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            m = m ^ (m >> np.uint64(31))
            cols["bucket"] = (m % np.uint64(n_buckets)).astype(np.int32)
        return pd.DataFrame(cols)

    def star_edges(g: pd.DataFrame) -> pd.DataFrame:
        lo = g["h_lo"].to_numpy(np.uint64)
        hi = g["h_hi"].to_numpy(np.uint64)
        ids = g[id_col].to_numpy(np.int64)
        order = np.lexsort((ids, hi, lo))
        lo, hi, ids = lo[order], hi[order], ids[order]
        new = np.empty(len(lo), bool)
        if len(lo):
            new[0] = True
            new[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
        dup = ~new
        if not dup.any():
            return pd.DataFrame(
                {"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64)}
            )
        grp = np.cumsum(new) - 1
        first = ids[np.nonzero(new)[0]]
        return pd.DataFrame({"doc_a": first[grp[dup]], "doc_b": ids[dup]})

    if exchange == "hash":
        from statefulstreamprocessor_ray.stages.exchange import (
            hash_partitioned_map,
            hash_shuffle_window,
        )

        from statefulstreamprocessor_ray.stages.exchange import (
            local_keyed_map,
            sized_hash_partitions,
            small_exchange,
        )

        hashed = ds.map_batches(
            _arrow_wrap(hash_ids), batch_format="pandas"
        ).materialize()
        sz = hashed.size_bytes()
        if small_exchange(sz):
            edges = local_keyed_map(hashed, star_edges).to_pandas()
        else:
            n_parts = sized_hash_partitions(sz)
            # partition on h_lo alone: star_edges groups by the full (lo, hi)
            # internally, and every row of a given lo (hence of a given
            # 128-bit hash) lands in one partition
            with hash_shuffle_window(hashed, n_parts):
                edges = hash_partitioned_map(
                    hashed, ["h_lo"], star_edges, n_parts
                ).to_pandas()
        del hashed
    else:
        edges = (
            ds.map_batches(hash_ids, batch_format="pandas")
            .groupby("bucket")
            .map_groups(star_edges, batch_format="pandas")
            .to_pandas()
        )
    if edges.empty:
        edges = pd.DataFrame(
            {"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64)}
        )
    edges = edges.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.table(
        {
            "doc_a": pa.array(edges["doc_a"].to_numpy(np.int64), pa.int64()),
            "doc_b": pa.array(edges["doc_b"].to_numpy(np.int64), pa.int64()),
        }
    )


def _word_shingles(text: str, k: int) -> set[str]:
    toks = [t for t in text.lower().split() if t]
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _md5_u64(flat: list[str]) -> np.ndarray:
    """DuckDB ``md5_number_lower`` pendant: low 8 digest bytes, little-endian.
    Per-string hashlib loop — only used on oracle-checked (small-sf) paths."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")
            for s in flat
        ),
        np.uint64,
        count=len(flat),
    )


_SHINGLE_C = np.uint64(1099511628211)  # FNV-1a prime, token-hash combiner


def _batch_shingle_hashes(batch, k: int, text_col: str, id_col: str, hash_fn="sip"):
    """Flatten a batch's distinct shingles and hash them vectorized.
    Returns (doc_ids int64[n], counts int64[n_docs], hashes uint64[n])
    where hashes are grouped contiguously per doc.

    ``hash_fn="md5"`` hashes each shingle STRING (DuckDB-reproducible, the
    oracle mode — per-doc Python shingle construction, small-sf only).
    ``hash_fn="sip"`` (THE scale path) never builds shingle strings at all:
    one vectorized SipHash over the batch's flat TOKENS, then a polynomial
    combine of each k-window's token hashes — equal shingles get equal
    hashes, distinct ones collide at ~2^-64 (same risk the string hash
    had), and the per-doc work drops from O(tokens) string joins to flat
    numpy passes. Shingle sets are deduped per doc in both modes."""
    if hash_fn == "md5":
        ids, counts, flat = [], [], []
        for doc_id, text in zip(batch[id_col], batch[text_col].fillna("")):
            sh = _word_shingles(text, k)
            ids.append(doc_id)
            counts.append(len(sh))
            flat.extend(sh)
        hashes = _md5_u64(flat) if flat else np.array([], np.uint64)
        counts = np.asarray(counts, np.int64)
        return np.repeat(np.asarray(ids, np.int64), counts), counts, hashes

    tok_lists = batch[text_col].fillna("").str.lower().str.split()
    n_toks = tok_lists.str.len().to_numpy(np.int64)
    ids = np.asarray(batch[id_col], np.int64)
    n_docs = len(ids)
    if not n_toks.any():
        z = np.zeros(n_docs, np.int64)
        return np.array([], np.int64), z, np.array([], np.uint64)
    flat = np.concatenate([np.asarray(l, dtype=object) for l in tok_lists if l])
    ht = pd.util.hash_array(flat, categorize=False).astype(np.uint64, copy=False)
    doc_idx = np.repeat(np.arange(n_docs), n_toks)

    parts_doc, parts_h = [], []
    # long docs (>= k tokens): every window start whose k-th token is still
    # in the same doc; H = ((ht[p]*C + ht[p+1])*C + ...) over the window
    if (n_toks >= k).any() and len(ht) >= k:
        n_win = len(ht) - k + 1
        valid = doc_idx[:n_win] == doc_idx[k - 1 :]
        h = ht[:n_win].copy()
        for j in range(1, k):
            h = h * _SHINGLE_C + ht[j : n_win + j]
        parts_doc.append(doc_idx[:n_win][valid])
        parts_h.append(h[valid])
    # short docs (0 < n < k): one shingle combining all the doc's tokens.
    # Python-int arithmetic masked to 64 bits — identical wraparound to the
    # uint64 array ops, without numpy's scalar-overflow RuntimeWarning
    short = np.nonzero((n_toks > 0) & (n_toks < k))[0]
    if len(short):
        tok0 = np.concatenate(([0], np.cumsum(n_toks)[:-1]))
        sh = np.empty(len(short), np.uint64)
        c = int(_SHINGLE_C)
        for i, d in enumerate(short):
            h = 0
            for j in range(tok0[d], tok0[d] + n_toks[d]):
                h = (h * c + int(ht[j])) & 0xFFFFFFFFFFFFFFFF
            sh[i] = np.uint64(h)
        parts_doc.append(short.astype(np.int64))
        parts_h.append(sh)

    doc_of_sh = np.concatenate(parts_doc)
    h_all = np.concatenate(parts_h)
    # per-doc distinct: lexsort by (doc, hash), keep run starts — doc order
    # (= batch order) is preserved, hashes stay contiguous per doc
    order = np.lexsort((h_all, doc_of_sh))
    doc_of_sh, h_all = doc_of_sh[order], h_all[order]
    first = np.empty(len(h_all), bool)
    if len(h_all):
        first[0] = True
        first[1:] = (h_all[1:] != h_all[:-1]) | (doc_of_sh[1:] != doc_of_sh[:-1])
    doc_of_sh, h_all = doc_of_sh[first], h_all[first]
    counts = np.bincount(doc_of_sh, minlength=n_docs).astype(np.int64)
    return ids[doc_of_sh], counts, h_all


class ShingleStage:
    """map_batches actor: text -> distinct k-word-shingle hash rows
    (doc_id, shingle_hash). Explode form of the dedup candidate generation."""

    def __init__(
        self, k: int = 3, text_col: str = "text", id_col: str = "doc_id", hash_fn="sip"
    ):
        self.k, self.text_col, self.id_col = k, text_col, id_col
        self.hash_fn = hash_fn

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids, counts, hashes = _batch_shingle_hashes(
            batch, self.k, self.text_col, self.id_col, self.hash_fn
        )
        # carry the doc's total distinct-shingle count on every row: |A| then
        # rides the same shuffle as the intersections, so Jaccard needs no
        # second pass over the corpus
        return pd.DataFrame(
            {
                "doc_id": doc_ids,
                "sh": hashes,
                "n": np.repeat(counts, counts).astype(np.int64),
            }
        )


_HOT_MARKER = -1  # doc_a sentinel row emitted once per max_df-skipped key


def _bucket_pairs(
    keys: list[str],
    carry: tuple[str, ...] = (),
    n_buckets: int | None = None,
    max_df: int | None = None,
):
    """Pair-emission over coarse hash buckets: shuffling thousands of tiny
    per-key groups through groupby().map_groups() drowns in per-group
    overhead, so we group by ``mix(hash(keys)) % n_buckets`` (each bucket
    fully contains its keys) and emit all within-key pairs of a bucket in one
    vectorized pandas pass. Bucket count defaults to 8x cluster CPUs — enough
    distinct values that the sort shuffle's sampled partition boundaries stay
    balanced (see stages/join.py), coarse enough to amortize per-group cost.

    ``carry`` columns are per-doc values replicated onto both pair sides
    (``<c>_a`` / ``<c>_b``) — e.g. shingle counts for Jaccard, simhash codes
    for Hamming — so verification needs no second corpus pass.
    ``max_df`` skips keys matching more than that many docs (see module doc
    for the recall/bias cost); each skipped key emits ONE sentinel row with
    ``doc_a == doc_b == -1`` and ``inter = 1``, so summing sentinel ``inter``
    counts skipped keys (``_split_hot_markers``)."""
    if n_buckets is None:
        try:
            import ray as _ray

            n_buckets = max(64, int(_ray.cluster_resources().get("CPU", 8)) * 8)
        except Exception:
            n_buckets = 64

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = df[keys[0]].to_numpy(dtype=np.uint64)
        for k in keys[1:]:
            h = h * np.uint64(1000003) + df[k].to_numpy(dtype=np.uint64)
        # splitmix64 finalizer: low-cardinality or low-entropy leading keys
        # (e.g. band_id in {0..15}) must still spread over all buckets
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = h ^ (h >> np.uint64(31))
        df = df.copy()
        df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return df

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """Emit the bucket's within-key pairs, PRE-AGGREGATED per (doc_a,
        doc_b): ``inter`` counts how many of this bucket's keys the pair
        shares. Cross-bucket partials are summed by the caller — combiner
        before the exchange, so the pair partials (not the raw per-key pair
        explosion) are all that leaves the task.

        Fully run-length vectorized: one sort by (key, doc_id), run
        boundaries via shifted compares, then size-2 runs — the DOMINANT
        shape on a near-dup corpus, where every shared shingle of a clone
        pair is its own 2-doc key (a 1-GiB corpus with 1% clones has ~4M
        such keys; a per-key loop was the entire verify cost) — emit their
        pair in one gather. Only runs of 3+ docs fall back to a per-run
        triu loop. Singletons and hot keys are filtered before any of it."""
        out_a, out_b = [], []
        out_carry: dict[str, list] = {f"{c}_a": [] for c in carry}
        out_carry.update({f"{c}_b": [] for c in carry})
        key_list = list(keys)
        d = g.drop_duplicates(subset=key_list + ["doc_id"])
        d = d.sort_values(key_list + ["doc_id"], kind="stable")
        n = len(d)
        hot_count = 0
        if n:
            arrs = [d[k].to_numpy() for k in key_list]
            new = np.zeros(n, bool)
            new[0] = True
            for a in arrs:
                new[1:] |= a[1:] != a[:-1]
            run_id = np.cumsum(new) - 1
            run_len = np.bincount(run_id).astype(np.int64)
            row_len = run_len[run_id]
            if max_df is not None:
                hot_count = int((run_len > max_df).sum())
                keep = (row_len >= 2) & (row_len <= max_df)
            else:
                keep = row_len >= 2
            docs = d["doc_id"].to_numpy()[keep]
            carr = {c: d[c].to_numpy()[keep] for c in carry}
            starts = np.nonzero(new[keep])[0]
            lens = row_len[keep][starts]
            # size-2 fast path: within-run doc order is ascending (doc_id
            # is the sort tiebreaker), so row s is doc_a and s+1 is doc_b
            s2 = starts[lens == 2]
            if len(s2):
                out_a.append(docs[s2])
                out_b.append(docs[s2 + 1])
                for c in carry:
                    out_carry[f"{c}_a"].append(carr[c][s2])
                    out_carry[f"{c}_b"].append(carr[c][s2 + 1])
            for s, m in zip(starts[lens > 2], lens[lens > 2]):
                ai, bi = np.triu_indices(m, k=1)
                out_a.append(docs[s + ai])
                out_b.append(docs[s + bi])
                for c in carry:
                    out_carry[f"{c}_a"].append(carr[c][s + ai])
                    out_carry[f"{c}_b"].append(carr[c][s + bi])
        hot_sizes = [0] * hot_count  # one marker per hot key; values unused
        carry_names = [f"{c}_{s}" for c in carry for s in ("a", "b")]
        if not out_a and not hot_sizes:
            cols = {"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64)}
            for cn in carry_names:
                cols[cn] = np.array([], np.int64)
            cols["inter"] = np.array([], np.int64)
            return pd.DataFrame(cols)
        cols = {
            "doc_a": np.concatenate(out_a) if out_a else np.array([], np.int64),
            "doc_b": np.concatenate(out_b) if out_b else np.array([], np.int64),
        }
        for cn in carry_names:
            cols[cn] = (
                np.concatenate(out_carry[cn]) if out_a else np.array([], np.int64)
            )
        df = pd.DataFrame(cols)
        gb_cols = ["doc_a", "doc_b"] + carry_names
        agg = (
            df.groupby(gb_cols, sort=False, as_index=False)
            .size()
            .rename(columns={"size": "inter"})
        )
        if hot_sizes:
            marker = pd.DataFrame(
                {
                    "doc_a": np.full(len(hot_sizes), _HOT_MARKER, np.int64),
                    "doc_b": np.full(len(hot_sizes), _HOT_MARKER, np.int64),
                    **{
                        cn: np.zeros(len(hot_sizes), agg[cn].dtype if len(agg) else np.int64)
                        for cn in carry_names
                    },
                    # inter = 1 per skipped key: markers stay COUNTABLE after
                    # any downstream group-sum collapses equal marker rows
                    "inter": np.ones(len(hot_sizes), np.int64),
                }
            )
            agg = pd.concat([agg, marker], ignore_index=True)
        return agg

    return add_bucket, pairs_in_bucket


def _split_hot_markers(partials: pd.DataFrame) -> tuple[pd.DataFrame, int]:
    """Split max_df sentinel rows off a pair-partial frame; returns
    (real pairs, number of skipped hot keys). Markers carry inter = 1 per
    skipped key, so the count survives group-sums that merge equal rows."""
    if partials.empty:
        return partials, 0
    hot = partials["doc_a"] == _HOT_MARKER
    if "inter" in partials.columns:
        n_hot = int(partials.loc[hot, "inter"].sum())
    else:
        n_hot = int(hot.sum())
    return partials[~hot], n_hot


def _jaccard_pairs_df(
    sh: ray.data.Dataset,
    max_df: int | None = None,
    threshold: float | None = None,
    exchange: str = "hash",
    num_partitions: int | None = None,
    metric: str = "jaccard",
) -> tuple[pd.DataFrame, int]:
    """Shingle rows (doc_id, sh, n) -> exact-Jaccard pair frame
    (doc_a, doc_b, jaccard) plus the hot-shingle skip count.

    Fully distributed reduction: co-locate each shingle's rows -> pair
    partials with (n_a, n_b) -> group-sum of the partials -> Jaccard +
    threshold filter IN THE WORKERS. The driver receives only pairs that
    already pass the threshold (plus the tiny hot-marker rows).

    ``exchange="hash"`` (default, the scale path) runs both exchanges as
    linear hash repartitions (stages/exchange.py) — no sort anywhere;
    ``"sort"`` keeps the r3 bucketed sort-shuffle shape (the 20 GiB probe
    showed the candidate sort going superlinear on one box)."""
    if exchange == "hash":
        return _jaccard_pairs_df_hash(
            sh,
            max_df=max_df,
            threshold=threshold,
            num_partitions=num_partitions,
            metric=metric,
        )
    from statefulstreamprocessor_ray.functions.ops import sharded_group_sum

    add_bucket, pairs_in_bucket = _bucket_pairs(["sh"], carry=("n",), max_df=max_df)
    partials = (
        sh.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )
    summed = sharded_group_sum(
        partials, keys=["doc_a", "doc_b", "n_a", "n_b"], sums={"inter": "inter"}
    )

    out = summed.map_batches(
        _jac_filter_fn(threshold, metric), batch_format="pandas"
    ).to_pandas()
    return _finish_jaccard(out)


def _jac_filter_fn(threshold: float | None, metric: str = "jaccard"):
    """Score + threshold filter over summed pair partials; hot-marker rows
    always pass so their counts reach the driver. ``metric``: "jaccard" =
    inter/union; "containment" = the overlap coefficient inter/min(|A|,|B|)
    (catches a small doc contained in a big one, where |A| << |B| drives
    Jaccard down but containment stays ~1). The score rides the internal
    "jaccard" column either way; public containment entry points rename."""

    def jac_filter(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "doc_a": np.array([], np.int64),
                    "doc_b": np.array([], np.int64),
                    "jaccard": np.array([], np.float64),
                    "inter": np.array([], np.int64),
                }
            )
        hot = df["doc_a"].to_numpy() == _HOT_MARKER
        if metric == "containment":
            denom = np.minimum(
                df["n_a"].to_numpy(np.float64), df["n_b"].to_numpy(np.float64)
            )
        else:
            denom = (df["n_a"] + df["n_b"] - df["inter"]).to_numpy(np.float64)
        union = denom
        jac = np.where(union > 0, df["inter"].to_numpy(np.float64) / np.where(union > 0, union, 1.0), 0.0)
        keep = hot | (jac >= threshold if threshold is not None else np.ones(len(df), bool))
        return pd.DataFrame(
            {
                "doc_a": df["doc_a"].to_numpy(np.int64)[keep],
                "doc_b": df["doc_b"].to_numpy(np.int64)[keep],
                "jaccard": jac[keep],
                "inter": df["inter"].to_numpy(np.int64)[keep],  # marker counts
            }
        )

    return jac_filter


def _finish_jaccard(out: pd.DataFrame) -> tuple[pd.DataFrame, int]:
    if out.empty:
        out = pd.DataFrame({c: [] for c in ["doc_a", "doc_b", "jaccard", "inter"]})
    out, n_hot = _split_hot_markers(out)
    return (
        out.drop(columns=["inter"]).astype({"doc_a": np.int64, "doc_b": np.int64}),
        n_hot,
    )


def _arrow_wrap(fn):
    """Emit the pandas fn's output as an Arrow table so downstream hash
    exchanges carry Arrow blocks (pandas simple blocks spam the aggregators'
    schema-dedup log and serialize heavier)."""

    def wrapped(df: pd.DataFrame) -> pa.Table:
        # strip from_pandas' schema metadata: the embedded pandas dict makes
        # the schema unhashable, defeating Ray's schema dedup (one warning
        # per aggregator block) and bloating every shard
        t = pa.Table.from_pandas(fn(df), preserve_index=False)
        return t.replace_schema_metadata(None)

    return wrapped


def _jaccard_pairs_df_hash(
    sh: ray.data.Dataset,
    max_df: int | None = None,
    threshold: float | None = None,
    num_partitions: int | None = None,
    metric: str = "jaccard",
) -> tuple[pd.DataFrame, int]:
    """Hash-exchange body of :func:`_jaccard_pairs_df`: repartition by the
    shingle hash itself (each partition fully contains its shingles, so
    ``max_df`` keeps exact global semantics), emit pre-aggregated pair
    partials per partition, then ONE more hash exchange group-sums the
    partials by pair. Both exchanges are linear — no sort anywhere."""
    from statefulstreamprocessor_ray.stages.exchange import (
        hash_partitioned_map,
        hash_shuffle_window,
        local_keyed_map,
        sized_hash_partitions,
        small_exchange,
    )

    _, pairs_in_bucket = _bucket_pairs(["sh"], carry=("n",), max_df=max_df)
    sum_keys = ["doc_a", "doc_b", "n_a", "n_b"]

    def group_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(sum_keys, sort=False, as_index=False)["inter"].sum()

    # each exchange sizes its partitions by the MEASURED payload: the shingle
    # table is O(corpus tokens), the pair partials usually orders of
    # magnitude smaller — one fixed count would starve one or tax the other.
    # An EXPLICIT num_partitions skips the sizing materializes entirely —
    # callers pass it when they already know the scale (e.g. the minhash
    # verify over a known-small candidate set; each barrier costs ~0.3 s)
    if num_partitions is None:
        sh_in = sh.materialize()
        sz = sh_in.size_bytes()
        if small_exchange(sz):
            # one-partition payload: run both stages in single coalesced
            # tasks — the partials block flows whole into group_sum
            partials = local_keyed_map(sh_in, _arrow_wrap(pairs_in_bucket))
            summed = partials.map_batches(
                _arrow_wrap(group_sum), batch_format="pandas", batch_size=None
            )
            out = summed.map_batches(
                _jac_filter_fn(threshold, metric), batch_format="pandas"
            ).to_pandas()
            del sh_in
            return _finish_jaccard(out)
        n1 = sized_hash_partitions(sz)
    else:
        sh_in, n1 = sh, num_partitions
    with hash_shuffle_window(sh_in, n1):
        partials = hash_partitioned_map(
            sh_in, ["sh"], _arrow_wrap(pairs_in_bucket), n1
        )
        if num_partitions is None:
            partials = partials.materialize()
            n2 = sized_hash_partitions(partials.size_bytes())
        else:
            n2 = num_partitions
        summed = hash_partitioned_map(
            partials, sum_keys, _arrow_wrap(group_sum), n2
        )
        out = summed.map_batches(
            _jac_filter_fn(threshold, metric), batch_format="pandas"
        ).to_pandas()
    del sh_in, partials
    return _finish_jaccard(out)


def _pairs_table(rows: pd.DataFrame, value_col: str, value_type, n_hot: int) -> pa.Table:
    rows = rows.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    tbl = pa.table(
        {
            "doc_a": pa.array(rows["doc_a"].to_numpy(np.int64), pa.int64()),
            "doc_b": pa.array(rows["doc_b"].to_numpy(np.int64), pa.int64()),
            value_col: pa.array(rows[value_col].to_numpy(), value_type),
        }
    )
    return tbl.replace_schema_metadata({"hot_keys_skipped": str(n_hot)})


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.5,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
    exchange: str = "hash",
) -> pa.Table:
    """Exact n-gram-Jaccard duplicate pairs: (doc_a, doc_b, jaccard >= t).

    ONE pass over the corpus, one pipeline, two shuffles whose payloads
    shrink at each step. Candidate generation is complete because
    J(a,b) > 0 implies a shared shingle. ``max_df`` (optional) caps hot
    shingles — see module docstring for the exact semantics.
    ``exchange``: "hash" (linear hash repartition, default) or "sort".
    """
    # plain-function stage (tasks): ShingleStage's init is trivial, so an
    # actor pool only adds startup latency; Arrow output keeps the shingle
    # exchange Arrow-native
    sh = ds.map_batches(
        _arrow_wrap(ShingleStage(k=k, text_col=text_col, id_col=id_col)),
        batch_format="pandas",
    )
    pairs, n_hot = _jaccard_pairs_df(
        sh, max_df=max_df, threshold=threshold, exchange=exchange
    )
    return _pairs_table(pairs, "jaccard", pa.float64(), n_hot)


def ngram_containment_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.8,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
    exchange: str = "hash",
) -> pa.Table:
    """Exact n-gram CONTAINMENT duplicate pairs: the overlap coefficient
    ``|S(A) ∩ S(B)| / min(|S(A)|, |S(B)|) >= t`` over k-token shingle sets.

    The quote/excerpt/superset detector Jaccard structurally misses: a
    200-shingle doc fully embedded in a 5,000-shingle doc has containment
    1.0 but Jaccard ~0.04 — exactly the partial-copy shape (boilerplate
    wrappers around syndicated articles, chat logs quoting earlier docs)
    a curation pass wants to catch. Same single-pass machinery and scale
    path as :func:`ngram_jaccard_pairs` (shared-shingle blocking is still
    complete: containment > 0 implies a shared shingle); only the
    worker-side score formula differs. Returns (doc_a, doc_b, containment)
    with a < b, sorted."""
    sh = ds.map_batches(
        _arrow_wrap(ShingleStage(k=k, text_col=text_col, id_col=id_col)),
        batch_format="pandas",
    )
    pairs, n_hot = _jaccard_pairs_df(
        sh, max_df=max_df, threshold=threshold, exchange=exchange,
        metric="containment",
    )
    pairs = pairs.rename(columns={"jaccard": "containment"})
    return _pairs_table(pairs, "containment", pa.float64(), n_hot)


# ---------------------------------------------------------------------------
# MinHash + LSH


def _minhash_params(n_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


_BAND_SALT = np.uint64(0x9E3779B97F4A7C15)


class MinHashStage:
    """map_batches actor: doc -> (doc_id, band_key) LSH bucket rows.

    Signature: n_perm universal-hash permutations over 64-bit shingle hashes;
    bands of r rows hashed to a bucket key. Deterministic given (n_perm, seed).

    The band index is FOLDED into the band hash (one mixed uint64 key instead
    of (band_id, band_hash)): two docs share a ``band_key`` iff they agree on
    the same band's hash — identical candidate semantics, and the candidate
    exchange carries exactly (band_key: uint64, doc_id: int64) per row, the
    narrowest possible band table (the r3 volume run showed the exchange
    width, not the map, dominating above ~5 GiB).
    """

    def __init__(
        self, n_perm=64, bands=16, k=3, text_col="text", id_col="doc_id", seed=7,
        hash_fn="sip",
    ):
        assert n_perm % bands == 0
        self.a, self.b = _minhash_params(n_perm, seed)
        self.n_perm, self.bands, self.r = n_perm, bands, n_perm // bands
        self.k, self.text_col, self.id_col = k, text_col, id_col
        self.hash_fn = hash_fn

    def signature(self, text: str) -> np.ndarray | None:
        """Single-doc signature (kept for direct use/tests); shares the
        batch path's shingle-hash scheme via ``_batch_shingle_hashes``."""
        batch = pd.DataFrame({self.id_col: [0], self.text_col: [text]})
        _, counts, sh = _batch_shingle_hashes(
            batch, self.k, self.text_col, self.id_col, self.hash_fn
        )
        if counts[0] == 0:
            return None
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % MERSENNE
        return vals.min(axis=1)

    @staticmethod
    def _fold_band_keys(h: np.ndarray) -> np.ndarray:
        """(…, bands) raw band hashes -> folded uint64 band keys: XOR a
        per-band salt ((band_id+1) * golden-ratio constant), then a full
        splitmix64 finalize so equal hashes in DIFFERENT bands never share a
        key (beyond the ~2^-64 collision rate the hash already has)."""
        bands = h.shape[-1]
        bid = (np.arange(bands, dtype=np.uint64) + np.uint64(1)) * _BAND_SALT
        k = h ^ bid
        k = (k ^ (k >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        k = (k ^ (k >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return k ^ (k >> np.uint64(31))

    def band_keys(self, sig: np.ndarray) -> np.ndarray:
        """Folded band keys of one signature (tests / streaming dedup)."""
        band = sig.reshape(self.bands, self.r)
        h = np.zeros(self.bands, np.uint64)
        for j in range(self.r):
            h = h * np.uint64(1_000_003) + band[:, j]
        return self._fold_band_keys(h[None, :])[0]

    def signatures_batch(self, batch: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        """Batch signatures: ``(ids int64[n], sig uint64[n, n_perm])`` for the
        docs with at least one shingle (empty texts are dropped — they have
        no bands and can never collide). Shared by ``__call__`` and the
        streaming verify gate's sketch table."""
        doc_ids_rep, counts, flat = _batch_shingle_hashes(
            batch, self.k, self.text_col, self.id_col, self.hash_fn
        )
        keep = counts > 0
        if not keep.any():
            return np.array([], np.int64), np.empty((0, self.n_perm), np.uint64)
        # per-doc segment boundaries into the flat hash array
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))[keep]
        ids = np.asarray(batch[self.id_col], np.int64)[keep]
        # signatures: for each permutation, (a*x+b) % p then per-doc min —
        # np.minimum.reduceat over the flat array, one pass per permutation
        n_docs = int(keep.sum())
        sig = np.empty((n_docs, self.n_perm), np.uint64)
        for p in range(self.n_perm):
            vals = (flat * self.a[p] + self.b[p]) % MERSENNE
            sig[:, p] = np.minimum.reduceat(vals, starts)
        return ids, sig

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, sig = self.signatures_batch(batch)
        if not len(ids):
            return pd.DataFrame(
                {
                    "doc_id": np.array([], np.int64),
                    "band_key": np.array([], np.uint64),
                }
            )
        n_docs = len(ids)
        # band hashes: polynomial combine of each band's r rows, vectorized,
        # then the band index folded in -> one uint64 key per (doc, band)
        band = sig.reshape(n_docs, self.bands, self.r)
        h = np.zeros((n_docs, self.bands), np.uint64)
        for j in range(self.r):
            h = h * np.uint64(1_000_003) + band[:, :, j]
        return pd.DataFrame(
            {
                "doc_id": np.repeat(ids, self.bands),
                "band_key": self._fold_band_keys(h).reshape(-1),
            }
        )


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.5,
    n_perm: int = 64,
    bands: int = 16,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
    exchange: str = "hash",
) -> pa.Table:
    """Near-dup candidate pairs via banded MinHash LSH, verified with exact
    Jaccard (so false positives are filtered; recall is probabilistic).

    Fully distributed: banding runs in map_batches, candidate pairs come out
    of a band-key co-location exchange, and the exact-Jaccard verify
    re-shingles ONLY docs that appear in some candidate pair — inside
    map_batches, via a broadcast candidate-id filter. The driver holds the
    candidate-pair set (O(duplicates)) and never the corpus. ``max_df`` caps
    hot band buckets.

    ``exchange="hash"`` (default) repartitions the (band_key, doc_id) table
    by band_key — a linear hash exchange of the narrowest possible band
    table, replacing the r3 sort-shuffle whose sort went superlinear above
    ~5 GiB on one box (763 s of the 1,113 s 20 GiB run); ``"sort"`` keeps
    that shape for comparison.
    """
    import ray as _ray

    buckets = ds.map_batches(
        _arrow_wrap(
            MinHashStage(
                n_perm=n_perm, bands=bands, k=k, text_col=text_col, id_col=id_col
            )
        ),
        batch_format="pandas",
    )
    if exchange == "hash":
        from statefulstreamprocessor_ray.stages.exchange import (
            hash_partitioned_map,
            hash_shuffle_window,
        )

        from statefulstreamprocessor_ray.stages.exchange import (
            local_keyed_map,
            sized_hash_partitions,
            small_exchange,
        )

        _, pairs_in_bucket = _bucket_pairs(["band_key"], max_df=max_df)
        # materialize the band table (the shuffle barrier needs it resident
        # anyway) so the partition count scales with its MEASURED size
        band_mat = buckets.materialize()
        sz = band_mat.size_bytes()
        if small_exchange(sz):
            cand_df = local_keyed_map(band_mat, pairs_in_bucket).to_pandas()
        else:
            n_parts = sized_hash_partitions(sz)
            with hash_shuffle_window(band_mat, n_parts):
                cand_df = hash_partitioned_map(
                    band_mat, ["band_key"], pairs_in_bucket, n_parts
                ).to_pandas()
        del band_mat
    else:
        add_bucket, pairs_in_bucket = _bucket_pairs(["band_key"], max_df=max_df)
        cand_df = (
            buckets.map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket")
            .map_groups(pairs_in_bucket, batch_format="pandas")
            .to_pandas()
        )
    cand_df, n_hot = _split_hot_markers(cand_df)
    if cand_df.empty:
        cand_df = pd.DataFrame({"doc_a": [], "doc_b": []})
    cand_df = cand_df[["doc_a", "doc_b"]].drop_duplicates().astype(np.int64)

    # exact-Jaccard verify, distributed: shingle only candidate docs (the
    # broadcast id set is O(dup docs)), then the same blocked-Jaccard shuffle
    # as ngram_jaccard_pairs restricted to those docs. A candidate pair with
    # J > 0 shares a shingle, so it appears in the blocked pair set; the
    # inner merge below drops blocked pairs that were never LSH candidates.
    cand_ids = np.unique(
        np.concatenate([cand_df["doc_a"].to_numpy(), cand_df["doc_b"].to_numpy()])
    ) if len(cand_df) else np.array([], np.int64)
    ids_ref = _ray.put(cand_ids)

    def keep_candidates(t: pa.Table) -> pa.Table:
        want = _ray.get(ids_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(ids, want)))

    sh = ds.select_columns([id_col, text_col]).map_batches(
        keep_candidates, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        _arrow_wrap(ShingleStage(k=k, text_col=text_col, id_col=id_col)),
        batch_format="pandas",
    )
    # threshold pushed into the workers: only above-threshold pairs (among
    # the restricted candidate docs) ever reach the driver. The verify
    # exchanges size their partitions by the KNOWN candidate-doc count —
    # the candidate set is usually a tiny fraction of the corpus, and each
    # hash partition costs ~80 ms fixed (see stages/exchange.py)
    verify_parts = None
    if exchange == "hash" and len(cand_ids) > 20_000:
        from statefulstreamprocessor_ray.stages.exchange import (
            default_hash_partitions,
        )

        verify_parts = max(
            8, min(default_hash_partitions(None), len(cand_ids) // 20_000 + 1)
        )
    # <= 20k candidate docs: leave num_partitions unset so the exchange
    # measures the (candidate-restricted, tiny) shingle table and takes the
    # single-task local path — the sizing barrier costs one materialize of
    # a table the shuffle barrier needed resident anyway
    jac_df, _ = _jaccard_pairs_df(
        sh, threshold=threshold, exchange=exchange, num_partitions=verify_parts
    )
    merged = cand_df.merge(jac_df, on=["doc_a", "doc_b"], how="inner")
    merged = merged[merged["jaccard"] >= threshold].copy()
    merged["jaccard_r"] = merged["jaccard"].round(6)
    return _pairs_table(merged, "jaccard_r", pa.float64(), n_hot)


# ---------------------------------------------------------------------------
# SimHash


class SimHashStage:
    """map_batches actor: doc -> 64-bit simhash over word-shingle hashes."""

    def __init__(
        self, k: int = 2, text_col: str = "text", id_col: str = "doc_id", hash_fn="sip"
    ):
        self.k, self.text_col, self.id_col = k, text_col, id_col
        self.hash_fn = hash_fn

    def simhash(self, text: str) -> int:
        """Single-doc simhash (kept for direct use/tests); shares the batch
        path's shingle-hash scheme via ``_batch_shingle_hashes``."""
        batch = pd.DataFrame({self.id_col: [0], self.text_col: [text]})
        _, counts, hs = _batch_shingle_hashes(
            batch, self.k, self.text_col, self.id_col, self.hash_fn
        )
        if counts[0] == 0:
            return 0
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        return int(((votes >= 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids_rep, counts, flat = _batch_shingle_hashes(
            batch, self.k, self.text_col, self.id_col, self.hash_fn
        )
        n_docs = len(counts)
        out = np.zeros(n_docs, np.uint64)
        nonzero = counts > 0
        if nonzero.any():
            # set-bit counts per doc per position: unpackbits to a (n, 64)
            # little-endian bit matrix, then one np.add.reduceat per batch
            # (accumulate straight into int64 — an .astype(int64) of the bit
            # matrix would copy 8x the bytes and dominated this stage)
            bits = np.unpackbits(
                flat.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            )
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))[nonzero]
            ones = np.add.reduceat(bits, starts, axis=0, dtype=np.int64)
            votes = 2 * ones - counts[nonzero][:, None]  # ones - zeros
            codes = ((votes >= 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(
                axis=1
            )
            out[nonzero] = codes
        return pd.DataFrame(
            {
                "doc_id": np.asarray(batch[self.id_col], np.int64),
                "simhash": out,
            }
        )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for uint64 arrays (numpy<2 has no bitwise_count)."""
    if len(x) == 0:
        return np.array([], np.int64)
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(
        axis=1, dtype=np.int64
    )


def simhash_pairs(
    ds: ray.data.Dataset,
    max_hamming: int = 3,
    k: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "sip",
    max_df: int | None = None,
    exchange: str = "hash",
) -> pa.Table:
    """Near-dup pairs with simhash Hamming distance <= max_hamming.

    Blocking: 4 16-bit bands — any pair within Hamming 3 agrees on >= 1 band
    (pigeonhole), so candidate generation is complete for max_hamming <= 3.

    Fully distributed: codes in map_batches, band-bucket pair generation in
    the same bucketed groupby as the Jaccard paths (codes ride the shuffle as
    carry columns), XOR+popcount verify vectorized in a worker stage. The
    driver sees only verified pairs. ``hash_fn="md5"`` makes the whole
    pipeline reproducible in SQL (see queries' simhash oracle).
    """
    sims = ds.map_batches(
        SimHashStage(k=k, text_col=text_col, id_col=id_col, hash_fn=hash_fn),
        batch_format="pandas",
    )

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        h = df["simhash"].to_numpy(dtype=np.uint64)
        n = len(df)
        ids = df["doc_id"].to_numpy(np.int64)
        bands = np.tile(np.arange(4, dtype=np.int64), n)
        rep = np.repeat(h, 4)
        key16 = (rep >> (np.uint64(16) * bands.astype(np.uint64))) & np.uint64(0xFFFF)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(ids, 4),
                "band": bands,
                "key16": key16.astype(np.int64),
                # full code rides the shuffle as int64 view for the verify
                "code": h.view(np.int64).repeat(4),
            }
        )

    add_bucket, pairs_in_bucket = _bucket_pairs(
        ["band", "key16"], carry=("code",), max_df=max_df
    )

    def hamming_verify(df: pd.DataFrame) -> pd.DataFrame:
        """XOR+popcount in the worker; hot-key marker rows pass through with
        hamming = -1 so the driver can count them without a second pass."""
        df, n_hot_local = _split_hot_markers(df)
        if df.empty:
            out = pd.DataFrame(
                {
                    "doc_a": np.array([], np.int64),
                    "doc_b": np.array([], np.int64),
                    "hamming": np.array([], np.int64),
                }
            )
        else:
            x = df["code_a"].to_numpy(np.int64).view(np.uint64) ^ df[
                "code_b"
            ].to_numpy(np.int64).view(np.uint64)
            ham = _popcount64(x)
            keep = ham <= max_hamming
            out = pd.DataFrame(
                {
                    "doc_a": df["doc_a"].to_numpy(np.int64)[keep],
                    "doc_b": df["doc_b"].to_numpy(np.int64)[keep],
                    "hamming": ham[keep],
                }
            )
        if n_hot_local:
            out = pd.concat(
                [
                    out,
                    pd.DataFrame(
                        {
                            "doc_a": np.full(n_hot_local, _HOT_MARKER, np.int64),
                            "doc_b": np.full(n_hot_local, _HOT_MARKER, np.int64),
                            "hamming": np.full(n_hot_local, -1, np.int64),
                        }
                    ),
                ],
                ignore_index=True,
            )
        return out

    # verify runs in the workers; the driver only drop-duplicates the
    # verified pair set across bands and counts hot-key markers
    if exchange == "hash":
        from statefulstreamprocessor_ray.stages.exchange import (
            hash_partitioned_map,
            hash_shuffle_window,
        )

        from statefulstreamprocessor_ray.stages.exchange import (
            local_keyed_map,
            sized_hash_partitions,
            small_exchange,
        )

        band_mat = sims.map_batches(
            _arrow_wrap(band_rows), batch_format="pandas"
        ).materialize()
        sz = band_mat.size_bytes()
        if small_exchange(sz):
            verified = (
                local_keyed_map(band_mat, _arrow_wrap(pairs_in_bucket))
                .map_batches(hamming_verify, batch_format="pandas")
                .to_pandas()
            )
        else:
            n_parts = sized_hash_partitions(sz)
            with hash_shuffle_window(band_mat, n_parts):
                verified = (
                    hash_partitioned_map(
                        band_mat,
                        ["band", "key16"],
                        _arrow_wrap(pairs_in_bucket),
                        n_parts,
                    )
                    .map_batches(hamming_verify, batch_format="pandas")
                    .to_pandas()
                )
        del band_mat
    else:
        verified = (
            sims.map_batches(band_rows, batch_format="pandas")
            .map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket")
            .map_groups(pairs_in_bucket, batch_format="pandas")
            .map_batches(hamming_verify, batch_format="pandas")
            .to_pandas()
        )
    verified, n_hot = _split_hot_markers(verified)
    if verified.empty:
        # zero pairs anywhere -> Ray hands back a COLUMN-LESS empty frame
        # (empty-Dataset schema loss); rebuild the shape explicitly
        verified = pd.DataFrame(
            {c: np.array([], np.int64) for c in ("doc_a", "doc_b", "hamming")}
        )
    out = verified.drop_duplicates(["doc_a", "doc_b"])
    out = out.astype({"doc_a": np.int64, "doc_b": np.int64})
    out = out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    tbl = pa.table(
        {
            "doc_a": pa.array(out["doc_a"].to_numpy(np.int64), pa.int64()),
            "doc_b": pa.array(out["doc_b"].to_numpy(np.int64), pa.int64()),
            "hamming": pa.array(out["hamming"].to_numpy(np.int64), pa.int32()),
        }
    )
    return tbl.replace_schema_metadata({"hot_keys_skipped": str(n_hot)})


def cluster_duplicates(pairs: pa.Table, a_col: str = "doc_a", b_col: str = "doc_b") -> dict:
    """Union-find over the (small) verified duplicate-pair set: doc_id ->
    cluster representative (min id). The pair set is the output of the
    LSH/Jaccard stages — orders of magnitude smaller than the corpus, so
    driver-side union-find is the sanctioned pattern; the corpus-side apply
    stays distributed (see :func:`apply_dedup`)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    seen: set[int] = set()
    for a, b in zip(pairs[a_col].to_pylist(), pairs[b_col].to_pylist()):
        a, b = int(a), int(b)
        seen.update((a, b))
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in seen}


def apply_dedup(
    ds: ray.data.Dataset, clusters: dict, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Drop non-representative duplicates: broadcast the (small) cluster map
    once via ray.put, filter inside map_batches — no shuffle."""
    import ray as _ray

    drop = {k for k, rep in clusters.items() if rep != k}
    ref = _ray.put(np.array(sorted(drop), dtype=np.int64))

    def fn(batch: pa.Table) -> pa.Table:
        bad = _ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keep = ~np.isin(ids, bad)
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Embedding cosine near-dup


def embedding_dup_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "exact",
    n_list: int | None = None,
    n_assign: int = 2,
    train_sample: int = 65536,
    seed: int = 23,
    block: int = 2048,
    force: bool = False,
    exact_row_limit: int = 5_000_000,
) -> pa.Table:
    """Pairs with cosine similarity >= threshold over a list<float> column.

    ``mode="exact"`` is the DEFAULT: it returns every qualifying pair at any
    threshold (ADVICE r3: the r3 auto-default silently routed >= 0.9
    thresholds to IVF, whose ``n_assign``-nearest-list assignment does not
    guarantee a shared list for every pair — callers relying on the old
    exact default could lose pairs). The approximate scale path requires an
    explicit opt-in: ``mode="ivf"``, or ``mode="auto"`` which routes
    >= 0.9 thresholds to IVF and the rest to exact. IVF recall is
    probabilistic — near-identical vectors share a nearest list with
    overwhelming probability (asserted >= 0.999 on the injected-clone corpus
    in test_shard_vectorized_ops.py) but it is NOT exhaustive.

    - ``mode="exact"``: all-pairs, distributed — the corpus's pruned blocks
      are materialized to the object store and the normalized matrix is
      assembled INSIDE a worker task (the driver only ever holds
      ObjectRefs; peak driver memory is O(pairs), not O(corpus)); each
      map_batches task then reads the one broadcast copy zero-copy and
      computes its block x corpus matmul, emitting only above-threshold
      pairs. Exact for ANY threshold, but all-pairs is inherently O(n^2)
      compute — the honest small/medium-corpus path.
    - ``mode="ivf"``: the scale path for true near-dup thresholds (>= ~0.9):
      spherical-k-means centroids from a bounded sample (similarity.py's
      trainer), each vector assigned to its ``n_assign`` nearest lists,
      shuffle by list, within-list matmul in workers. Near-identical vectors
      share a nearest list with overwhelming probability; recall is
      probabilistic (asserted in tests), driver memory is O(pairs).
    """
    from statefulstreamprocessor_ray.stages.similarity import (
        _normalize,
        _to_matrix,
        _train_centroids,
    )

    import ray as _ray

    if mode == "auto":
        mode = "ivf" if threshold >= 0.9 else "exact"
    sel = ds.select_columns([id_col, vec_col])

    if mode == "exact":
        # materialize the pruned (id, vec) blocks into the object store;
        # the driver keeps ObjectRefs only — the concat+normalize runs in a
        # worker task and its result is the broadcast object
        mat = sel.materialize()
        n_rows = mat.count()
        # O(n^2) job-killer guard (VERDICT r4 #6): exact mode is the correct
        # DEFAULT semantics (every qualifying pair), but an accidental exact
        # run over 10^8+ rows is ~n^2*dim FLOPs — at 5M x 5M x 128 dims
        # that is already ~3.2e15 multiply-adds. Make the cliff explicit.
        if n_rows > exact_row_limit and not force:
            raise ValueError(
                f"embedding_dup_pairs(mode='exact') over {n_rows:,} rows is "
                f"an O(n^2) all-pairs job (limit {exact_row_limit:,}). Pass "
                "mode='ivf' (the probabilistic scale path), raise "
                "exact_row_limit, or pass force=True if you really mean it."
            )
        block_refs = list(mat.to_arrow_refs())
        if not block_refs or n_rows == 0:
            return pa.table(
                {
                    "vec_a": pa.array([], pa.int64()),
                    "vec_b": pa.array([], pa.int64()),
                    "cos_r": pa.array([], pa.float64()),
                }
            )

        @_ray.remote
        def assemble(*blocks: pa.Table) -> dict:
            tbl = pa.concat_tables(blocks)
            return {
                "ids": tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64),
                "unit": _normalize(_to_matrix(tbl[vec_col])),
            }

        ref = assemble.remote(*block_refs)
        sel = mat

        def block_pairs(t: pa.Table) -> pa.Table:
            corpus = _ray.get(ref)  # zero-copy object-store read
            bids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            bunit = _normalize(_to_matrix(t[vec_col]))
            out_a, out_b, out_s = [], [], []
            # chunk BOTH dimensions with constant shapes: a fresh GB-scale
            # sims allocation per call pays first-touch page faults every
            # time (measured 28s cold vs 2.4s steady for one 2048x100k
            # GEMM); constant-shape chunks let the allocator reuse arenas.
            # Threshold prefilter on the raw values (half-ulp-of-round
            # margin, superset), round only the candidates, recheck exactly
            # — rounding the full matrix was the other hidden cost.
            CH = 16384
            cunit, cids = corpus["unit"], corpus["ids"]
            for i0 in range(0, len(bids), block):
                bl = bunit[i0 : i0 + block]
                for j0 in range(0, len(cids), CH):
                    raw = bl @ cunit[j0 : j0 + CH].T
                    ii, jj = np.nonzero(raw >= threshold - 6e-7)
                    sims = np.round(raw[ii, jj], 6)
                    a = bids[i0 + ii]
                    b = cids[j0 + jj]
                    keep = (a < b) & (sims >= threshold)
                    out_a.append(a[keep])
                    out_b.append(b[keep])
                    out_s.append(sims[keep])
            return pa.table(
                {
                    "vec_a": pa.array(np.concatenate(out_a) if out_a else [], pa.int64()),
                    "vec_b": pa.array(np.concatenate(out_b) if out_b else [], pa.int64()),
                    "cos_r": pa.array(
                        np.concatenate(out_s) if out_s else [], pa.float64()
                    ),
                }
            )

        pairs = sel.map_batches(
            block_pairs, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        if pairs.empty:  # zero pairs -> Ray loses the empty frame's schema
            pairs = pd.DataFrame({c: [] for c in ("vec_a", "vec_b", "cos_r")})
    elif mode == "ivf":
        sample_parts = list(
            sel.limit(train_sample).iter_batches(
                batch_size=65536, batch_format="pyarrow"
            )
        )
        if not sample_parts:
            return pa.table(
                {
                    "vec_a": pa.array([], pa.int64()),
                    "vec_b": pa.array([], pa.int64()),
                    "cos_r": pa.array([], pa.float64()),
                }
            )
        sample = _normalize(_to_matrix(pa.concat_tables(sample_parts)[vec_col]))
        if n_list is None:
            n_list = max(8, int(np.sqrt(len(sample))))
        cent = _train_centroids(sample, n_list, seed=seed)
        cref = _ray.put(cent)
        m = min(n_assign, len(cent))

        def assign(t: pa.Table) -> pa.Table:
            c = _ray.get(cref)
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            unit = _normalize(_to_matrix(t[vec_col]))
            sims = unit @ c.T
            top = np.argpartition(-sims, m - 1, axis=1)[:, :m].astype(np.int32)
            n, d = unit.shape
            flat = np.repeat(unit, m, axis=0).ravel()
            offsets = np.arange(n * m + 1, dtype=np.int32) * d
            vecs = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(flat, pa.float32())
            )
            return pa.table(
                {
                    "list_id": pa.array(top.ravel(), pa.int32()),
                    id_col: pa.array(np.repeat(ids, m), pa.int64()),
                    "unit_vec": vecs,
                }
            )

        def pairs_in_list(t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            # unique ids within the list (n_assign can duplicate a vector
            # into the same list when argpartition ties)
            _, first = np.unique(ids, return_index=True)
            ids = ids[first]
            unit = _to_matrix(t["unit_vec"])[first]
            out_a, out_b, out_s = [], [], []
            for i0 in range(0, len(ids), block):
                raw = unit[i0 : i0 + block] @ unit.T
                ii, jj = np.nonzero(raw >= threshold - 6e-7)  # see block_pairs
                sims = np.round(raw[ii, jj], 6)
                a, b = ids[i0 + ii], ids[jj]
                keep = (a < b) & (sims >= threshold)
                out_a.append(a[keep])
                out_b.append(b[keep])
                out_s.append(sims[keep])
            return pa.table(
                {
                    "vec_a": pa.array(np.concatenate(out_a) if out_a else [], pa.int64()),
                    "vec_b": pa.array(np.concatenate(out_b) if out_b else [], pa.int64()),
                    "cos_r": pa.array(
                        np.concatenate(out_s) if out_s else [], pa.float64()
                    ),
                }
            )

        pairs = (
            sel.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("list_id")
            .map_groups(pairs_in_list, batch_format="pyarrow")
            .to_pandas()
        )
        if pairs.empty:  # zero pairs -> Ray loses the empty frame's schema
            pairs = pd.DataFrame({c: [] for c in ("vec_a", "vec_b", "cos_r")})
        pairs = pairs.drop_duplicates(["vec_a", "vec_b"])
    else:
        raise ValueError(f"unknown mode {mode!r}")

    pairs = pairs.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    return pa.table(
        {
            "vec_a": pa.array(pairs["vec_a"].to_numpy(np.int64), pa.int64()),
            "vec_b": pa.array(pairs["vec_b"].to_numpy(np.int64), pa.int64()),
            "cos_r": pa.array(pairs["cos_r"].to_numpy(np.float64), pa.float64()),
        }
    )
