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

All shingling/hashing is deterministic — ``pd.util.hash_array`` (fixed-key
SipHash, stable cross-process), never Python's salted ``hash``; one vectorized
hash call per batch instead of a per-shingle digest loop. Pairs are emitted
once with a < b.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Min

MERSENNE = (1 << 61) - 1


def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Group identical texts; emit (text, doc_id=min id, n_dups)."""
    out = ds.groupby(text_col).aggregate(
        Min(id_col, alias_name=id_col), Count(alias_name="n_dups")
    )
    return out


def _word_shingles(text: str, k: int) -> set[str]:
    toks = [t for t in text.lower().split() if t]
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _batch_shingle_hashes(batch, k: int, text_col: str, id_col: str):
    """Flatten a batch's distinct shingles and hash them in ONE vectorized
    call. Returns (doc_ids int64[n], counts int64[n_docs], hashes uint64[n])
    where hashes are grouped contiguously per doc."""
    ids, counts, flat = [], [], []
    for doc_id, text in zip(batch[id_col], batch[text_col].fillna("")):
        sh = _word_shingles(text, k)
        ids.append(doc_id)
        counts.append(len(sh))
        flat.extend(sh)
    hashes = (
        pd.util.hash_array(np.asarray(flat, dtype=object), categorize=False)
        if flat
        else np.array([], np.uint64)
    )
    counts = np.asarray(counts, np.int64)
    doc_ids = np.repeat(np.asarray(ids, np.int64), counts)
    return doc_ids, counts, hashes


class ShingleStage:
    """map_batches actor: text -> distinct k-word-shingle hash rows
    (doc_id, shingle_hash). Explode form of the dedup candidate generation."""

    def __init__(self, k: int = 3, text_col: str = "text", id_col: str = "doc_id"):
        self.k, self.text_col, self.id_col = k, text_col, id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids, counts, hashes = _batch_shingle_hashes(
            batch, self.k, self.text_col, self.id_col
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


def _bucket_pairs(keys: list[str], n_buckets: int | None = None):
    """Pair-emission over coarse hash buckets: shuffling thousands of tiny
    per-shingle groups through groupby().map_groups() drowns in per-group
    overhead, so we group by ``hash(key) % n_buckets`` (each bucket fully
    contains its keys) and emit all within-key pairs of a bucket in one
    vectorized pandas pass. Bucket count defaults to 8x cluster CPUs — enough
    distinct values that the sort shuffle's sampled partition boundaries stay
    balanced (see stages/join.py), coarse enough to amortize per-group cost."""
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
        df = df.copy()
        df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return df

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """Emit the bucket's within-key pairs, PRE-AGGREGATED per (doc_a,
        doc_b): ``inter`` counts how many of this bucket's keys the pair
        shares. Cross-bucket partials are summed by the caller — combiner
        before the exchange, so the pair partials (not the raw per-key pair
        explosion) are all that leaves the task."""
        carry_n = "n" in g.columns
        out_a, out_b, out_na, out_nb = [], [], [], []
        for _, grp in g.groupby(list(keys), sort=False):
            sub = grp.drop_duplicates("doc_id").sort_values("doc_id")
            docs = sub["doc_id"].to_numpy()
            if len(docs) < 2:
                continue
            ai, bi = np.triu_indices(len(docs), k=1)
            out_a.append(docs[ai])
            out_b.append(docs[bi])
            if carry_n:
                ns = sub["n"].to_numpy()
                out_na.append(ns[ai])
                out_nb.append(ns[bi])
        cols = {"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64)}
        if carry_n:
            cols["n_a"] = np.array([], np.int64)
            cols["n_b"] = np.array([], np.int64)
        if not out_a:
            cols["inter"] = np.array([], np.int64)
            return pd.DataFrame(cols)
        cols["doc_a"] = np.concatenate(out_a)
        cols["doc_b"] = np.concatenate(out_b)
        if carry_n:
            cols["n_a"] = np.concatenate(out_na)
            cols["n_b"] = np.concatenate(out_nb)
        df = pd.DataFrame(cols)
        gb_cols = ["doc_a", "doc_b"] + (["n_a", "n_b"] if carry_n else [])
        return (
            df.groupby(gb_cols, sort=False, as_index=False)
            .size()
            .rename(columns={"size": "inter"})
        )

    return add_bucket, pairs_in_bucket


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.5,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Exact n-gram-Jaccard duplicate pairs: (doc_a, doc_b, jaccard >= t).

    Shuffle-shape: shingle rows (carrying their doc's size |A|) ->
    groupby(shingle-bucket) -> pair partials with (n_a, n_b) -> groupby(pair)
    intersection counts. ONE pass over the corpus, one pipeline, two shuffles
    whose payloads shrink at each step; only the (pair, inter, n_a, n_b)
    aggregate reaches the driver. Candidate generation is complete because
    J(a,b) > 0 implies a shared shingle. Hot shingles (appearing in >max_df
    docs) would explode pairwise; callers at scale should drop them — here df
    is bounded by the corpus.
    """
    # plain-function stage (tasks): ShingleStage's init is trivial, so an
    # actor pool only adds startup latency
    sh = ds.map_batches(
        ShingleStage(k=k, text_col=text_col, id_col=id_col), batch_format="pandas"
    )
    add_bucket, pairs_in_bucket = _bucket_pairs(["sh"])
    partials = (
        sh.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    # cross-bucket merge of the pre-aggregated pair partials on the driver:
    # the partial set is bounded by the candidate-pair count (~ the dup rate),
    # orders of magnitude smaller than the shingle exchange it rode in on —
    # same sanctioned small-result pattern as cluster_duplicates
    if partials.empty:  # zero pairs anywhere -> column-less empty frame
        partials = pd.DataFrame(
            {c: [] for c in ["doc_a", "doc_b", "n_a", "n_b", "inter"]}
        )
    inter = partials.groupby(["doc_a", "doc_b", "n_a", "n_b"], as_index=False)[
        "inter"
    ].sum()
    rows = []
    for a, b, c, na, nb in zip(
        inter["doc_a"], inter["doc_b"], inter["inter"], inter["n_a"], inter["n_b"]
    ):
        union = int(na) + int(nb) - int(c)
        jac = int(c) / union if union else 0.0
        if jac >= threshold:
            rows.append((int(a), int(b), jac))
    rows.sort()
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "jaccard": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# MinHash + LSH


def _minhash_params(n_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


class MinHashStage:
    """map_batches actor: doc -> (doc_id, band_id, band_hash) LSH bucket rows.

    Signature: n_perm universal-hash permutations over 64-bit shingle hashes;
    bands of r rows hashed to a bucket key. Deterministic given (n_perm, seed).
    """

    def __init__(self, n_perm=64, bands=16, k=3, text_col="text", id_col="doc_id", seed=7):
        assert n_perm % bands == 0
        self.a, self.b = _minhash_params(n_perm, seed)
        self.n_perm, self.bands, self.r = n_perm, bands, n_perm // bands
        self.k, self.text_col, self.id_col = k, text_col, id_col

    def signature(self, text: str) -> np.ndarray | None:
        """Single-doc signature (kept for direct use/tests)."""
        sh_set = _word_shingles(text, self.k)
        if not sh_set:
            return None
        sh = pd.util.hash_array(np.asarray(sorted(sh_set), dtype=object), categorize=False)
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids_rep, counts, flat = _batch_shingle_hashes(
            batch, self.k, self.text_col, self.id_col
        )
        keep = counts > 0
        if not keep.any():
            return pd.DataFrame(
                {
                    "doc_id": np.array([], np.int64),
                    "band_id": np.array([], np.int32),
                    "band_hash": np.array([], np.uint64),
                }
            )
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
        # band hashes: polynomial combine of each band's r rows, vectorized
        band = sig.reshape(n_docs, self.bands, self.r)
        h = np.zeros((n_docs, self.bands), np.uint64)
        for j in range(self.r):
            h = h * np.uint64(1_000_003) + band[:, :, j]
        return pd.DataFrame(
            {
                "doc_id": np.repeat(ids, self.bands),
                "band_id": np.tile(np.arange(self.bands, dtype=np.int32), n_docs),
                "band_hash": h.reshape(-1),
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
) -> pa.Table:
    """Near-dup candidate pairs via banded MinHash LSH, verified with exact
    Jaccard (so false positives are filtered; recall is probabilistic)."""
    buckets = ds.map_batches(
        MinHashStage(n_perm=n_perm, bands=bands, k=k, text_col=text_col, id_col=id_col),
        batch_format="pandas",
    )
    add_bucket, pairs_in_bucket = _bucket_pairs(["band_id", "band_hash"])
    cand_df = (
        buckets.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    if cand_df.empty:
        cand_df = pd.DataFrame({"doc_a": [], "doc_b": []})
    cand_df = cand_df.drop_duplicates(["doc_a", "doc_b"])  # cross-bucket dedup
    cand = list(zip(cand_df["doc_a"].astype(int), cand_df["doc_b"].astype(int)))

    docs_df = ds.select_columns([id_col, text_col]).to_pandas()
    texts = dict(zip(docs_df[id_col], docs_df[text_col]))
    rows = []
    shingle_cache: dict[int, set] = {}

    def shingles(d):
        if d not in shingle_cache:
            shingle_cache[d] = _word_shingles(texts.get(d) or "", k)
        return shingle_cache[d]

    for a, b in sorted(cand):
        sa, sb = shingles(a), shingles(b)
        union = len(sa | sb)
        jac = len(sa & sb) / union if union else 0.0
        if jac >= threshold:
            rows.append((a, b, round(jac, 6)))
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "jaccard_r": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# SimHash


class SimHashStage:
    """map_batches actor: doc -> 64-bit simhash over word-shingle hashes."""

    def __init__(self, k: int = 2, text_col: str = "text", id_col: str = "doc_id"):
        self.k, self.text_col, self.id_col = k, text_col, id_col

    def simhash(self, text: str) -> int:
        """Single-doc simhash (kept for direct use/tests)."""
        sh_set = _word_shingles(text, self.k)
        if not sh_set:
            return 0
        hs = pd.util.hash_array(np.asarray(sorted(sh_set), dtype=object), categorize=False)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        return int(((votes >= 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids_rep, counts, flat = _batch_shingle_hashes(
            batch, self.k, self.text_col, self.id_col
        )
        n_docs = len(counts)
        out = np.zeros(n_docs, np.uint64)
        nonzero = counts > 0
        if nonzero.any():
            # set-bit counts per doc per position: unpackbits to a (n, 64)
            # little-endian bit matrix, then one np.add.reduceat per batch
            bits = np.unpackbits(
                flat.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            ).astype(np.int64)
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))[nonzero]
            ones = np.add.reduceat(bits, starts, axis=0)  # (n_docs_nz, 64)
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


def simhash_pairs(
    ds: ray.data.Dataset,
    max_hamming: int = 3,
    k: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Near-dup pairs with simhash Hamming distance <= max_hamming.

    Blocking: 4 16-bit bands — any pair within Hamming 3 agrees on >= 1 band
    (pigeonhole), so candidate generation is complete for max_hamming <= 3.
    """
    sims = ds.map_batches(
        SimHashStage(k=k, text_col=text_col, id_col=id_col), batch_format="pandas"
    ).to_pandas()
    ids = sims["doc_id"].to_numpy()
    hashes = sims["simhash"].to_numpy(dtype=np.uint64)

    cand = set()
    for band in range(4):
        keys = (hashes >> np.uint64(band * 16)) & np.uint64(0xFFFF)
        dfb = pd.DataFrame({"id": ids, "key": keys})
        for _, grp in dfb.groupby("key"):
            docs = sorted(grp["id"])
            for i in range(len(docs)):
                for j in range(i + 1, len(docs)):
                    cand.add((docs[i], docs[j]))
    by_id = dict(zip(ids, hashes))
    rows = []
    for a, b in sorted(cand):
        d = int(bin(int(by_id[a]) ^ int(by_id[b])).count("1"))
        if d <= max_hamming:
            rows.append((a, b, d))
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "hamming": pa.array([r[2] for r in rows], pa.int32()),
        }
    )


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
    block: int = 2048,
) -> pa.Table:
    """Pairs with cosine similarity >= threshold over a list<float> column.

    Batched matmul against the (broadcastable) normalized matrix; at scale the
    right side would be an LSH/IVF bucket instead of the full corpus — here the
    corpus is the bucket.
    """
    parts = []
    for b in ds.select_columns([id_col, vec_col]).iter_batches(
        batch_size=100_000, batch_format="pyarrow"
    ):
        parts.append(b)
    tbl = pa.concat_tables(parts)
    ids = tbl[id_col].to_numpy(zero_copy_only=False)
    mat = np.asarray(tbl[vec_col].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]

    rows = []
    n = len(ids)
    for i0 in range(0, n, block):
        sims = np.round(unit[i0 : i0 + block] @ unit.T, 6)  # rounded before threshold
        for ii in range(sims.shape[0]):
            gi = i0 + ii
            js = np.flatnonzero(sims[ii] >= threshold)
            for j in js:
                if ids[gi] < ids[j]:
                    rows.append((int(ids[gi]), int(ids[j]), float(sims[ii, j])))
    rows.sort()
    return pa.table(
        {
            "vec_a": pa.array([r[0] for r in rows], pa.int64()),
            "vec_b": pa.array([r[1] for r in rows], pa.int64()),
            "cos_r": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
