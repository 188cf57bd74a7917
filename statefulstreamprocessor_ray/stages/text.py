"""Text-analysis operators for training-data pipelines.

Stateful actor-pool stage (regexes compiled once per actor in ``__init__``,
work per batch in ``__call__`` — the map_batches(Cls, concurrency=N) pattern):
token counting, punctuation/quality stats, n-gram-heuristic language ID, and
document fingerprinting. The heuristics are deliberately simple, closed-form
and integer/fixed-order so a DuckDB oracle can reproduce them bit-for-bit.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import ray.data

# Stopword lists shared by the engine and the SQL oracle generator. Scores are
# token-membership counts; prediction is argmax with this precedence order.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "a"),
    "fr": ("le", "la", "les", "et", "des", "une"),
    "es": ("el", "los", "las", "y", "que", "una"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
}
LANG_ORDER = ("en", "fr", "es", "de", "zh")
PUNCT_CLASS = r"[.!?,;:]"
# GPT-2-style pre-tokenizer, ASCII form: contraction suffixes, then
# space-prefixed letter runs / digit runs / other-symbol runs. Pure
# whitespace is left unmatched (token COUNT, not a segmentation).
# Python re and DuckDB RE2 are both leftmost-first on this alternation,
# so len(findall) == len(regexp_extract_all) — the oracle reuses the
# same string via bpe_pattern_sql().
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"


def _int_bincount(codes: np.ndarray, weights: np.ndarray, n: int) -> np.ndarray:
    """Exact int64 weighted bincount. ``np.bincount(weights=...)``
    accumulates in float64 and is only exact below 2^53; the surprisal
    pipeline's associativity/oracle-parity argument needs unconditional
    integer sums (ADVICE r4), which ``np.add.at`` on an int64 buffer gives."""
    out = np.zeros(n, np.int64)
    np.add.at(out, codes, np.asarray(weights, np.int64))
    return out


def _hex128(texts: pd.Series) -> np.ndarray:
    """Vectorized 32-hex-char fingerprints from content_hash128 (the repo's
    canonical 128-bit SipHash identity): two hash_array calls, one hexlify of
    the big-endian byte buffer, one reinterpret to fixed-width strings — no
    per-row Python. The scale-path pendant of the md5 oracle mode."""
    import binascii

    from statefulstreamprocessor_ray.stages.dedup import content_hash128

    lo, hi = content_hash128(texts)

    def hex_col(a: np.ndarray) -> np.ndarray:
        buf = binascii.hexlify(np.ascontiguousarray(a.astype(">u8")).tobytes())
        return np.frombuffer(buf, dtype="S16").astype("U16")

    return np.char.add(hex_col(lo), hex_col(hi))


class TextAnalyzer:
    """map_batches actor: per-document text statistics + langid + fingerprint.

    Everything is computed by C-looped pandas ``str.count`` regex passes —
    no token explode, no per-row lambdas: token membership tests use
    whitespace-lookaround alternations (``(?<!\\S)(?:w1|w2|…)(?!\\S)`` counts
    exactly the tokens equal to a stopword, including adjacent matches), and
    token counts use ``\\S+``, which equals len(split-and-drop-empties) by
    construction.

    ``fingerprint_mode``: "sip" (default, vectorized content_hash128 hex —
    the corpus-scale path) or "md5" (per-row hashlib, DuckDB ``md5()``
    reproducible — the oracle mode)."""

    def __init__(self, fingerprint_mode: str = "sip"):
        if fingerprint_mode not in ("sip", "md5"):
            raise ValueError("fingerprint_mode must be 'sip' or 'md5'")
        self.fingerprint_mode = fingerprint_mode
        self.tok = re.compile(r"\S+")
        # re.ASCII: Python's \s is Unicode-aware but DuckDB RE2's is
        # ASCII-only — without the flag, NBSP/ideographic spaces fall into
        # the negated class on one side only and the counts diverge
        self.bpe = re.compile(BPE_PATTERN, re.ASCII)
        self.punct = re.compile(PUNCT_CLASS)
        self.han = re.compile(r"[一-鿿]")
        self.stop_res = {
            lang: re.compile(
                r"(?<!\S)(?:" + "|".join(map(re.escape, words)) + r")(?!\S)"
            )
            for lang, words in LANG_STOPWORDS.items()
        }

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:  # .str accessor rejects dtype-less empty columns
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_tokens": pd.Series([], dtype="int64"),
                    "n_bpe_tokens": pd.Series([], dtype="int64"),
                    "n_chars_m": pd.Series([], dtype="int64"),
                    "n_punct": pd.Series([], dtype="int64"),
                    "pred_lang": pd.Series([], dtype="object"),
                    "quality": pd.Series([], dtype="int64"),
                    "fingerprint": pd.Series([], dtype="object"),
                }
            )
        texts = batch["text"].fillna("")
        lowered = texts.str.lower()

        n_tokens = lowered.str.count(self.tok).to_numpy(np.int64)
        n_chars = texts.str.len().to_numpy(np.int64)
        n_bpe = texts.str.count(self.bpe).to_numpy(np.int64)
        n_punct = texts.str.count(PUNCT_CLASS).to_numpy(np.int64)

        score_cols = []
        for lang in LANG_ORDER:
            if lang == "zh":
                score_cols.append(texts.str.count(self.han).to_numpy(np.int64))
            else:
                score_cols.append(
                    lowered.str.count(self.stop_res[lang]).to_numpy(np.int64)
                )
        score_mat = np.column_stack(score_cols)
        pred = np.array(LANG_ORDER)[np.argmax(score_mat, axis=1)]  # ties -> order

        # integer quality score 0..3: token-count band, punct sanity, length band
        q = (
            ((n_tokens >= 5) & (n_tokens <= 1000)).astype(np.int64)
            + (n_punct * 10 <= n_chars).astype(np.int64)
            + ((n_chars >= 20) & (n_chars <= 20000)).astype(np.int64)
        )

        if self.fingerprint_mode == "md5":
            fps = texts.map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())
        else:
            fps = _hex128(texts)

        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(np.int64),
                "n_tokens": n_tokens,
                "n_bpe_tokens": n_bpe,
                "n_chars_m": n_chars,
                "n_punct": n_punct,
                "pred_lang": pred,
                "quality": q,
                "fingerprint": fps,
            }
        )
        return out


def analyze_text(
    ds: ray.data.Dataset,
    concurrency: int = 2,
    batch_size: int = 4096,
    fingerprint_mode: str = "sip",
) -> ray.data.Dataset:
    # concurrency x num_cpus must leave CPUs for the read/write stages —
    # an actor pool that reserves every core starves its own producers.
    return ds.map_batches(
        TextAnalyzer,
        fn_constructor_kwargs={"fingerprint_mode": fingerprint_mode},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class WinnowingFingerprints:
    """Document fingerprinting by rolling hash + winnowing (MOSS-style).

    Per document: Rabin-Karp rolling hashes of all ``k``-char windows, then the
    minimum hash of every ``w``-window (rightmost on ties), deduplicated — a
    compact position-robust fingerprint set for containment/overlap detection.
    Pure-numpy per batch; stateless task stage.
    """

    BASE = np.uint64(1_000_003)
    MOD = np.uint64((1 << 61) - 1)

    def __init__(self, k: int = 8, w: int = 4, text_col: str = "text", id_col: str = "doc_id"):
        self.k, self.w, self.text_col, self.id_col = k, w, text_col, id_col

    def fingerprints(self, text: str) -> np.ndarray:
        data = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8)
        n = len(data)
        if n < self.k:
            return np.zeros(0, dtype=np.uint64)
        # rolling polynomial hash over all k-windows (vectorized via cumulative
        # powers; values kept in uint64 with natural wraparound — deterministic,
        # so the overflow is intentional: silence it explicitly)
        with np.errstate(over="ignore"):
            pows = np.ones(self.k, dtype=np.uint64)
            for i in range(1, self.k):
                pows[i] = pows[i - 1] * self.BASE
            windows = np.lib.stride_tricks.sliding_window_view(data, self.k).astype(np.uint64)
            hashes = (windows * pows[::-1]).sum(axis=1)
        if len(hashes) < self.w:
            return np.unique(hashes[[np.argmin(hashes)]])
        wins = np.lib.stride_tricks.sliding_window_view(hashes, self.w)
        mins = wins.min(axis=1)
        return np.unique(mins)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, fps = [], []
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col].fillna("")):
            for fp in self.fingerprints(text):
                ids.append(doc_id)
                fps.append(fp)
        return pd.DataFrame(
            {
                "doc_id": np.array(ids, dtype=np.int64),
                "fp": np.array(fps, dtype=np.uint64),
            }
        )


def winnowing_fingerprints(
    ds: ray.data.Dataset, k: int = 8, w: int = 4
) -> ray.data.Dataset:
    return ds.map_batches(WinnowingFingerprints(k=k, w=w), batch_format="pandas")


def langid_sql(table: str = "documents") -> str:
    """Generate the DuckDB oracle for TextAnalyzer's langid + stats, from the
    same stopword lists (single source of truth)."""
    score_exprs = {}
    for lang, words in LANG_STOPWORDS.items():
        in_list = ", ".join(f"'{w}'" for w in words)
        score_exprs[lang] = (
            f"len(list_filter(string_split_regex(lower(coalesce(text,'')), '\\s+'), "
            f"x -> x IN ({in_list})))"
        )
    bpe_sql = BPE_PATTERN.replace("'", "''")
    score_exprs["zh"] = (
        "len(regexp_extract_all(coalesce(text,''), '[\\x{4e00}-\\x{9fff}]'))"
    )
    # argmax with LANG_ORDER precedence: lang wins iff strictly greater than
    # every earlier lang and >= every later lang.
    cases = []
    for i, lang in enumerate(LANG_ORDER):
        conds = []
        for j, other in enumerate(LANG_ORDER):
            if j < i:
                conds.append(f"s_{lang} > s_{other}")
            elif j > i:
                conds.append(f"s_{lang} >= s_{other}")
        cases.append(
            "WHEN " + " AND ".join(conds) + f" THEN '{lang}'" if conds else None
        )
    case_sql = "CASE " + " ".join(c for c in cases if c) + f" ELSE '{LANG_ORDER[0]}' END"
    scores_sql = ", ".join(f"{e} AS s_{l}" for l, e in score_exprs.items())
    return f"""
WITH base AS (
  SELECT doc_id, coalesce(text,'') AS t, {scores_sql},
    len(list_filter(string_split_regex(lower(coalesce(text,'')), '\\s+'), x -> x <> '')) AS n_tokens,
    len(regexp_extract_all(coalesce(text,''), '{bpe_sql}')) AS n_bpe_tokens,
    length(coalesce(text,'')) AS n_chars_m,
    len(regexp_extract_all(coalesce(text,''), '{PUNCT_CLASS}')) AS n_punct
  FROM {table}
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_bpe_tokens AS BIGINT) AS n_bpe_tokens,
       CAST(n_chars_m AS BIGINT) AS n_chars_m,
       CAST(n_punct AS BIGINT) AS n_punct,
       {case_sql} AS pred_lang,
       CAST((CASE WHEN n_tokens BETWEEN 5 AND 1000 THEN 1 ELSE 0 END)
          + (CASE WHEN n_punct * 10 <= n_chars_m THEN 1 ELSE 0 END)
          + (CASE WHEN n_chars_m BETWEEN 20 AND 20000 THEN 1 ELSE 0 END) AS BIGINT) AS quality,
       md5(t) AS fingerprint
FROM base
"""


def tfidf_top_terms(
    ds: ray.data.Dataset,
    top_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> ray.data.Dataset:
    """Per-document top-k TF-IDF terms: ``(doc_id, term, score)`` with
    ``score = round(tf * ln(N / df), 6)`` — the keyword/topic-signal pass
    of a curation loop (what is this doc ABOUT, which docs are dominated
    by one boilerplate term).

    Scale shape — NO broadcast of the vocabulary (at corpus scale the df
    table is itself huge): two linear keyed exchanges whose payloads are
    (doc, term, count) rows, never text. Pass 1 groups by TERM and
    attaches each term's document frequency (rows per term = docs per
    term, since (doc, term) rows are distinct); pass 2 groups by DOC and
    keeps the top-k rows by (score desc, term asc). Scores are rounded to
    6 decimals BEFORE ranking so the tie-break is deterministic and
    libm-variation-proof (the jaccard_r precedent); N is the full input
    row count. Docs with no tokens emit nothing. Payloads that fit one
    partition take the single-task local path (stages/exchange.py).

    ``max_df`` (optional) is the skew guard for corpus scale: a stopword
    appearing in ~every doc sends ALL its rows to one partition of the
    term exchange — at 10^12 docs that single partition is the job.
    With ``max_df`` set, a vocabulary-bounded map-side pass first
    computes each term's document frequency from per-batch partials
    (one row per distinct (batch, term), never per token), the hot tail
    (df > max_df — by Zipf a handful of stopwords) is broadcast via
    ``ray.put``, and their rows are dropped BEFORE the exchange —
    removing exactly the keys that would hot-spot it. Semantics are
    scikit-learn's ``max_df``: pruned terms are excluded from ranking
    (they are precisely the near-zero-idf terms top-k almost never
    keeps). Driver holds O(hot terms)."""
    import pyarrow as pa

    from statefulstreamprocessor_ray.stages.exchange import (
        hash_partitioned_map,
        hash_shuffle_window,
        local_keyed_map,
        sized_hash_partitions,
        small_exchange,
    )

    n_docs = ds.count()

    def term_counts(df: pd.DataFrame) -> pa.Table:
        s = df[text_col].fillna("").str.lower().str.split()
        n = s.str.len().to_numpy(np.int64)
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
            }
        )
        if not n.any():
            return empty
        ids = np.repeat(df[id_col].to_numpy(np.int64), n)
        flat = np.concatenate([np.asarray(l, dtype=object) for l in s if l])
        tdf = pd.DataFrame({id_col: ids, "term": flat})
        out = (
            tdf.groupby([id_col, "term"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "tf"})
        )
        # th: uint64 term key for the exchange — hash-partitioning on a
        # fixed-width int splits blocks ~an order of magnitude faster than
        # on the term strings themselves (measured on the 2 GiB probe);
        # the string rides as payload for the final output
        th = pd.util.hash_array(
            out["term"].to_numpy(object), categorize=False
        ).astype(np.uint64, copy=False)
        return pa.table(
            {
                id_col: pa.array(out[id_col].to_numpy(np.int64), pa.int64()),
                "th": pa.array(th, pa.uint64()),
                "term": pa.array(out["term"].to_numpy(object), pa.string()),
                "tf": pa.array(out["tf"].to_numpy(np.int64), pa.int64()),
            }
        )

    def attach_df(g: pd.DataFrame) -> pa.Table:
        # factorize on the int key, not the string (same grouping up to
        # the hash's ~2^-64 collision rate). The big-exchange path feeds
        # this FIXED-WIDTH rows only (no term column — VERDICT r4 #4);
        # the single-task local path keeps the string inline.
        codes, _ = pd.factorize(g["th"], sort=False)
        per_term = np.bincount(codes)
        cols = {
            id_col: pa.array(g[id_col].to_numpy(np.int64), pa.int64()),
            "th": pa.array(g["th"].to_numpy(np.uint64), pa.uint64()),
            "tf": pa.array(g["tf"].to_numpy(np.int64), pa.int64()),
            "df": pa.array(per_term[codes].astype(np.int64), pa.int64()),
        }
        if "term" in g.columns:
            cols["term"] = pa.array(g["term"].to_numpy(object), pa.string())
        return pa.table(cols)

    def doc_topk(g: pd.DataFrame) -> pa.Table:
        if len(g) and g["term"].isna().any():
            # union-tagged families (the dedup-partials pattern): null-term
            # rows are the df-attached counts from exchange 1, string rows
            # skipped it and carry each (doc, th)'s term — re-unite them
            # doc-side (both families are complete per doc here)
            strings = g.loc[g["term"].notna(), [id_col, "th", "term"]]
            counts = g.loc[g["term"].isna(), [id_col, "th", "tf", "df"]]
            g = counts.merge(strings, on=[id_col, "th"], how="left")
        score = np.round(
            g["tf"].to_numpy(np.float64)
            * np.log(float(n_docs) / g["df"].to_numpy(np.float64)),
            6,
        )
        g = g.assign(score=score).sort_values(
            [id_col, "score", "term"], ascending=[True, False, True]
        )
        g = g.groupby(id_col, sort=False).head(top_k)
        return pa.table(
            {
                id_col: pa.array(g[id_col].to_numpy(np.int64), pa.int64()),
                "term": pa.array(g["term"].to_numpy(object), pa.string()),
                "score": pa.array(g["score"].to_numpy(np.float64), pa.float64()),
            }
        )

    tc = ds.select_columns([id_col, text_col]).map_batches(
        term_counts, batch_format="pandas"
    ).materialize()

    if max_df is not None:
        import ray as _ray

        from statefulstreamprocessor_ray.functions.ops import sharded_group_sum

        def df_partials(b: pd.DataFrame) -> pa.Table:
            # (doc, term) rows are distinct, so rows-per-term IS the
            # batch's doc count per term: one partial row per distinct
            # term per block — vocabulary-bounded, never token-bounded
            codes, uniq = pd.factorize(b["th"], sort=False)
            return pa.table(
                {
                    "th": pa.array(
                        np.asarray(uniq, np.uint64), pa.uint64()
                    ),
                    "dfp": pa.array(np.bincount(codes), pa.int64()),
                }
            )

        def keep_hot(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["df"] > max_df]

        hot = (
            sharded_group_sum(
                tc.map_batches(df_partials, batch_format="pandas"),
                keys=["th"],
                sums={"dfp": "df"},
            )
            .map_batches(keep_hot, batch_format="pandas")
            .to_pandas()
        )
        if len(hot):
            hot_ref = _ray.put(hot["th"].to_numpy(np.uint64))

            def drop_hot(t: pa.Table) -> pa.Table:
                hot_keys = _ray.get(hot_ref)
                th = t["th"].to_numpy(zero_copy_only=False)
                return t.filter(pa.array(~np.isin(th, hot_keys)))

            tc = tc.map_batches(
                drop_hot, batch_format="pyarrow", zero_copy_batch=True
            ).materialize()

    sz = tc.size_bytes()
    if small_exchange(sz):
        with_df = local_keyed_map(tc, attach_df)
        return with_df.map_batches(doc_topk, batch_format="pandas", batch_size=None)
    # ONE shuffle alive at a time: each HashShuffleOperator's aggregator
    # actors reserve ~1/16 CPU per partition, so two chained token-volume
    # exchanges running concurrently reserve most of a node and starve the
    # map tasks (measured: 2 GiB probe at ~13/32 CPUs busy). The barrier
    # materializes the mid table — object-store resident, spill-backed.
    #
    # Exchange 1 carries FIXED-WIDTH rows only (doc, th, tf) — the term
    # strings would ~double its width for nothing (VERDICT r4 #4); they
    # rejoin at exchange 2 as a second doc-keyed row family (term rows with
    # null tf/df, count rows with null term) re-united in doc_topk.
    tc_narrow = tc.select_columns([id_col, "th", "tf"]).materialize()
    n1 = sized_hash_partitions(tc_narrow.size_bytes())
    with hash_shuffle_window(tc_narrow, n1):
        with_df = hash_partitioned_map(
            tc_narrow, ["th"], attach_df, n1
        ).materialize()
    del tc_narrow

    def pad_counts(t: pa.Table) -> pa.Table:
        return t.append_column("term", pa.nulls(t.num_rows, pa.string()))

    def pad_strings(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t[id_col],
                "th": t["th"],
                "tf": pa.nulls(t.num_rows, pa.int64()),
                "df": pa.nulls(t.num_rows, pa.int64()),
                "term": t["term"],
            }
        )

    ex2_in = with_df.map_batches(
        pad_counts, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        tc.select_columns([id_col, "th", "term"]).map_batches(
            pad_strings, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    n2 = sized_hash_partitions(with_df.size_bytes() + sz)
    with hash_shuffle_window(ex2_in, n2):
        return hash_partitioned_map(
            ex2_in, [id_col], doc_topk, n2
        ).materialize()


def bigram_surprisal(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_cf: int | None = None,
) -> ray.data.Dataset:
    """Per-document bigram-LM surprisal against the corpus's OWN bigram
    statistics: ``(doc_id, n_bigrams, surprisal_micro, mean_surprisal)``
    — the KenLM-style fluency/quality signal (boilerplate scores low,
    token salad scores high) without an external model.

    Model: unsmoothed corpus bigram LM, ``P(w2|w1) = c(w1,w2)/c(w1,·)``.
    Scored on its own training corpus every observed bigram has c >= 1,
    so no smoothing (hence no vocabulary constant) is needed. Per-bigram
    surprisal is quantized to integer micro-nats
    (``round(ln(c1/c12)*1e6)``) BEFORE summation, so the per-doc sum is
    exact int64 arithmetic — float sums are order-dependent and a
    distributed engine cannot promise the oracle's addition order;
    integer sums are associative. ``mean_surprisal`` = micro-sum / count
    / 1e6 — deliberately UNrounded: the identical IEEE division chain is
    bit-deterministic on both sides, while a final round-to-6 diverges on
    exact decimal midpoints (numpy half-even vs DuckDB half-away).

    Scale shape (the tfidf_top_terms pattern): per-batch fixed-width
    (doc, h1, h12, tf) bigram-hash counts — token strings never leave the
    batch, since the output needs no terms — an exchange keyed on the
    uint64 ``h1`` attaches the global ``c(w1,w2)`` and ``c(w1,·)`` (each
    first-token's rows are co-located and complete), and an exchange
    keyed on doc sums; the two shuffles are barriered so only one
    aggregator fleet is alive at a time. No model broadcast, no driver
    materialization. Docs with < 2 tokens emit nothing.

    ``max_cf`` (optional) is the exchange skew guard, the tfidf
    ``max_df`` pattern: a stopword CONTEXT (first token) appearing
    everywhere sends all its bigram rows to one ``h1`` partition.
    Per-batch (h1, row-count) partials — vocabulary-bounded — feed a
    tiny group-sum; contexts whose corpus row count exceeds ``max_cf``
    are broadcast and their bigrams dropped before the exchange.
    Approximation knob: pruned-context bigrams are excluded from the
    doc's mean (the remaining mean is still well-defined); default off."""
    import pyarrow as pa

    from statefulstreamprocessor_ray.stages.exchange import (
        hash_partitioned_map,
        hash_shuffle_window,
        local_keyed_map,
        sized_hash_partitions,
        small_exchange,
    )

    def bigram_counts(df: pd.DataFrame) -> pa.Table:
        # token STRINGS never leave the batch: the output needs no terms,
        # so bigrams are identified by uint64 hashes (h1 = first token's
        # hash for partitioning, h12 = mixed bigram hash for counting —
        # same grouping up to the ~2^-64 collision rate) and the exchange
        # payload is fixed-width (id, h1, h12, tf)
        s = df[text_col].fillna("").str.lower().str.split()
        n = s.str.len().to_numpy(np.int64)
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "h1": pa.array([], pa.uint64()),
                "h12": pa.array([], pa.uint64()),
                "tf": pa.array([], pa.int64()),
            }
        )
        if not (n >= 2).any():
            return empty
        ids = np.repeat(df[id_col].to_numpy(np.int64), n)
        flat = np.concatenate([np.asarray(l, dtype=object) for l in s if l])
        ht = pd.util.hash_array(flat, categorize=False).astype(
            np.uint64, copy=False
        )
        doc_idx = np.repeat(np.arange(len(n)), n)
        same = doc_idx[:-1] == doc_idx[1:]
        h1 = ht[:-1][same]
        with np.errstate(over="ignore"):
            m = h1 * np.uint64(0x9E3779B97F4A7C15) ^ ht[1:][same]
            m = (m ^ (m >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            h12 = m ^ (m >> np.uint64(31))
        tdf = pd.DataFrame({id_col: ids[:-1][same], "h1": h1, "h12": h12})
        out = (
            tdf.groupby([id_col, "h1", "h12"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "tf"})
        )
        return pa.table(
            {
                id_col: pa.array(out[id_col].to_numpy(np.int64), pa.int64()),
                "h1": pa.array(out["h1"].to_numpy(np.uint64), pa.uint64()),
                "h12": pa.array(out["h12"].to_numpy(np.uint64), pa.uint64()),
                "tf": pa.array(out["tf"].to_numpy(np.int64), pa.int64()),
            }
        )

    def attach_counts(g: pd.DataFrame) -> pa.Table:
        # _int_bincount, not np.bincount(weights=...): bincount accumulates
        # weights in float64, exact only below 2^53 — int64 np.add.at keeps
        # the associativity claim unconditional (ADVICE r4)
        pair_codes, pu = pd.factorize(g["h12"], sort=False)
        tf = g["tf"].to_numpy(np.int64)
        c12 = _int_bincount(pair_codes, tf, len(pu))[pair_codes]
        w1_codes, wu = pd.factorize(g["h1"], sort=False)
        c1 = _int_bincount(w1_codes, tf, len(wu))[w1_codes]
        sm = np.round(np.log(c1.astype(np.float64) / c12) * 1e6).astype(
            np.int64
        )
        return pa.table(
            {
                id_col: pa.array(g[id_col].to_numpy(np.int64), pa.int64()),
                "tf": pa.array(tf, pa.int64()),
                "sm": pa.array(sm, pa.int64()),
            }
        )

    def doc_sum(g: pd.DataFrame) -> pa.Table:
        codes, uniq = pd.factorize(g[id_col], sort=False)
        tf = g["tf"].to_numpy(np.int64)
        micro = _int_bincount(codes, tf * g["sm"].to_numpy(np.int64), len(uniq))
        nb = _int_bincount(codes, tf, len(uniq))
        # NO decimal rounding here: IEEE division is correctly rounded, so
        # the identical micro/nb/1e6 chain yields bit-identical doubles in
        # numpy and DuckDB — while round-to-6 DIVERGES on exact decimal
        # midpoints (half-even vs half-away; hit in practice: a doc with
        # micro/nb = 3373676.5)
        mean = micro.astype(np.float64) / nb / 1e6
        return pa.table(
            {
                id_col: pa.array(np.asarray(uniq, np.int64), pa.int64()),
                "n_bigrams": pa.array(nb, pa.int64()),
                "surprisal_micro": pa.array(micro, pa.int64()),
                "mean_surprisal": pa.array(mean, pa.float64()),
            }
        )

    bc = ds.select_columns([id_col, text_col]).map_batches(
        bigram_counts, batch_format="pandas"
    ).materialize()

    if max_cf is not None:
        import ray as _ray

        from statefulstreamprocessor_ray.functions.ops import sharded_group_sum

        def cf_partials(b: pd.DataFrame) -> pa.Table:
            codes, uniq = pd.factorize(b["h1"], sort=False)
            return pa.table(
                {
                    "h1": pa.array(np.asarray(uniq, np.uint64), pa.uint64()),
                    "cfp": pa.array(
                        _int_bincount(
                            codes, b["tf"].to_numpy(np.int64), len(uniq)
                        ),
                        pa.int64(),
                    ),
                }
            )

        def keep_hot(b: pd.DataFrame) -> pd.DataFrame:
            return b[b["cf"] > max_cf]

        hot = (
            sharded_group_sum(
                bc.map_batches(cf_partials, batch_format="pandas"),
                keys=["h1"],
                sums={"cfp": "cf"},
            )
            .map_batches(keep_hot, batch_format="pandas")
            .to_pandas()
        )
        if len(hot):
            hot_ref = _ray.put(hot["h1"].to_numpy(np.uint64))

            def drop_hot(t: pa.Table) -> pa.Table:
                hot_keys = _ray.get(hot_ref)
                h1 = t["h1"].to_numpy(zero_copy_only=False)
                return t.filter(pa.array(~np.isin(h1, hot_keys)))

            bc = bc.map_batches(
                drop_hot, batch_format="pyarrow", zero_copy_batch=True
            ).materialize()

    sz = bc.size_bytes()
    if small_exchange(sz):
        scored = local_keyed_map(bc, attach_counts)
        return scored.map_batches(
            doc_sum, batch_format="pandas", batch_size=None
        )
    # one shuffle alive at a time — see tfidf_top_terms
    n1 = sized_hash_partitions(sz)
    with hash_shuffle_window(bc, n1):
        scored = hash_partitioned_map(
            bc, ["h1"], attach_counts, n1
        ).materialize()
    del bc
    n2 = sized_hash_partitions(scored.size_bytes())
    with hash_shuffle_window(scored, n2):
        return hash_partitioned_map(
            scored, [id_col], doc_sum, n2
        ).materialize()


def bm25_topk(
    ds: ray.data.Dataset,
    queries: list[str],
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-query top-k documents by Okapi BM25 — the lexical retrieval pass
    of a curation/eval loop (find the corpus docs most relevant to a probe
    query; the sparse complement of ``similarity.brute_force_topk``).
    Output: ``(query_id, doc_id, score_micro, score)``.

    ``score(q, d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1-b + b*dl/avgdl))``
    with the Lucene idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``. Per-term
    scores are quantized to integer micro-units BEFORE the per-(query, doc)
    sum (the bigram_surprisal precedent): int64 addition is associative, so
    the distributed sum provably matches the oracle regardless of partition
    order; ``score`` is the one identical ``micro / 1e6`` division chain.

    Scale shape: the query term set is TINY and known up front, so — unlike
    tfidf_top_terms — nothing vocabulary-sized ever moves. ONE pass over the
    text emits three bounded row families: per-(doc, query-term) tf rows
    (the only data that scales with matches), one per-batch (total-token,
    doc-count) stats partial, and per-batch per-query-term df partials
    (<= |query terms| rows per block). Driver reduces only the partials
    (O(blocks x |terms|)); df/avgdl/N broadcast back as closure constants.
    Scoring + per-(query, doc) partial sums stay in workers; one linear
    keyed group-sum exchange completes the sums (payload: fixed-width
    (query, doc, micro) rows — never text); per-batch partial top-k prunes
    to <= |queries| * k rows per block before a single-task final rank.
    Docs containing no query term are never emitted past the tokenizer."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from statefulstreamprocessor_ray.functions.ops import sharded_group_sum
    from statefulstreamprocessor_ray.stages.exchange import local_keyed_map

    qtokens = [[w for w in q.lower().split() if w] for q in queries]
    terms = sorted({t for toks in qtokens for t in toks})
    if not terms or top_k <= 0:
        return ray.data.from_arrow(_bm25_empty())
    t_index = {t: i for i, t in enumerate(terms)}
    n_terms = len(terms)
    # per-query term-index arrays (closure constants; a handful of ints)
    q_term_idx = [
        np.array(sorted({t_index[t] for t in toks if t in t_index}), np.int32)
        for toks in qtokens
    ]
    n_docs = ds.count()

    def pass1(df: pd.DataFrame) -> pa.Table:
        s = df[text_col].fillna("").str.lower().str.split()
        n = s.str.len().to_numpy(np.int64)
        rows = {
            id_col: [np.array([-1], np.int64)],
            "qt": [np.array([-1], np.int32)],
            "tf": [np.array([int(n.sum())], np.int64)],
            "dl": [np.array([len(df)], np.int64)],
            "tag": [np.array([1], np.int8)],
        }
        if n.any():
            ids = np.repeat(df[id_col].to_numpy(np.int64), n)
            dls = np.repeat(n, n)
            flat = np.concatenate([np.asarray(l, dtype=object) for l in s if l])
            mask = pd.Series(flat).isin(t_index).to_numpy()
            if mask.any():
                tdf = pd.DataFrame(
                    {
                        "doc": ids[mask],
                        "dl": dls[mask],
                        "qt": pd.Series(flat[mask]).map(t_index).to_numpy(np.int32),
                    }
                )
                out = tdf.groupby(["doc", "dl", "qt"], sort=False, as_index=False).size()
                k = len(out)
                rows[id_col].append(out["doc"].to_numpy(np.int64))
                rows["qt"].append(out["qt"].to_numpy(np.int32))
                rows["tf"].append(out["size"].to_numpy(np.int64))
                rows["dl"].append(out["dl"].to_numpy(np.int64))
                rows["tag"].append(np.zeros(k, np.int8))
                # df partial: (doc, qt) rows are distinct within the batch
                # and a doc lives in exactly one input block, so rows-per-qt
                # IS this block's doc count per term
                dfp = np.bincount(out["qt"].to_numpy(np.int64), minlength=n_terms)
                nz = np.nonzero(dfp)[0]
                rows[id_col].append(np.full(len(nz), -1, np.int64))
                rows["qt"].append(nz.astype(np.int32))
                rows["tf"].append(dfp[nz].astype(np.int64))
                rows["dl"].append(np.full(len(nz), -1, np.int64))
                rows["tag"].append(np.full(len(nz), 2, np.int8))
        return pa.table(
            {
                id_col: pa.array(np.concatenate(rows[id_col]), pa.int64()),
                "qt": pa.array(np.concatenate(rows["qt"]), pa.int32()),
                "tf": pa.array(np.concatenate(rows["tf"]), pa.int64()),
                "dl": pa.array(np.concatenate(rows["dl"]), pa.int64()),
                "tag": pa.array(np.concatenate(rows["tag"]), pa.int8()),
            }
        )

    tc = (
        ds.select_columns([id_col, text_col])
        .map_batches(pass1, batch_format="pandas")
        .materialize()
    )

    def keep_tag(tag: int):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["tag"], tag))

        return f

    partials = tc.map_batches(
        keep_tag(1), batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    total_tokens = int(partials["tf"].sum())
    avgdl = float(total_tokens) / float(n_docs) if n_docs else 1.0
    dfp = tc.map_batches(
        keep_tag(2), batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    df_arr = np.zeros(n_terms, np.int64)
    if len(dfp):
        agg = dfp.groupby("qt")["tf"].sum()
        df_arr[agg.index.to_numpy(np.int64)] = agg.to_numpy(np.int64)

    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b

    def score_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["tag"], 0))
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "smp": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        qt = t["qt"].to_numpy(zero_copy_only=False)
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = df_arr[qt].astype(np.float64)
        # arithmetic shape mirrors the oracle SQL expression token-for-token
        idf = np.log(1.0 + ((float(n_docs) - dfv) + 0.5) / (dfv + 0.5))
        w = (
            idf
            * (tf * k1p1)
            / (tf + k1 * (one_minus_b + b * (dl / avgdl)))
        )
        sm = np.round(w * 1e6).astype(np.int64)
        docs = t[id_col].to_numpy(zero_copy_only=False)
        qids, out_docs, out_sm = [], [], []
        for qid, idxs in enumerate(q_term_idx):
            m = np.isin(qt, idxs)
            if not m.any():
                continue
            qids.append(np.full(int(m.sum()), qid, np.int64))
            out_docs.append(docs[m])
            out_sm.append(sm[m])
        if not qids:
            return empty
        g = pd.DataFrame(
            {
                "query_id": np.concatenate(qids),
                id_col: np.concatenate(out_docs),
                "smp": np.concatenate(out_sm),
            }
        )
        # map-side combiner: pre-sum per (query, doc) before the exchange
        g = g.groupby(["query_id", id_col], sort=False, as_index=False)["smp"].sum()
        return pa.table(
            {
                "query_id": pa.array(g["query_id"].to_numpy(np.int64), pa.int64()),
                id_col: pa.array(g[id_col].to_numpy(np.int64), pa.int64()),
                "smp": pa.array(g["smp"].to_numpy(np.int64), pa.int64()),
            }
        )

    scored = sharded_group_sum(
        tc.map_batches(score_partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["query_id", id_col],
        sums={"smp": "score_micro"},
    )

    def topk_prune(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return g[["query_id", id_col, "score_micro"]]
        g = g.sort_values(
            ["query_id", "score_micro", id_col], ascending=[True, False, True]
        )
        return g.groupby("query_id", sort=False).head(top_k)[
            ["query_id", id_col, "score_micro"]
        ]

    def topk_final(g: pd.DataFrame) -> pa.Table:
        g = topk_prune(g)
        sm = g["score_micro"].to_numpy(np.int64)
        return pa.table(
            {
                "query_id": pa.array(g["query_id"].to_numpy(np.int64), pa.int64()),
                id_col: pa.array(g[id_col].to_numpy(np.int64), pa.int64()),
                "score_micro": pa.array(sm, pa.int64()),
                "score": pa.array(sm.astype(np.float64) / 1e6, pa.float64()),
            }
        )

    pruned = scored.map_batches(topk_prune, batch_format="pandas").materialize()
    return local_keyed_map(pruned, topk_final)


def _bm25_empty():
    import pyarrow as pa

    return pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "score_micro": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )
