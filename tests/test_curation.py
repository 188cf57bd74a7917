"""Curation operators: deterministic sampling + benchmark decontamination."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from statefulstreamprocessor_ray.stages import curation


@pytest.mark.usefixtures("ray_session")
def test_deterministic_sample_is_stable_and_rate_accurate():
    df = pd.DataFrame(
        {"doc_id": np.arange(20_000, dtype=np.int64),
         "lang": np.where(np.arange(20_000) % 4 == 0, "de", "en")}
    )
    ds = ray.data.from_pandas(df)
    a = curation.deterministic_sample(ds, rate=0.3).to_pandas()
    b = curation.deterministic_sample(
        ray.data.from_pandas(df), rate=0.3
    ).to_pandas()
    # deterministic: identical rows both runs; rate within ~2% absolute
    assert a.doc_id.tolist() == b.doc_id.tolist()
    assert abs(len(a) / len(df) - 0.3) < 0.02

    s = curation.deterministic_sample(
        ds, rates_by={"en": 0.5, "de": 0.1}, stratum_col="lang"
    ).to_pandas()
    frac = s.groupby(s.lang).size() / df.groupby(df.lang).size()
    assert abs(frac["en"] - 0.5) < 0.03 and abs(frac["de"] - 0.1) < 0.03
    # unknown strata default to rate 0
    t = curation.deterministic_sample(
        ds, rates_by={"en": 0.5}, stratum_col="lang"
    ).to_pandas()
    assert (t.lang == "en").all()


@pytest.mark.usefixtures("ray_session")
def test_deterministic_sample_md5_mode_matches_duckdb():
    """hash_fn='md5' (the oracle mode) must reproduce DuckDB's
    md5_number_lower(CAST(id AS VARCHAR)) % 1e6 < rate*1e6 decision exactly;
    hash_fn='sip' (the scale default) must be vectorized-deterministic."""
    import duckdb

    df = pd.DataFrame({"doc_id": np.arange(5_000, dtype=np.int64)})
    got = curation.deterministic_sample(
        ray.data.from_pandas(df), rate=0.3, hash_fn="md5"
    ).to_pandas()
    want = duckdb.sql(
        "SELECT doc_id FROM df "
        "WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000000 < 300000 "
        "ORDER BY doc_id"
    ).fetchdf()
    assert sorted(got.doc_id.tolist()) == want.doc_id.tolist()

    a = curation.deterministic_sample(
        ray.data.from_pandas(df), rate=0.3, hash_fn="sip"
    ).to_pandas()
    b = curation.deterministic_sample(
        ray.data.from_pandas(df), rate=0.3, hash_fn="sip"
    ).to_pandas()
    assert a.doc_id.tolist() == b.doc_id.tolist()
    assert abs(len(a) / len(df) - 0.3) < 0.03


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_flags_and_drops():
    bench_texts = ["the quick brown fox jumps", "pack my box with jugs"]
    corpus = [
        "totally unrelated words here one",          # clean
        "contains the quick brown fox jumps inline",  # 3-gram overlap
        "x",                                          # <k tokens, clean
        "",                                           # empty
    ]
    bench = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(2, dtype=np.int64), "text": bench_texts})
    )
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"doc_id": np.arange(100, 104, dtype=np.int64), "text": corpus}
        )
    )
    flagged = curation.decontaminate(ds, bench, k=3).to_pandas().sort_values("doc_id")
    assert flagged.contaminated.tolist() == [False, True, False, False]
    assert flagged.n_overlap.tolist()[1] == 3  # 3 shared 3-grams
    dropped = curation.decontaminate(ds, bench, k=3, mode="drop").to_pandas()
    assert sorted(dropped.doc_id) == [100, 102, 103]


@pytest.mark.usefixtures("ray_session")
def test_chunk_documents_windows_and_overlap():
    texts = {
        0: " ".join(f"w{i}" for i in range(100)),  # 4 chunks of 40/overlap 8
        1: "a b c",                                 # single short chunk
        2: "",                                      # no chunks
        3: " ".join(f"x{i}" for i in range(40)),    # exactly one window
    }
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    out = (
        curation.chunk_documents(ds, chunk_tokens=40, overlap=8)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    d0 = out[out.doc_id == 0]
    assert d0.chunk_idx.tolist() == [0, 1, 2]  # starts 0,32,64; 96+8>=100 stops
    assert d0.n_tokens.tolist() == [40, 40, 36]
    # overlap: chunk 1 starts at token 32 -> first token w32
    assert d0.iloc[1].chunk_text.split()[0] == "w32"
    assert out[out.doc_id == 1].n_tokens.tolist() == [3]
    assert (out.doc_id == 2).sum() == 0
    assert out[out.doc_id == 3].n_tokens.tolist() == [40]
    with pytest.raises(ValueError):
        curation.chunk_documents(ds, chunk_tokens=10, overlap=10)


@pytest.mark.usefixtures("ray_session")
def test_pack_sequences_greedy_budget():
    # 10 chunks of 30 tokens, bucket 0 only -> packs of 4 (120 <= 128)
    df = pd.DataFrame(
        {
            "doc_id": np.zeros(10, np.int64) + 8,  # 8 % 8 == 0
            "chunk_idx": np.arange(10, dtype=np.int64),
            "n_tokens": np.full(10, 30, np.int64),
        }
    )
    out = (
        curation.pack_sequences(ray.data.from_pandas(df), budget=128, n_buckets=8)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    assert out.pack_id.tolist() == [0, 0, 0, 0, 1, 1, 1, 1, 2, 2]
    assert out.pack_tokens_before.tolist() == [0, 30, 60, 90] * 2 + [0, 30]
    # oversized chunk gets its own pack and resets the walk
    df2 = pd.DataFrame(
        {
            "doc_id": np.zeros(3, np.int64),
            "chunk_idx": np.arange(3, dtype=np.int64),
            "n_tokens": np.array([50, 500, 50], np.int64),
        }
    )
    out2 = (
        curation.pack_sequences(ray.data.from_pandas(df2), budget=128, n_buckets=8)
        .to_pandas()
        .sort_values("chunk_idx")
    )
    assert out2.pack_id.tolist() == [0, 1, 2]


@pytest.mark.usefixtures("ray_session")
def test_render_conversations_order_and_format():
    df = pd.DataFrame(
        {
            "conv_id": ["a", "a", "b", "a"],
            "ts": pd.to_datetime([3, 1, 1, 2], unit="s"),
            "turn_idx": np.array([3, 1, 1, 2], np.int64),
            "role": ["assistant", "user", "user", "tool"],
            "text": ["t3", "t1", "only", "t2"],
            "tool": [None, None, None, "err"],
        }
    )
    out = (
        curation.render_conversations(ray.data.from_pandas(df), n_shards=3)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert out.conv_id.tolist() == ["a", "b"]
    assert out.n_turns.tolist() == [3, 1]
    assert out.rendered[0] == "user: t1\ntool: t2\nassistant: t3"
    assert out.rendered[1] == "user: only"


from hypothesis import given, settings, strategies as st


@settings(max_examples=15, deadline=None)
@given(
    n_tokens=st.lists(st.integers(0, 90), min_size=1, max_size=12),
    chunk=st.integers(5, 60),
    overlap=st.integers(0, 4),
)
def test_chunking_invariants(ray_session, n_tokens, chunk, overlap):
    # build docs with the requested token counts
    texts = [" ".join(f"t{d}_{i}" for i in range(n)) for d, n in enumerate(n_tokens)]
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
    )
    out = curation.chunk_documents(ds, chunk_tokens=chunk, overlap=overlap).to_pandas()
    if len(out) == 0:
        # all-empty docs: zero chunks (and Ray loses the empty frame's schema)
        assert all(n == 0 for n in n_tokens)
        return
    step = chunk - overlap
    for d, n in enumerate(n_tokens):
        rows = out[out.doc_id == d].sort_values("chunk_idx")
        if n == 0:
            assert len(rows) == 0
            continue
        # coverage: concatenating chunks minus overlaps reproduces the doc
        toks = []
        for _, r in rows.iterrows():
            piece = r.chunk_text.split()
            toks.extend(piece if not toks else piece[overlap:] if r.chunk_idx else piece)
        # every token appears; chunk sizes bounded; last chunk reaches the end
        assert rows.n_tokens.max() <= chunk
        covered = set()
        for _, r in rows.iterrows():
            start = int(r.chunk_idx) * step
            covered.update(range(start, start + int(r.n_tokens)))
        assert covered == set(range(n))


@settings(max_examples=15, deadline=None)
@given(
    toks=st.lists(st.integers(1, 200), min_size=1, max_size=40),
    budget=st.integers(50, 300),
)
def test_packing_invariants(ray_session, toks, budget):
    df = pd.DataFrame(
        {
            "doc_id": np.zeros(len(toks), np.int64),
            "chunk_idx": np.arange(len(toks), dtype=np.int64),
            "n_tokens": np.asarray(toks, np.int64),
        }
    )
    out = (
        curation.pack_sequences(ray.data.from_pandas(df), budget=budget, n_buckets=4)
        .to_pandas()
        .sort_values("chunk_idx")
        .reset_index(drop=True)
    )
    assert len(out) == len(toks)  # every chunk packed exactly once
    # packs respect the budget unless a single chunk exceeds it
    sizes = out.groupby("pack_id").n_tokens.sum()
    counts = out.groupby("pack_id").size()
    for pid in sizes.index:
        assert sizes[pid] <= budget or counts[pid] == 1
    # greedy: a pack boundary only occurs because the next chunk wouldn't fit
    order = out.pack_id.to_numpy()
    assert (np.diff(order) >= 0).all() and (np.diff(order) <= 1).all()
    for i in range(1, len(out)):
        if order[i] != order[i - 1]:
            prev_total = out.n_tokens[order == order[i - 1]].sum()
            assert prev_total + out.n_tokens[i] > budget


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_trailing_empty_doc_regression():
    # review finding: a zero-shingle doc AFTER a contaminated doc used to
    # corrupt the previous doc's reduceat segment (undercount by its last
    # shingle -> contaminated doc reported clean)
    bench = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [0], "text": ["alpha beta gamma"]})
    )
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [10, 11], "text": ["zzz alpha beta gamma", ""]})
    )
    out = curation.decontaminate(ds, bench, k=3).to_pandas().sort_values("doc_id")
    assert out.contaminated.tolist() == [True, False]
    assert out.n_overlap.tolist() == [1, 0]  # the shared tail 3-gram


@pytest.mark.usefixtures("ray_session")
def test_scrub_text_patterns_and_counts():
    docs = [
        "contact me at foo.bar+x@example.com today",
        "see https://example.com/a?b=1 and http://x.io",
        "clean text only",
        "mail a@b.co at https://c.d/e",
    ]
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64), "text": docs})
    )
    out = curation.scrub_text(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.n_email.tolist() == [1, 0, 0, 1]
    assert out.n_url.tolist() == [0, 2, 0, 1]
    assert out.text[0] == "contact me at <EMAIL> today"
    assert out.text[1] == "see <URL> and <URL>"
    assert out.text[3] == "mail <EMAIL> at <URL>"


@pytest.mark.usefixtures("ray_session")
def test_repetition_stats_signals():
    docs = ["the the the the cat", "all words differ here", ""]
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64), "text": docs})
    )
    out = (
        curation.repetition_stats(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out.n_tokens.tolist() == [5, 4, 0]
    assert out.n_distinct.tolist() == [2, 4, 0]
    assert out.top_token_frac.tolist() == [0.8, 0.25, 0.0]


@pytest.mark.usefixtures("ray_session")
def test_url_domain_stats_counts_and_distinct_docs():
    import pyarrow as pa
    import ray.data

    from statefulstreamprocessor_ray.stages.curation import url_domain_stats

    docs = [
        "see https://EXAMPLE.com/a and https://example.com/b?q=1 now",
        "only http://other.org here",
        "dup https://example.com/x plus mail-free text",
        "no urls at all",
        "edge https:/// broken and https://example.com#frag",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs),
            }
        )
    )
    out = url_domain_stats(ds).to_pandas().sort_values("domain").reset_index(drop=True)
    got = {r["domain"]: (r["n_urls"], r["n_docs"]) for _, r in out.iterrows()}
    # example.com: 4 urls (2 in doc0 — one uppercase host, lowercased —
    # 1 in doc2, 1 in doc4) across 3 docs; other.org: 1 url / 1 doc;
    # the bare "https:///" authority-less url is dropped
    assert got == {"example.com": (4, 3), "other.org": (1, 1)}


@pytest.mark.usefixtures("ray_session")
def test_percentile_quality_filter_exact_and_ties():
    """Exact regime: threshold is the true quantile_disc element; docs tied
    with the threshold survive; the kept set is never empty."""
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(10, dtype=np.int64),
            "text": [
                "a",                     # 1 token
                "a b",                   # 2
                "a b c",                 # 3 (P10 threshold element for q=0.2)
                "a b c",                 # 3 tie survives
                "a b c d",
                "a b c d e",
                "a b c d e f",
                "a b c d e f g",
                "a b c d e f g h",
                "",                      # 0 tokens — always dropped
            ],
        }
    )
    out = (
        curation.percentile_quality_filter(
            ray.data.from_pandas(docs), q=0.2
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n = docs["text"].str.lower().str.split().str.len().to_numpy(np.int64)
    # quantile_disc(0.2) over sorted counts: index max(0, ceil(0.2*10)-1) = 1
    thr = np.sort(n)[max(0, int(np.ceil(0.2 * len(n))) - 1)]
    exp = docs.loc[n >= thr, ["doc_id"]].reset_index(drop=True)
    assert out["doc_id"].tolist() == exp["doc_id"].tolist()
    assert (out["n_tokens"].to_numpy() >= thr).all()
    assert 2 in out["doc_id"].tolist() and 3 in out["doc_id"].tolist()
    assert 9 not in out["doc_id"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_group_sample_exact_k_counts_and_modes():
    """Exactly min(k, |group|) per group; sip and md5 modes each match a
    single-process reference of their own hash ordering; partial+final
    reduction equals the global answer regardless of batching."""
    rng = np.random.default_rng(3)
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(500, dtype=np.int64),
            "source": rng.choice(["web", "code", "chat", "rare"], 500,
                                 p=[0.5, 0.3, 0.19, 0.01]),
        }
    )
    from statefulstreamprocessor_ray.stages.dedup import _md5_u64

    for mode in ("sip", "md5"):
        out = (
            curation.group_sample_exact_k(
                ray.data.from_pandas(docs), k=7, group_col="source",
                hash_fn=mode,
            )
            .to_pandas()
            .sort_values(["source", "doc_id"])
            .reset_index(drop=True)
        )
        if mode == "md5":
            h = _md5_u64([str(i) for i in docs["doc_id"]])
        else:
            h = pd.util.hash_array(docs["doc_id"].to_numpy(np.int64),
                                   categorize=False)
        ref = (
            docs.assign(h=h)
            .sort_values(["source", "h", "doc_id"], kind="stable")
            .groupby("source", sort=False)
            .head(7)[["source", "doc_id"]]
            .sort_values(["source", "doc_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out[["source", "doc_id"]], ref)
        sizes = out.groupby("source").size()
        true_sizes = docs.groupby("source").size()
        for s in true_sizes.index:
            assert sizes.get(s, 0) == min(7, true_sizes[s])


@pytest.mark.usefixtures("ray_session")
def test_weighted_repeat_explode_and_rep_index():
    import pandas as pd
    import ray.data

    from statefulstreamprocessor_ray.stages.curation import weighted_repeat

    df = pd.DataFrame({"doc_id": [1, 2, 3], "source": ["src0", "src1", "src2"]})
    # weights: src0 -> 0%3+1=1, src1 -> 2, src2 -> 3
    out = (
        weighted_repeat(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values(["doc_id", "rep"])
        .reset_index(drop=True)
    )
    assert len(out) == 1 + 2 + 3
    assert out[out["doc_id"] == 2]["rep"].tolist() == [1, 2]
    assert out[out["doc_id"] == 3]["rep"].tolist() == [1, 2, 3]
