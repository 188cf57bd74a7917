"""Composed corpus-build pipeline (pipelines/corpus.py) + exact-dup star
edges: the testdata documents table has no exact duplicates, so these tests
inject them to exercise the 128-bit-hash dedup path the oracle can't see."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from statefulstreamprocessor_ray.pipelines.corpus import corpus_build
from statefulstreamprocessor_ray.stages import dedup


def _docs(texts, ids=None):
    ids = np.arange(len(texts), dtype=np.int64) if ids is None else np.asarray(ids)
    return ray.data.from_pandas(
        pd.DataFrame({"doc_id": ids, "text": texts})
    )


@pytest.mark.usefixtures("ray_session")
def test_exact_dup_pairs_star_edges():
    # groups: {0,3,5} identical, {1,4} identical, 2 unique -> star edges
    # from each group's min id, m-1 edges per m-sized group (never pairs)
    texts = ["aa bb", "cc dd", "ee ff", "aa bb", "cc dd", "aa bb"]
    edges = dedup.exact_dup_pairs(_docs(texts)).to_pandas()
    got = set(zip(edges.doc_a, edges.doc_b))
    assert got == {(0, 3), (0, 5), (1, 4)}


@pytest.mark.usefixtures("ray_session")
def test_exact_dup_pairs_no_dups_is_empty():
    edges = dedup.exact_dup_pairs(_docs([f"text {i} unique" for i in range(50)]))
    assert edges.num_rows == 0
    assert [f.name for f in edges.schema] == ["doc_a", "doc_b"]


@pytest.mark.usefixtures("ray_session")
def test_corpus_build_drops_exact_dups_and_chunks(tmp_path):
    # 30-token docs pass the default quality gate; doc 7 is an exact copy
    # of doc 2 (dropped), doc 8 shares a 5-gram with the bench doc (dropped)
    base = [" ".join(f"w{i}t{j}" for j in range(30)) for i in range(7)]
    texts = base + [base[2], " ".join(f"z{j}" for j in range(25))]
    docs = _docs(texts)
    bench = _docs(["z0 z1 z2 z3 z4"], ids=[99])
    out = corpus_build(
        docs,
        bench,
        min_tokens=20,
        max_top_frac=1.0,
        jaccard_threshold=0.9,
        decon_k=5,
        chunk_tokens=16,
        overlap=4,
        checkpoint_dir=str(tmp_path / "ckpt"),
    ).to_pandas()
    kept_ids = set(out.doc_id)
    assert 7 not in kept_ids  # exact duplicate of 2 (min id 2 is kept)
    assert 8 not in kept_ids  # shares the bench 5-gram
    assert kept_ids == {0, 1, 2, 3, 4, 5, 6}
    # 30 tokens, chunk 16 step 12 -> starts 0 and 12 (24+4 < 30 fails for
    # start 24: 24 emitted only if 24+overlap < 30 -> 28 < 30 true) -> 3
    per_doc = out.groupby("doc_id").size()
    assert (per_doc == 3).all()
    assert (out[out.chunk_idx == 0].n_tokens == 16).all()
