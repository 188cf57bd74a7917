"""Dedup clustering/apply + session-bounded join."""

import numpy as np
import pyarrow as pa
import pytest

from statefulstreamprocessor_ray.stages.dedup import apply_dedup, cluster_duplicates
from statefulstreamprocessor_ray.stages.join import session_bounded_join

US = 1_000_000


def test_cluster_duplicates_union_find():
    pairs = pa.table(
        {"doc_a": pa.array([1, 2, 7], pa.int64()), "doc_b": pa.array([2, 3, 9], pa.int64())}
    )
    c = cluster_duplicates(pairs)
    assert c[1] == c[2] == c[3] == 1
    assert c[7] == c[9] == 7


@pytest.mark.usefixtures("ray_session")
def test_apply_dedup_filters_non_representatives():
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(10), pa.int64()),
                  "text": pa.array([f"t{i}" for i in range(10)])})
    )
    clusters = {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}
    kept = apply_dedup(ds, clusters).to_pandas()
    assert sorted(kept.doc_id) == [0, 1, 4, 5, 6, 7, 8]


@pytest.mark.usefixtures("ray_session")
def test_session_bounded_join():
    import ray.data

    # one conv, two sessions separated by a 1000 s gap; F2-ish pattern inside each
    rows = []
    for s_off, base in ((0, 0.0), (1, 2000.0)):
        for i in range(4):
            rows.append(("c1", len(rows), "assistant", f"L{s_off}{i}", None, base + 2 * i))
            rows.append(("c1", len(rows), "tool", f"R{s_off}{i}", "t", base + 2 * i + 1))
    tbl = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows]),
            "text": pa.array([r[3] for r in rows]),
            "tool": pa.array([r[4] for r in rows], pa.string()),
            "ts": pa.array([int(r[5] * US) for r in rows], pa.int64()).cast(pa.timestamp("us")),
            "stream_side": pa.array(
                [0 if r[2] == "assistant" else 1 for r in rows], pa.int8()
            ),
        }
    )
    ds = ray.data.from_arrow(tbl)
    out = session_bounded_join(ds, gap_s=100.0).to_pandas()
    # no pair crosses the session boundary
    assert set(out.session_id) == {0, 1}
    for _, row in out.iterrows():
        assert row.r_text[1] == row.s_text[1]  # same session ordinal prefix
    # within a session the alternating pattern gives 2k-1 pairs (F1 rule, k=4 each side)
    assert (out.session_id == 0).sum() == 7
    assert (out.session_id == 1).sum() == 7
    assert "conv_id" in out.columns and "_skey" not in out.columns


@pytest.mark.usefixtures("ray_session")
def test_containment_catches_embedded_doc_jaccard_misses():
    """A short doc fully embedded in a much longer one: containment = 1.0
    (every shingle of the small doc appears in the big one) while Jaccard
    is tiny — the partial-copy shape ngram_containment_pairs exists for."""
    import ray.data

    from statefulstreamprocessor_ray.stages.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    rng = np.random.default_rng(3)
    words = [f"w{i:03d}" for i in range(400)]
    small = " ".join(rng.choice(words, 30))
    big = small + " " + " ".join(rng.choice(words, 500))
    other = " ".join(rng.choice(words, 200))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array([small, big, other]),
            }
        )
    )
    cont = ngram_containment_pairs(ds, threshold=0.8, k=3).to_pandas()
    got = set(zip(cont["doc_a"], cont["doc_b"]))
    assert (1, 2) in got
    row = cont[(cont["doc_a"] == 1) & (cont["doc_b"] == 2)].iloc[0]
    assert row["containment"] == 1.0

    jac = ngram_jaccard_pairs(ds, threshold=0.5, k=3).to_pandas()
    assert (1, 2) not in set(zip(jac["doc_a"], jac["doc_b"]))
