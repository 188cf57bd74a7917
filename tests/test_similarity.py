"""Similarity-search stage tests: exactness degradations + recall floors.

- ``lsh_topk`` with probe radius >= n_planes admits every bucket, so it must
  equal exact brute force.
- ``ivf_topk`` with nprobe == n_list probes every list, so it must equal exact
  brute force; with nprobe < n_list recall against brute force stays above a
  floor (deterministic seeds).
"""

import numpy as np
import pyarrow as pa
import pytest

from statefulstreamprocessor_ray.stages import similarity

SF_DIR = "/root/testdata/sf0.001"
QUERY_IDS = [0, 1, 2, 3, 4]
K = 10


@pytest.fixture(scope="module")
def embeddings(ray_session):
    import ray.data

    return ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")


def _as_rows(tbl: pa.Table):
    return list(
        zip(
            tbl["query_id"].to_pylist(),
            tbl["rank"].to_pylist(),
            tbl["neighbor_id"].to_pylist(),
            tbl["sim_r"].to_pylist(),
        )
    )


def test_lsh_full_radius_equals_brute_force(embeddings):
    exact = similarity.brute_force_topk(embeddings, QUERY_IDS, k=K)
    lsh = similarity.lsh_topk(
        embeddings, QUERY_IDS, k=K, n_planes=8, n_probe_hamming=8
    )
    assert _as_rows(lsh) == _as_rows(exact)


def test_ivf_full_probe_equals_brute_force(embeddings):
    exact = similarity.brute_force_topk(embeddings, QUERY_IDS, k=K)
    ivf = similarity.ivf_topk(embeddings, QUERY_IDS, k=K, n_list=8, nprobe=8)
    assert _as_rows(ivf) == _as_rows(exact)


def test_ivf_partial_probe_recall_floor(embeddings):
    exact = similarity.brute_force_topk(embeddings, QUERY_IDS, k=K)
    ivf = similarity.ivf_topk(embeddings, QUERY_IDS, k=K, n_list=16, nprobe=4)
    exact_sets = {}
    for q, _, n, _ in _as_rows(exact):
        exact_sets.setdefault(q, set()).add(n)
    got_sets = {}
    for q, _, n, _ in _as_rows(ivf):
        got_sets.setdefault(q, set()).add(n)
    recalls = [
        len(exact_sets[q] & got_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    # synthetic near-orthogonal embeddings are a worst case for IVF; the
    # self-neighbor plus a nontrivial fraction of true neighbors must survive
    assert all(r >= 0.2 for r in recalls), recalls
    assert np.mean(recalls) >= 0.3, recalls


def test_ivf_query_always_finds_itself(embeddings):
    ivf = similarity.ivf_topk(embeddings, QUERY_IDS, k=K, n_list=16, nprobe=2)
    rows = _as_rows(ivf)
    for q in QUERY_IDS:
        top = [r for r in rows if r[0] == q and r[1] == 1]
        assert top and top[0][2] == q  # rank-1 neighbor is the query itself


@pytest.mark.usefixtures("ray_session")
def test_group_centroids_matches_numpy_and_handles_ragged():
    """Micro-quantized centroid equals the naive quantized mean; ragged
    list lengths and null rows are handled via the offsets buffer."""
    import ray.data

    from statefulstreamprocessor_ray.stages.similarity import group_centroids

    rng = np.random.default_rng(5)
    vecs = [rng.standard_normal(3).astype(np.float32) for _ in range(20)]
    vecs.append(rng.standard_normal(5).astype(np.float32))  # ragged tail
    labels = [i % 4 for i in range(20)] + [0]
    t = pa.table(
        {
            "label": pa.array(labels + [None, 2], pa.int32()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs] + [[1.0, 2.0], None],
                pa.list_(pa.float32()),
            ),
        }
    )
    out = (
        group_centroids(ray.data.from_arrow(t), group_col="label")
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    # naive reference over valid rows only
    ref = {}
    for lab, v in zip(labels, vecs):
        for d, x in enumerate(v, start=1):
            sm = int(np.round(np.float64(x) * 1e6))
            s, n = ref.get((lab, d), (0, 0))
            ref[(lab, d)] = (s + sm, n + 1)
    assert len(out) == len(ref)
    for _, row in out.iterrows():
        s, n = ref[(int(row["label"]), int(row["dim"]))]
        assert int(row["s_micro"]) == s and int(row["n"]) == n
        assert row["centroid"] == np.float64(s) / n / 1e6
    # group 0's ragged vector contributes dims 4..5 with n == 1
    assert (out[(out["label"] == 0) & (out["dim"] > 3)]["n"] == 1).all()
