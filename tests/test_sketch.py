"""Sketch operators: heavy hitters (SpaceSaving partials) and distinct count
(sparse-exact / dense-HLL). The driver-testdata queries exercise only the
exact regimes; these tests cover truncation, error bounds, the dense
estimator's accuracy, and batch-order invariance."""

import numpy as np
import pytest

from statefulstreamprocessor_ray.stages import sketch


def _zipf_items(n_rows: int, n_distinct: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, n_rows) % n_distinct
    return np.char.add("item", ranks.astype(str))


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_exact_regime_matches_pandas():
    import pandas as pd
    import ray.data

    vals = _zipf_items(20_000, 500, seed=1)
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    got = (
        sketch.heavy_hitters(ds, col="v", k=10, capacity=4096, tokenize=False)
        .to_pandas()
        .sort_values(["n", "item"], ascending=[False, True])
        .reset_index(drop=True)
    )
    assert (got["err_bound"] == 0).all()
    vc = pd.Series(vals).value_counts()
    want = (
        vc.reset_index()
        .set_axis(["item", "n"], axis=1)
        .sort_values(["n", "item"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    assert list(got["item"]) == list(want["item"])
    assert list(got["n"]) == list(want["n"])


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_truncation_bounds_error():
    """capacity << distinct: the true top items still surface (skewed heads
    survive SpaceSaving truncation), counts are lower bounds within the
    reported err_bound, and err_bound > 0 is reported honestly."""
    import pandas as pd
    import ray.data

    vals = _zipf_items(50_000, 5_000, seed=2)
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    got = sketch.heavy_hitters(ds, col="v", k=5, capacity=64, tokenize=False).to_pandas()
    assert (got["err_bound"] > 0).all()
    vc = pd.Series(vals).value_counts()
    err = int(got["err_bound"].iloc[0])
    for item, n in zip(got["item"], got["n"]):
        true_n = int(vc[item])
        assert n <= true_n <= n + err
    # the unambiguous top item (zipf head) survives truncation
    assert got["item"].iloc[0] == vc.index[0]


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_batch_order_invariant():
    import pandas as pd
    import ray.data

    vals = _zipf_items(10_000, 300, seed=3)
    a = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(4)
    b = ray.data.from_pandas(pd.DataFrame({"v": vals[::-1]})).repartition(7)
    ga = sketch.heavy_hitters(a, col="v", k=8, tokenize=False).to_pandas()
    gb = sketch.heavy_hitters(b, col="v", k=8, tokenize=False).to_pandas()
    pd.testing.assert_frame_equal(
        ga.sort_values(["n", "item"], ascending=[False, True]).reset_index(drop=True),
        gb.sort_values(["n", "item"], ascending=[False, True]).reset_index(drop=True),
    )


@pytest.mark.usefixtures("ray_session")
def test_distinct_count_sparse_exact_per_group():
    import pandas as pd
    import ray.data

    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {
            "g": np.char.add("g", (rng.integers(0, 4, 30_000)).astype(str)),
            "u": np.char.add("u", (rng.integers(0, 2_000, 30_000)).astype(str)),
        }
    )
    # nulls ignored like COUNT(DISTINCT)
    df.loc[df.index[:100], "u"] = None
    ds = ray.data.from_pandas(df).repartition(8)
    got = (
        sketch.distinct_count(ds, col="u", group_col="g")
        .to_pandas()
        .set_index("g")["n_distinct"]
        .sort_index()
    )
    want = df.dropna(subset=["u"]).groupby("g")["u"].nunique().sort_index()
    assert got.astype(int).to_dict() == want.astype(int).to_dict()


@pytest.mark.usefixtures("ray_session")
def test_distinct_count_dense_estimate_within_hll_error():
    """Cardinality far above sparse_limit: the dense HLL estimate lands
    within ~3x the theoretical relative standard error (1.04/sqrt(2^p))."""
    import pandas as pd
    import ray.data

    n = 200_000
    vals = np.char.add("v", np.arange(n).astype(str))  # all distinct
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
    got = sketch.distinct_count(
        ds, col="v", precision=12, sparse_limit=1_000
    ).to_pandas()["n_distinct"].iloc[0]
    rse = 1.04 / np.sqrt(2**12)
    assert abs(got - n) / n < 3 * rse, got


@pytest.mark.usefixtures("ray_session")
def test_quantile_sketch_exact_matches_duckdb_rule():
    """Exact regime: every reported quantile is the quantile_disc element
    (sorted index max(0, ceil(q*n)-1))."""
    import pandas as pd
    import ray.data

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "g": np.char.add("g", rng.integers(0, 3, 9_000).astype(str)),
            "x": rng.normal(size=9_000) * 100,
        }
    )
    ds = ray.data.from_pandas(df).repartition(6)
    got = sketch.quantile_sketch(ds, col="x", group_col="g", qs=(0.25, 0.5, 0.9)).to_pandas()
    for (gval, q), sub in got.groupby(["g", "q"]):
        v = np.sort(df.loc[df["g"] == gval, "x"].to_numpy())
        idx = max(0, int(np.ceil(q * len(v))) - 1)
        assert sub["value"].iloc[0] == v[idx], (gval, q)


@pytest.mark.usefixtures("ray_session")
def test_quantile_sketch_compaction_rank_error_bounded():
    """limit << n: each reported quantile's true rank is within 2W/limit of
    the requested rank — one W/limit per compaction level (partials sum to
    ≤ W/limit total, the merge adds ≤ W/limit)."""
    import pandas as pd
    import ray.data

    rng = np.random.default_rng(8)
    n, limit = 100_000, 256
    x = rng.exponential(size=n)
    ds = ray.data.from_pandas(pd.DataFrame({"x": x})).repartition(8)
    got = sketch.quantile_sketch(ds, col="x", qs=(0.5, 0.9, 0.99), limit=limit).to_pandas()
    xs = np.sort(x)
    for q, v in zip(got["q"], got["value"]):
        true_rank = np.searchsorted(xs, v, side="right")
        assert abs(true_rank - q * n) <= 2 * n / limit + 2, (q, v)


@pytest.mark.usefixtures("ray_session")
def test_sketches_zero_row_input():
    """Zero-row inputs: 0 rows out, no crash (Ray loses the empty frame's
    schema through to_pandas — the repo-wide convention, cf. test_curation)."""
    import pandas as pd
    import ray.data

    empty = ray.data.from_pandas(
        pd.DataFrame(
            {
                "g": pd.Series([], dtype=str),
                "v": pd.Series([], dtype=str),
                "x": pd.Series([], dtype=float),
            }
        )
    )
    assert len(sketch.heavy_hitters(empty, col="v", k=5, tokenize=False).to_pandas()) == 0
    assert len(sketch.distinct_count(empty, col="v", group_col="g").to_pandas()) == 0
    assert len(sketch.quantile_sketch(empty, col="x", group_col="g").to_pandas()) == 0


@pytest.mark.usefixtures("ray_session")
def test_distinct_count_ungrouped_single_row():
    import pandas as pd
    import ray.data

    ds = ray.data.from_pandas(pd.DataFrame({"v": ["a", "b", "a", "c", None]}))
    out = sketch.distinct_count(ds, col="v").to_pandas()
    assert list(out.columns) == ["n_distinct"]
    assert len(out) == 1 and int(out["n_distinct"].iloc[0]) == 3
