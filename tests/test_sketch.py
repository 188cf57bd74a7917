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
def test_distinct_count_ungrouped_single_row():
    import pandas as pd
    import ray.data

    ds = ray.data.from_pandas(pd.DataFrame({"v": ["a", "b", "a", "c", None]}))
    out = sketch.distinct_count(ds, col="v").to_pandas()
    assert list(out.columns) == ["n_distinct"]
    assert len(out) == 1 and int(out["n_distinct"].iloc[0]) == 3
