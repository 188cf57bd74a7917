"""Relational equi-joins: broadcast + partitioned variants vs pandas merge."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from statefulstreamprocessor_ray.stages import relational


def _frames(seed=3, n_left=5000, n_right=800):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 1000, n_left).astype(np.int64),
            "lval": np.arange(n_left, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.choice(1000, n_right, replace=False).astype(np.int64),
            "rval": np.arange(n_right, dtype=np.int64),
        }
    )
    return left, right


def _sorted(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("how", ["inner", "left"])
def test_broadcast_join_matches_pandas(how):
    left, right = _frames()
    got = relational.broadcast_join(
        ray.data.from_pandas(left), right, left_on="k", right_on="rk", how=how
    ).to_pandas()
    want = left.merge(right, how=how, left_on="k", right_on="rk")
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("how", ["inner", "left"])
def test_partitioned_join_matches_pandas(how):
    left, right = _frames(seed=7)
    got = relational.partitioned_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right),
        left_on="k",
        right_on="rk",
        how=how,
        n_shards=13,
    ).to_pandas()
    want = left.merge(right, how=how, left_on="k", right_on="rk")
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_partitioned_join_rejects_column_collision():
    left = pd.DataFrame({"k": [1], "v": [2]})
    right = pd.DataFrame({"k": [1], "v": [3]})
    with pytest.raises(ValueError, match="overlapping"):
        relational.partitioned_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right), left_on="k"
        )
