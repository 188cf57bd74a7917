"""Hypothesis differentials for the analytic kernels: random inputs vs an
independent pandas implementation. The SQL-oracle sweep checks the fixed
testdata; these check the KERNELS over adversarial shapes (ties, singleton
keys, negative values, permuted arrival order)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from statefulstreamprocessor_ray.stages.analytic import (
    latest_per_key,
    topk_per_group_by_value,
    window_functions,
)


def _events_strategy():
    row = st.tuples(
        st.integers(0, 5),  # user
        st.integers(0, 50),  # ts seconds (small range -> frequent ties)
        st.floats(-100, 100, allow_nan=False, allow_infinity=False, width=32),
    )
    return st.lists(row, min_size=1, max_size=60)


def _pandas_reference(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    df["vm"] = np.round(df["value"].to_numpy() * 1e6).astype(np.int64)
    g = df.groupby("user_id", sort=False)
    df["rn"] = g.cumcount() + 1
    df["prev_value"] = g["value"].shift(1)
    ts_us = df["ts"].astype("datetime64[us]").astype("int64")
    df["delta_us"] = ts_us - ts_us.groupby(df["user_id"]).shift(1)
    df["cum_micro"] = g["vm"].cumsum()
    df["roll4_micro"] = (
        g["vm"].rolling(4, min_periods=1).sum().reset_index(drop=True).astype(np.int64)
    )
    return df


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=25, deadline=None)
@given(rows=_events_strategy())
def test_window_functions_matches_pandas_reference(rows):
    import ray.data

    df = pd.DataFrame(rows, columns=["user_id", "ts_s", "value"])
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    df["ts"] = pd.to_datetime(df.pop("ts_s"), unit="s")
    df = df[["event_id", "ts", "user_id", "value"]]
    got = (
        window_functions(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ref = _pandas_reference(df.copy()).sort_values("event_id").reset_index(drop=True)
    assert got["rn"].tolist() == ref["rn"].tolist()
    assert got["cum_micro"].tolist() == ref["cum_micro"].tolist()
    assert got["roll4_micro"].tolist() == ref["roll4_micro"].tolist()
    pd.testing.assert_series_equal(
        got["prev_value"], ref["prev_value"], check_names=False
    )
    np.testing.assert_array_equal(
        got["delta_us"].to_numpy(np.float64),
        ref["delta_us"].to_numpy(np.float64),
    )


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_events_strategy())
def test_latest_per_key_matches_pandas(rows):
    import ray.data

    df = pd.DataFrame(rows, columns=["user_id", "ts_s", "value"])
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    df["ts"] = pd.to_datetime(df.pop("ts_s"), unit="s")
    got = (
        latest_per_key(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    ref = (
        df.sort_values(["user_id", "ts", "event_id"], ascending=[True, False, False])
        .groupby("user_id", sort=True)
        .head(1)
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got["event_id"].tolist() == ref["event_id"].tolist()


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=20, deadline=None)
@given(rows=_events_strategy(), k=st.integers(1, 4))
def test_topk_per_group_matches_pandas(rows, k):
    import ray.data

    df = pd.DataFrame(rows, columns=["g", "v", "_f"])
    df["id"] = np.arange(len(df), dtype=np.int64)
    df["g"] = df["g"].astype(str)
    got = (
        topk_per_group_by_value(
            ray.data.from_pandas(df[["g", "v", "id"]]),
            group_col="g",
            value_col="v",
            id_col="id",
            k=k,
        )
        .to_pandas()
        .sort_values(["g", "rk"])
        .reset_index(drop=True)
    )
    ref = (
        df.sort_values(["g", "v", "id"], ascending=[True, False, True])
        .groupby("g", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    assert got["id"].tolist() == ref["id"].tolist()


@pytest.mark.usefixtures("ray_session")
@settings(max_examples=15, deadline=None)
@given(
    texts=st.lists(st.text(min_size=0, max_size=12), min_size=1, max_size=40),
    seed=st.integers(0, 1000),
)
def test_group_checksum_sip_partition_invariant(texts, seed):
    """The sip checksum must be identical for ANY partitioning of the same
    multiset of rows (associativity mod 2^64)."""
    import ray.data

    from statefulstreamprocessor_ray.stages.curation import group_checksum

    rng = np.random.default_rng(seed)
    df = pd.DataFrame({"source": ["s"] * len(texts), "text": texts})
    perm = df.iloc[rng.permutation(len(df))].reset_index(drop=True)
    a = group_checksum(ray.data.from_pandas(df), hash_fn="sip").to_pandas()
    # different block structure: split into up to 3 chunks
    chunks = np.array_split(perm, min(3, len(perm)))
    ds = ray.data.from_pandas([c for c in chunks if len(c)])
    b = group_checksum(ds, hash_fn="sip").to_pandas()
    assert a["checksum"].tolist() == b["checksum"].tolist()
    assert a["n_docs"].tolist() == b["n_docs"].tolist()
