"""Unit edge cases for stages/analytic.py — the oracle sweep
(test_queries_oracle.py) covers end-to-end SQL parity; these pin the
kernel-level invariants: modular prefix-sum exactness past int64 shard
totals, deterministic tie-breaking, SQL NULL semantics, fixed pivot
vocabulary, and single-row distribution edges."""

import numpy as np
import pandas as pd
import pytest

from statefulstreamprocessor_ray.stages.analytic import (
    group_moments,
    percent_rank,
    pivot_counts,
    topk_per_group_by_value,
    window_functions,
)


def _events_df(rows):
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_us", "value"])
    df["ts"] = pd.to_datetime(df.pop("ts_us"), unit="us")
    return df[["event_id", "ts", "user_id", "value"]]


@pytest.mark.usefixtures("ray_session")
def test_window_functions_modular_overflow_exact():
    """Two keys in one union whose COMBINED micro total exceeds 2^63: the
    uint64 prefix-sum wraps, but per-group cum/roll values (each < 2^63)
    must come out exact."""
    import ray.data

    big = 9.0e12  # micro units: 9e18, just under 2^63 per group of 1000... use sums
    rows = []
    # per-group total: 200 * 4.6e16 micro = 9.2e18 < 2^63; two groups wrap the union
    per = 4.6e10  # value; micro = 4.6e16
    for uid in (1, 2):
        for i in range(200):
            rows.append((uid * 1000 + i, uid, 1_000_000 * (i + 1), per))
    ds = ray.data.from_pandas(_events_df(rows))
    out = window_functions(ds).to_pandas().sort_values(["user_id", "rn"])
    vm = int(np.round(per * 1e6))
    for uid in (1, 2):
        g = out[out["user_id"] == uid]
        assert list(g["rn"]) == list(range(1, 201))
        expect_cum = vm * np.arange(1, 201, dtype=np.int64)
        assert (g["cum_micro"].to_numpy(np.int64) == expect_cum).all()
        expect_roll = vm * np.minimum(np.arange(1, 201), 4)
        assert (g["roll4_micro"].to_numpy(np.int64) == expect_roll).all()
    # sanity: the union total really would have wrapped int64
    assert 2 * 200 * vm > 2**63
    assert big > 0


@pytest.mark.usefixtures("ray_session")
def test_window_functions_lag_and_delta_nulls():
    import ray.data

    rows = [
        (1, 7, 10_000_000, 1.5),
        (2, 7, 30_000_000, 2.5),
        (3, 8, 20_000_000, 9.0),
    ]
    out = (
        window_functions(ray.data.from_pandas(_events_df(rows)))
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert np.isnan(out.loc[1, "prev_value"]) and np.isnan(out.loc[1, "delta_us"])
    assert out.loc[2, "prev_value"] == 1.5
    assert out.loc[2, "delta_us"] == 20_000_000.0
    assert np.isnan(out.loc[3, "prev_value"])  # first row of its key


@pytest.mark.usefixtures("ray_session")
def test_window_functions_ts_tie_breaks_on_id():
    import ray.data

    rows = [(5, 1, 1_000_000, 1.0), (3, 1, 1_000_000, 2.0), (9, 1, 1_000_000, 3.0)]
    out = (
        window_functions(ray.data.from_pandas(_events_df(rows)))
        .to_pandas()
        .sort_values("rn")
    )
    assert list(out["event_id"]) == [3, 5, 9]
    assert list(out["rn"]) == [1, 2, 3]


@pytest.mark.usefixtures("ray_session")
def test_percent_rank_single_row_and_ties():
    import ray.data

    one = percent_rank(
        ray.data.from_pandas(pd.DataFrame({"doc_id": [1], "n_chars": [42]}))
    ).to_pandas()
    assert one["rnk"].iloc[0] == 1 and one["pr"].iloc[0] == 0.0
    assert one["cd"].iloc[0] == 1.0

    tied = percent_rank(
        ray.data.from_pandas(
            pd.DataFrame({"doc_id": [1, 2, 3, 4], "n_chars": [10, 10, 20, 30]})
        )
    ).to_pandas().set_index("doc_id").sort_index()
    assert list(tied["rnk"]) == [1, 1, 3, 4]
    assert tied.loc[1, "pr"] == 0.0 and tied.loc[3, "pr"] == pytest.approx(2 / 3)
    assert tied.loc[2, "cd"] == 0.5 and tied.loc[4, "cd"] == 1.0


@pytest.mark.usefixtures("ray_session")
def test_percent_rank_empty_input():
    """Zero-row datasets drop their schema through to_pandas(); the
    driver-side prefix merge must tolerate the column-less frame."""
    import ray.data

    out = percent_rank(
        ray.data.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_chars": pd.Series([], dtype="int64"),
                }
            )
        )
    ).to_pandas()
    assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
def test_pivot_counts_absent_category_and_foreign_total():
    import ray.data

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "event_type": ["click", "mystery", "view"],
        }
    )
    out = (
        pivot_counts(ray.data.from_pandas(df), categories=("click", "view", "error"))
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert out.loc[1, "n_click"] == 1 and out.loc[1, "n_error"] == 0
    # the out-of-vocabulary event still counts toward n_total (CASE semantics)
    assert out.loc[1, "n_total"] == 2
    assert out.loc[2, "n_view"] == 1 and out.loc[2, "n_total"] == 1


@pytest.mark.usefixtures("ray_session")
def test_group_moments_drops_nulls():
    import ray.data

    df = pd.DataFrame(
        {
            "event_type": ["a", "a", "a", None, "b"],
            "value": [1.0, None, 3.0, 5.0, -2.5],
        }
    )
    out = (
        group_moments(ray.data.from_pandas(df))
        .to_pandas()
        .set_index("event_type")
        .sort_index()
    )
    assert list(out.index) == ["a", "b"]
    assert out.loc["a", "n"] == 2
    assert out.loc["a", "s_micro"] == 4_000_000
    assert out.loc["a", "min_micro"] == 1_000_000
    assert out.loc["a", "max_micro"] == 3_000_000
    assert out.loc["a", "ssq_centi"] == 100**2 + 300**2
    assert out.loc["b", "min_micro"] == -2_500_000
    assert out.loc["a", "mean"] == pytest.approx(2.0)


@pytest.mark.usefixtures("ray_session")
def test_topk_value_ties_break_on_id_and_short_groups():
    import ray.data

    df = pd.DataFrame(
        {
            "source": ["s1"] * 4 + ["s2"],
            "doc_id": [4, 2, 7, 1, 9],
            "n_chars": [100, 100, 100, 50, 5],
        }
    )
    out = (
        topk_per_group_by_value(ray.data.from_pandas(df), k=3)
        .to_pandas()
        .sort_values(["source", "rk"])
    )
    s1 = out[out["source"] == "s1"]
    assert list(s1["doc_id"]) == [2, 4, 7]  # value tie -> ascending doc_id
    assert list(s1["rk"]) == [1, 2, 3]
    s2 = out[out["source"] == "s2"]
    assert len(s2) == 1 and s2["rk"].iloc[0] == 1


@pytest.mark.usefixtures("ray_session")
def test_histogram_negative_values_floor():
    import ray.data

    from statefulstreamprocessor_ray.stages.analytic import histogram

    df = pd.DataFrame({"value": [-30.0, -1.0, 0.0, 24.9, 25.0, None]})
    out = (
        histogram(ray.data.from_pandas(df), width=25.0)
        .to_pandas()
        .set_index("bin")
        .sort_index()
    )
    # floor semantics: -30 -> bin -2, -1 -> bin -1, [0,25) -> 0, 25 -> 1
    assert out.loc[-2, "n"] == 1 and out.loc[-1, "n"] == 1
    assert out.loc[0, "n"] == 2 and out.loc[1, "n"] == 1
    assert out.loc[-2, "lo"] == -50.0 and out.loc[-2, "hi"] == -25.0


@pytest.mark.usefixtures("ray_session")
def test_rollup_markers_distinguish_real_null_key():
    import ray.data

    from statefulstreamprocessor_ray.stages.analytic import rollup_aggregate

    df = pd.DataFrame(
        {
            "k1": ["a", "a", None],
            "k2": ["x", "y", "x"],
            "v": [1.0, 2.0, 4.0],
        }
    )
    out = rollup_aggregate(
        ray.data.from_pandas(df), keys=("k1", "k2"), value_col="v"
    ).to_pandas()
    # grand total row: markers (1,1), n=3
    tot = out[(out["g_k1"] == 1) & (out["g_k2"] == 1)]
    assert len(tot) == 1 and tot["n"].iloc[0] == 3
    assert tot["sum_micro"].iloc[0] == 7_000_000
    # the REAL-null k1 group appears at the subtotal level with marker 0
    sub = out[(out["g_k1"] == 0) & (out["g_k2"] == 1)]
    real_null = sub[sub["k1"].isna()]
    assert len(real_null) == 1 and real_null["n"].iloc[0] == 1
    # finest level has 3 groups: (a,x), (a,y), (None,x)
    fine = out[(out["g_k1"] == 0) & (out["g_k2"] == 0)]
    assert len(fine) == 3


@pytest.mark.usefixtures("ray_session")
def test_group_comoments_perfect_correlation_and_null_drop():
    import ray.data

    from statefulstreamprocessor_ray.stages.analytic import group_comoments

    df = pd.DataFrame(
        {
            "g": ["a"] * 4 + ["b"] * 3,
            "x": [1.0, 2.0, 3.0, None, 1.0, 2.0, 3.0],
            "y": [2.0, 4.0, 6.0, 9.0, 3.0, 2.0, 1.0],
        }
    )
    out = (
        group_comoments(
            ray.data.from_pandas(df),
            group_col="g",
            x_col="x",
            y_col="y",
            x_scale=100.0,
            y_scale=100.0,
        )
        .to_pandas()
        .set_index("g")
        .sort_index()
    )
    assert out.loc["a", "n"] == 3  # null x dropped
    assert out.loc["a", "corr"] == pytest.approx(1.0)
    assert out.loc["b", "corr"] == pytest.approx(-1.0)


@pytest.mark.usefixtures("ray_session")
def test_latest_per_key_tie_breaks_and_argmax():
    import ray.data

    from statefulstreamprocessor_ray.stages.analytic import latest_per_key

    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime([100, 200, 200, 50], unit="s"),
            "user_id": [7, 7, 7, 8],
            "value": [1.0, 2.0, 3.0, 9.0],
        }
    )
    out = (
        latest_per_key(ray.data.from_pandas(df))
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    # ts tie at 200 -> larger event_id wins
    assert out.loc[7, "event_id"] == 3 and out.loc[7, "value"] == 3.0
    assert out.loc[8, "event_id"] == 4
    assert "_shard" not in out.columns


@pytest.mark.usefixtures("ray_session")
def test_group_checksum_order_invariant_and_content_sensitive():
    import ray.data

    from statefulstreamprocessor_ray.stages.curation import group_checksum

    base = pd.DataFrame(
        {
            "source": ["a", "a", "a", "b"],
            "text": ["x", "y", "z", "w"],
        }
    )
    perm = base.iloc[[2, 0, 3, 1]].reset_index(drop=True)
    changed = base.copy()
    changed.loc[1, "text"] = "Y"

    for mode in ("sip", "md5"):
        c1 = (
            group_checksum(ray.data.from_pandas(base), hash_fn=mode)
            .to_pandas()
            .set_index("source")
            .sort_index()
        )
        c2 = (
            group_checksum(ray.data.from_pandas(perm), hash_fn=mode)
            .to_pandas()
            .set_index("source")
            .sort_index()
        )
        c3 = (
            group_checksum(ray.data.from_pandas(changed), hash_fn=mode)
            .to_pandas()
            .set_index("source")
            .sort_index()
        )
        assert (c1["checksum"] == c2["checksum"]).all(), mode  # order-free
        assert c1.loc["a", "checksum"] != c3.loc["a", "checksum"], mode
        assert c1.loc["b", "checksum"] == c3.loc["b", "checksum"], mode
        assert c1.loc["a", "n_docs"] == 3


@pytest.mark.usefixtures("ray_session")
def test_window_functions_string_keys():
    """String partition keys factorize to int codes for the kernel and ride
    back out unchanged."""
    import ray.data

    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime([100, 200, 150, 300], unit="s"),
            "user_id": ["b", "b", "a", "a"],
            "value": [1.0, 2.0, 5.0, 7.0],
        }
    )
    out = (
        window_functions(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values(["user_id", "rn"])
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == ["a", "a", "b", "b"]
    a = out[out["user_id"] == "a"]
    assert a["event_id"].tolist() == [3, 4]  # ts order within key
    assert a["cum_micro"].tolist() == [5_000_000, 12_000_000]
    b = out[out["user_id"] == "b"]
    assert np.isnan(b["prev_value"].iloc[0]) and b["prev_value"].iloc[1] == 1.0
