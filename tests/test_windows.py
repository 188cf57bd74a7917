"""Tests for window assignment, session windows, the windowed interpolation
join (Flink pendant), and watermark/lateness handling."""

import numpy as np
import pyarrow as pa
import pytest

from statefulstreamprocessor_ray.stages.windows import (
    LEVEL_LABELS,
    assign_sliding,
    assign_tumbling,
    assign_session_ids,
    interpolation_join_group,
    session_windows,
    windowed_interpolation_join,
)

US = 1_000_000


def _events_table(rows):
    """rows: (key, side, ts_s, value)"""
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "stream_side": pa.array([r[1] for r in rows], pa.int8()),
            "ts": pa.array([int(r[2] * US) for r in rows], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "turn_idx": pa.array(list(range(len(rows))), pa.int32()),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_tumbling_assignment():
    import ray.data

    tbl = _events_table([("k", 0, t, 1.0) for t in (0.1, 0.9, 1.0, 1.5, 2.0)])
    out = assign_tumbling(ray.data.from_arrow(tbl), 1.0).to_pandas()
    assert list(out["window_id"]) == [0, 0, 1, 1, 2]
    assert out["window_start"].iloc[2].timestamp() == 1.0
    assert out["window_end"].iloc[2].timestamp() == 2.0


@pytest.mark.usefixtures("ray_session")
def test_sliding_assignment_counts():
    import ray.data

    tbl = _events_table([("k", 0, 10.0, 1.0), ("k", 1, 10.3, 1.0)])
    out = assign_sliding(ray.data.from_arrow(tbl), 1.0, 0.25).to_pandas()
    # size/slide = 4 windows per event
    assert len(out) == 8
    w0 = sorted(out[out.turn_idx == 0]["window_id"])
    assert w0 == [37, 38, 39, 40]  # starts 9.25..10.0, each contains t=10.0
    for _, r in out.iterrows():
        t = r["ts"].timestamp()
        assert r["window_start"].timestamp() <= t < r["window_end"].timestamp()


@pytest.mark.usefixtures("ray_session")
def test_session_windows():
    import ray.data

    rows = [("a", 0, t, 1.0) for t in (0, 1, 2, 100, 101, 300)] + [
        ("b", 0, t, 1.0) for t in (5, 500)
    ]
    ds = ray.data.from_arrow(_events_table(rows))
    summary = session_windows(ds, gap_s=30.0).to_pandas().sort_values(
        ["conv_id", "session_id"]
    )
    a = summary[summary.conv_id == "a"]
    assert list(a["n_rows"]) == [3, 2, 1]
    assert len(summary[summary.conv_id == "b"]) == 2

    tagged = assign_session_ids(ds, gap_s=30.0).to_pandas()
    assert tagged.groupby(["conv_id", "session_id"]).size().to_dict() == {
        ("a", 0): 3, ("a", 1): 2, ("a", 2): 1, ("b", 0): 1, ("b", 1): 1,
    }


def _naive_window_join(rows):
    """Literal re-statement of the Flink aggregate walk for one window:
    sort asc, walk desc carrying nearest following record per side, emit
    (asc) a pair for each position where both exist."""
    rows = sorted(rows, key=lambda r: (r[2], r[4]))
    out = []
    latest = {0: None, 1: None}
    for i in range(len(rows) - 1, -1, -1):
        latest[rows[i][1]] = rows[i]
        if latest[0] is not None and latest[1] is not None:
            l, r = latest[0], latest[1]
            res = min(abs((2 * np.pi / 60) * l[3] * r[3]), 20000.0)
            out.append((min(l[2], r[2]), res, int(res / 20000.1 * 5)))
    return out[::-1]


def test_interpolation_join_group_matches_naive():
    rows = [
        ("k", 1, 0.1, 400.0, 0),
        ("k", 0, 0.2, 30.0, 1),
        ("k", 1, 0.4, 500.0, 2),
        ("k", 0, 0.5, 60.0, 3),
        ("k", 1, 0.9, 100.0, 4),
    ]
    tbl = _events_table([r[:4] for r in rows])
    tbl = tbl.append_column("window_id", pa.array([0] * len(rows), pa.int64()))
    tbl = tbl.append_column(
        "window_start", pa.array([0] * len(rows), pa.int64()).cast(pa.timestamp("us"))
    )
    tbl = tbl.append_column(
        "window_end", pa.array([US] * len(rows), pa.int64()).cast(pa.timestamp("us"))
    )
    out = interpolation_join_group(
        tbl,
        key_col="conv_id",
        ts_col="ts",
        tie_col="turn_idx",
        left_value_col="value",
        right_value_col="value",
    )
    expected = _naive_window_join(rows)
    assert out.num_rows == len(expected)
    got_ts = [t.timestamp() for t in out["ts"].to_pylist()]
    got_res = out["result"].to_pylist()
    got_lvl = out["level"].to_pylist()
    for (ets, eres, elvl), gts, gres, glvl in zip(expected, got_ts, got_res, got_lvl):
        assert abs(gts - ets) < 1e-6
        assert abs(gres - eres) < 1e-9
        assert glvl == elvl
    assert out["level_label"].to_pylist() == [LEVEL_LABELS[l] for l in got_lvl]


@pytest.mark.usefixtures("ray_session")
def test_windowed_interpolation_join_sliding_e2e():
    import ray.data

    rng = np.random.default_rng(7)
    rows = []
    for k in ("a", "b"):
        t = 0.0
        for i in range(200):
            t += rng.random() * 0.3
            rows.append((k, int(rng.random() < 0.5), t, float(rng.integers(1, 100))))
    ds = ray.data.from_arrow(_events_table(rows))
    out = windowed_interpolation_join(
        ds, size_s=1.0, slide_s=0.25,
        left_value_col="value", right_value_col="value",
    ).to_pandas()
    assert len(out) > 0
    # every (key, window) group must match the naive walk
    win = assign_sliding(ds, 1.0, 0.25).to_pandas()
    for (k, wid), grp in win.groupby(["conv_id", "window_id"]):
        exp = _naive_window_join(
            [
                (k, int(s), ts.timestamp(), v, int(ti))
                for s, ts, v, ti in zip(
                    grp.stream_side, grp.ts, grp.value, grp.turn_idx
                )
            ]
        )
        got = out[(out.conv_id == k) & (out.window_id == wid)]
        assert len(got) == len(exp), (k, wid)


@pytest.mark.usefixtures("ray_session")
def test_watermark_tracker_and_late_split():
    import ray

    from statefulstreamprocessor_ray.state.watermark import WatermarkTracker, split_late

    wt = WatermarkTracker.remote(allowed_lateness_us=250_000)
    ray.get(wt.update.remote(0, 10 * US))
    wm = ray.get(wt.update.remote(1, 5 * US))
    assert wm == 5 * US - 250_000  # min across partitions minus lateness
    ray.get(wt.update.remote(1, 20 * US))
    assert ray.get(wt.watermark.remote()) == 10 * US - 250_000

    batch = _events_table(
        [("k", 0, 1.0, 1.0), ("k", 0, 9.9, 1.0), ("k", 0, 12.0, 1.0)]
    )
    on_time, n_late = split_late(batch, ray.get(wt.watermark.remote()))
    assert n_late == 1
    assert on_time.num_rows == 2
    ray.get(wt.add_late.remote(n_late))
    assert ray.get(wt.stats.remote())["late_rows"] == 1


@pytest.mark.usefixtures("ray_session")
def test_sliding_assignment_non_divisible():
    import ray.data

    # size 1.0s, slide 0.4s: ceil(size/slide)=3 copies max, but only windows
    # actually containing the event may be emitted
    tbl = _events_table([("k", 0, 10.0, 1.0)])
    out = assign_sliding(ray.data.from_arrow(tbl), 1.0, 0.4).to_pandas()
    for _, r in out.iterrows():
        t = r["ts"].timestamp()
        assert r["window_start"].timestamp() <= t < r["window_end"].timestamp()
    # expected windows: starts s with s <= 10.0 < s+1.0, s multiple of 0.4
    starts = sorted(round(r["window_start"].timestamp(), 3) for _, r in out.iterrows())
    expect = [round(n * 0.4, 3) for n in range(23, 26) if n * 0.4 <= 10.0 < n * 0.4 + 1.0]
    assert starts == expect
