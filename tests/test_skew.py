"""FIXTURES.md F9: hot-key salting must be byte-identical to the plain plan."""

import pandas as pd
import pytest

from statefulstreamprocessor_ray import fixtures
from statefulstreamprocessor_ray.functions.streams import derive_streams
from statefulstreamprocessor_ray.stages.join import ordered_join_events


@pytest.mark.usefixtures("ray_session")
def test_salted_equals_plain_on_skewed_corpus(tmp_path):
    import ray.data

    tbl = fixtures.skewed_transcripts()  # 1 hot conv (50k turns) + 999 x 50
    path = str(tmp_path / "t")
    fixtures.write_transcripts(tbl, path, n_files=4)

    def run(hot_threshold):
        tagged = derive_streams(ray.data.read_parquet(path))
        out = ordered_join_events(
            tagged, delta_time=10.0, hot_key_threshold=hot_threshold,
            hot_chunk_rows=4000,
        ).to_pandas()
        cols = list(out.columns)
        return out.sort_values(cols).reset_index(drop=True)

    plain = run(None)
    salted = run(5000)  # only the hot conv exceeds this; chunked into ~12 parts
    assert len(plain) > 40_000
    pd.testing.assert_frame_equal(plain, salted)
    # sanity: the hot conv really went through the salted path
    assert (plain.conv_id == "hot").sum() > 40_000


@pytest.mark.usefixtures("ray_session")
def test_timecut_plan_equals_gather_and_plain(tmp_path):
    """The gather-free time-cut planner must match both the per-key-gather
    planner and the unsalted plan — including on a corpus with a long-silent
    side (the carry threshold then reaches far back: NEG-prefix path)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from statefulstreamprocessor_ray.stages.join import salted_hot_key_join

    rng = np.random.default_rng(17)
    n = 30_000
    ts = np.sort(rng.integers(0, 10**9, size=n)) * 1000
    side = rng.integers(0, 2, size=n).astype(np.int8)
    # silence side 1 for the middle third: its last record goes stale, so
    # time-cut warm-ups must duplicate it across several chunk boundaries
    third = slice(n // 3, 2 * n // 3)
    side[third] = 0
    tbl = pa.table(
        {
            "conv_id": pa.array(["hot"] * n),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "turn_idx": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array([f"t{i}" for i in range(n)]),
            "stream_side": pa.array(side),
        }
    )
    ds = ray.data.from_arrow(tbl)

    def run(plan):
        out = salted_hot_key_join(
            ds, "conv_id", "ts", "turn_idx", ("turn_idx", "text"),
            delta_us=50_000_000_000, chunk_rows=2_500, plan=plan,
        ).to_pandas()
        return out.sort_values(list(out.columns)).reset_index(drop=True)

    timecut, gather = run("timecut"), run("gather")
    assert len(timecut) > 10_000
    pd.testing.assert_frame_equal(timecut, gather)
