"""Arrival-mode streaming: watermark-gated late-data drops (FIXTURES.md F12)
and per-stream order enforcement."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from statefulstreamprocessor_ray import fixtures
from statefulstreamprocessor_ray.pipelines.flagship import flagship_join
from statefulstreamprocessor_ray.pipelines.streaming import (
    StreamingJoinConfig,
    StreamingJoinJob,
)
from statefulstreamprocessor_ray.sinks.exactly_once import ExactlyOnceParquetSink

CMP = ["conv_id", "r_ts", "r_turn_idx", "r_text", "s_ts", "s_turn_idx", "s_text", "join_case"]


def _write_files(tmp_path, tables):
    path = str(tmp_path / "input")
    os.makedirs(path)
    for i, t in enumerate(tables):
        pq.write_table(t, os.path.join(path, f"f-{i:03d}.parquet"))
    return path


def _cfg(tmp_path, input_path, tag, lateness=0.0):
    return StreamingJoinConfig(
        input_path=input_path,
        work_dir=str(tmp_path / f"w_{tag}"),
        out_dir=str(tmp_path / f"o_{tag}"),
        n_shards=2,
        delta_time=5.0,
        epoch_by="arrival",
        allowed_lateness_s=lateness,
    )


@pytest.mark.usefixtures("ray_session")
def test_arrival_mode_in_order_matches_batch(tmp_path):
    import ray.data

    tbl = fixtures.transcripts_table(n_convs=12, turns_per_conv=40, seed=5)
    tbl = tbl.sort_by([("ts", "ascending"), ("conv_id", "ascending")])
    third = tbl.num_rows // 3
    path = _write_files(
        tmp_path, [tbl.slice(0, third), tbl.slice(third, third), tbl.slice(2 * third)]
    )
    # globally ts-ordered files: arrival order == event-time order
    cfg = _cfg(tmp_path, path, "inorder")
    stats = StreamingJoinJob(cfg).run()
    assert stats["late_rows"] == 0 and stats["order_violations"] == 0
    streamed = ExactlyOnceParquetSink(cfg.out_dir).read_committed().to_pandas()
    batch = flagship_join(ray.data.read_parquet(path), delta_time=5.0).to_pandas()
    a = streamed[CMP].sort_values(CMP).reset_index(drop=True)
    b = batch[CMP].sort_values(CMP).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.usefixtures("ray_session")
def test_arrival_mode_late_rows_dropped_and_counted(tmp_path):
    tbl = fixtures.transcripts_table(n_convs=6, turns_per_conv=50, seed=9)
    # file 0: everything except one conv's early rows; file 1: those early rows
    # arrive LATE (their event time is far behind the watermark by then)
    df = tbl.to_pandas()
    late_mask = (df.conv_id == "conv00000000") & (df.turn_idx < 20)
    on_time = pa.Table.from_pandas(df[~late_mask], preserve_index=False)
    late = pa.Table.from_pandas(df[late_mask], preserve_index=False)
    path = _write_files(tmp_path, [on_time, late])

    cfg = _cfg(tmp_path, path, "late", lateness=0.0)
    stats = StreamingJoinJob(cfg).run()
    # the late file's joinable rows are behind the watermark -> dropped+counted
    assert stats["late_rows"] + stats["order_violations"] > 0
    assert stats["epochs_processed"] == 2
    # exactly-once still holds
    stats2 = StreamingJoinJob(cfg).run()
    assert stats2["rows_emitted"] == 0 and stats2["epochs_processed"] == 0

    # with generous lateness the same rows are NOT watermark-dropped; any drop
    # is then an order violation (per-stream precondition)
    cfg2 = _cfg(tmp_path, path, "allow", lateness=10_000.0)
    stats3 = StreamingJoinJob(cfg2).run()
    assert stats3["late_rows"] == 0
    assert stats3["order_violations"] > 0


@pytest.mark.usefixtures("ray_session")
def test_arrival_mode_crash_resume_with_pipelined_watermarks(tmp_path):
    """The precomputed watermark schedule (footer-stats frontiers) must
    survive a crash/resume: run 1 epoch, stop, resume — output and drop
    counters equal the uninterrupted run, and the resumed run's schedule
    agrees with the sequential consistency check."""
    tbl = fixtures.transcripts_table(n_convs=10, turns_per_conv=40, seed=13)
    df = tbl.to_pandas()
    late_mask = (df.conv_id == "conv00000000") & (df.turn_idx < 10)
    on_time = df[~late_mask].sort_values("ts")
    late = df[late_mask]
    third = len(on_time) // 2
    path = _write_files(
        tmp_path,
        [
            pa.Table.from_pandas(on_time.iloc[:third], preserve_index=False),
            pa.Table.from_pandas(on_time.iloc[third:], preserve_index=False),
            pa.Table.from_pandas(late, preserve_index=False),
        ],
    )
    cfg_a = _cfg(tmp_path, path, "resume")
    j = StreamingJoinJob(cfg_a)
    s1 = j.run(max_epochs=1)
    assert s1["epochs_processed"] == 1
    s2 = StreamingJoinJob(cfg_a).run()  # resume the remaining epochs
    assert s2["epochs_processed"] == 2

    cfg_b = _cfg(tmp_path, path, "oneshot")
    s_full = StreamingJoinJob(cfg_b).run()
    a = ExactlyOnceParquetSink(cfg_a.out_dir).read_committed().to_pandas()
    b = ExactlyOnceParquetSink(cfg_b.out_dir).read_committed().to_pandas()
    pd.testing.assert_frame_equal(
        a[CMP].sort_values(CMP).reset_index(drop=True),
        b[CMP].sort_values(CMP).reset_index(drop=True),
    )
    assert s1["late_rows"] + s2["late_rows"] == s_full["late_rows"]
    assert (
        s1["order_violations"] + s2["order_violations"]
        == s_full["order_violations"]
    )
