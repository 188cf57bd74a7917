"""Streaming epoch runner: exactly-once sink, checkpoint/resume,
batch-vs-streaming equivalence (FIXTURES.md F11)."""

import os

import pandas as pd
import pytest

from statefulstreamprocessor_ray import fixtures
from statefulstreamprocessor_ray.pipelines.flagship import flagship_join
from statefulstreamprocessor_ray.pipelines.streaming import (
    StreamingJoinConfig,
    StreamingJoinJob,
    partition_input,
)
from statefulstreamprocessor_ray.sinks.exactly_once import ExactlyOnceParquetSink

CMP_COLS = ["conv_id", "r_ts", "r_turn_idx", "r_text", "s_ts", "s_turn_idx", "s_text", "join_case"]


def _corpus(tmp_path, n_convs=30, turns=60):
    tbl = fixtures.transcripts_table(n_convs=n_convs, turns_per_conv=turns, seed=11)
    path = str(tmp_path / "input")
    fixtures.write_transcripts(tbl, path, n_files=3)
    return path


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df[CMP_COLS].sort_values(CMP_COLS).reset_index(drop=True)


def _cfg(tmp_path, input_path, tag):
    return StreamingJoinConfig(
        input_path=input_path,
        work_dir=str(tmp_path / f"work_{tag}"),
        out_dir=str(tmp_path / f"out_{tag}"),
        n_shards=3,
        epoch_duration_s=20.0,
        delta_time=5.0,
    )


@pytest.mark.usefixtures("ray_session")
def test_streaming_matches_batch(tmp_path):
    import ray.data

    input_path = _corpus(tmp_path)
    cfg = _cfg(tmp_path, input_path, "a")
    stats = StreamingJoinJob(cfg).run()
    assert stats["epochs_processed"] == stats["epochs_total"] > 1
    assert stats["rows_emitted"] > 0

    streamed = ExactlyOnceParquetSink(cfg.out_dir).read_committed().to_pandas()
    batch = flagship_join(
        ray.data.read_parquet(input_path), delta_time=5.0
    ).to_pandas()
    pd.testing.assert_frame_equal(_sorted(streamed), _sorted(batch))
    # watermark advanced to the corpus frontier
    assert stats["watermark_us"] > 0


@pytest.mark.usefixtures("ray_session")
def test_second_run_emits_zero_rows(tmp_path):
    input_path = _corpus(tmp_path, n_convs=10, turns=40)
    cfg = _cfg(tmp_path, input_path, "b")
    stats1 = StreamingJoinJob(cfg).run()
    rows1 = ExactlyOnceParquetSink(cfg.out_dir).committed_row_count()
    assert rows1 == stats1["rows_emitted"] > 0

    # The reference's idempotent-replay proof: round 2 consumes/join nothing.
    stats2 = StreamingJoinJob(cfg).run()
    assert stats2["epochs_processed"] == 0
    assert stats2["rows_emitted"] == 0
    assert ExactlyOnceParquetSink(cfg.out_dir).committed_row_count() == rows1


@pytest.mark.usefixtures("ray_session")
def test_crash_resume_equals_uninterrupted(tmp_path):
    input_path = _corpus(tmp_path, n_convs=20, turns=60)

    cfg_crash = _cfg(tmp_path, input_path, "crash")
    partial = StreamingJoinJob(cfg_crash).run(max_epochs=2)
    assert 0 < partial["epochs_processed"] <= 2
    n_committed = len(ExactlyOnceParquetSink(cfg_crash.out_dir).committed_epochs())
    assert n_committed == partial["epochs_processed"]

    resumed = StreamingJoinJob(cfg_crash).run()
    assert resumed["epochs_skipped"] == n_committed

    cfg_clean = _cfg(tmp_path, input_path, "clean")
    StreamingJoinJob(cfg_clean).run()

    a = ExactlyOnceParquetSink(cfg_crash.out_dir).read_committed().to_pandas()
    b = ExactlyOnceParquetSink(cfg_clean.out_dir).read_committed().to_pandas()
    pd.testing.assert_frame_equal(_sorted(a), _sorted(b))


@pytest.mark.usefixtures("ray_session")
def test_partition_step_resumable(tmp_path):
    input_path = _corpus(tmp_path, n_convs=5, turns=20)
    cfg = _cfg(tmp_path, input_path, "p")
    d1 = partition_input(cfg)
    marker = os.path.join(d1, "_partition_done.json")
    mtime = os.path.getmtime(marker)
    d2 = partition_input(cfg)  # should skip: marker fingerprint matches
    assert d1 == d2
    assert os.path.getmtime(marker) == mtime


@pytest.mark.usefixtures("ray_session")
def test_manifest_lineage(tmp_path):
    input_path = _corpus(tmp_path, n_convs=6, turns=30)
    cfg = _cfg(tmp_path, input_path, "l")
    StreamingJoinJob(cfg).run()
    sink = ExactlyOnceParquetSink(cfg.out_dir)
    for e in sink.committed_epochs():
        m = sink.manifest(e)
        assert len(m["parts"]) == cfg.n_shards
        assert {p["shard"] for p in m["parts"]} == set(range(cfg.n_shards))
        assert m["cursor"]["epoch"] == e
        assert "watermark_us" in m["cursor"]


@pytest.mark.usefixtures("ray_session")
def test_crash_between_staging_and_commit(tmp_path):
    """The acknowledged crash window: part files staged for an epoch whose
    manifest never committed (including corrupt partial files) must be
    invisible to readers and harmlessly overwritten on resume."""
    import json

    input_path = _corpus(tmp_path)
    cfg = _cfg(tmp_path, input_path, "stagecrash")
    partial = StreamingJoinJob(cfg).run(max_epochs=2)
    sink = ExactlyOnceParquetSink(cfg.out_dir)
    committed_before = sink.committed_epochs()
    assert len(committed_before) == 2

    # simulate a crash mid-staging of the NEXT epoch: a stale valid part and
    # a corrupt half-written part land in staging with no manifest
    part_dir = partition_input(cfg)
    next_epoch = committed_before[-1] + 1
    d = sink.stage_dir(next_epoch)
    with open(os.path.join(d, "part-shard0000.parquet"), "wb") as f:
        f.write(b"NOT A PARQUET FILE")  # corrupt
    with open(os.path.join(d, "part-zombie.parquet"), "wb") as f:
        f.write(b"\x00" * 128)

    # staged-but-uncommitted data is invisible
    assert sink.committed_row_count() == partial["rows_emitted"]

    resumed = StreamingJoinJob(cfg).run()
    clean = _cfg(tmp_path, input_path, "stagecrash_clean")
    StreamingJoinJob(clean).run()
    a = ExactlyOnceParquetSink(cfg.out_dir).read_committed().to_pandas()
    b = ExactlyOnceParquetSink(clean.out_dir).read_committed().to_pandas()
    pd.testing.assert_frame_equal(_sorted(a), _sorted(b))

    # the zombie file is not referenced by any manifest
    all_files = {
        p["file"]
        for e in ExactlyOnceParquetSink(cfg.out_dir).committed_epochs()
        for p in ExactlyOnceParquetSink(cfg.out_dir).manifest(e)["parts"]
    }
    assert not any("zombie" in f for f in all_files)


@pytest.mark.usefixtures("ray_session")
def test_streaming_join_fn_matches_batch(tmp_path):
    """The reference's join_function hook in the STREAMING loop
    (ts_join_with_kafka_eos.py:86-106): a custom batch projection applied per
    epoch must equal the batch path with the same JoinSpec.join_fn."""
    import ray.data

    from statefulstreamprocessor_ray.functions.ops import power_join_projection
    from statefulstreamprocessor_ray.stages.join import JoinSpec, ordered_join

    input_path = _corpus(tmp_path)

    def proj(b):
        return power_join_projection(b, left_col="r_text", right_col="s_text")

    # texts aren't numeric: project on turn_idx instead (any numeric payload)
    def proj_idx(b):
        return power_join_projection(b, left_col="r_turn_idx", right_col="s_turn_idx")

    cfg = _cfg(tmp_path, input_path, "joinfn")
    cfg.join_fn = proj_idx
    StreamingJoinJob(cfg).run()
    got = (
        ExactlyOnceParquetSink(cfg.out_dir).read_committed().to_pandas()
    )

    batch = ordered_join(
        ray.data.read_parquet(input_path),
        delta_time=cfg.delta_time,
        join_spec=JoinSpec(join_fn=proj_idx),
    ).to_pandas()

    cols = sorted(set(got.columns) & set(batch.columns))
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = batch[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
