"""Streaming safety guards: lost-checkpoint resume abort, carry-cap eviction."""

import shutil

import pytest

from statefulstreamprocessor_ray import fixtures
from statefulstreamprocessor_ray.pipelines.streaming import (
    StreamingJoinConfig,
    StreamingJoinJob,
)


def _corpus(tmp_path):
    tbl = fixtures.transcripts_table(n_convs=8, turns_per_conv=40, seed=2)
    path = str(tmp_path / "input")
    fixtures.write_transcripts(tbl, path, n_files=2)
    return path


@pytest.mark.usefixtures("ray_session")
def test_resume_with_lost_checkpoints_aborts(tmp_path):
    path = _corpus(tmp_path)
    cfg = StreamingJoinConfig(
        input_path=path, work_dir=str(tmp_path / "w"), out_dir=str(tmp_path / "o"),
        n_shards=2, epoch_duration_s=20.0, delta_time=5.0,
    )
    StreamingJoinJob(cfg).run(max_epochs=1)
    shutil.rmtree(str(tmp_path / "w" / "checkpoints"))
    with pytest.raises(RuntimeError, match="resume aborted"):
        StreamingJoinJob(cfg).run()


@pytest.mark.usefixtures("ray_session")
def test_carry_cap_evicts_and_counts(tmp_path):
    # one-sided stream: only assistant turns -> carry grows unbounded unless capped
    import pyarrow as pa

    seq = [(0, 1_600_000_000.0 + i) for i in range(400)]  # all left
    tbl = fixtures._cols_to_table(fixtures.sequence_to_transcripts(seq))
    path = str(tmp_path / "input")
    fixtures.write_transcripts(tbl, path, n_files=1)
    cfg = StreamingJoinConfig(
        input_path=path, work_dir=str(tmp_path / "w"), out_dir=str(tmp_path / "o"),
        n_shards=1, epoch_duration_s=50.0, delta_time=5.0,
        max_carry_rows_per_shard=100,
    )
    stats = StreamingJoinJob(cfg).run()
    assert stats["rows_emitted"] == 0  # nothing to join against
    # eviction kept the carry bounded
    import json, os

    manifests = sorted(os.listdir(str(tmp_path / "o" / "_manifests")))
    last = json.load(open(str(tmp_path / "o" / "_manifests" / manifests[-1])))
    assert all(p["n_carry_rows"] <= 100 for p in last["parts"])
