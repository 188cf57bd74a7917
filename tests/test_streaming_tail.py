"""Follow-the-tail ingest (arrival-mode epochs): new input files appearing
between runs become NEW epochs — the committed prefix is never re-partitioned
or re-emitted, and the final output equals the batch join over the full
input (the simulated continuous-ingest story on top of epoch_by='arrival')."""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from statefulstreamprocessor_ray import fixtures
from statefulstreamprocessor_ray.pipelines.flagship import flagship_join
from statefulstreamprocessor_ray.pipelines.streaming import (
    StreamingJoinConfig,
    StreamingJoinJob,
)
from statefulstreamprocessor_ray.sinks.exactly_once import ExactlyOnceParquetSink

CMP_COLS = [
    "conv_id", "r_ts", "r_turn_idx", "r_text", "s_ts", "s_turn_idx", "s_text", "join_case",
]


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df[CMP_COLS].sort_values(CMP_COLS).reset_index(drop=True)


def _ts_sorted_files(tmp_path, n_files=3):
    """Corpus split into arrival-ordered files (sorted by ts, contiguous row
    ranges) so arrival epochs line up with event time."""
    tbl = fixtures.transcripts_table(n_convs=16, turns_per_conv=45, seed=23)
    df = tbl.to_pandas().sort_values(["ts", "conv_id", "turn_idx"]).reset_index(drop=True)
    input_dir = tmp_path / "input"
    input_dir.mkdir()
    n = len(df)
    paths = []
    for i in range(n_files):
        part = df.iloc[i * n // n_files : (i + 1) * n // n_files]
        p = input_dir / f"part-{i:03d}.parquet"
        import pyarrow as pa

        pq.write_table(pa.Table.from_pandas(part, preserve_index=False), str(p))
        paths.append(str(p))
    return str(input_dir), paths


def _cfg(tmp_path, input_path):
    return StreamingJoinConfig(
        input_path=input_path,
        work_dir=str(tmp_path / "work"),
        out_dir=str(tmp_path / "out"),
        n_shards=3,
        epoch_by="arrival",
        files_per_epoch=1,
        delta_time=5.0,
    )


@pytest.mark.usefixtures("ray_session")
def test_follow_the_tail_appends_epochs(tmp_path):
    import ray.data

    input_dir, paths = _ts_sorted_files(tmp_path, n_files=3)
    # hide the last file: first run sees only 2 epochs
    hidden = tmp_path / "hidden.parquet"
    os.replace(paths[2], hidden)

    cfg = _cfg(tmp_path, input_dir)
    stats1 = StreamingJoinJob(cfg).run()
    assert stats1["epochs_total"] == 2
    rows1 = ExactlyOnceParquetSink(cfg.out_dir).committed_row_count()
    part_mtime = {}
    part_dir = os.path.join(cfg.work_dir, "partitioned")
    for root, _, fs in os.walk(part_dir):
        for f in fs:
            # the marker and the frontier sidecar are (incrementally)
            # rewritten on append; the data files must not be
            if f in ("_partition_done.json", "_epoch_frontiers.json"):
                continue
            p = os.path.join(root, f)
            part_mtime[p] = os.path.getmtime(p)

    # the tail arrives; re-run with the same work/out dirs
    os.replace(hidden, paths[2])
    stats2 = StreamingJoinJob(cfg).run()
    assert stats2["epochs_total"] == 3
    assert stats2["epochs_skipped"] == 2
    assert stats2["epochs_processed"] == 1  # ONLY the new epoch
    # committed prefix untouched: every pre-existing partition file kept its
    # mtime (no re-partitioning of old epochs)
    for p, m in part_mtime.items():
        assert os.path.exists(p) and os.path.getmtime(p) == m, p

    # full-stream equality vs the batch join over all three files
    streamed = ExactlyOnceParquetSink(cfg.out_dir).read_committed().to_pandas()
    batch = flagship_join(ray.data.read_parquet(input_dir), delta_time=5.0).to_pandas()
    pd.testing.assert_frame_equal(_sorted(streamed), _sorted(batch))
    assert len(streamed) == rows1 + stats2["rows_emitted"]

    # third run: nothing new -> zero emissions (idempotent-replay proof)
    stats3 = StreamingJoinJob(cfg).run()
    assert stats3["epochs_processed"] == 0 and stats3["rows_emitted"] == 0


@pytest.mark.usefixtures("ray_session")
def test_tail_append_is_crash_idempotent(tmp_path):
    """A crash between the epoch-dir moves and the marker rewrite must NOT
    duplicate the appended rows under fresh epoch numbers on retry: epoch
    numbering derives from the marker, and the retry overwrites the
    half-moved dirs (review finding)."""
    import json

    from statefulstreamprocessor_ray.pipelines.streaming import partition_input

    input_dir, paths = _ts_sorted_files(tmp_path, n_files=3)
    hidden = tmp_path / "hidden.parquet"
    os.replace(paths[2], hidden)
    cfg = _cfg(tmp_path, input_dir)
    part_dir = partition_input(cfg)
    marker = os.path.join(part_dir, "_partition_done.json")
    with open(marker) as f:
        pre_tail_marker = f.read()

    os.replace(hidden, paths[2])
    partition_input(cfg)  # tail append completes (epoch=2 moved, marker new)
    # simulate the crash: marker rewrite "didn't happen"
    with open(marker, "w") as f:
        f.write(pre_tail_marker)
    partition_input(cfg)  # retry must overwrite epoch=2, not create epoch=3

    epochs = sorted(
        {
            int(e.split("=")[1])
            for sd in os.listdir(part_dir)
            if sd.startswith("shard=")
            for e in os.listdir(os.path.join(part_dir, sd))
            if e.startswith("epoch=")
        }
    )
    assert epochs == [0, 1, 2]  # no duplicated epoch=3

    def epoch2_rows(pdir):
        return sum(
            pq.read_table(os.path.join(pdir, sd, "epoch=2")).num_rows
            for sd in os.listdir(pdir)
            if sd.startswith("shard=")
            and os.path.isdir(os.path.join(pdir, sd, "epoch=2"))
        )

    # epoch=2 holds exactly what a FRESH full partition puts there (tagging
    # filters source rows, so compare layouts, not raw file rows)
    fresh_cfg = StreamingJoinConfig(
        input_path=input_dir,
        work_dir=str(tmp_path / "work_fresh"),
        out_dir=str(tmp_path / "out_fresh"),
        n_shards=3,
        epoch_by="arrival",
        files_per_epoch=1,
        delta_time=5.0,
    )
    fresh_dir = partition_input(fresh_cfg)
    assert epoch2_rows(part_dir) == epoch2_rows(fresh_dir) > 0
