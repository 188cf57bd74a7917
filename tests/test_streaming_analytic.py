"""StreamingWindowFnJob — exactly-once per-key window functions over
arrival epochs. The SQL oracle parity (union of epochs == batch window over
the total arrival order) is covered by the sweep; these pin the streaming
invariants: cross-epoch seeding of every output column, crash/resume
equality, second-run-zero, and tail appends."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from statefulstreamprocessor_ray.pipelines.streaming_analytic import (
    StreamingWindowFnConfig,
    StreamingWindowFnJob,
)
from statefulstreamprocessor_ray.sinks.exactly_once import ExactlyOnceParquetSink


def _write_epochs(base: str, frames: list[pd.DataFrame]) -> str:
    inp = os.path.join(base, "input")
    os.makedirs(inp)
    for i, df in enumerate(frames):
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(inp, f"part-{i:03d}.parquet"))
    return inp


def _cfg(base: str, **kw) -> StreamingWindowFnConfig:
    return StreamingWindowFnConfig(
        input_path=os.path.join(base, "input"),
        work_dir=os.path.join(base, "work"),
        out_dir=os.path.join(base, "out"),
        n_shards=2,
        **kw,
    )


def _events(ids, uids, ts_s, vals):
    return pd.DataFrame(
        {
            "event_id": np.array(ids, np.int64),
            "ts": pd.to_datetime(np.array(ts_s, np.int64), unit="s"),
            "user_id": np.array(uids, np.int64),
            "value": np.array(vals, np.float64),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_cross_epoch_seeding_all_columns(tmp_path):
    """One user, rows split 2|2 across epochs: epoch-1 rows must see the
    epoch-0 tail in every column (rn continues, lag/delta seeded, running
    sum carries, rolling window spans the boundary)."""
    base = str(tmp_path / "seed")
    _write_epochs(
        base,
        [
            _events([1, 2], [7, 7], [100, 200], [1.0, 2.0]),
            _events([3, 4], [7, 7], [300, 400], [4.0, 8.0]),
        ],
    )
    StreamingWindowFnJob(_cfg(base)).run()
    out = (
        ExactlyOnceParquetSink(os.path.join(base, "out"))
        .read_committed()
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(out["rn"]) == [1, 2, 3, 4]
    assert np.isnan(out.loc[0, "prev_value"])
    assert list(out["prev_value"])[1:] == [1.0, 2.0, 4.0]
    assert np.isnan(out.loc[0, "delta_us"])
    assert list(out["delta_us"])[1:] == [100e6, 100e6, 100e6]
    assert list(out["cum_micro"]) == [1_000_000, 3_000_000, 7_000_000, 15_000_000]
    # roll4 at row 4 spans the epoch boundary: 1+2+4+8
    assert list(out["roll4_micro"]) == [
        1_000_000,
        3_000_000,
        7_000_000,
        15_000_000,
    ]
    # row 5 would drop the first value; add a tail epoch and check
    pq.write_table(
        pa.Table.from_pandas(
            _events([5], [7], [500], [16.0]), preserve_index=False
        ),
        os.path.join(base, "input", "part-002.parquet"),
    )
    stats = StreamingWindowFnJob(_cfg(base)).run()
    assert stats["rows_emitted"] == 1  # tail epoch only
    out2 = (
        ExactlyOnceParquetSink(os.path.join(base, "out"))
        .read_committed()
        .to_pandas()
        .sort_values("event_id")
    )
    last = out2[out2["event_id"] == 5].iloc[0]
    assert last["rn"] == 5
    assert last["roll4_micro"] == (2 + 4 + 8 + 16) * 1_000_000  # 1 dropped
    assert last["cum_micro"] == 31_000_000


@pytest.mark.usefixtures("ray_session")
def test_crash_resume_equals_uninterrupted_and_second_run_zero(tmp_path):
    rng = np.random.default_rng(7)
    n = 300
    df = _events(
        np.arange(n),
        rng.integers(0, 9, n),
        rng.integers(0, 10_000, n),
        rng.random(n) * 100,
    )
    frames = [df.iloc[:100], df.iloc[100:200], df.iloc[200:]]

    base_a = str(tmp_path / "uninterrupted")
    _write_epochs(base_a, frames)
    StreamingWindowFnJob(_cfg(base_a)).run()
    full = (
        ExactlyOnceParquetSink(os.path.join(base_a, "out"))
        .read_committed()
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    base_b = str(tmp_path / "resumed")
    _write_epochs(base_b, frames)
    StreamingWindowFnJob(_cfg(base_b)).run(max_epochs=1)  # "crash" after epoch 0
    stats = StreamingWindowFnJob(_cfg(base_b)).run()  # resume
    assert stats["epochs_skipped"] == 1
    resumed = (
        ExactlyOnceParquetSink(os.path.join(base_b, "out"))
        .read_committed()
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(full, resumed)

    stats3 = StreamingWindowFnJob(_cfg(base_b)).run()
    assert stats3["rows_emitted"] == 0  # exactly-once


@pytest.mark.usefixtures("ray_session")
def test_scheme_mismatch_aborts_resume(tmp_path):
    import pickle

    base = str(tmp_path / "drift")
    _write_epochs(
        base,
        [
            _events([1], [1], [100], [1.0]),
            _events([2], [1], [200], [2.0]),
        ],
    )
    cfg = _cfg(base)
    StreamingWindowFnJob(cfg).run(max_epochs=1)
    # corrupt the checkpoint scheme tags (simulates a pandas upgrade)
    ckpt_dir = os.path.join(cfg.work_dir, "checkpoints")
    for f in os.listdir(ckpt_dir):
        p = os.path.join(ckpt_dir, f)
        with open(p, "rb") as fh:
            snap = pickle.load(fh)
        snap["scheme"] = "hash_array-pd0.0.0"
        with open(p, "wb") as fh:
            pickle.dump(snap, fh)
    with pytest.raises(RuntimeError, match="resume aborted"):
        StreamingWindowFnJob(cfg).run()


def _full_events(ids, uids, ts_s, etypes, vals):
    return pd.DataFrame(
        {
            "event_id": np.array(ids, np.int64),
            "ts": pd.to_datetime(np.array(ts_s, np.int64), unit="s"),
            "user_id": np.array(uids, np.int64),
            "event_type": etypes,
            "value": np.array(vals, np.float64),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_compaction_supersede_and_stale_epoch(tmp_path):
    """Epoch 1 touches key 7 with an OLDER ts: the emitted 'current' row
    must still be epoch 0's newer row. A genuinely newer row supersedes."""
    from statefulstreamprocessor_ray.pipelines.streaming_analytic import (
        StreamingCompactionJob,
    )

    base = str(tmp_path / "cdc")
    _write_epochs(
        base,
        [
            _full_events([1, 2], [7, 8], [500, 100], ["a", "b"], [1.0, 2.0]),
            # key 7: stale (ts 300 < 500); key 8: newer (ts 200 > 100)
            _full_events([3, 4], [7, 8], [300, 200], ["c", "d"], [3.0, 4.0]),
        ],
    )
    StreamingCompactionJob(_cfg(base)).run()
    out = (
        ExactlyOnceParquetSink(os.path.join(base, "out"))
        .read_committed()
        .to_pandas()
        .sort_values(["epoch", "user_id"])
        .reset_index(drop=True)
    )
    e1 = out[out["epoch"] == 1].set_index("user_id")
    assert e1.loc[7, "event_id"] == 1  # stale update did NOT supersede
    assert e1.loc[7, "event_type"] == "a"
    assert e1.loc[8, "event_id"] == 4  # newer update DID
    assert e1.loc[8, "value"] == 4.0


@pytest.mark.usefixtures("ray_session")
def test_compaction_crash_resume_and_tail(tmp_path):
    from statefulstreamprocessor_ray.pipelines.streaming_analytic import (
        StreamingCompactionJob,
    )

    rng = np.random.default_rng(11)
    n = 200
    df = _full_events(
        np.arange(n),
        rng.integers(0, 7, n),
        rng.integers(0, 5_000, n),
        [f"t{i % 3}" for i in range(n)],
        rng.random(n) * 10,
    )
    frames = [df.iloc[:70], df.iloc[70:140], df.iloc[140:]]

    base_a = str(tmp_path / "full")
    _write_epochs(base_a, frames)
    StreamingCompactionJob(_cfg(base_a)).run()
    full = (
        ExactlyOnceParquetSink(os.path.join(base_a, "out"))
        .read_committed()
        .to_pandas()
        .sort_values(["epoch", "user_id"])
        .reset_index(drop=True)
    )

    base_b = str(tmp_path / "resumed")
    _write_epochs(base_b, frames)
    StreamingCompactionJob(_cfg(base_b)).run(max_epochs=2)
    stats = StreamingCompactionJob(_cfg(base_b)).run()
    assert stats["epochs_skipped"] == 2
    resumed = (
        ExactlyOnceParquetSink(os.path.join(base_b, "out"))
        .read_committed()
        .to_pandas()
        .sort_values(["epoch", "user_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(full, resumed)
    assert StreamingCompactionJob(_cfg(base_b)).run()["rows_emitted"] == 0

    # tail: a 4th epoch emits only its touched keys' current rows
    extra = _full_events([999], [3], [9_999], ["z"], [42.0])
    pq.write_table(
        pa.Table.from_pandas(extra, preserve_index=False),
        os.path.join(base_b, "input", "part-003.parquet"),
    )
    stats = StreamingCompactionJob(_cfg(base_b)).run()
    assert stats["rows_emitted"] == 1
