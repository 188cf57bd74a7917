"""Streaming tumbling-window job: batch equivalence, exactly-once re-run,
crash/resume, and the watermark-gating invariant."""

import glob
import json
import os
import shutil

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest

from statefulstreamprocessor_ray.pipelines.streaming_windows import (
    StreamingWindowConfig,
    StreamingWindowJob,
)

SF_DIR = "/root/testdata/sf0.001"
HOUR_US = 3_600 * 1_000_000


def _cfg(base, **kw):
    defaults = dict(
        input_path=f"{SF_DIR}/events.parquet",
        work_dir=f"{base}/work",
        out_dir=f"{base}/out",
        n_shards=4,
        epoch_duration_s=2 * 24 * 3600.0,  # ~15 epochs over the month corpus
        window_size_s=3600.0,
        key_col="user_id",
        ts_col="ts",
        value_col="value",
    )
    defaults.update(kw)
    return StreamingWindowConfig(**defaults)


def _committed_output(out_dir) -> pd.DataFrame:
    frames = []
    for m in sorted(glob.glob(f"{out_dir}/_manifests/*.json")):
        for part in json.load(open(m))["parts"]:
            if part["rows"]:
                frames.append(pq.read_table(part["file"]).to_pandas())
    if not frames:
        return pd.DataFrame()
    df = pd.concat(frames)
    return df.sort_values(["user_id", "window_start_us"]).reset_index(drop=True)


def _batch_oracle() -> pd.DataFrame:
    con = duckdb.connect()
    df = con.execute(
        f"""
SELECT user_id, (epoch_us(ts)//3600000000)*3600000000 AS window_start_us,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value*100+0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1, 2
"""
    ).fetchdf()
    return df.sort_values(["user_id", "window_start_us"]).reset_index(drop=True)


def test_streaming_windows_match_batch_and_rerun_zero(ray_session, tmp_path):
    base = str(tmp_path / "swin")
    stats = StreamingWindowJob(_cfg(base)).run()
    assert stats["epochs_processed"] >= 3
    got = _committed_output(f"{base}/out")
    want = _batch_oracle()
    pd.testing.assert_frame_equal(
        got[["user_id", "window_start_us", "n", "sum_cents"]].astype(
            {"user_id": "int64"}
        ),
        want.astype({"user_id": "int64"}),
        check_dtype=False,
    )
    # windows emitted incrementally, not all in the final flush
    per_epoch = stats["per_epoch"]
    assert sum(e["rows"] for e in per_epoch[:-1]) > 0

    stats2 = StreamingWindowJob(_cfg(base)).run()
    assert stats2["rows_emitted"] == 0 and stats2["epochs_processed"] == 0


def test_streaming_windows_crash_resume(ray_session, tmp_path):
    base = str(tmp_path / "swin_crash")
    partial = StreamingWindowJob(_cfg(base)).run(max_epochs=2)
    assert partial["epochs_processed"] == 2
    StreamingWindowJob(_cfg(base)).run()
    got = _committed_output(f"{base}/out")
    want = _batch_oracle()
    pd.testing.assert_frame_equal(
        got[["user_id", "window_start_us", "n", "sum_cents"]].astype(
            {"user_id": "int64"}
        ),
        want.astype({"user_id": "int64"}),
        check_dtype=False,
    )


def test_watermark_gating_invariant(ray_session, tmp_path):
    """No window may be emitted before the watermark (as of the previous
    committed epoch) passed its end — except in the final flush."""
    base = str(tmp_path / "swin_gate")
    StreamingWindowJob(_cfg(base)).run()
    manifests = sorted(glob.glob(f"{base}/out/_manifests/*.json"))
    window_us = HOUR_US
    prev_wm = -(2**62)
    for i, m in enumerate(manifests):
        man = json.load(open(m))
        is_flush = i == len(manifests) - 1
        for part in man["parts"]:
            if not part["rows"] or is_flush:
                continue
            t = pq.read_table(part["file"]).to_pandas()
            assert (t["window_start_us"] + window_us <= prev_wm).all(), (
                f"epoch {man['epoch']} emitted a window past watermark {prev_wm}"
            )
        prev_wm = man["cursor"]["watermark_us"]
