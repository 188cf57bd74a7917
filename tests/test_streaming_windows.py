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
    sort_cols = ["user_id"] + [
        c for c in ("window_start_us", "session_start_us") if c in df.columns
    ]
    return df.sort_values(sort_cols).reset_index(drop=True)


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


@pytest.mark.parametrize(
    "kw, oracle_sql",
    [
        (
            dict(window_kind="sliding", window_size_s=3600.0, slide_s=900.0),
            """
SELECT user_id, (epoch_us(ts)//900000000 - t.i)*900000000 AS window_start_us,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value*100+0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM read_parquet('{sf}/events.parquet') CROSS JOIN (VALUES (0),(1),(2),(3)) AS t(i)
GROUP BY 1, 2
""",
        ),
        (
            dict(window_kind="session", gap_s=4 * 3600.0),
            """
WITH o AS (
  SELECT user_id, epoch_us(ts) AS tu, CAST(floor(value*100+0.5) AS BIGINT) AS cents,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev
  FROM read_parquet('{sf}/events.parquet')
), f AS (SELECT user_id, tu, cents,
         CASE WHEN prev IS NULL OR tu - prev > 14400000000 THEN 1 ELSE 0 END AS is_new FROM o),
g AS (SELECT user_id, tu, cents,
      SUM(is_new) OVER (PARTITION BY user_id ORDER BY tu ROWS UNBOUNDED PRECEDING) AS sid FROM f)
SELECT user_id, min(tu) AS session_start_us, max(tu) AS session_end_us,
       CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents
FROM g GROUP BY user_id, sid
""",
        ),
    ],
    ids=["sliding", "session"],
)
def test_sliding_session_crash_resume_match_oracle(ray_session, tmp_path, kw, oracle_sql):
    base = str(tmp_path / "swin_kind")
    partial = StreamingWindowJob(_cfg(base, **kw)).run(max_epochs=2)
    assert partial["epochs_processed"] == 2
    StreamingWindowJob(_cfg(base, **kw)).run()
    got = _committed_output(f"{base}/out")
    sort_cols = [c for c in got.columns if c.endswith("_us") or c == "user_id"]
    got = got.sort_values(sort_cols).reset_index(drop=True)
    want = (
        duckdb.connect()
        .execute(oracle_sql.format(sf=SF_DIR))
        .fetchdf()
        .sort_values(sort_cols)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()].astype({"user_id": "int64"}),
        want.astype({"user_id": "int64"}),
        check_dtype=False,
    )
    # second full run emits nothing
    stats2 = StreamingWindowJob(_cfg(base, **kw)).run()
    assert stats2["rows_emitted"] == 0


from hypothesis import given, settings, strategies as st


@settings(max_examples=10, deadline=None)
@given(
    seed=st.integers(0, 10**6),
    epoch_s=st.sampled_from([7.0, 13.0, 50.0, 1000.0]),
    gap_s=st.sampled_from([3.0, 10.0]),
)
def test_session_merge_differential(ray_session, tmp_path_factory, seed, epoch_s, gap_s):
    """Random corpora + random epoch slicing: streaming session output must
    equal single-pass sessionization regardless of where epochs cut."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    rows = []
    for u in range(4):
        t = float(rng.integers(0, 20))
        for _ in range(int(rng.integers(3, 40))):
            t += float(rng.integers(1, 15))
            rows.append((u, t, float(rng.integers(0, 100))))
    base = tmp_path_factory.mktemp(f"sessdiff{seed}")
    src = str(base / "in"); os.makedirs(src, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([int(r[1] * 1e6) for r in rows], pa.timestamp("us")),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            }
        ),
        f"{src}/p.parquet",
    )
    cfg = StreamingWindowConfig(
        input_path=src,
        work_dir=str(base / "w"),
        out_dir=str(base / "o"),
        n_shards=2,
        epoch_duration_s=epoch_s,
        window_kind="session",
        gap_s=gap_s,
    )
    StreamingWindowJob(cfg).run()
    got = _committed_output(str(base / "o"))

    # single-pass oracle
    import pandas as pd

    expect = []
    by_u = {}
    for u, t, v in rows:
        by_u.setdefault(u, []).append((t, v))
    for u, evs in by_u.items():
        evs.sort()
        cur = None
        for t, v in evs:
            cents = int(np.floor(v * 100 + 0.5))
            if cur is None or t - cur[1] > gap_s:
                if cur:
                    expect.append((u, *cur))
                cur = [t, t, 1, cents]
            else:
                cur[1] = t
                cur[2] += 1
                cur[3] += cents
        if cur:
            expect.append((u, *cur))
    want = pd.DataFrame(
        expect, columns=["user_id", "s", "e", "n", "sum_cents"]
    )
    want["session_start_us"] = (want.pop("s") * 1e6).astype("int64")
    want["session_end_us"] = (want.pop("e") * 1e6).astype("int64")
    want = want[["user_id", "session_start_us", "session_end_us", "n", "sum_cents"]]
    want = want.sort_values(["user_id", "session_start_us"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()].astype("int64"), want.astype("int64")
    )
