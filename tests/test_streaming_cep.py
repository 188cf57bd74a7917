"""Streaming CEP job: per-mode equality with the batch CEP operators across
epoch granularities, exactly-once re-run, crash/resume."""

import glob
import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from statefulstreamprocessor_ray.pipelines.streaming_cep import (
    StreamingCepConfig,
    StreamingCepJob,
)

SF_DIR = "/root/testdata/sf0.001"
DAY_S = 24 * 3600.0


def _cfg(base, **kw):
    defaults = dict(
        input_path=f"{SF_DIR}/events.parquet",
        work_dir=f"{base}/work",
        out_dir=f"{base}/out",
        n_shards=4,
        epoch_duration_s=2 * DAY_S,
    )
    defaults.update(kw)
    return StreamingCepConfig(**defaults)


def _committed(out_dir) -> pd.DataFrame:
    frames = []
    for m in sorted(glob.glob(f"{out_dir}/_manifests/*.json")):
        for part in json.load(open(m))["parts"]:
            if part["rows"]:
                frames.append(pq.read_table(part["file"]).to_pandas())
    if not frames:
        return pd.DataFrame()
    df = pd.concat(frames)
    return df.sort_values(sorted(df.columns)).reset_index(drop=True)


def _batch(mode, **kw) -> pd.DataFrame:
    import ray.data

    from statefulstreamprocessor_ray.stages.cep import detect_absence, match_sequence

    ev = ray.data.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )
    if mode == "absence":
        out = detect_absence(ev, kw["first"], kw["absent"], kw["within_s"])
    else:
        out = match_sequence(
            ev, kw["pattern"], within_s=kw.get("within_s"), contiguity=kw["contiguity"]
        )
    df = out.to_pandas()
    return df.sort_values(sorted(df.columns)).reset_index(drop=True)


CASES = [
    (
        "strict",
        dict(mode="sequence", pattern=("view", "click", "purchase"),
             contiguity="strict", within_s=48 * 3600.0),
        dict(pattern=["view", "click", "purchase"], contiguity="strict",
             within_s=48 * 3600.0),
    ),
    (
        "skip",
        dict(mode="sequence", pattern=("view", "click", "purchase"),
             contiguity="skip", within_s=48 * 3600.0),
        dict(pattern=["view", "click", "purchase"], contiguity="skip",
             within_s=48 * 3600.0),
    ),
    (
        "absence",
        dict(mode="absence", pattern=("purchase", "error"), within_s=24 * 3600.0),
        dict(first="purchase", absent="error", within_s=24 * 3600.0),
    ),
]


@pytest.mark.parametrize("name, scfg, bkw", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("epoch_days", [2.0, 9.0], ids=["fine", "coarse"])
def test_streaming_cep_matches_batch(ray_session, tmp_path, name, scfg, bkw, epoch_days):
    base = str(tmp_path / f"cep_{name}")
    cfg = _cfg(base, epoch_duration_s=epoch_days * DAY_S, **scfg)
    stats = StreamingCepJob(cfg).run()
    got = _committed(f"{base}/out")
    want = _batch(scfg["mode"], **bkw)
    assert len(got) == len(want)
    if len(want):
        pd.testing.assert_frame_equal(
            got[sorted(want.columns)].astype("int64"),
            want[sorted(want.columns)].astype("int64"),
        )
    # second run emits nothing
    stats2 = StreamingCepJob(cfg).run()
    assert stats2["rows_emitted"] == 0


@pytest.mark.parametrize("name, scfg, bkw", CASES, ids=[c[0] for c in CASES])
def test_streaming_cep_crash_resume(ray_session, tmp_path, name, scfg, bkw):
    base = str(tmp_path / f"cepcr_{name}")
    cfg = _cfg(base, **scfg)
    partial = StreamingCepJob(cfg).run(max_epochs=2)
    assert partial["epochs_processed"] == 2
    StreamingCepJob(cfg).run()
    got = _committed(f"{base}/out")
    want = _batch(scfg["mode"], **bkw)
    assert len(got) == len(want)
    if len(want):
        pd.testing.assert_frame_equal(
            got[sorted(want.columns)].astype("int64"),
            want[sorted(want.columns)].astype("int64"),
        )


from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None)
@given(
    seed=st.integers(0, 10**6),
    epoch_s=st.sampled_from([5.0, 17.0, 400.0]),
    mode_i=st.integers(0, 2),
)
def test_streaming_cep_differential(ray_session, tmp_path_factory, seed, epoch_s, mode_i):
    """Random corpora + random epoch cuts: every streaming CEP mode must equal
    its batch operator regardless of where epochs slice the stream."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from statefulstreamprocessor_ray.stages.cep import detect_absence, match_sequence

    rng = np.random.default_rng(seed)
    rows = []
    eid = 0
    for u in range(5):
        t = float(rng.integers(0, 10))
        for _ in range(int(rng.integers(5, 60))):
            t += float(rng.integers(1, 9))
            eid += 1
            rows.append((u, eid, t, str(rng.choice(["a", "b", "c", "x"]))))
    base = tmp_path_factory.mktemp(f"cepdiff{seed}_{mode_i}")
    src = str(base / "in")
    os.makedirs(src, exist_ok=True)
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([int(r[2] * 1e6) for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, f"{src}/p.parquet")

    modes = [
        (dict(mode="sequence", pattern=("a", "b"), contiguity="strict", within_s=30.0),
         lambda ds: match_sequence(ds, ["a", "b"], within_s=30.0, contiguity="strict")),
        (dict(mode="sequence", pattern=("a", "b", "c"), contiguity="skip", within_s=25.0),
         lambda ds: match_sequence(ds, ["a", "b", "c"], within_s=25.0, contiguity="skip")),
        (dict(mode="absence", pattern=("a", "b"), within_s=12.0),
         lambda ds: detect_absence(ds, "a", "b", within_s=12.0)),
    ]
    scfg, batch_fn = modes[mode_i]
    cfg = StreamingCepConfig(
        input_path=src,
        work_dir=str(base / "w"),
        out_dir=str(base / "o"),
        n_shards=2,
        epoch_duration_s=epoch_s,
        **scfg,
    )
    StreamingCepJob(cfg).run()
    got = _committed(str(base / "o"))
    ds = ray.data.read_parquet(f"{src}/p.parquet")
    want = batch_fn(ds).to_pandas()
    want = want.sort_values(sorted(want.columns)).reset_index(drop=True)
    assert len(got) == len(want)
    if len(want):
        pd.testing.assert_frame_equal(
            got[sorted(want.columns)].astype("int64"),
            want[sorted(want.columns)].astype("int64"),
        )
