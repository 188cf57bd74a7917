"""Streaming distinct-count: cross-epoch sketch state with exactly-once
per-epoch snapshots, resume, tail appends, and dense (HLL) promotion."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from statefulstreamprocessor_ray.pipelines.streaming_sketch import (
    StreamingDistinctConfig,
    StreamingDistinctJob,
)
from statefulstreamprocessor_ray.sinks.exactly_once import ExactlyOnceParquetSink


def _write_epoch_files(tmp_path, epochs):
    """epochs: list of list[(group, value)] — one file per epoch."""
    inp = tmp_path / "input"
    inp.mkdir(exist_ok=True)
    for i, rows in enumerate(epochs):
        tbl = pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "user_id": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        pq.write_table(tbl, str(inp / f"f-{i:03d}.parquet"))
    return str(inp)


def _cfg(tmp_path, inp, **kw):
    return StreamingDistinctConfig(
        input_path=inp,
        work_dir=str(tmp_path / "work"),
        out_dir=str(tmp_path / "out"),
        n_shards=3,
        **kw,
    )


def _read_out(out_dir) -> pd.DataFrame:
    return (
        ExactlyOnceParquetSink(str(out_dir))
        .read_committed()
        .to_pandas()
        .sort_values(["epoch", "event_type"])
        .reset_index(drop=True)
    )


def _prefix_nunique(epochs):
    """Expected snapshots: per epoch e, per group, distinct values over
    epochs 0..e."""
    rows = []
    for e in range(len(epochs)):
        flat = [r for ep in epochs[: e + 1] for r in ep]
        df = pd.DataFrame(flat, columns=["g", "v"])
        for g, n in df.groupby("g")["v"].nunique().items():
            rows.append((e, g, int(n)))
    return (
        pd.DataFrame(rows, columns=["epoch", "event_type", "n_distinct"])
        .sort_values(["epoch", "event_type"])
        .reset_index(drop=True)
    )


EPOCHS = [
    [("a", "u1"), ("a", "u2"), ("b", "u1")],
    [("a", "u2"), ("a", "u3"), ("b", "u9")],  # u2 repeats: no growth for it
    [("c", "u1"), ("a", "u1")],  # new group in epoch 2; a all-repeats
]


@pytest.mark.usefixtures("ray_session")
def test_snapshots_equal_prefix_distinct(tmp_path):
    inp = _write_epoch_files(tmp_path, EPOCHS)
    stats = StreamingDistinctJob(_cfg(tmp_path, inp)).run()
    assert stats["epochs_processed"] == 3
    got = _read_out(tmp_path / "out")
    pd.testing.assert_frame_equal(
        got.astype({"epoch": "int64", "n_distinct": "int64"}),
        _prefix_nunique(EPOCHS),
    )


@pytest.mark.usefixtures("ray_session")
def test_second_run_emits_zero(tmp_path):
    inp = _write_epoch_files(tmp_path, EPOCHS)
    StreamingDistinctJob(_cfg(tmp_path, inp)).run()
    stats2 = StreamingDistinctJob(_cfg(tmp_path, inp)).run()
    assert stats2["rows_emitted"] == 0 and stats2["epochs_processed"] == 0


@pytest.mark.usefixtures("ray_session")
def test_crash_resume_equals_uninterrupted(tmp_path):
    inp = _write_epoch_files(tmp_path, EPOCHS)
    StreamingDistinctJob(_cfg(tmp_path, inp)).run(max_epochs=1)  # "crash" after 1
    StreamingDistinctJob(_cfg(tmp_path, inp)).run()  # resume
    got = _read_out(tmp_path / "out")
    pd.testing.assert_frame_equal(
        got.astype({"epoch": "int64", "n_distinct": "int64"}),
        _prefix_nunique(EPOCHS),
    )


@pytest.mark.usefixtures("ray_session")
def test_tail_append_emits_only_new_epochs(tmp_path):
    inp = _write_epoch_files(tmp_path, EPOCHS[:2])
    StreamingDistinctJob(_cfg(tmp_path, inp)).run()
    # append a file -> one new epoch; only its snapshot is emitted
    _write_epoch_files(tmp_path, EPOCHS)  # rewrites 0,1 identically, adds 2
    stats = StreamingDistinctJob(_cfg(tmp_path, inp)).run()
    assert stats["epochs_processed"] == 1
    got = _read_out(tmp_path / "out")
    pd.testing.assert_frame_equal(
        got.astype({"epoch": "int64", "n_distinct": "int64"}),
        _prefix_nunique(EPOCHS),
    )


@pytest.mark.usefixtures("ray_session")
def test_dense_promotion_estimate_and_resume(tmp_path):
    """A group crossing sparse_limit promotes to HLL registers mid-stream:
    the estimate stays within ~3x the theoretical RSE, state stops growing,
    and crash/resume across the promotion epoch reproduces the same
    snapshots (registers ride the checkpoint)."""
    rng = np.random.default_rng(11)
    epochs = [
        [("big", f"u{v}") for v in rng.integers(0, 30_000, 20_000)] + [("s", "x")]
        for _ in range(3)
    ]
    inp = _write_epoch_files(tmp_path, epochs)
    cfg = _cfg(tmp_path, inp, sparse_limit=500, precision=12)
    StreamingDistinctJob(cfg).run()
    got = _read_out(tmp_path / "out")
    want = _prefix_nunique(epochs)
    rse = 1.04 / np.sqrt(2**12)
    for (_, g), (_, w) in zip(got.iterrows(), want.iterrows()):
        assert g["event_type"] == w["event_type"] and g["epoch"] == w["epoch"]
        if w["event_type"] == "s":
            assert int(g["n_distinct"]) == int(w["n_distinct"])  # sparse: exact
        else:
            err = abs(int(g["n_distinct"]) - int(w["n_distinct"])) / int(w["n_distinct"])
            assert err < 3 * rse, (w["epoch"], int(g["n_distinct"]), int(w["n_distinct"]))

    # resume across the promotion: wipe output+checkpoints? No — crash AFTER
    # epoch 0 (promotion already happened inside epoch 0), fresh work dir
    import shutil

    shutil.rmtree(tmp_path / "out")
    shutil.rmtree(tmp_path / "work")
    StreamingDistinctJob(cfg).run(max_epochs=1)
    StreamingDistinctJob(cfg).run()
    got2 = _read_out(tmp_path / "out")
    pd.testing.assert_frame_equal(got, got2)


def _write_doc_files(tmp_path, epochs):
    """epochs: list of list[str] texts — one file per epoch."""
    inp = tmp_path / "dinput"
    inp.mkdir(exist_ok=True)
    for i, texts in enumerate(epochs):
        pq.write_table(
            pa.table({"text": pa.array(texts, pa.string())}),
            str(inp / f"f-{i:03d}.parquet"),
        )
    return str(inp)


def _topk_cfg(tmp_path, inp, **kw):
    from statefulstreamprocessor_ray.pipelines.streaming_sketch import (
        StreamingTopKConfig,
    )

    return StreamingTopKConfig(
        input_path=inp,
        work_dir=str(tmp_path / "twork"),
        out_dir=str(tmp_path / "tout"),
        n_shards=3,
        **kw,
    )


def _prefix_topk(epochs, k):
    rows = []
    for e in range(len(epochs)):
        toks = [
            t
            for texts in epochs[: e + 1]
            for s in texts
            for t in s.lower().split()
            if t
        ]
        vc = pd.Series(toks).value_counts()
        frame = vc.reset_index()
        frame.columns = ["item", "n"]
        frame = frame.sort_values(["n", "item"], ascending=[False, True])
        for _, r in frame.head(k).iterrows():
            rows.append((e, r["item"], int(r["n"]), 0))
    return (
        pd.DataFrame(rows, columns=["epoch", "item", "n", "err_bound"])
        .sort_values(["epoch", "n", "item"], ascending=[True, False, True])
        .reset_index(drop=True)
    )


DOC_EPOCHS = [
    ["a b a c", "b b d"],
    ["c c c e", "a"],
    ["f f f f f"],
]


@pytest.mark.usefixtures("ray_session")
def test_topk_snapshots_equal_prefix_topk(tmp_path):
    from statefulstreamprocessor_ray.pipelines.streaming_sketch import (
        StreamingTopKJob,
    )

    inp = _write_doc_files(tmp_path, DOC_EPOCHS)
    stats = StreamingTopKJob(_topk_cfg(tmp_path, inp, k=3)).run()
    assert stats["epochs_processed"] == 3
    got = (
        ExactlyOnceParquetSink(str(tmp_path / "tout"))
        .read_committed()
        .to_pandas()
        .sort_values(["epoch", "n", "item"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"epoch": "int64", "n": "int64", "err_bound": "int64"}),
        _prefix_topk(DOC_EPOCHS, 3),
    )


@pytest.mark.usefixtures("ray_session")
def test_topk_resume_and_second_run_zero(tmp_path):
    from statefulstreamprocessor_ray.pipelines.streaming_sketch import (
        StreamingTopKJob,
    )

    inp = _write_doc_files(tmp_path, DOC_EPOCHS)
    cfg = _topk_cfg(tmp_path, inp, k=3)
    StreamingTopKJob(cfg).run(max_epochs=1)  # "crash" after epoch 0
    StreamingTopKJob(cfg).run()  # resume
    got = (
        ExactlyOnceParquetSink(str(tmp_path / "tout"))
        .read_committed()
        .to_pandas()
        .sort_values(["epoch", "n", "item"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"epoch": "int64", "n": "int64", "err_bound": "int64"}),
        _prefix_topk(DOC_EPOCHS, 3),
    )
    stats3 = StreamingTopKJob(cfg).run()
    assert stats3["rows_emitted"] == 0 and stats3["epochs_processed"] == 0


@pytest.mark.usefixtures("ray_session")
def test_topk_truncation_reports_bound_and_keeps_head(tmp_path):
    """capacity << vocabulary: the hot head survives, counts are within the
    reported err_bound, err_bound > 0 is reported honestly."""
    from statefulstreamprocessor_ray.pipelines.streaming_sketch import (
        StreamingTopKJob,
    )

    rng = np.random.default_rng(13)
    epochs = [
        [" ".join(f"w{v}" for v in rng.zipf(1.3, 400) % 2000) + " hot hot hot"]
        for _ in range(3)
    ]
    inp = _write_doc_files(tmp_path, epochs)
    StreamingTopKJob(_topk_cfg(tmp_path, inp, k=5, capacity=64)).run()
    got = (
        ExactlyOnceParquetSink(str(tmp_path / "tout")).read_committed().to_pandas()
    )
    last = got[got["epoch"] == 2].sort_values(["n", "item"], ascending=[False, True])
    assert (last["err_bound"] > 0).all()
    toks = pd.Series(
        [t for texts in epochs for s in texts for t in s.split()]
    ).value_counts()
    # the unambiguous zipf head survives truncation, and every reported
    # count is a lower bound within the reported err_bound of the truth
    assert last["item"].iloc[0] == toks.index[0]
    err = int(last["err_bound"].iloc[0])
    for item, n in zip(last["item"], last["n"]):
        assert int(n) <= int(toks[item]) <= int(n) + err


@pytest.mark.usefixtures("ray_session")
def test_scheme_mismatch_aborts_resume(tmp_path):
    inp = _write_epoch_files(tmp_path, EPOCHS)
    cfg = _cfg(tmp_path, inp)
    StreamingDistinctJob(cfg).run(max_epochs=2)
    # corrupt the checkpoint scheme tags (simulates a pandas upgrade)
    import pickle

    ckpt_dir = os.path.join(cfg.work_dir, "checkpoints")
    for f in os.listdir(ckpt_dir):
        p = os.path.join(ckpt_dir, f)
        with open(p, "rb") as fh:
            snap = pickle.load(fh)
        snap["scheme"] = "hash_array-pd0.0.0"
        with open(p, "wb") as fh:
            pickle.dump(snap, fh)
    with pytest.raises(RuntimeError, match="resume aborted"):
        StreamingDistinctJob(cfg).run()


# ---------------------------------------------------------------- quantiles


def _write_value_files(tmp_path, epochs):
    """epochs: list of list[(group, value)] — one file per epoch."""
    inp = tmp_path / "qinput"
    inp.mkdir(exist_ok=True)
    for i, rows in enumerate(epochs):
        tbl = pa.table(
            {
                "event_type": pa.array([r[0] for r in rows], pa.string()),
                "value": pa.array([float(r[1]) for r in rows], pa.float64()),
            }
        )
        pq.write_table(tbl, str(inp / f"f-{i:03d}.parquet"))
    return str(inp)


def _qcfg(tmp_path, inp, **kw):
    from statefulstreamprocessor_ray.pipelines.streaming_sketch import (
        StreamingQuantileConfig,
    )

    return StreamingQuantileConfig(
        input_path=inp,
        work_dir=str(tmp_path / "qwork"),
        out_dir=str(tmp_path / "qout"),
        n_shards=3,
        **kw,
    )


def _prefix_quantiles(epochs, qs=(0.25, 0.5, 0.9)):
    rows = []
    for e in range(len(epochs)):
        flat = pd.DataFrame(
            [r for ep in epochs[: e + 1] for r in ep],
            columns=["event_type", "value"],
        )
        for g, sub in flat.groupby("event_type"):
            v = np.sort(sub["value"].to_numpy(np.float64))
            for q in qs:
                # quantile_disc: sorted index max(0, ceil(q*n)-1)
                i = max(0, int(np.ceil(q * len(v))) - 1)
                rows.append((e, g, q, v[i], 0))
    return (
        pd.DataFrame(
            rows, columns=["epoch", "event_type", "q", "value", "err_bound"]
        )
        .sort_values(["epoch", "event_type", "q"])
        .reset_index(drop=True)
    )


QEPOCHS = [
    [("a", 1.0), ("a", 9.0), ("b", 5.0), ("a", 3.0)],
    [("a", 7.0), ("b", 2.0), ("c", 4.0)],
    [("b", 8.0), ("c", 6.0), ("a", 2.5), ("a", 1.5)],
]


@pytest.mark.usefixtures("ray_session")
def test_quantile_snapshots_equal_prefix_quantile_disc(tmp_path):
    from statefulstreamprocessor_ray.pipelines.streaming_sketch import (
        StreamingQuantileJob,
    )

    inp = _write_value_files(tmp_path, QEPOCHS)
    stats = StreamingQuantileJob(_qcfg(tmp_path, inp)).run()
    assert stats["epochs_processed"] == 3
    got = (
        ExactlyOnceParquetSink(str(tmp_path / "qout"))
        .read_committed()
        .to_pandas()
        .sort_values(["epoch", "event_type", "q"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype(
            {"epoch": "int64", "q": "float64", "value": "float64",
             "err_bound": "int64"}
        ),
        _prefix_quantiles(QEPOCHS),
    )


@pytest.mark.usefixtures("ray_session")
def test_quantile_resume_tail_and_second_run_zero(tmp_path):
    from statefulstreamprocessor_ray.pipelines.streaming_sketch import (
        StreamingQuantileJob,
    )

    inp = _write_value_files(tmp_path, QEPOCHS[:2])
    cfg = _qcfg(tmp_path, inp)
    StreamingQuantileJob(cfg).run(max_epochs=1)  # "crash" after epoch 0
    StreamingQuantileJob(cfg).run()  # resume epochs 0..1
    # tail append: a third file arrives -> exactly one new epoch emitted
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([r[0] for r in QEPOCHS[2]], pa.string()),
                "value": pa.array([float(r[1]) for r in QEPOCHS[2]], pa.float64()),
            }
        ),
        os.path.join(inp, "f-002.parquet"),
    )
    stats = StreamingQuantileJob(cfg).run()
    assert stats["epochs_processed"] == 1 and stats["epochs_skipped"] == 2
    got = (
        ExactlyOnceParquetSink(str(tmp_path / "qout"))
        .read_committed()
        .to_pandas()
        .sort_values(["epoch", "event_type", "q"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype(
            {"epoch": "int64", "q": "float64", "value": "float64",
             "err_bound": "int64"}
        ),
        _prefix_quantiles(QEPOCHS),
    )
    stats2 = StreamingQuantileJob(cfg).run()
    assert stats2["rows_emitted"] == 0 and stats2["epochs_processed"] == 0


@pytest.mark.usefixtures("ray_session")
def test_quantile_compaction_bound_and_resume_across_it(tmp_path):
    """values >> limit: compaction triggers, err_bound > 0 is reported, the
    reported quantile's RANK is within err_bound of the true rank, and a
    crash/resume across the compacted state equals the uninterrupted run."""
    from statefulstreamprocessor_ray.pipelines.streaming_sketch import (
        StreamingQuantileJob,
    )

    rng = np.random.default_rng(7)
    epochs = [
        [("g", float(v)) for v in rng.normal(0, 100, 3000)] for _ in range(3)
    ]
    inp = _write_value_files(tmp_path, epochs)
    cfg = _qcfg(tmp_path, inp, limit=256)
    StreamingQuantileJob(cfg).run()
    got = (
        ExactlyOnceParquetSink(str(tmp_path / "qout")).read_committed().to_pandas()
    )
    last = got[got["epoch"] == 2]
    assert (last["err_bound"] > 0).all()
    allv = np.sort(
        np.array([v for ep in epochs for _, v in ep], np.float64)
    )
    W = len(allv)
    for _, row in last.iterrows():
        true_rank = max(1, int(np.ceil(row["q"] * W)))
        got_rank = int(np.searchsorted(allv, row["value"], side="right"))
        assert abs(got_rank - true_rank) <= int(row["err_bound"])
    # crash/resume across compacted state reproduces the uninterrupted run
    import shutil

    shutil.rmtree(tmp_path / "qout")
    shutil.rmtree(tmp_path / "qwork")
    cfg2 = _qcfg(tmp_path, inp, limit=256)
    StreamingQuantileJob(cfg2).run(max_epochs=2)
    StreamingQuantileJob(cfg2).run()
    got2 = (
        ExactlyOnceParquetSink(str(tmp_path / "qout")).read_committed().to_pandas()
    )
    pd.testing.assert_frame_equal(
        got.sort_values(["epoch", "q"]).reset_index(drop=True),
        got2.sort_values(["epoch", "q"]).reset_index(drop=True),
    )
