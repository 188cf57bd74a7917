"""Streaming exact dedup: cross-epoch first-occurrence filtering with
exactly-once manifests, resume, and follow-the-tail appends."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from statefulstreamprocessor_ray.pipelines.streaming_dedup import (
    StreamingDedupConfig,
    StreamingDedupJob,
)
from statefulstreamprocessor_ray.sinks.exactly_once import ExactlyOnceParquetSink


def _write_epoch_files(tmp_path, epochs):
    """epochs: list of list[(doc_id, text)] — one file per epoch."""
    inp = tmp_path / "input"
    inp.mkdir(exist_ok=True)
    for i, rows in enumerate(epochs):
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        pq.write_table(tbl, str(inp / f"f-{i:03d}.parquet"))
    return str(inp)


def _cfg(tmp_path, inp):
    return StreamingDedupConfig(
        input_path=inp,
        work_dir=str(tmp_path / "work"),
        out_dir=str(tmp_path / "out"),
        n_shards=3,
    )


EPOCHS = [
    [(0, "aaa"), (1, "bbb"), (2, "aaa")],          # in-epoch dup: 2 drops
    [(3, "ccc"), (4, "bbb")],                       # cross-epoch dup: 4 drops
    [(5, "aaa"), (6, "ddd"), (7, "ddd"), (8, "eee")],
]
EXPECT = {0: "aaa", 1: "bbb", 3: "ccc", 6: "ddd", 8: "eee"}


@pytest.mark.usefixtures("ray_session")
def test_first_occurrence_across_epochs(tmp_path):
    inp = _write_epoch_files(tmp_path, EPOCHS)
    cfg = _cfg(tmp_path, inp)
    stats = StreamingDedupJob(cfg).run()
    assert stats["epochs_processed"] == 3
    out = ExactlyOnceParquetSink(cfg.out_dir).read_committed().to_pandas()
    assert dict(zip(out.doc_id, out.text)) == EXPECT
    assert stats["n_seen"] == len(set(EXPECT.values()))

    # second run: zero emissions
    stats2 = StreamingDedupJob(cfg).run()
    assert stats2["rows_emitted"] == 0 and stats2["epochs_processed"] == 0


@pytest.mark.usefixtures("ray_session")
def test_crash_resume_equals_uninterrupted(tmp_path):
    inp = _write_epoch_files(tmp_path, EPOCHS)
    cfg = _cfg(tmp_path, inp)
    s1 = StreamingDedupJob(cfg).run(max_epochs=1)
    assert s1["epochs_processed"] == 1
    StreamingDedupJob(cfg).run()
    out = ExactlyOnceParquetSink(cfg.out_dir).read_committed().to_pandas()
    assert dict(zip(out.doc_id, out.text)) == EXPECT


@pytest.mark.usefixtures("ray_session")
def test_follow_the_tail_emits_only_new_contents(tmp_path):
    inp = _write_epoch_files(tmp_path, EPOCHS[:2])
    cfg = _cfg(tmp_path, inp)
    StreamingDedupJob(cfg).run()
    rows1 = ExactlyOnceParquetSink(cfg.out_dir).committed_row_count()

    # the tail file arrives: 'aaa'/'ddd'-dup already seen; 6 and 8 are new
    _write_epoch_files(tmp_path, EPOCHS)  # rewrites 0/1 identically, adds 2
    stats2 = StreamingDedupJob(cfg).run()
    assert stats2["epochs_skipped"] == 2 and stats2["epochs_processed"] == 1
    assert stats2["rows_emitted"] == 2  # doc 6 (ddd) + doc 8 (eee)
    out = ExactlyOnceParquetSink(cfg.out_dir).read_committed().to_pandas()
    assert dict(zip(out.doc_id, out.text)) == EXPECT
    assert len(out) == rows1 + 2


@pytest.mark.usefixtures("ray_session")
def test_checkpoint_bytes_are_per_epoch_deltas(tmp_path):
    """Regression (VERDICT r2 #5): checkpoints used to re-snapshot the FULL
    seen-set each epoch (total I/O O(epochs x corpus)). Now each (shard,
    epoch) file holds only that epoch's new digests: a big first epoch
    followed by tiny ones must yield tiny later checkpoint files, and the
    deltas' total digest count must equal the distinct-content count."""
    import pickle

    big = [(i, f"unique body {i}") for i in range(3000)]
    tiny = [(3000, "unique body 7"), (3001, "fresh one")]  # 1 new content
    tiny2 = [(3002, "fresh one"), (3003, "fresh two")]  # 1 new content
    inp = _write_epoch_files(tmp_path, [big, tiny, tiny2])
    cfg = _cfg(tmp_path, inp)
    stats = StreamingDedupJob(cfg).run()
    assert stats["n_seen"] == 3002

    ckpt_dir = os.path.join(cfg.work_dir, "checkpoints")
    sizes = {0: 0, 1: 0, 2: 0}
    n_digests = 0
    for f in os.listdir(ckpt_dir):
        epoch = int(f.split("-epoch-")[1].split(".")[0])
        sizes[epoch] += os.path.getsize(os.path.join(ckpt_dir, f))
        with open(os.path.join(ckpt_dir, f), "rb") as fh:
            n_digests += len(pickle.load(fh)["delta_lo"])
    # full-snapshot behavior would make epoch1/epoch2 files >= epoch0's;
    # deltas keep them at pickle-header scale
    assert sizes[1] < sizes[0] / 10 and sizes[2] < sizes[0] / 10, sizes
    assert n_digests == 3002

    # resume still works off the concatenated deltas: second run emits 0
    stats2 = StreamingDedupJob(cfg).run()
    assert stats2["rows_emitted"] == 0 and stats2["epochs_processed"] == 0


@pytest.mark.usefixtures("ray_session")
def test_matches_batch_dedup_on_random_corpus(tmp_path):
    rng = np.random.default_rng(6)
    texts = [f"doc body {i}" for i in range(200)]
    # 30% duplicates of earlier docs, shuffled into 4 epoch files
    all_rows = []
    for i in range(300):
        t = texts[rng.integers(0, 200)] if i >= 200 else texts[i]
        all_rows.append((i, t))
    epochs = [all_rows[i * 75 : (i + 1) * 75] for i in range(4)]
    inp = _write_epoch_files(tmp_path, epochs)
    cfg = _cfg(tmp_path, inp)
    StreamingDedupJob(cfg).run()
    out = (
        ExactlyOnceParquetSink(cfg.out_dir)
        .read_committed()
        .select_columns(["doc_id", "text"])  # drop the inferred hive epoch col
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame(all_rows, columns=["doc_id", "text"])
        .sort_values("doc_id")
        .drop_duplicates("text", keep="first")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want)


@pytest.mark.usefixtures("ray_session")
def test_restore_aborts_cleanly_on_pre_delta_snapshots(tmp_path):
    # a work dir holding pre-round-3 FULL-snapshot checkpoints (keys
    # seen_lo/seen_hi, no delta_*) must hit the clean resume-abort path
    # (-1 -> RuntimeError upstream), not a KeyError inside the actor
    import numpy as np
    import ray

    from statefulstreamprocessor_ray.pipelines.streaming_dedup import (
        DedupShardActor,
    )
    from statefulstreamprocessor_ray.state.checkpoint import CheckpointStore

    ckpt_dir = str(tmp_path / "ckpt")
    store = CheckpointStore(ckpt_dir)
    store.save(
        0,
        0,
        {"seen_lo": np.array([1], np.uint64), "seen_hi": np.array([2], np.uint64)},
    )
    actor = DedupShardActor.remote(
        0, {"id_col": "doc_id", "text_col": "text"}, ckpt_dir
    )
    assert ray.get(actor.restore.remote(0, [0])) == -1
    ray.kill(actor)


@pytest.mark.usefixtures("ray_session")
def test_curation_prepare_scrubs_filters_and_dedups_post_transform(tmp_path):
    from statefulstreamprocessor_ray.pipelines.corpus import CurationPrepare

    long = " ".join(f"w{j}" for j in range(12))
    epochs = [
        [
            (0, long + " mail@example.com"),   # scrubbed; survives
            (1, long + " <EMAIL>"),            # EQUAL to 0 post-scrub -> dup
            (2, "short text"),                 # fails min_tokens -> dropped
        ],
        [
            (3, long + " mail@other.org"),     # same post-scrub content -> dup
            (4, long + " extra tail tokens"),  # new content
        ],
    ]
    inp = _write_epoch_files(tmp_path, epochs)
    cfg = StreamingDedupConfig(
        input_path=inp,
        work_dir=str(tmp_path / "work"),
        out_dir=str(tmp_path / "out"),
        n_shards=2,
        prepare_fn=CurationPrepare(min_tokens=5, max_top_frac=1.0),
        prepare_tag="t1",
    )
    stats = StreamingDedupJob(cfg).run()
    out = ExactlyOnceParquetSink(cfg.out_dir).read_committed().to_pandas()
    got = dict(zip(out.doc_id, out.text))
    assert set(got) == {0, 4}
    assert got[0] == long + " <EMAIL>"  # emitted text is the scrubbed form
    # exactly-once: second run over committed input emits nothing
    stats2 = StreamingDedupJob(cfg).run()
    assert stats2["rows_emitted"] == 0

    # changing the transform without bumping prepare_tag would silently
    # reuse cached partitions; bumping it re-partitions and re-runs
    cfg2 = StreamingDedupConfig(
        input_path=inp,
        work_dir=str(tmp_path / "work"),
        out_dir=str(tmp_path / "out2"),
        n_shards=2,
        prepare_fn=CurationPrepare(min_tokens=1, max_top_frac=1.0),
        prepare_tag="t2",
    )
    out2 = (
        StreamingDedupJob(cfg2).run(),
        ExactlyOnceParquetSink(cfg2.out_dir).read_committed().to_pandas(),
    )[1]
    assert 2 in set(out2.doc_id)  # looser gate admits the short doc
