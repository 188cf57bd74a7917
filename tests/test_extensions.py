"""User-extension surface (SURVEY.md §2.7): JoinSpec config parity, join_fn
batch projection, buffer_results, replayer, sinks, metrics."""

import numpy as np
import pytest

from statefulstreamprocessor_ray import fixtures
from statefulstreamprocessor_ray.functions.ops import power_join_projection
from statefulstreamprocessor_ray.stages.join import JoinSpec, ordered_join


def test_joinspec_reserved_knobs_raise_like_reference():
    with pytest.raises(NotImplementedError):
        JoinSpec(instant_emit=False)
    with pytest.raises(NotImplementedError):
        JoinSpec(max_latency=1.0)
    JoinSpec(delta_time=1.0)  # fine


@pytest.mark.usefixtures("ray_session")
def test_join_fn_projection_and_buffer_results(tmp_path):
    import ray.data

    tbl = fixtures.scenario_transcripts("F2", n_convs=3)
    ds = ray.data.from_arrow(tbl)

    def tag_len(batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        return batch.append_column("pair_len", pc.add(
            pc.utf8_length(batch["r_text"]), pc.utf8_length(batch["s_text"])
        ))

    out = ordered_join(ds, join_spec=JoinSpec(join_fn=tag_len)).to_pandas()
    assert len(out) == 3 * 23 and "pair_len" in out.columns

    empty = ordered_join(ds, join_spec=JoinSpec(buffer_results=False)).to_pandas()
    assert len(empty) == 0


@pytest.mark.usefixtures("ray_session")
def test_power_projection():
    import pyarrow as pa

    batch = pa.table(
        {
            "user_id": pa.array([1, 2], pa.int64()),
            "r_ts": pa.array([1_000_000, 2_000_000], pa.int64()).cast(pa.timestamp("us")),
            "r_value": pa.array([30.0, 60.0]),
            "s_ts": pa.array([1_500_000, 2_500_000], pa.int64()).cast(pa.timestamp("us")),
            "s_value": pa.array([400.0, -500.0]),
        }
    )
    out = power_join_projection(batch)
    assert out["result"].to_pylist() == pytest.approx(
        [abs(2 * np.pi / 60 * 30 * 400), abs(2 * np.pi / 60 * 60 * -500)]
    )
    assert out["ts"].to_pylist()[0].timestamp() == 1.25


@pytest.mark.usefixtures("ray_session")
def test_replayer_and_sinks_and_metrics(tmp_path):
    import ray
    import ray.data

    from statefulstreamprocessor_ray.sinks.simple import write_csv, write_partitioned_parquet
    from statefulstreamprocessor_ray.sources.replay import replay_batches
    from statefulstreamprocessor_ray.stages.metrics import MetricsActor, metered

    tbl = fixtures.scenario_transcripts("F2", n_convs=4)
    ds = ray.data.from_arrow(tbl)

    # replayer: bounded + loop
    batches = list(replay_batches(ds, batch_size=16, max_rows=50))
    assert sum(b.num_rows for b in batches) == 50
    looped = list(replay_batches(ds, batch_size=64, loop=True, max_rows=150))
    assert sum(b.num_rows for b in looped) == 150

    # metered pass-through
    m = MetricsActor.remote()
    n = metered(ds, m, "ingest").count()
    assert n == tbl.num_rows
    # metering is fire-and-forget from the workers (by design — the hot path
    # never blocks on the actor); poll briefly until the adds land
    import time as _time

    deadline = _time.time() + 10
    rep = ray.get(m.report.remote())
    while rep.get("ingest", {}).get("rows", 0) < tbl.num_rows and _time.time() < deadline:
        _time.sleep(0.1)
        rep = ray.get(m.report.remote())
    assert rep["ingest"]["rows"] == tbl.num_rows

    # sinks
    cnt = write_partitioned_parquet(
        ds, str(tmp_path / "pq"), partition_cols=["role"], verify_count=True
    )
    assert cnt == tbl.num_rows
    write_csv(ds.drop_columns(["tool"]), str(tmp_path / "csv"))
    import glob

    assert glob.glob(str(tmp_path / "csv" / "*"))


@pytest.mark.usefixtures("ray_session")
def test_winnowing_fingerprints():
    import ray.data

    from statefulstreamprocessor_ray.stages.text import (
        WinnowingFingerprints,
        winnowing_fingerprints,
    )

    w = WinnowingFingerprints()
    a = w.fingerprints("the quick brown fox jumps over the lazy dog")
    b = w.fingerprints("PREFIX the quick brown fox jumps over the lazy dog SUFFIX")
    shared = np.intersect1d(a, b)
    assert len(shared) >= 0.8 * len(a)  # position-robust containment
    assert len(w.fingerprints("")) == 0

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    fp = winnowing_fingerprints(ds).to_pandas()
    assert fp.doc_id.nunique() == 500 and len(fp) > 10_000


def test_text_analyzer_modes_agree_and_sip_is_vectorized():
    """The sip fingerprint mode (vectorized content_hash128 hex) must agree
    with the md5 oracle mode on every NON-fingerprint column, byte-for-byte;
    sip fingerprints must be 32 lowercase hex chars, deterministic, and
    distinct exactly when texts are distinct."""
    import pandas as pd

    from statefulstreamprocessor_ray.stages.text import TextAnalyzer

    texts = [
        "the quick brown fox",
        "le chat et la souris",
        "",
        None,
        "a a a the the of, of; of!",
        "一二三 the",
        "x" * 50,
        "the quick brown fox",  # exact dup of row 0
    ]
    batch = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    sip = TextAnalyzer(fingerprint_mode="sip")(batch)
    md5 = TextAnalyzer(fingerprint_mode="md5")(batch)
    stat_cols = [c for c in sip.columns if c != "fingerprint"]
    pd.testing.assert_frame_equal(sip[stat_cols], md5[stat_cols])
    fp = sip["fingerprint"]
    assert fp.str.fullmatch(r"[0-9a-f]{32}").all()
    assert fp.iloc[0] == fp.iloc[7]          # identical text, identical fp
    assert fp.iloc[2] == fp.iloc[3]          # "" and None normalize together
    assert fp.drop([3, 7]).is_unique         # distinct texts stay distinct
    # determinism across instances (checkpointable identity)
    again = TextAnalyzer(fingerprint_mode="sip")(batch)["fingerprint"]
    assert (again == fp).all()
