"""Row-level source provenance through the streaming join.

The reference attaches per-record Kafka topic/partition/offset metadata to
every consumed record (``ts_join_with_kafka_eos.py:151-156``) and can emit
``r.metadata``/``s.metadata`` in the join output
(``local_stream_buffer.py:383-389``). The engine's analog:
``StreamingJoinConfig(provenance=True)`` attaches
``(src_file_idx, src_row)`` at phase-0 — index into the sorted input-file
list plus row index within that file — and the join output carries
``r_src_file_idx/r_src_row`` and ``s_src_file_idx/s_src_row``, so every
output pair maps back to its exact input rows.
"""

import os

import pyarrow.parquet as pq
import pytest

from statefulstreamprocessor_ray import fixtures
from statefulstreamprocessor_ray.pipelines.streaming import (
    StreamingJoinConfig,
    StreamingJoinJob,
)
from statefulstreamprocessor_ray.sinks.exactly_once import ExactlyOnceParquetSink

PROV_OUT_COLS = {"r_src_file_idx", "r_src_row", "s_src_file_idx", "s_src_row"}


def _run(tmp_path, tag, provenance):
    tbl = fixtures.transcripts_table(n_convs=20, turns_per_conv=50, seed=7)
    input_path = str(tmp_path / "input")
    fixtures.write_transcripts(tbl, input_path, n_files=3)
    cfg = StreamingJoinConfig(
        input_path=input_path,
        work_dir=str(tmp_path / f"work_{tag}"),
        out_dir=str(tmp_path / f"out_{tag}"),
        n_shards=3,
        epoch_duration_s=20.0,
        delta_time=5.0,
        provenance=provenance,
    )
    stats = StreamingJoinJob(cfg).run()
    assert stats["rows_emitted"] > 0
    out = ExactlyOnceParquetSink(cfg.out_dir).read_committed().to_pandas()
    files = sorted(
        os.path.join(input_path, f)
        for f in os.listdir(input_path)
        if f.endswith(".parquet")
    )
    return out, files


@pytest.mark.usefixtures("ray_session")
def test_provenance_round_trip(tmp_path):
    out, files = _run(tmp_path, "prov", provenance=True)
    assert PROV_OUT_COLS <= set(out.columns)

    inputs = {i: pq.read_table(f).to_pandas() for i, f in enumerate(files)}
    sample = out.sample(n=min(80, len(out)), random_state=0)
    for _, row in sample.iterrows():
        # left side: an assistant turn; right side: a tool turn — each
        # provenance pair must address the exact input row that produced it
        for prefix, want_role in (("r_", "assistant"), ("s_", "tool")):
            src = inputs[int(row[f"{prefix}src_file_idx"])].iloc[
                int(row[f"{prefix}src_row"])
            ]
            assert src["conv_id"] == row["conv_id"]
            assert src["turn_idx"] == row[f"{prefix}turn_idx"]
            assert src["text"] == row[f"{prefix}text"]
            assert src["role"] == want_role

    # every provenance ref is in range and the (file, row) pair is exact —
    # no two distinct input rows share an address by construction, so a
    # joined pair's two sides must address two distinct rows
    assert (
        out[["r_src_file_idx", "r_src_row"]].values
        != out[["s_src_file_idx", "s_src_row"]].values
    ).any(axis=1).all()


@pytest.mark.usefixtures("ray_session")
def test_provenance_off_by_default(tmp_path):
    out, _ = _run(tmp_path, "noprov", provenance=False)
    assert not (PROV_OUT_COLS & set(out.columns))
