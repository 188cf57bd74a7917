"""Dataset-level tests for the ordered-join stage and flagship pipeline."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from statefulstreamprocessor_ray import fixtures
from statefulstreamprocessor_ray.pipelines.flagship import flagship_join
from statefulstreamprocessor_ray.stages.join import replay_join_table

from .oracle import NaiveOrderedJoin


def _tagged_sorted_rows(table: pa.Table, conv: str):
    """Oracle-side stream derivation + pinned ingestion order for one conv."""
    rows = [r for r in table.to_pylist() if r["conv_id"] == conv]
    tagged = []
    for r in rows:
        if r["role"] == "assistant":
            tagged.append((0, r))
        if r["tool"] is not None:
            tagged.append((1, r))
    tagged.sort(key=lambda x: (x[1]["ts"], x[0], x[1]["turn_idx"]))
    return tagged


def _oracle_joined(table: pa.Table, conv: str, delta_us=None):
    tagged = _tagged_sorted_rows(table, conv)
    o = NaiveOrderedJoin(delta_time=delta_us)
    for i, (side, r) in enumerate(tagged):
        o.ingest(side, r["ts"], i)
    return [
        (tagged[l][1]["text"], tagged[r][1]["text"], case) for l, r, case in o.pairs
    ]


def test_replay_join_table_f2_count():
    # F2's ingestion order equals the pinned ts order, so the reference's
    # asserted count (23) holds through the Dataset path.
    tbl = fixtures.scenario_transcripts("F2")
    tagged = []
    for side_mask, side in ((pc.equal(tbl["role"], "assistant"), 0), (pc.is_valid(tbl["tool"]), 1)):
        part = tbl.filter(side_mask)
        part = part.append_column("stream_side", pa.array([side] * part.num_rows, pa.int8()))
        tagged.append(part)
    out = replay_join_table(pa.concat_tables(tagged))
    assert out.num_rows == 23
    # orientation: r_* always from the assistant stream
    assert set(t[0] for t in out["r_text"].to_pylist()) == {"L"}
    assert set(t[0] for t in out["s_text"].to_pylist()) == {"R"}


@pytest.mark.usefixtures("ray_session")
def test_flagship_multikey_counts(tmp_path):
    import ray.data

    # FIXTURES.md F8: F2 pattern replicated over 100 convs -> 23 pairs each.
    tbl = fixtures.scenario_transcripts("F2", n_convs=100)
    path = str(tmp_path / "t")
    fixtures.write_transcripts(tbl, path, n_files=4)
    ds = ray.data.read_parquet(path)
    out = flagship_join(ds).to_pandas()
    assert len(out) == 2300
    per_key = out.groupby("conv_id").size()
    assert (per_key == 23).all()
    assert set(out.columns) == {
        "conv_id", "r_ts", "r_turn_idx", "r_text", "s_ts", "s_turn_idx",
        "s_text", "s_tool", "join_case", "emit_seq",
    }


@pytest.mark.usefixtures("ray_session")
def test_flagship_differential_vs_oracle(tmp_path):
    import ray.data

    tbl = fixtures.transcripts_table(n_convs=25, turns_per_conv=40, seed=3)
    path = str(tmp_path / "t")
    fixtures.write_transcripts(tbl, path, n_files=3)
    ds = ray.data.read_parquet(path)
    out = flagship_join(ds, delta_time=2.0).to_pandas()

    convs = sorted(set(tbl["conv_id"].to_pylist()))
    # Compare per-conv emission sequences (text pairs + case) in emit order.
    tbl_us = tbl.set_column(
        tbl.schema.get_field_index("ts"), "ts", pc.cast(tbl["ts"], pa.int64())
    )
    total = 0
    for conv in convs:
        expected = _oracle_joined(tbl_us, conv, delta_us=2_000_000)
        got_df = out[out.conv_id == conv].sort_values("emit_seq")
        got = list(zip(got_df.r_text, got_df.s_text, got_df.join_case))
        assert got == expected, conv
        total += len(expected)
    assert total == len(out)
    assert total > 0


def test_replay_join_empty_group_schema():
    tbl = fixtures.scenario_transcripts("F2").slice(0, 5)  # only left-side rows
    part = tbl.filter(pc.equal(tbl["role"], "assistant"))
    part = part.append_column("stream_side", pa.array([0] * part.num_rows, pa.int8()))
    out = replay_join_table(part)
    assert out.num_rows == 0
    assert "r_text" in out.schema.names and "emit_seq" in out.schema.names


@pytest.mark.usefixtures("ray_session")
def test_flagship_deterministic_across_runs(tmp_path):
    import ray.data

    tbl = fixtures.transcripts_table(n_convs=15, turns_per_conv=30, seed=21)
    path = str(tmp_path / "t")
    fixtures.write_transcripts(tbl, path, n_files=3)
    runs = []
    for _ in range(2):
        df = flagship_join(ray.data.read_parquet(path), delta_time=3.0).to_pandas()
        runs.append(df.sort_values(["conv_id", "emit_seq"]).reset_index(drop=True))
    import pandas as pd

    pd.testing.assert_frame_equal(runs[0], runs[1])


def test_flagship_max_join_cnt(ray_session):
    """Reference MAX_JOIN_CNT early-stop (ts_join_with_kafka_eos.py:32)."""
    from statefulstreamprocessor_ray import fixtures
    from statefulstreamprocessor_ray.pipelines.flagship import flagship_join
    import ray.data

    tbl = fixtures.transcripts_table(n_convs=20, turns_per_conv=50, seed=2)
    ds = ray.data.from_arrow(tbl)
    full = flagship_join(ds, delta_time=60.0).count()
    assert full > 10
    capped = flagship_join(ds, delta_time=60.0, max_join_cnt=10)
    assert capped.count() == 10
    assert flagship_join(ds, delta_time=60.0, max_join_cnt=10**9).count() == full
