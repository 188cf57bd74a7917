"""Deterministic fixture generators (FIXTURES.md scenarios F1-F12).

Two layers:

- ``scenario_sequence(name)``: raw ``(side, ts_seconds)`` ingestion sequences
  replicating the reference tester's patterns and seeds
  (``05_LocalStreamBuffer/tester.py``, random.seed(0)) — used by the
  state-machine conformance tests, where the asserted pair counts
  (99/23/20/20/13/16/...) come from the reference's own asserts.
- ``transcripts_table(...)`` / ``write_transcripts(...)``: T1-shaped transcript
  Parquet (conv_id, turn_idx, role, text, tool, ts) for the Dataset-level
  engine tests and benchmarks. Left stream = role=='assistant', right stream =
  tool IS NOT NULL.

All randomness is ``random.Random(seed)``; timestamps are truncated to
microseconds when written as Arrow.
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa

BASE_EPOCH_S = 1_600_000_000  # the reference tester's start_time

LEFT, RIGHT = 0, 1


def _five_five(n: int) -> list[tuple[int, float]]:
    order = ([LEFT] * 5 + [RIGHT] * 5) * (n // 10)
    return [(order[i], float(BASE_EPOCH_S + i)) for i in range(n)]


def _randomized(n_per_side: int, seed: int = 0) -> list[tuple[int, float]]:
    """Reference ``test_randomized`` pattern: per-side cumulative random gaps,
    one extra random consumed per record (the reference draws a result value),
    then a shuffled interleave — all from one seeded stream."""
    rng = random.Random(seed)
    ev = {LEFT: [], RIGHT: []}
    for side in (LEFT, RIGHT):
        t = float(BASE_EPOCH_S)
        for _ in range(n_per_side):
            t += rng.random()
            ev[side].append(t)
            rng.random()  # result draw, keeps the stream aligned with the reference
    order = [LEFT] * n_per_side + [RIGHT] * n_per_side
    rng.shuffle(order)
    taken = {LEFT: 0, RIGHT: 0}
    seq = []
    for side in order:
        seq.append((side, ev[side][taken[side]]))
        taken[side] += 1
    return seq


def scenario_sequence(name: str) -> tuple[list[tuple[int, float]], float | None, int]:
    """Returns (ingest_seq, delta_time, expected_pair_count)."""
    if name == "F1":  # alternating, ts = index
        seq = [(i % 2, float(BASE_EPOCH_S + i)) for i in range(100)]
        return seq, None, 99
    if name == "F2":
        return _five_five(20), None, 23
    if name == "F3":  # all-left-then-right
        seq = [(LEFT, float(BASE_EPOCH_S + i)) for i in range(10)]
        seq += [(RIGHT, BASE_EPOCH_S + d) for d in (-0.5, 0.5, 5.5, 9.5)]
        return seq, None, 20
    if name == "F4":
        return _randomized(10), None, 20
    if name == "F5":
        return _five_five(20), 3.0, 13
    if name == "F6":
        return _randomized(10), 0.5, 16
    if name == "F7":
        return _five_five(100_000), None, 179_987
    if name == "F7b":
        return _randomized(10_000), None, 23_041
    raise KeyError(name)


def sequence_to_transcripts(
    seq: list[tuple[int, float]], conv_id: str = "c1", ts_offset_s: float = 0.0
) -> dict:
    """Map an ingestion sequence to T1 transcript columns.

    Left events become assistant turns, right events tool-call turns; text
    encodes (side, ordinal) so output equality is checkable by string.
    turn_idx is the arrival ordinal — the engine's pinned replay order
    sort-by (ts, stream_side, turn_idx) recovers a deterministic interleave.
    """
    n = len(seq)
    conv = [conv_id] * n
    turn_idx = list(range(n))
    role, text, tool, ts_us = [], [], [], []
    n_l = n_r = 0
    for side, ts in seq:
        if side == LEFT:
            role.append("assistant")
            tool.append(None)
            text.append(f"L{n_l}")
            n_l += 1
        else:
            role.append("tool")
            tool.append("toolcall")
            text.append(f"R{n_r}")
            n_r += 1
        ts_us.append(int((ts + ts_offset_s) * 1_000_000))
    return {
        "conv_id": conv,
        "turn_idx": turn_idx,
        "role": role,
        "text": text,
        "tool": tool,
        "ts": ts_us,
    }


def _cols_to_table(cols: dict) -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
        }
    )


def scenario_transcripts(name: str, n_convs: int = 1) -> pa.Table:
    """T1 table for a scenario, optionally replicated across conv_ids with
    per-conv time offsets (FIXTURES.md F8)."""
    seq, _, _ = scenario_sequence(name)
    parts = []
    for k in range(n_convs):
        parts.append(
            _cols_to_table(
                sequence_to_transcripts(seq, conv_id=f"c{k:04d}", ts_offset_s=37.0 * k)
            )
        )
    return pa.concat_tables(parts)


def transcripts_table(
    n_convs: int,
    turns_per_conv: int,
    seed: int = 0,
    p_assistant: float = 0.45,
    p_tool: float = 0.25,
    start_epoch_s: float = BASE_EPOCH_S,
    conv_offset: int = 0,
) -> pa.Table:
    """General deterministic transcript corpus (vectorized numpy generation).

    Roles cycle user/assistant with tool-call turns interspersed; per-conv
    timestamps are strictly increasing with irregular gaps (FIXTURES.md F10
    'irregular gaps'). Used for golden-corpus, bench, and skew tests.
    ``conv_offset`` shifts the conv-id numbering so huge corpora can be
    generated in bounded-memory chunks (distinct seeds per chunk) without
    conv-id collisions.
    """
    rng = np.random.default_rng(seed)
    n = n_convs * turns_per_conv
    conv = np.repeat(np.arange(conv_offset, conv_offset + n_convs), turns_per_conv)
    turn_idx = np.tile(np.arange(turns_per_conv, dtype=np.int32), n_convs)
    # role draw: 0=user, 1=assistant, 2=tool
    u = rng.random(n)
    role_code = np.where(u < p_assistant, 1, np.where(u < p_assistant + p_tool, 2, 0))
    # irregular per-turn gaps in [0.05, 2.05) s, cumulative per conv
    gaps = 0.05 + 2.0 * rng.random(n)
    cum = np.cumsum(gaps)
    conv_starts = np.concatenate(([0.0], cum[turns_per_conv - 1 :: turns_per_conv][:-1]))
    ts_s = start_epoch_s + cum - np.repeat(conv_starts, turns_per_conv)
    # per-conv phase offset so convs overlap but differ
    ts_s = ts_s + np.repeat(rng.random(n_convs) * 1000.0, turns_per_conv)
    ts_us = (ts_s * 1e6).astype(np.int64)

    conv_ids = np.char.add("conv", np.char.zfill(conv.astype(str), 8))
    roles = np.array(["user", "assistant", "tool"])[role_code]
    tools = np.where(role_code == 2, "toolcall", None)
    texts = np.char.add(
        np.char.add(np.array(["u", "a", "t"])[role_code], turn_idx.astype(str)),
        np.char.add("#", conv.astype(str)),
    )
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools.tolist(), pa.string()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
        }
    )


def skewed_transcripts(seed: int = 0) -> pa.Table:
    """FIXTURES.md F9: one hot conv (50k turns, F1-like alternation) plus 999
    small convs of 50 turns."""
    hot_seq = [(i % 2, float(BASE_EPOCH_S + i)) for i in range(50_000)]
    hot = _cols_to_table(sequence_to_transcripts(hot_seq, conv_id="hot"))
    cold = transcripts_table(999, 50, seed=seed)
    return pa.concat_tables([hot, cold])


def write_transcripts(table: pa.Table, path: str, n_files: int = 1) -> list[str]:
    """Write a transcript table as partitioned Parquet (one file per shard of
    conv_ids, preserving per-conv contiguity)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    files = []
    n = table.num_rows
    step = (n + n_files - 1) // n_files
    for i in range(n_files):
        part = table.slice(i * step, step)
        if part.num_rows == 0:
            break
        f = os.path.join(path, f"part-{i:05d}.parquet")
        pq.write_table(part, f)
        files.append(f)
    return files
