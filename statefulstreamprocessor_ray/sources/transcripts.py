"""Transcript sources.

``read_transcripts`` is the engine's S1 replay source (reference: NDJSON file
replay, ``01_Simulator/simulator.py:20-54``) re-expressed as a pruned Parquet
read. ``transcripts_from_events`` adapts the driver's ``events`` test table to
the T1 transcript shape so testdata-backed queries exercise the same pipeline.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def read_transcripts(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read T1 transcript Parquet with column pruning at the scan."""
    return ray.data.read_parquet(path, columns=columns or TRANSCRIPT_COLUMNS)


def _events_to_transcripts_batch(batch: pa.Table) -> pa.Table:
    """events(event_id, ts, user_id, event_type, value, props) -> T1 rows.

    Deterministic mapping: purchase/signup -> assistant turns, error -> tool
    turns (tool='err'), click/view -> user turns. ``turn_idx`` inherits the
    globally monotone event_id (events are ts-ordered), which is monotone
    within each user too, satisfying the per-stream in-order precondition.
    """
    et = batch["event_type"]
    is_assistant = pc.is_in(et, value_set=pa.array(["purchase", "signup"]))
    is_tool = pc.equal(et, "error")
    role = pc.if_else(is_assistant, "assistant", pc.if_else(is_tool, "tool", "user"))
    tool = pc.if_else(is_tool, pa.scalar("err", pa.string()), pa.scalar(None, pa.string()))
    text = pc.binary_join_element_wise(
        et,
        pc.cast(pc.round(batch["value"], ndigits=2), pa.string()),
        ":",
    )
    return pa.table(
        {
            "conv_id": pc.binary_join_element_wise(
                pa.array(["u"] * len(et), pa.string()), pc.cast(batch["user_id"], pa.string()), ""
            ),
            "turn_idx": pc.cast(batch["event_id"], pa.int32()),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pc.cast(batch["ts"], pa.timestamp("us")),
        }
    )


def transcripts_from_events(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def fn(batch: pa.Table) -> pa.Table:
        # props isn't read; add a null literal only if the mapping needs it.
        return _events_to_transcripts_batch(batch)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
