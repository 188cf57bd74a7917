"""Flagship pipeline: transcript replay -> ordered two-stream join -> T3 rows.

The Ray-Data re-expression of the reference's flagship entry point
(``05_LocalStreamBuffer/ts_join_with_kafka_eos.py``): assistant turns (left
stream) joined with tool-call turns (right stream) per conversation under the
LocalStreamBuffer ordering semantics, producing the flat r_*/s_* merge
projection (T3, FIXTURES.md).
"""

from __future__ import annotations

import ray.data

from statefulstreamprocessor_ray.functions.streams import StreamSpec
from statefulstreamprocessor_ray.stages.join import ordered_join

T3_COLUMNS = [
    "conv_id",
    "r_ts",
    "r_turn_idx",
    "r_text",
    "s_ts",
    "s_turn_idx",
    "s_text",
    "s_tool",
    "join_case",
    "emit_seq",
]


def flagship_join(
    transcripts: ray.data.Dataset,
    delta_time: float | None = None,
    spec: StreamSpec | None = None,
    max_join_cnt: int | None = None,
) -> ray.data.Dataset:
    """``max_join_cnt`` is the reference's MAX_JOIN_CNT early-stop
    (``ts_join_with_kafka_eos.py:32,166-169``) — Ray Data's ``limit`` stops
    the streaming executor once k joined rows exist (backpressure cancels
    upstream work, so this is a real early-stop, not a post-filter)."""
    joined = ordered_join(transcripts, spec=spec, delta_time=delta_time)
    out = joined.select_columns(T3_COLUMNS)
    if max_join_cnt is not None:
        out = out.limit(max_join_cnt)
    return out
