"""Stream derivation: one wide input table -> two tagged event streams.

The analog of the reference's wide-row explode + quantity routing
(``03_Stream_Connector/stream_connector.py:40-52`` and the joiner's
quantity-based routing ``ts_join_with_kafka_eos.py:158-164``): a single
vectorized ``map_batches`` produces the union of the left-filtered and
right-filtered rows with a ``stream_side`` tag (0=left, 1=right), so the
downstream join needs only ONE shuffle over the tagged union.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

MaskFn = Callable[[pa.Table], pa.ChunkedArray]


def _default_left(batch: pa.Table):
    return pc.equal(batch["role"], "assistant")


def _default_right(batch: pa.Table):
    return pc.is_valid(batch["tool"])


@dataclass
class StreamSpec:
    """Left/right stream predicates over the input table (FIXTURES.md T1:
    left = assistant turns, right = tool-call turns)."""

    key_col: str = "conv_id"
    ts_col: str = "ts"
    tie_col: str = "turn_idx"
    left_mask: MaskFn = field(default=_default_left)
    right_mask: MaskFn = field(default=_default_right)


def tag_streams_batch(batch: pa.Table, spec: StreamSpec) -> pa.Table:
    lt = batch.filter(spec.left_mask(batch))
    rt = batch.filter(spec.right_mask(batch))
    lt = lt.append_column("stream_side", pa.array([0] * lt.num_rows, pa.int8()))
    rt = rt.append_column("stream_side", pa.array([1] * rt.num_rows, pa.int8()))
    out = pa.concat_tables([lt, rt])
    return out


def derive_streams(ds: ray.data.Dataset, spec: StreamSpec | None = None) -> ray.data.Dataset:
    spec = spec or StreamSpec()
    return ds.map_batches(
        lambda b: tag_streams_batch(b, spec),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
