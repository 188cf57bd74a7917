"""Arrow schemas and timestamp normalization for the engine.

Schemas mirror FIXTURES.md T1-T3; the normalization rule mirrors the reference's
``Record.extract_time`` (``05_LocalStreamBuffer/local_stream_buffer.py:70-82``):
numeric timestamps are divided by 1000 while >= 1e11 (collapsing ms/us/ns to
seconds) and ISO-8601 strings parse as UTC. We express it vectorized over Arrow.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

US = 1_000_000  # microseconds per second

# T1 — primary input: multi-turn conversation transcripts.
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# T2 — normalized narrow event stream (internal form; Kafka-record analog with
# (src_partition, src_offset) provenance replacing (topic, partition, offset),
# reference ``ts_join_with_kafka_eos.py:151-156``).
EVENT_SCHEMA = pa.schema(
    [
        ("key", pa.string()),
        ("stream_side", pa.int8()),  # 0 = left/R, 1 = right/S
        ("ts", pa.timestamp("us")),
        ("result", pa.string()),
        ("turn_idx", pa.int32()),
        ("src_partition", pa.int32()),
        ("src_offset", pa.int64()),
    ]
)

# T3 — ordered-join output (default merge projection analog,
# ``local_stream_buffer.py:383-389``: flat r.*/s.* columns).
JOINED_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("r_ts", pa.timestamp("us")),
        ("r_turn_idx", pa.int32()),
        ("r_text", pa.string()),
        ("s_ts", pa.timestamp("us")),
        ("s_turn_idx", pa.int32()),
        ("s_text", pa.string()),
        ("s_tool", pa.string()),
        ("join_case", pa.string()),
        ("emit_seq", pa.int64()),
    ]
)

# Windowed-aggregate output (Flink pendant, ``StreamJoiner.java:134-172``).
WINDOWED_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("window_id", pa.int64()),
        ("window_start", pa.timestamp("us")),
        ("window_end", pa.timestamp("us")),
        ("r_text", pa.string()),
        ("s_text", pa.string()),
        ("result_text", pa.string()),
        ("level", pa.int8()),
    ]
)


def normalize_epoch_to_seconds(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized ``extract_time`` for numeric epochs: ÷1000 while >= 1e11.

    A value can be at most ns-scale (~1e18), so three applications suffice to
    reach seconds (< 1e11). Matches the reference's recursive semantics
    (``local_stream_buffer.py:77-82``) for all finite numeric inputs.
    """
    out = pc.cast(arr, pa.float64())
    for _ in range(3):
        out = pc.if_else(pc.greater_equal(out, 1e11), pc.divide(out, 1000.0), out)
    return out


# A UTC offset is only valid AFTER a time-of-day (fromisoformat grammar), so
# the pattern anchors on a preceding HH:MM[:SS[.ffffff]] and keeps it via the
# \1 backreference — hour-only offsets ('+05') are then unambiguous, while a
# date-only string's trailing '-23' never matches (no time before it).
_ISO_OFFSET_RE = (
    r"^(.*[0-9]:[0-9]{2}(:[0-9]{2})?(\.[0-9]+)?)"
    r"([Zz]|[+-][0-9]{2}(:?[0-9]{2})?(:[0-9]{2}(\.[0-9]+)?)?)$"
)


def normalize_iso_to_seconds(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """ISO-8601 strings -> UTC epoch seconds (float), the string branch of
    ``extract_time`` (``local_stream_buffer.py:77``).

    fromisoformat parity: fractional seconds are kept, and a trailing UTC
    offset is parsed-then-DISCARDED — the reference does
    ``fromisoformat(x).replace(tzinfo=pytz.UTC).timestamp()``, which
    OVERRIDES whatever offset the string carried and reads the wall-clock
    fields as UTC — so we strip the offset suffix and parse naive.
    Unparseable strings become null (the reference raises; null is this
    engine's documented column-oriented divergence). Valid ISO strings
    OUTSIDE pandas' ns-datetime range (years <1677 / >2262) fall back to
    a per-row ``datetime.fromisoformat`` pass — only the rows the
    vectorized parser coerced to NaT pay it — matching the reference's
    fromisoformat path instead of silently nulling them."""
    import pandas as pd

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    stripped = pc.replace_substring_regex(
        arr, pattern=_ISO_OFFSET_RE, replacement=r"\1"
    )
    # pandas' ISO8601 fast path: vectorized C parser, fractional seconds and
    # date-only forms included; errors coerce to NaT
    ts = pd.to_datetime(stripped.to_pandas(), format="ISO8601", errors="coerce")
    mask = ts.isna().to_numpy()
    # float-division parity with datetime.timestamp(): the reference divides
    # TOTAL MICROSECONDS by 1e6 (timedelta.total_seconds()); ns/1e9 rounds
    # differently in float64 (…1230001 vs …123)
    us = ts.astype("int64").to_numpy() // 1000
    secs = us.astype(np.float64) / 1e6
    if mask.any():
        # rescue valid-but-out-of-ns-range rows (rare: only NaT rows loop)
        from datetime import datetime, timezone

        idx = np.nonzero(mask)[0]
        failed = stripped.take(pa.array(idx, pa.int64())).to_pylist()
        for pos, s in zip(idx, failed):
            if s is None:
                continue
            try:
                dt = datetime.fromisoformat(s)
            except ValueError:
                continue
            secs[pos] = dt.replace(tzinfo=timezone.utc).timestamp()
            mask[pos] = False
    return pa.array(np.where(mask, np.nan, secs), pa.float64(), mask=mask)


def ts_to_us(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """timestamp[any unit] -> int64 microseconds (the engine's internal clock)."""
    return pc.cast(pc.cast(arr, pa.timestamp("us")), pa.int64())


def us_to_ts(arr) -> pa.Array:
    """int64 microseconds -> timestamp[us]."""
    return pc.cast(pa.array(arr, type=pa.int64()), pa.timestamp("us"))
