"""P4 string-branch parity: normalize_iso_to_seconds vs the reference's
``datetime.fromisoformat(x).replace(tzinfo=pytz.UTC).timestamp()``
(``05_LocalStreamBuffer/local_stream_buffer.py:77``) — fractional seconds
kept, any offset the string carries is parsed-then-OVERRIDDEN with UTC."""

from datetime import datetime, timezone

import math

import pyarrow as pa

from statefulstreamprocessor_ray.schema import (
    normalize_epoch_to_seconds,
    normalize_iso_to_seconds,
)


def _reference_extract_time(s: str) -> float:
    # fromisoformat + replace(tzinfo=UTC) is exactly the reference line; the
    # stdlib timezone.utc is pytz.UTC-equivalent for .timestamp()
    return datetime.fromisoformat(s).replace(tzinfo=timezone.utc).timestamp()


CASES = [
    "2021-04-23T10:00:00",
    "2021-04-23T10:00:00.123",  # fractional seconds (the round-1 gap)
    "2021-04-23T10:00:00.123456",
    "2021-04-23T10:00:00+00:00",
    "2021-04-23T10:00:00.123+00:00",
    "2021-04-23 10:00:00.5",  # space separator, fromisoformat-accepted
    "2021-04-23",  # date-only -> midnight UTC
    "2021-04-23T10:00:00+05",  # hour-only offset (3.11 fromisoformat)
    "2021-04-23T10:00+0530",  # no-colon offset, minute-precision time
    "2021-04-23T10:00:00-08:30:15",  # seconds-bearing offset
    "2021-04-23 10:00:00.5Z",  # Z suffix
]


def test_iso_fromisoformat_parity():
    got = normalize_iso_to_seconds(pa.array(CASES)).to_pylist()
    want = [_reference_extract_time(s) for s in CASES]
    assert got == want


def test_iso_offset_is_overridden_not_converted():
    # the reference DISCARDS the +05:00 (replace, not astimezone): both
    # strings must land on the same instant
    vals = normalize_iso_to_seconds(
        pa.array(["2021-04-23T10:00:00.123+05:00", "2021-04-23T10:00:00.123"])
    ).to_pylist()
    assert vals[0] == vals[1] == _reference_extract_time("2021-04-23T10:00:00.123")


def test_iso_outside_ns_range_rescued():
    # pandas ns datetimes cover ~1677-2262; the reference's fromisoformat
    # path succeeds far outside that — the per-row fallback must match it
    cases = ["1500-01-01T00:00:00", "2500-06-15T12:34:56.5", "0001-01-01"]
    got = normalize_iso_to_seconds(
        pa.array(cases + ["2021-04-23T10:00:00", "still-not-a-time"])
    ).to_pylist()
    assert got[:3] == [_reference_extract_time(s) for s in cases]
    assert got[3] == _reference_extract_time("2021-04-23T10:00:00")
    assert got[4] is None


def test_iso_invalid_becomes_null():
    out = normalize_iso_to_seconds(pa.array(["not-a-time", None, "2021-04-23T10:00:00"]))
    assert out[0].as_py() is None
    assert out[1].as_py() is None
    assert out[2].as_py() == _reference_extract_time("2021-04-23T10:00:00")


def test_epoch_branch_unchanged():
    # numeric branch: recursive /1000 until < 1e11 (ms/us/ns all normalize)
    sec = 1_619_172_000.5
    out = normalize_epoch_to_seconds(
        pa.array([sec, sec * 1e3, sec * 1e6, sec * 1e9])
    ).to_pylist()
    assert all(math.isclose(v, sec, rel_tol=1e-9) for v in out)
