"""Watermark tracking and lateness handling.

The reference gets watermarks from Flink's ascending-timestamp extractor per
Kafka partition (``StreamJoiner.java:57-71``) with ``allowedLateness(250 ms)``;
the LocalStreamBuffer's implicit frontier is the other stream's buffer tail
(strip rule). Engine design (SURVEY §2.6): each input partition reports its
max event time; the global watermark is the minimum across partitions minus
allowed lateness. A single tiny actor (num_cpus=0) holds the frontier —
per-batch updates are cheap aggregate values, not data rows.
"""

from __future__ import annotations

import ray


@ray.remote(num_cpus=0)
class WatermarkTracker:
    """Tracks per-partition event-time frontiers + a late-row counter."""

    def __init__(self, allowed_lateness_us: int = 0):
        self.lateness = allowed_lateness_us
        self.frontiers: dict[int, int] = {}
        self.late_rows = 0

    def update(self, partition_id: int, max_ts_us: int) -> int:
        cur = self.frontiers.get(partition_id)
        if cur is None or max_ts_us > cur:
            self.frontiers[partition_id] = max_ts_us
        return self.watermark()

    def watermark(self) -> int:
        if not self.frontiers:
            return -(2**62)
        return min(self.frontiers.values()) - self.lateness

    def add_late(self, n: int) -> None:
        self.late_rows += n

    def stats(self) -> dict:
        return {
            "watermark_us": self.watermark(),
            "late_rows": self.late_rows,
            "partitions": dict(self.frontiers),
            "allowed_lateness_us": self.lateness,
        }


def split_late(batch, watermark_us: int, ts_col: str = "ts"):
    """Vectorized late/on-time split of an Arrow batch against a watermark.

    Events with ts < watermark are late (beyond allowed lateness, since the
    tracker already subtracts it) and are dropped-and-counted, mirroring
    Flink's side-output-less drop.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    t = pc.cast(pc.cast(batch[ts_col], pa.timestamp("us")), pa.int64())
    late_mask = pc.less(t, watermark_us)
    n_late = pc.sum(pc.cast(late_mask, pa.int64())).as_py() or 0
    on_time = batch.filter(pc.invert(late_mask))
    return on_time, n_late
