"""Pipeline metrics (reference S10: throughput-metering consumer,
``06_DB_Connector/join_tester.py:36-66``; J6 counters,
``local_stream_buffer.py:150-152``).

A zero-CPU actor accumulates per-stage row/byte counters; ``metered`` wraps a
Dataset so every batch flowing through a named stage is counted without
changing its contents. Watermark-lag metrics live with the streaming job
(pipelines/streaming.py manifests)."""

from __future__ import annotations

import time

import ray
import ray.data


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self.stages: dict[str, dict] = {}
        self.t0 = time.time()

    def add(self, stage: str, rows: int, nbytes: int) -> None:
        s = self.stages.setdefault(stage, {"rows": 0, "bytes": 0, "batches": 0})
        s["rows"] += rows
        s["bytes"] += nbytes
        s["batches"] += 1

    def report(self) -> dict:
        dt = max(time.time() - self.t0, 1e-9)
        out = {}
        for stage, s in self.stages.items():
            out[stage] = dict(s, rows_per_s=s["rows"] / dt)
        return out


def metered(ds: ray.data.Dataset, actor, stage: str) -> ray.data.Dataset:
    """Pass-through stage that counts rows/bytes into the metrics actor.

    Adds are FIRE-AND-FORGET from the workers (the hot path never blocks on
    the metrics actor), so a report taken immediately after the pipeline
    finishes may lag by in-flight adds — poll or tolerate slack when exact
    totals matter (S10 is throughput metering, not an audit log)."""
    import pyarrow as pa

    def fn(batch: pa.Table) -> pa.Table:
        actor.add.remote(stage, batch.num_rows, batch.nbytes)
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
