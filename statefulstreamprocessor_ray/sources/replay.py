"""Rate-limited stream replayer (reference S2: ``01_Simulator/simulator.py:26-57``
publishes each line at SAMPLE_RATE msgs/s, optionally looping forever).

In the engine the replay source is a Dataset consumed as micro-batches; the
rate limit exists for latency experiments — throughput paths should iterate
unthrottled (Ray Data streaming execution already paces by backpressure).
"""

from __future__ import annotations

import time
from typing import Iterator

import pyarrow as pa
import ray.data


def replay_batches(
    ds: ray.data.Dataset,
    rate_rows_per_s: float | None = None,
    batch_size: int = 1024,
    loop: bool = False,
    max_rows: int | None = None,
) -> Iterator[pa.Table]:
    """Yield Arrow batches, optionally throttled to ``rate_rows_per_s`` and
    looping over the dataset (the simulator's ``while True`` replay).

    ``max_rows`` bounds total emission (the reference's READ_FIRST_N analog,
    ``simulatorToKafka.py:37-41``)."""
    emitted = 0
    start = time.monotonic()
    while True:
        for batch in ds.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
            if max_rows is not None and emitted + batch.num_rows > max_rows:
                batch = batch.slice(0, max_rows - emitted)
            if batch.num_rows == 0:
                return
            if rate_rows_per_s:
                due = start + emitted / rate_rows_per_s
                delay = due - time.monotonic()
                if delay > 0:
                    time.sleep(delay)
            emitted += batch.num_rows
            yield batch
            if max_rows is not None and emitted >= max_rows:
                return
        if not loop:
            return
