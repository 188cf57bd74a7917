"""Box-health microbench: steady-state vs first-touch memory throughput.

The scaling pair is only interpretable when the box's page-fault path is
healthy. This sandbox's host intermittently degrades first-touch (fresh
mmap) page faults to ~0.15 GB/s single-process with a machine-wide cap of
~0.75 GB/s under concurrency (measured 2026-08-18: N=1 0.15, N=4 0.58,
N=16 0.74 GB/s aggregate), while steady-state memcpy stays at ~11 GB/s.
Under that condition any job that streams fresh GBs through workers and the
object store is fault-capped regardless of CPU count, so a two-parallelism
ratio measures the host's fault ceiling, not the engine. bench.py --scaling
embeds this probe's numbers in its JSON so a degraded-box measurement is
visible as such.

Usage: python scripts/boxhealth.py  -> one JSON line
"""

import json
import time


def measure(size_mb: int = 512) -> dict:
    import numpy as np

    n = size_mb * 1024 * 1024
    # fresh-alloc: allocate + first-touch-write new pages (the path plasma
    # writes and new Arrow buffers take)
    t0 = time.time()
    a = np.ones(n, dtype=np.uint8)
    fresh_s = time.time() - t0
    # steady-state: copy into an already-faulted buffer
    b = np.empty_like(a)
    np.copyto(b, a)  # fault b once, untimed
    t0 = time.time()
    np.copyto(b, a)
    steady_s = time.time() - t0
    gb = n / 2**30
    return {
        "fresh_alloc_gb_s": round(gb / fresh_s, 2),
        "steady_memcpy_gb_s": round(gb / steady_s, 2),
        "fault_degraded": bool(gb / fresh_s < 1.0),
    }


if __name__ == "__main__":
    print(json.dumps(measure()))
