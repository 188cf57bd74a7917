#!/usr/bin/env python3
"""Substantiate the 8->32 scaling analysis: is the flagship join's one
sort-shuffle byte-bound on this single box?

Cells: {8, 32} CPUs x {full payload, slim payload (ints only)} — if the
slim variant scales markedly better 8->32, the gap is byte movement
(memory-bus / object-store bandwidth), not scheduling.

Usage:
  python scripts/scaling_probe.py            # orchestrate
  python scripts/scaling_probe.py one <cpus> <variant>
"""

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STATS_DIR = "/tmp/ssp_scaling_probe"


def run_one(cpus: int, variant: str) -> None:
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    import bench
    bench.NUM_CPUS = cpus
    tpath = bench.corpus_path("0.1")

    from statefulstreamprocessor_ray.stages.join import ordered_join

    payload = ("turn_idx", "text", "tool") if variant == "full" else ("turn_idx",)

    def read():
        import ray.data
        return ray.data.read_parquet(tpath, override_num_blocks=2 * cpus)

    ordered_join(read().limit(100_000), delta_time=5.0, payload_cols=payload).count()
    best, n, stats_txt = 1e18, 0, ""
    for _ in range(2):
        t0 = time.time()
        m = ordered_join(read(), delta_time=5.0, payload_cols=payload).materialize()
        dt = time.time() - t0
        n = m.count()
        if dt < best:
            best, stats_txt = dt, m.stats()
        del m
    os.makedirs(STATS_DIR, exist_ok=True)
    with open(f"{STATS_DIR}/stats_{variant}_{cpus}.txt", "w") as f:
        f.write(stats_txt)
    try:
        from ray._private.internal_api import memory_summary
        mem = memory_summary(stats_only=True)
    except Exception as e:
        mem = f"unavailable: {e}"
    with open(f"{STATS_DIR}/mem_{variant}_{cpus}.txt", "w") as f:
        f.write(mem)
    spilled = re.search(r"Spilled (\d+) MiB", mem)
    print(json.dumps({"cpus": cpus, "variant": variant, "sec": round(best, 2),
                      "rows": n, "spilled_mib": int(spilled.group(1)) if spilled else 0}))
    ray.shutdown()


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_one(int(sys.argv[2]), sys.argv[3])
        return
    results = []
    for rep in range(2):
        for cpus in (8, 32):
            for variant in ("full", "slim"):
                out = subprocess.run(
                    [sys.executable, __file__, "one", str(cpus), variant],
                    capture_output=True, text=True, timeout=900,
                )
                line = [l for l in out.stdout.splitlines() if l.startswith("{")]
                if line:
                    r = json.loads(line[-1]); r["rep"] = rep
                    results.append(r); print(json.dumps(r), flush=True)
                else:
                    print(f"FAILED {cpus} {variant}: {out.stderr[-400:]}", flush=True)
    best = {}
    for r in results:
        k = (r["variant"], r["cpus"])
        best[k] = min(best.get(k, 1e18), r["sec"])
    for variant in ("full", "slim"):
        lo, hi = best.get((variant, 8)), best.get((variant, 32))
        if lo and hi:
            print(json.dumps({"variant": variant, "sec_8": lo, "sec_32": hi,
                              "efficiency_8_32": round(lo / hi / 4, 3)}))


if __name__ == "__main__":
    main()
