#!/usr/bin/env python3
"""A/B the flagship join's one all-to-all exchange: sort-shuffle (default)
vs Ray 2.49's experimental hash-shuffle, at two CPU levels in fresh
processes. Evidence base for BASELINE.md's 8->32 scaling analysis.

Usage:
  python scripts/shuffle_experiment.py            # orchestrate all 4 cells
  python scripts/shuffle_experiment.py one <cpus> <strategy> [reps]
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(cpus: int, strategy: str, reps: int = 2) -> None:
    import ray
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    if strategy == "hash":
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE

    import bench
    bench.NUM_CPUS = cpus
    tpath = bench.corpus_path("0.1")

    from statefulstreamprocessor_ray.pipelines.flagship import flagship_join

    def read():
        import ray.data
        return ray.data.read_parquet(tpath, override_num_blocks=2 * cpus)

    flagship_join(read().limit(100_000), delta_time=5.0).count()  # warm-up
    best, n = 1e18, 0
    for _ in range(reps):
        t0 = time.time()
        n = flagship_join(read(), delta_time=5.0).count()
        best = min(best, time.time() - t0)
    print(json.dumps({"cpus": cpus, "strategy": strategy, "sec": round(best, 2),
                      "rows": n, "joins_per_sec": round(n / best)}))
    ray.shutdown()


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_one(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]) if len(sys.argv) > 4 else 2)
        return
    results = []
    # interleave cells so box-load drift hits both strategies equally
    for rep in range(2):
        for cpus in (8, 32):
            for strategy in ("sort", "hash"):
                out = subprocess.run(
                    [sys.executable, __file__, "one", str(cpus), strategy, "1"],
                    capture_output=True, text=True, timeout=1800,
                )
                line = [l for l in out.stdout.splitlines() if l.startswith("{")]
                if line:
                    r = json.loads(line[-1])
                    r["rep"] = rep
                    results.append(r)
                    print(json.dumps(r), flush=True)
                else:
                    print(f"FAILED cpus={cpus} strategy={strategy}: {out.stderr[-500:]}",
                          flush=True)
    # min per cell
    summary = {}
    for r in results:
        key = f"{r['strategy']}_{r['cpus']}"
        summary[key] = min(summary.get(key, 1e18), r["sec"])
    for strat in ("sort", "hash"):
        lo, hi = summary.get(f"{strat}_8"), summary.get(f"{strat}_32")
        if lo and hi:
            eff = (lo / hi) / 4
            print(json.dumps({"strategy": strat, "sec_8": lo, "sec_32": hi,
                              "efficiency_8_32": round(eff, 3)}))


if __name__ == "__main__":
    main()
