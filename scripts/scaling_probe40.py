#!/usr/bin/env python3
"""8->32 pair on a 4x (40M-turn) corpus: if efficiency improves vs the 10M
corpus, the 10M gap is the shuffle's fixed coordination floor (amortizes
with data), not a bandwidth wall.

Usage: python scripts/scaling_probe40.py [one <cpus>]
"""

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = "/tmp/ssp_bench_corpus_40m_16000x2500"


def ensure_corpus() -> str:
    marker = os.path.join(CORPUS, "_done")
    if not os.path.exists(marker):
        from statefulstreamprocessor_ray import fixtures

        shutil.rmtree(CORPUS, ignore_errors=True)
        tbl = fixtures.transcripts_table(n_convs=16000, turns_per_conv=2500, seed=42)
        fixtures.write_transcripts(tbl, CORPUS, n_files=128)
        open(marker, "w").close()
    return CORPUS


def run_one(cpus: int) -> None:
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    tpath = ensure_corpus()

    from statefulstreamprocessor_ray.pipelines.flagship import flagship_join

    def read():
        import ray.data
        return ray.data.read_parquet(tpath, override_num_blocks=2 * cpus)

    flagship_join(read().limit(100_000), delta_time=5.0).count()
    best, n = 1e18, 0
    for _ in range(2):
        t0 = time.time()
        n = flagship_join(read(), delta_time=5.0).count()
        best = min(best, time.time() - t0)
    print(json.dumps({"cpus": cpus, "sec": round(best, 2), "rows": n,
                      "joins_per_sec": round(n / best)}))
    ray.shutdown()


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_one(int(sys.argv[2]))
        return
    ensure_corpus_proc = subprocess.run(
        [sys.executable, "-c",
         f"import sys; sys.path.insert(0, '{os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}'); "
         "import scripts.scaling_probe40 as p; p.ensure_corpus()"],
        capture_output=True, text=True, timeout=1200)
    if ensure_corpus_proc.returncode:
        print(ensure_corpus_proc.stderr[-500:]); sys.exit(1)
    best = {}
    for rep in range(2):
        for cpus in (8, 32):
            out = subprocess.run([sys.executable, __file__, "one", str(cpus)],
                                 capture_output=True, text=True, timeout=1200)
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if line:
                r = json.loads(line[-1]); r["rep"] = rep
                print(json.dumps(r), flush=True)
                best[cpus] = min(best.get(cpus, 1e18), r["sec"])
            else:
                print(f"FAILED {cpus}: {out.stderr[-400:]}", flush=True)
    if 8 in best and 32 in best:
        print(json.dumps({"corpus": "40M turns", "sec_8": best[8],
                          "sec_32": best[32],
                          "efficiency_8_32": round(best[8] / best[32] / 4, 3)}))


if __name__ == "__main__":
    main()
