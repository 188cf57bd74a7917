"""Poll box health; run the official scaling pair the moment the host recovers.

The round-5 sandbox host intermittently degrades its first-touch page-fault
path (see scripts/boxhealth.py) — under degradation the two-parallelism
scaling ratio measures the host, not the engine. This watcher polls the probe
every POLL_S seconds, appends readings to /tmp/ssp_health_log.jsonl, and when
two consecutive probes read healthy (fresh_alloc >= HEALTHY_GB_S) it runs
``bench.py --scaling`` once with the official settings and writes the result
to /tmp/ssp_scaling_recovered.json, then exits.

Usage: python scripts/health_watch.py [max_hours]
"""

import json
import os
import subprocess
import sys
import time

import boxhealth

POLL_S = 600
HEALTHY_GB_S = 2.0
LOG = "/tmp/ssp_health_log.jsonl"
OUT = "/tmp/ssp_scaling_recovered.json"


def main() -> None:
    max_hours = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    deadline = time.time() + max_hours * 3600
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    streak = 0
    while time.time() < deadline:
        h = boxhealth.measure()
        h["ts"] = round(time.time(), 1)
        with open(LOG, "a") as f:
            f.write(json.dumps(h) + "\n")
        streak = streak + 1 if h["fresh_alloc_gb_s"] >= HEALTHY_GB_S else 0
        if streak >= 2:
            env = dict(os.environ, SCALING_REPS="3")
            out = subprocess.run(
                [sys.executable, os.path.join(repo, "bench.py"), "--scaling"],
                env=env,
                capture_output=True,
                text=True,
                cwd=repo,
            )
            if out.returncode == 0:
                with open(OUT, "w") as f:
                    f.write(out.stdout.strip().splitlines()[-1] + "\n")
                return
            streak = 0  # run failed; keep watching
        time.sleep(POLL_S)


if __name__ == "__main__":
    main()
