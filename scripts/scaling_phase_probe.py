"""Phase-split instrumentation for the 80M-turn scaling pair.

Runs the flagship plan at one parallelism level and times its two physical
phases separately:

  phase A  read -> derive_streams -> prune -> add_shard -> materialize
  phase B  sort exchange over _shard -> vectorized replay join -> count

Usage: python scripts/scaling_phase_probe.py NCPU [corpus]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray
import ray.data
from ray.data import DataContext

NCPU = int(sys.argv[1])
CORPUS = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ssp_bench_corpus_80m_32000x2500"


def main():
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from statefulstreamprocessor_ray.functions.streams import StreamSpec
    from statefulstreamprocessor_ray.stages.join import replay_join_multikey

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    from statefulstreamprocessor_ray.functions.streams import derive_streams
    from statefulstreamprocessor_ray.pipelines.flagship import T3_COLUMNS

    spec = StreamSpec()
    n_shards = max(32, NCPU * 8)
    payload_cols = ("turn_idx", "text", "tool")
    delta_us = 5_000_000

    def add_shard(b: pa.Table) -> pa.Table:
        keys = b["conv_id"].to_pandas()
        h = pd.util.hash_array(keys.to_numpy(), categorize=False)
        return b.append_column(
            "_shard", pa.array((h % np.uint64(n_shards)).astype(np.int32), pa.int32())
        )

    def join_fn(group: pa.Table) -> pa.Table:
        group = group.drop_columns(["_shard"])
        return replay_join_multikey(
            group, key_col="conv_id", ts_col="ts", tie_col="turn_idx",
            payload_cols=payload_cols, delta_us=delta_us,
        )

    # warm-up (page cache + worker pool), untimed
    ray.data.read_parquet(CORPUS, override_num_blocks=2 * NCPU).count()

    t0 = time.time()
    ds = ray.data.read_parquet(CORPUS, override_num_blocks=2 * NCPU)
    events = derive_streams(ds, spec)
    needed = ["conv_id", "ts", "turn_idx", "stream_side", *payload_cols]
    events = events.select_columns(list(dict.fromkeys(needed)))
    tagged = events.map_batches(add_shard, batch_format="pyarrow",
                                zero_copy_batch=True)
    mat = tagged.materialize()
    t1 = time.time()
    sz = mat.size_bytes()
    joined = mat.groupby("_shard").map_groups(
        join_fn, batch_format="pyarrow", num_cpus=1
    ).select_columns(T3_COLUMNS)
    n = joined.count()
    t2 = time.time()
    print(f"ncpu={NCPU} phaseA_mat={t1-t0:.2f}s phaseB_join={t2-t1:.2f}s "
          f"total={t2-t0:.2f}s rows={n} mat_bytes={sz/2**30:.2f}GiB")
    if os.environ.get("SSP_PROBE_STATS"):
        print(joined.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
