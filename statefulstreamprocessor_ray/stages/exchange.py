"""Hash-exchange primitives over Ray Data's HASH_SHUFFLE machinery.

The dedup/pair pipelines were built on ``groupby(bucket).map_groups(fn)``,
which plans a SORT shuffle: at volume the sort is the superlinear term
(instrumented at 20 GiB: 763 s of an 1,113 s minhash run was the candidate
band-table sort). The semantics those pipelines actually need is far weaker
than a sort — "co-locate every row of a key into exactly one task" — which a
hash exchange provides in linear time. Ray 2.49 exposes it as
``Dataset.repartition(num_blocks=…, keys=[…])`` under
``DataContext.shuffle_strategy = HASH_SHUFFLE``.

Facts this module encodes (verified against Ray 2.49.2):

- The strategy is read from the chain's SHARED ``DataContext`` at execution
  time, not captured at plan-build time — so it must stay flipped until the
  pipeline is consumed. :func:`hash_shuffle_window` is that scope; any
  ``groupby`` consumed inside the window also runs hash-partitioned (same
  results, different exchange).
- Aggregator actors reserve ~1/16 CPU per partition, and the default
  ``default_hash_shuffle_parallelism`` (200) deadlocks a small cluster: the
  aggregator actors can never schedule under already-running map tasks
  (observed: a 200-partition shuffle on 8 CPUs hangs indefinitely). The
  window therefore ALWAYS bounds partitions and aggregators by cluster CPUs.
- ``HashShuffleAggregator.finalize`` emits exactly ONE block per partition
  (ray/data/_internal/execution/operators/hash_shuffle.py — the "TODO break
  down blocks to target size" is unimplemented in 2.49.2), so
  ``map_batches(fn, batch_size=None)`` after a keyed repartition sees every
  key's rows complete in a single call. tests/test_exchange.py pins this
  contract so a Ray upgrade that starts splitting partition blocks fails
  loudly instead of silently dropping pairs.
- Blocks whose schema is a plain dict (pandas simple blocks) spam a
  "Failed to hash the schemas" log line per aggregator; keep exchange
  payloads Arrow-backed (map fns feeding an exchange should emit
  ``pa.Table``).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Callable, Iterable, Iterator

import ray
import ray.data
from ray.data.context import ShuffleStrategy


def _cluster_cpus() -> int:
    try:
        return max(1, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8


def default_hash_partitions(num_partitions: int | None = None) -> int:
    """Partition count for hash exchanges: 2x cluster CPUs, min 16.

    Each partition costs ~1/16 CPU of aggregator reservation, so 2x CPUs
    keeps the shuffle's standing actor reservation at ~12% of the cluster —
    enough partitions for balance and per-partition memory bounds, small
    enough that aggregators schedule alongside the producing map tasks."""
    if num_partitions is not None:
        return num_partitions
    return max(16, _cluster_cpus() * 2)


@contextmanager
def hash_shuffle_window(
    ds: ray.data.Dataset, num_partitions: int | None = None
) -> Iterator[int]:
    """Scope within which ``ds``'s chain plans hash exchanges.

    Build AND consume the pipeline inside the ``with`` block — the strategy
    is read at execution time from the context shared along the chain, so a
    window left before consumption silently falls back to ValueError at plan
    time. Restores the caller's strategy/bounds on exit (the context is
    shared with the ROOT dataset: without the restore, every later stage on
    the same input would silently flip to hash aggregation too). Yields the
    bounded partition count to pass to :func:`hash_partitioned_map`."""
    ctx = ds.context
    n = default_hash_partitions(num_partitions)
    cpus = _cluster_cpus()
    saved = (
        ctx.shuffle_strategy,
        ctx.max_hash_shuffle_aggregators,
        ctx.default_hash_shuffle_parallelism,
    )
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.max_hash_shuffle_aggregators = max(2, cpus // 2)
    ctx.default_hash_shuffle_parallelism = n
    try:
        yield n
    finally:
        (
            ctx.shuffle_strategy,
            ctx.max_hash_shuffle_aggregators,
            ctx.default_hash_shuffle_parallelism,
        ) = saved


def hash_partitioned_map(
    ds: ray.data.Dataset,
    keys: Iterable[str],
    fn: Callable,
    num_partitions: int | None = None,
    batch_format: str = "pandas",
) -> ray.data.Dataset:
    """``groupby(keys).map_groups(fn)`` pendant with no sort anywhere: one
    hash exchange co-locates each key's rows into exactly one partition, and
    ``fn`` runs once per partition-block (``batch_size=None``) with every
    key it owns complete.

    Correct only for fns that handle a UNION of complete key groups (the
    pair emitters and group-sum aggregators here all sort/group by the real
    keys internally). Must be built and consumed inside
    :func:`hash_shuffle_window` on the same chain."""
    n = default_hash_partitions(num_partitions)
    rep = ds.repartition(num_blocks=n, keys=list(keys))
    return rep.map_batches(fn, batch_format=batch_format, batch_size=None)
