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
- ONE big shuffle alive at a time: each HashShuffleOperator's aggregator
  fleet reserves ~1/16 CPU per partition for the op's whole lifetime, so
  two chained token-volume exchanges running concurrently reserve most
  of a node and starve the map tasks (measured: a 2 GiB tfidf probe ran
  at ~13/32 CPUs busy, 1145 s; barriered via ``materialize()`` between
  windows it ran 355 s). Chain without a barrier only when the second
  exchange's payload is much smaller than the first's (e.g. Jaccard
  pair partials).
- Partition on fixed-width integer keys: string-keyed shuffles split
  blocks at ~2.8 s per 41 MB (hash + 200 takes over string arrays);
  precompute a uint64 hash column and repartition on that, carrying the
  string as payload only where the output needs it.
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
    """Partition count for hash exchanges: half the cluster CPUs, min 16.

    Measured on 32 CPUs at sf0.1: the exchange pays a ~80 ms fixed cost PER
    PARTITION (shard-submission RPCs + per-partition finalize + downstream
    task), linear in the partition count and independent of the aggregator
    count — 16 partitions ran the same candidate phase in 1.8 s that 64
    partitions ran in 5.2 s and 128 in 10.2 s. Partitions only need to (a)
    give every aggregator work and (b) bound per-partition finalize memory,
    so the default scales with cluster size, not a fixed multiple of it;
    callers with known-huge inputs pass a larger count explicitly."""
    if num_partitions is not None:
        return num_partitions
    return max(16, _cluster_cpus() // 2)


TARGET_PARTITION_BYTES = 32 << 20  # ~32 MB/partition: the 5 GiB sweep's optimum


def sized_hash_partitions(size_bytes: int | None) -> int:
    """Partition count from the MEASURED exchange payload size.

    The 5 GiB candidate-phase sweep (32 CPUs, 1.9 GB band table):
    16 partitions 125 s, 64 partitions 64 s, 128 partitions 77 s, 256
    partitions 140 s — too few starves parallel finalize and blows up the
    in-partition sorts, too many drowns in the ~80-100 ms/partition fixed
    cost. ~32 MB per partition sits at the optimum and keeps per-partition
    finalize memory flat as data grows. Callers ``materialize()`` the table
    feeding the exchange (it must be fully resident for the shuffle barrier
    anyway) and pass its ``size_bytes()``."""
    cpus = _cluster_cpus()
    # floor: measured at sf0.1/32 CPUs on the minhash candidate exchange,
    # best-of-2: floor 16 -> 4.32 s, floor 8 -> 3.78 s, floor 4 -> 4.20 s
    # (each partition costs ~80-100 ms fixed; too few starves parallel
    # finalize). Only binds for small measured payloads — volume runs are
    # need-driven at ~32 MB/partition.
    lo = max(8, cpus // 4)
    hi = cpus * 16
    if not size_bytes:
        return lo
    need = -(-int(size_bytes) // TARGET_PARTITION_BYTES)
    return int(min(hi, max(lo, need)))


def small_exchange(size_bytes: int | None) -> bool:
    """True when the MEASURED exchange payload fits in one target partition
    (``TARGET_PARTITION_BYTES``): a hash shuffle cannot spread work that all
    fits a single task anyway, so its fixed costs — aggregator-actor
    spin-up plus ~80-100 ms per partition — are pure overhead. Callers
    route to :func:`local_keyed_map` instead. Measured at sf0.1/32 (cold):
    corpus_build's exact + Jaccard pair passes drop from 5.7 s + 8.8 s of
    exchange-dominated wall to single-task cost. Volume runs never take
    this branch (their payloads are GBs)."""
    return size_bytes is not None and size_bytes <= TARGET_PARTITION_BYTES


def local_keyed_map(
    ds: ray.data.Dataset, fn: Callable, batch_format: str = "pandas"
) -> ray.data.Dataset:
    """Small-payload pendant of :func:`hash_partitioned_map`: coalesce the
    (already materialized, one-partition-sized — see :func:`small_exchange`)
    dataset into a single block, where every key's rows are trivially
    complete, and run ``fn`` once in ONE worker task. No shuffle actors, no
    strategy window, no per-partition fixed cost; the work stays off the
    driver. Same fn contract as hash_partitioned_map (a union of complete
    key groups)."""
    return ds.repartition(1).map_batches(
        fn, batch_format=batch_format, batch_size=None
    )


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
    # aggregators scale with the partition count (volume sweep: 16 aggs beat
    # 8 on a 64-partition 1.9 GB exchange; on a 16-partition small one, extra
    # actors only add spin-up) but never reserve more than half the cluster
    ctx.max_hash_shuffle_aggregators = max(2, min(cpus // 2, n // 4))
    ctx.default_hash_shuffle_parallelism = n
    try:
        yield n
    finally:
        (
            ctx.shuffle_strategy,
            ctx.max_hash_shuffle_aggregators,
            ctx.default_hash_shuffle_parallelism,
        ) = saved


def keyed_repartition(
    ds: ray.data.Dataset,
    keys: Iterable[str],
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Materialized linear hash exchange: materialize ``ds`` (measuring it),
    size the exchange from the measured bytes, and hash-repartition on
    ``keys`` so each key's rows land complete in exactly one output block.
    Returns a MATERIALIZED dataset: callers follow with ``map_batches(fn,
    batch_size=None)`` OUTSIDE any strategy window — the aggregators emit
    one block per partition (contract pinned in tests/test_exchange.py), so
    batch_size=None sees whole partitions. The sub-partition payload case
    collapses to a single coalesced block — no shuffle actors at all.

    fn contract vs map_groups: fn receives a UNION of complete key groups
    (many shard values per partition), so it must group by the real keys
    internally."""
    mat = ds.materialize()
    sz = mat.size_bytes()
    if small_exchange(sz):
        return mat.repartition(1).materialize()
    n = sized_hash_partitions(sz) if num_partitions is None else num_partitions
    with hash_shuffle_window(mat, n):
        return mat.repartition(num_blocks=n, keys=list(keys)).materialize()


def default_exchange() -> str:
    """Core-stage exchange default: "auto" unless overridden via
    ``SSP_CORE_EXCHANGE`` ("auto" | "sort" | "hash") — the A/B knob the
    scaling/volume probes flip without code edits."""
    import os

    return os.environ.get("SSP_CORE_EXCHANGE", "auto")


def shard_exchange_map(
    tagged: ray.data.Dataset,
    fn: Callable,
    exchange: str | None = None,
    num_cpus: float = 1,
    batch_format: str = "pyarrow",
    shard_col: str = "_shard",
) -> ray.data.Dataset:
    """THE routing step for the core shard-vectorized event stages (flagship
    ordered join, as-of, sessions, windowed join, CEP, group-sum): take a
    ``_shard``-tagged dataset, co-locate each shard's rows, run ``fn`` once
    per partition. Routes (``exchange=None`` -> :func:`default_exchange`):

    - ``"auto"`` (default): materialize once — the measurement IS the
      router. Payloads at or under one target partition (~32 MB) run as a
      single coalesced task (no shuffle at all; measured 1.20 s -> 0.76 s
      on the sf0.1 windowed join); everything larger runs Ray's SORT
      shuffle over the int32 shard key on the already-materialized input
      (measured FASTER than the streaming sort: 1.78 s vs 1.89 s at 10M
      turns, 3.41 s vs 3.97 s at 40M turns, 32 CPUs).
    - ``"sort"``: the r4 streaming plan, ``groupby(_shard).map_groups``.
    - ``"hash"``: the linear hash repartition (:func:`keyed_repartition`).

    Routing verdict (round 5, refuting the r4 hypothesis that the sort
    shuffle's coordination floor binds the core stages' 8->32 scaling):
    the HASH exchange measured at the flagship's own volume points is
    strictly worse — 40M turns, 32 CPUs: 10.3-11.7 s end-to-end (exchange
    alone 5.4-7.1 s at ~250 MB/s aggregator throughput + ~2 s actor-fleet
    spin-up, invariant under partition/aggregator sweeps: (46,11) 5.38 s
    was the best of (n, aggs) in {8..256}x{3..32}) vs the sort's 3.4-4.0 s
    end-to-end; 8->32 efficiency 0.48 (hash) vs ~0.8 (sort). The sort is
    superlinear only on huge/skewed exchanges (the dedup candidate tables,
    763 s at 20 GiB) — THOSE stay on the hash layer; these low-cardinality
    int32-keyed medium exchanges are exactly where the sort is at its
    best. fn must handle a UNION of complete key groups in every mode
    ("auto" small path and "hash" pack many shards per call)."""
    if exchange is None:
        exchange = default_exchange()
    if exchange == "sort":
        return tagged.groupby(shard_col).map_groups(
            fn, batch_format=batch_format, num_cpus=num_cpus
        )
    if exchange == "hash":
        return keyed_repartition(tagged, [shard_col]).map_batches(
            fn, batch_format=batch_format, batch_size=None, num_cpus=num_cpus
        )
    if exchange != "auto":
        raise ValueError(f"exchange must be auto|sort|hash, got {exchange!r}")
    mat = tagged.materialize()
    if small_exchange(mat.size_bytes()):
        return mat.repartition(1).map_batches(
            fn, batch_format=batch_format, batch_size=None, num_cpus=num_cpus
        )
    return mat.groupby(shard_col).map_groups(
        fn, batch_format=batch_format, num_cpus=num_cpus
    )


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
