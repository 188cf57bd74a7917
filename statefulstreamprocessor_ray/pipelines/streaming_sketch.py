"""Streaming sketch jobs: per-epoch cumulative DISTINCT-COUNT and TOP-K
snapshots over a GROWING stream with exactly-once emission.

The continuous-ingest form of ``stages/sketch.distinct_count``: events arrive
as files (arrival-order epochs, same protocol as ``streaming_dedup``); after
each epoch the job emits one snapshot row per (epoch, group) —
``n_distinct`` = distinct values of ``value_col`` seen in ALL epochs so far.
The classic stream-monitoring shape (unique users/domains per category over
an unbounded stream) the batch operator can't serve without re-reading the
whole history each epoch.

State and scale:

- values are 64-bit-hashed in phase 0 and sharded by ``hash % K`` — a given
  value ALWAYS lands on the same shard, so shard states are disjoint
  partitions of the value space and the global count is the plain SUM of
  per-shard counts: exact while every shard-group state is sparse, the sum
  of per-shard HLL estimates (of disjoint sets) past ``sparse_limit``.
- per-shard state is O(distinct) uint64 hashes per group while sparse,
  promoted to fixed 2^precision HLL registers when a group exceeds
  ``sparse_limit`` — after promotion the state STOPS growing, the property
  that makes an unbounded stream tractable.
- checkpoints are per-epoch DELTAS (each epoch's new hashes per group; the
  streaming_dedup lesson — re-snapshotting a never-shrinking state makes
  checkpoint bytes O(epochs x corpus)); dense groups snapshot their
  registers instead (fixed 2^precision bytes, cheaper than any delta).
- exactly-once: staged parts + atomic epoch manifests; a second run over
  committed input emits 0 rows; crash/resume equals the uninterrupted run;
  tail appends (new files -> new epochs) emit exactly the new snapshots.
- epochs are enumerated from the partition MARKER, not by listing partition
  dirs (an epoch whose batches produce no rows writes no dir but must still
  emit a snapshot — the ADVICE-r4 silent-loss class).

:class:`StreamingTopKJob` is the top-k companion: per-shard item counts
SpaceSaving-truncated to ``capacity`` (items shard by hash, so per-shard
counts are complete and the global top-k is a subset of the per-shard
top-k union), the cumulative truncation bound carried as ``err_bound`` on
every output row (0 == provably exact), state bounded at ``capacity`` rows
— full-snapshot checkpoints, no delta machinery needed.

No reference counterpart; extends the streaming surface (SURVEY.md §2
"beyond the reference") with unbounded-key streaming aggregates whose
state is a mergeable sketch rather than a window buffer.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from statefulstreamprocessor_ray.sinks.exactly_once import ExactlyOnceParquetSink
from statefulstreamprocessor_ray.stages.sketch import _hll_estimate, _hll_registers
from statefulstreamprocessor_ray.state.checkpoint import CheckpointStore

# value hashes come from pd.util.hash_array: a pandas upgrade that changes
# the hash makes old checkpoint deltas silently stop matching new batches
# (over-count instead of over-emit) — tag checkpoints and abort the resume
# on mismatch, like streaming_dedup's CONTENT_HASH_SCHEME
VALUE_HASH_SCHEME = f"hash_array-pd{pd.__version__}"


@dataclass
class StreamingDistinctConfig:
    input_path: str  # directory of parquet files (arrival order = sorted names)
    work_dir: str
    out_dir: str
    n_shards: int = 4
    files_per_epoch: int = 1
    group_col: str = "event_type"
    value_col: str = "user_id"
    precision: int = 12
    sparse_limit: int = 65536
    intermediate_compression: str = "none"  # see streaming.py note


def partition_distinct_input(cfg: StreamingDistinctConfig) -> tuple[str, int]:
    """Phase 0: hash values, dedupe per (group, hash) within each batch (the
    map-side combiner — the exchange carries at most one row per distinct
    (group, value) per batch), hive-partition by (shard, epoch). Same
    marker/tail protocol as ``streaming_dedup.partition_dedup_input``.
    Returns (part_dir, n_epochs) with n_epochs from the marker."""
    import ray.data

    part_dir = os.path.join(cfg.work_dir, "distinct_partitioned")
    marker = os.path.join(part_dir, "_partition_done.json")
    files = sorted(
        os.path.join(cfg.input_path, f)
        for f in os.listdir(cfg.input_path)
        if f.endswith(".parquet")
    )
    fingerprint = [[f, os.path.getsize(f)] for f in files]
    layout = {
        "n_shards": cfg.n_shards,
        "columns": [cfg.group_col, cfg.value_col],
        "files_per_epoch": cfg.files_per_epoch,
        "scheme": VALUE_HASH_SCHEME,
    }
    done = None
    tail_from: int | None = None
    if os.path.exists(marker):
        with open(marker) as m:
            done = json.load(m)
        layout_ok = all(done.get(k) == v for k, v in layout.items())
        if layout_ok and done["fingerprint"] == fingerprint:
            return part_dir, int(done["n_epochs"])
        if (
            layout_ok
            and len(fingerprint) > len(done["fingerprint"])
            and done["fingerprint"] == fingerprint[: len(done["fingerprint"])]
        ):
            tail_from = len(done["fingerprint"])

    n_shards, group_col, value_col = cfg.n_shards, cfg.group_col, cfg.value_col

    def tag(batch: pa.Table, epoch: int) -> pa.Table:
        df = batch.select([group_col, value_col]).to_pandas()
        df = df[df[value_col].notna()]
        h = pd.util.hash_array(df[value_col].to_numpy())
        part = pd.DataFrame({group_col: df[group_col].to_numpy(), "h": h})
        part = part.drop_duplicates([group_col, "h"])
        hh = part["h"].to_numpy(np.uint64)
        return pa.table(
            {
                group_col: pa.array(part[group_col], pa.string()),
                "h": pa.array(hh.view(np.int64), pa.int64()),
                "shard": pa.array((hh % np.uint64(n_shards)).astype(np.int32), pa.int32()),
                "epoch": pa.array(np.full(len(part), epoch, np.int64), pa.int64()),
            }
        )

    tmp = os.path.join(cfg.work_dir, "_distinct_partition_tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    if tail_from is not None:
        new_files = files[tail_from:]
        next_epoch = int(done["n_epochs"])
        groups = [
            new_files[g : g + cfg.files_per_epoch]
            for g in range(0, len(new_files), cfg.files_per_epoch)
        ]
    else:
        next_epoch = 0
        groups = [
            files[g : g + cfg.files_per_epoch]
            for g in range(0, len(files), cfg.files_per_epoch)
        ]
    for gi, group in enumerate(groups):
        ds = ray.data.read_parquet(group, columns=[group_col, value_col]).map_batches(
            lambda b, e=next_epoch + gi: tag(b, e),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        ds.write_parquet(
            tmp,
            partition_cols=["shard", "epoch"],
            compression=cfg.intermediate_compression,
        )
    if tail_from is not None:
        for sd in sorted(os.listdir(tmp)) if os.path.isdir(tmp) else []:
            if not sd.startswith("shard="):
                continue
            os.makedirs(os.path.join(part_dir, sd), exist_ok=True)
            for ed in sorted(os.listdir(os.path.join(tmp, sd))):
                dst = os.path.join(part_dir, sd, ed)
                if os.path.isdir(dst):  # leftover of a crashed prior attempt
                    shutil.rmtree(dst)
                os.replace(os.path.join(tmp, sd, ed), dst)
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        shutil.rmtree(part_dir, ignore_errors=True)
        os.replace(tmp, part_dir)
    n_epochs = next_epoch + len(groups)
    with open(marker, "w") as m:
        json.dump(dict(layout, fingerprint=fingerprint, n_epochs=n_epochs), m)
    return part_dir, n_epochs


@ray.remote
class DistinctShardActor:
    """One shard's per-group distinct-value state across epochs:
    sparse = sorted uint64 hash array (exact), dense = HLL registers."""

    def __init__(self, shard_id: int, cfg_dict: dict, ckpt_dir: str):
        self.shard_id = shard_id
        self.group_col = cfg_dict["group_col"]
        self.precision = cfg_dict["precision"]
        self.sparse_limit = cfg_dict["sparse_limit"]
        self.sparse: dict[str, np.ndarray] = {}
        self.dense: dict[str, np.ndarray] = {}
        self.ckpt = CheckpointStore(ckpt_dir)

    def _promote(self, g: str) -> None:
        if g in self.sparse and len(self.sparse[g]) > self.sparse_limit:
            regs = _hll_registers(self.sparse[g], self.precision)
            if g in self.dense:
                regs = np.maximum(regs, self.dense[g])
            self.dense[g] = regs
            del self.sparse[g]

    def restore(
        self, last_committed_epoch: int, committed_epochs: list[int] | None = None
    ) -> int:
        self.sparse, self.dense = {}, {}
        if last_committed_epoch < 0:
            self.ckpt.prune_after(self.shard_id, -(2**62))
            return -1
        found = [
            e for e in self.ckpt.epochs(self.shard_id) if e <= last_committed_epoch
        ]
        self.ckpt.prune_after(self.shard_id, last_committed_epoch)
        if not found:
            return -1
        if committed_epochs is not None and sorted(found) != sorted(committed_epochs):
            return -1
        for e in sorted(found):
            snap = self.ckpt.load(self.shard_id, e)
            if str(snap.get("scheme", "")) != VALUE_HASH_SCHEME:
                return -1  # hash-scheme drift: clean resume-abort
            # snap payload: {"groups": [...], "deltas": [arr...],
            #                "dense_groups": [...], "regs": [arr...]}
            for g, d in zip(list(snap["groups"]), list(snap["deltas"])):
                d = np.asarray(d, np.uint64)
                cur = self.sparse.get(g)
                self.sparse[g] = d if cur is None else np.concatenate([cur, d])
            for g, r in zip(list(snap["dense_groups"]), list(snap["regs"])):
                r = np.asarray(r, np.uint8)
                self.dense[g] = np.maximum(self.dense.get(g, r), r)
                self.sparse.pop(g, None)
        for g in list(self.sparse):
            self.sparse[g] = np.unique(self.sparse[g])
            self._promote(g)
        return max(found)

    def _counts(self) -> dict:
        out = {g: int(len(v)) for g, v in self.sparse.items()}
        out.update({g: _hll_estimate(r) for g, r in self.dense.items()})
        return out

    def process_epoch(self, epoch: int, epoch_dir: str | None) -> dict:
        """Merge one epoch's (group, hash) rows into state, delta-checkpoint,
        return this shard's per-group cumulative counts."""
        groups_d: list[str] = []
        deltas: list[np.ndarray] = []
        if epoch_dir is not None and os.path.isdir(epoch_dir):
            t = pq.read_table(epoch_dir)
            if t.num_rows:
                df = pd.DataFrame(
                    {
                        "g": t[self.group_col].to_pandas(),
                        "h": t["h"].to_numpy(zero_copy_only=False).view(np.uint64),
                    }
                )
                for g, sub in df.groupby("g", sort=False):
                    new = np.unique(sub["h"].to_numpy(np.uint64))
                    if g in self.dense:
                        # past promotion the delta is absorbed into registers
                        self.dense[g] = np.maximum(
                            self.dense[g], _hll_registers(new, self.precision)
                        )
                        groups_d.append(g)
                        deltas.append(np.array([], np.uint64))
                        continue
                    cur = self.sparse.get(g, np.array([], np.uint64))
                    new = new[~np.isin(new, cur)]
                    if len(new):
                        self.sparse[g] = np.concatenate([cur, new])
                        self._promote(g)
                    groups_d.append(g)
                    deltas.append(new)
        self.ckpt.save(
            self.shard_id,
            epoch,
            {
                "groups": list(groups_d),
                "deltas": list(deltas),
                "dense_groups": list(self.dense),
                "regs": [self.dense[g] for g in self.dense],
                "scheme": VALUE_HASH_SCHEME,
            },
        )
        return {"shard": self.shard_id, "counts": self._counts()}


@dataclass
class StreamingTopKConfig:
    input_path: str  # directory of parquet files (arrival order = sorted names)
    work_dir: str
    out_dir: str
    n_shards: int = 4
    files_per_epoch: int = 1
    text_col: str = "text"
    k: int = 10
    capacity: int = 4096  # per-shard item cap (SpaceSaving truncation)
    intermediate_compression: str = "none"


def partition_topk_input(cfg: StreamingTopKConfig) -> tuple[str, int]:
    """Phase 0 for streaming top-k: tokenize (word-count tokenization),
    pre-aggregate per-item counts within each epoch batch (the map-side
    combiner), shard by item hash — an item ALWAYS lands on one shard, so
    per-shard counts are complete and the global top-k is a subset of the
    union of per-shard top-ks. Same marker/tail protocol as the distinct
    job."""
    import pyarrow.compute as pc
    import ray.data

    part_dir = os.path.join(cfg.work_dir, "topk_partitioned")
    marker = os.path.join(part_dir, "_partition_done.json")
    files = sorted(
        os.path.join(cfg.input_path, f)
        for f in os.listdir(cfg.input_path)
        if f.endswith(".parquet")
    )
    fingerprint = [[f, os.path.getsize(f)] for f in files]
    layout = {
        "n_shards": cfg.n_shards,
        "columns": [cfg.text_col],
        "files_per_epoch": cfg.files_per_epoch,
        "scheme": VALUE_HASH_SCHEME,
    }
    done = None
    tail_from: int | None = None
    if os.path.exists(marker):
        with open(marker) as m:
            done = json.load(m)
        layout_ok = all(done.get(k) == v for k, v in layout.items())
        if layout_ok and done["fingerprint"] == fingerprint:
            return part_dir, int(done["n_epochs"])
        if (
            layout_ok
            and len(fingerprint) > len(done["fingerprint"])
            and done["fingerprint"] == fingerprint[: len(done["fingerprint"])]
        ):
            tail_from = len(done["fingerprint"])

    n_shards, text_col = cfg.n_shards, cfg.text_col

    def tag(batch: pa.Table, epoch: int) -> pa.Table:
        toks = (
            pc.split_pattern_regex(pc.utf8_lower(batch[text_col]), r"\s+")
            .combine_chunks()
            .flatten()
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = pc.value_counts(toks)
        items = vc.field("values").cast(pa.string())
        counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        h = pd.util.hash_array(np.asarray(items.to_pandas(), object))
        return pa.table(
            {
                "item": items,
                "c": pa.array(counts, pa.int64()),
                "shard": pa.array((h % np.uint64(n_shards)).astype(np.int32), pa.int32()),
                "epoch": pa.array(np.full(len(counts), epoch, np.int64), pa.int64()),
            }
        )

    tmp = os.path.join(cfg.work_dir, "_topk_partition_tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    if tail_from is not None:
        new_files = files[tail_from:]
        next_epoch = int(done["n_epochs"])
        groups = [
            new_files[g : g + cfg.files_per_epoch]
            for g in range(0, len(new_files), cfg.files_per_epoch)
        ]
    else:
        next_epoch = 0
        groups = [
            files[g : g + cfg.files_per_epoch]
            for g in range(0, len(files), cfg.files_per_epoch)
        ]
    for gi, group in enumerate(groups):
        ds = ray.data.read_parquet(group, columns=[text_col]).map_batches(
            lambda b, e=next_epoch + gi: tag(b, e),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        ds.write_parquet(
            tmp,
            partition_cols=["shard", "epoch"],
            compression=cfg.intermediate_compression,
        )
    if tail_from is not None:
        for sd in sorted(os.listdir(tmp)) if os.path.isdir(tmp) else []:
            if not sd.startswith("shard="):
                continue
            os.makedirs(os.path.join(part_dir, sd), exist_ok=True)
            for ed in sorted(os.listdir(os.path.join(tmp, sd))):
                dst = os.path.join(part_dir, sd, ed)
                if os.path.isdir(dst):
                    shutil.rmtree(dst)
                os.replace(os.path.join(tmp, sd, ed), dst)
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        shutil.rmtree(part_dir, ignore_errors=True)
        os.replace(tmp, part_dir)
    n_epochs = next_epoch + len(groups)
    with open(marker, "w") as m:
        json.dump(dict(layout, fingerprint=fingerprint, n_epochs=n_epochs), m)
    return part_dir, n_epochs


@ray.remote
class TopKShardActor:
    """One shard's cumulative item counts, SpaceSaving-truncated to
    ``capacity``: counts are lower bounds, ``dropped_bound`` (cumulative sum
    of the largest count dropped per truncation) is the shard's error bound
    — 0 while the shard's vocabulary fits capacity (the exact regime). The
    whole state is ≤ capacity rows, so checkpoints are full snapshots."""

    def __init__(self, shard_id: int, cfg_dict: dict, ckpt_dir: str):
        self.shard_id = shard_id
        self.capacity = cfg_dict["capacity"]
        self.k = cfg_dict["k"]
        self.counts = pd.Series(dtype=np.int64)
        self.dropped_bound = 0
        self.ckpt = CheckpointStore(ckpt_dir)

    def restore(
        self, last_committed_epoch: int, committed_epochs: list[int] | None = None
    ) -> int:
        self.counts = pd.Series(dtype=np.int64)
        self.dropped_bound = 0
        if last_committed_epoch < 0:
            self.ckpt.prune_after(self.shard_id, -(2**62))
            return -1
        self.ckpt.prune_after(self.shard_id, last_committed_epoch)
        got = self.ckpt.load_at_or_before(self.shard_id, last_committed_epoch)
        if got is None:
            return -1
        e, snap = got
        if e != last_committed_epoch or str(snap.get("scheme", "")) != VALUE_HASH_SCHEME:
            return -1
        self.counts = pd.Series(
            np.asarray(snap["counts"], np.int64),
            index=pd.Index(list(snap["items"]), dtype=object),
        )
        self.dropped_bound = int(snap["dropped_bound"])
        return e

    def process_epoch(self, epoch: int, epoch_dir: str | None) -> dict:
        if epoch_dir is not None and os.path.isdir(epoch_dir):
            t = pq.read_table(epoch_dir)
            if t.num_rows:
                add = pd.Series(
                    t["c"].to_numpy(zero_copy_only=False).astype(np.int64),
                    index=pd.Index(t["item"].to_pandas(), dtype=object),
                )
                add = add.groupby(level=0, sort=False).sum()
                self.counts = self.counts.add(add, fill_value=0).astype(np.int64)
                if len(self.counts) > self.capacity:
                    frame = self.counts.reset_index()
                    frame.columns = ["item", "n"]
                    frame = frame.sort_values(
                        ["n", "item"], ascending=[False, True], kind="stable"
                    )
                    self.dropped_bound += int(frame.iloc[self.capacity :]["n"].max())
                    kept = frame.iloc[: self.capacity]
                    self.counts = pd.Series(
                        kept["n"].to_numpy(np.int64),
                        index=pd.Index(kept["item"], dtype=object),
                    )
        self.ckpt.save(
            self.shard_id,
            epoch,
            {
                "items": list(self.counts.index),
                "counts": self.counts.to_numpy(np.int64),
                "dropped_bound": self.dropped_bound,
                "scheme": VALUE_HASH_SCHEME,
            },
        )
        top = self.counts.reset_index()
        top.columns = ["item", "n"]
        top = top.sort_values(["n", "item"], ascending=[False, True], kind="stable")
        top = top.iloc[: self.k]
        return {
            "shard": self.shard_id,
            "items": list(top["item"]),
            "ns": [int(v) for v in top["n"]],
            "dropped_bound": self.dropped_bound,
        }


class StreamingTopKJob:
    """Per-epoch cumulative top-k token snapshots with exactly-once emission.
    Output rows per epoch: (epoch, item, n, err_bound) — err_bound is the
    summed per-shard truncation bound (0 == provably exact)."""

    def __init__(self, cfg: StreamingTopKConfig):
        self.cfg = cfg
        self.sink = ExactlyOnceParquetSink(cfg.out_dir)
        self.ckpt_dir = os.path.join(cfg.work_dir, "checkpoints")

    def run(self, max_epochs: int | None = None) -> dict:
        cfg = self.cfg
        committed = self.sink.committed_epochs()
        last_committed = committed[-1] if committed else -1

        cfg_dict = {"capacity": cfg.capacity, "k": cfg.k}
        shards = [
            TopKShardActor.remote(s, cfg_dict, self.ckpt_dir)
            for s in range(cfg.n_shards)
        ]
        restore_refs = [s.restore.remote(last_committed, committed) for s in shards]

        part_dir, n_epochs = partition_topk_input(cfg)
        epochs = list(range(n_epochs))
        if committed != epochs[: len(committed)]:
            raise RuntimeError(
                "manifest set must be a prefix of the epoch sequence: "
                f"committed={committed} epochs={epochs}"
            )
        restored = ray.get(restore_refs)
        if last_committed >= 0 and any(r != last_committed for r in restored):
            raise RuntimeError(
                f"resume aborted: manifests reach {last_committed}, "
                f"checkpoints restored {restored}"
            )

        todo = [e for e in epochs if e > last_committed]
        if max_epochs is not None:
            todo = todo[:max_epochs]
        pending = {
            e: [
                s.process_epoch.remote(
                    e, os.path.join(part_dir, f"shard={s_id}", f"epoch={e}")
                )
                for s_id, s in enumerate(shards)
            ]
            for e in todo
        }
        stats = {
            "epochs_total": len(epochs),
            "epochs_skipped": len(committed),
            "epochs_processed": 0,
            "rows_emitted": 0,
        }
        for e in todo:
            parts = ray.get(pending.pop(e))
            cand = pd.DataFrame(
                {
                    "item": [i for p in parts for i in p["items"]],
                    "n": [n for p in parts for n in p["ns"]],
                }
            )
            err = sum(p["dropped_bound"] for p in parts)
            cand = cand.sort_values(["n", "item"], ascending=[False, True], kind="stable")
            top = cand.iloc[: cfg.k]
            snap = pa.table(
                {
                    "epoch": pa.array([e] * len(top), pa.int64()),
                    "item": pa.array(top["item"], pa.string()),
                    "n": pa.array(top["n"].to_numpy(np.int64), pa.int64()),
                    "err_bound": pa.array([err] * len(top), pa.int64()),
                }
            )
            part = self.sink.stage_part(e, "snapshot", snap)
            self.sink.commit_epoch(e, [part], cursor={"epoch": e})
            stats["epochs_processed"] += 1
            stats["rows_emitted"] += snap.num_rows
        for s in shards:
            ray.kill(s)
        with open(os.path.join(cfg.out_dir, "_metrics.json"), "w") as f:
            json.dump(stats, f)
        return stats


class StreamingDistinctJob:
    def __init__(self, cfg: StreamingDistinctConfig):
        self.cfg = cfg
        self.sink = ExactlyOnceParquetSink(cfg.out_dir)
        self.ckpt_dir = os.path.join(cfg.work_dir, "checkpoints")

    def run(self, max_epochs: int | None = None) -> dict:
        cfg = self.cfg
        committed = self.sink.committed_epochs()
        last_committed = committed[-1] if committed else -1

        cfg_dict = {
            "group_col": cfg.group_col,
            "precision": cfg.precision,
            "sparse_limit": cfg.sparse_limit,
        }
        shards = [
            DistinctShardActor.remote(k, cfg_dict, self.ckpt_dir)
            for k in range(cfg.n_shards)
        ]
        restore_refs = [s.restore.remote(last_committed, committed) for s in shards]

        part_dir, n_epochs = partition_distinct_input(cfg)
        epochs = list(range(n_epochs))
        if committed != epochs[: len(committed)]:
            raise RuntimeError(
                "manifest set must be a prefix of the epoch sequence: "
                f"committed={committed} epochs={epochs}"
            )
        restored = ray.get(restore_refs)
        if last_committed >= 0 and any(r != last_committed for r in restored):
            raise RuntimeError(
                f"resume aborted: manifests reach {last_committed}, "
                f"checkpoints restored {restored}"
            )

        todo = [e for e in epochs if e > last_committed]
        if max_epochs is not None:
            todo = todo[:max_epochs]
        # pipelined: all epochs submitted up-front, actor-task order keeps
        # each shard sequential; manifests still commit strictly in order
        pending = {
            e: [
                s.process_epoch.remote(
                    e, os.path.join(part_dir, f"shard={k}", f"epoch={e}")
                )
                for k, s in enumerate(shards)
            ]
            for e in todo
        }
        stats = {
            "epochs_total": len(epochs),
            "epochs_skipped": len(committed),
            "epochs_processed": 0,
            "rows_emitted": 0,
        }
        for e in todo:
            parts = ray.get(pending.pop(e))
            # shard states partition the value space: global per-group count
            # = sum of per-shard counts (exact while sparse)
            totals: dict[str, int] = {}
            for p in parts:
                for g, n in p["counts"].items():
                    totals[g] = totals.get(g, 0) + int(n)
            snap = pa.table(
                {
                    "epoch": pa.array([e] * len(totals), pa.int64()),
                    cfg.group_col: pa.array(sorted(totals), pa.string()),
                    "n_distinct": pa.array(
                        [totals[g] for g in sorted(totals)], pa.int64()
                    ),
                }
            )
            part = self.sink.stage_part(e, "snapshot", snap)
            self.sink.commit_epoch(e, [part], cursor={"epoch": e})
            stats["epochs_processed"] += 1
            stats["rows_emitted"] += snap.num_rows
        for s in shards:
            ray.kill(s)
        with open(os.path.join(cfg.out_dir, "_metrics.json"), "w") as f:
            json.dump(stats, f)
        return stats


@dataclass
class StreamingQuantileConfig:
    input_path: str  # directory of parquet files (arrival order = sorted names)
    work_dir: str
    out_dir: str
    n_shards: int = 4
    files_per_epoch: int = 1
    group_col: str = "event_type"
    value_col: str = "value"
    qs: tuple = (0.25, 0.5, 0.9)
    limit: int = 65536  # per-group summary cap (compaction threshold)
    intermediate_compression: str = "none"


def partition_quantile_input(cfg: StreamingQuantileConfig) -> tuple[str, int]:
    """Phase 0 for streaming quantiles: shard by GROUP hash (a group's whole
    value stream lives on one shard — quantiles, unlike distinct counts,
    are not sums over disjoint value partitions), hive-partition by
    (shard, epoch). Per-(batch, group) payloads larger than ``limit`` are
    pre-compacted map-side (the batch operator's partial), carrying the
    compaction's rank-error contribution in ``eb`` — the exact regime never
    triggers it, so weights stay 1 and the summary IS the multiset. Same
    marker/tail protocol as the distinct job."""
    import ray.data

    from statefulstreamprocessor_ray.stages.sketch import _compact_weighted

    part_dir = os.path.join(cfg.work_dir, "quantile_partitioned")
    marker = os.path.join(part_dir, "_partition_done.json")
    files = sorted(
        os.path.join(cfg.input_path, f)
        for f in os.listdir(cfg.input_path)
        if f.endswith(".parquet")
    )
    fingerprint = [[f, os.path.getsize(f)] for f in files]
    layout = {
        "n_shards": cfg.n_shards,
        "columns": [cfg.group_col, cfg.value_col],
        "files_per_epoch": cfg.files_per_epoch,
        "limit": cfg.limit,
        "scheme": VALUE_HASH_SCHEME,
    }
    done = None
    tail_from: int | None = None
    if os.path.exists(marker):
        with open(marker) as m:
            done = json.load(m)
        layout_ok = all(done.get(k) == v for k, v in layout.items())
        if layout_ok and done["fingerprint"] == fingerprint:
            return part_dir, int(done["n_epochs"])
        if (
            layout_ok
            and len(fingerprint) > len(done["fingerprint"])
            and done["fingerprint"] == fingerprint[: len(done["fingerprint"])]
        ):
            tail_from = len(done["fingerprint"])

    n_shards, group_col, value_col, limit = (
        cfg.n_shards,
        cfg.group_col,
        cfg.value_col,
        cfg.limit,
    )

    def tag(batch: pa.Table, epoch: int) -> pa.Table:
        df = batch.select([group_col, value_col]).to_pandas()
        vals = pd.to_numeric(df[value_col], errors="coerce")
        keep = vals.notna()
        df, vals = df[keep], vals[keep].to_numpy(np.float64)
        out_g, out_v, out_w, out_e = [], [], [], []
        for gval, idx in df.groupby(group_col, sort=False).indices.items():
            v = np.sort(vals[idx])
            w = np.ones(len(v), np.int64)
            eb = np.zeros(len(v), np.int64)
            if len(v) > limit:
                W = len(v)
                v, w = _compact_weighted(v, w, limit)
                eb = np.zeros(len(v), np.int64)
                eb[0] = -(-W // limit)  # ceil(W/limit): this compaction's bound
            out_g.append(np.repeat(np.asarray([gval], object), len(v)))
            out_v.append(v)
            out_w.append(w)
            out_e.append(eb)
        if out_g:
            g = np.concatenate(out_g)
            h = pd.util.hash_array(g)
            shard = (h % np.uint64(n_shards)).astype(np.int32)
            n_rows = len(g)
        else:
            g = np.array([], object)
            shard = np.array([], np.int32)
            n_rows = 0
        return pa.table(
            {
                group_col: pa.array(g, pa.string()),
                "v": pa.array(
                    np.concatenate(out_v) if out_g else np.array([], np.float64),
                    pa.float64(),
                ),
                "w": pa.array(
                    np.concatenate(out_w) if out_g else np.array([], np.int64),
                    pa.int64(),
                ),
                "eb": pa.array(
                    np.concatenate(out_e) if out_g else np.array([], np.int64),
                    pa.int64(),
                ),
                "shard": pa.array(shard, pa.int32()),
                "epoch": pa.array(np.full(n_rows, epoch, np.int64), pa.int64()),
            }
        )

    tmp = os.path.join(cfg.work_dir, "_quantile_partition_tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    if tail_from is not None:
        new_files = files[tail_from:]
        next_epoch = int(done["n_epochs"])
        groups = [
            new_files[g : g + cfg.files_per_epoch]
            for g in range(0, len(new_files), cfg.files_per_epoch)
        ]
    else:
        next_epoch = 0
        groups = [
            files[g : g + cfg.files_per_epoch]
            for g in range(0, len(files), cfg.files_per_epoch)
        ]
    for gi, group in enumerate(groups):
        ds = ray.data.read_parquet(
            group, columns=[group_col, value_col]
        ).map_batches(
            lambda b, e=next_epoch + gi: tag(b, e),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        ds.write_parquet(
            tmp,
            partition_cols=["shard", "epoch"],
            compression=cfg.intermediate_compression,
        )
    if tail_from is not None:
        for sd in sorted(os.listdir(tmp)) if os.path.isdir(tmp) else []:
            if not sd.startswith("shard="):
                continue
            os.makedirs(os.path.join(part_dir, sd), exist_ok=True)
            for ed in sorted(os.listdir(os.path.join(tmp, sd))):
                dst = os.path.join(part_dir, sd, ed)
                if os.path.isdir(dst):
                    shutil.rmtree(dst)
                os.replace(os.path.join(tmp, sd, ed), dst)
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        shutil.rmtree(part_dir, ignore_errors=True)
        os.replace(tmp, part_dir)
    n_epochs = next_epoch + len(groups)
    with open(marker, "w") as m:
        json.dump(dict(layout, fingerprint=fingerprint, n_epochs=n_epochs), m)
    return part_dir, n_epochs


@ray.remote
class QuantileShardActor:
    """One shard's per-group weighted-sample quantile summaries across
    epochs. State per group is kept value-sorted and compacted to ``limit``
    points when it grows past it; ``errs[g]`` accumulates every compaction's
    ceil(W/limit) rank bound (map-side phase-0 compactions included via the
    ``eb`` column) — 0 means the summary is the exact multiset and every
    reported quantile selects the true quantile_disc element. State is
    bounded at ``limit`` points per group, so checkpoints are full
    snapshots (the TopK model, not the distinct job's deltas)."""

    def __init__(self, shard_id: int, cfg_dict: dict, ckpt_dir: str):
        self.shard_id = shard_id
        self.group_col = cfg_dict["group_col"]
        self.limit = cfg_dict["limit"]
        self.qs = [float(q) for q in cfg_dict["qs"]]
        self.vals: dict[str, np.ndarray] = {}
        self.wts: dict[str, np.ndarray] = {}
        self.errs: dict[str, int] = {}
        self.ckpt = CheckpointStore(ckpt_dir)

    def restore(
        self, last_committed_epoch: int, committed_epochs: list[int] | None = None
    ) -> int:
        self.vals, self.wts, self.errs = {}, {}, {}
        if last_committed_epoch < 0:
            self.ckpt.prune_after(self.shard_id, -(2**62))
            return -1
        self.ckpt.prune_after(self.shard_id, last_committed_epoch)
        got = self.ckpt.load_at_or_before(self.shard_id, last_committed_epoch)
        if got is None:
            return -1
        e, snap = got
        if e != last_committed_epoch or str(snap.get("scheme", "")) != VALUE_HASH_SCHEME:
            return -1
        for g, v, w, err in zip(
            list(snap["groups"]), list(snap["vals"]), list(snap["wts"]),
            list(snap["errs"]),
        ):
            self.vals[g] = np.asarray(v, np.float64)
            self.wts[g] = np.asarray(w, np.int64)
            self.errs[g] = int(err)
        return e

    def process_epoch(self, epoch: int, epoch_dir: str | None) -> dict:
        if epoch_dir is not None and os.path.isdir(epoch_dir):
            t = pq.read_table(epoch_dir)
            if t.num_rows:
                df = pd.DataFrame(
                    {
                        "g": t[self.group_col].to_pandas(),
                        "v": t["v"].to_numpy(zero_copy_only=False),
                        "w": t["w"].to_numpy(zero_copy_only=False),
                        "eb": t["eb"].to_numpy(zero_copy_only=False),
                    }
                )
                for g, sub in df.groupby("g", sort=False):
                    v = np.concatenate(
                        [self.vals.get(g, np.array([], np.float64)),
                         sub["v"].to_numpy(np.float64)]
                    )
                    w = np.concatenate(
                        [self.wts.get(g, np.array([], np.int64)),
                         sub["w"].to_numpy(np.int64)]
                    )
                    order = np.argsort(v, kind="stable")
                    v, w = v[order], w[order]
                    err = self.errs.get(g, 0) + int(sub["eb"].sum())
                    if len(v) > self.limit:
                        W = int(w.sum())
                        from statefulstreamprocessor_ray.stages.sketch import (
                            _compact_weighted,
                        )

                        v, w = _compact_weighted(v, w, self.limit)
                        err += -(-W // self.limit)
                    self.vals[g], self.wts[g], self.errs[g] = v, w, err
        self.ckpt.save(
            self.shard_id,
            epoch,
            {
                "groups": list(self.vals),
                "vals": [self.vals[g] for g in self.vals],
                "wts": [self.wts[g] for g in self.vals],
                "errs": [self.errs[g] for g in self.vals],
                "scheme": VALUE_HASH_SCHEME,
            },
        )
        out_g, out_q, out_v, out_e = [], [], [], []
        for g in sorted(self.vals):
            v, w = self.vals[g], self.wts[g]
            cw = np.cumsum(w)
            W = int(cw[-1])
            for q in self.qs:
                # identical selection rule to stages/sketch.quantile_sketch:
                # first point whose cumweight reaches rank max(1, ceil(q*W))
                target = max(1, int(np.ceil(q * W)))
                i = int(np.searchsorted(cw, target, side="left"))
                out_g.append(g)
                out_q.append(q)
                out_v.append(float(v[i]))
                out_e.append(self.errs[g])
        return {
            "shard": self.shard_id,
            "groups": out_g,
            "qs": out_q,
            "values": out_v,
            "errs": out_e,
        }


class StreamingQuantileJob:
    """Per-epoch cumulative per-group quantile snapshots over a growing
    stream with exactly-once emission: after each epoch, one row per
    (epoch, group, q) — the quantile over ALL epochs so far. Groups shard
    by hash (disjoint group ownership), per-group state is a bounded
    mergeable summary (exact multiset until ``limit``, equal-weight-strata
    compaction beyond — the unbounded-stream property), ``err_bound``
    carries the cumulative rank-error bound (0 == provably the exact
    quantile_disc element). Same manifests/resume/tail protocol as the
    distinct and top-k jobs."""

    def __init__(self, cfg: StreamingQuantileConfig):
        self.cfg = cfg
        self.sink = ExactlyOnceParquetSink(cfg.out_dir)
        self.ckpt_dir = os.path.join(cfg.work_dir, "checkpoints")

    def run(self, max_epochs: int | None = None) -> dict:
        cfg = self.cfg
        committed = self.sink.committed_epochs()
        last_committed = committed[-1] if committed else -1

        cfg_dict = {
            "group_col": cfg.group_col,
            "limit": cfg.limit,
            "qs": list(cfg.qs),
        }
        shards = [
            QuantileShardActor.remote(s, cfg_dict, self.ckpt_dir)
            for s in range(cfg.n_shards)
        ]
        restore_refs = [s.restore.remote(last_committed, committed) for s in shards]

        part_dir, n_epochs = partition_quantile_input(cfg)
        epochs = list(range(n_epochs))
        if committed != epochs[: len(committed)]:
            raise RuntimeError(
                "manifest set must be a prefix of the epoch sequence: "
                f"committed={committed} epochs={epochs}"
            )
        restored = ray.get(restore_refs)
        if last_committed >= 0 and any(r != last_committed for r in restored):
            raise RuntimeError(
                f"resume aborted: manifests reach {last_committed}, "
                f"checkpoints restored {restored}"
            )

        todo = [e for e in epochs if e > last_committed]
        if max_epochs is not None:
            todo = todo[:max_epochs]
        pending = {
            e: [
                s.process_epoch.remote(
                    e, os.path.join(part_dir, f"shard={k}", f"epoch={e}")
                )
                for k, s in enumerate(shards)
            ]
            for e in todo
        }
        stats = {
            "epochs_total": len(epochs),
            "epochs_skipped": len(committed),
            "epochs_processed": 0,
            "rows_emitted": 0,
        }
        for e in todo:
            parts = ray.get(pending.pop(e))
            rows = pd.DataFrame(
                {
                    cfg.group_col: [g for p in parts for g in p["groups"]],
                    "q": [q for p in parts for q in p["qs"]],
                    "value": [v for p in parts for v in p["values"]],
                    "err_bound": [b for p in parts for b in p["errs"]],
                }
            ).sort_values([cfg.group_col, "q"], kind="stable")
            snap = pa.table(
                {
                    "epoch": pa.array([e] * len(rows), pa.int64()),
                    cfg.group_col: pa.array(rows[cfg.group_col], pa.string()),
                    "q": pa.array(rows["q"].to_numpy(np.float64), pa.float64()),
                    "value": pa.array(rows["value"].to_numpy(np.float64), pa.float64()),
                    "err_bound": pa.array(
                        rows["err_bound"].to_numpy(np.int64), pa.int64()
                    ),
                }
            )
            part = self.sink.stage_part(e, "snapshot", snap)
            self.sink.commit_epoch(e, [part], cursor={"epoch": e})
            stats["epochs_processed"] += 1
            stats["rows_emitted"] += snap.num_rows
        for s in shards:
            ray.kill(s)
        with open(os.path.join(cfg.out_dir, "_metrics.json"), "w") as f:
            json.dump(stats, f)
        return stats
