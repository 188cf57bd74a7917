"""Streaming window functions: per-key ordered analytics (row number, LAG,
time-since-previous, running sum, trailing-N rolling sum) over a GROWING
stream with exactly-once emission.

The continuous-ingest form of ``stages/analytic.window_functions`` — the
per-key sequence-feature pass a curation pipeline runs as events arrive,
equivalent to the reference's LocalStreamBuffer consume loop
(``local_stream_buffer.py``) evaluated incrementally: each arrival epoch
emits its rows' window outputs seeded by state carried from every earlier
epoch, so the union of all epochs equals the batch operator evaluated over
the total arrival order ``(epoch, ts, id)``.

State and scale:

- keys shard by ``hash(key) % K`` in phase 0 (the streaming_dedup hive
  partition protocol: marker-based epoch enumeration, tail appends, scheme
  tag), so each shard owns its keys completely.
- per-key state is FIXED SIZE: (count, cumulative micro-sum, last ts, last
  value, ring of the trailing roll_rows-1 quantized values) — O(#keys per
  shard) total, independent of stream length. The cumulative sum is held
  in uint64 with wraparound: emitted values are prefix differences, exact
  while any single window's true total fits int64 (the batch kernel's
  modular-prefix-sum argument).
- checkpoints are per-epoch DELTAS of touched keys carrying their POST
  state (fixed width per key), replayed in epoch order on restore — the
  last write per key wins.
- exactly-once: staged parts + atomic epoch manifests (second run over
  committed input emits 0 rows; crash/resume equals the uninterrupted run;
  tail appends emit exactly the new epochs' rows).
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
from statefulstreamprocessor_ray.state.checkpoint import CheckpointStore

# key shards come from pd.util.hash_array (same drift risk as
# streaming_dedup's CONTENT_HASH_SCHEME): tag the partition layout and
# checkpoints, abort resume on mismatch
KEY_HASH_SCHEME = f"hash_array-pd{pd.__version__}"

MICRO = 1_000_000.0


@dataclass
class StreamingWindowFnConfig:
    input_path: str  # directory of parquet files (arrival order = sorted names)
    work_dir: str
    out_dir: str
    n_shards: int = 4
    files_per_epoch: int = 1
    key_col: str = "user_id"
    ts_col: str = "ts"
    id_col: str = "event_id"
    value_col: str = "value"
    roll_rows: int = 4
    intermediate_compression: str = "none"


def partition_windowfn_input(cfg: StreamingWindowFnConfig) -> tuple[str, int]:
    """Phase 0: shard rows by ``hash(key) % K``, hive-partition by
    (shard, epoch). Same marker/tail protocol as
    ``streaming_sketch.partition_distinct_input``; ts is normalized to
    int64 microseconds here so the actors never touch timestamp logic."""
    import ray.data

    part_dir = os.path.join(cfg.work_dir, "windowfn_partitioned")
    marker = os.path.join(part_dir, "_partition_done.json")
    files = sorted(
        os.path.join(cfg.input_path, f)
        for f in os.listdir(cfg.input_path)
        if f.endswith(".parquet")
    )
    fingerprint = [[f, os.path.getsize(f)] for f in files]
    layout = {
        "n_shards": cfg.n_shards,
        "columns": [cfg.id_col, cfg.key_col, cfg.ts_col, cfg.value_col],
        "files_per_epoch": cfg.files_per_epoch,
        "scheme": KEY_HASH_SCHEME,
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

    n_shards = cfg.n_shards
    key_col, ts_col, id_col, value_col = (
        cfg.key_col,
        cfg.ts_col,
        cfg.id_col,
        cfg.value_col,
    )

    def tag(batch: pa.Table, epoch: int) -> pa.Table:
        import pyarrow.compute as pc

        key = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = pd.util.hash_array(key, categorize=False)
        ts_us = pc.cast(
            pc.cast(batch[ts_col], pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(
                    batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64(),
                ),
                key_col: pa.array(key, pa.int64()),
                "ts_us": pa.array(ts_us.astype(np.int64), pa.int64()),
                value_col: pa.array(
                    pc.cast(batch[value_col], pa.float64()).to_numpy(
                        zero_copy_only=False
                    ),
                    pa.float64(),
                ),
                "shard": pa.array(
                    (h % np.uint64(n_shards)).astype(np.int32), pa.int32()
                ),
                "epoch": pa.array(np.full(len(key), epoch, np.int64), pa.int64()),
            }
        )

    tmp = os.path.join(cfg.work_dir, "_windowfn_partition_tmp")
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
            group, columns=[id_col, key_col, ts_col, value_col]
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
class WindowFnShardActor:
    """One shard's per-key window state across epochs. Each key's state is
    fixed width: (count, uint64 cumulative micro-sum, last ts_us, last raw
    value, trailing roll_rows-1 quantized values)."""

    def __init__(self, shard_id: int, cfg_dict: dict, ckpt_dir: str):
        self.shard_id = shard_id
        self.key_col = cfg_dict["key_col"]
        self.id_col = cfg_dict["id_col"]
        self.value_col = cfg_dict["value_col"]
        self.roll = int(cfg_dict["roll_rows"])
        # uid -> [cnt int, cum uint64-as-int, last_ts int, last_val float,
        #         ring np.ndarray int64 (trailing, oldest->newest)]
        self.state: dict[int, list] = {}
        self.ckpt = CheckpointStore(ckpt_dir)

    def restore(
        self, last_committed_epoch: int, committed_epochs: list[int] | None = None
    ) -> int:
        self.state = {}
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
            if str(snap.get("scheme", "")) != KEY_HASH_SCHEME:
                return -1  # hash-scheme drift: clean resume-abort
            uids = np.asarray(snap["uids"], np.int64)
            if len(uids) == 0:  # epoch touched no keys on this shard
                continue
            cnt = np.asarray(snap["cnt"], np.int64)
            cum = np.asarray(snap["cum"], np.int64)
            lts = np.asarray(snap["last_ts"], np.int64)
            lval = np.asarray(snap["last_val"], np.float64)
            rings = np.asarray(snap["rings"], np.int64).reshape(len(uids), -1)
            rlen = np.asarray(snap["ring_len"], np.int64)
            for i, u in enumerate(uids):
                # deltas carry POST state: the last write per key wins
                self.state[int(u)] = [
                    int(cnt[i]),
                    int(cum[i]),
                    int(lts[i]),
                    float(lval[i]),
                    rings[i, : rlen[i]].copy(),
                ]
        return max(found)

    def process_epoch(self, epoch: int, epoch_dir: str | None) -> pa.Table:
        """Run this shard's slice of one epoch through the seeded window
        kernel, delta-checkpoint the touched keys' post-state, return the
        epoch's output rows."""
        R = self.roll
        key_col, id_col, value_col = self.key_col, self.id_col, self.value_col
        out_cols = {
            "epoch": [],
            id_col: [],
            key_col: [],
            "rn": [],
            "prev_value": [],
            "delta_us": [],
            "cum_micro": [],
            f"roll{R}_micro": [],
        }
        touched: list[int] = []
        if epoch_dir is not None and os.path.isdir(epoch_dir):
            t = pq.read_table(epoch_dir)
            if t.num_rows:
                key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
                ts = t["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
                eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
                val = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
                order = np.lexsort((eid, ts, key))
                key, ts, eid, val = key[order], ts[order], eid[order], val[order]
                vm = np.round(val * MICRO).astype(np.int64)
                st = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
                bounds = np.r_[st, len(key)]
                for gi in range(len(st)):
                    lo, hi = bounds[gi], bounds[gi + 1]
                    uid = int(key[lo])
                    cnt0, cum0, lts0, lval0, ring = self.state.get(
                        uid, [0, 0, 0, np.nan, np.array([], np.int64)]
                    )
                    g_vm = vm[lo:hi]
                    g_n = hi - lo
                    # extended quantized series: trailing ring + this epoch
                    ext = np.concatenate([ring, g_vm]).astype(np.uint64)
                    cs = np.zeros(len(ext) + 1, np.uint64)
                    np.cumsum(ext, out=cs[1:])
                    pos = np.arange(len(ring), len(ext))
                    rn = cnt0 + 1 + np.arange(g_n, dtype=np.int64)
                    lb = np.minimum(rn, R)
                    roll_v = (cs[pos + 1] - cs[pos + 1 - lb]).astype(np.int64)
                    # cumulative: seed + within-epoch modular prefix
                    within = cs[pos + 1] - cs[len(ring)]
                    cum_v = (np.uint64(cum0 % (1 << 64)) + within).astype(np.int64)
                    prev = np.empty(g_n, np.float64)
                    prev[0] = lval0 if cnt0 > 0 else np.nan
                    prev[1:] = val[lo : hi - 1]
                    dts = np.empty(g_n, np.float64)
                    dts[0] = float(ts[lo] - lts0) if cnt0 > 0 else np.nan
                    dts[1:] = (ts[lo + 1 : hi] - ts[lo : hi - 1]).astype(np.float64)
                    out_cols["epoch"].append(np.full(g_n, epoch, np.int64))
                    out_cols[id_col].append(eid[lo:hi])
                    out_cols[key_col].append(key[lo:hi])
                    out_cols["rn"].append(rn)
                    out_cols["prev_value"].append(prev)
                    out_cols["delta_us"].append(dts)
                    out_cols["cum_micro"].append(cum_v)
                    out_cols[f"roll{R}_micro"].append(roll_v)
                    # post-state
                    new_ring = ext[-(R - 1) :].astype(np.int64) if R > 1 else np.array([], np.int64)
                    new_ring = new_ring[-min(cnt0 + g_n, R - 1) :] if R > 1 else new_ring
                    self.state[uid] = [
                        cnt0 + g_n,
                        int((np.uint64(cum0 % (1 << 64)) + within[-1]).astype(np.int64)),
                        int(ts[hi - 1]),
                        float(val[hi - 1]),
                        new_ring,
                    ]
                    touched.append(uid)
        # delta checkpoint: post-state of touched keys, fixed width per key
        ring_pad = max(1, R - 1)
        rings = np.zeros((len(touched), ring_pad), np.int64)
        rlen = np.zeros(len(touched), np.int64)
        for i, u in enumerate(touched):
            r = self.state[u][4]
            rings[i, : len(r)] = r
            rlen[i] = len(r)
        self.ckpt.save(
            self.shard_id,
            epoch,
            {
                "uids": np.array(touched, np.int64),
                "cnt": np.array([self.state[u][0] for u in touched], np.int64),
                "cum": np.array([self.state[u][1] for u in touched], np.int64),
                "last_ts": np.array([self.state[u][2] for u in touched], np.int64),
                "last_val": np.array(
                    [self.state[u][3] for u in touched], np.float64
                ),
                "rings": rings,
                "ring_len": rlen,
                "scheme": KEY_HASH_SCHEME,
            },
        )
        if not out_cols["epoch"]:
            return pa.table(
                {
                    "epoch": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    key_col: pa.array([], pa.int64()),
                    "rn": pa.array([], pa.int64()),
                    "prev_value": pa.array([], pa.float64()),
                    "delta_us": pa.array([], pa.float64()),
                    "cum_micro": pa.array([], pa.int64()),
                    f"roll{R}_micro": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                name: pa.array(np.concatenate(chunks))
                for name, chunks in out_cols.items()
            }
        )


class StreamingWindowFnJob:
    def __init__(self, cfg: StreamingWindowFnConfig):
        self.cfg = cfg
        self.sink = ExactlyOnceParquetSink(cfg.out_dir)
        self.ckpt_dir = os.path.join(cfg.work_dir, "checkpoints")

    def run(self, max_epochs: int | None = None) -> dict:
        cfg = self.cfg
        committed = self.sink.committed_epochs()
        last_committed = committed[-1] if committed else -1

        cfg_dict = {
            "key_col": cfg.key_col,
            "id_col": cfg.id_col,
            "value_col": cfg.value_col,
            "roll_rows": cfg.roll_rows,
        }
        shards = [
            WindowFnShardActor.remote(s, cfg_dict, self.ckpt_dir)
            for s in range(cfg.n_shards)
        ]
        restore_refs = [s.restore.remote(last_committed, committed) for s in shards]

        part_dir, n_epochs = partition_windowfn_input(cfg)
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
            tables = ray.get(pending.pop(e))
            parts = []
            for k, tbl in enumerate(tables):
                if tbl.num_rows:
                    parts.append(self.sink.stage_part(e, f"shard-{k:03d}", tbl))
            self.sink.commit_epoch(e, parts, cursor={"epoch": e})
            stats["epochs_processed"] += 1
            stats["rows_emitted"] += sum(t.num_rows for t in tables)
        for s in shards:
            ray.kill(s)
        with open(os.path.join(cfg.out_dir, "_metrics.json"), "w") as f:
            json.dump(stats, f)
        return stats


@ray.remote
class CompactionShardActor:
    """One shard's per-key latest-row state across epochs (CDC compaction):
    uid -> (ts_us, tie, event_type, value) — fixed width per key."""

    def __init__(self, shard_id: int, cfg_dict: dict, ckpt_dir: str):
        self.shard_id = shard_id
        self.key_col = cfg_dict["key_col"]
        self.id_col = cfg_dict["id_col"]
        self.state: dict[int, tuple] = {}
        self.ckpt = CheckpointStore(ckpt_dir)

    def restore(
        self, last_committed_epoch: int, committed_epochs: list[int] | None = None
    ) -> int:
        self.state = {}
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
            if str(snap.get("scheme", "")) != KEY_HASH_SCHEME:
                return -1
            for i, u in enumerate(np.asarray(snap["uids"], np.int64)):
                self.state[int(u)] = (
                    int(snap["ts"][i]),
                    int(snap["tie"][i]),
                    str(snap["etype"][i]),
                    float(snap["value"][i]),
                )
        return max(found)

    def process_epoch(self, epoch: int, epoch_dir: str | None) -> pa.Table:
        key_col, id_col = self.key_col, self.id_col
        touched: list[int] = []
        if epoch_dir is not None and os.path.isdir(epoch_dir):
            t = pq.read_table(epoch_dir)
            if t.num_rows:
                key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
                ts = t["ts_us"].to_numpy(zero_copy_only=False).astype(np.int64)
                eid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
                etype = t["event_type"].to_pandas().to_numpy(object)
                val = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
                # per-key epoch argmax by (ts DESC, tie DESC): lexsort then
                # take each key run's LAST row
                order = np.lexsort((eid, ts, key))
                key, ts, eid = key[order], ts[order], eid[order]
                etype, val = etype[order], val[order]
                last = np.r_[key[1:] != key[:-1], True]
                for i in np.flatnonzero(last):
                    uid = int(key[i])
                    cand = (int(ts[i]), int(eid[i]), str(etype[i]), float(val[i]))
                    cur = self.state.get(uid)
                    if cur is None or cand[:2] > cur[:2]:
                        self.state[uid] = cand
                    touched.append(uid)
        self.ckpt.save(
            self.shard_id,
            epoch,
            {
                "uids": np.array(touched, np.int64),
                "ts": np.array([self.state[u][0] for u in touched], np.int64),
                "tie": np.array([self.state[u][1] for u in touched], np.int64),
                "etype": np.array([self.state[u][2] for u in touched], object),
                "value": np.array([self.state[u][3] for u in touched], np.float64),
                "scheme": KEY_HASH_SCHEME,
            },
        )
        uids = sorted(set(touched))
        return pa.table(
            {
                "epoch": pa.array([epoch] * len(uids), pa.int64()),
                id_col: pa.array(
                    [self.state[u][1] for u in uids], pa.int64()
                ),
                key_col: pa.array(uids, pa.int64()),
                "ts": pa.array(
                    np.array([self.state[u][0] for u in uids], np.int64),
                    pa.timestamp("us"),
                ),
                "event_type": pa.array(
                    [self.state[u][2] for u in uids], pa.string()
                ),
                "value": pa.array(
                    [self.state[u][3] for u in uids], pa.float64()
                ),
            }
        )


class StreamingCompactionJob:
    """CDC / upsert compaction over arrival epochs: after each epoch, emit
    the CURRENT latest full row (by ``(ts DESC, id DESC)``) for every key
    touched in that epoch — the continuously-maintained "current state of
    every entity" changelog, the streaming pendant of
    ``stages/analytic.latest_per_key``. Same protocol as
    StreamingWindowFnJob: hive phase-0 partitioning, fixed-width per-key
    state, delta checkpoints, exactly-once manifests, tail appends,
    scheme-tagged resume abort."""

    def __init__(self, cfg: StreamingWindowFnConfig):
        self.cfg = cfg
        self.sink = ExactlyOnceParquetSink(cfg.out_dir)
        self.ckpt_dir = os.path.join(cfg.work_dir, "checkpoints")

    def run(self, max_epochs: int | None = None) -> dict:
        cfg = self.cfg
        committed = self.sink.committed_epochs()
        last_committed = committed[-1] if committed else -1

        cfg_dict = {"key_col": cfg.key_col, "id_col": cfg.id_col}
        shards = [
            CompactionShardActor.remote(s, cfg_dict, self.ckpt_dir)
            for s in range(cfg.n_shards)
        ]
        restore_refs = [s.restore.remote(last_committed, committed) for s in shards]

        part_dir, n_epochs = partition_compaction_input(cfg)
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
            tables = ray.get(pending.pop(e))
            parts = []
            for k, tbl in enumerate(tables):
                if tbl.num_rows:
                    parts.append(self.sink.stage_part(e, f"shard-{k:03d}", tbl))
            self.sink.commit_epoch(e, parts, cursor={"epoch": e})
            stats["epochs_processed"] += 1
            stats["rows_emitted"] += sum(t.num_rows for t in tables)
        for s in shards:
            ray.kill(s)
        with open(os.path.join(cfg.out_dir, "_metrics.json"), "w") as f:
            json.dump(stats, f)
        return stats


def partition_compaction_input(cfg: StreamingWindowFnConfig) -> tuple[str, int]:
    """Phase 0 for the compaction job: same marker/tail protocol as
    :func:`partition_windowfn_input`, but the payload carries the FULL row
    (id, key, ts_us, event_type, value) — compaction emits whole rows."""
    import ray.data

    part_dir = os.path.join(cfg.work_dir, "compaction_partitioned")
    marker = os.path.join(part_dir, "_partition_done.json")
    files = sorted(
        os.path.join(cfg.input_path, f)
        for f in os.listdir(cfg.input_path)
        if f.endswith(".parquet")
    )
    fingerprint = [[f, os.path.getsize(f)] for f in files]
    cols = [cfg.id_col, cfg.key_col, cfg.ts_col, "event_type", cfg.value_col]
    layout = {
        "n_shards": cfg.n_shards,
        "columns": cols,
        "files_per_epoch": cfg.files_per_epoch,
        "scheme": KEY_HASH_SCHEME,
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

    n_shards = cfg.n_shards
    key_col, ts_col, id_col, value_col = (
        cfg.key_col,
        cfg.ts_col,
        cfg.id_col,
        cfg.value_col,
    )

    def tag(batch: pa.Table, epoch: int) -> pa.Table:
        import pyarrow.compute as pc

        key = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = pd.util.hash_array(key, categorize=False)
        ts_us = pc.cast(
            pc.cast(batch[ts_col], pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(
                    batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64(),
                ),
                key_col: pa.array(key, pa.int64()),
                "ts_us": pa.array(ts_us.astype(np.int64), pa.int64()),
                "event_type": pc.cast(batch["event_type"], pa.string()),
                value_col: pa.array(
                    pc.cast(batch[value_col], pa.float64()).to_numpy(
                        zero_copy_only=False
                    ),
                    pa.float64(),
                ),
                "shard": pa.array(
                    (h % np.uint64(n_shards)).astype(np.int32), pa.int32()
                ),
                "epoch": pa.array(np.full(len(key), epoch, np.int64), pa.int64()),
            }
        )

    tmp = os.path.join(cfg.work_dir, "_compaction_partition_tmp")
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
        ds = ray.data.read_parquet(group, columns=cols).map_batches(
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
