"""Streaming exact dedup: first-occurrence filtering over a GROWING corpus
with exactly-once emission.

The continuous-ingest form of ``stages/dedup.exact_dedup``: documents arrive
as files (arrival-order epochs); a document is emitted iff its content was
never seen in ANY earlier epoch (and, within its first epoch, it is the
min-id holder of that content). Per-shard state = the sorted array of seen
128-bit content digests (``stages/dedup.content_hash128``) — O(distinct
contents), the minimum any exact
dedup must hold, and collision odds stay negligible even at 10^12 distinct
contents (a 64-bit key would already be ~3% likely to collide at 10^9);
shard = digest % K, so a given content always lands on the same shard and
the state never needs cross-shard reconciliation.

Same exactly-once protocol as the other streaming jobs: staged parts +
atomic epoch manifests + checkpointed shard state; a second run over
committed input emits 0 rows; crash/resume equals the uninterrupted run;
follow-the-tail appends (new files -> new epochs) emit exactly the new
first-occurrences. Epochs need no watermark gate (content identity is
order-free within an epoch given the min-id rule), so every epoch is
submitted up-front — per-shard sequential via actor-task order, cross-shard
independent, manifests committed strictly in order.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from statefulstreamprocessor_ray.sinks.exactly_once import ExactlyOnceParquetSink
from statefulstreamprocessor_ray.state.checkpoint import CheckpointStore

# canonical 128-bit content identity, shared with batch exact_dup_pairs
# (replaced a per-row hashlib.md5 loop in round 3; scheme changes
# invalidate prior checkpoint state — restore() aborts cleanly on
# pre-delta-format snapshots)
from statefulstreamprocessor_ray.stages.dedup import (
    content_hash128 as _content_hash128,
)


@dataclass
class StreamingDedupConfig:
    input_path: str  # directory of parquet files (arrival order = sorted names)
    work_dir: str
    out_dir: str
    n_shards: int = 4
    files_per_epoch: int = 1
    id_col: str = "doc_id"
    text_col: str = "text"
    intermediate_compression: str = "none"  # see streaming.py note
    # optional per-batch transform applied BEFORE hashing in phase-0
    # (pa.Table -> pa.Table): may rewrite text_col and drop rows (curation —
    # see pipelines/corpus.CurationPrepare), must keep id_col + text_col.
    # Dedup identity = content AFTER the transform. Must be picklable.
    prepare_fn: object | None = None
    # participates in the partition done-marker: bump it whenever
    # prepare_fn's behavior changes, or cached partitions (keyed only on
    # input fingerprint + layout) would silently serve the OLD transform
    prepare_tag: str = ""



# NOTE on membership testing: packing the two digest halves into complex128
# or 'S16' for np.isin is NOT exact — a half whose bit pattern is a float
# NaN never equals itself, and numpy byte-string comparison stops at null
# bytes. Membership is therefore a two-column pandas merge (vectorized hash
# join on both uint64 halves, bit-exact).


def partition_dedup_input(cfg: StreamingDedupConfig) -> str:
    """Phase 0: hash content, hive-partition by (shard, epoch=file group).
    Tail-append friendly: an untouched file-list prefix only partitions the
    new files, as appended epochs (same protocol as the join job)."""
    import ray.data

    part_dir = os.path.join(cfg.work_dir, "dedup_partitioned")
    marker = os.path.join(part_dir, "_partition_done.json")
    files = sorted(
        os.path.join(cfg.input_path, f)
        for f in os.listdir(cfg.input_path)
        if f.endswith(".parquet")
    )
    fingerprint = [[f, os.path.getsize(f)] for f in files]
    layout = {
        "n_shards": cfg.n_shards,
        "columns": [cfg.id_col, cfg.text_col],
        "files_per_epoch": cfg.files_per_epoch,
        "prepare_tag": cfg.prepare_tag,
    }
    tail_from: int | None = None
    if os.path.exists(marker):
        with open(marker) as m:
            done = json.load(m)
        # missing prepare_tag in a pre-round-3 marker means "no transform"
        # — treat as "" so existing non-curated caches stay valid
        layout_ok = all(
            done.get(k, "" if k == "prepare_tag" else None) == v
            for k, v in layout.items()
        )
        if layout_ok and done["fingerprint"] == fingerprint:
            return part_dir
        if (
            layout_ok
            and len(fingerprint) > len(done["fingerprint"])
            and done["fingerprint"] == fingerprint[: len(done["fingerprint"])]
        ):
            tail_from = len(done["fingerprint"])

    n_shards, id_col, text_col = cfg.n_shards, cfg.id_col, cfg.text_col
    prepare = cfg.prepare_fn

    def tag(batch: pa.Table, epoch: int) -> pa.Table:
        if prepare is not None:
            batch = prepare(batch)
        texts = batch[text_col].to_pandas()
        lo, hi = _content_hash128(texts)
        return pa.table(
            {
                id_col: batch[id_col],
                text_col: batch[text_col],
                "hash_lo": pa.array(lo.view(np.int64), pa.int64()),
                "hash_hi": pa.array(hi.view(np.int64), pa.int64()),
                "shard": pa.array(
                    (lo % np.uint64(n_shards)).astype(np.int32), pa.int32()
                ),
                "epoch": pa.array(
                    np.full(batch.num_rows, epoch, np.int64), pa.int64()
                ),
            }
        )

    import shutil

    tmp = os.path.join(cfg.work_dir, "_dedup_partition_tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    if tail_from is not None:
        new_files = files[tail_from:]
        # crash-idempotent numbering from the MARKER, not the (possibly
        # half-moved) layout — see streaming.partition_input's tail branch
        next_epoch = done.get("n_epochs")
        if next_epoch is None:
            next_epoch = (
                len(done["fingerprint"]) + cfg.files_per_epoch - 1
            ) // cfg.files_per_epoch
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
        ds = ray.data.read_parquet(group, columns=[id_col, text_col]).map_batches(
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
        for sd in sorted(os.listdir(tmp)):
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
    with open(marker, "w") as m:
        json.dump(
            dict(layout, fingerprint=fingerprint, n_epochs=next_epoch + len(groups)),
            m,
        )
    return part_dir


@ray.remote
class DedupShardActor:
    """Holds one shard's seen-content-hash set across epochs."""

    def __init__(self, shard_id: int, cfg_dict: dict, ckpt_dir: str):
        self.shard_id = shard_id
        self.id_col = cfg_dict["id_col"]
        self.text_col = cfg_dict["text_col"]
        self.seen_lo = np.array([], np.uint64)
        self.seen_hi = np.array([], np.uint64)
        self.ckpt = CheckpointStore(ckpt_dir)

    def restore(
        self, last_committed_epoch: int, committed_epochs: list[int] | None = None
    ) -> int:
        """Rebuild the seen-set from DELTA checkpoints: each epoch's file
        holds only that epoch's NEW digests, so checkpoint I/O per epoch is
        O(new rows), not O(total state) — streaming dedup is precisely the
        job whose state never shrinks, and re-snapshotting the full set made
        total checkpoint bytes O(epochs x corpus). Restore = concat of the
        committed epochs' deltas in epoch order (the manifest orders them).
        Returns the max restored epoch, or -1 when the delta set does not
        exactly cover ``committed_epochs`` (the caller aborts the resume)."""
        self.seen_lo = np.array([], np.uint64)
        self.seen_hi = np.array([], np.uint64)
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
            return -1  # missing/extra deltas: state would diverge from output
        from statefulstreamprocessor_ray.stages.dedup import CONTENT_HASH_SCHEME

        lo_parts, hi_parts = [], []
        for e in sorted(found):
            snap = self.ckpt.load(self.shard_id, e)
            if "delta_lo" not in snap:
                return -1  # pre-delta-format snapshot: clean resume-abort
            # digests from a different hash scheme (e.g. a pandas upgrade
            # changed hash_array) would silently stop matching new batches
            # and re-emit every previously-seen duplicate: abort the resume
            # and re-dedup from scratch instead (ADVICE r3)
            if str(snap.get("scheme", "")) != CONTENT_HASH_SCHEME:
                return -1
            lo_parts.append(snap["delta_lo"])
            hi_parts.append(snap["delta_hi"])
        self.seen_lo = np.concatenate(lo_parts)
        self.seen_hi = np.concatenate(hi_parts)
        return max(found)

    def process_epoch(self, epoch: int, epoch_dir: str | None, sink_dir: str) -> dict:
        sink = ExactlyOnceParquetSink(sink_dir)
        if epoch_dir is not None and os.path.isdir(epoch_dir):
            t = pq.read_table(epoch_dir)
        else:
            t = None
        if t is not None and t.num_rows:
            lo = t["hash_lo"].to_numpy(zero_copy_only=False).view(np.uint64)
            hi = t["hash_hi"].to_numpy(zero_copy_only=False).view(np.uint64)
            df = pd.DataFrame(
                {
                    self.id_col: t[self.id_col].to_numpy(zero_copy_only=False),
                    self.text_col: t[self.text_col].to_pandas(),
                    "lo": lo,
                    "hi": hi,
                }
            )
            # within-epoch first occurrence: min id per content
            df = df.sort_values([self.id_col]).drop_duplicates(
                ["lo", "hi"], keep="first"
            )
            # cross-epoch: drop contents already seen (exact two-column join)
            seen_df = pd.DataFrame({"lo": self.seen_lo, "hi": self.seen_hi})
            merged = df.merge(seen_df, on=["lo", "hi"], how="left", indicator=True)
            kept = merged[merged["_merge"] == "left_only"]
            delta_lo = kept["lo"].to_numpy(np.uint64)
            delta_hi = kept["hi"].to_numpy(np.uint64)
            self.seen_lo = np.concatenate([self.seen_lo, delta_lo])
            self.seen_hi = np.concatenate([self.seen_hi, delta_hi])
            out = pa.table(
                {
                    self.id_col: pa.array(
                        kept[self.id_col].to_numpy(np.int64), pa.int64()
                    ),
                    self.text_col: pa.array(kept[self.text_col], pa.string()),
                }
            )
        else:
            out = pa.table(
                {self.id_col: pa.array([], pa.int64()), self.text_col: pa.array([], pa.string())}
            )
            delta_lo = np.array([], np.uint64)
            delta_hi = np.array([], np.uint64)
        part = sink.stage_part(epoch, f"shard{self.shard_id:04d}", out)
        # delta checkpoint: this epoch's new digests only (see restore());
        # the hash-scheme tag makes a silent digest-scheme drift (pandas
        # upgrade) a clean resume-abort instead of re-emitted duplicates
        from statefulstreamprocessor_ray.stages.dedup import CONTENT_HASH_SCHEME

        self.ckpt.save(
            self.shard_id,
            epoch,
            {
                "delta_lo": delta_lo,
                "delta_hi": delta_hi,
                "scheme": CONTENT_HASH_SCHEME,
            },
        )
        part["shard"] = self.shard_id
        part["n_seen"] = int(len(self.seen_lo))
        return part


class StreamingDedupJob:
    def __init__(self, cfg: StreamingDedupConfig):
        self.cfg = cfg
        self.sink = ExactlyOnceParquetSink(cfg.out_dir)
        self.ckpt_dir = os.path.join(cfg.work_dir, "checkpoints")

    def run(self, max_epochs: int | None = None) -> dict:
        cfg = self.cfg
        committed = self.sink.committed_epochs()
        last_committed = committed[-1] if committed else -1

        cfg_dict = {"id_col": cfg.id_col, "text_col": cfg.text_col}
        shards = [
            DedupShardActor.remote(k, cfg_dict, self.ckpt_dir)
            for k in range(cfg.n_shards)
        ]
        restore_refs = [s.restore.remote(last_committed, committed) for s in shards]

        part_dir = partition_dedup_input(cfg)
        epochs = sorted(
            {
                int(e.split("=")[1])
                for sd in os.listdir(part_dir)
                if sd.startswith("shard=")
                for e in os.listdir(os.path.join(part_dir, sd))
                if e.startswith("epoch=")
            }
        )
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
        # no cross-shard gate: submit every epoch up-front (pipelined)
        pending = {
            e: [
                s.process_epoch.remote(
                    e,
                    os.path.join(part_dir, f"shard={k}", f"epoch={e}"),
                    cfg.out_dir,
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
            "n_seen": 0,
        }
        for e in todo:
            parts = ray.get(pending.pop(e))
            self.sink.commit_epoch(e, parts, cursor={"epoch": e})
            stats["epochs_processed"] += 1
            stats["rows_emitted"] += sum(p["rows"] for p in parts)
            stats["n_seen"] = sum(p["n_seen"] for p in parts)
        for s in shards:
            ray.kill(s)
        with open(os.path.join(cfg.out_dir, "_metrics.json"), "w") as f:
            json.dump(stats, f)
        return stats
