"""Checkpoint store: per-(shard, epoch) state snapshots with atomic writes.

The durable-cursor analog of the reference's committed Kafka offsets
(``ts_join_with_kafka_eos.py:109-116``): a shard's snapshot after epoch N
holds its per-key live buffers (with payloads), counters and retired-frontier
cursors, so resume restores the snapshot of the last *committed* epoch and
replays only uncommitted epochs — resume-without-duplication.
"""

from __future__ import annotations

import os
import pickle


class CheckpointStore:
    def __init__(self, ckpt_dir: str):
        self.dir = ckpt_dir
        os.makedirs(ckpt_dir, exist_ok=True)

    def _path(self, shard_id: int, epoch: int) -> str:
        return os.path.join(self.dir, f"shard-{shard_id:04d}-epoch-{epoch:06d}.pkl")

    def save(self, shard_id: int, epoch: int, payload: dict) -> str:
        path = self._path(shard_id, epoch)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        return path

    def load(self, shard_id: int, epoch: int) -> dict | None:
        path = self._path(shard_id, epoch)
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return pickle.load(f)

    def epochs(self, shard_id: int) -> list[int]:
        pre = f"shard-{shard_id:04d}-epoch-"
        out = []
        for f in os.listdir(self.dir):
            if f.startswith(pre) and f.endswith(".pkl"):
                out.append(int(f[len(pre) : -len(".pkl")]))
        return sorted(out)

    def load_at_or_before(self, shard_id: int, epoch: int) -> tuple[int, dict] | None:
        """Latest snapshot with epoch <= the given epoch."""
        cands = [e for e in self.epochs(shard_id) if e <= epoch]
        if not cands:
            return None
        e = max(cands)
        return e, self.load(shard_id, e)

    def prune_after(self, shard_id: int, epoch: int) -> None:
        """Drop snapshots newer than the last committed epoch (stale work)."""
        for e in self.epochs(shard_id):
            if e > epoch:
                os.remove(self._path(shard_id, e))
