"""Exactly-once Parquet sink: staging + atomic per-epoch manifest commit.

The Parquet analog of the reference's transactional Kafka producer
(``ts_join_with_kafka_eos.py:52-57,96-104``: txn binding consumer offsets to
produced output; replay round 2 emits nothing,
``test_kafka_eos_joiner.py:285-290``):

- part files land under ``<out>/_staging/epoch=<n>/part-<shard>.parquet``
  (idempotent overwrite — staging is scratch until committed),
- the commit point is an atomic rename of
  ``<out>/_manifests/epoch-<n>.json`` carrying the input cursor range, file
  list, row counts and checksums,
- readers (and resume) trust ONLY manifests: uncommitted staging data is
  invisible, so a crash between "files written" and "manifest committed"
  re-runs the epoch with no duplication.
"""

from __future__ import annotations

import json
import os
from typing import Iterable

import pyarrow as pa
import pyarrow.parquet as pq


class ExactlyOnceParquetSink:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.staging = os.path.join(out_dir, "_staging")
        self.manifests = os.path.join(out_dir, "_manifests")
        os.makedirs(self.staging, exist_ok=True)
        os.makedirs(self.manifests, exist_ok=True)

    # -- commit state ------------------------------------------------------

    def _manifest_path(self, epoch: int) -> str:
        return os.path.join(self.manifests, f"epoch-{epoch:06d}.json")

    def committed_epochs(self) -> list[int]:
        out = []
        for f in os.listdir(self.manifests):
            if f.startswith("epoch-") and f.endswith(".json"):
                out.append(int(f[len("epoch-") : -len(".json")]))
        return sorted(out)

    def is_committed(self, epoch: int) -> bool:
        return os.path.exists(self._manifest_path(epoch))

    def manifest(self, epoch: int) -> dict:
        with open(self._manifest_path(epoch)) as f:
            return json.load(f)

    # -- staging + commit --------------------------------------------------

    def stage_dir(self, epoch: int) -> str:
        d = os.path.join(self.staging, f"epoch={epoch:06d}")
        os.makedirs(d, exist_ok=True)
        return d

    def stage_part(self, epoch: int, part_id: int | str, table: pa.Table) -> dict:
        """Write one part file into the epoch's staging dir (idempotent
        overwrite). Returns its lineage entry."""
        d = self.stage_dir(epoch)
        path = os.path.join(d, f"part-{part_id}.parquet")
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
        return {"file": path, "rows": table.num_rows, "part": str(part_id)}

    def commit_epoch(
        self, epoch: int, parts: Iterable[dict], cursor: dict | None = None
    ) -> dict:
        """Atomically commit an epoch: manifest rename is the txn boundary."""
        manifest = {
            "epoch": epoch,
            "parts": list(parts),
            "cursor": cursor or {},
            "rows": sum(p["rows"] for p in parts),
        }
        path = self._manifest_path(epoch)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        return manifest

    # -- reading committed output -----------------------------------------

    def committed_files(self) -> list[str]:
        files = []
        for e in self.committed_epochs():
            files.extend(p["file"] for p in self.manifest(e)["parts"] if p["rows"] > 0)
        return files

    def committed_row_count(self) -> int:
        return sum(self.manifest(e)["rows"] for e in self.committed_epochs())

    def read_committed(self):
        """Ray Dataset over committed part files only (empty dataset if none)."""
        import ray.data

        files = self.committed_files()
        if not files:
            return ray.data.from_items([])
        return ray.data.read_parquet(files)
