"""Streaming CEP: sequence/absence patterns evaluated incrementally per epoch
with bounded carry state and exactly-once manifest commits.

Completes the CEP surface (stages/cep.py is the batch form): the same three
patterns run as an epoch-driven job with per-shard state, so a pattern over a
10^12-turn replay never re-scans history:

- **strict contiguity**: carry = each key's last ``L-1`` rows. Every match
  needs L consecutive rows, so a match found in ``concat(carry, new)`` always
  uses >=1 new row — found exactly once, in the epoch its last row arrives.
- **skip-till-next-match** (requires ``within_s``): carry = each key's rows
  with ``ts > frontier - within``. Any binding chain reaching further back
  than ``within`` fails the span constraint anyway, so scanning the suffix is
  equivalent to scanning full history; a match is emitted iff its END row is
  new (its completion epoch).
- **absence** (A not followed by B within T): state = pending A rows. New B
  rows kill pending As in their window ((ts, tie)-after, ``ts_B - ts_A <=
  T``); an A is emitted once the watermark passes its deadline un-killed
  (event-time epochs make the verdict final: no future row can precede the
  epoch boundary).

Same exactly-once protocol as the other streaming jobs: staged parts +
atomic epoch manifests + checkpointed shard state; second run emits 0 rows,
crash/resume equals the uninterrupted run.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from statefulstreamprocessor_ray.pipelines.streaming import stable_key_hash
from statefulstreamprocessor_ray.sinks.exactly_once import ExactlyOnceParquetSink
from statefulstreamprocessor_ray.stages.cep import _absence_group, _match_group
from statefulstreamprocessor_ray.state.checkpoint import CheckpointStore

US = 1_000_000


@dataclass
class StreamingCepConfig:
    input_path: str  # parquet file or directory
    work_dir: str
    out_dir: str
    # pattern: list of steps for mode sequence; (first, absent) for absence
    mode: str = "sequence"  # "sequence" | "absence"
    pattern: tuple = ("view", "click", "purchase")
    contiguity: str = "strict"  # sequence only: "strict" | "skip"
    within_s: float | None = None  # required for skip and absence
    n_shards: int = 4
    epoch_duration_s: float = 60.0
    key_col: str = "user_id"
    ts_col: str = "ts"
    event_col: str = "event_type"
    tie_col: str = "event_id"
    flush_at_end: bool = True
    intermediate_compression: str = "none"  # see streaming.py note

    def __post_init__(self):
        if self.mode == "absence":
            if self.within_s is None:
                raise ValueError("absence mode requires within_s")
            if len(self.pattern) != 2:
                raise ValueError("absence pattern is (first, absent)")
        elif self.mode == "sequence":
            if self.contiguity == "skip" and self.within_s is None:
                raise ValueError(
                    "streaming skip mode requires within_s (it bounds the carry)"
                )
            if self.contiguity not in ("strict", "skip"):
                raise ValueError("contiguity must be 'strict' or 'skip'")
        else:
            raise ValueError(f"unknown mode {self.mode!r}")


def partition_cep_input(cfg: StreamingCepConfig) -> str:
    """Phase 0: prune to (key, ts, event, tie), add shard/epoch, hive-write."""
    import ray.data

    part_dir = os.path.join(cfg.work_dir, "cep_partitioned")
    marker = os.path.join(part_dir, "_partition_done.json")
    if os.path.isdir(cfg.input_path):
        files = sorted(
            os.path.join(cfg.input_path, f)
            for f in os.listdir(cfg.input_path)
            if f.endswith(".parquet")
        )
    else:
        files = [cfg.input_path]
    fingerprint = [[f, os.path.getsize(f)] for f in files]
    span_us = int(cfg.epoch_duration_s * US)
    # span_us + column names are part of the layout identity (see
    # streaming_windows.partition_window_input): a stale layout under a
    # different epoch span would inflate the frontier, silently dropping
    # epoch-spanning matches and over-truncating the skip-mode carry
    layout = {
        "fingerprint": fingerprint,
        "n_shards": cfg.n_shards,
        "span_us": span_us,
        "columns": [cfg.key_col, cfg.ts_col, cfg.event_col, cfg.tie_col],
    }
    if os.path.exists(marker):
        with open(marker) as m:
            done = json.load(m)
        if all(done.get(k) == v for k, v in layout.items()):
            return part_dir

    n_shards = cfg.n_shards
    key_col, ts_col, event_col, tie_col = (
        cfg.key_col,
        cfg.ts_col,
        cfg.event_col,
        cfg.tie_col,
    )

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pandas()
        shard = (stable_key_hash(keys.to_numpy()) % np.uint64(n_shards)).astype(
            np.int32
        )
        ts = pc.cast(pc.cast(batch[ts_col], pa.timestamp("us")), pa.int64())
        epoch = pc.cast(
            pc.floor(pc.divide(pc.cast(ts, pa.float64()), span_us)), pa.int64()
        )
        return pa.table(
            {
                key_col: batch[key_col],
                "ts_us": ts,
                event_col: batch[event_col],
                tie_col: batch[tie_col],
                "shard": pa.array(shard, pa.int32()),
                "epoch": epoch,
            }
        )

    import shutil

    tmp = os.path.join(cfg.work_dir, "_cep_partition_tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    ds = ray.data.read_parquet(files, columns=[key_col, ts_col, event_col, tie_col])
    ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        tmp,
        partition_cols=["shard", "epoch"],
        compression=cfg.intermediate_compression,
    )
    shutil.rmtree(part_dir, ignore_errors=True)
    os.replace(tmp, part_dir)
    with open(marker, "w") as m:
        json.dump(layout, m)
    return part_dir


@ray.remote
class CepShardActor:
    """Holds one shard's carry rows (sequence) or pending table (absence)."""

    def __init__(self, shard_id: int, cfg_dict: dict, ckpt_dir: str):
        self.shard_id = shard_id
        self.c = cfg_dict
        self.carry: pa.Table | None = None  # sequence: event rows
        self.pending: pd.DataFrame | None = None  # absence: open A rows
        self.frontier_us = -(2**62)
        self.ckpt = CheckpointStore(ckpt_dir)

    def restore(self, last_committed_epoch: int) -> int:
        self.carry = None
        self.pending = None
        self.frontier_us = -(2**62)
        if last_committed_epoch < 0:
            self.ckpt.prune_after(self.shard_id, -(2**62))
            return -1
        found = self.ckpt.load_at_or_before(self.shard_id, last_committed_epoch)
        self.ckpt.prune_after(self.shard_id, last_committed_epoch)
        if found is None:
            return -1
        epoch, snap = found
        self.carry = snap["carry"]
        self.pending = snap["pending"]
        self.frontier_us = snap["frontier_us"]
        return epoch

    # -- sequence ----------------------------------------------------------

    def _seq_epoch(self, new_tbl: pa.Table | None) -> pa.Table:
        c = self.c
        key_col, ts_col, event_col, tie_col = (
            c["key_col"],
            c["ts_col_out"],
            c["event_col"],
            c["tie_col"],
        )
        if new_tbl is None or new_tbl.num_rows == 0:
            combined = None
        elif self.carry is not None and self.carry.num_rows:
            combined = pa.concat_tables(
                [self.carry, new_tbl.select(self.carry.schema.names)]
            )
        else:
            combined = new_tbl
        if combined is None:
            return self._empty_seq_out()
        n_carry = self.carry.num_rows if self.carry is not None else 0
        matches = _match_group(
            combined,
            list(c["pattern"]),
            c["within_us"],
            key_col,
            ts_col,
            event_col,
            tie_col,
            c["contiguity"],
        )
        if n_carry and matches.num_rows:
            # emit only matches completing in THIS epoch: end row must be new.
            # carry rows all have ts <= frontier; new rows have ts > frontier
            # (event-time epochs), so end_ts > frontier identifies them.
            keep = pc.greater(matches["end_ts_us"], self.frontier_us)
            matches = matches.filter(keep)
        # update carry
        idx = pc.sort_indices(
            combined,
            sort_keys=[
                (key_col, "ascending"),
                (ts_col, "ascending"),
                (tie_col, "ascending"),
            ],
        )
        g = combined.take(idx).combine_chunks()
        ts = g[ts_col].to_numpy(zero_copy_only=False)
        codes = (
            pc.dictionary_encode(g[key_col])
            .combine_chunks()
            .indices.to_numpy(zero_copy_only=False)
        )
        n = g.num_rows
        seg_b = np.flatnonzero(np.diff(codes) != 0) + 1
        seg_starts = np.concatenate(([0], seg_b))
        seg_ends = np.concatenate((seg_b, [n]))
        keep_rows = []
        mx = int(ts.max()) if n else self.frontier_us
        for s0, s1 in zip(seg_starts.tolist(), seg_ends.tolist()):
            if c["contiguity"] == "strict":
                k0 = max(s0, s1 - (len(c["pattern"]) - 1))
            else:  # skip: within-window suffix of this key
                k0 = s0 + int(
                    np.searchsorted(ts[s0:s1], mx - c["within_us"], side="right")
                )
                k0 = min(k0, s1)
            keep_rows.append(np.arange(k0, s1, dtype=np.int64))
        kr = np.concatenate(keep_rows) if keep_rows else np.empty(0, np.int64)
        self.carry = g.take(pa.array(kr, pa.int64()))
        if mx > self.frontier_us:
            self.frontier_us = mx
        return matches

    def _key_type(self):
        try:
            return pa.type_for_alias(self.c.get("key_type", "string"))
        except Exception:
            return pa.string()

    def _empty_seq_out(self) -> pa.Table:
        c = self.c
        key_type = (
            self.carry[c["key_col"]].type if self.carry is not None else self._key_type()
        )
        return pa.table(
            {
                c["key_col"]: pa.array([], key_type),
                "start_ts_us": pa.array([], pa.int64()),
                "end_ts_us": pa.array([], pa.int64()),
                "start_event_id": pa.array([], pa.int64()),
                "end_event_id": pa.array([], pa.int64()),
                "span_us": pa.array([], pa.int64()),
            }
        )

    # -- absence -----------------------------------------------------------

    def _absence_epoch(self, new_tbl: pa.Table | None, watermark_us: int) -> pa.Table:
        c = self.c
        key_col, tie_col = c["key_col"], c["tie_col"]
        first, absent = c["pattern"]
        within = c["within_us"]
        if new_tbl is not None and new_tbl.num_rows:
            df = pd.DataFrame(
                {
                    "k": new_tbl[key_col].to_pandas(),
                    "t": new_tbl["ts_us"].to_numpy(zero_copy_only=False),
                    "e": new_tbl[c["event_col"]].to_pandas(),
                    "i": new_tbl[tie_col].to_numpy(zero_copy_only=False).astype(np.int64),
                }
            )
            new_a = df[df["e"] == first][["k", "t", "i"]].copy()
            new_a["deadline"] = new_a["t"] + within
            pend = (
                new_a
                if self.pending is None
                else pd.concat([self.pending, new_a], ignore_index=True)
            )
            bs = df[df["e"] == absent][["k", "t", "i"]]
            if len(pend) and len(bs):
                # kill pending As with ANY B (ts,tie)-after them within window
                m = pend.merge(bs, on="k", suffixes=("_a", "_b"))
                after = (m["t_b"] > m["t_a"]) | (
                    (m["t_b"] == m["t_a"]) & (m["i_b"] > m["i_a"])
                )
                killed = m[after & (m["t_b"] - m["t_a"] <= within)][
                    ["k", "i_a"]
                ].drop_duplicates()
                if len(killed):
                    pend = pend.merge(
                        killed.rename(columns={"i_a": "i"}),
                        on=["k", "i"],
                        how="left",
                        indicator=True,
                    )
                    pend = pend[pend["_merge"] == "left_only"].drop(columns="_merge")
            self.pending = pend.reset_index(drop=True)
            mx = int(df["t"].max())
            if mx > self.frontier_us:
                self.frontier_us = mx
        # fire pendings whose deadline the watermark has passed (no kill seen;
        # event-time epochs: no future B can precede the watermark)
        out = pd.DataFrame({"k": [], "t": [], "i": [], "deadline": []})
        if self.pending is not None and len(self.pending):
            fire = self.pending["deadline"] < watermark_us
            out = self.pending[fire]
            self.pending = self.pending[~fire].reset_index(drop=True)
        return pa.table(
            {
                key_col: pa.array(out["k"].tolist(), self._key_type()),
                "ts_us": pa.array(out["t"].astype(np.int64) if len(out) else [], pa.int64()),
                "event_id": pa.array(out["i"].astype(np.int64) if len(out) else [], pa.int64()),
                "deadline_us": pa.array(
                    out["deadline"].astype(np.int64) if len(out) else [], pa.int64()
                ),
            }
        )

    # -- epoch entry points ------------------------------------------------

    def process_epoch(
        self,
        epoch: int,
        epoch_dir: str | None,
        sink_dir: str,
        watermark_us: int,
        epoch_end_us: int | None = None,
    ) -> dict:
        import time as _time

        t0 = _time.monotonic()
        sink = ExactlyOnceParquetSink(sink_dir)
        c = self.c
        new_tbl = None
        if epoch_dir is not None and os.path.isdir(epoch_dir):
            new_tbl = pq.read_table(
                epoch_dir, columns=[c["key_col"], "ts_us", c["event_col"], c["tie_col"]]
            )
        if c["mode"] == "sequence":
            out = self._seq_epoch(new_tbl)
        else:
            out = self._absence_epoch(new_tbl, watermark_us)
        if epoch_end_us is not None and epoch_end_us - 1 > self.frontier_us:
            self.frontier_us = epoch_end_us - 1  # idle-shard watermark advance
        part = sink.stage_part(epoch, f"shard{self.shard_id:04d}", out)
        self.ckpt.save(
            self.shard_id,
            epoch,
            {
                "carry": self.carry,
                "pending": self.pending,
                "frontier_us": self.frontier_us,
            },
        )
        part["shard"] = self.shard_id
        part["max_ts_us"] = self.frontier_us
        part["wall_ms"] = round((_time.monotonic() - t0) * 1000, 1)
        return part

    def flush(self, epoch: int, sink_dir: str) -> dict:
        """End-of-stream: absence pendings are decided with the input horizon
        as the watermark; sequence modes have nothing buffered to flush (a
        match only exists once its last row arrived — already emitted)."""
        import time as _time

        t0 = _time.monotonic()
        sink = ExactlyOnceParquetSink(sink_dir)
        if self.c["mode"] == "absence":
            out = self._absence_epoch(None, 2**62)
        else:
            out = self._empty_seq_out()
        part = sink.stage_part(epoch, f"shard{self.shard_id:04d}", out)
        self.ckpt.save(
            self.shard_id,
            epoch,
            {
                "carry": self.carry,
                "pending": self.pending,
                "frontier_us": self.frontier_us,
            },
        )
        part["shard"] = self.shard_id
        part["max_ts_us"] = self.frontier_us
        part["wall_ms"] = round((_time.monotonic() - t0) * 1000, 1)
        return part


class StreamingCepJob:
    """Per-epoch barrier (absence emission needs the global watermark;
    sequence modes ride along for a single uniform loop)."""

    def __init__(self, cfg: StreamingCepConfig):
        self.cfg = cfg
        self.sink = ExactlyOnceParquetSink(cfg.out_dir)
        self.ckpt_dir = os.path.join(cfg.work_dir, "cep_checkpoints")

    def run(self, max_epochs: int | None = None) -> dict:
        cfg = self.cfg
        committed = self.sink.committed_epochs()
        last_committed = committed[-1] if committed else -1
        part_dir = partition_cep_input(cfg)
        key_type = "string"
        for root, _, fs in os.walk(part_dir):
            pf = [f for f in fs if f.endswith(".parquet")]
            if pf:
                sch = pq.read_schema(os.path.join(root, pf[0]))
                key_type = str(sch.field(cfg.key_col).type)
                break
        cfg_dict = {
            "mode": cfg.mode,
            "pattern": tuple(cfg.pattern),
            "contiguity": cfg.contiguity,
            "within_us": int(cfg.within_s * US) if cfg.within_s is not None else None,
            "key_col": cfg.key_col,
            "ts_col_out": "ts_us",
            "event_col": cfg.event_col,
            "tie_col": cfg.tie_col,
            "key_type": key_type,
        }
        shards = [
            CepShardActor.remote(k, cfg_dict, self.ckpt_dir)
            for k in range(cfg.n_shards)
        ]
        restore_refs = [s.restore.remote(last_committed) for s in shards]
        epochs = sorted(
            {
                int(e.split("=")[1])
                for sd in os.listdir(part_dir)
                if sd.startswith("shard=")
                for e in os.listdir(os.path.join(part_dir, sd))
                if e.startswith("epoch=")
            }
        )
        flush_epoch = (epochs[-1] + 1) if epochs else 0
        all_epochs = epochs + ([flush_epoch] if cfg.flush_at_end else [])
        if committed != all_epochs[: len(committed)]:
            # explicit raise (not assert): exactly-once guard, survives -O
            raise RuntimeError(
                "manifest set must be a prefix of the epoch sequence: "
                f"committed={committed} epochs={all_epochs}"
            )
        restored = ray.get(restore_refs)
        if last_committed >= 0 and any(r != last_committed for r in restored):
            raise RuntimeError(
                f"resume aborted: manifests reach {last_committed}, checkpoints {restored}"
            )

        watermark = -(2**62)
        if last_committed >= 0:
            watermark = self.sink.manifest(last_committed)["cursor"].get(
                "watermark_us", -(2**62)
            )
        span_us = int(cfg.epoch_duration_s * US)
        stats = {
            "epochs_total": len(all_epochs),
            "epochs_skipped": len(committed),
            "epochs_processed": 0,
            "rows_emitted": 0,
            "watermark_us": None,
            "per_epoch": [],
        }
        processed = 0
        for epoch in all_epochs:
            if epoch <= last_committed:
                continue
            if max_epochs is not None and processed >= max_epochs:
                break
            if epoch == flush_epoch and cfg.flush_at_end:
                parts = ray.get([s.flush.remote(epoch, cfg.out_dir) for s in shards])
            else:
                parts = ray.get(
                    [
                        s.process_epoch.remote(
                            epoch,
                            os.path.join(part_dir, f"shard={k}", f"epoch={epoch}"),
                            cfg.out_dir,
                            watermark,
                            (epoch + 1) * span_us,
                        )
                        for k, s in enumerate(shards)
                    ]
                )
                watermark = max(watermark, min(p["max_ts_us"] for p in parts))
            self.sink.commit_epoch(
                epoch, parts, cursor={"epoch": epoch, "watermark_us": watermark}
            )
            rows = sum(p["rows"] for p in parts)
            stats["rows_emitted"] += rows
            stats["watermark_us"] = watermark
            stats["epochs_processed"] += 1
            stats["per_epoch"].append({"epoch": epoch, "rows": rows})
            processed += 1
        for s in shards:
            ray.kill(s)
        return stats
