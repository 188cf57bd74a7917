"""Streaming tumbling-window aggregation with watermark-gated emission.

The windowed pendant of ``pipelines/streaming.py``'s join job, completing the
structured-streaming surface (reference pendant: the Flink job's event-time
windows + watermarks, ``05_Flink_Java/.../StreamJoiner.java:57-92``):

- phase 0 hive-partitions the keyed events by ``(shard, epoch)`` (same
  explicit one-exchange layout as the join job);
- each shard actor holds the **open-window partial table** —
  ``(key, window_start_us, n, sum_cents)`` — merged incrementally per epoch
  with one vectorized pandas groupby (classic combiner state: O(open windows),
  not O(events));
- a window is **emitted exactly once**, when the global watermark
  (min over shard frontiers − allowed lateness) passes its end; until then it
  stays in state, surviving crash/resume via the checkpoint store;
- epoch manifests + staged parts give the same exactly-once / resume
  guarantees as the join job (second run over committed input emits 0 rows).

Aggregates are integer cents (``floor(value*100 + 0.5)``) so merges are
order-independent and the final output is byte-equal to the batch
``tumbling_agg`` query / its DuckDB oracle — asserted in tests.
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
from statefulstreamprocessor_ray.state.checkpoint import CheckpointStore

US = 1_000_000


@dataclass
class StreamingWindowConfig:
    input_path: str  # parquet file or directory
    work_dir: str
    out_dir: str
    n_shards: int = 4
    epoch_duration_s: float = 60.0
    window_size_s: float = 3600.0
    allowed_lateness_s: float = 0.0
    key_col: str = "user_id"
    ts_col: str = "ts"
    value_col: str = "value"
    # emit still-open windows after the last epoch (batch parity); False
    # leaves them in state for a future run over more input
    flush_at_end: bool = True
    intermediate_compression: str = "none"  # see streaming.py note
    # "tumbling" | "sliding" | "session"
    window_kind: str = "tumbling"
    slide_s: float | None = None  # sliding only; each event joins size/slide windows
    gap_s: float | None = None  # session only; inactivity gap


def partition_window_input(cfg: StreamingWindowConfig) -> str:
    """Phase 0: prune to (key, ts, value), add shard/epoch, hive-partition."""
    import ray.data

    part_dir = os.path.join(cfg.work_dir, "win_partitioned")
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
    # span_us and the column names are part of the layout identity: a reused
    # work_dir with a different epoch duration (or key/ts/value cols) would
    # otherwise silently serve epochs laid out under the OLD span while
    # frontier advances use the new one — watermarks jump past pending events
    # and windows emit early / twice
    layout = {
        "fingerprint": fingerprint,
        "n_shards": cfg.n_shards,
        "span_us": span_us,
        "columns": [cfg.key_col, cfg.ts_col, cfg.value_col],
    }
    if os.path.exists(marker):
        with open(marker) as m:
            done = json.load(m)
        if all(done.get(k) == v for k, v in layout.items()):
            return part_dir

    n_shards = cfg.n_shards
    key_col, ts_col, value_col = cfg.key_col, cfg.ts_col, cfg.value_col

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
                value_col: batch[value_col],
                "shard": pa.array(shard, pa.int32()),
                "epoch": epoch,
            }
        )

    import shutil

    tmp = os.path.join(cfg.work_dir, "_win_partition_tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    ds = ray.data.read_parquet(files, columns=[key_col, ts_col, value_col])
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
class WindowShardActor:
    """Holds one shard's open-window partials across epochs."""

    def __init__(self, shard_id: int, cfg_dict: dict, ckpt_dir: str):
        self.shard_id = shard_id
        self.key_col = cfg_dict["key_col"]
        self.value_col = cfg_dict["value_col"]
        self.window_us = cfg_dict["window_us"]
        self.kind = cfg_dict.get("kind", "tumbling")
        self.slide_us = cfg_dict.get("slide_us")
        self.gap_us = cfg_dict.get("gap_us")
        # tumbling/sliding: (key, window_start_us, n, sum_cents)
        # session: (key, session_start_us, session_end_us, n, sum_cents)
        self.open: pd.DataFrame | None = None
        self.frontier_us = -(2**62)
        self.ckpt = CheckpointStore(ckpt_dir)

    def restore(self, last_committed_epoch: int) -> int:
        self.open = None
        self.frontier_us = -(2**62)
        if last_committed_epoch < 0:
            self.ckpt.prune_after(self.shard_id, -(2**62))
            return -1
        found = self.ckpt.load_at_or_before(self.shard_id, last_committed_epoch)
        self.ckpt.prune_after(self.shard_id, last_committed_epoch)
        if found is None:
            return -1
        epoch, snap = found
        self.open = snap["open"]
        self.frontier_us = snap["frontier_us"]
        return epoch

    def _empty_out(self) -> pd.DataFrame:
        if self.kind == "session":
            return pd.DataFrame(
                {
                    self.key_col: pd.Series([], dtype="object"),
                    "session_start_us": pd.Series([], dtype="int64"),
                    "session_end_us": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "sum_cents": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                self.key_col: pd.Series([], dtype="object"),
                "window_start_us": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
                "sum_cents": pd.Series([], dtype="int64"),
            }
        )

    def _emit_closed(self, watermark_us: int) -> pd.DataFrame:
        if self.open is None or self.open.empty:
            return self._empty_out()
        if self.kind == "session":
            # a session is closed once no future event can extend it:
            # watermark has passed end + gap
            closed = self.open["session_end_us"] + self.gap_us <= watermark_us
        else:
            closed = self.open["window_start_us"] + self.window_us <= watermark_us
        out = self.open.loc[closed]
        self.open = self.open.loc[~closed]
        return out

    def _merge_epoch(self, t: pa.Table) -> None:
        """Fold one epoch's rows into the open-window/session state."""
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        cents = np.floor(
            t[self.value_col].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        keys = t[self.key_col].to_pandas()
        if self.kind == "session":
            part = pd.DataFrame(
                {
                    self.key_col: keys,
                    "session_start_us": ts,
                    "session_end_us": ts,
                    "n": np.ones(len(ts), np.int64),
                    "sum_cents": cents,
                }
            )
            merged = part if self.open is None else pd.concat([self.open, part])
            # gaps-and-islands over (key, start): one vectorized pass merges
            # events into existing sessions and coalesces sessions that a new
            # event bridged
            merged = merged.sort_values(
                [self.key_col, "session_start_us", "session_end_us"]
            ).reset_index(drop=True)
            key_change = merged[self.key_col].ne(merged[self.key_col].shift())
            running_end = (
                merged.groupby(
                    (key_change).cumsum()
                )["session_end_us"].cummax()
                .shift()
                .fillna(-(2**62))
            )
            new_session = key_change | (
                merged["session_start_us"] - running_end > self.gap_us
            )
            sid = new_session.cumsum()
            self.open = (
                merged.groupby(sid, sort=False)
                .agg(
                    **{
                        self.key_col: (self.key_col, "first"),
                        "session_start_us": ("session_start_us", "min"),
                        "session_end_us": ("session_end_us", "max"),
                        "n": ("n", "sum"),
                        "sum_cents": ("sum_cents", "sum"),
                    }
                )
                .reset_index(drop=True)
            )
            return
        if self.kind == "sliding":
            k = int(self.window_us // self.slide_us)
            offs = np.arange(k, dtype=np.int64)
            base = ts // self.slide_us * self.slide_us
            wstart = (base[:, None] - offs[None, :] * self.slide_us).reshape(-1)
            part = pd.DataFrame(
                {
                    self.key_col: np.repeat(keys.to_numpy(), k),
                    "window_start_us": wstart,
                    "n": np.ones(len(ts) * k, np.int64),
                    "sum_cents": np.repeat(cents, k),
                }
            )
        else:
            part = pd.DataFrame(
                {
                    self.key_col: keys,
                    "window_start_us": ts // self.window_us * self.window_us,
                    "n": np.ones(len(ts), np.int64),
                    "sum_cents": cents,
                }
            )
        merged = part if self.open is None else pd.concat([self.open, part])
        self.open = merged.groupby(
            [self.key_col, "window_start_us"], as_index=False, sort=False
        )[["n", "sum_cents"]].sum()

    def process_epoch(
        self,
        epoch: int,
        epoch_dir: str | None,
        sink_dir: str,
        watermark_us: int,
        epoch_end_us: int | None = None,
    ) -> dict:
        import time as _time

        t_start = _time.monotonic()
        sink = ExactlyOnceParquetSink(sink_dir)
        if epoch_dir is not None and os.path.isdir(epoch_dir):
            t = pq.read_table(epoch_dir, columns=[self.key_col, "ts_us", self.value_col])
            if t.num_rows:
                self._merge_epoch(t)
                mx = int(t["ts_us"].to_numpy(zero_copy_only=False).max())
                if mx > self.frontier_us:
                    self.frontier_us = mx
        # Idle-shard watermark advance: epochs are event-time slices, so once
        # epoch e is processed NO future row anywhere has ts < (e+1)*span.
        # A shard that owns no keys (or saw no rows this epoch) may therefore
        # advance its frontier to the epoch boundary — otherwise one idle
        # shard pins the global min-frontier watermark at -inf forever (the
        # classic idle-partition stall).
        if epoch_end_us is not None and epoch_end_us - 1 > self.frontier_us:
            self.frontier_us = epoch_end_us - 1

        out = self._emit_closed(watermark_us)
        tbl = pa.Table.from_pandas(out, preserve_index=False)
        part_info = sink.stage_part(epoch, f"shard{self.shard_id:04d}", tbl)
        self.ckpt.save(
            self.shard_id,
            epoch,
            {"open": self.open, "frontier_us": self.frontier_us},
        )
        part_info["shard"] = self.shard_id
        part_info["max_ts_us"] = self.frontier_us
        part_info["n_open_windows"] = 0 if self.open is None else len(self.open)
        part_info["wall_ms"] = round((_time.monotonic() - t_start) * 1000, 1)
        return part_info

    def flush(self, epoch: int, sink_dir: str) -> dict:
        """Final flush: emit every remaining open window (end-of-stream)."""
        sink = ExactlyOnceParquetSink(sink_dir)
        out = self._emit_closed(2**62)
        tbl = pa.Table.from_pandas(out, preserve_index=False)
        part_info = sink.stage_part(epoch, f"shard{self.shard_id:04d}", tbl)
        self.ckpt.save(
            self.shard_id, epoch, {"open": self.open, "frontier_us": self.frontier_us}
        )
        part_info["shard"] = self.shard_id
        part_info["max_ts_us"] = self.frontier_us
        part_info["n_open_windows"] = 0 if self.open is None else len(self.open)
        return part_info


class StreamingWindowJob:
    """Epoch loop with a per-epoch barrier (emission needs the global
    watermark, which needs every shard's frontier from the previous epoch)."""

    def __init__(self, cfg: StreamingWindowConfig):
        self.cfg = cfg
        self.sink = ExactlyOnceParquetSink(cfg.out_dir)
        self.ckpt_dir = os.path.join(cfg.work_dir, "win_checkpoints")

    def run(self, max_epochs: int | None = None) -> dict:
        cfg = self.cfg
        committed = self.sink.committed_epochs()
        last_committed = committed[-1] if committed else -1

        if cfg.window_kind not in ("tumbling", "sliding", "session"):
            raise ValueError(f"unknown window_kind {cfg.window_kind!r}")
        if cfg.window_kind == "sliding":
            if not cfg.slide_s or int(cfg.window_size_s * US) % int(cfg.slide_s * US):
                raise ValueError("sliding windows need slide_s dividing window_size_s")
        if cfg.window_kind == "session" and not cfg.gap_s:
            raise ValueError("session windows need gap_s")
        cfg_dict = {
            "key_col": cfg.key_col,
            "value_col": cfg.value_col,
            "window_us": int(cfg.window_size_s * US),
            "kind": cfg.window_kind,
            "slide_us": int(cfg.slide_s * US) if cfg.slide_s else None,
            "gap_us": int(cfg.gap_s * US) if cfg.gap_s else None,
        }
        shards = [
            WindowShardActor.remote(k, cfg_dict, self.ckpt_dir)
            for k in range(cfg.n_shards)
        ]
        restore_refs = [s.restore.remote(last_committed) for s in shards]

        part_dir = partition_window_input(cfg)
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
            # explicit raise (not assert): this is an exactly-once guard and
            # must survive `python -O`
            raise RuntimeError(
                "manifest set must be a prefix of the epoch sequence: "
                f"committed={committed} epochs={all_epochs}"
            )
        restored = ray.get(restore_refs)
        if last_committed >= 0 and any(r != last_committed for r in restored):
            raise RuntimeError(
                "resume aborted: committed manifests reach epoch "
                f"{last_committed} but checkpoints restored {restored}"
            )

        watermark = -(2**62)
        if last_committed >= 0:
            watermark = self.sink.manifest(last_committed)["cursor"].get(
                "watermark_us", -(2**62)
            )
        lateness_us = int(cfg.allowed_lateness_s * US)
        stats = {
            "epochs_total": len(all_epochs),
            "epochs_skipped": len(committed),
            "epochs_processed": 0,
            "rows_emitted": 0,
            "open_windows": 0,
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
                span_us = int(cfg.epoch_duration_s * US)
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
                watermark = max(
                    watermark, min(p["max_ts_us"] for p in parts) - lateness_us
                )
            self.sink.commit_epoch(
                epoch, parts, cursor={"epoch": epoch, "watermark_us": watermark}
            )
            rows = sum(p["rows"] for p in parts)
            stats["rows_emitted"] += rows
            stats["open_windows"] = sum(p["n_open_windows"] for p in parts)
            stats["watermark_us"] = watermark
            stats["epochs_processed"] += 1
            stats["per_epoch"].append(
                {"epoch": epoch, "rows": rows, "watermark_us": watermark}
            )
            processed += 1

        for s in shards:
            ray.kill(s)
        return stats
