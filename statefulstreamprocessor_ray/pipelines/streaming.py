"""Streaming replay with persistent shard state, checkpoints, and an
exactly-once sink.

The Ray re-expression of the reference's consume-join-produce loop with Kafka
transactions (``ts_join_with_kafka_eos.py:119-183`` mode A;
``test_kafka_eos_joiner.py:181-286`` mode B periodic commits):

- **Partition step** (one wide pass, Ray Data): read transcripts, derive the
  tagged left/right streams, add ``shard = hash(conv_id) % K`` and
  ``epoch = ts // epoch_duration`` columns, write hive-partitioned Parquet.
  At 100 TB this is the single all-to-all exchange; everything after is
  embarrassingly parallel per shard and resumable per epoch.
- **Epoch loop**: K long-lived ``JoinShardActor``s each own the keys hashing
  to their shard and hold per-key ``OrderedJoinState`` across epochs (the
  "one StreamBuffer per key-group" design the reference implies via Kafka
  message keys). Per epoch each shard reads only its own partition directory,
  replays it in pinned (ts, side, tie) order, stages its output part file,
  and snapshots its state; the driver then atomically commits the epoch
  manifest (the Kafka-transaction analog binding input cursors to output).
- **Resume**: restore each shard's snapshot at the last committed epoch and
  re-run only uncommitted epochs. A second full run over committed input
  emits 0 new rows (the reference's idempotent-replay proof,
  ``test_kafka_eos_joiner.py:285-290``).

Because epochs are event-time slices and replay order within a key is the
same pinned sort as the batch path, the streaming output row set equals the
batch ``flagship_join`` output — asserted in tests.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from statefulstreamprocessor_ray.functions.streams import StreamSpec, tag_streams_batch
from statefulstreamprocessor_ray.sinks.exactly_once import ExactlyOnceParquetSink
from statefulstreamprocessor_ray.state.checkpoint import CheckpointStore
from statefulstreamprocessor_ray.state.stream_buffer import OrderedJoinState

US = 1_000_000


def stable_key_hash(keys: np.ndarray) -> np.ndarray:
    """Deterministic (cross-process) vectorized string hash; pandas'
    hash_array uses a fixed key, unlike Python's salted hash()."""
    return pd.util.hash_array(np.asarray(keys, dtype=object), categorize=False)


@dataclass
class StreamingJoinConfig:
    input_path: str
    work_dir: str
    out_dir: str
    n_shards: int = 4
    epoch_duration_s: float = 60.0
    delta_time: float | None = None
    allowed_lateness_s: float = 0.0
    spec: StreamSpec = field(default_factory=StreamSpec)
    payload_cols: tuple = ("turn_idx", "text", "tool")
    # "ts": epochs are event-time slices (replay of an ordered log — no late
    # data by construction). "arrival": epochs are input-file groups in
    # arrival order; events older than the watermark (min shard frontier minus
    # allowed_lateness_s) are dropped-and-counted, and events within lateness
    # that still regress their own key's frontier violate the per-stream
    # in-order precondition (reference README.md:219-230) and are
    # dropped-and-counted separately.
    epoch_by: str = "ts"
    files_per_epoch: int = 1
    # phase-0 intermediate compression: "none" is fastest on a local/NVMe
    # work_dir (measured 2.1s -> 1.4s on the 10M-turn corpus); pick
    # "snappy"/"zstd" when work_dir is remote object storage where bytes on
    # the wire dominate
    intermediate_compression: str = "none"
    # Bounded-state guard for pathological one-sided streams (the reference's
    # acknowledged unbounded-buffer TODO, README.md:270-274): when set, a
    # shard's carry table is truncated to its newest N rows, counting
    # evictions (lossy for pairs that would have reached across the evicted
    # history — which a set delta_time would drop anyway). Off by default.
    max_carry_rows_per_shard: int | None = None
    # The reference's ``join_function`` hook in its STREAMING loop
    # (ts_join_with_kafka_eos.py:86-106, passed at :120-123): a batch UDF
    # applied to each epoch's joined rows before staging — e.g.
    # functions.ops.power_join_projection. Must be picklable (it ships to the
    # shard actors once, at construction).
    join_fn: object | None = None
    # Row-level source provenance, the engine's analog of the reference's
    # per-record Kafka topic/partition/offset metadata
    # (ts_join_with_kafka_eos.py:151-156) and its conditional
    # r.metadata/s.metadata join output (local_stream_buffer.py:383-389):
    # when True, phase-0 attaches (src_file_idx:int32, src_row:int64) —
    # index into the sorted input-file list + row index within the file —
    # and the join output carries r_src_file_idx/r_src_row and
    # s_src_file_idx/s_src_row, so any output pair maps back to its exact
    # input rows for replay debugging. Opt-in (mirrors the reference's
    # conditional metadata emission); adds two int columns to the shuffle.
    provenance: bool = False


PROVENANCE_COLS = ("src_file_idx", "src_row")


def _effective_payload_cols(cfg: StreamingJoinConfig) -> list[str]:
    cols = list(cfg.payload_cols)
    if cfg.provenance:
        cols += [c for c in PROVENANCE_COLS if c not in cols]
    return cols


def _provenance_read(
    files: list[str], file_idx_of: dict[str, int], n_blocks: int | None = None
):
    """Read parquet files with exact per-row provenance: read tasks over
    row groups, each attaching src_file_idx (position in the sorted
    input-file list — the 'partition') and src_row (row index within the
    file — the 'offset'). ``n_blocks`` caps the OUTPUT block count by
    grouping several row groups per task — each downstream block's
    hive-partition writer opens one file per touched (shard, epoch) dir,
    so one-block-per-row-group would reintroduce the blocks x partitions
    write blowup the non-provenance path bounds."""
    import ray.data

    from concurrent.futures import ThreadPoolExecutor

    def file_items(f: str) -> list[dict]:
        md = pq.ParquetFile(f).metadata
        out, off = [], 0
        for rg in range(md.num_row_groups):
            out.append(
                {
                    "path": f,
                    "file_idx": file_idx_of[f],
                    "rg": rg,
                    "row_start": off,
                }
            )
            off += md.row_group(rg).num_rows
        return out

    # footer scans are tiny metadata reads but latency-bound: a serial loop
    # over thousands of bulk-ingest files stalls the driver (ADVICE r3)
    with ThreadPoolExecutor(max_workers=min(16, max(4, len(files)))) as ex:
        items = [it for sub in ex.map(file_items, files) for it in sub]

    def read_rg(batch: pd.DataFrame) -> pa.Table:
        parts = []
        for _, it in batch.iterrows():
            t = pq.ParquetFile(it["path"]).read_row_group(int(it["rg"]))
            n = t.num_rows
            t = t.append_column(
                "src_file_idx",
                pa.array(np.full(n, it["file_idx"], np.int32), pa.int32()),
            )
            t = t.append_column(
                "src_row",
                pa.array(
                    int(it["row_start"]) + np.arange(n, dtype=np.int64), pa.int64()
                ),
            )
            parts.append(t)
        return pa.concat_tables(parts)

    rgs_per_task = (
        max(1, (len(items) + n_blocks - 1) // n_blocks) if n_blocks else 1
    )
    return ray.data.from_items(items).map_batches(
        read_rg, batch_size=rgs_per_task, batch_format="pandas"
    )


def partition_input(cfg: StreamingJoinConfig) -> str:
    """Phase 0: tag streams and hive-partition by (shard, epoch). Resumable:
    skipped when the done-marker matches the input fingerprint."""
    import ray.data

    part_dir = os.path.join(cfg.work_dir, "partitioned")
    marker = os.path.join(part_dir, "_partition_done.json")
    files = sorted(
        os.path.join(cfg.input_path, f)
        for f in os.listdir(cfg.input_path)
        if f.endswith(".parquet")
    )
    fingerprint = [[f, os.path.getsize(f)] for f in files]
    tail_from: int | None = None
    if os.path.exists(marker):
        with open(marker) as m:
            done = json.load(m)
        layout_ok = (
            done["n_shards"] == cfg.n_shards
            and done.get("epoch_by", "ts") == cfg.epoch_by
            and done.get("columns") == sorted(
                {cfg.spec.key_col, cfg.spec.ts_col, cfg.spec.tie_col, "stream_side",
                 *_effective_payload_cols(cfg)}
            )
        )
        if layout_ok and done["fingerprint"] == fingerprint:
            return part_dir
        if (
            layout_ok
            and cfg.epoch_by == "arrival"
            and len(fingerprint) > len(done["fingerprint"])
            and done["fingerprint"] == fingerprint[: len(done["fingerprint"])]
        ):
            # follow-the-tail: the previous file set is an untouched prefix
            # of the current one — partition ONLY the new files, as new
            # epochs appended after the existing sequence. (New files are
            # grouped files_per_epoch at a time from the tail start; an
            # earlier partial trailing group keeps its original epoch.)
            tail_from = len(done["fingerprint"])

    spec, n_shards = cfg.spec, cfg.n_shards
    span_us = int(cfg.epoch_duration_s * US)

    # phase-0 writes only what the shard replay reads (key/ts/tie/side +
    # payload): source columns like transcript `role` would otherwise be
    # written to — and re-read from — every (shard, epoch) partition
    keep_cols = list(
        dict.fromkeys(
            [
                spec.key_col,
                spec.ts_col,
                spec.tie_col,
                "stream_side",
                *_effective_payload_cols(cfg),
            ]
        )
    )
    file_idx_of = {f: i for i, f in enumerate(files)}

    def read_files(group: list[str], n_blocks: int | None = None):
        if cfg.provenance:
            return _provenance_read(group, file_idx_of, n_blocks=n_blocks)
        if n_blocks is not None:
            return ray.data.read_parquet(group, override_num_blocks=n_blocks)
        return ray.data.read_parquet(group)

    def tag_and_partition(batch: pa.Table, fixed_epoch: int | None = None) -> pa.Table:
        tagged = tag_streams_batch(batch, spec).select(keep_cols)
        # to_pandas keeps strings as one block for hash_array — to_pylist
        # would Pythonize every key per batch on the wide phase-0 path
        keys = tagged[spec.key_col].to_pandas().to_numpy()
        shard = (stable_key_hash(keys) % n_shards).astype(np.int32)
        if fixed_epoch is None:
            ts = pc.cast(pc.cast(tagged[spec.ts_col], pa.timestamp("us")), pa.int64())
            epoch = pc.cast(
                pc.floor(pc.divide(pc.cast(ts, pa.float64()), span_us)), pa.int64()
            )
        else:
            epoch = pa.array(np.full(tagged.num_rows, fixed_epoch, np.int64))
        tagged = tagged.append_column("shard", pa.array(shard, pa.int32()))
        tagged = tagged.append_column("epoch", epoch)
        return tagged

    import shutil

    tmp_dir = os.path.join(cfg.work_dir, "_partition_tmp")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    if tail_from is not None:
        new_files = files[tail_from:]
        fpe = cfg.files_per_epoch
        # CRASH-IDEMPOTENT numbering: the next epoch derives from the MARKER
        # (the committed prefix's group count), never from list_epochs() — a
        # crash between the dir moves below and the marker rewrite must
        # re-run the SAME epoch numbers and overwrite the half-moved dirs,
        # not append the same rows again under fresh numbers (review finding)
        next_epoch = done.get("n_epochs")
        if next_epoch is None:  # marker predates n_epochs: derive from files
            next_epoch = (len(done["fingerprint"]) + fpe - 1) // fpe
        n_groups = (len(new_files) + fpe - 1) // fpe
        # bounded block count also in the per-group path: without it,
        # provenance mode emits one block per row group and the hive write
        # re-blows blocks x (shard, epoch) partitions (ADVICE r3)
        try:
            grp_blocks = max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)
        except Exception:
            grp_blocks = 64
        for g in range(n_groups):
            group = new_files[g * fpe : (g + 1) * fpe]
            ds = read_files(group, n_blocks=grp_blocks).map_batches(
                lambda b, fe=next_epoch + g: tag_and_partition(b, fe),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            ds.write_parquet(
                tmp_dir,
                partition_cols=["shard", "epoch"],
                compression=cfg.intermediate_compression,
            )
        for sd in sorted(os.listdir(tmp_dir)):
            if not sd.startswith("shard="):
                continue
            os.makedirs(os.path.join(part_dir, sd), exist_ok=True)
            for ed in sorted(os.listdir(os.path.join(tmp_dir, sd))):
                dst = os.path.join(part_dir, sd, ed)
                if os.path.isdir(dst):  # leftover of a crashed prior attempt
                    shutil.rmtree(dst)
                os.replace(os.path.join(tmp_dir, sd, ed), dst)
        shutil.rmtree(tmp_dir, ignore_errors=True)
        with open(marker, "w") as m:
            json.dump(
                {
                    "fingerprint": fingerprint,
                    "n_shards": cfg.n_shards,
                    "epoch_by": cfg.epoch_by,
                    "columns": sorted(set(keep_cols)),
                    "n_epochs": next_epoch + n_groups,
                },
                m,
            )
        return part_dir
    if cfg.epoch_by == "arrival":
        # one epoch per input-file group, in arrival order
        try:
            grp_blocks = max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)
        except Exception:
            grp_blocks = 64
        for e in range(0, (len(files) + cfg.files_per_epoch - 1) // cfg.files_per_epoch):
            group = files[e * cfg.files_per_epoch : (e + 1) * cfg.files_per_epoch]
            ds = read_files(group, n_blocks=grp_blocks).map_batches(
                lambda b, fe=e: tag_and_partition(b, fe),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            ds.write_parquet(
            tmp_dir,
            partition_cols=["shard", "epoch"],
            compression=cfg.intermediate_compression,
        )
    else:
        try:
            n_blocks = max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)
        except Exception:
            n_blocks = 64
        # bounded block count: each block's writer opens one file per touched
        # (shard, epoch) hive dir, so blocks x partitions drives write cost
        ds = read_files(files, n_blocks=n_blocks)
        ds = ds.map_batches(
            tag_and_partition, batch_format="pyarrow", zero_copy_batch=True
        )
        ds.write_parquet(
            tmp_dir,
            partition_cols=["shard", "epoch"],
            compression=cfg.intermediate_compression,
        )
    shutil.rmtree(part_dir, ignore_errors=True)
    os.replace(tmp_dir, part_dir)
    with open(marker, "w") as m:
        json.dump(
            {
                "fingerprint": fingerprint,
                "n_shards": cfg.n_shards,
                "epoch_by": cfg.epoch_by,
                "columns": sorted(set(keep_cols)),
                # committed group count: the tail-append path numbers its new
                # epochs from here (crash-idempotent; see the tail branch)
                "n_epochs": (
                    (len(files) + cfg.files_per_epoch - 1) // cfg.files_per_epoch
                    if cfg.epoch_by == "arrival"
                    else None
                ),
            },
            m,
        )
    return part_dir


def list_epochs(part_dir: str) -> list[int]:
    epochs = set()
    for shard_dir in os.listdir(part_dir):
        if not shard_dir.startswith("shard="):
            continue
        for e in os.listdir(os.path.join(part_dir, shard_dir)):
            if e.startswith("epoch="):
                epochs.add(int(e.split("=")[1]))
    return sorted(epochs)


@ray.remote
def _dir_max_ts(path: str, ts_col: str) -> int:
    """Max ts (us) of one (shard, epoch) partition dir, from parquet FOOTER
    statistics only — no data pages are read."""
    mx = -(2**62)
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        ci = md.schema.to_arrow_schema().get_field_index(ts_col)
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(ci).statistics
            if stats is not None and stats.has_min_max:
                v = stats.max
                if hasattr(v, "timestamp"):
                    import calendar

                    v = int(
                        calendar.timegm(v.timetuple()) * US + v.microsecond
                    )
                mx = max(mx, int(v))
    return mx


def epoch_frontiers(part_dir: str, ts_col: str) -> dict:
    """Per-(shard, epoch) RAW max ts from parquet footers, cached in a
    sidecar (incremental: only dirs missing from the cache are scanned, so a
    follow-the-tail append only pays for its new epochs).

    This is what makes arrival-mode epochs pipelinable: the watermark gate
    for epoch e+1 is min-over-shards of the running frontier after e, and a
    shard's frontier equals the running RAW max ts of its partitions — rows
    the gate drops (late: below the watermark <= every frontier; order
    violations: below their key's frontier) can never raise the max, so the
    whole watermark schedule is computable up-front from footer stats."""
    cache_path = os.path.join(part_dir, "_epoch_frontiers.json")
    cache: dict[str, int] = {}
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            cache = json.load(f)
    missing = []
    for sd in os.listdir(part_dir):
        if not sd.startswith("shard="):
            continue
        for ed in os.listdir(os.path.join(part_dir, sd)):
            if ed.startswith("epoch=") and f"{sd}/{ed}" not in cache:
                missing.append(f"{sd}/{ed}")
    if missing:
        refs = [
            _dir_max_ts.remote(os.path.join(part_dir, rel), ts_col)
            for rel in missing
        ]
        for rel, mx in zip(missing, ray.get(refs)):
            cache[rel] = int(mx)
        with open(cache_path, "w") as f:
            json.dump(cache, f)
    out: dict[tuple[int, int], int] = {}
    for rel, mx in cache.items():
        sd, ed = rel.split("/")
        out[(int(sd.split("=")[1]), int(ed.split("=")[1]))] = mx
    return out


@ray.remote
class JoinShardActor:
    """Owns per-key join state for one hash shard, across epochs.

    State is the *carry table*: the minimal suffix of each key's event history
    that determines future emissions (the closed-form equivalent of the
    LocalStreamBuffer's live buffers — see state/vectorized.py). Each epoch:
    concat(carry, epoch rows) -> one vectorized multi-key replay -> keep pairs
    triggered by new rows -> recompute the carry suffix. Checkpoints pickle
    the carry table + counters.
    """

    def __init__(self, shard_id: int, cfg_dict: dict, ckpt_dir: str):
        self.shard_id = shard_id
        self.key_col = cfg_dict["key_col"]
        self.ts_col = cfg_dict["ts_col"]
        self.tie_col = cfg_dict["tie_col"]
        self.payload_cols = list(cfg_dict["payload_cols"])
        self.delta_us = cfg_dict["delta_us"]
        self.max_carry_rows = cfg_dict.get("max_carry_rows")
        self.join_fn = cfg_dict.get("join_fn")
        self.carry: pa.Table | None = None
        self.ckpt = CheckpointStore(ckpt_dir)
        self.counters = {"ingested": 0, "joined": 0}
        self.frontier_us = -(2**62)  # this shard's event-time frontier

    def restore(self, last_committed_epoch: int) -> int:
        """Load the snapshot at/just-before the last committed epoch; prune
        any newer (uncommitted) snapshots. Returns the restored epoch or -1."""
        self.carry = None
        self.counters = {"ingested": 0, "joined": 0}
        if last_committed_epoch < 0:
            self.ckpt.prune_after(self.shard_id, -(2**62))
            return -1
        found = self.ckpt.load_at_or_before(self.shard_id, last_committed_epoch)
        self.ckpt.prune_after(self.shard_id, last_committed_epoch)
        if found is None:
            return -1
        epoch, snap = found
        self.carry = snap["carry"]
        self.counters = snap["counters"]
        self.frontier_us = snap.get("frontier_us", -(2**62))
        return epoch

    def _columns(self) -> list[str]:
        cols = [self.key_col, self.ts_col, self.tie_col, "stream_side"]
        cols += [c for c in self.payload_cols if c not in cols]
        return list(dict.fromkeys(cols))

    def process_epoch(
        self,
        epoch: int,
        epoch_dir: str | None,
        sink_dir: str,
        watermark_us: int = -(2**62),
    ) -> dict:
        """Replay this shard's slice of one epoch; stage the output part file;
        snapshot state. The driver commits the manifest afterwards.

        ``watermark_us`` (arrival-mode): new rows older than it are late and
        dropped-and-counted; rows within lateness that regress their own key's
        carry frontier break the per-stream in-order precondition and are
        dropped-and-counted as order violations."""
        from statefulstreamprocessor_ray.state.vectorized import (
            carry_start,
            sorted_replay_pairs,
        )

        import time as _time

        t_start = _time.monotonic()
        sink = ExactlyOnceParquetSink(sink_dir)
        n_late = n_viol = 0
        new_tbl = None
        if epoch_dir is not None and os.path.isdir(epoch_dir):
            new_tbl = pq.read_table(epoch_dir, columns=self._columns())

        if new_tbl is not None and new_tbl.num_rows:
            n_new = new_tbl.num_rows
            new_tbl = new_tbl.append_column(
                "_carry", pa.array(np.zeros(n_new, np.int8), pa.int8())
            )
            if self.carry is not None and self.carry.num_rows:
                ct = self.carry.append_column(
                    "_carry", pa.array(np.ones(self.carry.num_rows, np.int8), pa.int8())
                )
                combined = pa.concat_tables([ct, new_tbl.select(ct.schema.names)])
            else:
                combined = new_tbl
            idx = pc.sort_indices(
                combined,
                sort_keys=[
                    (self.key_col, "ascending"),
                    (self.ts_col, "ascending"),
                    ("stream_side", "ascending"),
                    (self.tie_col, "ascending"),
                ],
            )
            combined = combined.take(idx).combine_chunks()
            n = combined.num_rows
            ts_np = pc.cast(
                pc.cast(combined[self.ts_col], pa.timestamp("us")), pa.int64()
            ).to_numpy(zero_copy_only=False)
            side_np = combined["stream_side"].to_numpy(zero_copy_only=False)
            is_carry = combined["_carry"].to_numpy(zero_copy_only=False)

            codes = (
                pc.dictionary_encode(combined[self.key_col])
                .combine_chunks()
                .indices.to_numpy(zero_copy_only=False)
            )
            b = np.flatnonzero(np.diff(codes) != 0) + 1
            starts = np.concatenate(([0], b))
            ends = np.concatenate((b, [n]))

            # late / out-of-order drops (no-ops in event-time epoch mode)
            drop = (is_carry == 0) & (ts_np < watermark_us)
            n_late = int(drop.sum())
            for i0, i1 in zip(starts.tolist(), ends.tolist()):
                ic = np.flatnonzero(is_carry[i0:i1] == 1)
                if len(ic):
                    seg = slice(i0, i0 + int(ic[-1]))
                    viol = (is_carry[seg] == 0) & ~drop[seg]
                    n_viol += int(viol.sum())
                    drop[seg] |= is_carry[seg] == 0
            if n_late or n_viol:
                keep_mask = ~drop
                combined = combined.filter(pa.array(keep_mask)).combine_chunks()
                n = combined.num_rows
                ts_np = ts_np[keep_mask]
                side_np = side_np[keep_mask]
                is_carry = is_carry[keep_mask]
                codes = codes[keep_mask]
                b = np.flatnonzero(np.diff(codes) != 0) + 1
                starts = np.concatenate(([0], b)) if n else np.empty(0, np.int64)
                ends = np.concatenate((b, [n])) if n else np.empty(0, np.int64)
                self.counters["late_rows"] = self.counters.get("late_rows", 0) + n_late
                self.counters["order_violations"] = (
                    self.counters.get("order_violations", 0) + n_viol
                )

            parts_l, parts_r, parts_c, keep_idx = [], [], [], []
            for i0, i1 in zip(starts.tolist(), ends.tolist()):
                l, r, c, t = sorted_replay_pairs(
                    ts_np[i0:i1], side_np[i0:i1], self.delta_us, return_trigger=True
                )
                keep = is_carry[t + i0] == 0  # only pairs triggered by new rows
                parts_l.append(l[keep] + i0)
                parts_r.append(r[keep] + i0)
                parts_c.append(c[keep])
                cs = carry_start(ts_np[i0:i1], side_np[i0:i1])
                keep_idx.append(np.arange(i0 + cs, i1, dtype=np.int64))

            all_l = np.concatenate(parts_l) if parts_l else np.empty(0, np.int64)
            all_r = np.concatenate(parts_r) if parts_r else np.empty(0, np.int64)
            all_c = np.concatenate(parts_c) if parts_c else np.empty(0, np.int8)
            out = self._pairs_to_table(combined, all_l, all_r, all_c)

            carry_rows = np.concatenate(keep_idx) if keep_idx else np.empty(0, np.int64)
            self.carry = combined.drop_columns(["_carry"]).take(
                pa.array(carry_rows, pa.int64())
            )
            cap = self.max_carry_rows
            if cap is not None and self.carry.num_rows > cap:
                # bounded-state eviction: drop the oldest carry rows
                order = pc.sort_indices(
                    self.carry, sort_keys=[(self.ts_col, "descending")]
                )
                evicted = self.carry.num_rows - cap
                newest = np.sort(order.to_numpy(zero_copy_only=False)[:cap])
                self.carry = self.carry.take(pa.array(newest, pa.int64()))
                self.counters["carry_evictions"] = (
                    self.counters.get("carry_evictions", 0) + evicted
                )
            self.counters["ingested"] += n_new
            self.counters["joined"] += out.num_rows
            mx = int(ts_np.max()) if n else -(2**62)
            if mx > self.frontier_us:
                self.frontier_us = mx
        else:
            out = self._empty_out()

        if self.join_fn is not None:
            out = self.join_fn(out)  # reference join_function hook, per epoch
        part = sink.stage_part(epoch, f"shard{self.shard_id:04d}", out)
        self.ckpt.save(
            self.shard_id,
            epoch,
            {
                "carry": self.carry,
                "counters": self.counters,
                "frontier_us": self.frontier_us,
            },
        )
        part["shard"] = self.shard_id
        part["max_ts_us"] = self.frontier_us
        part["n_carry_rows"] = self.carry.num_rows if self.carry is not None else 0
        part["late_rows"] = n_late
        part["order_violations"] = n_viol
        # per-partition latency metric (north-rule lineage: throughput/latency
        # per partition per epoch lives in the committed manifest)
        part["wall_ms"] = round((_time.monotonic() - t_start) * 1000, 1)
        return part

    def _pairs_to_table(self, combined: pa.Table, l, r, c) -> pa.Table:
        lt = combined.take(pa.array(l, pa.int64()))
        rt = combined.take(pa.array(r, pa.int64()))
        cols: dict = {self.key_col: lt[self.key_col]}
        cols["r_ts"] = pc.cast(lt[self.ts_col], pa.timestamp("us"))
        for col in self.payload_cols:
            cols[f"r_{col}"] = lt[col]
        cols["s_ts"] = pc.cast(rt[self.ts_col], pa.timestamp("us"))
        for col in self.payload_cols:
            cols[f"s_{col}"] = rt[col]
        case_names = np.array(["JR1", "JR2", "JS2"])
        cols["join_case"] = pa.array(
            case_names[np.asarray(c, np.int8)] if len(c) else [], pa.string()
        )
        return pa.table(cols)

    def _empty_out(self) -> pa.Table:
        src = self.carry
        if src is not None:
            return self._pairs_to_table(
                src, np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int8)
            )
        # no schema seen yet: pin the transcript defaults
        def ptype(col):
            if col == self.tie_col or col == "src_file_idx":
                return pa.int32()
            if col == "src_row":
                return pa.int64()
            return pa.string()

        cols = {
            self.key_col: pa.array([], pa.string()),
            "r_ts": pa.array([], pa.timestamp("us")),
            **{f"r_{c}": pa.array([], ptype(c)) for c in self.payload_cols},
            "s_ts": pa.array([], pa.timestamp("us")),
            **{f"s_{c}": pa.array([], ptype(c)) for c in self.payload_cols},
            "join_case": pa.array([], pa.string()),
        }
        return pa.table(cols)


class StreamingJoinJob:
    def __init__(self, cfg: StreamingJoinConfig):
        self.cfg = cfg
        self.sink = ExactlyOnceParquetSink(cfg.out_dir)
        self.ckpt_dir = os.path.join(cfg.work_dir, "checkpoints")

    def run(self, max_epochs: int | None = None) -> dict:
        """Run (or resume) the job; ``max_epochs`` limits this invocation to
        simulate a crash/stop for resume tests."""
        cfg = self.cfg
        t_run0 = time.time()
        committed = self.sink.committed_epochs()
        last_committed = committed[-1] if committed else -1

        cfg_dict = {
            "key_col": cfg.spec.key_col,
            "ts_col": cfg.spec.ts_col,
            "tie_col": cfg.spec.tie_col,
            "payload_cols": _effective_payload_cols(cfg),
            "delta_us": int(cfg.delta_time * US) if cfg.delta_time else None,
            "max_carry_rows": cfg.max_carry_rows_per_shard,
            "join_fn": cfg.join_fn,
        }
        # actor-pool spin-up + checkpoint restore run concurrently with the
        # phase-0 partition pass (neither depends on the partition layout)
        shards = [
            JoinShardActor.remote(k, cfg_dict, self.ckpt_dir)
            for k in range(cfg.n_shards)
        ]
        restore_refs = [s.restore.remote(last_committed) for s in shards]

        part_dir = partition_input(cfg)
        phase0_sec = time.time() - t_run0
        epochs = list_epochs(part_dir)
        if committed != epochs[: len(committed)]:
            # explicit raise (not assert): exactly-once guard, survives -O
            raise RuntimeError(
                "manifest set must be a prefix of the epoch sequence: "
                f"committed={committed} epochs={epochs}"
            )

        restored = ray.get(restore_refs)
        if last_committed >= 0 and any(r != last_committed for r in restored):
            raise RuntimeError(
                "resume aborted: committed manifests exist up to epoch "
                f"{last_committed} but shard checkpoints restored {restored}; "
                "state and output would diverge. Clear the output dir (or "
                "restore the checkpoint dir) and re-run from scratch."
            )

        stats = {
            # phase-0 partition pass (incl. actor spin-up overlap) vs the
            # epoch submit/commit loop — split out so bench numbers can
            # attribute disk-write noise separately from the join itself
            "phase0_sec": round(phase0_sec, 3),
            "epoch_loop_sec": 0.0,
            "epochs_total": len(epochs),
            "epochs_skipped": len(committed),
            "epochs_processed": 0,
            "rows_emitted": 0,
            "late_rows": 0,
            "order_violations": 0,
            "watermark_us": None,
            "per_epoch": [],
        }
        span_us = int(cfg.epoch_duration_s * US)
        # resume the watermark from the last committed manifest
        watermark = -(2**62)
        if last_committed >= 0:
            watermark = self.sink.manifest(last_committed)["cursor"].get(
                "watermark_us", -(2**62)
            )
        todo = [e for e in epochs if e > last_committed]
        if max_epochs is not None:
            todo = todo[:max_epochs]

        # BOTH epoch modes submit every epoch up-front: actor-task ordering
        # pipelines each shard through its epochs independently — a straggler
        # shard in epoch e no longer stalls other shards' epoch e+1 — while
        # the driver still commits manifests strictly in order (exactly-once
        # unchanged).
        # - "ts" epochs never drop on the watermark gate (each epoch's rows
        #   are >= its start >= the prior watermark), so the per-epoch input
        #   watermark is constant.
        # - "arrival" epochs need the previous epoch's global min-frontier as
        #   the gate — but a shard's frontier equals the running RAW max ts
        #   of its partitions (dropped rows can never raise it; see
        #   epoch_frontiers), so the whole watermark schedule is precomputed
        #   from parquet footer stats and the old per-epoch barrier is gone.
        #   A consistency check in the commit loop re-derives each watermark
        #   from the actors' reported frontiers and fails loudly on any
        #   divergence.
        pending: dict[int, list] = {}
        wm_for: dict[int, int] = {}
        lateness_us = int(cfg.allowed_lateness_s * US)
        if cfg.epoch_by == "ts":
            wm_for = {epoch: watermark for epoch in todo}
        else:
            fronts = epoch_frontiers(part_dir, cfg.spec.ts_col)
            frontier = {k: -(2**62) for k in range(cfg.n_shards)}
            for e in epochs:
                if e <= last_committed:
                    for k in frontier:
                        frontier[k] = max(frontier[k], fronts.get((k, e), -(2**62)))
            wm = watermark
            for e in (e for e in epochs if e > last_committed):
                wm_for[e] = wm
                for k in frontier:
                    frontier[k] = max(frontier[k], fronts.get((k, e), -(2**62)))
                wm = max(wm, min(frontier.values()) - lateness_us)
        for epoch in todo:
            pending[epoch] = [
                s.process_epoch.remote(
                    epoch,
                    os.path.join(part_dir, f"shard={k}", f"epoch={epoch}"),
                    cfg.out_dir,
                    wm_for[epoch],
                )
                for k, s in enumerate(shards)
            ]
        for epoch in todo:
            parts = ray.get(pending.pop(epoch))
            if cfg.epoch_by == "arrival" and wm_for[epoch] != watermark:
                # the precomputed schedule must reproduce the sequential
                # watermark exactly (dropped rows never raise a frontier);
                # divergence means an epoch was gated on the wrong watermark
                # — abort BEFORE committing its manifest (exactly-once safe)
                raise RuntimeError(
                    f"watermark precompute diverged at epoch {epoch}: "
                    f"scheduled {wm_for[epoch]}, sequential {watermark}"
                )
            watermark = max(
                watermark,
                min(p["max_ts_us"] for p in parts) - int(cfg.allowed_lateness_s * US),
            )
            self.sink.commit_epoch(
                epoch,
                parts,
                cursor={
                    "epoch": epoch,
                    "epoch_start_us": epoch * span_us,
                    "epoch_end_us": (epoch + 1) * span_us,
                    "watermark_us": watermark,
                },
            )
            rows = sum(p["rows"] for p in parts)
            late = sum(p.get("late_rows", 0) for p in parts)
            viol = sum(p.get("order_violations", 0) for p in parts)
            stats["rows_emitted"] += rows
            stats["late_rows"] += late
            stats["order_violations"] += viol
            stats["watermark_us"] = watermark
            stats["epochs_processed"] += 1
            stats["per_epoch"].append(
                {
                    "epoch": epoch,
                    "rows": rows,
                    "watermark_us": watermark,
                    # watermark lag: fastest shard frontier minus the gated
                    # global watermark (straggler-partition skew indicator)
                    "watermark_lag_us": max(p["max_ts_us"] for p in parts) - watermark,
                    "late_rows": late,
                    "order_violations": viol,
                }
            )

        for s in shards:
            ray.kill(s)
        stats["epoch_loop_sec"] = round(time.time() - t_run0 - phase0_sec, 3)
        with open(os.path.join(cfg.out_dir, "_metrics.json"), "w") as f:
            json.dump(stats, f)
        return stats
