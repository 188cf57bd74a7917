#!/usr/bin/env python3
"""Round-3 volume evidence (VERDICT r2 #9): drive tens of GiB through the
two headline 100-TB claims — the exactly-once streaming join over fat
(~1 KiB) text payloads, and MinHash-LSH near-dup over fat documents — and
record wall time, phase split, object-store spill, and driver peak RSS.

A literal 100 GB input cannot fit this sandbox: 79 GB free disk must hold
input + the phase-0 partitioned copy + the join output (~3.5x input for
the streaming job). The probe therefore runs the largest honest sizes
(defaults: 12 GiB transcripts, 20 GiB documents), cleans up between
jobs, and reports per-GiB rates for extrapolation against the existing
1-GiB fat-text and 40M-turn points in BASELINE.md.

Corpora are generated as a PARALLEL Ray Data pipeline (range over conv /
doc ids -> vectorized per-batch synthesis -> streamed parquet write), so
generation itself never materializes: the same shape a real cluster would
use to stage test data. Texts are random A-Z with a space every 9th char
(tokenizable, but incompressible enough that on-disk GiB ~ in-memory GiB);
every 100th document clones its predecessor with a mutated tail so the
near-dup path has real work.

Usage:
  python scripts/volume_probe.py streaming [gib]   # default 12
  python scripts/volume_probe.py minhash  [gib]    # default 20
  python scripts/volume_probe.py corpus   [gib]    # default 10 — streaming
        curation: scrub + quality gate + cross-epoch dedup over arrival
        epochs (StreamingDedupJob + CurationPrepare)
"""

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa

BASE_EPOCH_S = 1_600_000_000.0
TURNS_PER_CONV = 60
TEXT_BYTES = 1024


def _rand_texts(rng, n: int) -> pa.Array:
    chars = rng.integers(65, 91, size=(n, TEXT_BYTES), dtype=np.uint8)
    chars[:, 8::9] = 32  # word boundary every 9th char
    return pa.array(chars.view(f"S{TEXT_BYTES}").ravel()).cast(pa.string())


def gen_transcripts(path: str, gib: float) -> int:
    import ray.data

    n_convs = int(gib * 2**30 / TEXT_BYTES / TURNS_PER_CONV)

    def make(batch: pd.DataFrame) -> pa.Table:
        convs = batch["id"].to_numpy(np.int64)
        rng = np.random.default_rng(int(convs[0]) * 7 + 13)
        nc = len(convs)
        n = nc * TURNS_PER_CONV
        conv = np.repeat(convs, TURNS_PER_CONV)
        turn = np.tile(np.arange(TURNS_PER_CONV, dtype=np.int32), nc)
        u = rng.random(n)
        role_code = np.where(u < 0.45, 1, np.where(u < 0.70, 2, 0))
        gaps = 0.05 + 2.0 * rng.random(n)
        cum = np.cumsum(gaps)
        conv_starts = np.concatenate(
            ([0.0], cum[TURNS_PER_CONV - 1 :: TURNS_PER_CONV][:-1])
        )
        ts_s = BASE_EPOCH_S + cum - np.repeat(conv_starts, TURNS_PER_CONV)
        ts_s = ts_s + np.repeat(rng.random(nc) * 1000.0, TURNS_PER_CONV)
        tools = np.where(role_code == 2, "toolcall", None)
        return pa.table(
            {
                "conv_id": pa.array(
                    np.char.add("conv", np.char.zfill(conv.astype(str), 10)),
                    pa.string(),
                ),
                "turn_idx": pa.array(turn, pa.int32()),
                "role": pa.array(
                    np.array(["user", "assistant", "tool"])[role_code], pa.string()
                ),
                "text": _rand_texts(rng, n),
                "tool": pa.array(tools.tolist(), pa.string()),
                "ts": pa.array((ts_s * 1e6).astype(np.int64), pa.timestamp("us")),
            }
        )

    ray.data.range(n_convs).map_batches(
        make, batch_size=512, batch_format="pandas"
    ).write_parquet(path)
    return n_convs * TURNS_PER_CONV


def gen_docs(path: str, gib: float, degenerate_every: int | None = None) -> int:
    import ray.data

    n_docs = int(gib * 2**30 / TEXT_BYTES)

    def make(batch: pd.DataFrame) -> pa.Table:
        ids = batch["id"].to_numpy(np.int64)
        rng = np.random.default_rng(int(ids[0]) * 11 + 29)
        chars = rng.integers(65, 91, size=(len(ids), TEXT_BYTES), dtype=np.uint8)
        chars[:, 8::9] = 32
        # near-dups: every 100th doc clones its predecessor, tail mutated
        # (~0.9 Jaccard) — pairs stay intra-batch so generation is parallel
        clones = np.nonzero((ids % 100 == 1) & (np.arange(len(ids)) > 0))[0]
        chars[clones] = chars[clones - 1]
        chars[clones, -90:] = rng.integers(
            65, 91, size=(len(clones), 90), dtype=np.uint8
        )
        chars[clones, 8::9] = 32
        if degenerate_every:
            # boilerplate docs: one token repeated — must fail the
            # top-token-fraction quality gate (corpus-probe mode only)
            degen = np.nonzero(ids % degenerate_every == 7)[0]
            chars[degen] = ord("B")
            chars[degen, 8::9] = 32
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(chars.view(f"S{TEXT_BYTES}").ravel()).cast(
                    pa.string()
                ),
            }
        )

    ray.data.range(n_docs).map_batches(
        make, batch_size=4096, batch_format="pandas"
    ).write_parquet(path)
    return n_docs


def _dir_gib(path: str) -> float:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total / 2**30


def _driver_peak_rss_gib() -> float:
    with open("/proc/self/status") as f:
        m = re.search(r"VmHWM:\s+(\d+) kB", f.read())
    return int(m.group(1)) / 2**20 if m else -1.0


def _spill_mib() -> int:
    """Bytes in the session's object-spill dir (memory_summary needs grpc,
    absent here). Cumulative over the session — fine for a one-job probe."""
    import glob

    try:
        import ray

        session = ray._private.worker.global_worker.node.get_session_dir_path()
        total = 0
        for d in glob.glob(os.path.join(session, "*spill*")):
            for root, _, files in os.walk(d):
                total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return total // 2**20
    except Exception:
        return -1


def main() -> None:
    mode = sys.argv[1]
    defaults = {
        "streaming": 12.0,
        "minhash": 20.0,
        "corpus": 10.0,
        "tfidf": 2.0,
        "bigram": 2.0,
        "sketch": 4.0,
        "bm25": 4.0,
        "squantile": 2.0,
        "analytic": 4.0,
    }
    gib = float(sys.argv[2]) if len(sys.argv) > 2 else defaults.get(mode, 10.0)

    import ray
    from ray.data import DataContext

    ncpu = int(os.environ.get("SSP_PROBE_CPUS", "32"))
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    base = f"/tmp/ssp_volume_{mode}"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    out: dict = {"mode": mode, "target_gib": gib, "num_cpus": ncpu}
    try:
        t0 = time.time()
        if mode == "streaming":
            rows = gen_transcripts(f"{base}/input", gib)
            out["gen_sec"] = round(time.time() - t0, 1)
            out["input_gib"] = round(_dir_gib(f"{base}/input"), 2)
            out["input_rows"] = rows

            from statefulstreamprocessor_ray.pipelines.streaming import (
                StreamingJoinConfig,
                StreamingJoinJob,
            )

            cfg = StreamingJoinConfig(
                input_path=f"{base}/input",
                work_dir=f"{base}/work",
                out_dir=f"{base}/out",
                n_shards=32,
                epoch_duration_s=480.0,
                delta_time=5.0,
            )
            t1 = time.time()
            stats = StreamingJoinJob(cfg).run()
            dt = time.time() - t1
            out.update(
                sec=round(dt, 1),
                phase0_sec=round(stats.get("phase0_sec", 0.0), 1),
                epoch_loop_sec=round(stats.get("epoch_loop_sec", 0.0), 1),
                epochs=stats["epochs_processed"],
                rows_emitted=stats["rows_emitted"],
                joins_per_sec=int(stats["rows_emitted"] / dt),
                input_gib_per_sec=round(out["input_gib"] / dt, 2),
                out_gib=round(_dir_gib(f"{base}/out"), 2),
            )
        elif mode == "corpus":
            # streaming curation over 8 arrival epochs: every 40th doc is
            # degenerate boilerplate (one repeated token) and must fall to
            # the top-token-fraction gate; the mutated-tail clones are
            # NEAR-dups, which exact content dedup correctly passes through
            # — so rows_emitted ≈ n_docs * 39/40 and the probe exercises
            # scrub+gate per batch plus the cross-epoch seen-set machinery
            n_docs = gen_docs(f"{base}/input", gib, degenerate_every=40)
            out["gen_sec"] = round(time.time() - t0, 1)
            out["input_gib"] = round(_dir_gib(f"{base}/input"), 2)
            out["input_rows"] = n_docs

            from statefulstreamprocessor_ray.pipelines.corpus import CurationPrepare
            from statefulstreamprocessor_ray.pipelines.streaming_dedup import (
                StreamingDedupConfig,
                StreamingDedupJob,
            )

            cfg = StreamingDedupConfig(
                input_path=f"{base}/input",
                work_dir=f"{base}/work",
                out_dir=f"{base}/out",
                n_shards=32,
                # ceil over the PARQUET file count so the run lands on
                # exactly <= 8 epochs (floor division overshoots to 9
                # whenever the count isn't divisible)
                files_per_epoch=max(
                    1,
                    -(-len([f for f in os.listdir(f"{base}/input")
                            if f.endswith(".parquet")]) // 8),
                ),
                prepare_fn=CurationPrepare(min_tokens=20, max_top_frac=0.5),
                prepare_tag="probe",
            )
            t1 = time.time()
            stats = StreamingDedupJob(cfg).run()
            dt = time.time() - t1
            out.update(
                sec=round(dt, 1),
                epochs=stats["epochs_processed"],
                rows_emitted=stats["rows_emitted"],
                n_seen=stats["n_seen"],
                docs_per_sec=int(n_docs / dt),
                input_gib_per_sec=round(out["input_gib"] / dt, 2),
                out_gib=round(_dir_gib(f"{base}/out"), 2),
            )
        elif mode == "minhash":
            n_docs = gen_docs(f"{base}/input", gib)
            out["gen_sec"] = round(time.time() - t0, 1)
            out["input_gib"] = round(_dir_gib(f"{base}/input"), 2)
            out["input_rows"] = n_docs

            import ray.data

            from statefulstreamprocessor_ray.stages.dedup import minhash_lsh_pairs

            t1 = time.time()
            pairs = minhash_lsh_pairs(
                ray.data.read_parquet(f"{base}/input"), threshold=0.5
            )
            dt = time.time() - t1
            out.update(
                sec=round(dt, 1),
                pairs=pairs.num_rows,
                expected_pairs=n_docs // 100,
                docs_per_sec=int(n_docs / dt),
                input_gib_per_sec=round(out["input_gib"] / dt, 2),
            )
        elif mode in ("tfidf", "bigram"):
            # the r4 text-scoring exchanges: payload is O(corpus tokens)
            # (doc, term, tf) / (doc, w1, w2, tf) rows — heavier per input
            # byte than minhash's band table, so this is the stress probe
            # for the term-keyed + doc-keyed two-exchange shape
            n_docs = gen_docs(f"{base}/input", gib)
            out["gen_sec"] = round(time.time() - t0, 1)
            out["input_gib"] = round(_dir_gib(f"{base}/input"), 2)
            out["input_rows"] = n_docs

            import ray.data

            from statefulstreamprocessor_ray.stages.text import (
                bigram_surprisal,
                tfidf_top_terms,
            )

            t1 = time.time()
            if mode == "tfidf":
                res = tfidf_top_terms(
                    ray.data.read_parquet(f"{base}/input"), top_k=5
                )
                rows, expected = res.count(), n_docs * 5
            else:
                res = bigram_surprisal(ray.data.read_parquet(f"{base}/input"))
                rows, expected = res.count(), n_docs
            dt = time.time() - t1
            out.update(
                sec=round(dt, 1),
                rows=rows,
                expected_rows=expected,
                docs_per_sec=int(n_docs / dt),
                input_gib_per_sec=round(out["input_gib"] / dt, 2),
            )
        elif mode == "sketch":
            # round-5 sketch family: heavy hitters + distinct over the SAME
            # generated docs. The claim under test is bounded exchange state:
            # hh truncates each block's partial to `capacity` rows (err_bound
            # reported), distinct ships one hash-set/register summary per
            # (block, group) — wall should track the token scan, driver RSS
            # stays flat, zero spill
            n_docs = gen_docs(f"{base}/input", gib)
            out["gen_sec"] = round(time.time() - t0, 1)
            out["input_gib"] = round(_dir_gib(f"{base}/input"), 2)
            out["input_rows"] = n_docs

            import ray.data

            from statefulstreamprocessor_ray.stages.sketch import (
                distinct_count,
                heavy_hitters,
            )

            # the raw generated tokens are ~all-distinct (adversarial for the
            # truncation but degenerate output: every count ~1); append a
            # 50-token Zipf-ish hot head per doc so the top-k is real signal
            # sitting far above the truncation error bound
            def add_hot(b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                ids = b["doc_id"].to_numpy(zero_copy_only=False)
                hot = pa.array(
                    [f" hot{int(i) % 50} hot{int(i) % 7} hot0" for i in ids]
                )
                return b.set_column(
                    b.schema.get_field_index("text"),
                    "text",
                    pc.binary_join_element_wise(b["text"], hot, ""),
                )

            def hot_ds():
                return ray.data.read_parquet(f"{base}/input").map_batches(
                    add_hot, batch_format="pyarrow", zero_copy_batch=True
                )

            t1 = time.time()
            hh = heavy_hitters(hot_ds(), col="text", k=20, capacity=4096).to_pandas()
            out["hh_sec"] = round(time.time() - t1, 1)
            out["hh_err_bound"] = int(hh["err_bound"].iloc[0]) if len(hh) else -1
            out["hh_top_n"] = int(hh["n"].iloc[0]) if len(hh) else -1
            t2 = time.time()
            # group = doc_id % 8 exercises the per-group state; random
            # A-Z 9-char tokens ≈ all-distinct values -> dense HLL regime
            def add_group(b):
                ids = b["doc_id"].to_numpy(zero_copy_only=False)
                return b.append_column(
                    "grp", pa.array((ids % 8).astype("U1"), pa.string())
                )

            dc = distinct_count(
                ray.data.read_parquet(f"{base}/input").map_batches(
                    add_group, batch_format="pyarrow", zero_copy_batch=True
                ),
                col="text",
                group_col="grp",
                sparse_limit=8192,
            ).to_pandas()
            dt2 = time.time() - t2
            out["distinct_sec"] = round(dt2, 1)
            out["distinct_total"] = int(dc["n_distinct"].sum()) if len(dc) else -1
            dt = time.time() - t1
            out.update(
                sec=round(dt, 1),
                rows=len(hh) + len(dc),
                docs_per_sec=int(n_docs / dt),
                input_gib_per_sec=round(out["input_gib"] / dt, 2),
            )
        elif mode == "bm25":
            # round-5 BM25 retrieval at volume. The claim under test is the
            # bounded-exchange shape: the query-term set is tiny and fixed,
            # pass 1 emits only per-(doc, query-term) tf rows plus per-batch
            # df/avgdl partials, and the only shuffle is a fixed-width
            # (query, doc, micro) group-sum. The appended hot tokens make
            # EVERY doc match at least one query term — the adversarial
            # candidate-set-is-the-whole-corpus case — so the exchange is
            # maximal for the corpus size. Wall should track the token scan;
            # driver RSS stays flat; zero spill.
            n_docs = gen_docs(f"{base}/input", gib)
            out["gen_sec"] = round(time.time() - t0, 1)
            out["input_gib"] = round(_dir_gib(f"{base}/input"), 2)
            out["input_rows"] = n_docs

            import ray.data

            from statefulstreamprocessor_ray.stages.text import bm25_topk

            def add_hot(b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                ids = b["doc_id"].to_numpy(zero_copy_only=False)
                hot = pa.array(
                    [f" hot{int(i) % 50} hot{int(i) % 7} hot0" for i in ids]
                )
                return b.set_column(
                    b.schema.get_field_index("text"),
                    "text",
                    pc.binary_join_element_wise(b["text"], hot, ""),
                )

            queries = [
                "hot0 hot3 hot11",
                "hot1 hot2",
                "hot42 hot17 hot5",
                "hot49 hot6",
            ]
            t1 = time.time()
            res = bm25_topk(
                ray.data.read_parquet(f"{base}/input").map_batches(
                    add_hot, batch_format="pyarrow", zero_copy_batch=True
                ),
                queries,
                top_k=10,
            ).to_pandas()
            dt = time.time() - t1
            out.update(
                sec=round(dt, 1),
                rows=len(res),
                expected_rows=len(queries) * 10,
                docs_per_sec=int(n_docs / dt),
                input_gib_per_sec=round(out["input_gib"] / dt, 2),
            )
        elif mode == "squantile":
            # round-5 streaming-quantile job at volume, in the COMPACTION
            # regime (per-group cumulative values >> limit): per-shard state
            # stays bounded at `limit` points per group, checkpoints are
            # fixed-size full snapshots, err_bound > 0 is reported honestly,
            # and the reported quantiles' ranks stay within it. Values are
            # uniform per group with a known distribution, so the P50
            # estimate is independently checkable.
            import ray.data

            from statefulstreamprocessor_ray.pipelines.streaming_sketch import (
                StreamingQuantileConfig,
                StreamingQuantileJob,
            )
            from statefulstreamprocessor_ray.sinks.exactly_once import (
                ExactlyOnceParquetSink,
            )

            n_epochs, n_groups = 6, 16
            rows_per_epoch = int(gib * 2**30 / 30 / n_epochs)  # ~30 B/row

            def make(batch: pd.DataFrame) -> pa.Table:
                ids = batch["id"].to_numpy(np.int64)
                rng = np.random.default_rng(int(ids[0]) * 11 + 3)
                g = (ids % n_groups).astype(np.int64)
                # group k ~ Uniform[0, k+1): true P50 of group k = (k+1)/2
                vals = rng.random(len(ids)) * (g + 1)
                return pa.table(
                    {
                        "event_type": pa.array(
                            np.char.add("t", g.astype(str)), pa.string()
                        ),
                        "value": pa.array(vals, pa.float64()),
                    }
                )

            os.makedirs(f"{base}/input")
            for e in range(n_epochs):
                ray.data.range(
                    rows_per_epoch, override_num_blocks=32
                ).map_batches(
                    make, batch_size=65536, batch_format="pandas"
                ).write_parquet(f"{base}/input/ep-{e:03d}")
                # one file per epoch for the arrival protocol: flatten
                ep_dir = f"{base}/input/ep-{e:03d}"
                import pyarrow.parquet as pq  # noqa: PLC0415

                t = pq.read_table(ep_dir)
                shutil.rmtree(ep_dir)
                pq.write_table(
                    t, f"{base}/input/ep-{e:03d}.parquet", compression="none"
                )
            out["gen_sec"] = round(time.time() - t0, 1)
            out["input_gib"] = round(_dir_gib(f"{base}/input"), 2)
            out["input_rows"] = rows_per_epoch * n_epochs

            t1 = time.time()
            cfg = StreamingQuantileConfig(
                input_path=f"{base}/input",
                work_dir=f"{base}/work",
                out_dir=f"{base}/out",
                n_shards=8,
                limit=65536,
            )
            stats = StreamingQuantileJob(cfg).run()
            dt = time.time() - t1
            res = (
                ExactlyOnceParquetSink(f"{base}/out").read_committed().to_pandas()
            )
            last = res[res["epoch"] == n_epochs - 1]
            p50 = last[last["q"] == 0.5]
            # uniform group k: true P50 = (k+1)/2 — check relative error
            ks = p50["event_type"].str.slice(1).astype(int).to_numpy()
            rel = np.abs(
                p50["value"].to_numpy() - (ks + 1) / 2.0
            ) / ((ks + 1) / 2.0)
            out.update(
                sec=round(dt, 1),
                rows=int(stats["rows_emitted"]),
                epochs=int(stats["epochs_processed"]),
                err_bound_max=int(last["err_bound"].max()),
                p50_max_rel_err=round(float(rel.max()), 4),
                rows_per_sec=int(out["input_rows"] / dt),
                input_gib_per_sec=round(out["input_gib"] / dt, 2),
            )
        elif mode == "analytic":
            # round-5 window-function family at volume: per-key ordered
            # analytics (rn / lag / running / rolling sums) over a generated
            # event stream. value=1.0 makes every output row independently
            # checkable in closed form (cum_micro == rn*1e6, roll4 ==
            # min(rn,4)*1e6), so the probe validates the WHOLE output while
            # consuming it as a stream — no driver materialization.
            import pyarrow.compute as pc_
            import ray.data

            from statefulstreamprocessor_ray.stages.analytic import (
                window_functions,
            )

            rows = int(gib * 2**30 / 32)  # ~32 B/row on disk
            n_users = max(1024, rows // 64)

            def make(batch: pd.DataFrame) -> pa.Table:
                ids = batch["id"].to_numpy(np.int64)
                return pa.table(
                    {
                        "event_id": pa.array(ids, pa.int64()),
                        "ts": pa.array(
                            (int(BASE_EPOCH_S) * 1_000_000 + ids * 1_000_000),
                            pa.timestamp("us"),
                        ),
                        "user_id": pa.array(ids % n_users, pa.int64()),
                        "value": pa.array(np.ones(len(ids)), pa.float64()),
                    }
                )

            ray.data.range(rows, override_num_blocks=64).map_batches(
                make, batch_size=262144, batch_format="pandas"
            ).write_parquet(f"{base}/input")
            out["gen_sec"] = round(time.time() - t0, 1)
            out["input_gib"] = round(_dir_gib(f"{base}/input"), 2)
            out["input_rows"] = rows

            t1 = time.time()
            res = window_functions(ray.data.read_parquet(f"{base}/input"))

            def validate(t: pa.Table) -> pa.Table:
                rn = t["rn"].to_numpy(zero_copy_only=False)
                cum = t["cum_micro"].to_numpy(zero_copy_only=False)
                roll = t["roll4_micro"].to_numpy(zero_copy_only=False)
                bad = int(
                    (cum != rn * 1_000_000).sum()
                    + (roll != np.minimum(rn, 4) * 1_000_000).sum()
                )
                return pa.table(
                    {
                        "n": pa.array([t.num_rows], pa.int64()),
                        "bad": pa.array([bad], pa.int64()),
                    }
                )

            checked = res.map_batches(
                validate, batch_format="pyarrow", zero_copy_batch=True
            ).to_pandas()
            dt = time.time() - t1
            out.update(
                sec=round(dt, 1),
                rows=int(checked["n"].sum()),
                violations=int(checked["bad"].sum()),
                rows_per_sec=int(rows / dt),
                input_gib_per_sec=round(out["input_gib"] / dt, 2),
            )
            assert out["rows"] == rows, (out["rows"], rows)
            assert out["violations"] == 0
        else:
            raise SystemExit(f"unknown mode {mode}")
        out["spilled_mib"] = _spill_mib()
        out["driver_peak_rss_gib"] = round(_driver_peak_rss_gib(), 2)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
