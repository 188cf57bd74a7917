#!/usr/bin/env python3
"""CLI entry point: run the flagship batch join or the exactly-once streaming
job over a transcript Parquet directory.

Examples:
  python scripts/run_job.py batch --input /tmp/transcripts --out /tmp/joined
  python scripts/run_job.py streaming --input /tmp/transcripts \\
      --work /tmp/work --out /tmp/out --shards 16 --epoch-s 480 --delta 5.0
  python scripts/run_job.py streaming ... (again)   # resumes; 0 new rows when done

Owns its Ray session (guarded init) — the library itself never calls ray.init.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="mode", required=True)

    b = sub.add_parser("batch")
    b.add_argument("--input", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--delta", type=float, default=None)
    b.add_argument("--hot-key-threshold", type=int, default=None)

    s = sub.add_parser("streaming")
    s.add_argument("--input", required=True)
    s.add_argument("--work", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--shards", type=int, default=8)
    s.add_argument("--epoch-s", type=float, default=300.0)
    s.add_argument("--delta", type=float, default=None)
    s.add_argument("--lateness-s", type=float, default=0.0)
    s.add_argument("--epoch-by", choices=["ts", "arrival"], default="ts")
    s.add_argument("--max-epochs", type=int, default=None)
    s.add_argument(
        "--provenance",
        action="store_true",
        help="attach (src_file_idx, src_row) per input row and emit "
        "r_/s_ provenance columns in the join output",
    )

    w = sub.add_parser("windows")
    w.add_argument("--input", required=True, help="events parquet file or dir")
    w.add_argument("--work", required=True)
    w.add_argument("--out", required=True)
    w.add_argument("--kind", choices=["tumbling", "sliding", "session"], default="tumbling")
    w.add_argument("--shards", type=int, default=8)
    w.add_argument("--epoch-s", type=float, default=300.0)
    w.add_argument("--window-s", type=float, default=3600.0)
    w.add_argument("--slide-s", type=float, default=None)
    w.add_argument("--gap-s", type=float, default=None)
    w.add_argument("--lateness-s", type=float, default=0.0)
    w.add_argument("--key-col", default="user_id")
    w.add_argument("--ts-col", default="ts")
    w.add_argument("--value-col", default="value")
    w.add_argument("--max-epochs", type=int, default=None)

    cp = sub.add_parser("cep")
    cp.add_argument("--input", required=True, help="events parquet file or dir")
    cp.add_argument("--work", required=True)
    cp.add_argument("--out", required=True)
    cp.add_argument("--cep-mode", choices=["sequence", "absence"], default="sequence")
    cp.add_argument("--pattern", nargs="+", required=True,
                    help="sequence steps, or FIRST ABSENT for absence mode")
    cp.add_argument("--contiguity", choices=["strict", "skip"], default="strict")
    cp.add_argument("--within-s", type=float, default=None)
    cp.add_argument("--shards", type=int, default=8)
    cp.add_argument("--epoch-s", type=float, default=300.0)
    cp.add_argument("--key-col", default="user_id")
    cp.add_argument("--ts-col", default="ts")
    cp.add_argument("--event-col", default="event_type")
    cp.add_argument("--tie-col", default="event_id")
    cp.add_argument("--max-epochs", type=int, default=None)

    cb = sub.add_parser("corpus")
    cb.add_argument("--input", required=True, help="documents parquet file or dir")
    cb.add_argument("--bench-input", default=None,
                    help="eval-set parquet (docs sharing a decon n-gram are dropped)")
    cb.add_argument("--out", required=True)
    cb.add_argument("--work", default=None,
                    help="checkpoint dir: materialize the filtered corpus once "
                    "instead of recomputing it per dedup pass")
    cb.add_argument("--min-tokens", type=int, default=20)
    cb.add_argument("--max-top-frac", type=float, default=0.125)
    cb.add_argument("--jaccard", type=float, default=0.5)
    cb.add_argument("--k", type=int, default=3)
    cb.add_argument("--decon-k", type=int, default=8)
    cb.add_argument("--sample-rate", type=float, default=None)
    cb.add_argument("--chunk-tokens", type=int, default=512)
    cb.add_argument("--overlap", type=int, default=64)
    cb.add_argument("--id-col", default="doc_id")
    cb.add_argument("--text-col", default="text")

    dd = sub.add_parser("dedup")
    dd.add_argument("--input", required=True, help="documents parquet dir")
    dd.add_argument("--work", required=True)
    dd.add_argument("--out", required=True)
    dd.add_argument("--shards", type=int, default=4)
    dd.add_argument("--files-per-epoch", type=int, default=1)
    dd.add_argument("--id-col", default="doc_id")
    dd.add_argument("--text-col", default="text")
    dd.add_argument("--max-epochs", type=int, default=None)
    dd.add_argument(
        "--curate",
        action="store_true",
        help="scrub + quality-filter each batch before dedup (streaming "
        "corpus curation); dedup identity = content AFTER curation",
    )
    dd.add_argument("--min-tokens", type=int, default=20)
    dd.add_argument("--max-top-frac", type=float, default=0.125)

    mh = sub.add_parser(
        "minhash",
        help="streaming NEAR-dup dedup: cross-epoch LSH band state, "
        "exactly-once emission (pipelines/streaming_minhash)",
    )
    mh.add_argument("--input", required=True, help="documents parquet dir")
    mh.add_argument("--work", required=True)
    mh.add_argument("--out", required=True)
    mh.add_argument("--shards", type=int, default=4)
    mh.add_argument("--files-per-epoch", type=int, default=1)
    mh.add_argument("--id-col", default="doc_id")
    mh.add_argument("--text-col", default="text")
    mh.add_argument("--max-epochs", type=int, default=None)
    mh.add_argument("--n-perm", type=int, default=64)
    mh.add_argument("--bands", type=int, default=16)
    mh.add_argument("--k", type=int, default=3)

    dc = sub.add_parser(
        "distinct",
        help="streaming distinct-count: per-epoch cumulative per-group "
        "COUNT(DISTINCT) snapshots, sketch state across epochs "
        "(pipelines/streaming_sketch)",
    )
    dc.add_argument("--input", required=True, help="events parquet dir")
    dc.add_argument("--work", required=True)
    dc.add_argument("--out", required=True)
    dc.add_argument("--shards", type=int, default=4)
    dc.add_argument("--files-per-epoch", type=int, default=1)
    dc.add_argument("--group-col", default="event_type")
    dc.add_argument("--value-col", default="user_id")
    dc.add_argument("--precision", type=int, default=12)
    dc.add_argument("--sparse-limit", type=int, default=65536)
    dc.add_argument("--max-epochs", type=int, default=None)

    tk = sub.add_parser(
        "topk",
        help="streaming top-k tokens: per-epoch cumulative top-k snapshots, "
        "SpaceSaving count state across epochs (pipelines/streaming_sketch)",
    )
    tk.add_argument("--input", required=True, help="documents parquet dir")
    tk.add_argument("--work", required=True)
    tk.add_argument("--out", required=True)
    tk.add_argument("--shards", type=int, default=4)
    tk.add_argument("--files-per-epoch", type=int, default=1)
    tk.add_argument("--text-col", default="text")
    tk.add_argument("--k", type=int, default=10)
    tk.add_argument("--capacity", type=int, default=4096)
    tk.add_argument("--max-epochs", type=int, default=None)

    qt = sub.add_parser(
        "quantiles",
        help="streaming quantiles: per-epoch cumulative per-group quantile "
        "snapshots, bounded weighted-sample summaries across epochs "
        "(pipelines/streaming_sketch)",
    )
    qt.add_argument("--input", required=True, help="events parquet dir")
    qt.add_argument("--work", required=True)
    qt.add_argument("--out", required=True)
    qt.add_argument("--shards", type=int, default=4)
    qt.add_argument("--files-per-epoch", type=int, default=1)
    qt.add_argument("--group-col", default="event_type")
    qt.add_argument("--value-col", default="value")
    qt.add_argument("--qs", default="0.25,0.5,0.9",
                    help="comma-separated quantiles")
    qt.add_argument("--limit", type=int, default=65536)
    qt.add_argument("--max-epochs", type=int, default=None)

    wf = sub.add_parser(
        "windowfn",
        help="streaming window functions: per-key rn/lag/delta/running/"
        "rolling outputs per arrival epoch, fixed-size per-key state "
        "(pipelines/streaming_analytic)",
    )
    wf.add_argument("--input", required=True, help="events parquet dir")
    wf.add_argument("--work", required=True)
    wf.add_argument("--out", required=True)
    wf.add_argument("--shards", type=int, default=4)
    wf.add_argument("--files-per-epoch", type=int, default=1)
    wf.add_argument("--key-col", default="user_id")
    wf.add_argument("--ts-col", default="ts")
    wf.add_argument("--id-col", default="event_id")
    wf.add_argument("--value-col", default="value")
    wf.add_argument("--roll-rows", type=int, default=4)
    wf.add_argument("--max-epochs", type=int, default=None)

    cdc = sub.add_parser(
        "compact",
        help="streaming CDC/upsert compaction: per-epoch latest-row-per-"
        "touched-key changelog (pipelines/streaming_analytic)",
    )
    cdc.add_argument("--input", required=True, help="events parquet dir")
    cdc.add_argument("--work", required=True)
    cdc.add_argument("--out", required=True)
    cdc.add_argument("--shards", type=int, default=4)
    cdc.add_argument("--files-per-epoch", type=int, default=1)
    cdc.add_argument("--key-col", default="user_id")
    cdc.add_argument("--ts-col", default="ts")
    cdc.add_argument("--id-col", default="event_id")
    cdc.add_argument("--value-col", default="value")
    cdc.add_argument("--max-epochs", type=int, default=None)

    for p in (b, s, w, cp, dd, cb, mh, dc, tk, qt, wf, cdc):
        p.add_argument("--num-cpus", type=int, default=8)

    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    if args.mode == "batch":
        import ray.data

        from statefulstreamprocessor_ray.pipelines.flagship import flagship_join

        out = flagship_join(
            ray.data.read_parquet(args.input),
            delta_time=args.delta,
        )
        out.write_parquet(args.out)
        print(json.dumps({"mode": "batch", "rows": ray.data.read_parquet(args.out).count()}))
    elif args.mode == "cep":
        from statefulstreamprocessor_ray.pipelines.streaming_cep import (
            StreamingCepConfig,
            StreamingCepJob,
        )

        ccfg = StreamingCepConfig(
            input_path=args.input,
            work_dir=args.work,
            out_dir=args.out,
            mode=args.cep_mode,
            pattern=tuple(args.pattern),
            contiguity=args.contiguity,
            within_s=args.within_s,
            n_shards=args.shards,
            epoch_duration_s=args.epoch_s,
            key_col=args.key_col,
            ts_col=args.ts_col,
            event_col=args.event_col,
            tie_col=args.tie_col,
        )
        stats = StreamingCepJob(ccfg).run(max_epochs=args.max_epochs)
        stats.pop("per_epoch", None)
        print(json.dumps({"mode": "cep", **stats}))
    elif args.mode == "dedup":
        from statefulstreamprocessor_ray.pipelines.streaming_dedup import (
            StreamingDedupConfig,
            StreamingDedupJob,
        )

        prepare = None
        prepare_tag = ""
        if args.curate:
            from statefulstreamprocessor_ray.pipelines.corpus import CurationPrepare

            prepare = CurationPrepare(
                min_tokens=args.min_tokens,
                max_top_frac=args.max_top_frac,
                text_col=args.text_col,
                id_col=args.id_col,
            )
            prepare_tag = f"scrub+q{args.min_tokens}/{args.max_top_frac}"
        dcfg = StreamingDedupConfig(
            input_path=args.input,
            work_dir=args.work,
            out_dir=args.out,
            n_shards=args.shards,
            files_per_epoch=args.files_per_epoch,
            id_col=args.id_col,
            text_col=args.text_col,
            prepare_fn=prepare,
            prepare_tag=prepare_tag,
        )
        stats = StreamingDedupJob(dcfg).run(max_epochs=args.max_epochs)
        print(json.dumps({"mode": "dedup", **stats}))
    elif args.mode == "minhash":
        from statefulstreamprocessor_ray.pipelines.streaming_minhash import (
            StreamingMinHashConfig,
            StreamingMinHashJob,
        )

        mcfg = StreamingMinHashConfig(
            input_path=args.input,
            work_dir=args.work,
            out_dir=args.out,
            n_shards=args.shards,
            files_per_epoch=args.files_per_epoch,
            id_col=args.id_col,
            text_col=args.text_col,
            n_perm=args.n_perm,
            bands=args.bands,
            k=args.k,
        )
        stats = StreamingMinHashJob(mcfg).run(max_epochs=args.max_epochs)
        print(json.dumps({"mode": "minhash", **stats}))
    elif args.mode == "distinct":
        from statefulstreamprocessor_ray.pipelines.streaming_sketch import (
            StreamingDistinctConfig,
            StreamingDistinctJob,
        )

        dcfg = StreamingDistinctConfig(
            input_path=args.input,
            work_dir=args.work,
            out_dir=args.out,
            n_shards=args.shards,
            files_per_epoch=args.files_per_epoch,
            group_col=args.group_col,
            value_col=args.value_col,
            precision=args.precision,
            sparse_limit=args.sparse_limit,
        )
        stats = StreamingDistinctJob(dcfg).run(max_epochs=args.max_epochs)
        print(json.dumps({"mode": "distinct", **stats}))
    elif args.mode == "topk":
        from statefulstreamprocessor_ray.pipelines.streaming_sketch import (
            StreamingTopKConfig,
            StreamingTopKJob,
        )

        tcfg = StreamingTopKConfig(
            input_path=args.input,
            work_dir=args.work,
            out_dir=args.out,
            n_shards=args.shards,
            files_per_epoch=args.files_per_epoch,
            text_col=args.text_col,
            k=args.k,
            capacity=args.capacity,
        )
        stats = StreamingTopKJob(tcfg).run(max_epochs=args.max_epochs)
        print(json.dumps({"mode": "topk", **stats}))
    elif args.mode == "quantiles":
        from statefulstreamprocessor_ray.pipelines.streaming_sketch import (
            StreamingQuantileConfig,
            StreamingQuantileJob,
        )

        qcfg = StreamingQuantileConfig(
            input_path=args.input,
            work_dir=args.work,
            out_dir=args.out,
            n_shards=args.shards,
            files_per_epoch=args.files_per_epoch,
            group_col=args.group_col,
            value_col=args.value_col,
            qs=tuple(float(x) for x in args.qs.split(",") if x),
            limit=args.limit,
        )
        stats = StreamingQuantileJob(qcfg).run(max_epochs=args.max_epochs)
        print(json.dumps({"mode": "quantiles", **stats}))
    elif args.mode == "windowfn":
        from statefulstreamprocessor_ray.pipelines.streaming_analytic import (
            StreamingWindowFnConfig,
            StreamingWindowFnJob,
        )

        wcfg = StreamingWindowFnConfig(
            input_path=args.input,
            work_dir=args.work,
            out_dir=args.out,
            n_shards=args.shards,
            files_per_epoch=args.files_per_epoch,
            key_col=args.key_col,
            ts_col=args.ts_col,
            id_col=args.id_col,
            value_col=args.value_col,
            roll_rows=args.roll_rows,
        )
        stats = StreamingWindowFnJob(wcfg).run(max_epochs=args.max_epochs)
        print(json.dumps({"mode": "windowfn", **stats}))
    elif args.mode == "compact":
        from statefulstreamprocessor_ray.pipelines.streaming_analytic import (
            StreamingCompactionJob,
            StreamingWindowFnConfig,
        )

        ccfg2 = StreamingWindowFnConfig(
            input_path=args.input,
            work_dir=args.work,
            out_dir=args.out,
            n_shards=args.shards,
            files_per_epoch=args.files_per_epoch,
            key_col=args.key_col,
            ts_col=args.ts_col,
            id_col=args.id_col,
            value_col=args.value_col,
        )
        stats = StreamingCompactionJob(ccfg2).run(max_epochs=args.max_epochs)
        print(json.dumps({"mode": "compact", **stats}))
    elif args.mode == "corpus":
        import os

        import ray.data

        from statefulstreamprocessor_ray.pipelines.corpus import corpus_build

        if os.path.isdir(args.out) and os.listdir(args.out):
            raise SystemExit(
                f"--out {args.out} is not empty; parquet writes append, so a "
                "rerun would mix stale chunks with new ones — pass a clean dir"
            )

        chunks = corpus_build(
            ray.data.read_parquet(args.input),
            ray.data.read_parquet(args.bench_input) if args.bench_input else None,
            min_tokens=args.min_tokens,
            max_top_frac=args.max_top_frac,
            jaccard_threshold=args.jaccard,
            k=args.k,
            decon_k=args.decon_k,
            rate=args.sample_rate,
            chunk_tokens=args.chunk_tokens,
            overlap=args.overlap,
            id_col=args.id_col,
            text_col=args.text_col,
            checkpoint_dir=args.work,
        )
        chunks.write_parquet(args.out)
        n = ray.data.read_parquet(args.out).count()
        print(json.dumps({"mode": "corpus", "chunks_written": n, "out": args.out}))
    elif args.mode == "windows":
        from statefulstreamprocessor_ray.pipelines.streaming_windows import (
            StreamingWindowConfig,
            StreamingWindowJob,
        )

        wcfg = StreamingWindowConfig(
            input_path=args.input,
            work_dir=args.work,
            out_dir=args.out,
            n_shards=args.shards,
            epoch_duration_s=args.epoch_s,
            window_size_s=args.window_s,
            window_kind=args.kind,
            slide_s=args.slide_s,
            gap_s=args.gap_s,
            allowed_lateness_s=args.lateness_s,
            key_col=args.key_col,
            ts_col=args.ts_col,
            value_col=args.value_col,
        )
        stats = StreamingWindowJob(wcfg).run(max_epochs=args.max_epochs)
        stats.pop("per_epoch", None)
        print(json.dumps({"mode": "windows", **stats}))
    else:
        from statefulstreamprocessor_ray.pipelines.streaming import (
            StreamingJoinConfig,
            StreamingJoinJob,
        )

        cfg = StreamingJoinConfig(
            input_path=args.input,
            work_dir=args.work,
            out_dir=args.out,
            n_shards=args.shards,
            epoch_duration_s=args.epoch_s,
            delta_time=args.delta,
            allowed_lateness_s=args.lateness_s,
            epoch_by=args.epoch_by,
            provenance=args.provenance,
        )
        stats = StreamingJoinJob(cfg).run(max_epochs=args.max_epochs)
        stats.pop("per_epoch", None)
        print(json.dumps({"mode": "streaming", **stats}))

    ray.shutdown()


if __name__ == "__main__":
    main()
