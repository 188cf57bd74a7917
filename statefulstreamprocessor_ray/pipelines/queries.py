"""Driver-contract query registry: one entry per operator (SURVEY.md §2 +
training-data ops), each with a DuckDB oracle where SQL-expressible.

Every callable takes ``sf_dir`` and returns a Dataset / pandas / Arrow result;
computed column names match the oracle SQL aliases exactly (the driver's
comparison sorts columns by name and hashes values).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from statefulstreamprocessor_ray.functions import ops
from statefulstreamprocessor_ray.functions.streams import StreamSpec
from statefulstreamprocessor_ray.sources.transcripts import transcripts_from_events
from statefulstreamprocessor_ray.stages import curation, dedup, multimodal, relational, similarity
from statefulstreamprocessor_ray.stages.join import (
    asof_join_tagged,
    ordered_join,
    ordered_join_events,
    session_bounded_join,
)
from statefulstreamprocessor_ray.stages.text import analyze_text, langid_sql
from statefulstreamprocessor_ray.stages.windows import (
    assign_sliding,
    session_windows,
    windowed_interpolation_join,
)
from statefulstreamprocessor_ray.pipelines.flagship import flagship_join


def _workspace(prefix: str, tag: str, sf_dir: str) -> str:
    """Per-run scratch dir under /tmp. The corpus part is a STABLE digest of
    sf_dir (Python's hash() is salted per process), and the PID suffix keeps
    two concurrent runs over the same corpus from rmtree-ing each other's
    in-flight job state."""
    import hashlib
    import os

    digest = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    return f"/tmp/ssp_q_{prefix}_{tag}_{digest}_{os.getpid()}"

US = 1_000_000
HOUR_US = 3_600 * US
SLIDE_US = 900 * US


def _strip_meta(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Drop parquet-embedded pandas schema metadata at the read. It is dead
    weight on every block, and pyarrow's Schema.__hash__ RAISES on schemas
    with metadata ('unhashable type: dict') — which is what makes Ray's
    unify_schemas() log 'Failed to hash the schemas (for deduplication)' on
    every unify. Stripping here removes the noise at its root."""
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _events(sf_dir: str, columns=None) -> ray.data.Dataset:
    return _strip_meta(
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=columns)
    )


def _documents(sf_dir: str, columns=None) -> ray.data.Dataset:
    return _strip_meta(
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)
    )


def _embeddings(sf_dir: str) -> ray.data.Dataset:
    return _strip_meta(ray.data.read_parquet(f"{sf_dir}/embeddings.parquet"))


def _purchase_click_spec() -> StreamSpec:
    return StreamSpec(
        key_col="user_id",
        ts_col="ts",
        tie_col="event_id",
        left_mask=lambda b: pc.equal(b["event_type"], "purchase"),
        right_mask=lambda b: pc.equal(b["event_type"], "click"),
    )


def _tag_events(sf_dir: str) -> ray.data.Dataset:
    from statefulstreamprocessor_ray.functions.streams import derive_streams

    ev = _events(sf_dir, columns=["event_id", "ts", "user_id", "event_type", "value"])
    return derive_streams(ev, _purchase_click_spec())


# ---------------------------------------------------------------------------
# query callables


def q_filter_prefix(sf_dir):
    return ops.filter_prefix(_events(sf_dir), "event_type", ("p",))


def q_explode(sf_dir):
    return ops.explode_events(_events(sf_dir, columns=["event_id", "value", "props"]))


def q_ts_normalize(sf_dir):
    return ops.normalize_ts_seconds(_events(sf_dir, columns=["event_id", "ts"]))


def q_key_suffix(sf_dir):
    out = ops.key_suffix(_documents(sf_dir, columns=["doc_id", "source"]), "source", 3)
    return out.select_columns(["doc_id", "source", "group_key"])


def q_wordcount(sf_dir):
    return ops.word_count(_documents(sf_dir, columns=["text"]))


def q_clamp_level(sf_dir):
    return ops.clamp_level(_events(sf_dir, columns=["event_id", "value"]))


def q_order_check(sf_dir):
    return ops.order_check(_events(sf_dir, columns=["event_id", "ts", "user_id"]))


def q_groupby_count(sf_dir):
    return (
        _events(sf_dir, columns=["event_type"])
        .groupby("event_type")
        .aggregate(Count(alias_name="n"))
    )


def q_tumbling_agg(sf_dir):
    ev = _events(sf_dir, columns=["user_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        """Map-side combiner: per-batch partial (n, cents) so the shuffle
        carries one row per (user, window) per block, not one per event."""
        t = pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        v = b["value"].to_numpy(zero_copy_only=False)
        raw = pa.table(
            {
                "user_id": b["user_id"],
                "window_start_us": pa.array(t // HOUR_US * HOUR_US, pa.int64()),
                "cents": pa.array(np.floor(v * 100 + 0.5).astype(np.int64), pa.int64()),
            }
        )
        return raw.group_by(["user_id", "window_start_us"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )

    return ops.sharded_group_sum(
        ev.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["user_id", "window_start_us"],
        sums={"cents_count": "n", "cents_sum": "sum_cents"},
    )


def q_sliding_agg(sf_dir):
    ev = _events(sf_dir, columns=["user_id", "ts"])
    win = assign_sliding(ev, size_s=3600.0, slide_s=900.0, ts_col="ts")

    def prep(b: pa.Table) -> pa.Table:
        # map-side combiner: the 4x sliding explode collapses back to one
        # partial row per (user, window) before the exchange
        raw = pa.table(
            {
                "user_id": b["user_id"],
                "window_start_us": pc.multiply(b["window_id"], SLIDE_US),
            }
        )
        return raw.group_by(["user_id", "window_start_us"]).aggregate(
            [("window_start_us", "count")]
        )

    return ops.sharded_group_sum(
        win.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        keys=["user_id", "window_start_us"],
        sums={"window_start_us_count": "n"},
    )


def q_session_windows(sf_dir):
    ev = _events(sf_dir, columns=["user_id", "ts"])
    return session_windows(ev, gap_s=4 * 3600.0, key_col="user_id", ts_col="ts")


def q_windowed_join(sf_dir):
    tagged = _tag_events(sf_dir)
    out = windowed_interpolation_join(
        tagged,
        size_s=3600.0,
        slide_s=None,
        key_col="user_id",
        ts_col="ts",
        tie_col="event_id",
        left_value_col="value",
        right_value_col="value",
    )

    def proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "window_start_us": pc.cast(
                    pc.cast(b["window_start"], pa.timestamp("us")), pa.int64()
                ),
                "ts_us": pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64()),
                "result": b["result"],
                "level": pc.cast(b["level"], pa.int32()),
            }
        )

    return out.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)


def q_windowed_join_sliding(sf_dir):
    """J5 in its native sliding form (reference SlidingEventTimeWindows:
    size 2h, slide 30min -> each event in 4 windows)."""
    tagged = _tag_events(sf_dir)
    out = windowed_interpolation_join(
        tagged,
        size_s=7200.0,
        slide_s=1800.0,
        key_col="user_id",
        ts_col="ts",
        tie_col="event_id",
        left_value_col="value",
        right_value_col="value",
    )

    def proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "window_start_us": pc.cast(
                    pc.cast(b["window_start"], pa.timestamp("us")), pa.int64()
                ),
                "ts_us": pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64()),
                "result": b["result"],
                "level": pc.cast(b["level"], pa.int32()),
            }
        )

    return out.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)


def q_asof_join(sf_dir):
    tagged = _tag_events(sf_dir)
    out = asof_join_tagged(
        tagged,
        key_col="user_id",
        ts_col="ts",
        tie_col="event_id",
        left_cols=("event_id", "value"),
        right_cols=("value",),
    )

    def proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "l_ts_us": pc.cast(pc.cast(b["l_ts"], pa.timestamp("us")), pa.int64()),
                "l_event_id": pc.cast(b["l_event_id"], pa.int64()),
                "l_value": b["l_value"],
                "r_ts_us": pc.cast(pc.cast(b["r_ts"], pa.timestamp("us")), pa.int64()),
                "r_value": b["r_value"],
            }
        )

    return out.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)


def _run_streaming_window_job(sf_dir: str, tag: str, **cfg_kw) -> pa.Table:
    """Run a full streaming window job into /tmp and return the committed
    (manifest-listed) output."""
    import glob
    import json
    import shutil

    import pyarrow.parquet as pq

    from statefulstreamprocessor_ray.pipelines.streaming_windows import (
        StreamingWindowConfig,
        StreamingWindowJob,
    )

    base = _workspace("swin", tag, sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    cfg = StreamingWindowConfig(
        input_path=f"{sf_dir}/events.parquet",
        work_dir=f"{base}/work",
        out_dir=f"{base}/out",
        n_shards=4,
        epoch_duration_s=2 * 24 * 3600.0,
        **cfg_kw,
    )
    StreamingWindowJob(cfg).run()
    parts = []
    for m in sorted(glob.glob(f"{base}/out/_manifests/*.json")):
        for part in json.load(open(m))["parts"]:
            if part["rows"]:
                parts.append(pq.read_table(part["file"]))
    out = pa.concat_tables(parts)
    shutil.rmtree(base, ignore_errors=True)
    return out


def q_cep_absence(sf_dir):
    """CEP absence/timeout: purchases NOT followed by an error from the same
    user within 24h."""
    from statefulstreamprocessor_ray.stages.cep import detect_absence

    ev = _events(sf_dir, columns=["event_id", "ts", "user_id", "event_type"])
    return detect_absence(
        ev,
        first="purchase",
        absent="error",
        within_s=24 * 3600.0,
        key_col="user_id",
        ts_col="ts",
        event_col="event_type",
        tie_col="event_id",
    )


def _run_streaming_cep(sf_dir: str, tag: str, **cfg_kw) -> pa.Table:
    import glob
    import json
    import shutil

    import pyarrow.parquet as pq

    from statefulstreamprocessor_ray.pipelines.streaming_cep import (
        StreamingCepConfig,
        StreamingCepJob,
    )

    base = _workspace("scep", tag, sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    cfg = StreamingCepConfig(
        input_path=f"{sf_dir}/events.parquet",
        work_dir=f"{base}/work",
        out_dir=f"{base}/out",
        n_shards=4,
        epoch_duration_s=2 * 24 * 3600.0,
        **cfg_kw,
    )
    StreamingCepJob(cfg).run()
    parts = []
    for m in sorted(glob.glob(f"{base}/out/_manifests/*.json")):
        for part in json.load(open(m))["parts"]:
            if part["rows"]:
                parts.append(pq.read_table(part["file"]))
    out = pa.concat_tables(parts) if parts else None
    shutil.rmtree(base, ignore_errors=True)
    return out


def q_streaming_cep_funnel(sf_dir):
    """The strict-contiguity funnel evaluated INCREMENTALLY (carry = last L-1
    rows per key, exactly-once epochs) — same output as the batch operator,
    same SQL oracle."""
    return _run_streaming_cep(
        sf_dir,
        "strict",
        mode="sequence",
        pattern=("view", "click", "purchase"),
        contiguity="strict",
        within_s=48 * 3600.0,
    )


def q_streaming_cep_absence(sf_dir):
    """Absence/timeout pattern evaluated incrementally: pending As fire once
    the watermark passes their deadline un-killed."""
    return _run_streaming_cep(
        sf_dir,
        "absence",
        mode="absence",
        pattern=("purchase", "error"),
        within_s=24 * 3600.0,
    )


def q_streaming_tumbling_agg(sf_dir):
    """Full streaming windowed-aggregation job (epochs, watermark-gated
    emission, exactly-once manifests) — final output equals the batch
    tumbling aggregate, which is the SQL oracle."""
    return _run_streaming_window_job(sf_dir, "tumb", window_size_s=3600.0)


def q_streaming_sliding_agg(sf_dir):
    """Streaming sliding-window aggregation (1h windows, 15min slide)."""
    return _run_streaming_window_job(
        sf_dir, "slide", window_kind="sliding", window_size_s=3600.0, slide_s=900.0
    )


def q_streaming_session_windows(sf_dir):
    """Streaming session windows (4h inactivity gap): open sessions merge
    across epochs in shard state; a session emits when the watermark passes
    end+gap."""
    return _run_streaming_window_job(
        sf_dir, "sess", window_kind="session", gap_s=4 * 3600.0
    )


def q_cep_funnel(sf_dir):
    """CEP sequence detection: view -> click -> purchase funnel per user,
    strict contiguity, span <= 48h."""
    from statefulstreamprocessor_ray.stages.cep import match_sequence

    ev = _events(sf_dir, columns=["event_id", "ts", "user_id", "event_type"])
    return match_sequence(
        ev,
        pattern=["view", "click", "purchase"],
        within_s=48 * 3600.0,
        key_col="user_id",
        ts_col="ts",
        event_col="event_type",
        tie_col="event_id",
    )


def q_cep_funnel_skip(sf_dir):
    """CEP skip-till-next-match funnel (FlinkCEP followedBy): each view binds
    to the user's next click, which binds to the next purchase; span <= 48h."""
    from statefulstreamprocessor_ray.stages.cep import match_sequence

    ev = _events(sf_dir, columns=["event_id", "ts", "user_id", "event_type"])
    return match_sequence(
        ev,
        pattern=["view", "click", "purchase"],
        within_s=48 * 3600.0,
        key_col="user_id",
        ts_col="ts",
        event_col="event_type",
        tie_col="event_id",
        contiguity="skip",
    )


def q_dedup_exact(sf_dir):
    return dedup.exact_dedup(_documents(sf_dir, columns=["doc_id", "text"]))


def q_doc_embedding_join(sf_dir):
    """Plain relational equi-join (documents ⋈ embeddings on id): ONE
    int-keyed co-shuffle (hash(key) % P) + an Arrow hash-join per shard —
    the attach-metadata primitive around the stream operators. The
    broadcast variant (small side via ray.put) is pytest-covered. Output
    order is pinned (sort by doc_id) and dtypes ride through Arrow-native,
    so the driver's value hash is deterministic."""
    docs = _documents(sf_dir, columns=["doc_id", "lang", "source"])
    emb = _embeddings(sf_dir).select_columns(["vec_id", "label"])
    out = relational.partitioned_join(docs, emb, left_on="doc_id", right_on="vec_id")
    return out.map_batches(
        lambda t: t.select(["doc_id", "lang", "source", "label"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sort("doc_id")


def _doc_pair_halves(sf_dir):
    docs = _documents(sf_dir, columns=["doc_id", "lang", "source", "n_chars"])

    def half(parity):
        return docs.map_batches(
            lambda t, p=parity: t.filter(
                pa.array(
                    t["n_chars"].to_numpy(zero_copy_only=False) % 2 == p
                )
            ).select(["lang", "source"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    return half(0), half(1)


def q_intersect_pairs(sf_dir):
    """SQL INTERSECT (distinct) over a projection: (lang, source) pairs
    present in BOTH document halves — DISTINCT combiner exchange + a
    composite-key semi join (right dups cost nothing)."""
    a, b = _doc_pair_halves(sf_dir)
    return relational.set_op(a, b, ["lang", "source"], "intersect")


def q_except_pairs(sf_dir):
    """SQL EXCEPT (distinct): pairs in the even half and NOT the odd half —
    the same plan with an anti join."""
    a, b = _doc_pair_halves(sf_dir)
    return relational.set_op(a, b, ["lang", "source"], "except")


def q_multikey_join(sf_dir):
    """Composite-key distributed join: per-(user_id, event_type) activity
    totals attached back to every event — the enrich-rows-with-their-group
    shape. Both key columns co-shuffle as ONE exchange key (a null in any
    component matches nothing)."""
    from statefulstreamprocessor_ray.functions.ops import sharded_group_sum

    ev = _events(sf_dir, columns=["event_id", "user_id", "event_type"])

    def count_partial(df):
        import pandas as pd_

        out = df.groupby(["user_id", "event_type"], sort=False).size()
        return pd_.DataFrame(
            {
                "user_id": out.index.get_level_values(0),
                "event_type": out.index.get_level_values(1),
                "c": out.to_numpy(),
            }
        )

    totals = sharded_group_sum(
        ev.map_batches(count_partial, batch_format="pandas"),
        keys=["user_id", "event_type"],
        sums={"c": "n_tot"},
    )
    out = relational.partitioned_join(
        ev, totals, left_on=["user_id", "event_type"], how="inner"
    )
    return out.select_columns(["event_id", "user_id", "event_type", "n_tot"])


def q_outer_join(sf_dir):
    """Distributed FULL OUTER join with genuinely unmatched rows on BOTH
    sides (docs doc_id%3!=0 vs embeddings vec_id%2==0): the coalesced Acero
    key is re-split into l.key / r.key with side-match masks, null keys
    match nothing but still surface on their own side."""
    docs = _documents(sf_dir, columns=["doc_id", "source"])
    docs = docs.map_batches(
        lambda t: t.filter(
            pa.array(t["doc_id"].to_numpy(zero_copy_only=False) % 3 != 0)
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    emb = _embeddings(sf_dir).select_columns(["vec_id", "label"])
    emb = emb.map_batches(
        lambda t: t.filter(
            pa.array(t["vec_id"].to_numpy(zero_copy_only=False) % 2 == 0)
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = relational.partitioned_join(
        docs, emb, left_on="doc_id", right_on="vec_id", how="outer"
    )
    return out.select_columns(["doc_id", "source", "vec_id", "label"])


def q_semi_join(sf_dir):
    """Distributed semi join (EXISTS): documents that HAVE a label%3==0
    embedding — left columns only, no duplication on multi-matches. Same
    one-co-shuffle exchange as the equi-join, but each shard runs Acero's
    left_semi so only key presence rides back (no right columns built)."""
    docs = _documents(sf_dir, columns=["doc_id", "lang", "source"])
    emb = _embeddings(sf_dir).select_columns(["vec_id", "label"])
    emb = emb.map_batches(
        lambda t: t.filter(
            pa.array(t["label"].to_numpy(zero_copy_only=False) % 3 == 0)
        ).select(["vec_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = relational.partitioned_join(
        docs, emb, left_on="doc_id", right_on="vec_id", how="semi"
    )
    return out.sort("doc_id")


def q_anti_join(sf_dir):
    """Distributed anti join (NOT EXISTS): documents MISSING a label%3==0
    embedding — the decontamination / orphan-detection primitive when both
    sides are too large to broadcast."""
    docs = _documents(sf_dir, columns=["doc_id", "lang", "source"])
    emb = _embeddings(sf_dir).select_columns(["vec_id", "label"])
    emb = emb.map_batches(
        lambda t: t.filter(
            pa.array(t["label"].to_numpy(zero_copy_only=False) % 3 == 0)
        ).select(["vec_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = relational.partitioned_join(
        docs, emb, left_on="doc_id", right_on="vec_id", how="anti"
    )
    return out.sort("doc_id")


def q_chunk_documents(sf_dir):
    """Overlapping token-window chunking (context-window prep): 1->N explode
    in map_batches, no shuffle; 40-token windows with 8-token overlap over
    the documents table."""
    docs = _documents(sf_dir, columns=["doc_id", "text"])
    return curation.chunk_documents(docs, chunk_tokens=40, overlap=8)


def q_pack_sequences(sf_dir):
    """Greedy sequence packing over the chunked corpus: fixed token budget
    128, buckets = doc_id % 8 (fixed modulus -> machine-independent layout),
    greedy fill in (doc_id, chunk_idx) order within each bucket. The oracle
    replays the greedy walk with a recursive CTE."""
    chunks = curation.chunk_documents(
        _documents(sf_dir, columns=["doc_id", "text"]), chunk_tokens=40, overlap=8
    ).drop_columns(["chunk_text"])
    return curation.pack_sequences(chunks, budget=128, n_buckets=8)


def q_render_conversations(sf_dir):
    """Render each conversation transcript to one training document (turns
    in (ts, turn_idx) order, 'role: text' lines) — the corpus-assembly step
    between the transcript tables and the text pipeline. Shard-vectorized
    group concat, one task per shard."""
    return curation.render_conversations(transcripts_from_events(sf_dir))


def q_streaming_dedup(sf_dir):
    """Streaming exact dedup: the documents corpus replayed as 3 arrival
    epochs; per-shard seen-content-hash state, exactly-once manifests.
    Because the epoch files are doc_id-ordered, the cross-epoch
    first-occurrence rule equals 'global min doc_id per text' — which is the
    SQL oracle."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from statefulstreamprocessor_ray.pipelines.streaming_dedup import (
        StreamingDedupConfig,
        StreamingDedupJob,
    )
    from statefulstreamprocessor_ray.sinks.exactly_once import ExactlyOnceParquetSink

    base = _workspace("sdedup", "docs", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    inp = f"{base}/input"
    os.makedirs(inp)
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    tbl = tbl.sort_by("doc_id")
    n = tbl.num_rows
    for i in range(3):
        lo, hi = i * n // 3, (i + 1) * n // 3
        pq.write_table(tbl.slice(lo, hi - lo), f"{inp}/part-{i:03d}.parquet")
    cfg = StreamingDedupConfig(
        input_path=inp, work_dir=f"{base}/work", out_dir=f"{base}/out", n_shards=4
    )
    StreamingDedupJob(cfg).run()
    return ExactlyOnceParquetSink(f"{base}/out").read_committed().select_columns(
        ["doc_id", "text"]
    )


def q_streaming_minhash(sf_dir):
    """Streaming NEAR-dup dedup (VERDICT r3 #3): the documents corpus
    replayed as 3 doc_id-ordered arrival epochs through StreamingMinHashJob
    — per-shard LSH band-key state across epochs, exactly-once manifests. A
    doc is emitted iff no earlier doc (any earlier epoch, or smaller id in
    the same epoch) shares a minhash band; id-ordered epochs collapse
    'earlier' to 'smaller doc_id', and hash_fn='md5' makes the WHOLE sketch
    (shingle md5s, wrap-around universal hashes, band polynomials)
    reproducible in DuckDB — the oracle recomputes it bit-for-bit
    (streaming_minhash_oracle_sql). n_perm=32/bands=8 keeps the oracle's
    64M-row sig CTE tractable at sf0.01."""
    import os
    import shutil

    import pyarrow.parquet as pq_

    from statefulstreamprocessor_ray.pipelines.streaming_minhash import (
        StreamingMinHashConfig,
        StreamingMinHashJob,
    )
    from statefulstreamprocessor_ray.sinks.exactly_once import ExactlyOnceParquetSink

    base = _workspace("sminhash", "docs", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    inp = f"{base}/input"
    os.makedirs(inp)
    tbl = pq_.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    tbl = tbl.sort_by("doc_id")
    n = tbl.num_rows
    for i in range(3):
        lo, hi = i * n // 3, (i + 1) * n // 3
        pq_.write_table(tbl.slice(lo, hi - lo), f"{inp}/part-{i:03d}.parquet")
    cfg = StreamingMinHashConfig(
        input_path=inp,
        work_dir=f"{base}/work",
        out_dir=f"{base}/out",
        n_shards=4,
        n_perm=32,
        bands=8,
        hash_fn="md5",
    )
    StreamingMinHashJob(cfg).run()
    return ExactlyOnceParquetSink(f"{base}/out").read_committed().select_columns(
        ["doc_id", "text"]
    )


def q_streaming_corpus(sf_dir):
    """Streaming corpus curation: the documents corpus replayed as 3 arrival
    epochs through StreamingDedupJob with a CurationPrepare phase-0
    transform (scrub + quality gate), so each epoch emits the NEW clean
    first-occurrences — corpus_build's front half as a follow-the-tail
    streaming job. doc_id-ordered epochs make the oracle 'min doc_id per
    scrubbed text over quality-passing docs'."""
    import os
    import shutil

    import pyarrow.parquet as pq_

    from statefulstreamprocessor_ray.pipelines.corpus import CurationPrepare
    from statefulstreamprocessor_ray.pipelines.streaming_dedup import (
        StreamingDedupConfig,
        StreamingDedupJob,
    )
    from statefulstreamprocessor_ray.sinks.exactly_once import ExactlyOnceParquetSink

    base = _workspace("scorpus", "docs", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    inp = f"{base}/input"
    os.makedirs(inp)
    tbl = pq_.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    tbl = tbl.sort_by("doc_id")
    n = tbl.num_rows
    for i in range(3):
        lo, hi = i * n // 3, (i + 1) * n // 3
        pq_.write_table(tbl.slice(lo, hi - lo), f"{inp}/part-{i:03d}.parquet")
    cfg = StreamingDedupConfig(
        input_path=inp,
        work_dir=f"{base}/work",
        out_dir=f"{base}/out",
        n_shards=4,
        prepare_fn=CurationPrepare(min_tokens=20, max_top_frac=0.125),
        prepare_tag="scrub+q20/0.125",
    )
    StreamingDedupJob(cfg).run()
    return ExactlyOnceParquetSink(f"{base}/out").read_committed().select_columns(
        ["doc_id", "text"]
    )


def q_weighted_repeat(sf_dir):
    """Training-mix upsampling: repeat each doc (int(source[3:]) % 3 + 1)
    times with a 1-based rep index — pure per-batch np.repeat explode, no
    shuffle, partitioning inherited."""
    from statefulstreamprocessor_ray.stages.curation import weighted_repeat

    return weighted_repeat(_documents(sf_dir, columns=["doc_id", "source"]))


def q_scrub_text(sf_dir):
    """PII/URL scrubbing pass (emails -> <EMAIL>, URLs -> <URL>) with
    per-pattern hit counts; regexes compiled once per actor."""
    return curation.scrub_text(_documents(sf_dir, columns=["doc_id", "text"]))


def q_group_sample_k(sf_dir):
    """Exactly min(25, |source|) docs per source: the k smallest
    (md5(id), id) pairs per group — hash-min-k is an associative reduction,
    so per-batch partial top-k + one group-keyed exchange computes it
    without ever shuffling the corpus. md5 mode pins the DuckDB
    md5_number_lower ordering for the oracle; sip mode is the scale path
    (differential-tested in test_curation.py)."""
    from statefulstreamprocessor_ray.stages.curation import group_sample_exact_k

    return group_sample_exact_k(
        _documents(sf_dir, columns=["doc_id", "source"]),
        k=25,
        hash_fn="md5",
    )


def q_group_centroids(sf_dir):
    """Per-label mean-pooled embedding centroids: components quantized to
    integer micro-units before the distributed (label, dim) sum — int64
    partials are associative, so the mean is provable vs the oracle; the
    final s/n/1e6 division is the one shared IEEE chain."""
    from statefulstreamprocessor_ray.stages.similarity import group_centroids

    return group_centroids(
        _embeddings(sf_dir).select_columns(["label", "embedding"]),
        group_col="label",
    )


def q_window_functions(sf_dir):
    """SQL-window-function family over the event stream in ONE key
    exchange: per user ordered by (ts, event_id) — row_number, LAG(value),
    microseconds-since-previous, running micro-unit sum, trailing-4-row
    micro-unit sum. The per-key ordered pass the reference runs as its
    LocalStreamBuffer consume loop, here a lexsort + grouped prefix-sum
    numpy kernel per shard (modular uint64 prefix sums keep differences
    exact past int64 shard totals)."""
    from statefulstreamprocessor_ray.stages.analytic import window_functions

    return window_functions(
        _events(sf_dir, columns=["event_id", "ts", "user_id", "value"])
    )


def q_percent_rank(sf_dir):
    """Corpus-relative rank / percent_rank / cume_dist of every document by
    length — no global sort: value-count partials (bounded by the metric's
    cardinality) merge driver-side into prefix sums, then a broadcast
    searchsorted lookup maps every row."""
    from statefulstreamprocessor_ray.stages.analytic import percent_rank

    return percent_rank(_documents(sf_dir, columns=["doc_id", "n_chars"]))


def q_pivot_event_counts(sf_dir):
    """Long->wide per-user activity matrix over the fixed event-type
    vocabulary (n_click..n_view + n_total): map-side crosstab partials,
    one group-keyed exchange of fixed-width counts."""
    from statefulstreamprocessor_ray.stages.analytic import pivot_counts

    return pivot_counts(_events(sf_dir, columns=["user_id", "event_type"]))


def q_group_moments(sf_dir):
    """Exact per-event-type sufficient statistics (n, micro-unit sum,
    min/max, centi-unit sum of squares, mean) via associative integer
    partials + one tiny group-keyed exchange — the distributed-moments
    building block for z-score/variance quality gates."""
    from statefulstreamprocessor_ray.stages.analytic import group_moments

    return group_moments(_events(sf_dir, columns=["event_type", "value"]))


def q_topk_per_group(sf_dir):
    """Top-3 longest documents per source ordered by (n_chars DESC, doc_id)
    with 1-based rk: associative partial top-k per batch, one group-keyed
    exchange carrying <= k rows per (batch, group) — ranks by a VALUE
    column, unlike hash-ordered group_sample_k."""
    from statefulstreamprocessor_ray.stages.analytic import topk_per_group_by_value

    return topk_per_group_by_value(
        _documents(sf_dir, columns=["doc_id", "source", "n_chars"])
    )


def q_latest_per_key(sf_dir):
    """Upsert/CDC compaction: the most recent full event row per user by
    (ts DESC, event_id DESC); associative per-batch argmax, one key
    exchange carrying at most one row per (batch, key)."""
    from statefulstreamprocessor_ray.stages.analytic import latest_per_key

    return latest_per_key(
        _events(
            sf_dir, columns=["event_id", "ts", "user_id", "event_type", "value"]
        )
    )


def q_group_checksum(sf_dir):
    """Order-insensitive per-source content checksum (migration-validation
    integrity op): md5 mode pins DuckDB's md5_number_lower digest + HUGEINT
    sum mod a 2^53-scale prime; sip mode is the vectorized uint64-wraparound
    scale path (differential-tested)."""
    from statefulstreamprocessor_ray.stages.curation import group_checksum

    return group_checksum(
        _documents(sf_dir, columns=["source", "text"]), hash_fn="md5"
    )


def q_histogram(sf_dir):
    """Fixed-width histogram of event values: per-batch bincount partials,
    one bin-keyed exchange; bin = floor(v/25) is the single shared IEEE op."""
    from statefulstreamprocessor_ray.stages.analytic import histogram

    return histogram(_events(sf_dir, columns=["value"]), width=25.0)


def q_rollup_aggregate(sf_dir):
    """GROUP BY ROLLUP (returnflag, linestatus): one finest-level exchange,
    coarser levels re-derived from the aggregated finest table (associative
    integer sums), grouping() markers on every row."""
    from statefulstreamprocessor_ray.stages.analytic import rollup_aggregate

    return rollup_aggregate(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_quantity"],
        )
    )


def q_cube_aggregate(sf_dir):
    """GROUP BY CUBE (returnflag, linestatus): rollup_aggregate's lattice
    completed with the (linestatus) subtotal level — same one-exchange,
    derive-coarse-levels-from-finest plan."""
    from statefulstreamprocessor_ray.stages.analytic import rollup_aggregate

    return rollup_aggregate(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_quantity"],
        ),
        cube=True,
    )


def q_group_comoments(sf_dir):
    """Pearson corr of (quantity, extendedprice) per returnflag via exact
    bivariate integer sufficient statistics + the one shared IEEE
    correlation chain."""
    from statefulstreamprocessor_ray.stages.analytic import group_comoments

    return group_comoments(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity", "l_extendedprice"],
        ),
        y_scale=100.0,
    )


def q_pricing_summary(sf_dir):
    """TPC-H Q1 shape over the star schema: predicate+column-pruned lineitem
    read, micro-unit integer partials, one 6-group keyed exchange."""
    from statefulstreamprocessor_ray.pipelines.tpch import pricing_summary

    return pricing_summary(sf_dir)


def q_shipping_priority(sf_dir):
    """TPC-H Q3 shape: revenue combined per orderkey BEFORE the fact-fact
    join, orders semi-joined to the segment's customers via the linear hash
    join, associative global top-10."""
    from statefulstreamprocessor_ray.pipelines.tpch import shipping_priority

    return shipping_priority(sf_dir)


def q_local_supplier_volume(sf_dir):
    """TPC-H Q5 shape: broadcast dims (region->nation, supplier), two
    partitioned fact joins, same-nation gate, one group-sum exchange."""
    from statefulstreamprocessor_ray.pipelines.tpch import local_supplier_volume

    return local_supplier_volume(sf_dir)


def q_percentile_filter(sf_dir):
    """Corpus-relative quality gate: keep docs with n_tokens >= the corpus
    P10 (quantile_disc element). Composition shape: metric pass ->
    distributed quantile -> O(1) threshold to driver -> broadcast filter;
    the exact regime (corpus << summary limit) makes the oracle
    comparison bit-for-bit."""
    from statefulstreamprocessor_ray.stages.curation import (
        percentile_quality_filter,
    )

    return percentile_quality_filter(
        _documents(sf_dir, columns=["doc_id", "text"]), q=0.1
    )


def q_repetition_stats(sf_dir):
    """Gopher-style repetition signals: token count, distinct tokens,
    most-frequent-token fraction (exact double division, SQL-bit-identical)."""
    return curation.repetition_stats(_documents(sf_dir, columns=["doc_id", "text"]))


def q_stratified_sample(sf_dir):
    """Deterministic stratified sampling: md5-hash Bernoulli per doc_id with
    per-language rates — no RNG state anywhere, so the sample is stable
    across runs/machines and the oracle reproduces the exact decision with
    md5_number_lower in SQL."""
    docs = _documents(sf_dir, columns=["doc_id", "lang"])
    return curation.deterministic_sample(
        docs,
        rates_by={"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25, "zh": 0.25},
        stratum_col="lang",
        hash_fn="md5",  # oracle mode: matches md5_number_lower in SQL
    )


def q_decontaminate(sf_dir):
    """Benchmark decontamination: src0 documents act as the eval set; every
    other doc is flagged with its count of 3-grams appearing anywhere in the
    eval set. The eval shingle-hash table is broadcast once; the corpus
    streams through one map_batches (no shuffle)."""
    docs = _documents(sf_dir, columns=["doc_id", "text", "source"])

    def split(keep_bench):
        def fn(t):
            mask = pc.equal(t["source"], "src0")
            return t.filter(mask if keep_bench else pc.invert(mask))

        return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

    return curation.decontaminate(
        split(False), split(True), k=3, keep_cols=("source",)
    )


def q_corpus_build(sf_dir):
    """Composed corpus-build pipeline (pipelines/corpus.py): scrub ->
    quality filter -> exact+Jaccard dedup apply -> decontaminate (src0 =
    eval set, dropped) -> md5 deterministic sample -> chunk. One entry runs
    every composition seam the per-operator oracles can't see; the oracle
    chains the per-op SQL as CTEs."""
    from statefulstreamprocessor_ray.pipelines.corpus import corpus_build

    docs = _documents(sf_dir, columns=["doc_id", "text", "lang", "source"])

    def split(keep_bench):
        def fn(t):
            mask = pc.equal(t["source"], "src0")
            return t.filter(mask if keep_bench else pc.invert(mask))

        return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

    return corpus_build(
        split(False),
        split(True),
        min_tokens=20,
        max_top_frac=0.125,
        jaccard_threshold=0.5,
        k=3,
        decon_k=5,
        rates_by={"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25, "zh": 0.25},
        stratum_col="lang",
        sample_hash_fn="md5",  # oracle mode; "sip" is the scale default
        chunk_tokens=40,
        overlap=8,
        carry_cols=("lang", "source"),
    )


def q_corpus_build_packed(sf_dir):
    """corpus_build with the final packing stage: the full
    scrub -> filter -> dedup -> decontaminate -> sample -> chunk -> PACK
    composition, returning the greedy budget-128 pack assignment over the
    surviving chunks. Oracle = corpus_build's CTE chain + the recursive
    greedy-walk CTE from pack_sequences."""
    from statefulstreamprocessor_ray.pipelines.corpus import corpus_build

    docs = _documents(sf_dir, columns=["doc_id", "text", "lang", "source"])

    def split(keep_bench):
        def fn(t):
            mask = pc.equal(t["source"], "src0")
            return t.filter(mask if keep_bench else pc.invert(mask))

        return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

    return corpus_build(
        split(False),
        split(True),
        min_tokens=20,
        max_top_frac=0.125,
        jaccard_threshold=0.5,
        k=3,
        decon_k=5,
        rates_by={"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25, "zh": 0.25},
        stratum_col="lang",
        sample_hash_fn="md5",
        chunk_tokens=40,
        overlap=8,
        pack_budget=128,
        carry_cols=("lang", "source"),
    )


def q_ngram_jaccard(sf_dir):
    return dedup.ngram_jaccard_pairs(
        _documents(sf_dir, columns=["doc_id", "text"]), threshold=0.5, k=3
    )


def q_url_domains(sf_dir):
    """Per-domain URL stats (domain, n_urls, n_docs): the
    blocklist-reconnaissance pass; distributed as per-batch partial counts
    + one (domain)-keyed group-sum exchange. The driver testdata contains
    no URLs, which made the r4 oracle check vacuously green (0 vs 0 rows —
    VERDICT r4 #3), so the query derives a deterministic URL-bearing text
    column from doc_id INSIDE both the engine input and the oracle CTE
    (the lsh_topk baked-constant precedent): every doc gains one
    ``http://site<id%37>.example.com`` URL and every third doc a second
    ``https://cdn<id%11>.example.org`` one, exercising the extractor,
    the per-domain sums and the distinct-doc counts on real rows."""
    from statefulstreamprocessor_ray.stages.curation import url_domain_stats

    def with_urls(b: pd.DataFrame) -> pd.DataFrame:
        ids = pd.Series(
            np.asarray(b["doc_id"], np.int64), index=b.index
        )
        text = (
            b["text"].fillna("")
            + " http://site"
            + (ids % 37).astype(str)
            + ".example.com/d"
            + ids.astype(str)
        )
        second = " https://cdn" + (ids % 11).astype(str) + ".example.org/x"
        text = text + second.where(ids % 3 == 0, "")
        return pd.DataFrame({"doc_id": ids, "text": text})

    docs = _documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        with_urls, batch_format="pandas"
    )
    schema = pa.schema(
        [("domain", pa.string()), ("n_urls", pa.int64()), ("n_docs", pa.int64())]
    )
    df = url_domain_stats(docs).to_pandas()
    if df.empty:
        return schema.empty_table()
    return pa.Table.from_pandas(df, schema=schema, preserve_index=False)


def q_tfidf_top_terms(sf_dir):
    """Per-doc top-5 TF-IDF terms: two linear keyed exchanges (by term to
    attach df, by doc for top-k), no vocabulary broadcast; scores rounded
    to 6 decimals before ranking so ties break deterministically."""
    from statefulstreamprocessor_ray.stages.text import tfidf_top_terms

    return tfidf_top_terms(
        _documents(sf_dir, columns=["doc_id", "text"]), top_k=5
    )


# Probe queries for the BM25 retrieval entry — fixed literals shared
# byte-for-byte with the oracle's VALUES list (the lsh_topk baked-constant
# precedent); terms drawn from the testdata generator's vocabulary so the
# check is non-vacuous at every sf.
BM25_QUERIES = (
    "sort merge join",
    "window agg scan",
    "fast key order",
    "group query value",
)


def q_bm25_topk(sf_dir):
    """Per-query top-10 docs by Okapi BM25 (Lucene idf). Per-term scores
    are quantized to integer micro-units before the distributed
    (query, doc) sum — int64 addition is associative, so partition order
    provably cannot flip the oracle comparison (bigram precedent)."""
    from statefulstreamprocessor_ray.stages.text import bm25_topk

    return bm25_topk(
        _documents(sf_dir, columns=["doc_id", "text"]),
        queries=list(BM25_QUERIES),
        top_k=10,
    )


def q_bigram_surprisal(sf_dir):
    """Per-doc bigram-LM surprisal vs the corpus's own statistics (KenLM-
    style fluency signal). Per-bigram surprisal is quantized to integer
    micro-nats BEFORE summing so the distributed sum is exact int64 —
    float sums are addition-order-dependent and unprovable vs an oracle."""
    from statefulstreamprocessor_ray.stages.text import bigram_surprisal

    return bigram_surprisal(_documents(sf_dir, columns=["doc_id", "text"]))


def q_ngram_containment(sf_dir):
    """Overlap-coefficient pairs (inter/min(|A|,|B|) >= 0.8): the
    partial-copy/excerpt detector — high containment at low Jaccard marks
    a small doc embedded in a big one."""
    return dedup.ngram_containment_pairs(
        _documents(sf_dir, columns=["doc_id", "text"]), threshold=0.8, k=3
    )


def q_text_stats(sf_dir):
    """fingerprint_mode="md5" pins the oracle-reproducible fingerprint
    (DuckDB md5()); the default "sip" mode (vectorized content_hash128 hex,
    the corpus-scale path) is differential-tested in test_extensions.py."""
    return analyze_text(
        _documents(sf_dir, columns=["doc_id", "text"]), fingerprint_mode="md5"
    )


def q_multimodal_decode(sf_dir):
    docs = _documents(sf_dir, columns=["doc_id", "text"])
    with_payload = multimodal.attach_binary_payload(docs)
    return multimodal.decode_media(with_payload, mode="fake")


def q_multimodal_pipeline(sf_dir):
    """Full multimodal chain: attach binary -> decode -> resize -> frame
    sample (1->N explode) -> feature extract; actor-pool stages with small
    batches, deterministic fakes in the codec slots."""
    docs = _documents(sf_dir, columns=["doc_id", "text"])
    ds = multimodal.attach_binary_payload(docs)
    # autoscaling pools, floor 1: chained actor pools that RESERVE more CPUs
    # than the session has starve their own producer tasks (deadlocks a 4-CPU
    # Ray session; see text.py's sizing note), so the old shape pinned
    # concurrency=1 — but a pin caps a 32-CPU node at one actor per stage.
    # (1, cpus//4) keeps the floor as the deadlock guard, not the ceiling:
    # each of the chained stages may claim at most a quarter of the cluster,
    # leaving headroom for the producer tasks.
    pool = (1, max(1, int(ray.cluster_resources().get("CPU", 4)) // 4))
    ds = multimodal.decode_media(ds, mode="fake", concurrency=pool)
    ds = ds.map_batches(
        multimodal.ResizeStage,
        fn_constructor_kwargs={"target_w": 32},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=pool,
        num_cpus=1,
    )
    ds = ds.map_batches(
        multimodal.FrameSampleStage(step=2), batch_format="pyarrow", batch_size=256
    )
    ds = ds.map_batches(
        multimodal.FeatureExtractStage(), batch_format="pyarrow", batch_size=256
    )
    return ds.select_columns(
        ["doc_id", "out_w", "out_h", "frame_idx", "f0", "f1", "f2", "f3"]
    )


def q_embedding_dup(sf_dir):
    # synthetic embeddings are near-orthogonal; 0.4 marks the "near-dup" tail
    return dedup.embedding_dup_pairs(_embeddings(sf_dir), threshold=0.4)


def q_ann_topk(sf_dir):
    return similarity.brute_force_topk(
        _embeddings(sf_dir), query_ids=[0, 1, 2, 3, 4], k=10
    )


# rows-only (non-SQL-expressible) ------------------------------------------


def q_lsb_join_events(sf_dir):
    tagged = _tag_events(sf_dir)
    return ordered_join_events(
        tagged,
        key_col="user_id",
        ts_col="ts",
        tie_col="event_id",
        payload_cols=("event_id", "value"),
        delta_time=3600.0,
    )


def q_flagship_transcripts(sf_dir):
    """The flagship transcript join, SQL-checked end-to-end: events are
    adapted to transcripts (same mapping as the engine's adapter, expressed
    in SQL) and the closed-form ordered-join oracle runs over the sessionless
    composite; Arrow's shortest-repr float formatting is matched by stripping
    DuckDB's trailing '.0'."""
    out = flagship_join(transcripts_from_events(sf_dir), delta_time=3600.0)

    def proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": b["conv_id"],
                "r_ts_us": pc.cast(pc.cast(b["r_ts"], pa.timestamp("us")), pa.int64()),
                "r_turn_idx": pc.cast(b["r_turn_idx"], pa.int64()),
                "r_text": b["r_text"],
                "s_ts_us": pc.cast(pc.cast(b["s_ts"], pa.timestamp("us")), pa.int64()),
                "s_turn_idx": pc.cast(b["s_turn_idx"], pa.int64()),
                "s_text": b["s_text"],
                "s_tool": b["s_tool"],
                "join_case": b["join_case"],
                "emit_seq": b["emit_seq"],
            }
        )

    return out.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)


def q_lsb_join_sql(sf_dir):
    """The flagship ordered-join semantics, SQL-checked: on a tie-free stream
    the closed form (state/vectorized.py) is expressible with window functions
    (JS2 fires only on timestamp ties, so it contributes nothing here)."""
    out = q_lsb_join_events(sf_dir)

    def proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "r_ts_us": pc.cast(pc.cast(b["r_ts"], pa.timestamp("us")), pa.int64()),
                "r_event_id": pc.cast(b["r_event_id"], pa.int64()),
                "r_value": b["r_value"],
                "s_ts_us": pc.cast(pc.cast(b["s_ts"], pa.timestamp("us")), pa.int64()),
                "s_event_id": pc.cast(b["s_event_id"], pa.int64()),
                "s_value": b["s_value"],
                "join_case": b["join_case"],
                "emit_seq": b["emit_seq"],
            }
        )

    return out.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)


def q_session_join(sf_dir):
    """Session-bounded ordered join (assistant ⋈ tool within a session
    window) — SQL-checked: the lsb closed form partitioned by the
    sessionized composite key."""
    tagged = _tag_events(sf_dir)
    out = session_bounded_join(
        tagged,
        gap_s=2 * 3600.0,
        key_col="user_id",
        ts_col="ts",
        tie_col="event_id",
        payload_cols=("event_id", "value"),
    )

    def proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "session_id": pc.cast(b["session_id"], pa.int64()),
                "r_ts_us": pc.cast(pc.cast(b["r_ts"], pa.timestamp("us")), pa.int64()),
                "r_event_id": pc.cast(b["r_event_id"], pa.int64()),
                "r_value": b["r_value"],
                "s_ts_us": pc.cast(pc.cast(b["s_ts"], pa.timestamp("us")), pa.int64()),
                "s_event_id": pc.cast(b["s_event_id"], pa.int64()),
                "s_value": b["s_value"],
                "join_case": b["join_case"],
                "emit_seq": b["emit_seq"],
            }
        )

    return out.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)


def q_dedup_apply(sf_dir):
    docs = _documents(sf_dir, columns=["doc_id", "text"])
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5, k=3)
    clusters = dedup.cluster_duplicates(pairs)
    return dedup.apply_dedup(docs, clusters).select_columns(["doc_id", "text"])


def q_minhash_lsh(sf_dir):
    return dedup.minhash_lsh_pairs(
        _documents(sf_dir, columns=["doc_id", "text"]), threshold=0.5
    )


def q_simhash(sf_dir):
    """SimHash near-dup pairs, SQL-checked end-to-end: hash_fn='md5' makes
    the shingle hash DuckDB-reproducible (md5_number_lower), so the oracle
    recomputes codes, 16-bit-band blocking (complete for hamming <= 3 by
    pigeonhole) and the XOR/popcount verify entirely in SQL. The default
    SipHash path (faster; same pipeline shape) is differential-tested in
    pytest."""
    return dedup.simhash_pairs(
        _documents(sf_dir, columns=["doc_id", "text"]), max_hamming=3, hash_fn="md5"
    )


def q_lsh_topk(sf_dir):
    """Hyperplane-LSH pruned top-k, SQL-checked end-to-end: the planes are a
    fixed deterministic matrix (seed 13) whose values are baked into the
    oracle as constants, so DuckDB recomputes bucket bits, the Hamming-radius
    candidate rule and the candidate-restricted top-k exactly."""
    return similarity.lsh_topk(_embeddings(sf_dir), query_ids=[0, 1, 2, 3, 4], k=10)


def q_ivf_topk(sf_dir):
    """IVF pruned top-k with closed-form centroids (normalized corpus rows
    0..15), SQL-checked end-to-end: assignment, nprobe probing and the
    candidate-restricted top-k are all recomputed by the oracle."""
    return similarity.ivf_topk(
        _embeddings(sf_dir),
        query_ids=[0, 1, 2, 3, 4],
        k=10,
        nprobe=4,
        centroid_ids=list(range(16)),
    )


def q_heavy_hitters(sf_dir):
    """Top-10 tokens via capacity-bounded SpaceSaving partials. The driver
    testdata's vocabulary (31 words) sits far under the default capacity, so
    the merged result is EXACT with err_bound 0 — exactly what the oracle's
    plain top-k recomputes; truncation/error-bound mechanics are covered by
    tests/test_sketch.py on a high-cardinality synthetic corpus."""
    from statefulstreamprocessor_ray.stages import sketch

    return sketch.heavy_hitters(_documents(sf_dir, columns=["text"]), k=10)


def q_distinct_count(sf_dir):
    """Per-event-type distinct users via the sparse-exact/dense-HLL summary.
    Driver testdata stays in the sparse regime (≤1500 users per type at
    sf0.1) so the answer is exact COUNT(DISTINCT); the dense-estimate path
    is accuracy-tested in tests/test_sketch.py."""
    from statefulstreamprocessor_ray.stages import sketch

    return sketch.distinct_count(
        _events(sf_dir, columns=["event_type", "user_id"]),
        col="user_id",
        group_col="event_type",
    )


def q_streaming_distinct(sf_dir):
    """Streaming distinct-count: the events table replayed as 3
    event_id-ordered arrival epochs through StreamingDistinctJob — per-shard
    sketch state across epochs, one cumulative per-group snapshot row emitted
    exactly once per epoch. The oracle recomputes the same epoch slicing
    (rank thirds by event_id) and each epoch's prefix COUNT(DISTINCT)."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from statefulstreamprocessor_ray.pipelines.streaming_sketch import (
        StreamingDistinctConfig,
        StreamingDistinctJob,
    )
    from statefulstreamprocessor_ray.sinks.exactly_once import ExactlyOnceParquetSink

    base = _workspace("sdistinct", "events", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    inp = f"{base}/input"
    os.makedirs(inp)
    tbl = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "user_id"]
    )
    tbl = tbl.sort_by("event_id")
    n = tbl.num_rows
    for i in range(3):
        lo, hi = i * n // 3, (i + 1) * n // 3
        pq.write_table(tbl.slice(lo, hi - lo), f"{inp}/part-{i:03d}.parquet")
    cfg = StreamingDistinctConfig(
        input_path=inp, work_dir=f"{base}/work", out_dir=f"{base}/out", n_shards=4
    )
    StreamingDistinctJob(cfg).run()
    return ExactlyOnceParquetSink(f"{base}/out").read_committed().select_columns(
        ["epoch", "event_type", "n_distinct"]
    )


def q_streaming_window_functions(sf_dir):
    """Streaming window functions: the events table replayed as 3
    event_id-ordered arrival epochs through StreamingWindowFnJob — fixed-size
    per-key state (count, modular cumulative sum, last ts/value, trailing
    ring) carried across epochs, each epoch's per-row window outputs emitted
    exactly once. The oracle recomputes the same epoch slicing and windows
    over the total arrival order (epoch, ts, event_id)."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from statefulstreamprocessor_ray.pipelines.streaming_analytic import (
        StreamingWindowFnConfig,
        StreamingWindowFnJob,
    )
    from statefulstreamprocessor_ray.sinks.exactly_once import ExactlyOnceParquetSink

    base = _workspace("swindowfn", "events", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    inp = f"{base}/input"
    os.makedirs(inp)
    tbl = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    tbl = tbl.sort_by("event_id")
    n = tbl.num_rows
    for i in range(3):
        lo, hi = i * n // 3, (i + 1) * n // 3
        pq.write_table(tbl.slice(lo, hi - lo), f"{inp}/part-{i:03d}.parquet")
    cfg = StreamingWindowFnConfig(
        input_path=inp, work_dir=f"{base}/work", out_dir=f"{base}/out", n_shards=4
    )
    StreamingWindowFnJob(cfg).run()
    return ExactlyOnceParquetSink(f"{base}/out").read_committed().select_columns(
        [
            "epoch",
            "event_id",
            "user_id",
            "rn",
            "prev_value",
            "delta_us",
            "cum_micro",
            "roll4_micro",
        ]
    )


def q_streaming_compaction(sf_dir):
    """Streaming CDC/upsert compaction: after each arrival epoch, emit the
    CURRENT latest full row per key for every key touched in that epoch —
    the continuously-maintained changelog form of latest_per_key. Fixed-size
    per-key state, exactly-once manifests."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from statefulstreamprocessor_ray.pipelines.streaming_analytic import (
        StreamingCompactionJob,
        StreamingWindowFnConfig,
    )
    from statefulstreamprocessor_ray.sinks.exactly_once import ExactlyOnceParquetSink

    base = _workspace("scompact", "events", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    inp = f"{base}/input"
    os.makedirs(inp)
    tbl = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    tbl = tbl.sort_by("event_id")
    n = tbl.num_rows
    for i in range(3):
        lo, hi = i * n // 3, (i + 1) * n // 3
        pq.write_table(tbl.slice(lo, hi - lo), f"{inp}/part-{i:03d}.parquet")
    cfg = StreamingWindowFnConfig(
        input_path=inp, work_dir=f"{base}/work", out_dir=f"{base}/out", n_shards=4
    )
    StreamingCompactionJob(cfg).run()
    return ExactlyOnceParquetSink(f"{base}/out").read_committed().select_columns(
        ["epoch", "event_id", "user_id", "ts", "event_type", "value"]
    )


def q_streaming_quantiles(sf_dir):
    """Streaming quantiles: the events table replayed as 3 event_id-ordered
    arrival epochs through StreamingQuantileJob — per-group weighted-sample
    summaries on group-hash shards across epochs, one cumulative
    (group, q) snapshot row emitted exactly once per epoch. Driver data
    stays under the summary limit, so every snapshot selects the exact
    quantile_disc element (err_bound provably 0, the oracle asserts it);
    compaction mechanics are covered by tests/test_streaming_sketch.py."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from statefulstreamprocessor_ray.pipelines.streaming_sketch import (
        StreamingQuantileConfig,
        StreamingQuantileJob,
    )
    from statefulstreamprocessor_ray.sinks.exactly_once import ExactlyOnceParquetSink

    base = _workspace("squantile", "events", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    inp = f"{base}/input"
    os.makedirs(inp)
    tbl = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    tbl = tbl.sort_by("event_id")
    n = tbl.num_rows
    for i in range(3):
        lo, hi = i * n // 3, (i + 1) * n // 3
        pq.write_table(tbl.slice(lo, hi - lo), f"{inp}/part-{i:03d}.parquet")
    cfg = StreamingQuantileConfig(
        input_path=inp, work_dir=f"{base}/work", out_dir=f"{base}/out", n_shards=4
    )
    StreamingQuantileJob(cfg).run()
    return ExactlyOnceParquetSink(f"{base}/out").read_committed().select_columns(
        ["epoch", "event_type", "q", "value", "err_bound"]
    )


def q_streaming_topk(sf_dir):
    """Streaming top-k tokens: documents replayed as 3 doc_id-ordered
    arrival epochs through StreamingTopKJob — per-shard SpaceSaving count
    state across epochs, one cumulative top-10 snapshot emitted exactly once
    per epoch. The driver vocabulary (31 words) sits far under capacity, so
    every snapshot is exact with err_bound 0 — what the oracle's per-epoch
    prefix top-k recomputes; truncation mechanics are covered by
    tests/test_streaming_sketch.py."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from statefulstreamprocessor_ray.pipelines.streaming_sketch import (
        StreamingTopKConfig,
        StreamingTopKJob,
    )
    from statefulstreamprocessor_ray.sinks.exactly_once import ExactlyOnceParquetSink

    base = _workspace("stopk", "docs", sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    inp = f"{base}/input"
    os.makedirs(inp)
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    tbl = tbl.sort_by("doc_id")
    n = tbl.num_rows
    for i in range(3):
        lo, hi = i * n // 3, (i + 1) * n // 3
        pq.write_table(tbl.slice(lo, hi - lo), f"{inp}/part-{i:03d}.parquet")
    cfg = StreamingTopKConfig(
        input_path=inp, work_dir=f"{base}/work", out_dir=f"{base}/out",
        n_shards=4, k=10,
    )
    StreamingTopKJob(cfg).run()
    return ExactlyOnceParquetSink(f"{base}/out").read_committed().select_columns(
        ["epoch", "item", "n", "err_bound"]
    )


def q_quantiles(sf_dir):
    """Per-event-type discrete quantiles of value via the mergeable
    weighted-sample summary. Driver testdata stays under the summary limit
    (≤20k values per type at sf0.1) so every reported quantile selects the
    exact quantile_disc element; compaction error bounds are covered by
    tests/test_sketch.py."""
    from statefulstreamprocessor_ray.stages import sketch

    return sketch.quantile_sketch(
        _events(sf_dir, columns=["event_type", "value"]),
        col="value",
        group_col="event_type",
        qs=(0.25, 0.5, 0.9),
    )


QUERIES = {
    "filter_prefix": q_filter_prefix,
    "explode": q_explode,
    "ts_normalize": q_ts_normalize,
    "key_suffix": q_key_suffix,
    "wordcount": q_wordcount,
    "heavy_hitters": q_heavy_hitters,
    "distinct_count": q_distinct_count,
    "quantiles": q_quantiles,
    "streaming_distinct": q_streaming_distinct,
    "streaming_topk": q_streaming_topk,
    "streaming_quantiles": q_streaming_quantiles,
    "clamp_level": q_clamp_level,
    "order_check": q_order_check,
    "groupby_count": q_groupby_count,
    "tumbling_agg": q_tumbling_agg,
    "sliding_agg": q_sliding_agg,
    "session_windows": q_session_windows,
    "windowed_join": q_windowed_join,
    "windowed_join_sliding": q_windowed_join_sliding,
    "asof_join": q_asof_join,
    "cep_funnel": q_cep_funnel,
    "cep_funnel_skip": q_cep_funnel_skip,
    "cep_absence": q_cep_absence,
    "streaming_cep_funnel": q_streaming_cep_funnel,
    "streaming_cep_absence": q_streaming_cep_absence,
    "streaming_tumbling_agg": q_streaming_tumbling_agg,
    "streaming_sliding_agg": q_streaming_sliding_agg,
    "streaming_session_windows": q_streaming_session_windows,
    "dedup_exact": q_dedup_exact,
    "ngram_jaccard": q_ngram_jaccard,
    "ngram_containment": q_ngram_containment,
    "url_domains": q_url_domains,
    "tfidf_top_terms": q_tfidf_top_terms,
    "bigram_surprisal": q_bigram_surprisal,
    "bm25_topk": q_bm25_topk,
    "stratified_sample": q_stratified_sample,
    "chunk_documents": q_chunk_documents,
    "pack_sequences": q_pack_sequences,
    "render_conversations": q_render_conversations,
    "streaming_dedup": q_streaming_dedup,
    "streaming_minhash": q_streaming_minhash,
    "weighted_repeat": q_weighted_repeat,
    "scrub_text": q_scrub_text,
    "repetition_stats": q_repetition_stats,
    "percentile_filter": q_percentile_filter,
    "group_sample_k": q_group_sample_k,
    "group_centroids": q_group_centroids,
    "streaming_window_functions": q_streaming_window_functions,
    "streaming_compaction": q_streaming_compaction,
    "latest_per_key": q_latest_per_key,
    "group_checksum": q_group_checksum,
    "histogram": q_histogram,
    "rollup_aggregate": q_rollup_aggregate,
    "cube_aggregate": q_cube_aggregate,
    "group_comoments": q_group_comoments,
    "pricing_summary": q_pricing_summary,
    "shipping_priority": q_shipping_priority,
    "local_supplier_volume": q_local_supplier_volume,
    "window_functions": q_window_functions,
    "percent_rank": q_percent_rank,
    "pivot_event_counts": q_pivot_event_counts,
    "group_moments": q_group_moments,
    "topk_per_group": q_topk_per_group,
    "doc_embedding_join": q_doc_embedding_join,
    "intersect_pairs": q_intersect_pairs,
    "except_pairs": q_except_pairs,
    "multikey_join": q_multikey_join,
    "outer_join": q_outer_join,
    "semi_join": q_semi_join,
    "anti_join": q_anti_join,
    "decontaminate": q_decontaminate,
    "text_stats": q_text_stats,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_pipeline": q_multimodal_pipeline,
    "embedding_dup": q_embedding_dup,
    "ann_topk": q_ann_topk,
    "lsb_join_events": q_lsb_join_events,
    "lsb_join_sql": q_lsb_join_sql,
    "flagship_transcripts": q_flagship_transcripts,
    "session_join": q_session_join,
    "dedup_apply": q_dedup_apply,
    "corpus_build": q_corpus_build,
    "corpus_build_packed": q_corpus_build_packed,
    "streaming_corpus": q_streaming_corpus,
    "minhash_lsh": q_minhash_lsh,
    "simhash": q_simhash,
    "lsh_topk": q_lsh_topk,
    "ivf_topk": q_ivf_topk,
}


# shared core of the lsb ordered-join oracles: tag purchase/click as the two
# sides, closed-form JR1/JR2 candidate generation with window functions
# (state/vectorized.py's SQL twin; tie-free cross-side ts assumed, which the
# driver testdata satisfies)
_LSB_EVENTS_CORE = """
WITH u AS (
  SELECT user_id, epoch_us(ts) AS tu, event_id, value,
         CASE WHEN event_type='purchase' THEN 0 ELSE 1 END AS side
  FROM events WHERE event_type IN ('purchase','click')
), x AS (
  SELECT *, lag(tu) OVER (PARTITION BY user_id, side ORDER BY tu, event_id) AS tp FROM u
), cand AS (
  SELECT x.user_id,
         x.tu AS x_tu, x.event_id AS x_id, x.value AS x_val, x.side AS x_side, x.tp,
         y.tu AS y_tu, y.event_id AS y_id, y.value AS y_val,
         row_number() OVER (PARTITION BY x.user_id, x.event_id
                            ORDER BY y.tu, y.event_id) AS rnk
  FROM x JOIN u y
    ON y.user_id = x.user_id AND y.side = 1 - x.side
   AND y.tu < x.tu
   AND (x.tp IS NULL OR y.tu > x.tp)
), jr2 AS (
  SELECT user_id, x_tu AS trig_tu, x_id AS trig_id, 1 AS case_rank, rnk, 'JR2' AS join_case,
         x_side, x_tu AS piv_tu, x_id AS piv_id, x_val AS piv_val, y_tu, y_id, y_val
  FROM cand WHERE ABS(x_tu - y_tu) <= 3600000000
), jr1 AS (
  SELECT c.user_id, c.x_tu AS trig_tu, c.x_id AS trig_id, 0 AS case_rank, c.rnk,
         'JR1' AS join_case, c.x_side,
         p.tu AS piv_tu, p.event_id AS piv_id, p.value AS piv_val,
         c.y_tu, c.y_id, c.y_val
  FROM cand c JOIN u p
    ON p.user_id = c.user_id AND p.side = c.x_side AND p.tu = c.tp
  WHERE c.rnk > 1 AND ABS(p.tu - c.y_tu) <= 3600000000
), pairs AS (
  SELECT * FROM jr2 UNION ALL SELECT * FROM jr1
)
"""

ORACLE_SQL = {
    "filter_prefix": "SELECT * FROM events WHERE event_type LIKE 'p%'",
    "explode": """
SELECT event_id, 'value' AS quantity, CAST(value AS DOUBLE) AS result FROM events
UNION ALL
SELECT event_id, 'k' AS quantity, CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS DOUBLE) AS result FROM events
""",
    "ts_normalize": """
SELECT event_id, CAST(epoch_us(ts) AS DOUBLE)/1000/1000 AS ts_sec FROM events
""",
    "key_suffix": """
SELECT doc_id, source, right(source, 3) AS group_key FROM documents
""",
    "wordcount": """
SELECT word, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT unnest(list_filter(string_split_regex(lower(coalesce(text,'')), '\\s+'), x -> x <> '')) AS word
  FROM documents
) GROUP BY word
""",
    "clamp_level": """
SELECT event_id, LEAST(ABS(value), 20000.0) AS clamped,
       CAST(FLOOR(LEAST(ABS(value), 20000.0)/20000.1*5) AS INT) AS level
FROM events
""",
    "order_check": """
SELECT user_id, CAST(coalesce(SUM(CASE WHEN ts < prev_ts THEN 1 ELSE 0 END), 0) AS BIGINT) AS violations
FROM (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts FROM events)
GROUP BY user_id
""",
    "groupby_count": """
SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY event_type
""",
    "tumbling_agg": """
SELECT user_id, (epoch_us(ts)//3600000000)*3600000000 AS window_start_us,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value*100+0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY 1, 2
""",
    "sliding_agg": """
SELECT user_id, (epoch_us(ts)//900000000 - t.i)*900000000 AS window_start_us,
       CAST(count(*) AS BIGINT) AS n
FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) AS t(i)
GROUP BY 1, 2
""",
    "session_windows": """
WITH o AS (
  SELECT user_id, epoch_us(ts) AS tu,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev
  FROM events
), f AS (
  SELECT user_id, tu,
         CASE WHEN prev IS NULL OR tu - prev > 14400000000 THEN 1 ELSE 0 END AS is_new
  FROM o
), g AS (
  SELECT user_id, tu,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY tu ROWS UNBOUNDED PRECEDING) - 1 AS session_id
  FROM f
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       min(tu) AS session_start_us, max(tu) AS session_end_us,
       CAST(count(*) AS BIGINT) AS n_rows
FROM g GROUP BY 1, 2
""",
    "windowed_join": """
WITH w AS (
  SELECT user_id, event_id, value, event_type, epoch_us(ts) AS tu,
         (epoch_us(ts)//3600000000)*3600000000 AS window_start_us
  FROM events WHERE event_type IN ('purchase','click')
), o AS (
  SELECT user_id, window_start_us, tu,
    first_value(CASE WHEN event_type='purchase' THEN value END IGNORE NULLS)
      OVER w2 AS next_l,
    first_value(CASE WHEN event_type='purchase' THEN tu END IGNORE NULLS)
      OVER w2 AS next_l_ts,
    first_value(CASE WHEN event_type='click' THEN value END IGNORE NULLS)
      OVER w2 AS next_r,
    first_value(CASE WHEN event_type='click' THEN tu END IGNORE NULLS)
      OVER w2 AS next_r_ts
  FROM w
  WINDOW w2 AS (PARTITION BY user_id, window_start_us ORDER BY tu, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, window_start_us, LEAST(next_l_ts, next_r_ts) AS ts_us,
       LEAST(ABS(2*PI()/60 * next_l * next_r), 20000.0) AS result,
       CAST(FLOOR(LEAST(ABS(2*PI()/60 * next_l * next_r), 20000.0)/20000.1*5) AS INT) AS level
FROM o WHERE next_l IS NOT NULL AND next_r IS NOT NULL
""",
    "windowed_join_sliding": """
WITH w AS (
  SELECT e.user_id, e.event_id, e.value, e.event_type, epoch_us(e.ts) AS tu,
         (epoch_us(e.ts)//1800000000 - t.i)*1800000000 AS window_start_us
  FROM events e CROSS JOIN (VALUES (0),(1),(2),(3)) AS t(i)
  WHERE e.event_type IN ('purchase','click')
), o AS (
  SELECT user_id, window_start_us, tu,
    first_value(CASE WHEN event_type='purchase' THEN value END IGNORE NULLS)
      OVER w2 AS next_l,
    first_value(CASE WHEN event_type='purchase' THEN tu END IGNORE NULLS)
      OVER w2 AS next_l_ts,
    first_value(CASE WHEN event_type='click' THEN value END IGNORE NULLS)
      OVER w2 AS next_r,
    first_value(CASE WHEN event_type='click' THEN tu END IGNORE NULLS)
      OVER w2 AS next_r_ts
  FROM w
  WINDOW w2 AS (PARTITION BY user_id, window_start_us ORDER BY tu, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, window_start_us, LEAST(next_l_ts, next_r_ts) AS ts_us,
       LEAST(ABS(2*PI()/60 * next_l * next_r), 20000.0) AS result,
       CAST(FLOOR(LEAST(ABS(2*PI()/60 * next_l * next_r), 20000.0)/20000.1*5) AS INT) AS level
FROM o WHERE next_l IS NOT NULL AND next_r IS NOT NULL
""",
    "asof_join": """
WITH u AS (
  SELECT user_id, epoch_us(ts) AS tu, event_id, value, event_type
  FROM events WHERE event_type IN ('purchase','click')
), o AS (
  SELECT *,
    last_value(CASE WHEN event_type='click' THEN value END IGNORE NULLS) OVER w AS r_value,
    last_value(CASE WHEN event_type='click' THEN tu END IGNORE NULLS) OVER w AS r_ts_us
  FROM u
  WINDOW w AS (PARTITION BY user_id
               ORDER BY tu, CASE WHEN event_type='click' THEN 0 ELSE 1 END, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, tu AS l_ts_us, CAST(event_id AS BIGINT) AS l_event_id,
       value AS l_value, r_ts_us, r_value
FROM o WHERE event_type='purchase'
""",
    "cep_funnel": """
WITH b AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS tu FROM events
), o AS (
  SELECT user_id, event_id, event_type, tu,
         lead(event_type, 1) OVER w AS e1,
         lead(event_type, 2) OVER w AS e2,
         lead(tu, 2) OVER w AS t2,
         lead(event_id, 2) OVER w AS i2
  FROM b
  WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)
)
SELECT user_id, tu AS start_ts_us, t2 AS end_ts_us,
       CAST(event_id AS BIGINT) AS start_event_id,
       CAST(i2 AS BIGINT) AS end_event_id,
       t2 - tu AS span_us
FROM o
WHERE event_type = 'view' AND e1 = 'click' AND e2 = 'purchase'
  AND t2 - tu <= 172800000000
""",
    "streaming_tumbling_agg": """
SELECT user_id, (epoch_us(ts)//3600000000)*3600000000 AS window_start_us,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value*100+0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY 1, 2
""",
    "cep_absence": """
SELECT a.user_id, epoch_us(a.ts) AS ts_us, CAST(a.event_id AS BIGINT) AS event_id,
       epoch_us(a.ts) + 86400000000 AS deadline_us
FROM events a
WHERE a.event_type = 'purchase'
  AND NOT EXISTS (
    SELECT 1 FROM events b
    WHERE b.user_id = a.user_id AND b.event_type = 'error'
      AND (epoch_us(b.ts) > epoch_us(a.ts)
           OR (epoch_us(b.ts) = epoch_us(a.ts) AND b.event_id > a.event_id))
      AND epoch_us(b.ts) - epoch_us(a.ts) <= 86400000000
  )
""",
    # streaming CEP variants produce identical final outputs to the batch
    # operators; same oracles
    "streaming_cep_funnel": None,  # filled below
    "streaming_cep_absence": None,  # filled below
    "streaming_sliding_agg": """
SELECT user_id, (epoch_us(ts)//900000000 - t.i)*900000000 AS window_start_us,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value*100+0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) AS t(i)
GROUP BY 1, 2
""",
    "streaming_session_windows": """
WITH o AS (
  SELECT user_id, epoch_us(ts) AS tu, CAST(floor(value*100+0.5) AS BIGINT) AS cents,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev
  FROM events
), f AS (
  SELECT user_id, tu, cents,
         CASE WHEN prev IS NULL OR tu - prev > 14400000000 THEN 1 ELSE 0 END AS is_new
  FROM o
), g AS (
  SELECT user_id, tu, cents,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY tu ROWS UNBOUNDED PRECEDING) AS sid
  FROM f
)
SELECT user_id, min(tu) AS session_start_us, max(tu) AS session_end_us,
       CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents
FROM g GROUP BY user_id, sid
""",
    "cep_funnel_skip": """
WITH b AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS tu FROM events
), v AS (SELECT * FROM b WHERE event_type = 'view'),
   c AS (SELECT * FROM b WHERE event_type = 'click'),
   p AS (SELECT * FROM b WHERE event_type = 'purchase'),
vc AS (
  SELECT v.user_id, v.event_id AS v_id, v.tu AS v_tu,
         c.event_id AS c_id, c.tu AS c_tu
  FROM v JOIN c ON c.user_id = v.user_id
   AND (c.tu > v.tu OR (c.tu = v.tu AND c.event_id > v.event_id))
  QUALIFY row_number() OVER (PARTITION BY v.user_id, v.event_id
                             ORDER BY c.tu, c.event_id) = 1
),
vcp AS (
  SELECT vc.user_id, vc.v_id, vc.v_tu, p.event_id AS p_id, p.tu AS p_tu
  FROM vc JOIN p ON p.user_id = vc.user_id
   AND (p.tu > vc.c_tu OR (p.tu = vc.c_tu AND p.event_id > vc.c_id))
  QUALIFY row_number() OVER (PARTITION BY vc.user_id, vc.v_id
                             ORDER BY p.tu, p.event_id) = 1
)
SELECT user_id, v_tu AS start_ts_us, p_tu AS end_ts_us,
       CAST(v_id AS BIGINT) AS start_event_id,
       CAST(p_id AS BIGINT) AS end_event_id,
       p_tu - v_tu AS span_us
FROM vcp WHERE p_tu - v_tu <= 172800000000
""",
    "dedup_exact": """
SELECT text, CAST(min(doc_id) AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY text
""",
    "ngram_jaccard": """
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(lower(coalesce(text,'')), '\\s+'), x -> x <> '') AS ws
  FROM documents
), shing AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, unnest(
      CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
           ELSE list_transform(range(1, len(ws)-1), i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2]))
      END) AS g
    FROM t WHERE len(ws) > 0
  )
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM shing a JOIN shing b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), sizes AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY 1)
SELECT doc_a, doc_b,
       CAST(inter AS DOUBLE)/(sa.n + sb.n - inter) AS jaccard
FROM pairs JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(inter AS DOUBLE)/(sa.n + sb.n - inter) >= 0.5
""",
    "lsb_join_sql": _LSB_EVENTS_CORE + """
SELECT user_id,
       CASE WHEN x_side=0 THEN piv_tu ELSE y_tu END AS r_ts_us,
       CAST(CASE WHEN x_side=0 THEN piv_id ELSE y_id END AS BIGINT) AS r_event_id,
       CASE WHEN x_side=0 THEN piv_val ELSE y_val END AS r_value,
       CASE WHEN x_side=0 THEN y_tu ELSE piv_tu END AS s_ts_us,
       CAST(CASE WHEN x_side=0 THEN y_id ELSE piv_id END AS BIGINT) AS s_event_id,
       CASE WHEN x_side=0 THEN y_val ELSE piv_val END AS s_value,
       join_case,
       CAST(row_number() OVER (PARTITION BY user_id
                               ORDER BY trig_tu, trig_id, case_rank, rnk) - 1 AS BIGINT) AS emit_seq
FROM pairs
""",
    # same core as lsb_join_sql (the two queries share the join path; this
    # entry checks the RAW ordered_join_events surface incl. native
    # timestamp columns, which canonicalize to int64 in the compare)
    "lsb_join_events": _LSB_EVENTS_CORE + """
SELECT user_id,
       make_timestamp(CASE WHEN x_side=0 THEN piv_tu ELSE y_tu END) AS r_ts,
       CAST(CASE WHEN x_side=0 THEN piv_id ELSE y_id END AS BIGINT) AS r_event_id,
       CASE WHEN x_side=0 THEN piv_val ELSE y_val END AS r_value,
       make_timestamp(CASE WHEN x_side=0 THEN y_tu ELSE piv_tu END) AS s_ts,
       CAST(CASE WHEN x_side=0 THEN y_id ELSE piv_id END AS BIGINT) AS s_event_id,
       CASE WHEN x_side=0 THEN y_val ELSE piv_val END AS s_value,
       join_case,
       CAST(row_number() OVER (PARTITION BY user_id
                               ORDER BY trig_tu, trig_id, case_rank, rnk) - 1 AS BIGINT) AS emit_seq
FROM pairs
""",
    "flagship_transcripts": """
WITH m AS (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id AS BIGINT) AS turn_idx,
         epoch_us(ts) AS tu,
         event_type || ':' ||
           regexp_replace(CAST(round(value, 2) AS VARCHAR), '\\.0$', '') AS text,
         CASE WHEN event_type = 'error' THEN 'err' END AS tool,
         CASE WHEN event_type IN ('purchase','signup') THEN 0
              WHEN event_type = 'error' THEN 1 END AS side
  FROM events
  WHERE event_type IN ('purchase','signup','error')
), x AS (
  SELECT *, lag(tu) OVER (PARTITION BY conv_id, side ORDER BY tu, turn_idx) AS tp FROM m
), cand AS (
  SELECT x.conv_id,
         x.tu AS x_tu, x.turn_idx AS x_id, x.text AS x_text, x.tool AS x_tool,
         x.side AS x_side, x.tp,
         y.tu AS y_tu, y.turn_idx AS y_id, y.text AS y_text, y.tool AS y_tool,
         row_number() OVER (PARTITION BY x.conv_id, x.turn_idx
                            ORDER BY y.tu, y.turn_idx) AS rnk
  FROM x JOIN m y
    ON y.conv_id = x.conv_id AND y.side = 1 - x.side
   AND y.tu < x.tu
   AND (x.tp IS NULL OR y.tu > x.tp)
), jr2 AS (
  SELECT conv_id, x_tu AS trig_tu, x_id AS trig_id, 1 AS case_rank, rnk,
         'JR2' AS join_case, x_side,
         x_tu AS piv_tu, x_id AS piv_id, x_text AS piv_text, x_tool AS piv_tool,
         y_tu, y_id, y_text, y_tool
  FROM cand WHERE ABS(x_tu - y_tu) <= 3600000000
), jr1 AS (
  SELECT c.conv_id, c.x_tu AS trig_tu, c.x_id AS trig_id, 0 AS case_rank, c.rnk,
         'JR1' AS join_case, c.x_side,
         p.tu AS piv_tu, p.turn_idx AS piv_id, p.text AS piv_text, p.tool AS piv_tool,
         c.y_tu, c.y_id, c.y_text, c.y_tool
  FROM cand c JOIN m p
    ON p.conv_id = c.conv_id AND p.side = c.x_side AND p.tu = c.tp
  WHERE c.rnk > 1 AND ABS(p.tu - c.y_tu) <= 3600000000
), pairs AS (
  SELECT * FROM jr2 UNION ALL SELECT * FROM jr1
)
SELECT conv_id,
       CASE WHEN x_side=0 THEN piv_tu ELSE y_tu END AS r_ts_us,
       CAST(CASE WHEN x_side=0 THEN piv_id ELSE y_id END AS BIGINT) AS r_turn_idx,
       CASE WHEN x_side=0 THEN piv_text ELSE y_text END AS r_text,
       CASE WHEN x_side=0 THEN y_tu ELSE piv_tu END AS s_ts_us,
       CAST(CASE WHEN x_side=0 THEN y_id ELSE piv_id END AS BIGINT) AS s_turn_idx,
       CASE WHEN x_side=0 THEN y_text ELSE piv_text END AS s_text,
       CASE WHEN x_side=0 THEN y_tool ELSE piv_tool END AS s_tool,
       join_case,
       CAST(row_number() OVER (PARTITION BY conv_id
                               ORDER BY trig_tu, trig_id, case_rank, rnk) - 1 AS BIGINT) AS emit_seq
FROM pairs
""",
    "session_join": """
WITH t AS (
  SELECT user_id, epoch_us(ts) AS tu, event_id, value,
         CASE WHEN event_type='purchase' THEN 0 ELSE 1 END AS side
  FROM events WHERE event_type IN ('purchase','click')
), s0 AS (
  SELECT *, lag(tu) OVER (PARTITION BY user_id ORDER BY tu, event_id) AS prev FROM t
), u AS (
  SELECT user_id, tu, event_id, value, side,
         SUM(CASE WHEN prev IS NULL OR tu - prev > 7200000000 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY tu, event_id ROWS UNBOUNDED PRECEDING) - 1 AS sid
  FROM s0
), x AS (
  SELECT *, lag(tu) OVER (PARTITION BY user_id, sid, side ORDER BY tu, event_id) AS tp FROM u
), cand AS (
  SELECT x.user_id, x.sid,
         x.tu AS x_tu, x.event_id AS x_id, x.value AS x_val, x.side AS x_side, x.tp,
         y.tu AS y_tu, y.event_id AS y_id, y.value AS y_val,
         row_number() OVER (PARTITION BY x.user_id, x.sid, x.event_id
                            ORDER BY y.tu, y.event_id) AS rnk
  FROM x JOIN u y
    ON y.user_id = x.user_id AND y.sid = x.sid AND y.side = 1 - x.side
   AND y.tu < x.tu
   AND (x.tp IS NULL OR y.tu > x.tp)
), jr2 AS (
  SELECT user_id, sid, x_tu AS trig_tu, x_id AS trig_id, 1 AS case_rank, rnk,
         'JR2' AS join_case, x_side, x_tu AS piv_tu, x_id AS piv_id, x_val AS piv_val,
         y_tu, y_id, y_val
  FROM cand
), jr1 AS (
  SELECT c.user_id, c.sid, c.x_tu AS trig_tu, c.x_id AS trig_id, 0 AS case_rank, c.rnk,
         'JR1' AS join_case, c.x_side,
         p.tu AS piv_tu, p.event_id AS piv_id, p.value AS piv_val,
         c.y_tu, c.y_id, c.y_val
  FROM cand c JOIN u p
    ON p.user_id = c.user_id AND p.sid = c.sid AND p.side = c.x_side AND p.tu = c.tp
  WHERE c.rnk > 1
), pairs AS (
  SELECT * FROM jr2 UNION ALL SELECT * FROM jr1
)
SELECT user_id, CAST(sid AS BIGINT) AS session_id,
       CASE WHEN x_side=0 THEN piv_tu ELSE y_tu END AS r_ts_us,
       CAST(CASE WHEN x_side=0 THEN piv_id ELSE y_id END AS BIGINT) AS r_event_id,
       CASE WHEN x_side=0 THEN piv_val ELSE y_val END AS r_value,
       CASE WHEN x_side=0 THEN y_tu ELSE piv_tu END AS s_ts_us,
       CAST(CASE WHEN x_side=0 THEN y_id ELSE piv_id END AS BIGINT) AS s_event_id,
       CASE WHEN x_side=0 THEN y_val ELSE piv_val END AS s_value,
       join_case,
       CAST(row_number() OVER (PARTITION BY user_id, sid
                               ORDER BY trig_tu, trig_id, case_rank, rnk) - 1 AS BIGINT) AS emit_seq
FROM pairs
""",
    "dedup_apply": """
WITH RECURSIVE t AS (
  SELECT doc_id, list_filter(string_split_regex(lower(coalesce(text,'')), '\\s+'), x -> x <> '') AS ws
  FROM documents
), shing AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, unnest(
      CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
           ELSE list_transform(range(1, len(ws)-1), i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2]))
      END) AS g
    FROM t WHERE len(ws) > 0
  )
), p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM shing a JOIN shing b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), sizes AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY 1),
dup AS (
  SELECT doc_a, doc_b FROM p JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(inter AS DOUBLE)/(sa.n + sb.n - inter) >= 0.5
),
edges AS (SELECT doc_a AS u, doc_b AS v FROM dup UNION SELECT doc_b, doc_a FROM dup),
labels(doc, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.u, l.lab FROM edges e JOIN labels l ON l.doc = e.v
),
rep AS (SELECT doc, min(lab) AS rep FROM labels GROUP BY doc)
SELECT d.doc_id, d.text FROM documents d JOIN rep ON rep.doc = d.doc_id
WHERE rep.rep = d.doc_id
""",
    "text_stats": langid_sql("documents"),
    "multimodal_decode": """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(octet_length(encode(coalesce(text,''))) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(coalesce(text,''))) % 64 AS BIGINT) AS width,
       CAST((octet_length(encode(coalesce(text,'')))//64) % 64 AS BIGINT) AS height,
       CAST(octet_length(encode(coalesce(text,''))) % 7 + 1 AS BIGINT) AS n_frames
FROM documents
""",
    "multimodal_pipeline": """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         octet_length(encode(coalesce(text,''))) AS n_bytes,
         octet_length(encode(coalesce(text,''))) % 64 AS width,
         (octet_length(encode(coalesce(text,'')))//64) % 64 AS height,
         octet_length(encode(coalesce(text,''))) % 7 + 1 AS n_frames
  FROM documents
), r AS (
  SELECT *, CAST(32 AS BIGINT) AS out_w,
         CAST(GREATEST(1, height * 32 // GREATEST(width, 1)) AS BIGINT) AS out_h
  FROM d
), f AS (
  SELECT doc_id, out_w, out_h, CAST(unnest(range(0, n_frames, 2)) AS BIGINT) AS frame_idx,
         n_bytes
  FROM r
)
SELECT doc_id, out_w, out_h, frame_idx,
       round(CAST((n_bytes * 131) % 997 AS DOUBLE)/997.0, 6) AS f0,
       round(CAST((n_bytes * 313) % 997 AS DOUBLE)/997.0, 6) AS f1,
       round(CAST((n_bytes * 757) % 997 AS DOUBLE)/997.0, 6) AS f2,
       round(CAST((n_bytes * 991) % 997 AS DOUBLE)/997.0, 6) AS f3
FROM f
""",
    # cosine oracles in explicit DOUBLE math (DuckDB's list_cosine_similarity
    # runs in float32); engine and oracle round to 6 dp before compare/rank.
    "embedding_dup": """
WITH e AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
), n AS (
  SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM e GROUP BY vec_id
), d AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(a.v*b.v) AS dot
  FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY 1, 2
), c AS (
  SELECT vec_a, vec_b, dot/(na.nrm*nb.nrm) AS cos
  FROM d JOIN n na ON na.vec_id = vec_a JOIN n nb ON nb.vec_id = vec_b
)
SELECT vec_a, vec_b, round(cos, 6) AS cos_r FROM c WHERE round(cos, 6) >= 0.4
""",
    "ann_topk": """
WITH e AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
), n AS (
  SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM e GROUP BY vec_id
), d AS (
  SELECT q.vec_id AS query_id, e2.vec_id AS neighbor_id, sum(q.v*e2.v) AS dot
  FROM e q JOIN e e2 ON q.i = e2.i
  WHERE q.vec_id IN (0,1,2,3,4)
  GROUP BY 1, 2
), s AS (
  SELECT query_id, neighbor_id,
         round(dot/(nq.nrm*nn.nrm), 6) AS sim_r
  FROM d JOIN n nq ON nq.vec_id = query_id JOIN n nn ON nn.vec_id = neighbor_id
), r AS (
  SELECT query_id, neighbor_id, sim_r,
         row_number() OVER (PARTITION BY query_id ORDER BY sim_r DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, neighbor_id, sim_r, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 10
""",
}


ORACLE_SQL["streaming_cep_funnel"] = ORACLE_SQL["cep_funnel"]
ORACLE_SQL["streaming_cep_absence"] = ORACLE_SQL["cep_absence"]

# minhash_lsh: the engine output is {LSH candidate pairs} ∩ {exact Jaccard >=
# t} — banding recall over this corpus's duplicate pairs is 1.0 under the
# query's fixed (n_perm=64, bands=16, seed=7), asserted against
# ngram_jaccard in tests — so the exact-Jaccard pair set IS the oracle
# (threshold/k match q_minhash_lsh; jaccard_r = rounded verify output).
ORACLE_SQL["minhash_lsh"] = """
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(lower(coalesce(text,'')), '\\s+'), x -> x <> '') AS ws
  FROM documents
), shing AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, unnest(
      CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
           ELSE list_transform(range(1, len(ws)-1), i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2]))
      END) AS g
    FROM t WHERE len(ws) > 0
  )
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM shing a JOIN shing b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), sizes AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY 1)
SELECT doc_a, doc_b,
       round(CAST(inter AS DOUBLE)/(sa.n + sb.n - inter), 6) AS jaccard_r
FROM pairs JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(inter AS DOUBLE)/(sa.n + sb.n - inter) >= 0.5
"""

# simhash (q_simhash uses hash_fn='md5'): the ENTIRE sketch is recomputed in
# SQL — k=2 word shingles, md5_number_lower shingle hashes (the engine's md5
# mode reproduces DuckDB's semantics bit-for-bit: low 8 digest bytes,
# little-endian), per-bit majority votes, 64-bit code assembly, and the
# Hamming <= 3 pair filter via bit_count(xor(...)). The engine's 16-bit-band
# blocking is complete for hamming <= 3 (pigeonhole), so the blocked pair set
# equals this full cross-join's. Docs with no tokens get code 0 (both sides).
ORACLE_SQL["simhash"] = """
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(lower(coalesce(text,'')), '\\s+'), x -> x <> '') AS ws
  FROM documents
), shing AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, unnest(
      CASE WHEN len(ws) < 2 THEN [array_to_string(ws, ' ')]
           ELSE list_transform(range(1, len(ws)), i -> concat(ws[i], ' ', ws[i+1]))
      END) AS g
    FROM t WHERE len(ws) > 0
  )
), h AS (
  SELECT doc_id, md5_number_lower(g) AS hv FROM shing
), bits AS (
  SELECT doc_id, CAST(b.i AS INT) AS bit,
         CASE WHEN (hv >> CAST(b.i AS INT)) & 1 = 1 THEN 1 ELSE -1 END AS vote
  FROM h, (SELECT unnest(range(0, 64)) AS i) b
), votes AS (
  SELECT doc_id, bit, sum(vote) AS v FROM bits GROUP BY 1, 2
), codes0 AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN v >= 0 THEN (CAST(1 AS UBIGINT) << bit) ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS code
  FROM votes GROUP BY doc_id
), codes AS (
  SELECT d.doc_id, coalesce(c.code, CAST(0 AS UBIGINT)) AS code
  FROM documents d LEFT JOIN codes0 c ON c.doc_id = d.doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.code, b.code)) AS INT) AS hamming
FROM codes a JOIN codes b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.code, b.code)) <= 3
"""


def _lsh_topk_oracle_sql() -> str:
    """lsh_topk oracle: the 8 deterministic hyperplanes (seed 13, dim 64 —
    the testdata embedding width) are baked into the SQL as full-precision
    constants (repr round-trips float64 exactly), so DuckDB recomputes bucket
    bits (sign of plane dot; scale-invariant, so raw vectors suffice), the
    Hamming<=1 candidate rule, and the candidate-restricted cosine top-k with
    the engine's (sim_r DESC, neighbor_id) tie-break."""
    rng = np.random.default_rng(13)
    planes = rng.standard_normal((8, 64))
    vals = ",\n    ".join(
        ",".join(f"({pl},{i + 1},{w!r})" for i, w in enumerate(planes[pl]))
        for pl in range(8)
    )
    return f"""
WITH e AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
), p(plane, i, w) AS (
  SELECT * FROM (VALUES {vals})
), dots AS (
  SELECT e.vec_id, p.plane, sum(e.v * p.w) AS d
  FROM e JOIN p ON p.i = e.i GROUP BY 1, 2
), bits AS (
  SELECT vec_id, plane, CASE WHEN d >= 0 THEN 1 ELSE 0 END AS bit FROM dots
), qb AS (
  SELECT vec_id AS query_id, plane, bit FROM bits WHERE vec_id IN (0,1,2,3,4)
), cand AS (
  SELECT q.query_id, b.vec_id AS neighbor_id
  FROM qb q JOIN bits b ON b.plane = q.plane
  GROUP BY 1, 2
  HAVING sum(CASE WHEN q.bit <> b.bit THEN 1 ELSE 0 END) <= 1
), n AS (
  SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM e GROUP BY 1
), d2 AS (
  SELECT c.query_id, c.neighbor_id, sum(q.v * t.v) AS dot
  FROM cand c
  JOIN e q ON q.vec_id = c.query_id
  JOIN e t ON t.vec_id = c.neighbor_id AND t.i = q.i
  GROUP BY 1, 2
), s AS (
  SELECT query_id, neighbor_id, round(dot/(nq.nrm*nn.nrm), 6) AS sim_r
  FROM d2 JOIN n nq ON nq.vec_id = query_id JOIN n nn ON nn.vec_id = neighbor_id
), r AS (
  SELECT query_id, neighbor_id, sim_r,
         row_number() OVER (PARTITION BY query_id ORDER BY sim_r DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, neighbor_id, sim_r, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 10
"""


ORACLE_SQL["lsh_topk"] = _lsh_topk_oracle_sql()

# ivf_topk (closed-form centroids = normalized corpus rows 0..15): the oracle
# recomputes the inverted file — per-row nearest-centroid assignment (argmax
# of dot with NORMALIZED centroids; row norms are rank-invariant so raw row
# vectors suffice), each query's nprobe=4 probed lists, and the
# candidate-restricted cosine top-k with the engine's tie-break.
ORACLE_SQL["ivf_topk"] = """
WITH e AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         unnest(generate_series(1, len(embedding))) AS i
  FROM embeddings
), n AS (
  SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM e GROUP BY 1
), cents AS (
  SELECT e.vec_id AS cent, e.i, e.v / n.nrm AS w
  FROM e JOIN n ON n.vec_id = e.vec_id
  WHERE e.vec_id IN (0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15)
), dots AS (
  SELECT e.vec_id, c.cent, sum(e.v * c.w) AS d
  FROM e JOIN cents c ON c.i = e.i GROUP BY 1, 2
), assign AS (
  SELECT vec_id, cent FROM (
    SELECT vec_id, cent,
           row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cent) AS rn
    FROM dots) WHERE rn = 1
), probe AS (
  SELECT vec_id AS query_id, cent FROM (
    SELECT vec_id, cent,
           row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cent) AS rn
    FROM dots WHERE vec_id IN (0,1,2,3,4)) WHERE rn <= 4
), cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probe p JOIN assign a ON a.cent = p.cent
), d2 AS (
  SELECT c.query_id, c.neighbor_id, sum(q.v * t.v) AS dot
  FROM cand c
  JOIN e q ON q.vec_id = c.query_id
  JOIN e t ON t.vec_id = c.neighbor_id AND t.i = q.i
  GROUP BY 1, 2
), s AS (
  SELECT query_id, neighbor_id, round(dot/(nq.nrm*nn.nrm), 6) AS sim_r
  FROM d2 JOIN n nq ON nq.vec_id = query_id JOIN n nn ON nn.vec_id = neighbor_id
), r AS (
  SELECT query_id, neighbor_id, sim_r,
         row_number() OVER (PARTITION BY query_id ORDER BY sim_r DESC, neighbor_id) AS rank
  FROM s
)
SELECT query_id, neighbor_id, sim_r, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 10
"""


# stratified_sample: the hash decision is md5_number_lower of the STRING id,
# reproduced verbatim (rates: en 0.5, others 0.25; SAMPLE_MOD = 1e6)
ORACLE_SQL["stratified_sample"] = """
SELECT doc_id, lang FROM documents
WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000000 <
      CASE lang WHEN 'en' THEN 500000 ELSE 250000 END
"""

# decontaminate: src0 = eval set; count each other doc's DISTINCT 3-grams
# that appear anywhere in the eval set (same tokenization as ngram_jaccard)
ORACLE_SQL["decontaminate"] = """
WITH t AS (
  SELECT doc_id, source, list_filter(string_split_regex(lower(coalesce(text,'')), '\\s+'), x -> x <> '') AS ws
  FROM documents
), shing AS (
  SELECT DISTINCT doc_id, source, g FROM (
    SELECT doc_id, source, unnest(
      CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
           ELSE list_transform(range(1, len(ws)-1), i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2]))
      END) AS g
    FROM t WHERE len(ws) > 0
  )
), bench AS (SELECT DISTINCT g FROM shing WHERE source = 'src0'),
ov AS (
  SELECT s.doc_id, count(*) AS n_overlap
  FROM shing s JOIN bench b ON s.g = b.g
  WHERE s.source <> 'src0'
  GROUP BY 1
)
SELECT d.doc_id, d.source,
       CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       coalesce(o.n_overlap, 0) > 0 AS contaminated
FROM documents d LEFT JOIN ov o ON o.doc_id = d.doc_id
WHERE d.source <> 'src0'
"""

ORACLE_SQL["doc_embedding_join"] = """
SELECT d.doc_id, d.lang, d.source, CAST(e.label AS INTEGER) AS label
FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
"""

ORACLE_SQL["semi_join"] = """
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE EXISTS (SELECT 1 FROM embeddings e
              WHERE e.vec_id = d.doc_id AND e.label % 3 = 0)
ORDER BY d.doc_id
"""

ORACLE_SQL["anti_join"] = """
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM embeddings e
                  WHERE e.vec_id = d.doc_id AND e.label % 3 = 0)
ORDER BY d.doc_id
"""

# chunk_documents: same tokenization (whitespace split, no lowercase), chunk
# starts every 32 tokens (40 - 8 overlap), trailing start emitted only when
# it adds tokens beyond the previous chunk's overlap; DuckDB list slices are
# 1-based inclusive and clamped, matching toks[start : start+40]
ORACLE_SQL["chunk_documents"] = """
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(coalesce(text,''), '\\s+'), x -> x <> '') AS ws
  FROM documents
), c AS (
  SELECT doc_id, len(ws) AS n, CAST(u.i AS BIGINT) AS start
  FROM t, unnest(range(0, len(ws), 32)) AS u(i)
  WHERE len(ws) > 0 AND (u.i = 0 OR u.i + 8 < len(ws))
)
SELECT doc_id,
       CAST(start / 32 AS BIGINT) AS chunk_idx,
       array_to_string(ws[start + 1 : start + 40], ' ') AS chunk_text,
       CAST(least(n - start, 40) AS BIGINT) AS n_tokens
FROM c JOIN t USING (doc_id)
"""

# pack_sequences: chunking reproduced as in chunk_documents, then the greedy
# budget-128 walk replayed per bucket with a recursive CTE (row_number order
# = (doc_id, chunk_idx); a chunk joins its pack while the running total
# stays <= budget, else opens the next pack with 0 tokens before it)
ORACLE_SQL["pack_sequences"] = """
WITH RECURSIVE t AS (
  SELECT doc_id, list_filter(string_split_regex(coalesce(text,''), '\\s+'), x -> x <> '') AS ws
  FROM documents
), c AS (
  SELECT doc_id, len(ws) AS n, CAST(u.i AS BIGINT) AS start
  FROM t, unnest(range(0, len(ws), 32)) AS u(i)
  WHERE len(ws) > 0 AND (u.i = 0 OR u.i + 8 < len(ws))
), chunks AS (
  SELECT doc_id, CAST(start / 32 AS BIGINT) AS chunk_idx,
         CAST(least(n - start, 40) AS BIGINT) AS n_tokens
  FROM c
), o AS (
  SELECT CAST(doc_id % 8 AS INTEGER) AS bucket, doc_id, chunk_idx, n_tokens,
         row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id, chunk_idx) AS rn
  FROM chunks
), walk AS (
  SELECT bucket, rn, doc_id, chunk_idx, n_tokens,
         CAST(0 AS BIGINT) AS pack_id, CAST(0 AS BIGINT) AS before
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.bucket, o.rn, o.doc_id, o.chunk_idx, o.n_tokens,
         CASE WHEN w.before + w.n_tokens + o.n_tokens <= 128
              THEN w.pack_id ELSE w.pack_id + 1 END,
         CASE WHEN w.before + w.n_tokens + o.n_tokens <= 128
              THEN w.before + w.n_tokens ELSE CAST(0 AS BIGINT) END
  FROM walk w JOIN o ON o.bucket = w.bucket AND o.rn = w.rn + 1
)
SELECT bucket, doc_id, chunk_idx, n_tokens, pack_id,
       before AS pack_tokens_before
FROM walk
"""

# render_conversations: the event->transcript adapter mapping reproduced in
# SQL (same as flagship_transcripts, incl. the Arrow shortest-float-repr
# fix), then one ordered string_agg per conversation
ORACLE_SQL["render_conversations"] = """
WITH m AS (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id AS BIGINT) AS turn_idx,
         epoch_us(ts) AS tu,
         CASE WHEN event_type IN ('purchase','signup') THEN 'assistant'
              WHEN event_type = 'error' THEN 'tool' ELSE 'user' END AS role,
         event_type || ':' ||
           regexp_replace(CAST(round(value, 2) AS VARCHAR), '\\.0$', '') AS text
  FROM events
)
SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
       string_agg(role || ': ' || text, chr(10) ORDER BY tu, turn_idx) AS rendered
FROM m GROUP BY conv_id
"""

# streaming_dedup: arrival epochs are doc_id-ordered slices, so the
# cross-epoch first-occurrence rule collapses to min doc_id per text
ORACLE_SQL["streaming_dedup"] = """
SELECT doc_id, text FROM documents
QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
"""

# streaming_minhash: the ENTIRE LSH sketch recomputed in SQL — md5 shingle
# hashes, numpy-uint64-wraparound universal hashes (HUGEINT split multiplies),
# band polynomials — then 'no earlier doc shares a band'; id-ordered epochs
# collapse the (epoch, id) order to doc_id order. Generated from the same
# constants the engine uses (single source of truth).
from statefulstreamprocessor_ray.pipelines.streaming_minhash import (
    streaming_minhash_oracle_sql as _sm_oracle,
)

ORACLE_SQL["streaming_minhash"] = _sm_oracle(n_perm=32, bands=8, k=3, seed=7)

# streaming_corpus: scrub (same regex chain as scrub_text) + quality gate
# (corpus_build thresholds) applied BEFORE the cross-epoch first-occurrence
# rule; doc_id-ordered epochs again collapse it to min doc_id per SCRUBBED
# text over the quality-passing docs
ORACLE_SQL["streaming_corpus"] = """
WITH s1 AS (
  SELECT doc_id, regexp_replace(coalesce(text,''),
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t0
  FROM documents
), s2 AS (
  SELECT doc_id, regexp_replace(t0, 'https?://[^\\s]+', '<URL>', 'g') AS t FROM s1
), tok AS (
  SELECT doc_id, t,
         list_filter(string_split_regex(lower(t), '\\s+'), x -> x <> '') AS ws
  FROM s2
), cnt AS (
  SELECT doc_id, w, count(*) AS c
  FROM (SELECT doc_id, unnest(ws) AS w FROM tok) GROUP BY 1, 2
), qstat AS (
  SELECT doc_id, sum(c) AS n_tokens, max(c) AS top FROM cnt GROUP BY 1
), kept AS (
  SELECT tok.doc_id, tok.t FROM tok JOIN qstat USING (doc_id)
  WHERE qstat.n_tokens >= 20
    AND CAST(qstat.top AS DOUBLE) / qstat.n_tokens <= 0.125
)
SELECT doc_id, t AS text FROM kept
QUALIFY row_number() OVER (PARTITION BY t ORDER BY doc_id) = 1
"""

# scrub_text: same RE2-and-Python-compatible patterns applied in the same
# ORDER (urls counted on the email-scrubbed string, as the engine does)
ORACLE_SQL["scrub_text"] = """
WITH s0 AS (SELECT doc_id, coalesce(text,'') AS t FROM documents),
s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
  FROM s0
)
SELECT doc_id,
       regexp_replace(t, 'https?://[^\\s]+', '<URL>', 'g') AS text,
       n_email,
       CAST(len(regexp_extract_all(t, 'https?://[^\\s]+')) AS BIGINT) AS n_url
FROM s1
"""

# corpus_build: the per-op oracles chained as CTEs in pipeline order —
# scrub (email then url), lowered-token quality stats (n>=20, top frac
# <= 0.125, exact double division), shingle-join Jaccard >= 0.5 pairs +
# recursive-CTE connected components keeping min-id reps (exact-text dup
# edges are Jaccard-1.0 pairs, so the SQL needs only the Jaccard edges),
# src0-eval 5-gram-overlap drop (decon_k=5 > dedup k=3), md5 per-lang
# Bernoulli sample, 40/8
# overlapping chunks over the NON-lowered scrubbed text
ORACLE_SQL["corpus_build"] = """
WITH RECURSIVE s1 AS (
  SELECT doc_id, lang, source,
         regexp_replace(coalesce(text,''),
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t0
  FROM documents
), s2 AS (
  SELECT doc_id, lang, source,
         regexp_replace(t0, 'https?://[^\\s]+', '<URL>', 'g') AS t
  FROM s1
), tok AS (
  SELECT doc_id, lang, source, t,
         list_filter(string_split_regex(lower(t), '\\s+'), x -> x <> '') AS ws
  FROM s2
), corp AS (SELECT * FROM tok WHERE source <> 'src0'),
cnt AS (
  SELECT doc_id, w, count(*) AS c
  FROM (SELECT doc_id, unnest(ws) AS w FROM corp) GROUP BY 1, 2
), qstat AS (
  SELECT doc_id, sum(c) AS n_tokens, max(c) AS top FROM cnt GROUP BY 1
), kept AS (
  SELECT corp.* FROM corp JOIN qstat USING (doc_id)
  WHERE qstat.n_tokens >= 20
    AND CAST(qstat.top AS DOUBLE) / qstat.n_tokens <= 0.125
), shing AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, unnest(
      CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
           ELSE list_transform(range(1, len(ws)-1), i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2]))
      END) AS g
    FROM kept WHERE len(ws) > 0
  )
), p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM shing a JOIN shing b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), sizes AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY 1),
dup AS (
  SELECT doc_a, doc_b FROM p
  JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(inter AS DOUBLE)/(sa.n + sb.n - inter) >= 0.5
),
edges AS (SELECT doc_a AS u, doc_b AS v FROM dup UNION SELECT doc_b, doc_a FROM dup),
labels(doc, lab) AS (
  SELECT doc_id, doc_id FROM kept
  UNION
  SELECT e.u, l.lab FROM edges e JOIN labels l ON l.doc = e.v
),
rep AS (SELECT doc, min(lab) AS rep FROM labels GROUP BY doc),
uniq AS (
  SELECT k.* FROM kept k JOIN rep ON rep.doc = k.doc_id WHERE rep.rep = k.doc_id
),
shing5 AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, unnest(
      CASE WHEN len(ws) < 5 THEN [array_to_string(ws, ' ')]
           ELSE list_transform(range(1, len(ws)-3), i -> array_to_string(ws[i:i+4], ' '))
      END) AS g
    FROM kept WHERE len(ws) > 0
  )
),
bench AS (
  SELECT DISTINCT g FROM (
    SELECT unnest(
      CASE WHEN len(ws) < 5 THEN [array_to_string(ws, ' ')]
           ELSE list_transform(range(1, len(ws)-3), i -> array_to_string(ws[i:i+4], ' '))
      END) AS g
    FROM tok WHERE source = 'src0' AND len(ws) > 0
  )
),
contam AS (SELECT DISTINCT s.doc_id FROM shing5 s JOIN bench b ON s.g = b.g),
clean AS (
  SELECT u.* FROM uniq u WHERE u.doc_id NOT IN (SELECT doc_id FROM contam)
),
samp AS (
  SELECT * FROM clean
  WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000000 <
        CASE lang WHEN 'en' THEN 500000 ELSE 250000 END
),
raw AS (
  SELECT doc_id, lang, source,
         list_filter(string_split_regex(t, '\\s+'), x -> x <> '') AS rws
  FROM samp
), ch AS (
  SELECT doc_id, len(rws) AS n, CAST(u.i AS BIGINT) AS start
  FROM raw, unnest(range(0, len(rws), 32)) AS u(i)
  WHERE len(rws) > 0 AND (u.i = 0 OR u.i + 8 < len(rws))
)
SELECT r.doc_id, r.lang, r.source,
       CAST(ch.start / 32 AS BIGINT) AS chunk_idx,
       array_to_string(r.rws[ch.start + 1 : ch.start + 40], ' ') AS chunk_text,
       CAST(least(ch.n - ch.start, 40) AS BIGINT) AS n_tokens
FROM ch JOIN raw r USING (doc_id)
"""

# tfidf_top_terms: same tokenization as the jaccard/shingle oracles; scores
# rounded to 6 decimals BEFORE the rank so the (score desc, term asc)
# tie-break cannot flip on last-ulp libm differences between numpy and DuckDB
ORACLE_SQL["tfidf_top_terms"] = r"""
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(lower(coalesce(text,'')), '\s+'), x -> x <> '') AS ws
  FROM documents
), tok AS (
  SELECT doc_id, unnest(ws) AS term FROM t WHERE len(ws) > 0
), tc AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
), dfreq AS (
  SELECT term, count(*) AS df FROM tc GROUP BY 1
), n AS (SELECT count(*) AS n FROM documents),
s AS (
  SELECT tc.doc_id, tc.term,
         round(tc.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df), 6) AS score
  FROM tc JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term, score FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk FROM s
) WHERE rk <= 5
"""

# bigram_surprisal: surprisal quantized to integer micro-nats before the
# per-doc sum — int64 addition is associative, so the engine's partition
# order and DuckDB's aggregation order provably agree; the only doubles are
# one identical division chain at the end
ORACLE_SQL["bigram_surprisal"] = r"""
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(lower(coalesce(text,'')), '\s+'), x -> x <> '') AS ws
  FROM documents
), big AS (
  SELECT doc_id, pr[1] AS w1, pr[2] AS w2 FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(ws)), i -> [ws[i], ws[i+1]])) AS pr
    FROM t WHERE len(ws) >= 2
  )
), bc AS (
  SELECT doc_id, w1, w2, count(*) AS tf FROM big GROUP BY 1, 2, 3
), g12 AS (
  SELECT w1, w2, sum(tf) AS c12 FROM bc GROUP BY 1, 2
), g1 AS (
  SELECT w1, sum(tf) AS c1 FROM bc GROUP BY 1
), s AS (
  SELECT bc.doc_id, bc.tf,
         CAST(round(ln(CAST(c1 AS DOUBLE)/c12)*1000000) AS BIGINT) AS sm
  FROM bc JOIN g12 USING (w1, w2) JOIN g1 USING (w1)
)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
       CAST(sum(tf*sm) AS BIGINT) AS surprisal_micro,
       CAST(sum(tf*sm) AS DOUBLE)/sum(tf)/1000000 AS mean_surprisal
FROM s GROUP BY 1
"""

# bm25_topk: query literals shared with q_bm25_topk (BM25_QUERIES); the
# arithmetic expression mirrors the engine token-for-token — Lucene idf,
# (1.2 + 1.0) / (1.0 - 0.75) written as the same float ops Python performs on
# the k1/b arguments, per-term micro-quantization before the associative sum
ORACLE_SQL["bm25_topk"] = r"""
WITH q(query_id, qtext) AS (VALUES
  (0, 'sort merge join'), (1, 'window agg scan'),
  (2, 'fast key order'), (3, 'group query value')),
qterm AS (
  SELECT DISTINCT query_id,
         unnest(list_filter(string_split_regex(lower(qtext), '\s+'), x -> x <> '')) AS term
  FROM q
), t AS (
  SELECT doc_id, list_filter(string_split_regex(lower(coalesce(text,'')), '\s+'), x -> x <> '') AS ws
  FROM documents
), stats AS (
  SELECT CAST(sum(len(ws)) AS DOUBLE) / count(*) AS avgdl, count(*) AS n FROM t
), tok AS (
  SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM t WHERE len(ws) > 0
), tc AS (
  SELECT doc_id, dl, term, count(*) AS tf FROM tok GROUP BY 1, 2, 3
), dfq AS (
  SELECT term, count(*) AS df FROM tc
  WHERE term IN (SELECT DISTINCT term FROM qterm) GROUP BY 1
), w AS (
  SELECT qterm.query_id, tc.doc_id,
         CAST(round(
           ln(1.0 + ((CAST(n AS DOUBLE) - CAST(df AS DOUBLE)) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
           * (CAST(tf AS DOUBLE) * (1.2 + 1.0))
           / (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))
           * 1000000.0) AS BIGINT) AS sm
  FROM tc JOIN dfq USING (term) JOIN qterm USING (term) CROSS JOIN stats
), s AS (
  SELECT query_id, doc_id, CAST(sum(sm) AS BIGINT) AS score_micro FROM w GROUP BY 1, 2
)
SELECT query_id, doc_id, score_micro, CAST(score_micro AS DOUBLE) / 1000000.0 AS score
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score_micro DESC, doc_id) AS rk FROM s
) WHERE rk <= 10
"""

# url_domains: same URL regex as the scrubber, domain = lowercased authority.
# The docs CTE mirrors q_url_domains' derived URL column byte-for-byte (the
# driver testdata is URL-free; without it the check is vacuous 0-vs-0 rows).
ORACLE_SQL["url_domains"] = r"""
WITH docs AS (
  SELECT doc_id,
         coalesce(text,'') || ' http://site' || CAST(doc_id % 37 AS VARCHAR)
           || '.example.com/d' || CAST(doc_id AS VARCHAR)
           || CASE WHEN doc_id % 3 = 0
                   THEN ' https://cdn' || CAST(doc_id % 11 AS VARCHAR) || '.example.org/x'
                   ELSE '' END AS text
  FROM documents
), u AS (
  SELECT doc_id, unnest(regexp_extract_all(coalesce(text,''), 'https?://[^\s]+')) AS url
  FROM docs
), d AS (
  SELECT doc_id, lower(regexp_extract(url, '^https?://([^/\s?#]+)', 1)) AS domain FROM u
)
SELECT domain, CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM d WHERE domain IS NOT NULL AND domain <> ''
GROUP BY 1
"""

# ngram_containment: the jaccard oracle's CTE chain with the score formula
# swapped for the overlap coefficient inter/min(|A|,|B|) at threshold 0.8 —
# derived by substitution so the shingle CTEs cannot drift
_JAC_TAIL = """SELECT doc_a, doc_b,
       CAST(inter AS DOUBLE)/(sa.n + sb.n - inter) AS jaccard
FROM pairs JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(inter AS DOUBLE)/(sa.n + sb.n - inter) >= 0.5
"""
assert _JAC_TAIL in ORACLE_SQL["ngram_jaccard"]
ORACLE_SQL["ngram_containment"] = ORACLE_SQL["ngram_jaccard"].replace(
    _JAC_TAIL,
    """SELECT doc_a, doc_b,
       CAST(inter AS DOUBLE)/least(sa.n, sb.n) AS containment
FROM pairs JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(inter AS DOUBLE)/least(sa.n, sb.n) >= 0.8
""",
)

# corpus_build_packed: corpus_build's CTE chain with the final chunk SELECT
# swapped for the pack_sequences recursive greedy walk (budget 128, bucket
# = doc_id % 8) — derived by substitution so the two oracles cannot drift
_CB_CHUNK_TAIL = """SELECT r.doc_id, r.lang, r.source,
       CAST(ch.start / 32 AS BIGINT) AS chunk_idx,
       array_to_string(r.rws[ch.start + 1 : ch.start + 40], ' ') AS chunk_text,
       CAST(least(ch.n - ch.start, 40) AS BIGINT) AS n_tokens
FROM ch JOIN raw r USING (doc_id)"""
assert _CB_CHUNK_TAIL in ORACLE_SQL["corpus_build"]
ORACLE_SQL["corpus_build_packed"] = ORACLE_SQL["corpus_build"].replace(
    _CB_CHUNK_TAIL,
    """, chunks AS (
  SELECT doc_id, CAST(start / 32 AS BIGINT) AS chunk_idx,
         CAST(least(n - start, 40) AS BIGINT) AS n_tokens
  FROM ch
), o AS (
  SELECT CAST(doc_id % 8 AS INTEGER) AS bucket, doc_id, chunk_idx, n_tokens,
         row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id, chunk_idx) AS rn
  FROM chunks
), walk AS (
  SELECT bucket, rn, doc_id, chunk_idx, n_tokens,
         CAST(0 AS BIGINT) AS pack_id, CAST(0 AS BIGINT) AS before
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.bucket, o.rn, o.doc_id, o.chunk_idx, o.n_tokens,
         CASE WHEN w.before + w.n_tokens + o.n_tokens <= 128
              THEN w.pack_id ELSE w.pack_id + 1 END,
         CASE WHEN w.before + w.n_tokens + o.n_tokens <= 128
              THEN w.before + w.n_tokens ELSE CAST(0 AS BIGINT) END
  FROM walk w JOIN o ON o.bucket = w.bucket AND o.rn = w.rn + 1
)
SELECT bucket, doc_id, chunk_idx, n_tokens, pack_id,
       before AS pack_tokens_before
FROM walk""",
)

# heavy_hitters: exact regime (vocab << capacity) — err_bound is provably 0,
# so the oracle asserts it; tie-break matches the engine's (n desc, item asc)
ORACLE_SQL["heavy_hitters"] = """
SELECT word AS item, n, CAST(0 AS BIGINT) AS err_bound FROM (
  SELECT word, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT unnest(list_filter(string_split_regex(lower(coalesce(text,'')), '\\s+'), x -> x <> '')) AS word
    FROM documents
  ) GROUP BY word ORDER BY n DESC, word ASC LIMIT 10
)
"""

# distinct_count: sparse regime (distinct users per type <= sparse_limit) —
# the sparse summary is the exact 64-bit hash set, so COUNT(DISTINCT) matches
ORACLE_SQL["distinct_count"] = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events GROUP BY event_type
"""

# streaming_distinct: the oracle recomputes the engine's epoch slicing —
# event_id-sorted rank thirds with the SAME integer arithmetic
# (lo = i*n//3) — then each epoch's prefix COUNT(DISTINCT) per group;
# engine counts are exact because every group stays in the sparse regime
ORACLE_SQL["streaming_distinct"] = """
WITH r AS (
  SELECT event_type, user_id,
         row_number() OVER (ORDER BY event_id) - 1 AS rn,
         count(*) OVER () AS n
  FROM events
), e AS (
  SELECT event_type, user_id,
         CASE WHEN rn < n//3 THEN 0 WHEN rn < (2*n)//3 THEN 1 ELSE 2 END AS epoch
  FROM r
), eps AS (SELECT unnest([0, 1, 2]) AS epoch)
SELECT CAST(eps.epoch AS BIGINT) AS epoch, e.event_type,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_distinct
FROM eps JOIN e ON e.epoch <= eps.epoch
GROUP BY 1, 2
"""

# streaming_topk: same epoch slicing as streaming_distinct (doc_id-rank
# thirds, same integer arithmetic), then each epoch's prefix token top-10
# with the engine's tie-break (n desc, item asc); exact regime — vocab <<
# capacity — so err_bound is provably 0 and the oracle asserts it
ORACLE_SQL["streaming_topk"] = """
WITH r AS (
  SELECT text, row_number() OVER (ORDER BY doc_id) - 1 AS rn,
         count(*) OVER () AS n FROM documents
), d AS (
  SELECT text,
         CASE WHEN rn < n//3 THEN 0 WHEN rn < (2*n)//3 THEN 1 ELSE 2 END AS epoch
  FROM r
), t AS (
  SELECT epoch,
         unnest(list_filter(string_split_regex(lower(coalesce(text,'')), '\\s+'), x -> x <> '')) AS item
  FROM d
), eps AS (SELECT unnest([0, 1, 2]) AS epoch),
c AS (
  SELECT eps.epoch, t.item, CAST(count(*) AS BIGINT) AS n
  FROM eps JOIN t ON t.epoch <= eps.epoch GROUP BY 1, 2
), k AS (
  SELECT epoch, item, n,
         row_number() OVER (PARTITION BY epoch ORDER BY n DESC, item ASC) AS rk
  FROM c
)
SELECT CAST(epoch AS BIGINT) AS epoch, item, n, CAST(0 AS BIGINT) AS err_bound
FROM k WHERE rk <= 10
"""

# streaming_quantiles: the engine's epoch slicing (event_id-rank thirds,
# same integer arithmetic), then each epoch's prefix quantile_disc per group
# — exact regime (values per group << summary limit), err_bound asserted 0
ORACLE_SQL["streaming_quantiles"] = """
WITH r AS (
  SELECT event_type, value, row_number() OVER (ORDER BY event_id) - 1 AS rn,
         count(*) OVER () AS n
  FROM events
), e AS (
  SELECT event_type, value,
         CASE WHEN rn < n//3 THEN 0 WHEN rn < (2*n)//3 THEN 1 ELSE 2 END AS epoch
  FROM r
), eps AS (SELECT unnest([0, 1, 2]) AS epoch),
p AS (
  SELECT eps.epoch, e.event_type, e.value FROM eps JOIN e ON e.epoch <= eps.epoch
)
SELECT CAST(epoch AS BIGINT) AS epoch, event_type, 0.25 AS q,
       quantile_disc(value, 0.25) AS value, CAST(0 AS BIGINT) AS err_bound
FROM p GROUP BY 1, 2
UNION ALL
SELECT CAST(epoch AS BIGINT) AS epoch, event_type, 0.5 AS q,
       quantile_disc(value, 0.5) AS value, CAST(0 AS BIGINT) AS err_bound
FROM p GROUP BY 1, 2
UNION ALL
SELECT CAST(epoch AS BIGINT) AS epoch, event_type, 0.9 AS q,
       quantile_disc(value, 0.9) AS value, CAST(0 AS BIGINT) AS err_bound
FROM p GROUP BY 1, 2
"""

# group_centroids: per-(label, dim) mean via micro-unit int sums; dim is
# 1-based list indexing; x is FLOAT -> DOUBLE (exact) before the quantize;
# the mean division chain (micro / n / 1e6) is shared with the engine
ORACLE_SQL["group_centroids"] = r"""
WITH u AS (
  SELECT label, i AS dim, embedding[i] AS x
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
  WHERE label IS NOT NULL AND embedding IS NOT NULL
), s AS (
  SELECT label, dim,
         CAST(sum(CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS s_micro,
         CAST(count(*) AS BIGINT) AS n
  FROM u GROUP BY 1, 2
)
SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim, s_micro, n,
       CAST(s_micro AS DOUBLE) / n / 1000000 AS centroid
FROM s
"""

# group_sample_k: exact-k per-group hash-min-k sample; md5_number_lower
# ordering shared byte-for-byte with the engine's md5 mode (the
# stratified_sample precedent), (h, id) tie-break
ORACLE_SQL["group_sample_k"] = r"""
WITH h AS (
  SELECT source, doc_id,
         md5_number_lower(CAST(doc_id AS VARCHAR)) AS hh
  FROM documents
)
SELECT source, doc_id FROM (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY hh, doc_id) AS rk
  FROM h
) WHERE rk <= 25
"""

# percentile_filter: corpus-relative quality gate — same tokenization as the
# text-family oracles; threshold is the quantile_disc element (an actual
# corpus value), keep-side ties survive
ORACLE_SQL["percentile_filter"] = r"""
WITH d AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(lower(coalesce(text,'')), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens FROM d
WHERE n_tokens >= (SELECT quantile_disc(n_tokens, 0.1) FROM d)
"""

# quantiles: exact regime (per-type values << summary limit) — the summary
# selects the same element as quantile_disc (sorted index max(0, ceil(q*n)-1),
# identical float64 arithmetic both sides)
ORACLE_SQL["quantiles"] = """
SELECT event_type, 0.25 AS q, quantile_disc(value, 0.25) AS value FROM events GROUP BY event_type
UNION ALL
SELECT event_type, 0.5 AS q, quantile_disc(value, 0.5) AS value FROM events GROUP BY event_type
UNION ALL
SELECT event_type, 0.9 AS q, quantile_disc(value, 0.9) AS value FROM events GROUP BY event_type
"""

# repetition_stats: same tokenization as the shingle oracles; top-token
# fraction is an EXACT int/int double division on both sides (no rounding —
# DuckDB rounds half-away, Python half-even; 128-token docs would diverge)
ORACLE_SQL["repetition_stats"] = """
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(lower(coalesce(text,'')), '\\s+'), x -> x <> '') AS ws
  FROM documents
), u AS (
  SELECT doc_id, unnest(ws) AS w FROM t
), c AS (
  SELECT doc_id, w, count(*) AS c FROM u GROUP BY 1, 2
), agg AS (
  SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_distinct, max(c) AS top
  FROM c GROUP BY 1
)
SELECT t.doc_id,
       CAST(coalesce(agg.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(agg.n_distinct, 0) AS BIGINT) AS n_distinct,
       coalesce(CAST(agg.top AS DOUBLE) / agg.n_tokens, 0.0) AS top_token_frac
FROM t LEFT JOIN agg ON agg.doc_id = t.doc_id
"""

# window_functions: per-user ordered analytics; micro-unit quantization
# BEFORE the window sums (the group_centroids discipline) so running/rolling
# totals are associative integer arithmetic; prev_value/delta_us ride as
# DOUBLE (NULL at each key's first row)
ORACLE_SQL["window_functions"] = r"""
WITH e AS (
  SELECT event_id, user_id, ts, value,
         CAST(round(value * 1000000.0) AS BIGINT) AS vm
  FROM events
)
SELECT event_id, CAST(user_id AS BIGINT) AS user_id,
  CAST(row_number() OVER w AS BIGINT) AS rn,
  CAST(lag(value) OVER w AS DOUBLE) AS prev_value,
  CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER w AS DOUBLE) AS delta_us,
  CAST(sum(vm) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_micro,
  CAST(sum(vm) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll4_micro
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

# percent_rank: tie-stable SQL rank over n_chars; pr=(rank-1)/(n-1) and
# cd=count(<=)/n are single shared divisions on both sides
ORACLE_SQL["percent_rank"] = r"""
SELECT doc_id, n_chars,
  CAST(rank() OVER (ORDER BY n_chars) AS BIGINT) AS rnk,
  percent_rank() OVER (ORDER BY n_chars) AS pr,
  cume_dist() OVER (ORDER BY n_chars) AS cd
FROM documents
"""

# pivot_event_counts: fixed event-type vocabulary baked into both sides
# (the lsh_topk baked-constant precedent); n_total counts ALL types
ORACLE_SQL["pivot_event_counts"] = r"""
SELECT CAST(user_id AS BIGINT) AS user_id,
  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
  CAST(count(*) AS BIGINT) AS n_total
FROM events GROUP BY 1
"""

# group_moments: NULL values dropped (SQL aggregate semantics); ssq in
# centi-units (see stages/analytic.py for the int64 bound); mean is the one
# shared s/n/1e6 division chain
ORACLE_SQL["group_moments"] = r"""
WITH q AS (
  SELECT event_type,
         CAST(round(value * 1000000.0) AS BIGINT) AS vm,
         CAST(round(value * 100.0) AS BIGINT) AS vc
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(vm) AS BIGINT) AS s_micro,
  CAST(min(vm) AS BIGINT) AS min_micro,
  CAST(max(vm) AS BIGINT) AS max_micro,
  CAST(sum(vc * vc) AS BIGINT) AS ssq_centi,
  CAST(sum(vm) AS DOUBLE) / count(*) / 1000000 AS mean
FROM q GROUP BY 1
"""

# topk_per_group: value-ordered per-group top-k, (n_chars DESC, doc_id)
# tie-break makes row_number deterministic
ORACLE_SQL["topk_per_group"] = r"""
SELECT source, doc_id, n_chars, CAST(rk AS BIGINT) AS rk FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
) WHERE rk <= 3
"""

# pricing_summary: TPC-H Q1 shape; money expressions quantize to micro-units
# AFTER the identical per-row IEEE chain (ep*(1-d), ep*(1-d)*(1+t)); the
# averages are the one shared s/n/1e6 division
ORACLE_SQL["pricing_summary"] = r"""
WITH q AS (
  SELECT l_returnflag, l_linestatus,
    CAST(round(l_quantity * 1000000.0) AS BIGINT) AS qty_micro,
    CAST(round(l_extendedprice * 1000000.0) AS BIGINT) AS base_micro,
    CAST(round(l_extendedprice * (1 - l_discount) * 1000000.0) AS BIGINT) AS disc_micro,
    CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000.0) AS BIGINT) AS charge_micro,
    CAST(round(l_discount * 1000000.0) AS BIGINT) AS discv_micro
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
)
SELECT l_returnflag, l_linestatus,
  CAST(sum(qty_micro) AS BIGINT) AS sum_qty_micro,
  CAST(sum(base_micro) AS BIGINT) AS sum_base_micro,
  CAST(sum(disc_micro) AS BIGINT) AS sum_disc_micro,
  CAST(sum(charge_micro) AS BIGINT) AS sum_charge_micro,
  CAST(count(*) AS BIGINT) AS count_order,
  CAST(sum(qty_micro) AS DOUBLE) / count(*) / 1000000 AS avg_qty,
  CAST(sum(base_micro) AS DOUBLE) / count(*) / 1000000 AS avg_price,
  CAST(sum(discv_micro) AS DOUBLE) / count(*) / 1000000 AS avg_disc
FROM q GROUP BY 1, 2
"""

# shipping_priority: TPC-H Q3 shape; (revenue DESC, orderkey) makes the
# top-10 row set deterministic under revenue ties
ORACLE_SQL["shipping_priority"] = r"""
WITH c AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
), o AS (
  SELECT o_orderkey, o_orderdate, o_orderpriority FROM orders
  JOIN c ON o_custkey = c_custkey
  WHERE o_orderdate < TIMESTAMP '1998-03-15'
), r AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000.0) AS BIGINT)) AS BIGINT) AS revenue_micro
  FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-03-15'
  GROUP BY 1
)
SELECT l_orderkey, revenue_micro, o_orderdate, o_orderpriority FROM (
  SELECT r.l_orderkey, r.revenue_micro, o.o_orderdate, o.o_orderpriority,
         row_number() OVER (ORDER BY r.revenue_micro DESC, r.l_orderkey) AS rk
  FROM r JOIN o ON r.l_orderkey = o.o_orderkey
) WHERE rk <= 10
"""

# local_supplier_volume: TPC-H Q5 shape; the same-nation supplier gate runs
# AFTER the joins on both sides
ORACLE_SQL["local_supplier_volume"] = r"""
SELECT n.n_name,
  CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000.0) AS BIGINT)) AS BIGINT) AS revenue_micro
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA' AND s.s_nationkey = c.c_nationkey
  AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1
"""

# histogram: bin = floor(v/25) is the identical single division+floor; lo/hi
# are single products of the int64 bin
ORACLE_SQL["histogram"] = r"""
WITH b AS (
  SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin FROM events WHERE value IS NOT NULL
)
SELECT bin, bin * 25.0 AS lo, (bin + 1) * 25.0 AS hi, CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY 1
"""

# rollup_aggregate: grouping() markers distinguish a rolled-up NULL from a
# real NULL key; integer micro-unit sums re-aggregate associatively across
# levels
ORACLE_SQL["rollup_aggregate"] = r"""
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS BIGINT) AS g_l_returnflag,
       CAST(grouping(l_linestatus) AS BIGINT) AS g_l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_quantity * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_micro
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

# group_comoments: x, y both centi-units — integer-unit rounding of
# 2-decimal prices hits exact .5 halves where np (half-even) and DuckDB
# (half-away) diverge; centi never does. sum(y^2) ~7e18 < 2^63 through
# sf0.1 (the documented int64 bound); corr is the one shared all-double
# chain, sqrt is IEEE-exact
ORACLE_SQL["group_comoments"] = r"""
WITH q AS (
  SELECT l_returnflag,
         CAST(round(l_quantity * 100.0) AS BIGINT) AS x,
         CAST(round(l_extendedprice * 100.0) AS BIGINT) AS y
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL AND l_returnflag IS NOT NULL
)
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
  CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
  CAST(sum(x*y) AS BIGINT) AS sxy,
  (CAST(count(*) AS DOUBLE) * CAST(sum(x*y) AS DOUBLE) - CAST(sum(x) AS DOUBLE) * CAST(sum(y) AS DOUBLE))
    / sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(x*x) AS DOUBLE) - CAST(sum(x) AS DOUBLE) * CAST(sum(x) AS DOUBLE))
    / sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(y*y) AS DOUBLE) - CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE)) AS corr
FROM q GROUP BY 1
"""

# streaming_window_functions: same epoch slicing as streaming_distinct
# (event_id-rank thirds), then the window_functions oracle over the TOTAL
# ARRIVAL order (epoch, ts, event_id) — the incremental evaluation's union
# across epochs must equal this batch window exactly
ORACLE_SQL["streaming_window_functions"] = r"""
WITH r AS (
  SELECT event_id, user_id, ts, value,
         row_number() OVER (ORDER BY event_id) - 1 AS rn0,
         count(*) OVER () AS n
  FROM events
), e AS (
  SELECT event_id, user_id, ts, value,
         CASE WHEN rn0 < n//3 THEN 0 WHEN rn0 < (2*n)//3 THEN 1 ELSE 2 END AS epoch,
         CAST(round(value * 1000000.0) AS BIGINT) AS vm
  FROM r
)
SELECT CAST(epoch AS BIGINT) AS epoch, event_id, CAST(user_id AS BIGINT) AS user_id,
  CAST(row_number() OVER w AS BIGINT) AS rn,
  CAST(lag(value) OVER w AS DOUBLE) AS prev_value,
  CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER w AS DOUBLE) AS delta_us,
  CAST(sum(vm) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_micro,
  CAST(sum(vm) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll4_micro
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY epoch, ts, event_id)
"""

# latest_per_key: CDC/upsert compaction — most recent full row per user,
# (ts DESC, event_id DESC) makes the argmax row deterministic
ORACLE_SQL["latest_per_key"] = r"""
SELECT event_id, CAST(user_id AS BIGINT) AS user_id, ts, event_type, value FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
  FROM events
) WHERE rk = 1
"""

# group_checksum: order-insensitive integrity digest — md5_number_lower per
# row mod a 2^53-scale prime, HUGEINT group sum mod the same prime (the
# engine's exact-Python-int pendant)
ORACLE_SQL["group_checksum"] = r"""
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(md5_number_lower(text) % 9007199254740997) % 9007199254740997 AS BIGINT) AS checksum
FROM documents
WHERE text IS NOT NULL AND source IS NOT NULL
GROUP BY 1
"""

# outer_join: FULL OUTER with unmatched rows on both sides; the engine
# re-splits Acero's coalesced key into l.key / r.key exactly as SQL keeps
# them
ORACLE_SQL["outer_join"] = r"""
WITH d AS (
  SELECT doc_id, source FROM documents WHERE doc_id % 3 != 0
), e AS (
  SELECT vec_id, CAST(label AS INTEGER) AS label FROM embeddings WHERE vec_id % 2 = 0
)
SELECT d.doc_id, d.source, e.vec_id, e.label
FROM d FULL JOIN e ON d.doc_id = e.vec_id
"""

# multikey_join: composite-key enrich — per-(user, type) totals attached to
# every event; the window form is the SQL-idiomatic equivalent of the
# aggregate+join plan
ORACLE_SQL["multikey_join"] = r"""
SELECT event_id, CAST(user_id AS BIGINT) AS user_id, event_type,
       CAST(count(*) OVER (PARTITION BY user_id, event_type) AS BIGINT) AS n_tot
FROM events
"""

# weighted_repeat: the "N epochs of source X" training-mix knob; lateral
# range unnest reproduces the np.repeat explode + 1-based rep index
ORACLE_SQL["weighted_repeat"] = r"""
WITH w AS (
  SELECT doc_id, source,
         CAST(substr(source, 4) AS BIGINT) % 3 + 1 AS n_rep
  FROM documents
)
SELECT doc_id, source, CAST(t.i AS BIGINT) AS rep
FROM w, unnest(range(1, n_rep + 1)) AS t(i)
"""

# cube_aggregate: the full two-key grouping-set lattice
ORACLE_SQL["cube_aggregate"] = r"""
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS BIGINT) AS g_l_returnflag,
       CAST(grouping(l_linestatus) AS BIGINT) AS g_l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_quantity * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_micro
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""

# intersect/except: SQL set ops (DISTINCT semantics) over the (lang, source)
# projection of two deterministic document halves
ORACLE_SQL["intersect_pairs"] = r"""
SELECT lang, source FROM documents WHERE n_chars % 2 = 0
INTERSECT
SELECT lang, source FROM documents WHERE n_chars % 2 = 1
"""

ORACLE_SQL["except_pairs"] = r"""
SELECT lang, source FROM documents WHERE n_chars % 2 = 0
EXCEPT
SELECT lang, source FROM documents WHERE n_chars % 2 = 1
"""

# streaming_compaction: per-epoch latest-row-per-touched-key changelog; the
# oracle replays the same epoch slicing and takes each touched key's prefix
# argmax by (ts DESC, id DESC)
ORACLE_SQL["streaming_compaction"] = r"""
WITH r AS (
  SELECT *, row_number() OVER (ORDER BY event_id) - 1 AS rn0, count(*) OVER () AS n
  FROM events
), e AS (
  SELECT event_id, user_id, ts, event_type, value,
         CASE WHEN rn0 < n//3 THEN 0 WHEN rn0 < (2*n)//3 THEN 1 ELSE 2 END AS epoch
  FROM r
), touched AS (
  SELECT DISTINCT epoch, user_id FROM e
)
SELECT CAST(tou.epoch AS BIGINT) AS epoch, t.event_id,
       CAST(t.user_id AS BIGINT) AS user_id, t.ts, t.event_type, t.value
FROM touched tou
JOIN e t ON t.user_id = tou.user_id AND t.epoch <= tou.epoch
QUALIFY row_number() OVER (PARTITION BY tou.epoch, tou.user_id ORDER BY t.ts DESC, t.event_id DESC) = 1
"""
