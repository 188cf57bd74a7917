"""End-to-end training-corpus build: the composition a real user of the
curation/dedup operators actually runs, as ONE pipeline —

    read -> PII/URL scrub -> quality filter (Gopher repetition signals)
         -> exact + n-gram-Jaccard dedup (cluster + apply)
         -> benchmark decontamination (drop) -> deterministic sample
         -> overlapping chunking

Per-operator oracles can't see composition seams (schema drift, column
loss, order dependencies between stages); this entry runs the seams. The
reference has no pendant — it is the LLM-data extension of its
consume->transform->produce job shape (``ts_join_with_kafka_eos.py``).

Scale shape: every stage is the operator's own scale path — scrub /
stats / filter / decontaminate / sample / chunk are shuffle-free
map_batches; the two dedup passes are the only exchanges and both ship
(hash, id) or (shingle-hash, id) pairs, never documents; the cluster map
and drop sets are O(duplicates) driver-side and broadcast back via
``ray.put``. The filtered corpus feeds three consumers (two pair passes +
the apply); pass ``checkpoint_dir`` to materialize it ONCE as partitioned
Parquet instead of pinning object-store blocks — the right trade at
100-TB scale, where the object store would spill the whole corpus. The
checkpoint dir is cleared and rewritten per run (parquet writes append;
a stale copy would silently double downstream rows).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from statefulstreamprocessor_ray.stages import dedup
from statefulstreamprocessor_ray.stages.curation import (
    chunk_documents,
    decontaminate,
    deterministic_sample,
    repetition_stats,
    scrub_text,
)


class CurationPrepare:
    """Picklable phase-0 transform for ``StreamingDedupJob``: scrub + quality
    filter per batch, turning the streaming exact-dedup job into a streaming
    CORPUS-CURATION pipeline (the follow-the-tail form of
    :func:`corpus_build`'s first stages). ``pa.Table -> pa.Table``: rewrites
    ``text_col`` with the scrubbed text and drops rows failing the quality
    gate; dedup identity downstream = content AFTER curation, so two docs
    differing only in scrubbed-away PII dedup together."""

    def __init__(
        self,
        min_tokens: int = 20,
        max_top_frac: float = 0.125,
        patterns: dict | None = None,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        from statefulstreamprocessor_ray.stages.curation import SCRUB_PATTERNS

        self.patterns = dict(patterns or SCRUB_PATTERNS)
        self.min_tokens = min_tokens
        self.max_top_frac = max_top_frac
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from statefulstreamprocessor_ray.stages.curation import (
            repetition_stats_batch,
            scrub_text_batch,
        )

        df = batch.to_pandas()
        scrubbed = scrub_text_batch(
            df, self.patterns, text_col=self.text_col, id_col=self.id_col
        )
        df = df.assign(**{self.text_col: scrubbed[self.text_col]})
        stats = repetition_stats_batch(
            df, text_col=self.text_col, id_col=self.id_col
        )
        keep = (stats["n_tokens"].to_numpy() >= self.min_tokens) & (
            stats["top_token_frac"].to_numpy() <= self.max_top_frac
        )
        return pa.Table.from_pandas(df[keep], preserve_index=False).select(
            batch.column_names
        )


def corpus_build(
    docs: ray.data.Dataset,
    bench: ray.data.Dataset | None = None,
    *,
    min_tokens: int = 20,
    max_top_frac: float = 0.125,
    jaccard_threshold: float = 0.5,
    k: int = 3,
    decon_k: int = 8,
    rate: float | None = None,
    rates_by: dict | None = None,
    stratum_col: str | None = None,
    sample_hash_fn: str = "sip",
    chunk_tokens: int = 512,
    overlap: int = 64,
    pack_budget: int | None = None,
    pack_buckets: int = 8,
    carry_cols: tuple = (),
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_dir: str | None = None,
) -> ray.data.Dataset:
    """Build a training corpus from raw documents; returns the chunk set
    ``(id, carry_cols..., chunk_idx, chunk_text, n_tokens)``.

    ``bench`` (optional) is the held-out eval set: it is scrubbed with the
    same patterns, its ``decon_k``-gram shingles are broadcast once, and
    any corpus doc sharing one is DROPPED. ``decon_k`` is deliberately
    LONGER than the dedup shingle ``k``: an overlapping long n-gram means
    real eval leakage, while short trigrams are shared by unrelated text
    and would gut the corpus. Sampling runs iff ``rate`` or
    ``rates_by`` is given; ``sample_hash_fn="md5"`` is the SQL-oracle mode
    (see ``deterministic_sample``). Dedup keeps each duplicate cluster's
    min-id representative; exact-text edges are found by a 128-bit-hash
    exchange and near-dup edges by exact n-gram Jaccard — exact edges are
    subsumed by Jaccard-1.0 pairs, so they change no result, only cost:
    the hash pass is the cheap first cut at scale."""
    s = scrub_text(docs, text_col=text_col, id_col=id_col, keep_cols=carry_cols)
    r = repetition_stats(
        s, text_col=text_col, id_col=id_col, keep_cols=(text_col, *carry_cols)
    )
    out_cols = [id_col, *carry_cols, text_col]

    def quality(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t["n_tokens"], min_tokens),
            pc.less_equal(t["top_token_frac"], max_top_frac),
        )
        return t.filter(keep).select(out_cols)

    kept = r.map_batches(quality, batch_format="pyarrow", zero_copy_batch=True)

    # the filtered corpus feeds several consumers (two pair passes, the
    # apply, and everything downstream): without a pin, EVERY consumer
    # re-executes the read+scrub+stats+filter lineage. checkpoint_dir
    # (preferred at large scale) pins it as partitioned Parquet — CLEARED
    # first, because write_parquet appends and a stale copy would silently
    # double every downstream row; otherwise pin blocks in the object
    # store — distributed and spill-backed, never a driver copy.
    if checkpoint_dir is not None:
        import shutil

        # refuse to wipe a directory this pipeline did not create: a
        # mistyped --work path would otherwise be destroyed silently
        # (ADVICE r3); a sentinel from a prior run marks the dir ours
        sentinel = os.path.join(checkpoint_dir, "_ssp_corpus_checkpoint")
        if (
            os.path.isdir(checkpoint_dir)
            and os.listdir(checkpoint_dir)
            and not os.path.exists(sentinel)
        ):
            raise ValueError(
                f"corpus_build: checkpoint_dir {checkpoint_dir!r} is non-empty "
                "and was not written by a prior corpus_build run (no "
                "_ssp_corpus_checkpoint sentinel); refusing to delete it — "
                "pass an empty or corpus-build-owned directory"
            )
        shutil.rmtree(checkpoint_dir, ignore_errors=True)
        kept.write_parquet(checkpoint_dir)
        with open(sentinel, "w") as f:
            f.write("corpus_build filtered-corpus checkpoint\n")
        # underscore-prefixed files (the sentinel) are skipped by Ray's
        # default file filter, like Spark/Hadoop _SUCCESS markers
        kept = ray.data.read_parquet(checkpoint_dir)
    else:
        kept = kept.materialize()

    exact_edges = dedup.exact_dup_pairs(kept, text_col=text_col, id_col=id_col)
    near_edges = dedup.ngram_jaccard_pairs(
        kept, threshold=jaccard_threshold, k=k, text_col=text_col, id_col=id_col
    ).select(["doc_a", "doc_b"])
    clusters = dedup.cluster_duplicates(
        pa.concat_tables([exact_edges, near_edges])
    )
    unique = dedup.apply_dedup(kept, clusters, id_col=id_col)

    if bench is not None:
        bench_s = scrub_text(bench, text_col=text_col, id_col=id_col)
        unique = decontaminate(
            unique,
            bench_s,
            k=decon_k,
            text_col=text_col,
            id_col=id_col,
            keep_cols=(text_col, *carry_cols),
            mode="drop",
        )

    if rate is not None or rates_by is not None:
        unique = deterministic_sample(
            unique,
            rate=rate,
            rates_by=rates_by,
            stratum_col=stratum_col,
            id_col=id_col,
            hash_fn=sample_hash_fn,
        )

    chunks = chunk_documents(
        unique,
        chunk_tokens=chunk_tokens,
        overlap=overlap,
        text_col=text_col,
        id_col=id_col,
        keep_cols=carry_cols,
    )
    if pack_budget is None:
        return chunks
    # final packing stage: greedy fixed-budget pack ASSIGNMENT over the
    # kept chunks (tensor assembly is a downstream gather, so chunk_text
    # is dropped before the pack shuffle — only layout columns move)
    from statefulstreamprocessor_ray.stages.curation import pack_sequences

    return pack_sequences(
        chunks.drop_columns(["chunk_text", *carry_cols]),
        budget=pack_budget,
        n_buckets=pack_buckets,
        id_col=id_col,
    )
