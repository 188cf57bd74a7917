"""Multimodal column plumbing: opaque binary payloads with typed metadata.

Image/audio/video payloads are ``binary`` columns; decode / feature-extract /
resize / frame-sample run as actor-pool map_batches stages with small batches
(large rows). The actual codec libraries are not in this container, so
``DecodeStage`` ships a deterministic metadata-only "decode" (and raises
``NotImplementedError`` in ``real`` mode); the Ray-side plumbing — schema,
batch sizing, actor signature, output layout — is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def attach_binary_payload(
    ds: ray.data.Dataset, text_col: str = "text", media_type: str = "image/fake"
) -> ray.data.Dataset:
    """Simulate a media column: utf-8 bytes of the text as the binary payload
    plus typed metadata, the schema a real ingest would produce."""

    def fn(b: pa.Table) -> pa.Table:
        payload = pc.cast(b[text_col], pa.binary())
        b = b.append_column("payload", payload)
        b = b.append_column(
            "media_type", pa.array([media_type] * b.num_rows, pa.string())
        )
        return b

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class DecodeStage:
    """Actor-pool decode stub.

    mode="fake": deterministic metadata from the payload bytes (n_bytes,
    width=n_bytes%64, height=(n_bytes//64)%64, n_frames=n_bytes%7+1).
    mode="real": where PIL/ffmpeg decoding would run — not available here.
    """

    def __init__(self, mode: str = "fake"):
        if mode == "real":
            raise NotImplementedError(
                "image/audio codecs are not available in this environment; "
                "plug PIL/torchaudio/ffmpeg here on a real cluster"
            )
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_bytes = pc.binary_length(batch["payload"]).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "width": pa.array(n_bytes % 64, pa.int64()),
                "height": pa.array((n_bytes // 64) % 64, pa.int64()),
                "n_frames": pa.array(n_bytes % 7 + 1, pa.int64()),
            }
        )


def decode_media(
    ds: ray.data.Dataset,
    mode: str = "fake",
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 256,
) -> ray.data.Dataset:
    """Small batches: payload rows are wide, so batch_size is deliberately low
    to keep batch x concurrency within worker heap."""
    return ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"mode": mode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class ResizeStage:
    """Actor-pool resize stub: deterministic target-width scaling of the
    decoded dims (aspect-preserving integer math). mode="real" is where a
    PIL/opencv resize kernel would run."""

    def __init__(self, target_w: int = 32, mode: str = "fake"):
        if mode == "real":
            raise NotImplementedError("image kernels unavailable; plug PIL here")
        self.target_w = target_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_w = np.full(len(w), self.target_w, np.int64)
        out_h = np.maximum(1, h * self.target_w // np.maximum(w, 1))
        return batch.append_column(
            "out_w", pa.array(out_w, pa.int64())
        ).append_column("out_h", pa.array(out_h, pa.int64()))


class FrameSampleStage:
    """1->N frame-sampling explode: one output row per sampled frame index
    (every ``step``-th of ``n_frames``) — the Ray-side shape of a video
    frame-sampler (real decoders plug into the per-frame payload slot)."""

    def __init__(self, step: int = 2):
        self.step = step

    def __call__(self, batch: pa.Table) -> pa.Table:
        nf = batch["n_frames"].to_numpy(zero_copy_only=False).astype(np.int64)
        counts = (nf + self.step - 1) // self.step
        idx = np.repeat(np.arange(len(nf), dtype=np.int64), counts)
        # per-row sampled frame ids: 0, step, 2*step, ...
        offs = np.concatenate([np.arange(0, n, self.step, dtype=np.int64) for n in nf]) if len(nf) else np.empty(0, np.int64)
        out = batch.take(pa.array(idx, pa.int64()))
        return out.append_column("frame_idx", pa.array(offs, pa.int64()))


class FeatureExtractStage:
    """Feature extraction stub: a deterministic 4-dim embedding from the
    decoded metadata (integer hash mixes scaled to [0, 1)) — the slot where a
    batched vision/audio model forward pass runs on a real cluster."""

    PRIMES = np.array([131, 313, 757, 991], dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        nb = batch["n_bytes"].to_numpy(zero_copy_only=False).astype(np.int64)
        feats = ((nb[:, None] * self.PRIMES[None, :]) % 997) / 997.0
        for j in range(feats.shape[1]):
            batch = batch.append_column(
                f"f{j}", pa.array(np.round(feats[:, j], 6), pa.float64())
            )
        return batch
