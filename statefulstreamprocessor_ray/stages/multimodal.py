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
    ds: ray.data.Dataset, mode: str = "fake", concurrency: int = 2, batch_size: int = 256
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
