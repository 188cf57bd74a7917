"""Multimodal column plumbing: opaque binary payloads with typed metadata.

Image/audio/video payloads are ``binary`` columns; decode / feature-extract /
resize / frame-sample run as actor-pool map_batches stages with small batches
(large rows).

Two decode modes:

- ``mode="fake"``: deterministic metadata-only "decode" derived from the
  payload bytes — the oracle-reproducible mode (DuckDB can recompute it),
  and the stand-in for codecs this container lacks (audio/video).
- ``mode="real"``: ACTUALLY decodes image payloads — PIL when importable
  (the real-cluster path, checked once per actor in ``__init__``), else the
  in-repo pure-stdlib PNG decoder (``functions/pngcodec.py``); emits true
  width/height/channels plus the raw pixel buffer, which the real resize
  (vectorized nearest-neighbor) and real feature stage (per-channel
  statistics) consume downstream. Non-image media in real mode still raise
  ``NotImplementedError`` — no pretend audio/video decoding.
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
    """Actor-pool decode stage.

    mode="fake": deterministic metadata from the payload bytes (n_bytes,
    width=n_bytes%64, height=(n_bytes//64)%64, n_frames=n_bytes%7+1) — the
    oracle mode, no codec needed.
    mode="real": decode image payloads for real — PIL if importable
    (resolved ONCE per actor in __init__, the model-load pattern), else the
    in-repo PNG decoder. Output adds channels + the raw uint8 pixel buffer
    (binary) for the downstream real resize/feature stages. Audio/video
    payloads raise NotImplementedError (honest stub, unchanged).
    """

    def __init__(self, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError("DecodeStage mode must be 'fake' or 'real'")
        self.mode = mode
        if mode == "real":
            try:  # optional dependency: the real-cluster path
                from PIL import Image  # type: ignore

                self._pil = Image
            except ImportError:
                self._pil = None
            from statefulstreamprocessor_ray.functions.pngcodec import decode_png

            self._decode_png = decode_png

    def _decode_one(self, payload: bytes, media_type: str) -> np.ndarray:
        if not media_type.startswith("image/"):
            raise NotImplementedError(
                f"real decode for {media_type!r} needs torchaudio/ffmpeg — "
                "not available in this environment"
            )
        if self._pil is not None:
            import io

            arr = np.asarray(self._pil.open(io.BytesIO(payload)).convert("RGB"))
            return arr if arr.ndim == 3 else arr[:, :, None]
        # normalize the pngcodec path to the SAME convention as the PIL path
        # (always 3-channel RGB, alpha dropped, gray widened) so real-mode
        # output is reproducible whether or not PIL is importable (ADVICE r4)
        arr = self._decode_png(payload)
        if arr.shape[2] == 1:  # gray -> RGB
            return np.repeat(arr, 3, axis=2)
        if arr.shape[2] == 4:  # RGBA -> RGB: PIL convert("RGB") drops alpha
            # without compositing, so match that exactly
            return np.ascontiguousarray(arr[:, :, :3])
        return arr

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_bytes = pc.binary_length(batch["payload"]).to_numpy(zero_copy_only=False).astype(np.int64)
        if self.mode == "fake":
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "n_bytes": pa.array(n_bytes, pa.int64()),
                    "width": pa.array(n_bytes % 64, pa.int64()),
                    "height": pa.array((n_bytes // 64) % 64, pa.int64()),
                    "n_frames": pa.array(n_bytes % 7 + 1, pa.int64()),
                }
            )
        payloads = batch["payload"].to_pylist()
        mtypes = batch["media_type"].to_pylist() if "media_type" in batch.schema.names else ["image/png"] * len(payloads)
        widths, heights, chans, pixels = [], [], [], []
        for p, mt in zip(payloads, mtypes):
            arr = self._decode_one(p, mt)
            heights.append(arr.shape[0])
            widths.append(arr.shape[1])
            chans.append(arr.shape[2])
            pixels.append(arr.tobytes())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "width": pa.array(widths, pa.int64()),
                "height": pa.array(heights, pa.int64()),
                "n_frames": pa.array(np.ones(len(widths), np.int64), pa.int64()),
                "channels": pa.array(chans, pa.int64()),
                "pixels": pa.array(pixels, pa.binary()),
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
    """Actor-pool resize: aspect-preserving scale to ``target_w``.

    mode="fake": dims-only integer math (the oracle mode). mode="real":
    vectorized nearest-neighbor resample of the decoded pixel buffer from
    DecodeStage(mode="real") — one numpy fancy-index gather per image, the
    resized buffer replaces ``pixels``."""

    def __init__(self, target_w: int = 32, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError("ResizeStage mode must be 'fake' or 'real'")
        self.target_w = target_w
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_w = np.full(len(w), self.target_w, np.int64)
        out_h = np.maximum(1, h * self.target_w // np.maximum(w, 1))
        batch = batch.append_column(
            "out_w", pa.array(out_w, pa.int64())
        ).append_column("out_h", pa.array(out_h, pa.int64()))
        if self.mode == "fake":
            return batch
        chans = batch["channels"].to_numpy(zero_copy_only=False).astype(np.int64)
        bufs = batch["pixels"].to_pylist()
        resized = []
        for buf, wi, hi, ci, ow, oh in zip(bufs, w, h, chans, out_w, out_h):
            arr = np.frombuffer(buf, np.uint8).reshape(int(hi), int(wi), int(ci))
            ys = (np.arange(oh) * hi // oh).astype(np.int64)
            xs = (np.arange(ow) * wi // ow).astype(np.int64)
            resized.append(arr[ys][:, xs].tobytes())
        i = batch.schema.get_field_index("pixels")
        return batch.set_column(i, "pixels", pa.array(resized, pa.binary()))


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
    """Feature extraction: a 4-dim embedding per image.

    mode="fake": deterministic integer-hash mixes of the metadata (the
    oracle mode; the slot where a batched model forward pass runs on a real
    cluster). mode="real": per-channel pixel statistics of the decoded
    buffer — mean of up to 3 channels (missing channels 0) + overall std,
    each scaled to [0, 1)."""

    PRIMES = np.array([131, 313, 757, 991], dtype=np.int64)

    def __init__(self, mode: str = "fake"):
        if mode not in ("fake", "real"):
            raise ValueError("FeatureExtractStage mode must be 'fake' or 'real'")
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "fake":
            nb = batch["n_bytes"].to_numpy(zero_copy_only=False).astype(np.int64)
            feats = ((nb[:, None] * self.PRIMES[None, :]) % 997) / 997.0
        else:
            chans = batch["channels"].to_numpy(zero_copy_only=False).astype(np.int64)
            feats = np.zeros((batch.num_rows, 4), np.float64)
            for i, (buf, ci) in enumerate(zip(batch["pixels"].to_pylist(), chans)):
                px = np.frombuffer(buf, np.uint8).reshape(-1, int(ci))
                means = px.mean(axis=0) / 256.0
                feats[i, : min(3, int(ci))] = means[:3]
                feats[i, 3] = px.std() / 256.0
        for j in range(feats.shape[1]):
            batch = batch.append_column(
                f"f{j}", pa.array(np.round(feats[:, j], 6), pa.float64())
            )
        return batch
