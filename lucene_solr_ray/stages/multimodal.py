"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are ``binary`` columns; decode / feature-extract / resize
/ frame-sample are actor-pool ``map_batches`` stages.  The decode libraries
(PIL/ffmpeg/...) are NOT in this container, so the REAL codec path is
injected, not imported: each stage resolves its decoder once per actor in
``__init__`` from (in order)

* a ``codec`` callable passed directly (pickled to the actor — the simple
  path);
* a ``codec`` NAME looked up in the ``"codec"`` registry
  (:mod:`lucene_solr_ray.functions.registry`), optionally after importing
  ``codec_module`` INSIDE the worker process — registries are per-process,
  so a name registered only on the driver does not exist in workers; the
  module import is where a cluster with PIL/ffmpeg performs its
  registration;
* ``fake=True`` -> the deterministic hash-derived stand-in (CI path: keeps
  the Ray plumbing — schema, batch size, actor signature, output layout —
  real and tested end-to-end);
* otherwise ``NotImplementedError`` at call time (honest stub).

Image codec signature: ``payload: bytes -> np.ndarray[H, W, 3] float32``.
Video codec signature: ``payload: bytes, every_n: int, max_frames: int ->
list[(frame_no, frame_payload_bytes)]``.
"""

from __future__ import annotations

import hashlib
import importlib

import numpy as np
import pyarrow as pa


def _resolve_codec(codec, codec_module, fake_fn, fake: bool):
    if codec_module:
        importlib.import_module(codec_module)  # worker-side registration hook
    if callable(codec):
        return codec
    if isinstance(codec, str):
        from ..functions.registry import lookup

        return lookup("codec", codec)
    return fake_fn if fake else None


class ImageDecoder:
    """Actor-pool stage: binary image -> fixed-size float feature vector.

    __init__ is the once-per-actor codec/model load; __call__ is the
    per-batch decode + resize + feature step.  Use small ``batch_size`` for
    large payloads (multi-MB rows) so batch x concurrency fits worker heaps.
    """

    def __init__(self, *, size: tuple[int, int] = (32, 32), fake: bool = False,
                 codec=None, codec_module: str | None = None):
        self.size = size
        self._codec = _resolve_codec(codec, codec_module, self._decode_fake, fake)

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        """Deterministic pseudo-decode: hash-seeded pixel block."""
        h = hashlib.blake2b(payload or b"", digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(h, "big"))
        return rng.random((self.size[0], self.size[1], 3), dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._codec is None:
            raise NotImplementedError(
                "image codec not available in this environment; pass codec=..., "
                "codec_module=..., or fake=True"
            )
        feats = []
        for payload in batch["payload"].to_pylist():
            img = np.asarray(self._codec(payload), dtype=np.float32)
            if img.shape[:2] != self.size:
                # nearest-neighbor resample to the stage's fixed grid so any
                # decoder output shape fits the fixed feature layout
                yi = (np.arange(self.size[0]) * img.shape[0] // self.size[0])
                xi = (np.arange(self.size[1]) * img.shape[1] // self.size[1])
                img = img[yi][:, xi]
            # "feature extraction": downsampled 8x8 channel-mean grid
            grid = img.reshape(8, self.size[0] // 8, 8, self.size[1] // 8, 3).mean(axis=(1, 3))
            feats.append(grid.ravel().astype(np.float32).tolist())
        cols = {n: batch[n] for n in batch.column_names if n != "payload"}
        cols["features"] = pa.array(feats, type=pa.list_(pa.float32()))
        return pa.table(cols)


class FrameSampler:
    """Actor-pool stage: binary video -> every-nth-frame payloads.

    Output is one row per sampled frame (flat_map shape): (item_id, frame_no,
    payload).  The fake path slices the payload deterministically."""

    def __init__(self, *, every_n: int = 10, max_frames: int = 4, fake: bool = False,
                 codec=None, codec_module: str | None = None):
        self.every_n = every_n
        self.max_frames = max_frames
        self._codec = _resolve_codec(codec, codec_module, self._sample_fake, fake)

    def _sample_fake(self, payload: bytes, every_n: int, max_frames: int):
        payload = payload or b""
        n = min(max_frames, max(1, len(payload) // 64))
        return [(fi * every_n, payload[fi * 64 : (fi + 1) * 64]) for fi in range(n)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._codec is None:
            raise NotImplementedError(
                "video codec not available in this environment; pass codec=..., "
                "codec_module=..., or fake=True"
            )
        ids, frames, payloads = [], [], []
        for item_id, payload in zip(batch["item_id"].to_pylist(), batch["payload"].to_pylist()):
            for frame_no, fp in self._codec(payload, self.every_n, self.max_frames):
                ids.append(item_id)
                frames.append(frame_no)
                payloads.append(fp)
        return pa.table(
            {
                "item_id": pa.array(ids, type=pa.int64()),
                "frame_no": pa.array(frames, type=pa.int32()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )
