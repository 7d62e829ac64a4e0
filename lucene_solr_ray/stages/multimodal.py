"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are ``binary`` columns; decode / feature-extract / resize
/ frame-sample are actor-pool ``map_batches`` stages.  The decode libraries
(PIL/ffmpeg/...) are NOT in this container, so the codec call is STUBBED: by
default :class:`ImageDecoder` raises ``NotImplementedError``; with
``fake=True`` it produces a deterministic hash-derived pixel block so the Ray
plumbing (schema, batch size, actor signature, output layout) is real and
tested end-to-end.  Swap ``_decode_real`` for the real library on a cluster
that has it.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class ImageDecoder:
    """Actor-pool stage: binary image -> fixed-size float feature vector.

    __init__ is the once-per-actor codec/model load (stub); __call__ is the
    per-batch decode + resize + feature step.  Use small ``batch_size`` for
    large payloads (multi-MB rows) so batch x concurrency fits worker heaps.
    """

    def __init__(self, *, size: tuple[int, int] = (32, 32), fake: bool = False):
        self.size = size
        self.fake = fake
        # real impl would load PIL/turbojpeg here, once per actor

    def _decode_real(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            "image codec not available in this environment; construct with fake=True"
        )

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        """Deterministic pseudo-decode: hash-seeded pixel block."""
        h = hashlib.blake2b(payload or b"", digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(h, "big"))
        return rng.random((self.size[0], self.size[1], 3), dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = self._decode_fake if self.fake else self._decode_real
        feats = []
        for payload in batch["payload"].to_pylist():
            img = decode(payload)
            # "feature extraction": channel means + downsampled grid
            grid = img.reshape(8, self.size[0] // 8, 8, self.size[1] // 8, 3).mean(axis=(1, 3))
            feats.append(grid.ravel().astype(np.float32).tolist())
        cols = {n: batch[n] for n in batch.column_names if n != "payload"}
        cols["features"] = pa.array(feats, type=pa.list_(pa.float32()))
        return pa.table(cols)


class FrameSampler:
    """Actor-pool stage: binary video -> every-nth-frame payloads (stubbed).

    Output is one row per sampled frame (flat_map shape): (item_id, frame_no,
    payload).  The fake path slices the payload deterministically."""

    def __init__(self, *, every_n: int = 10, max_frames: int = 4, fake: bool = False):
        self.every_n = every_n
        self.max_frames = max_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "video codec not available in this environment; construct with fake=True"
            )
        ids, frames, payloads = [], [], []
        for item_id, payload in zip(batch["item_id"].to_pylist(), batch["payload"].to_pylist()):
            payload = payload or b""
            n = min(self.max_frames, max(1, len(payload) // 64))
            for fi in range(n):
                ids.append(item_id)
                frames.append(fi * self.every_n)
                payloads.append(payload[fi * 64 : (fi + 1) * 64])
        return pa.table(
            {
                "item_id": pa.array(ids, type=pa.int64()),
                "frame_no": pa.array(frames, type=pa.int32()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )
