"""Multimodal stage plumbing: fake-codec determinism + the round-4 codec
INJECTION surface (callable / registry name / codec_module hook) — the real
decode libraries are absent from this container, so injection is the
production path a PIL/ffmpeg cluster uses."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from lucene_solr_ray.stages.multimodal import FrameSampler, ImageDecoder


def _img_batch(n=4, psize=64):
    return pa.table(
        {
            "item_id": pa.array(range(n), type=pa.int64()),
            "payload": pa.array([bytes([i]) * psize for i in range(n)], type=pa.binary()),
        }
    )


class TestImageDecoder:
    def test_fake_path_deterministic(self):
        a = ImageDecoder(fake=True)(_img_batch())
        b = ImageDecoder(fake=True)(_img_batch())
        assert a.equals(b)
        assert all(len(f) == 8 * 8 * 3 for f in a["features"].to_pylist())

    def test_no_codec_raises_honest_stub(self):
        with pytest.raises(NotImplementedError):
            ImageDecoder()(_img_batch())

    def test_injected_callable_codec(self):
        # "real" decoder stand-in: payload bytes -> constant-valued image
        def decode(payload: bytes) -> np.ndarray:
            v = (payload[0] if payload else 0) / 255.0
            return np.full((32, 32, 3), v, dtype=np.float32)

        out = ImageDecoder(codec=decode)(_img_batch())
        feats = out["features"].to_pylist()
        # channel-mean grid of a constant image == the constant
        for i, f in enumerate(feats):
            assert np.allclose(f, i / 255.0)

    def test_injected_codec_resamples_foreign_shape(self):
        def decode(payload: bytes) -> np.ndarray:
            return np.ones((48, 20, 3), dtype=np.float32)  # not 32x32

        out = ImageDecoder(codec=decode)(_img_batch(n=1))
        assert np.allclose(out["features"].to_pylist()[0], 1.0)

    def test_registry_name_lookup(self):
        from lucene_solr_ray.functions.registry import register

        register("codec", "unit_test_img", lambda p: np.zeros((32, 32, 3), np.float32))
        out = ImageDecoder(codec="unit_test_img")(_img_batch(n=2))
        assert np.allclose(out["features"].to_pylist()[0], 0.0)

    def test_unknown_registry_name_raises(self):
        with pytest.raises(KeyError):
            ImageDecoder(codec="no_such_codec")

    def test_actor_pool_with_injected_codec(self, ray_session):
        import ray.data as rd

        def decode(payload: bytes) -> np.ndarray:
            v = (payload[0] if payload else 0) / 255.0
            return np.full((32, 32, 3), v, dtype=np.float32)

        ds = rd.from_arrow(_img_batch(n=8)).map_batches(
            ImageDecoder,
            fn_constructor_kwargs={"codec": decode},
            batch_format="pyarrow",
            batch_size=4,
            concurrency=2,
        )
        rows = sorted(ds.take_all(), key=lambda r: r["item_id"])
        for i, r in enumerate(rows):
            assert np.allclose(r["features"], i / 255.0)


class TestFrameSampler:
    def test_fake_path_shape(self):
        t = pa.table(
            {
                "item_id": pa.array([7], type=pa.int64()),
                "payload": pa.array([b"x" * 200], type=pa.binary()),
            }
        )
        out = FrameSampler(fake=True, every_n=5, max_frames=3)(t)
        assert out["item_id"].to_pylist() == [7, 7, 7]
        assert out["frame_no"].to_pylist() == [0, 5, 10]

    def test_injected_video_codec(self):
        def sample(payload: bytes, every_n: int, max_frames: int):
            return [(i * every_n, payload[:4]) for i in range(2)]

        t = pa.table(
            {
                "item_id": pa.array([1], type=pa.int64()),
                "payload": pa.array([b"abcdef"], type=pa.binary()),
            }
        )
        out = FrameSampler(codec=sample, every_n=3)(t)
        assert out["frame_no"].to_pylist() == [0, 3]
        assert out["payload"].to_pylist() == [b"abcd", b"abcd"]

    def test_no_codec_raises(self):
        with pytest.raises(NotImplementedError):
            FrameSampler()(pa.table({"item_id": pa.array([1], type=pa.int64()),
                                     "payload": pa.array([b""], type=pa.binary())}))
