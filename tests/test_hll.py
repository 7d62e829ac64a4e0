"""HyperLogLog sketch: accuracy, merge semantics, determinism."""

import numpy as np
import pyarrow as pa

from lucene_solr_ray.state.hll import HyperLogLog


class TestHLL:
    def test_accuracy_ints(self):
        # standard error for p=12 is ~1.04/sqrt(4096) = 1.6%; allow 4 sigma
        for n in [100, 5_000, 200_000]:
            h = HyperLogLog(12).add_ints(np.arange(n, dtype=np.int64))
            est = h.estimate()
            assert abs(est - n) / n < 0.065, (n, est)

    def test_duplicates_dont_inflate(self):
        vals = np.tile(np.arange(1000, dtype=np.int64), 50)
        est = HyperLogLog(12).add_ints(vals).estimate()
        assert abs(est - 1000) / 1000 < 0.065, est

    def test_merge_equals_single_pass(self):
        vals = np.random.default_rng(3).integers(0, 10**12, size=50_000)
        whole = HyperLogLog(12).add_ints(vals)
        parts = HyperLogLog(12)
        for chunk in np.array_split(vals, 7):
            parts.merge(HyperLogLog(12).add_ints(chunk))
        assert np.array_equal(whole.registers, parts.registers)

    def test_strings(self):
        arr = pa.array([f"user-{i}" for i in range(20_000)])
        est = HyperLogLog(12).add_strings(arr).estimate()
        assert abs(est - 20_000) / 20_000 < 0.065, est

    def test_deterministic(self):
        vals = np.arange(12345, dtype=np.int64)
        a = HyperLogLog(12).add_ints(vals).estimate()
        b = HyperLogLog(12).add_ints(vals).estimate()
        assert a == b
