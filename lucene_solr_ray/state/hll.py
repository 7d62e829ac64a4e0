"""HyperLogLog cardinality sketch (mergeable, numpy-vectorized).

The reference exposes approximate distinct counting as the StatsComponent
``cardinality`` option backed by HyperLogLog
(`solr/core/src/java/org/apache/solr/handler/component/StatsValuesFactory.java`
HllStats; the algorithm is Flajolet et al. 2007, with the standard bias /
small-range corrections).  This implementation is Ray-Data-shaped: each
``map_batches`` task folds its rows into a (2^p,)-register partial, partials
merge with an elementwise max, and only the tiny register array ever leaves
a worker — the combiner pattern of every pre-aggregated shuffle here.
"""

from __future__ import annotations

import numpy as np

from ..hashing import hash_strings_u64


class HyperLogLog:
    """Registers-only HLL; ``p`` index bits -> 2^p single-byte registers."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = (
            np.zeros(self.m, dtype=np.uint8) if registers is None else registers
        )

    # -- building -------------------------------------------------------------

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        """Fold uint64 hashes in (vectorized: one bincount-max per call)."""
        h = np.asarray(h, dtype=np.uint64)
        if len(h) == 0:
            return self
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        with np.errstate(over="ignore"):
            rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # leading zeros of the remaining bits, 16-bit-chunk scan (4 passes);
        # bit_length(c) = ceil(log2(c+1)) is float-exact for c <= 2^16
        bits = rest
        acc = np.zeros(len(h), dtype=np.int64)
        remaining = np.ones(len(h), dtype=bool)
        for _ in range(4):
            chunk = ((bits >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.int64)
            zc = 16 - np.ceil(np.log2(chunk + 1)).astype(np.int64)
            acc += np.where(remaining, zc, 0)
            remaining &= chunk == 0
            with np.errstate(over="ignore"):
                bits = bits << np.uint64(16)
        rank = np.minimum(acc + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def add_strings(self, arr) -> "HyperLogLog":
        return self.add_hashes(hash_strings_u64(arr))

    def add_ints(self, vals: np.ndarray) -> "HyperLogLog":
        v = np.asarray(vals).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = v * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(29)
            h = h * np.uint64(0xBF58476D1CE4E5B9)
            h ^= h >> np.uint64(32)
        return self.add_hashes(h)

    # -- merging / estimating -------------------------------------------------

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("p mismatch")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.exp2(-self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # linear counting, small range
        return float(e)
