"""Sparse / packed facet counters — the SOLR-5894 core, re-specified.

Three cooperating pieces, mirroring the fork's design (NOT ports):

* :class:`SparseCounter` — ``SparseCounterInt`` analog
  (`solr/core/src/java/org/apache/solr/request/sparse/SparseCounterInt.java:34-149`):
  a dense counts array plus a *tracker* list of touched ordinals.  While few
  ordinals are touched, iteration/extraction/clearing cost O(touched) instead
  of O(#ordinals); when the touched fraction exceeds the cutoff the counter
  "explodes" to dense mode (`SparseKeys.CUTOFF`,
  `SparseDocValuesFacets.java:133-138`).  The sparse-vs-dense up-front guess
  uses ``hits * avg_refs`` vs ``cutoff * n_ords``
  (`request/sparse/package.html`).

* :class:`NPlaneCounter` — ``NPlaneMutable`` analog
  (`lucene/core/src/java/org/apache/lucene/util/packed/NPlaneMutable.java:30-120`):
  counters split vertically into bit planes sized from the per-ordinal
  maxima histogram (the long-tail shape of
  `LongTailPerformance.java:707-731`: most ordinals need 1-2 bits, few need
  many).  Plane k stores the next ``bits_k`` bits for only the ordinals whose
  maximum needs them; membership is static (maxima are known at build time =
  the value's df) and rank lookup uses a sorted member array
  (``RankBitSet`` analog).  Simplifications vs the reference, documented:
  plane widths are rounded up to powers of two so packed values never cross
  word boundaries (keeps read/write fully vectorizable in numpy), and batch
  increment decodes+re-encodes touched ordinals instead of carrying
  plane-by-plane.

* :class:`CounterPool` — ``SparseCounterPool`` analog
  (`request/sparse/SparseCounterPool.java`): counters for a field are
  expensive to allocate and clear; the pool reuses released counters
  (clear-on-release; the reference's background-clearing threads are an
  optimization Ray actors don't need — release happens off the query path).
"""

from __future__ import annotations

import numpy as np

__all__ = ["SparseCounter", "NPlaneCounter", "CounterPool"]


class SparseCounter:
    """counts[] + touched-ordinal tracker with dense-explosion cutoff."""

    def __init__(self, n_ords: int, cutoff: float = 0.08):
        self.n_ords = n_ords
        self.cutoff = cutoff
        self.counts = np.zeros(n_ords, dtype=np.int64)
        self._touched: np.ndarray | None = np.empty(0, dtype=np.int64)
        # None tracker == exploded to dense (tracking abandoned)

    @property
    def is_sparse(self) -> bool:
        return self._touched is not None

    @staticmethod
    def use_sparse(hits: int, avg_refs: float, n_ords: int, cutoff: float = 0.08) -> bool:
        """Up-front sparse-vs-dense guess (package.html heuristic)."""
        return hits * max(avg_refs, 1e-9) < cutoff * n_ords

    def inc(self, ords: np.ndarray) -> None:
        """Count a batch of ordinal references (duplicates allowed)."""
        if len(ords) == 0:
            return
        uniq, cnt = np.unique(np.asarray(ords, dtype=np.int64), return_counts=True)
        self.counts[uniq] += cnt
        if self._touched is not None:
            self._touched = np.union1d(self._touched, uniq)
            if len(self._touched) > self.cutoff * self.n_ords:
                self._touched = None  # explode: tracking no longer pays

    def nonzero(self) -> tuple[np.ndarray, np.ndarray]:
        """-> (ords, counts) of touched ordinals (sorted by ord)."""
        if self._touched is not None:
            o = self._touched
            c = self.counts[o]
            keep = c > 0
            return o[keep], c[keep]
        nz = np.flatnonzero(self.counts)
        return nz, self.counts[nz]

    def clear(self) -> None:
        if self._touched is not None:
            self.counts[self._touched] = 0
        else:
            self.counts[:] = 0
        self._touched = np.empty(0, dtype=np.int64)


def _pow2_width(bits: int) -> int:
    w = 1
    while w < bits:
        w *= 2
    return min(w, 64)


class NPlaneCounter:
    """Bit-plane packed counter sized by the per-ordinal maxima histogram."""

    def __init__(self, maxima: np.ndarray, plane_bits: tuple = (1, 2, 4, 8, 16, 32)):
        maxima = np.asarray(maxima, dtype=np.int64)
        self.n_ords = len(maxima)
        need = np.maximum(1, np.ceil(np.log2(np.maximum(maxima, 1) + 1)).astype(np.int64))
        self.planes: list[dict] = []
        consumed = 0
        for pb in plane_bits:
            members = np.flatnonzero(need > consumed).astype(np.int32)
            if len(members) == 0:
                break
            w = _pow2_width(pb)
            per_word = 64 // w
            words = np.zeros((len(members) + per_word - 1) // per_word, dtype=np.uint64)
            self.planes.append(
                {"bits": w, "shift": consumed, "members": members, "words": words}
            )
            consumed += w
        self._mask_cache: dict[int, np.uint64] = {}

    # -- packed plane read/write (vectorized; pow2 widths never cross words) --

    def _read(self, plane: dict, pos: np.ndarray) -> np.ndarray:
        w = plane["bits"]
        per_word = 64 // w
        wi = pos // per_word
        sh = ((pos % per_word) * w).astype(np.uint64)
        mask = np.uint64((1 << w) - 1)
        return (plane["words"][wi] >> sh) & mask

    def _write(self, plane: dict, pos: np.ndarray, vals: np.ndarray) -> None:
        w = plane["bits"]
        per_word = 64 // w
        wi = pos // per_word
        sh = ((pos % per_word) * w).astype(np.uint64)
        mask = np.uint64((1 << w) - 1)
        # positions in the same word must be merged, not last-write-wins:
        # clear each slot then OR the contributions (unbuffered ufunc.at)
        contrib = (vals.astype(np.uint64) & mask) << sh
        np.bitwise_and.at(plane["words"], wi, ~(mask << sh))
        np.bitwise_or.at(plane["words"], wi, contrib)

    def get(self, ords: np.ndarray) -> np.ndarray:
        ords = np.asarray(ords, dtype=np.int64)
        out = np.zeros(len(ords), dtype=np.int64)
        for plane in self.planes:
            pos = np.searchsorted(plane["members"], ords)
            ok = (pos < len(plane["members"])) & (
                plane["members"][np.minimum(pos, len(plane["members"]) - 1)] == ords
            )
            if ok.any():
                digits = self._read(plane, pos[ok])
                out[ok] |= digits.astype(np.int64) << plane["shift"]
        return out

    def inc(self, ords: np.ndarray) -> None:
        """Batch increment: decode current values of touched ords, add
        reference counts, re-encode per plane."""
        if len(ords) == 0:
            return
        uniq, cnt = np.unique(np.asarray(ords, dtype=np.int64), return_counts=True)
        vals = self.get(uniq) + cnt
        for plane in self.planes:
            pos = np.searchsorted(plane["members"], uniq)
            ok = (pos < len(plane["members"])) & (
                plane["members"][np.minimum(pos, len(plane["members"]) - 1)] == uniq
            )
            if ok.any():
                digits = (vals[ok] >> plane["shift"]) & ((1 << plane["bits"]) - 1)
                self._write(plane, pos[ok], digits)

    def nonzero(self) -> tuple[np.ndarray, np.ndarray]:
        base = self.planes[0]
        pos = np.arange(len(base["members"]))
        vals = np.zeros(self.n_ords, dtype=np.int64)
        for plane in self.planes:
            p = np.arange(len(plane["members"]))
            vals[plane["members"]] |= self._read(plane, p).astype(np.int64) << plane["shift"]
        nz = np.flatnonzero(vals)
        return nz, vals[nz]

    def clear(self) -> None:
        for plane in self.planes:
            plane["words"][:] = 0

    def memory_bytes(self) -> int:
        return sum(p["words"].nbytes + p["members"].nbytes for p in self.planes)


class CounterPool:
    """Reuse cleared counters per (field, kind) — SparseCounterPool analog."""

    def __init__(self, max_per_key: int = 2):
        self._pool: dict = {}
        self.max_per_key = max_per_key
        self.hits = 0
        self.misses = 0

    def acquire(self, key, factory):
        lst = self._pool.get(key, [])
        if lst:
            self.hits += 1
            return lst.pop()
        self.misses += 1
        return factory()

    def release(self, key, counter) -> None:
        counter.clear()
        lst = self._pool.setdefault(key, [])
        if len(lst) < self.max_per_key:
            lst.append(counter)
