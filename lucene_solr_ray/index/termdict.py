"""Sorted-array term / value dictionaries with binary search over the raw
Arrow buffers.

Replaces the round-1 Python-dict term dictionaries (`terms_global` loaded via
``to_pylist`` into two dicts per process — an actor OOM at web vocabulary
sizes).  A :class:`SortedStrings` keeps the Arrow string column as-is (one
offsets buffer + one data buffer, zero-copy from the file read) and resolves
lookups with O(log n) byte-wise binary search — the sorted-term-array shape
of ``BlockTreeTermsReader`` (`lucene/core/src/java/org/apache/lucene/codecs/
blocktree/BlockTreeTermsReader.java`) without the FST prefix compression.

Order contract: the underlying array must be sorted by UTF-8 bytes — the
order Arrow's ``sort_by`` uses for strings and the order the build writes
(`sorted(key=s.encode())`), and identical to Python ``str`` ordering for the
code points involved.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class SortedStrings:
    """A sorted Arrow string column with binary-search lookup.

    Supports ``len``, ``[i] -> str``, :meth:`index`, :meth:`prefix_range`
    and iteration.  No per-element Python objects are created at load.
    """

    __slots__ = ("arr", "_off", "_data")

    def __init__(self, arr):
        from ..hashing import _flat_bytes

        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        self.arr = arr
        self._data, self._off = _flat_bytes(arr)

    def __len__(self) -> int:
        return len(self.arr)

    def _bytes_at(self, i: int) -> bytes:
        return self._data[self._off[i] : self._off[i + 1]].tobytes()

    def __getitem__(self, i) -> str:
        if isinstance(i, (int, np.integer)):
            return self._bytes_at(int(i)).decode("utf-8")
        raise TypeError(i)

    def __iter__(self):
        for i in range(len(self.arr)):
            yield self._bytes_at(i).decode("utf-8")

    def iter_range(self, lo: int, hi: int):
        """Stream values of ranks [lo, hi) (shared streaming-scan interface
        with the sharded dictionary view)."""
        for i in range(lo, hi):
            yield self._bytes_at(i).decode("utf-8")

    def to_pylist(self) -> list[str]:
        return self.arr.to_pylist()

    def __eq__(self, other) -> bool:
        if isinstance(other, SortedStrings):
            return self.arr == other.arr
        if isinstance(other, list):
            return self.to_pylist() == other
        return NotImplemented

    def lower_bound(self, b: bytes) -> int:
        """First index i with value[i] >= b (== len if none)."""
        lo, hi = 0, len(self.arr)
        while lo < hi:
            mid = (lo + hi) // 2
            if self._bytes_at(mid) < b:
                lo = mid + 1
            else:
                hi = mid
        return lo

    def index(self, value: str) -> int:
        """Index of ``value``, or -1 if absent."""
        b = value.encode("utf-8") if isinstance(value, str) else bytes(value)
        i = self.lower_bound(b)
        if i < len(self.arr) and self._bytes_at(i) == b:
            return i
        return -1

    def __contains__(self, value) -> bool:
        return self.index(value) >= 0

    def prefix_range(self, prefix: str) -> tuple[int, int]:
        """[lo, hi) of values starting with ``prefix`` (sorted range scan)."""
        b = prefix.encode("utf-8")
        lo = self.lower_bound(b)
        hi = self.lower_bound(b + b"\xff\xff\xff\xff")
        return lo, hi


class SortedKeyMap:
    """Read-only ``{term: value}`` facade over (SortedStrings, numpy values).

    Keeps the round-1 dict call sites (``.get``, ``in``, iteration, ``==``)
    working without materializing Python dicts.
    """

    __slots__ = ("keys", "values")

    def __init__(self, keys: SortedStrings, values: np.ndarray):
        self.keys = keys
        self.values = values

    def get(self, term: str, default=0):
        i = self.keys.index(term)
        return default if i < 0 else self.values[i].item()

    def __contains__(self, term) -> bool:
        return term in self.keys

    def __iter__(self):
        return iter(self.keys)

    def __len__(self) -> int:
        return len(self.values)

    def __eq__(self, other) -> bool:
        if isinstance(other, SortedKeyMap):
            return self.keys.arr == other.keys.arr and np.array_equal(self.values, other.values)
        if isinstance(other, dict):
            return dict(zip(iter(self.keys), self.values.tolist())) == other
        return NotImplemented
