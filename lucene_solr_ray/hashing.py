"""Vectorized deterministic hashing over Arrow string/binary columns.

Replaces per-row ``zlib.crc32`` / ``hashlib`` Python loops on shuffle-prep hot
paths (bucket keys for groupby exchanges, shingle hashes for MinHash) with
numpy polynomial rolling hashes over the raw Arrow byte buffers — zero-copy
from the column, wraparound uint64 arithmetic (multiply-shift universal
hashing family, Dietzfelbinger et al.), deterministic across processes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_P = np.uint64(1099511628211)  # FNV-1a prime as the polynomial base
_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio finalizer multiplier

_PW_CACHE: dict[int, np.ndarray] = {}


def _powers(n: int) -> np.ndarray:
    """[P^0, P^1, ..., P^(n-1)] in wraparound uint64."""
    have = _PW_CACHE.get(0)
    if have is None or len(have) < n:
        m = max(n, 4096)
        pw = np.empty(m, dtype=np.uint64)
        pw[0] = 1
        with np.errstate(over="ignore"):
            np.multiply.accumulate(np.full(m - 1, _P, dtype=np.uint64), out=pw[1:])
        _PW_CACHE[0] = pw
        have = pw
    return have


def _flat_bytes(arr) -> tuple[np.ndarray, np.ndarray]:
    """-> (flat uint8 data, int64 offsets rebased to 0) for a string/binary
    Arrow array (nulls treated as empty strings)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        # the Arrow spec only requires MONOTONE offsets — a null slot may
        # legally span garbage bytes.  Rewrite nulls to genuine empty strings
        # (one copy, null path only) so their hash is the length-0 hash.
        import pyarrow.compute as _pc

        fill = b"" if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type) else ""
        arr = _pc.fill_null(arr, fill)
    t = arr.type
    if pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        odt = np.int64
    else:
        odt = np.int32
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=odt)[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    flat = data[off[0] : off[-1]]
    off = off - off[0]
    return flat, off


def hash_strings_u64(arr) -> np.ndarray:
    """Deterministic uint64 hash per element of a string/binary column.

    h(s) = (sum_i s[i] * P^i + len(s)) * MIX  (wraparound uint64).
    Empty / null -> hash of length 0.  Fully vectorized: one multiply + one
    segmented sum over the flat byte buffer.
    """
    flat, off = _flat_bytes(arr)
    n = len(off) - 1
    lens = np.diff(off)
    out = np.zeros(n, dtype=np.uint64)
    if len(flat):
        pw = _powers(int(lens.max()))
        rel = np.arange(len(flat), dtype=np.int64) - np.repeat(off[:-1], lens)
        with np.errstate(over="ignore"):
            terms = flat.astype(np.uint64) * pw[rel]
        nz = lens > 0
        with np.errstate(over="ignore"):
            out[nz] = np.add.reduceat(terms, off[:-1][nz])
    with np.errstate(over="ignore"):
        out = (out + lens.astype(np.uint64)) * _MIX
    return out


def bucket_strings(arr, buckets: int) -> np.ndarray:
    """int64 bucket id per element of a string/binary column."""
    return (hash_strings_u64(arr) % np.uint64(buckets)).astype(np.int64)


def bucket_ints(vals: np.ndarray, buckets: int) -> np.ndarray:
    """int64 bucket id per element of an integer array (multiply-shift)."""
    v = np.asarray(vals).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = v * _MIX
    return (h % np.uint64(buckets)).astype(np.int64)


def with_bucket(col: str, buckets: int):
    """map_batches fn factory: appends ``__b`` = hash bucket of an int64
    column (the shuffle-prep step of every bucketed groupby pattern)."""

    def fn(t: pa.Table) -> pa.Table:
        v = np.asarray(t[col]).astype(np.uint64)
        with np.errstate(over="ignore"):
            b = ((v * _MIX) % np.uint64(buckets)).astype(np.int64)
        if "__b" in t.column_names:
            t = t.drop_columns(["__b"])
        return t.append_column("__b", pa.array(b, type=pa.int64()))

    return fn


def bucket_column(col, buckets: int) -> np.ndarray:
    """Bucket ids for an arbitrary Arrow column (ints fast path, else bytes)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        return bucket_ints(np.asarray(col), buckets)
    if not (
        pa.types.is_string(col.type)
        or pa.types.is_binary(col.type)
        or pa.types.is_large_string(col.type)
        or pa.types.is_large_binary(col.type)
    ):
        col = col.cast(pa.string())
    return bucket_strings(col, buckets)


def _cumsum0(a: np.ndarray) -> np.ndarray:
    return np.concatenate(([0], np.cumsum(a)[:-1])).astype(np.int64)


def shingle_hashes_flat(flat: np.ndarray, off: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hashes of all character k-shingles of every string.

    ``flat``/``off`` as returned by :func:`_flat_bytes`.  Returns
    (hashes, doc_of) where ``doc_of[i]`` is the row index owning shingle i.
    Strings shorter than k contribute ONE shingle: the hash of the whole
    string zero-padded to k (window never crosses a document boundary, so
    results are independent of how rows are batched).  Vectorized via a
    sliding window view — no per-shingle Python.
    """
    n = len(off) - 1
    lens = np.diff(off)
    counts = np.where(lens >= k, lens - k + 1, 1).astype(np.int64)
    total = int(counts.sum())
    doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    out = np.zeros(total, dtype=np.uint64)
    if len(flat) == 0:
        return out, doc_of
    pw = _powers(max(k, int(lens.max()) + 1))
    out_start = _cumsum0(counts)
    long_doc = lens >= k
    if long_doc.any():
        fl = np.concatenate([flat, np.zeros(k - 1, dtype=np.uint8)])
        win = np.lib.stride_tricks.sliding_window_view(fl, k)
        with np.errstate(over="ignore"):
            h_all = (win.astype(np.uint64) * pw[None, :k]).sum(axis=1, dtype=np.uint64)
            h_all = h_all * _MIX
        sel = np.repeat(long_doc, counts)  # per-output: belongs to a long doc
        first = np.repeat(out_start, counts)
        local = np.arange(total, dtype=np.int64) - first
        starts = np.repeat(off[:-1], counts) + local
        out[sel] = h_all[starts[sel]]
    short_idx = np.flatnonzero(~long_doc)
    if len(short_idx):
        # zero-pad semantics: trailing zero bytes contribute nothing to the
        # polynomial, so the padded shingle hash = poly hash of the raw bytes
        sl = lens[short_idx]
        ne = sl > 0
        h_s = np.zeros(len(short_idx), dtype=np.uint64)
        if ne.any():
            seg_starts = off[:-1][short_idx[ne]]
            seg_lens = sl[ne]
            nbytes = int(seg_lens.sum())
            local = np.arange(nbytes, dtype=np.int64) - np.repeat(_cumsum0(seg_lens), seg_lens)
            byte_idx = np.repeat(seg_starts, seg_lens) + local
            with np.errstate(over="ignore"):
                vals = flat[byte_idx].astype(np.uint64) * pw[local]
                h_s[ne] = np.add.reduceat(vals, _cumsum0(seg_lens))
        with np.errstate(over="ignore"):
            out[out_start[short_idx]] = h_s * _MIX
    return out, doc_of
