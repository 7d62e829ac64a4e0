"""Posting-list codec: delta + FOR bit-packing (128-doc blocks) + VByte tail.

Layout mirrors the *shape* of the reference codec (studied at
``lucene/core/src/java/org/apache/lucene/codecs/lucene41/Lucene41PostingsFormat.java:104-157``:
128-doc FOR-compressed blocks, VInt tail, one skip entry per block) but is a
new numpy implementation over Arrow binary cells, not a port.

A posting cell = the postings of one term within one index partition:

* ``docs`` blob:  full 128-doc blocks of doc-id deltas, each ``[width:uint8]``
  + ``128*width`` bits little-endian-packed; then a VByte tail for the last
  ``n % 128`` deltas.
* ``freqs`` blob: same block structure over term frequencies (not deltas).
* ``positions`` blob (optional): VByte of per-doc position-delta streams,
  concatenated in doc order; per-doc counts are the freqs.
* skip/block-max sidecar (per 128-block, kept as Arrow list columns):
  ``skip_last_doc`` (last docid of block), ``bm_max_tf`` (max tf in block),
  ``bm_min_dl`` (min decoded norm value = smallest quantized doc length in the
  block).  ``score_bound(block) = weight * max_tf / (max_tf + k1*((1-b) +
  b*min_dl/avgdl))`` is a valid upper bound because BM25 is increasing in tf
  and decreasing in dl — this is the block-max WAND metadata
  (`Lucene41SkipWriter.java` analog; WAND itself is our addition, the
  reference scores exhaustively).
"""

from __future__ import annotations

import numpy as np

BLOCK = 128  # Lucene41PostingsFormat.BLOCK_SIZE (:388)

__all__ = ["BLOCK", "encode_cell", "decode_docs_freqs", "decode_positions"]


# ---- bit packing ------------------------------------------------------------

def _pack_for(vals: np.ndarray) -> bytes:
    """FOR-pack one full block of BLOCK uint32 values: [width][payload]."""
    vmax = int(vals.max(initial=0))
    width = max(1, int(vmax).bit_length())
    shifts = np.arange(width, dtype=np.uint32)
    bits = ((vals[:, None].astype(np.uint64) >> shifts) & 1).astype(np.uint8)
    return bytes([width]) + np.packbits(bits.ravel(), bitorder="little").tobytes()


def _unpack_for(buf: memoryview, off: int) -> tuple[np.ndarray, int]:
    width = buf[off]
    nbytes = (BLOCK * width + 7) // 8
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8, count=nbytes, offset=off + 1),
        bitorder="little",
    )[: BLOCK * width].reshape(BLOCK, width)
    vals = bits.astype(np.uint64) @ (np.uint64(1) << np.arange(width, dtype=np.uint64))
    return vals, off + 1 + nbytes


# ---- vbyte ------------------------------------------------------------------

def _vbyte_encode(vals: np.ndarray) -> bytes:
    out = bytearray()
    for v in vals.tolist():
        v = int(v)
        while v >= 0x80:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        out.append(v)
    return bytes(out)


def _vbyte_decode(buf, off: int, n: int) -> tuple[np.ndarray, int]:
    out = np.empty(n, dtype=np.uint64)
    for i in range(n):
        v = 0
        shift = 0
        while True:
            b = buf[off]
            off += 1
            v |= (b & 0x7F) << shift
            if b < 0x80:
                break
            shift += 7
        out[i] = v
    return out, off


def _encode_stream(vals: np.ndarray) -> bytes:
    """Full blocks FOR-packed + VByte tail."""
    nfull = (len(vals) // BLOCK) * BLOCK
    parts = [
        _pack_for(vals[i : i + BLOCK]) for i in range(0, nfull, BLOCK)
    ]
    parts.append(_vbyte_encode(vals[nfull:]))
    return b"".join(parts)


def _decode_stream(blob: bytes, n: int) -> np.ndarray:
    buf = memoryview(blob)
    out = np.empty(n, dtype=np.uint64)
    off = 0
    i = 0
    while i + BLOCK <= n:
        out[i : i + BLOCK], off = _unpack_for(buf, off)
        i += BLOCK
    if i < n:
        out[i:], _ = _vbyte_decode(buf, off, n - i)
    return out


# ---- cell codec -------------------------------------------------------------

def encode_cell(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    positions: list[np.ndarray] | None = None,
) -> dict:
    """Encode one (term, partition) posting cell.

    ``doc_ids`` must be sorted ascending; ``dls`` are the *decoded* quantized
    doc lengths (``NORM_TABLE[norm_byte]``) used only for block-max metadata.
    Returns a dict of plain-python/numpy values ready for an Arrow row.
    """
    n = len(doc_ids)
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    deltas = np.diff(doc_ids, prepend=np.uint64(0))
    docs_blob = _encode_stream(deltas)
    freqs_blob = _encode_stream(tfs)

    nblocks = (n + BLOCK - 1) // BLOCK
    skip_last, bm_tf, bm_dl = [], [], []
    dls = np.asarray(dls, dtype=np.float32)
    for bi in range(nblocks):
        s = slice(bi * BLOCK, min(n, (bi + 1) * BLOCK))
        skip_last.append(int(doc_ids[s][-1]))
        bm_tf.append(int(tfs[s].max()))
        bm_dl.append(float(dls[s].min()))

    row = {
        "df": n,
        "ttf": int(tfs.sum()),
        "docs": docs_blob,
        "freqs": freqs_blob,
        "skip_last_doc": skip_last,
        "bm_max_tf": bm_tf,
        "bm_min_dl": bm_dl,
    }
    if positions is not None:
        pos_parts = []
        for p in positions:
            p = np.asarray(p, dtype=np.uint64)
            pos_parts.append(_vbyte_encode(np.diff(p, prepend=np.uint64(0))))
        row["positions"] = b"".join(pos_parts)
    return row


def decode_docs_freqs(docs_blob: bytes, freqs_blob: bytes, n: int) -> tuple[np.ndarray, np.ndarray]:
    """-> (doc_ids int64 asc, tfs int64)."""
    deltas = _decode_stream(docs_blob, n)
    doc_ids = np.cumsum(deltas, dtype=np.uint64)
    tfs = _decode_stream(freqs_blob, n)
    return doc_ids.astype(np.int64), tfs.astype(np.int64)


def decode_positions(pos_blob: bytes, tfs: np.ndarray) -> list[np.ndarray]:
    """-> per-doc position arrays (absolute positions)."""
    buf = memoryview(pos_blob)
    off = 0
    out = []
    for tf in np.asarray(tfs).tolist():
        deltas, off = _vbyte_decode(buf, off, int(tf))
        out.append(np.cumsum(deltas).astype(np.int64))
    return out
