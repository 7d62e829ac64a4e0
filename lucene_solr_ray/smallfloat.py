"""Lossy 8-bit float encoding used for BM25 length norms.

Re-implements (from public Lucene 4.10 semantics, studied at
``lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:78-99``) the
``floatToByte315`` / ``byte315ToFloat`` pair: a 3-mantissa-bit, zero-exponent-15
minifloat.  BM25 norms are ``floatToByte315(boost / sqrt(fieldLength))`` — this
quantization is REQUIRED for rank-identical BM25 scores, so both the Ray
pipeline and the pure-Python oracle share this module.

All functions are numpy-vectorized (operate on arrays of any shape).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "float_to_byte315",
    "byte315_to_float",
    "NORM_TABLE",
    "encode_norm",
]


def float_to_byte315(f) -> np.ndarray:
    """Vectorized ``SmallFloat.floatToByte315``.

    Returns uint8 array (Java's byte reinterpreted unsigned: Java -1 == 255).
    """
    f32 = np.atleast_1d(np.asarray(f, dtype=np.float32))
    bits = f32.view(np.int32)
    smallfloat = bits >> (24 - 3)
    lo = (63 - 15) << 3
    out = (smallfloat - lo).astype(np.int64)
    # underflow: positive subnormal-for-the-encoding -> 1, zero/negative -> 0
    under = smallfloat <= lo
    out = np.where(under, np.where(bits <= 0, 0, 1), out)
    # overflow -> 0xFF (Java (byte)-1)
    out = np.where(smallfloat >= lo + 0x100, 0xFF, out)
    return out.astype(np.uint8)


def byte315_to_float(b) -> np.ndarray:
    """Vectorized ``SmallFloat.byte315ToFloat`` (input uint8)."""
    b = np.atleast_1d(np.asarray(b, dtype=np.uint8))
    bits = (b.astype(np.int32) << (24 - 3)) + ((63 - 15) << 24)
    out = bits.view(np.float32).copy()
    out[b == 0] = 0.0
    return out


# BM25Similarity's static NORM_TABLE: decoded value is 1/f^2 where
# f = byte315ToFloat(b); i.e. the decoded *document length* (approximately),
# since the encoded value was 1/sqrt(dl).  Index 0 decodes to +inf in Java
# (1.0f/0.0f) — keep that.
with np.errstate(divide="ignore"):
    _f = byte315_to_float(np.arange(256, dtype=np.uint8))
    NORM_TABLE: np.ndarray = (np.float32(1.0) / (_f * _f)).astype(np.float32)


def encode_norm(field_lengths, boost: float = 1.0) -> np.ndarray:
    """BM25Similarity.encodeNormValue: floatToByte315(boost / sqrt(length)).

    ``field_lengths`` = post-stopword token count per doc.  Length 0 encodes
    boost/0 = inf -> byte 255 in Java (overflow); we follow.
    """
    dl = np.asarray(field_lengths, dtype=np.float64)
    with np.errstate(divide="ignore"):
        v = (np.float32(boost) / np.sqrt(dl).astype(np.float32)).astype(np.float32)
    return float_to_byte315(v)
