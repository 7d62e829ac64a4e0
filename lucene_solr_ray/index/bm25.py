"""Exact BM25 scoring math (float32-faithful re-specification).

Replicates, with numpy float32 in the same operation order, the semantics of
``lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java``:

* ``idf = (float) ln(1 + (N - df + 0.5)/(df + 0.5))``  (:64-67)
* ``avgdl = (float)(sumTotalTermFreq / (double) maxDoc)``  (:84-89)
* 256-entry norm cache ``cache[i] = k1*((1-b) + b*NORM_TABLE[i]/avgdl)``
  (:207-211), where ``NORM_TABLE[i] = 1/f²``, ``f = byte315ToFloat(i)``
  (:127-133) — see :mod:`lucene_solr_ray.smallfloat`.
* ``weight = idf * queryBoost * topLevelBoost`` (:292-293);
  ``weightValue = weight * (k1+1)`` (:228)
* ``score(doc, freq) = weightValue * freq / (freq + cache[normByte])``
  (:233-238)

defaults ``k1=1.2, b=0.75`` (:60-61).  The byte315 norm quantization and the
float32 evaluation order are mandatory for rank-identical scores.
"""

from __future__ import annotations

import math

import numpy as np

from ..smallfloat import NORM_TABLE

K1 = np.float32(1.2)
B = np.float32(0.75)
_ONE = np.float32(1.0)

__all__ = ["K1", "B", "idf", "avg_dl", "norm_cache", "term_scores"]


def idf(df: int, num_docs: int) -> np.float32:
    """float-cast of the double-math idf (BM25Similarity.java:64-67)."""
    return np.float32(math.log(1 + (num_docs - df + 0.5) / (df + 0.5)))


def avg_dl(sum_total_term_freq: int, max_doc: int) -> np.float32:
    """avgFieldLength (BM25Similarity.java:84-89); 1 if stat missing."""
    if sum_total_term_freq <= 0:
        return _ONE
    return np.float32(sum_total_term_freq / float(max_doc))


def norm_cache(avgdl: np.float32) -> np.ndarray:
    """256-entry freq-independent cache, float32 ops in Java eval order."""
    # k1 * ((1 - b) + b * decodeNormValue(i) / avgdl)
    return (K1 * ((_ONE - B) + (B * NORM_TABLE) / np.float32(avgdl))).astype(
        np.float32
    )


def term_scores(
    tfs: np.ndarray,
    norm_bytes: np.ndarray,
    cache: np.ndarray,
    weight_value: np.float32,
) -> np.ndarray:
    """Vectorized ``BM25DocScorer.score`` over one term's matched docs."""
    freq = tfs.astype(np.float32)
    norm = cache[np.asarray(norm_bytes, dtype=np.uint8)]
    return ((np.float32(weight_value) * freq) / (freq + norm)).astype(np.float32)
