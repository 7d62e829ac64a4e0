"""ClassicSimilarity (TF-IDF) scoring — float32-faithful re-specification.

The reference line is Solr 4.10, where the DEFAULT similarity is the
vector-space TF-IDF, not BM25.  Replicates, with numpy float32 in the same
operation order, the semantics of
``lucene/core/src/java/org/apache/lucene/search/similarities/TFIDFSimilarity.java``
and ``DefaultSimilarity.java``:

* ``tf(freq) = (float) sqrt(freq)``  (DefaultSimilarity.java:36-38)
* ``idf(df, N) = (float)(ln(N / (double)(df + 1)) + 1.0)``
  (DefaultSimilarity.java:60-62)
* ``queryNorm(sumSq) = (float)(1.0 / sqrt(sumOfSquaredWeights))``
  (DefaultSimilarity.java:30-32); IndexSearcher.createNormalizedWeight
  replaces inf/NaN with 1.0f (IndexSearcher.java:684-690)
* IDFStats (TFIDFSimilarity.java:724-761): ``queryWeight = idf * boost``;
  ``valueForNorm = queryWeight * queryWeight`` (f32); after normalize
  ``queryWeight *= queryNorm; value = queryWeight * idf``  — so
  ``value = f32(f32(idf * queryNorm) * idf)`` for boost 1.
* score: ``raw = tf(freq) * value``; ``score = raw * decodeNormValue(b)``
  (TFIDFSimilarity.java:773-782), where DefaultSimilarity's decode is
  ``byte315ToFloat(b)`` directly (NOT BM25's 1/f² table).
* BooleanWeight sums clause valueForNorms in float
  (BooleanQuery.java BooleanWeight.getValueForNormalization) and
  DisjunctionSumScorer accumulates doc scores in double, cast float.

Norm bytes on disk are shared with BM25 (``floatToByte315(1/sqrt(dl))``,
:mod:`lucene_solr_ray.smallfloat`) — only the decode differs.
"""

from __future__ import annotations

import math

import numpy as np

from ..smallfloat import byte315_to_float

__all__ = ["idf", "query_norm", "term_value", "term_scores", "DECODE_TABLE"]

# DefaultSimilarity.decodeNormValue(b) for every byte — f32 exact.
DECODE_TABLE: np.ndarray = byte315_to_float(np.arange(256, dtype=np.uint8))


def idf(df: int, num_docs: int) -> np.float32:
    """(float)(log(numDocs/(double)(docFreq+1)) + 1.0)."""
    return np.float32(math.log(num_docs / (df + 1.0)) + 1.0)


def query_norm(sum_sq: np.float32) -> np.float32:
    """DefaultSimilarity.queryNorm with IndexSearcher's inf/NaN -> 1 guard
    (Java 1.0/sqrt(0) = Infinity -> createNormalizedWeight replaces with 1)."""
    s = float(sum_sq)
    if s <= 0.0 or not math.isfinite(s):
        return np.float32(1.0)
    return np.float32(1.0 / math.sqrt(s))


def sum_sq_weights(idfs: list[np.float32], boosts: list[float] | None = None) -> np.float32:
    """BooleanWeight.getValueForNormalization: f32 sum of per-clause
    ``(idf*boost)²`` (each clause value f32-squared before the f32 add)."""
    acc = np.float32(0.0)
    for i, v in enumerate(idfs):
        w = np.float32(v * np.float32(1.0 if boosts is None else boosts[i]))
        acc = np.float32(acc + np.float32(w * w))
    return acc


def term_value(idf_v: np.float32, qn: np.float32, boost: float = 1.0) -> np.float32:
    """IDFStats.normalize: value = (idf*boost*queryNorm) * idf, f32 each op."""
    qw = np.float32(np.float32(idf_v * np.float32(boost)) * qn)
    return np.float32(qw * idf_v)


def term_scores(
    tfs: np.ndarray, norm_bytes: np.ndarray, value: np.float32
) -> np.ndarray:
    """Vectorized TFIDFSimScorer.score over one term's matched docs:
    ``f32(f32(f32(sqrt(freq)) * value) * decodeNorm(b))``."""
    tf_f = np.sqrt(tfs.astype(np.float32)).astype(np.float32)
    norm = DECODE_TABLE[np.asarray(norm_bytes, dtype=np.uint8)]
    return ((tf_f * np.float32(value)) * norm).astype(np.float32)
