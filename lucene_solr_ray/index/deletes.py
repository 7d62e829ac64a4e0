"""Document deletes — the Lucene liveDocs analog.

Re-specification of `lucene/core/src/java/org/apache/lucene/index/
IndexWriter.java` ``deleteDocuments(Term|Query)`` + the per-segment live-docs
bitset (`SegmentReader.java` ``getLiveDocs`` / the ``.liv`` generation files):
an immutable index gains *tombstone generations* — small sorted doc-id
parquet files under ``<index_dir>/livedocs/`` — and readers opened AFTER a
delete mask those docs out of every query path.

Semantics mirrored from the reference:

* **Point-in-time readers**: a ``GlobalStats``/searcher constructed before a
  delete does not see it (Lucene readers see their commit point; reopen to
  observe).
* **Stale statistics**: df / ttf / avgdl / maxdoc still count deleted docs
  until a rebuild ("deletes don't affect stats until merge",
  `BM25Similarity` reads segment stats that include deleted docs).  Scores
  of surviving docs are therefore BIT-IDENTICAL before/after a delete.
* **Expunge = rebuild/union**: the merge-away-deletes path is an index
  rebuild without the tombstoned rows (immutable-build engine); tombstones
  are cheap until then.

Scale: tombstones ship as ONE sorted int64 array per reader process
(8 B/doc); masking is a vectorized ``searchsorted`` membership test per
posting list.  At extreme delete volumes the anti-join regime from the
url-dedup path applies (partition the tombstones by partition_id) — same
trade documented in SCALE.md.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LIVEDOCS_DIR = "livedocs"


def load_deleted(index_dir: str) -> np.ndarray:
    """Union of all tombstone generations -> sorted unique int64 doc ids."""
    files = sorted(glob.glob(os.path.join(index_dir, LIVEDOCS_DIR, "del_*.parquet")))
    if not files:
        return np.empty(0, dtype=np.int64)
    parts = [np.asarray(pq.read_table(f)["doc_id"], dtype=np.int64) for f in files]
    return np.unique(np.concatenate(parts))


def apply_deletes(index_dir: str, doc_ids=None, query=None) -> int:
    """Tombstone docs by id list and/or by query (deleteDocuments(Query)).

    Appends one generation file; returns the number of NEW ids tombstoned.
    Queries are evaluated against the current index (including earlier
    tombstones — already-deleted docs can't match again)."""
    ids = np.asarray(doc_ids if doc_ids is not None else [], dtype=np.int64)
    if query is not None:
        from ..query.ast import Evaluator
        from .reader import LocalIndex

        docs, _ = Evaluator(LocalIndex(index_dir)).scored(query)
        ids = np.concatenate([ids, docs])
    ids = np.unique(ids)
    prior = load_deleted(index_dir)
    if len(prior):
        idx = np.searchsorted(prior, ids)
        hit = (idx < len(prior)) & (prior[np.minimum(idx, len(prior) - 1)] == ids)
        ids = ids[~hit]
    if len(ids) == 0:
        return 0
    d = os.path.join(index_dir, LIVEDOCS_DIR)
    os.makedirs(d, exist_ok=True)
    gen = len(glob.glob(os.path.join(d, "del_*.parquet")))
    tmp = os.path.join(d, f"_tmp_del_{gen:06d}.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(ids, type=pa.int64())}), tmp)
    os.replace(tmp, os.path.join(d, f"del_{gen:06d}.parquet"))
    return int(len(ids))


def clear_deletes(index_dir: str) -> None:
    for f in glob.glob(os.path.join(index_dir, LIVEDOCS_DIR, "del_*.parquet")):
        os.remove(f)


def mask_deleted(deleted: np.ndarray, docs: np.ndarray) -> np.ndarray:
    """Boolean LIVE mask for ``docs`` (sorted or not) vs sorted tombstones."""
    if len(deleted) == 0 or len(docs) == 0:
        return np.ones(len(docs), dtype=bool)
    idx = np.searchsorted(deleted, docs)
    hit = (idx < len(deleted)) & (deleted[np.minimum(idx, len(deleted) - 1)] == docs)
    return ~hit
