"""Document clustering: hashed-TF-IDF k-means over a Ray Dataset.

Surface analog of the reference's clustering contrib
(`solr/contrib/clustering/src/java/org/apache/solr/handler/clustering/` —
Carrot2's Lingo/STC cluster search results; this engine clusters at corpus
scale instead, the shape a training-data pipeline needs).  Algorithm is the
standard Lloyd iteration expressed Ray-Data-first:

* **featurize** — stateless ``map_batches``: tokenize (simple chain), hash
  each term into ``dim`` buckets (feature hashing with the repo's
  deterministic 64-bit string hash), weight by log-tf, L2-normalize.
  float32, one numpy pass per batch.
* **iterate** — per round, centroids are broadcast ONCE via ``ray.put``;
  each batch computes cosine assignments (one matmul) and emits k partial
  (sum-vector, count) rows; the driver reduces k×dim floats — O(k·dim)
  driver state, independent of corpus size.
* **assign** — final stateless pass emitting (doc_id, cluster).

Determinism: seeds are the first ``k`` docs with distinct non-zero vectors
in doc_id order; ties in assignment break toward the lower cluster index.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..hashing import hash_strings_u64

_TOKEN_RE = None


def _featurize_np(texts: list, dim: int) -> np.ndarray:
    """(n, dim) float32 L2-normalized hashed log-tf matrix."""
    import re

    global _TOKEN_RE
    if _TOKEN_RE is None:
        _TOKEN_RE = re.compile(r"[a-z0-9]+")
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        toks = _TOKEN_RE.findall((t or "").lower())
        if not toks:
            continue
        hs = hash_strings_u64(pa.array(toks, type=pa.string())) % dim
        counts = np.bincount(hs.astype(np.int64), minlength=dim).astype(np.float32)
        nz = counts > 0
        counts[nz] = 1.0 + np.log(counts[nz])
        n = float(np.linalg.norm(counts))
        if n > 0:
            out[i] = counts / np.float32(n)
    return out


def featurize_batch(t: pa.Table, *, dim: int = 256, text_col: str = "text") -> pa.Table:
    v = _featurize_np(t[text_col].to_pylist(), dim)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "vec": pa.FixedSizeListArray.from_arrays(
                pa.array(v.reshape(-1), type=pa.float32()), dim
            ),
        }
    )


def _batch_matrix(t: pa.Table, dim: int) -> np.ndarray:
    col = t["vec"].combine_chunks() if isinstance(t["vec"], pa.ChunkedArray) else t["vec"]
    return np.asarray(col.values, dtype=np.float32).reshape(-1, dim)


def kmeans_docs(
    ds,
    *,
    k: int = 8,
    dim: int = 256,
    iters: int = 10,
    text_col: str = "text",
):
    """-> (assignments Dataset[(doc_id, cluster)], centroids (k, dim)).

    ``ds`` must contain (doc_id, text).  The feature dataset is materialized
    once (vectors are dim·4 bytes/doc — smaller than the text) and iterated
    over; every round moves only k×(dim+1) floats per BLOCK to the driver.
    """
    feats = ds.map_batches(
        featurize_batch,
        batch_format="pyarrow",
        fn_kwargs={"dim": dim, "text_col": text_col},
    ).materialize()

    # deterministic seeds: first k distinct non-zero vectors in doc_id order
    seed_rows = []
    seen: set = set()
    for batch in feats.sort("doc_id").iter_batches(batch_format="pyarrow"):
        m = _batch_matrix(batch, dim)
        for row in m:
            if float(np.linalg.norm(row)) == 0.0:
                continue
            key = row.tobytes()
            if key in seen:
                continue
            seen.add(key)
            seed_rows.append(row.copy())
            if len(seed_rows) >= k:
                break
        if len(seed_rows) >= k:
            break
    if len(seed_rows) < k:
        raise ValueError(f"corpus has fewer than k={k} distinct documents")
    centroids = np.stack(seed_rows)

    for _ in range(iters):
        ref = ray.put(centroids)

        def partials(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _batch_matrix(t, dim)
            # cosine == dot (rows are L2-normalized; centroids renormalized)
            a = np.argmax(m @ c.T, axis=1)
            sums = np.zeros((c.shape[0], dim), dtype=np.float64)
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=c.shape[0]).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(range(c.shape[0]), type=pa.int64()),
                    "sum": pa.FixedSizeListArray.from_arrays(
                        pa.array(sums.reshape(-1), type=pa.float64()), dim
                    ),
                    "count": pa.array(counts, type=pa.int64()),
                }
            )

        agg = np.zeros((k, dim), dtype=np.float64)
        cnt = np.zeros(k, dtype=np.int64)
        for b in feats.map_batches(partials, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            ci = np.asarray(b["cluster"], dtype=np.int64)
            sm = np.asarray(
                (b["sum"].combine_chunks() if isinstance(b["sum"], pa.ChunkedArray) else b["sum"]).values,
                dtype=np.float64,
            ).reshape(-1, dim)
            agg[ci] += sm
            cnt[ci] += np.asarray(b["count"], dtype=np.int64)
        new = centroids.copy()
        nz = cnt > 0
        new[nz] = (agg[nz] / cnt[nz, None]).astype(np.float32)
        norms = np.linalg.norm(new, axis=1)
        new[norms > 0] /= norms[norms > 0, None]
        if np.allclose(new, centroids, atol=1e-6):
            centroids = new
            break
        centroids = new

    ref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _batch_matrix(t, dim)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "cluster": pa.array(np.argmax(m @ c.T, axis=1), type=pa.int64()),
            }
        )

    return feats.map_batches(assign, batch_format="pyarrow"), centroids
