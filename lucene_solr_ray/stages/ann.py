"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k as the exact baseline (numpy matmul per batch
against a broadcast query matrix — no shuffle, one small merge), and an
IVF-bucketed variant as the scale path (coarse k-means centroids, probe the
closest ``nprobe`` buckets only).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    """(n, d) float32 matrix from a list<float> column — Arrow buffer ->
    numpy reshape, no per-row Python materialization."""
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        flat = np.asarray(col.values, dtype=np.float32)
        return flat.reshape(len(col), col.type.list_size)
    flat = np.asarray(col.flatten(), dtype=np.float32)
    return flat.reshape(len(col), -1) if len(col) else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1
    return m / n


def brute_force_topk(ds, queries: np.ndarray, *, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id"):
    """Exact cosine top-k: per-batch partial top-k, driver merge.

    ``queries``: (Q, d) float array, broadcast once via ``ray.put``.
    Returns list of rows (query_id, rank, vec_id, score) — deterministic
    tie-break (score desc, vec_id asc).
    """
    qn = _normalize(np.asarray(queries, dtype=np.float32))
    q_ref = ray.put(qn)

    def partial(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        ids = np.asarray(batch[id_col], dtype=np.int64)
        sims = q @ m.T  # (Q, B)
        kk = min(k, sims.shape[1])
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[0]):
            # full (score desc, vec_id asc) order so equal-score vectors at the
            # k-th boundary keep the documented tie-break (batch-independent)
            idx = np.lexsort((ids, -sims[qi]))[:kk]
            out_q.extend([qi] * kk)
            out_id.extend(ids[idx].tolist())
            out_s.extend(sims[qi][idx].astype(np.float64).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                id_col: pa.array(out_id, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    by_q: dict[int, list] = {}
    for r in parts:
        by_q.setdefault(r["query_id"], []).append((r["score"], r[id_col]))
    out = []
    for qi in sorted(by_q):
        cand = sorted(by_q[qi], key=lambda sv: (-sv[0], sv[1]))[:k]
        for rank, (s, vid) in enumerate(cand):
            out.append({"query_id": qi, "rank": rank, id_col: vid, "score": s})
    return out


def kmeans_centroids(ds, *, n_clusters: int = 16, vec_col: str = "embedding",
                     sample_rows: int = 4096, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Driver-side k-means on a bounded sample (deterministic)."""
    sample = ds.limit(sample_rows).take_all()
    m = _normalize(np.asarray([r[vec_col] for r in sample], dtype=np.float32))
    rng = np.random.default_rng(seed)
    cent = m[rng.choice(len(m), size=min(n_clusters, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(len(cent)):
            sel = m[assign == c]
            if len(sel):
                cent[c] = sel.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_assign(ds, centroids: np.ndarray, *, vec_col: str = "embedding"):
    """Adds a ``cluster`` column (nearest centroid)."""
    c_ref = ray.put(np.asarray(centroids, dtype=np.float32))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        cl = np.argmax(m @ c.T, axis=1).astype(np.int32)
        return batch.append_column("cluster", pa.array(cl, type=pa.int32()))

    return ds.map_batches(assign, batch_format="pyarrow")


def ivf_topk(ds, queries: np.ndarray, *, k: int = 10, n_clusters: int = 16,
             nprobe: int = 4, vec_col: str = "embedding", id_col: str = "vec_id"):
    """IVF approximate top-k: probe the ``nprobe`` nearest centroid buckets.

    At scale the assigned dataset is written partitioned by ``cluster`` so a
    query touches only nprobe/n_clusters of the data; here the probe filter
    runs inline.  Returns rows like :func:`brute_force_topk` (approximate)."""
    cent = kmeans_centroids(ds, n_clusters=n_clusters, vec_col=vec_col)
    qn = _normalize(np.asarray(queries, dtype=np.float32))
    probes = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    assigned = ivf_assign(ds, cent, vec_col=vec_col)
    wanted = sorted({int(c) for row in probes for c in row})
    filt = assigned.filter(expr=f"cluster in {wanted}")
    rows = brute_force_topk(filt, qn, k=k, vec_col=vec_col, id_col=id_col)
    # drop results from clusters a given query did not probe
    cl_of = {
        r[id_col]: r["cluster"]
        for r in assigned.select_columns([id_col, "cluster"]).take_all()
    }
    out = []
    for r in rows:
        if cl_of[r[id_col]] in probes[r["query_id"]]:
            out.append(r)
    # re-rank after filtering
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    final = []
    for qi in sorted(by_q):
        cand = sorted(by_q[qi], key=lambda r: (-r["score"], r[id_col]))[:k]
        for rank, r in enumerate(cand):
            final.append({**r, "rank": rank})
    return final
