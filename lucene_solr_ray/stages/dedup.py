"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

First-class training-data-pipeline components (beyond the reference's
operator set; its exact-dedup analogs are ``SignatureUpdateProcessor`` +
``overwriteDupes`` and the MR
``RetainMostRecentUpdateConflictResolver`` — SURVEY.md §2.8).

All operators are Ray-Data-shaped:

* exact: vectorized hash column -> hash-partitioned ``groupby.map_groups``
  keep-first (smallest id: deterministic).
* MinHash: per-batch vectorized signatures -> explode to (band, band_hash)
  rows -> ``groupby(["band","band_hash"])`` bucket join -> candidate pairs ->
  min-label propagation to clusters.  Signatures are mergeable partials; the
  only all-to-all is over (doc, band) rows, never full texts.
* SimHash: 64-bit signature per doc; near-dup buckets via 4-way band split
  (Hamming distance <= 3 guarantees an exact match in one of 4 16-bit bands).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..analysis.tokenizer import simple_tokenize

_MERSENNE = (1 << 61) - 1


# ---- exact ------------------------------------------------------------------


def add_content_hash(batch: pa.Table, *, text_col: str = "text", out: str = "content_hash") -> pa.Table:
    h = [
        hashlib.sha1((t or "").encode("utf-8")).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column(out, pa.array(h, type=pa.string()))


def exact_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the smallest-id row per identical content (deterministic)."""

    def keep_first(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_pylist()
        return group.slice(ids.index(min(ids)), 1)

    return (
        ds.map_batches(add_content_hash, batch_format="pyarrow", fn_kwargs={"text_col": text_col})
        .groupby("content_hash")
        .map_groups(keep_first, batch_format="pyarrow")
    )


# ---- minhash ----------------------------------------------------------------


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Hashes of character k-shingles (uint64)."""
    t = (text or "").lower()
    if len(t) < k:
        t = t + "\x00" * (k - len(t))
    views = [t[i : i + k] for i in range(len(t) - k + 1)]
    out = np.fromiter(
        (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big") for s in set(views)),
        dtype=np.uint64,
    )
    return out


def _perm_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_perm, dtype=np.uint64) | np.uint64(1)  # odd
    b = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, num_perm: int = 64, k: int = 5, seed: int = 1) -> np.ndarray:
    """Vectorized minhash: multiply-shift universal hashing in wrapping
    uint64 (`(a*h+b)` with odd multiplier — Dietzfelbinger et al.), no
    big-int math; deterministic for fixed seed."""
    a, b = _perm_params(num_perm, seed)
    h = _shingle_hashes(text, k)
    if len(h) == 0:
        return np.zeros(num_perm, dtype=np.uint64)
    with np.errstate(over="ignore"):
        vals = a[:, None] * h[None, :] + b[:, None]  # uint64 wraparound
    return vals.min(axis=1)


def minhash_bands_batch(
    batch: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
) -> pa.Table:
    """-> (doc_id, band, band_hash) rows — the LSH shuffle payload."""
    rows_per_band = num_perm // bands
    ids, bnds, hashes = [], [], []
    for doc_id, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
        sig = minhash_signature(text, num_perm, k)
        segs = sig.reshape(bands, rows_per_band)
        for b in range(bands):
            ids.append(doc_id)
            bnds.append(b)
            # int64 band key (int groupby keys sort ~10x faster than strings)
            hashes.append(
                int.from_bytes(
                    hashlib.blake2b(segs[b].tobytes(), digest_size=8).digest(), "big"
                )
                >> 1
            )
    return pa.table(
        {
            id_col: pa.array(ids, type=pa.int64()),
            "band": pa.array(bnds, type=pa.int32()),
            "band_hash": pa.array(hashes, type=pa.int64()),
        }
    )


def minhash_clusters(ds, *, text_col: str = "text", id_col: str = "doc_id",
                     num_perm: int = 64, bands: int = 16, k: int = 5, rounds: int = 3):
    """-> Dataset[(doc_id, cluster_id)]; cluster_id = min doc_id reachable
    through shared LSH buckets (min-label propagation, `rounds` iterations).

    Each iteration is a pair of small groupbys over (doc, band) rows —
    O(docs*bands) shuffle rows, never text payloads.  ``rounds=3`` closes
    chains of length 2^3; raise for pathological chaining.
    """
    from ray.data.aggregate import Min

    bands_ds = ds.map_batches(
        minhash_bands_batch,
        batch_format="pyarrow",
        fn_kwargs={"text_col": text_col, "id_col": id_col, "num_perm": num_perm, "bands": bands, "k": k},
    ).materialize()

    # label <- min(doc_id) within bucket; doc label <- min over its buckets
    labels = None
    for _ in range(rounds):
        if labels is None:
            with_labels = bands_ds
            lab_col = id_col
        else:
            # join current labels onto band rows (broadcast: labels are tiny
            # (doc_id,label) pairs relative to corpus text)
            lab_map = {r[id_col]: r["label"] for r in labels.take_all()}
            import ray

            ref = ray.put(lab_map)

            def attach(t: pa.Table) -> pa.Table:
                import ray as _ray

                m = _ray.get(ref)
                lab = [m[i] for i in t[id_col].to_pylist()]
                return t.append_column("label", pa.array(lab, type=pa.int64()))

            with_labels = bands_ds.map_batches(attach, batch_format="pyarrow")
            lab_col = "label"
        bucket_min = with_labels.groupby(["band", "band_hash"]).aggregate(
            Min(lab_col, alias_name="bucket_label")
        )
        bm = {
            (r["band"], r["band_hash"]): r["bucket_label"] for r in bucket_min.take_all()
        }
        import ray

        bm_ref = ray.put(bm)

        def doc_label(t: pa.Table) -> pa.Table:
            import ray as _ray

            m = _ray.get(bm_ref)
            lab = [
                m[(b, h)]
                for b, h in zip(t["band"].to_pylist(), t["band_hash"].to_pylist())
            ]
            return pa.table(
                {
                    id_col: t[id_col],
                    "label": pa.array(lab, type=pa.int64()),
                }
            )

        labels = (
            bands_ds.map_batches(doc_label, batch_format="pyarrow")
            .groupby(id_col)
            .aggregate(Min("label", alias_name="label"))
        ).materialize()
    return labels.map_batches(
        lambda t: pa.table({id_col: t[id_col], "cluster_id": t["label"]}),
        batch_format="pyarrow",
    )


def minhash_dedup(ds, **kw):
    """Keep one representative (min doc_id) per near-dup cluster."""
    id_col = kw.get("id_col", "doc_id")
    clusters = minhash_clusters(ds, **kw)
    keep = {r[id_col] for r in clusters.take_all() if r[id_col] == r["cluster_id"]}
    import ray

    ref = ray.put(keep)

    def filt(t: pa.Table) -> pa.Table:
        import ray as _ray

        s = _ray.get(ref)
        mask = pa.array([i in s for i in t[id_col].to_pylist()], type=pa.bool_())
        return t.filter(mask)

    return ds.map_batches(filt, batch_format="pyarrow")


# ---- simhash ----------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigrams weighted by tf."""
    toks = simple_tokenize(text or "")
    if not toks:
        return 0
    freqs: dict[str, int] = {}
    for t in toks:
        freqs[t] = freqs.get(t, 0) + 1
    acc = np.zeros(64, dtype=np.int64)
    for t, f in freqs.items():
        h = int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits == 1, f, -f)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_batch(batch: pa.Table, *, text_col: str = "text", out: str = "simhash") -> pa.Table:
    sigs = [simhash64(t) for t in batch[text_col].to_pylist()]
    return batch.append_column(out, pa.array(np.array(sigs, dtype=np.uint64), type=pa.uint64()))


def simhash_near_dup_pairs(ds, *, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3):
    """Candidate near-dup pairs via 4×16-bit band buckets + exact Hamming
    verify (any pair within Hamming<=3 of 64 bits shares at least one of 4
    16-bit bands exactly — pigeonhole)."""
    sigs = ds.map_batches(
        simhash_batch, batch_format="pyarrow", fn_kwargs={"text_col": text_col}
    ).select_columns([id_col, "simhash"])

    def explode(t: pa.Table) -> pa.Table:
        ids, band, key, sig = [], [], [], []
        for i, s in zip(t[id_col].to_pylist(), t["simhash"].to_pylist()):
            for b in range(4):
                ids.append(i)
                band.append(b)
                key.append((int(s) >> (16 * b)) & 0xFFFF)
                sig.append(int(s))
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "band": pa.array(band, type=pa.int32()),
                "key": pa.array(key, type=pa.int32()),
                "simhash": pa.array(np.array(sig, dtype=np.uint64), type=pa.uint64()),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_pylist()
        sigs_ = [int(x) for x in group["simhash"].to_pylist()]
        a_l, b_l, d_l = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = bin(sigs_[i] ^ sigs_[j]).count("1")
                if d <= max_hamming and ids[i] != ids[j]:
                    a, b = sorted((ids[i], ids[j]))
                    a_l.append(a)
                    b_l.append(b)
                    d_l.append(d)
        return pa.table(
            {
                "a": pa.array(a_l, type=pa.int64()),
                "b": pa.array(b_l, type=pa.int64()),
                "hamming": pa.array(d_l, type=pa.int32()),
            }
        )

    out = sigs.map_batches(explode, batch_format="pyarrow").groupby(["band", "key"]).map_groups(
        pairs, batch_format="pyarrow"
    )
    return out.groupby(["a", "b"]).map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")


# ---- n-gram jaccard ---------------------------------------------------------


def ngram_set(text: str, n: int = 3) -> set:
    toks = simple_tokenize(text or "")
    return {tuple(toks[i : i + n]) for i in range(max(0, len(toks) - n + 1))}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def verify_pairs_jaccard(ds, pairs, *, text_col: str = "text", id_col: str = "doc_id",
                         n: int = 3, threshold: float = 0.8):
    """Exact n-gram Jaccard verification of candidate pairs.

    The pair set is small (LSH output); texts for pair members are fetched
    with a semi-join filter on the corpus, then verified in one task."""
    import ray

    pair_rows = pairs.take_all()
    need = {r["a"] for r in pair_rows} | {r["b"] for r in pair_rows}
    ref = ray.put(need)

    def filt(t: pa.Table) -> pa.Table:
        s = ray.get(ref)
        mask = pa.array([i in s for i in t[id_col].to_pylist()], type=pa.bool_())
        return t.filter(mask)

    texts = {
        r[id_col]: r[text_col]
        for r in ds.map_batches(filt, batch_format="pyarrow")
        .select_columns([id_col, text_col])
        .take_all()
    }
    out = []
    for r in pair_rows:
        j = jaccard(ngram_set(texts.get(r["a"], ""), n), ngram_set(texts.get(r["b"], ""), n))
        if j >= threshold:
            out.append({"a": r["a"], "b": r["b"], "jaccard": j})
    return out
