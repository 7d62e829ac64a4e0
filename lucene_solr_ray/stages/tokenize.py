"""Tokenize + norms stage, and the posting-cell explode stage.

Ray Data re-expression of the reference indexing chain
(`lucene/core/src/java/org/apache/lucene/index/DefaultIndexingChain.java:296-343`
in-RAM inversion; `BM25Similarity.java:135-140` norm computation): one
``map_batches`` pass produces per-doc term/tf/position lists plus
``dl``/``norm`` columns; a second vectorized pass explodes them into
per-(term, partition) posting *chunks* — the shuffle payload for the
``groupby(["term", "partition_id"])`` wide step.

Keying cells by (term, partition_id) — not term alone — is the skew design:
a Zipf-head term (stopword-scale df) never concentrates on a single reducer;
each cell is bounded by the partition's row count (SURVEY.md §4 "skew").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..analysis.tokenizer import analyze, simple_tokenize
from ..smallfloat import encode_norm


def tokenize_batch(
    batch: pa.Table, *, with_positions: bool = True, analyzer: str = "standard"
) -> pa.Table:
    """Per-doc analysis: adds terms/tfs[/positions] lists + dl + norm.

    ``analyzer``: "standard" = the StandardAnalyzer-equivalent chain;
    "simple" = lowercase + ``[a-z0-9]+`` runs (exactly DuckDB's
    ``regexp_split_to_array(lower(text),'[^a-z0-9]+')`` — used by the
    SQL-oracle-checked pipelines so tokenization matches on both sides).

    Null/missing text → empty token list, dl=0 (norm byte 255 = inf norm,
    matching Java boost/sqrt(0)=inf — such docs match nothing).
    """
    if analyzer == "simple":
        tok_iter = lambda text: ((t, p) for p, t in enumerate(simple_tokenize(text)))  # noqa: E731
    elif analyzer == "standard":
        tok_iter = analyze
    else:
        raise ValueError(analyzer)
    texts = batch.column("text").to_pylist()
    terms_col: list[list[str]] = []
    tfs_col: list[list[int]] = []
    pos_col: list[list[list[int]]] = []
    dls = np.empty(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        per: dict[str, list[int]] = {}
        n = 0
        if text:
            for term, pos in tok_iter(text):
                per.setdefault(term, []).append(pos)
                n += 1
        dls[i] = n
        terms_col.append(list(per.keys()))
        tfs_col.append([len(v) for v in per.values()])
        if with_positions:
            pos_col.append(list(per.values()))

    out = {name: batch.column(name) for name in batch.column_names}
    out["terms"] = pa.array(terms_col, type=pa.list_(pa.string()))
    out["tfs"] = pa.array(tfs_col, type=pa.list_(pa.int32()))
    if with_positions:
        out["positions"] = pa.array(pos_col, type=pa.list_(pa.list_(pa.int32())))
    out["dl"] = pa.array(dls, type=pa.int64())
    out["norm"] = pa.array(encode_norm(dls), type=pa.uint8())
    return pa.table(out)


def explode_to_cells(batch: pa.Table, *, with_positions: bool = True) -> pa.Table:
    """Per-batch pre-aggregation into posting chunks.

    Input: tokenized rows (doc_id, partition_id, terms, tfs[, positions],
    norm).  Output: one row per (term, partition_id) present in THIS batch:
    ``term, partition_id, docs:list<int64>, tfs:list<int32>,
    norms:list<uint8>[, positions:list<list<int32>>]`` with docs ascending.
    This is the combiner that keeps the groupby shuffle payload small
    (SURVEY.md §4; `FreqProxTermsWriterPerField.java` in-RAM hash analog).
    """
    terms_list = batch.column("terms")
    flat_terms = terms_list.combine_chunks().flatten() if isinstance(terms_list, pa.ChunkedArray) else terms_list.flatten()
    n_per_doc = np.asarray(
        [len(x) for x in batch.column("terms").to_pylist()], dtype=np.int64
    )
    doc_ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
    parts = np.asarray(batch.column("partition_id").to_pylist(), dtype=np.int64)
    norms = np.asarray(batch.column("norm").to_pylist(), dtype=np.uint8)
    parent = np.repeat(np.arange(len(doc_ids)), n_per_doc)

    flat_term_arr = np.asarray(flat_terms.to_pylist(), dtype=object)
    flat_tfs = np.concatenate(
        [np.asarray(x, dtype=np.int64) for x in batch.column("tfs").to_pylist()]
    ) if len(flat_term_arr) else np.empty(0, dtype=np.int64)
    if with_positions:
        flat_pos: list = []
        for pl in batch.column("positions").to_pylist():
            flat_pos.extend(pl)

    # sort flat postings by (term, partition, doc) — docs within a batch are
    # already unique, so the chunk's doc list is strictly ascending
    order = np.lexsort((doc_ids[parent], parts[parent], flat_term_arr))
    if len(order) == 0:
        empty: dict = {
            "term": pa.array([], type=pa.string()),
            "partition_id": pa.array([], type=pa.int64()),
            "docs": pa.array([], type=pa.list_(pa.int64())),
            "tfs": pa.array([], type=pa.list_(pa.int32())),
            "norms": pa.array([], type=pa.list_(pa.uint8())),
        }
        if with_positions:
            empty["positions"] = pa.array([], type=pa.list_(pa.list_(pa.int32())))
        return pa.table(empty)

    s_term = flat_term_arr[order]
    s_part = parts[parent][order]
    s_doc = doc_ids[parent][order]
    s_tf = flat_tfs[order]
    s_norm = norms[parent][order]

    # group boundaries where (term, partition) changes
    change = np.empty(len(order), dtype=bool)
    change[0] = True
    change[1:] = (s_term[1:] != s_term[:-1]) | (s_part[1:] != s_part[:-1])
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(order))

    out_term, out_part, out_docs, out_tfs, out_norms, out_pos = [], [], [], [], [], []
    for st, en in zip(starts.tolist(), ends.tolist()):
        out_term.append(s_term[st])
        out_part.append(int(s_part[st]))
        out_docs.append(s_doc[st:en].tolist())
        out_tfs.append(s_tf[st:en].tolist())
        out_norms.append(s_norm[st:en].tolist())
        if with_positions:
            out_pos.append([flat_pos[order[i]] for i in range(st, en)])

    cols = {
        "term": pa.array(out_term, type=pa.string()),
        "partition_id": pa.array(out_part, type=pa.int64()),
        "docs": pa.array(out_docs, type=pa.list_(pa.int64())),
        "tfs": pa.array(out_tfs, type=pa.list_(pa.int32())),
        "norms": pa.array(out_norms, type=pa.list_(pa.uint8())),
    }
    if with_positions:
        cols["positions"] = pa.array(out_pos, type=pa.list_(pa.list_(pa.int32())))
    return pa.table(cols)
