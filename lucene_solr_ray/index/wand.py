"""Block-max WAND top-k for term disjunctions.

Our addition on top of the reference (which scores exhaustively — Lucene 4.10
has skip lists per 128-doc block, `Lucene41SkipWriter.java`, but no WAND; see
SURVEY.md §2.10): the build stores per-block ``(max_tf, min_dl)`` block-max
metadata, and this module skips every doc range whose score upper bound
cannot beat the current k-th score.  Results remain RANK-IDENTICAL to
exhaustive scoring by construction:

* the bound ``weight * max_tf / (max_tf + k1*((1-b) + b*min_dl/avgdl))`` is
  an upper bound of any in-block score in real arithmetic (monotone in tf,
  anti-monotone in dl); a 1e-6 relative inflation absorbs float rounding, so
  a skip is always sound;
* a skipped doc with score EQUAL to the threshold cannot enter the top-k
  anyway (`HitQueue.java:76-78`: equal score -> lower docID wins, and the
  heap is already full of lower-or-better entries);
* decoded segments are scored with the exact evaluator float semantics
  (float32 per-term scores, float64 disjunction accumulation).

Strategy: per partition, split the doc space into elementary segments at
block boundaries, process segments in DESCENDING bound order, and stop as
soon as the next bound cannot beat the threshold (block-max maxscore order);
each processed segment is scored fully vectorized.
"""

from __future__ import annotations

import numpy as np

from . import bm25
from .postings import BLOCK, decode_block
from .reader import IndexPartition


def _term_weights(stats, terms: list[str], field: str = "text"):
    from ..stages.tokenize import field_term_key

    n = stats.max_doc
    # field-scoped length stats, as reader.global_stats does (per-field BM25)
    if field != "text" and field in stats.sum_dl_field:
        sttf = stats.sum_dl_field[field]
    else:
        sttf = stats.sum_dl
    avgdl = bm25.avg_dl(sttf, n)
    cache = bm25.norm_cache(avgdl)
    wvs = []
    for t in terms:
        idf = bm25.idf(stats.df.get(field_term_key(field, t), 0), n)
        wvs.append(np.float32(np.float32(idf) * np.float32(bm25.K1 + np.float32(1.0))))
    return wvs, cache, float(avgdl)


def conjunction_topk(
    parts: list[IndexPartition],
    stats,
    terms: list[str],
    k: int,
    field: str = "text",
    filters: list | None = None,
) -> tuple[list[tuple[float, int]], int]:
    """Exact top-k + exact hit count for AND(terms) with BLOCK SKIPPING:
    the rarest term's postings drive; every other term decodes ONLY the
    blocks whose [first_doc, last_doc] ranges contain surviving candidates
    (the leapfrog of ``ConjunctionScorer`` + Lucene41 skip lists, expressed
    as a per-term block gather).  Scores are float32-accumulated in the SAME
    (local-df asc, stable) clause order as the evaluator, so results are
    rank-identical to exhaustive evaluation."""
    wvs, cache, _ = _term_weights(stats, terms, field)

    cand_docs: list[np.ndarray] = []
    cand_scores: list[np.ndarray] = []
    total = 0
    from ..stages.tokenize import field_term_key

    for part in parts:
        cells = [part.cell(field_term_key(field, t)) for t in terms]
        if any(c is None for c in cells):
            continue
        # filter clauses (fq semantics) restrict candidates up front but
        # contribute no score — cheap doc-values masks before any decode
        fdocs = None
        if filters:
            for f in filters:
                fd = part.filter_docs(f)
                fdocs = fd if fdocs is None else np.intersect1d(fdocs, fd, assume_unique=True)
                if len(fdocs) == 0:
                    break
            if fdocs is not None and len(fdocs) == 0:
                continue
        order = sorted(range(len(terms)), key=lambda i: cells[i]["df"])  # cost asc
        decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        from .postings import decode_block, decode_docs_freqs

        ci0 = order[0]
        d0, f0 = decode_docs_freqs(cells[ci0]["docs"], cells[ci0]["freqs"], cells[ci0]["df"])
        decoded[ci0] = (d0, f0)
        cand = d0 if fdocs is None else d0[np.isin(d0, fdocs, assume_unique=True)]
        for ci in order[1:]:
            if len(cand) == 0:
                break
            cell = cells[ci]
            first = np.asarray(cell["skip_first_doc"], dtype=np.int64)
            last = np.asarray(cell["skip_last_doc"], dtype=np.int64)
            # blocks that could contain a candidate
            bi = np.unique(np.searchsorted(last, cand, side="left"))
            bi = bi[bi < len(first)]
            pieces = [decode_block(cell, int(b)) for b in bi.tolist()]
            if pieces:
                dd = np.concatenate([p[0] for p in pieces])
                ff = np.concatenate([p[1] for p in pieces])
            else:
                dd = np.empty(0, dtype=np.int64)
                ff = np.empty(0, dtype=np.int64)
            decoded[ci] = (dd, ff)
            cand = cand[np.isin(cand, dd, assume_unique=True)]
        if len(cand) == 0:
            continue
        total += len(cand)
        acc = np.zeros(len(cand), dtype=np.float32)
        nb = part.norm_bytes(field, cand)
        for ci in order:  # float32 accumulation in evaluator cost order
            dd, ff = decoded[ci]
            idx = np.searchsorted(dd, cand)
            s = bm25.term_scores(ff[idx], nb, cache, wvs[ci])
            acc = (acc + s).astype(np.float32)
        cand_docs.append(cand)
        cand_scores.append(acc)

    if not cand_docs:
        return [], 0
    docs = np.concatenate(cand_docs)
    scores = np.concatenate(cand_scores)
    order = np.lexsort((docs, -scores.astype(np.float64)))[:k]
    return [(float(scores[i]), int(docs[i])) for i in order], total


def wand_topk(
    parts: list[IndexPartition],
    stats,
    terms: list[str],
    k: int,
    field: str = "text",
) -> list[tuple[float, int]]:
    """Exact top-k for OR(terms) over the given partitions with block-max
    skipping.  Returns [(float32 score, doc_id)] in (score desc, doc asc)."""
    from ..stages.tokenize import field_term_key

    wvs, cache, avgdl = _term_weights(stats, terms, field)
    k1, b = float(bm25.K1), float(bm25.B)

    # Running top-k under the FINAL total order (score desc, doc asc):
    # truncating to k after each merge is exact — a candidate outside the
    # running top-k can never re-enter it — and keeps threshold maintenance
    # O(n log k) total instead of re-partitioning every accumulated score
    # after each segment (O(n^2) on broad disjunctions).
    cand_docs: list[np.ndarray] = []
    cand_scores: list[np.ndarray] = []
    run_docs = np.empty(0, dtype=np.int64)
    run_scores = np.empty(0, dtype=np.float32)
    threshold = -np.inf
    n_in_heap = 0

    def current_threshold():
        nonlocal threshold, n_in_heap, run_docs, run_scores
        if not cand_docs:
            return
        d = np.concatenate([run_docs, *cand_docs])
        s = np.concatenate([run_scores, *cand_scores])
        cand_docs.clear()
        cand_scores.clear()
        if len(d) > k:
            order = np.lexsort((d, -s.astype(np.float64)))[:k]
            d, s = d[order], s[order]
            threshold = float(s[-1])
        elif len(d) == k:
            threshold = float(s.min())
        run_docs, run_scores = d, s
        n_in_heap = len(d)

    for part in parts:
        cells = []
        for ti, t in enumerate(terms):
            cell = part.cell(field_term_key(field, t))
            if cell is None:
                continue
            first = np.asarray(cell["skip_first_doc"], dtype=np.int64)
            last = np.asarray(cell["skip_last_doc"], dtype=np.int64)
            mtf = np.asarray(cell["bm_max_tf"], dtype=np.float64)
            mdl = np.asarray(cell["bm_min_dl"], dtype=np.float64)
            min_cache = k1 * ((1.0 - b) + b * mdl / avgdl)
            bounds = float(wvs[ti]) * mtf / (mtf + min_cache) * (1.0 + 1e-6)
            cells.append((ti, cell, first, last, bounds))
        if not cells:
            continue

        # elementary segments at block boundaries
        points = np.unique(
            np.concatenate(
                [f for _, _, f, _, _ in cells] + [l + 1 for _, _, _, l, _ in cells]
            )
        )
        seg_lo = points[:-1]
        seg_hi = points[1:]  # segment = [lo, hi)
        seg_bound = np.zeros(len(seg_lo), dtype=np.float64)
        seg_blocks: list[list[tuple[int, int]]] = [[] for _ in range(len(seg_lo))]
        for ci, (ti, cell, first, last, bounds) in enumerate(cells):
            # block j overlaps segment i iff first[j] < seg_hi[i] and last[j] >= seg_lo[i]
            j = np.searchsorted(last, seg_lo, side="left")
            ok = (j < len(first)) & (first[np.minimum(j, len(first) - 1)] < seg_hi)
            for i in np.flatnonzero(ok):
                seg_bound[i] += bounds[j[i]]
                seg_blocks[i].append((ci, int(j[i])))

        order = np.argsort(-seg_bound, kind="stable")
        decoded: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
        for si in order.tolist():
            if n_in_heap >= k and seg_bound[si] <= threshold:
                break  # all remaining segments bounded below the k-th score
            lo, hi = int(seg_lo[si]), int(seg_hi[si])
            per_term: list[tuple[np.ndarray, np.ndarray, int]] = []
            for ci, bi in seg_blocks[si]:
                ti, cell = cells[ci][0], cells[ci][1]
                key = (ci, bi)
                if key not in decoded:
                    decoded[key] = decode_block(cell, bi)
                d, f = decoded[key]
                sel = (d >= lo) & (d < hi)
                if sel.any():
                    per_term.append((d[sel], f[sel], ti))
            if not per_term:
                continue
            all_docs = np.unique(np.concatenate([d for d, _, _ in per_term]))
            acc = np.zeros(len(all_docs), dtype=np.float64)
            nb = part.norm_bytes(field, all_docs)
            for d, f, ti in per_term:
                idx = np.searchsorted(all_docs, d)
                nb_t = nb[idx]
                s = bm25.term_scores(f, nb_t, cache, wvs[ti])
                acc[idx] += s.astype(np.float64)
            cand_docs.append(all_docs)
            cand_scores.append(acc.astype(np.float32))
            current_threshold()

    docs = np.concatenate([run_docs, *cand_docs])
    scores = np.concatenate([run_scores, *cand_scores])
    if not len(docs):
        return []
    order = np.lexsort((docs, -scores.astype(np.float64)))[:k]
    return [(float(scores[i]), int(docs[i])) for i in order]
