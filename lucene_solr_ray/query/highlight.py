"""Passage highlighting over stored text.

Re-specification of the reference highlighter surface
(`lucene/highlighter/src/java/org/apache/lucene/search/postingshighlight/PostingsHighlighter.java`,
Solr's `solr/core/src/java/org/apache/solr/highlight/` component): for a hit
doc, break its stored text into sentence passages, score each passage by the
query terms it contains, and return the best passages with every term
occurrence wrapped in ``<em>…</em>`` (the default ``PassageFormatter``).

Offsets come from re-analyzing the stored text at highlight time (the
UnifiedHighlighter's ``OffsetSource.ANALYSIS`` mode — this engine's postings
store positions, not char offsets, exactly the case that mode exists for).

Passage scoring (documented simplification of `PassageScorer.java`): score =
Σ over matching occurrences of the term's BM25 idf from the index's global
stats — the idf-weighted tf without PassageScorer's pivoted passage-length
norm.  Ties break toward the earlier passage.  Deterministic.

Scale shape: :func:`highlight_batch` is a stateless ``map_batches`` kernel
(query terms broadcast once via the closure / ``ray.put`` upstream);
driver-side highlighting touches only the k result docs.
"""

from __future__ import annotations

import re

import numpy as np

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")
_SIMPLE_CI = re.compile(r"[a-z0-9]+", re.IGNORECASE)


def analyze_offsets(text: str, analyzer: str = "simple"):
    """-> list of ``(term, char_start, char_end)`` for the given chain.
    Supports the regex-scanner chains (simple/standard); stemming chains
    would need per-token transform mapping (not needed for highlighting —
    Solr highlights with the index analyzer, and the caller passes the
    already-analyzed query terms)."""
    from ..analysis.tokenizer import _SCANNER, ENGLISH_STOP_WORDS, MAX_TOKEN_LENGTH

    out = []
    if analyzer == "simple":
        # case-insensitive scan of the ORIGINAL text keeps char offsets valid
        # for slicing (equivalent to lower-then-scan for ASCII case folding;
        # exotic codepoints whose lower() maps into ASCII are a documented
        # deviation, same family as the chain's str.lower note)
        for m in _SIMPLE_CI.finditer(text):
            out.append((m.group(0).lower(), m.start(), m.end()))
        return out
    if analyzer == "standard":
        for m in _SCANNER.finditer(text):
            tok = m.group(0)
            if len(tok) > MAX_TOKEN_LENGTH:
                continue
            t = tok.lower()
            if t in ENGLISH_STOP_WORDS:
                continue
            out.append((t, m.start(), m.end()))
        return out
    raise ValueError(analyzer)


def _passages(text: str):
    """Sentence passages as (char_start, char_end) — BreakIterator analog."""
    spans = []
    pos = 0
    for part in _SENT_SPLIT.split(text):
        start = text.index(part, pos)
        spans.append((start, start + len(part)))
        pos = start + len(part)
    return spans


def highlight_text(
    text: str,
    term_idf: dict[str, float],
    *,
    analyzer: str = "simple",
    max_passages: int = 1,
    pre: str = "<em>",
    post: str = "</em>",
) -> str | None:
    """Best ``max_passages`` sentence passages (document order) with all
    query-term occurrences wrapped; None when no term matches."""
    offs = [o for o in analyze_offsets(text, analyzer) if o[0] in term_idf]
    if not offs:
        return None
    passages = _passages(text)
    starts = [s for s, _ in passages]
    scores = np.zeros(len(passages), dtype=np.float64)
    by_passage: list[list[tuple[int, int]]] = [[] for _ in passages]
    import bisect

    for term, s, e in offs:
        pi = bisect.bisect_right(starts, s) - 1
        scores[pi] += term_idf[term]
        by_passage[pi].append((s, e))
    order = sorted(
        (i for i in range(len(passages)) if scores[i] > 0),
        key=lambda i: (-scores[i], i),
    )[:max_passages]
    order.sort()  # emit in document order, as the reference formatter does
    parts = []
    for pi in order:
        ps, pe = passages[pi]
        frag = []
        cur = ps
        for s, e in sorted(by_passage[pi]):
            frag.append(text[cur:s])
            frag.append(pre + text[s:e] + post)
            cur = e
        frag.append(text[cur:pe])
        parts.append("".join(frag))
    return " ... ".join(parts)


def query_term_idfs(stats, terms, field: str = "text") -> dict[str, float]:
    """BM25 idf per query term from the index's ``GlobalStats``."""
    from ..index import bm25
    from ..stages.tokenize import field_term_key

    n = stats.max_doc
    return {
        t: float(bm25.idf(stats.df.get(field_term_key(field, t), 0), n))
        for t in terms
    }


def highlight_batch(batch, *, term_idf: dict[str, float], analyzer: str = "simple",
                    text_col: str = "text", out_col: str = "snippet",
                    max_passages: int = 1):
    """``map_batches`` kernel: adds a snippet column (None = no match).
    Pass ``term_idf`` precomputed (broadcast once) so each batch does no
    stats lookups."""
    import pyarrow as pa

    texts = batch.column(text_col).to_pylist()
    snippets = [
        highlight_text(t or "", term_idf, analyzer=analyzer, max_passages=max_passages)
        for t in texts
    ]
    return batch.append_column(out_col, pa.array(snippets, type=pa.string()))
