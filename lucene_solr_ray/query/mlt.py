"""MoreLikeThis: find documents similar to a source text.

Re-specification of
`lucene/queries/src/java/org/apache/lucene/queries/mlt/MoreLikeThis.java`
(surfaced by Solr's MoreLikeThisComponent/Handler,
`solr/core/src/java/org/apache/solr/handler/MoreLikeThisHandler.java`):

1. Analyze the source text; candidate terms need ``tf >= min_term_freq`` in
   the source and ``df >= min_doc_freq`` in the index
   (`MoreLikeThis.java:588-628` retrieveTerms / createQueue).
2. Rank candidates by ``tf * idf_classic`` with the CLASSIC-similarity idf
   ``log(numDocs / (df + 1)) + 1`` (`DefaultSimilarity.idf`,
   `MoreLikeThis.java:629-642`) — double math, ties broken term-asc — and
   keep the top ``max_query_terms``.
3. The query is an UNBOOSTED disjunction of those terms (``boost=false``
   default, `MoreLikeThis.java:565-586`); scoring then follows the engine's
   BM25 disjunction contract.
"""

from __future__ import annotations

import math

from .ast import BoolQ, TermQ


def interesting_terms(
    text: str,
    src,
    field: str = "text",
    analyzer: str = "simple",
    *,
    min_term_freq: int = 2,
    min_doc_freq: int = 5,
    max_query_terms: int = 25,
) -> list[tuple[str, float]]:
    """-> ``[(term, score)]`` ordered (score desc, term asc), truncated to
    ``max_query_terms``.  ``src`` is any TermSource (global_df/global_stats)."""
    from ..stages.tokenize import postings_analyzer

    per, _ = postings_analyzer(analyzer)(text or "")
    n_docs, _ = src.global_stats(field)
    scored = []
    for term, positions in per.items():
        tf = len(positions)
        if tf < min_term_freq:
            continue
        df = src.global_df(field, term)
        if df < min_doc_freq:
            continue
        idf = math.log(n_docs / (df + 1.0)) + 1.0
        scored.append((term, tf * idf))
    scored.sort(key=lambda ts: (-ts[1], ts[0]))
    return scored[:max_query_terms]


def mlt_query(
    text: str,
    src,
    field: str = "text",
    analyzer: str = "simple",
    **kw,
) -> BoolQ | None:
    """Build the MoreLikeThis disjunction for *text*; None when no candidate
    term survives the frequency gates."""
    terms = interesting_terms(text, src, field, analyzer, **kw)
    if not terms:
        return None
    return BoolQ(should=tuple(TermQ(t, field=field) for t, _ in terms))
