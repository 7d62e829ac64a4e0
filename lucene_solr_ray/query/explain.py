"""Score explanations (``IndexSearcher.explain`` / Solr ``debugQuery=true``).

Re-specification of the reference explain surface
(`lucene/core/src/java/org/apache/lucene/search/IndexSearcher.java::explain`,
`BM25Similarity.java::explainScore`, Solr's
`solr/core/src/java/org/apache/solr/util/SolrPluginUtils.java::doStandardDebug`):
a nested ``{value, description, details}`` tree whose root value is
BIT-IDENTICAL to the evaluator's float32 score for that doc — guaranteed by
construction, because every node's value is read from the SAME
``Evaluator.scored`` pass the search path runs, never recomputed by a
parallel formula.  Leaf term nodes additionally break the score into the
BM25 idf and tfNorm factors (recomputed with the engine's own primitives).

Documented simplification: phrase / span / multiterm subtrees report their
subtree value with a one-line description instead of Lucene's inner
phraseFreq breakdown.
"""

from __future__ import annotations

import numpy as np

from ..index import bm25
from .ast import (
    BoolQ,
    BoostQ,
    BoostedQ,
    DisMaxQ,
    Evaluator,
    FilterQ,
    FunctionQ,
    MatchAllQ,
    MultiTermQ,
    PhraseQ,
    RangeQ,
    TermQ,
)


def _value_at(ev: Evaluator, q, doc_id: int):
    """float32 subtree score at doc_id from the real evaluator, or None."""
    docs, scores = ev.scored(q)
    i = np.searchsorted(docs, doc_id)
    if i >= len(docs) or docs[i] != doc_id:
        return None
    return float(scores[i])


def explain(src, q, doc_id: int) -> dict | None:
    """Explanation tree for ``doc_id`` under query ``q`` (None = no match)."""
    ev = Evaluator(src)
    return _explain(ev, q, doc_id)


def _term_details(ev: Evaluator, q: TermQ, doc_id: int) -> list[dict]:
    src = ev.src
    n, sttf = src.global_stats(q.field)
    df = src.global_df(q.field, q.term)
    idf = float(bm25.idf(df, n))
    docs, tfs = src.postings(q.field, q.term)
    i = int(np.searchsorted(docs, doc_id))
    tf = int(tfs[i])
    nb = int(src.norm_bytes(q.field, np.array([doc_id], dtype=np.int64))[0])
    avgdl = float(bm25.avg_dl(sttf, n))
    norm = float(bm25.norm_cache(np.float32(avgdl))[nb])
    k1, b = float(bm25.K1), float(bm25.B)
    tf_norm = float(
        np.float32(np.float32(tf) * np.float32(k1 + 1.0))
        / np.float32(np.float32(tf) + np.float32(norm))
    )
    return [
        {
            "value": idf,
            "description": f"idf(docFreq={df}, docCount={n})",
            "details": [],
        },
        {
            "value": tf_norm,
            "description": (
                f"tfNorm, computed from freq={tf}, k1={k1}, b={b}, "
                f"avgdl={avgdl}, normByte={nb} (byte315-decoded length norm)"
            ),
            "details": [],
        },
    ]


def _explain(ev: Evaluator, q, doc_id: int) -> dict | None:
    v = _value_at(ev, q, doc_id)
    if v is None:
        return None

    if isinstance(q, TermQ):
        return {
            "value": v,
            "description": f"weight({q.field}:{q.term} in {doc_id}) [BM25], boost={q.boost}",
            "details": _term_details(ev, q, doc_id),
        }
    if isinstance(q, BoostQ):
        child = _explain(ev, q.child, doc_id)
        return {
            "value": v,
            "description": f"boost {q.boost}, product of:",
            "details": [child] if child else [],
        }
    if isinstance(q, BoolQ):
        details = []
        for c in (*q.must, *q.should):
            e = _explain(ev, c, doc_id)
            if e is not None:
                details.append(e)
        return {
            "value": v,
            "description": "sum of: (required float32 in cost order, then "
            "optional, ReqOptSumScorer)",
            "details": details,
        }
    if isinstance(q, DisMaxQ):
        details = [
            e for c in q.clauses if (e := _explain(ev, c, doc_id)) is not None
        ]
        return {
            "value": v,
            "description": f"max plus {q.tiebreak} times others of:",
            "details": details,
        }
    if isinstance(q, (FilterQ, RangeQ)):
        return {
            "value": v,
            "description": f"ConstantScore({q.field}), filter match",
            "details": [],
        }
    if isinstance(q, MatchAllQ):
        return {"value": v, "description": "*:*, all docs", "details": []}
    if isinstance(q, FunctionQ):
        return {
            "value": v,
            "description": f"FunctionQuery({q.fn}({q.field})), boost={q.boost}",
            "details": [],
        }
    if isinstance(q, BoostedQ):
        child = _explain(ev, q.child, doc_id)
        func = _explain(ev, q.func, doc_id)
        return {
            "value": v,
            "description": "boost(query, function), product of:",
            "details": [d for d in (child, func) if d],
        }
    if isinstance(q, PhraseQ):
        return {
            "value": v,
            "description": (
                f"weight({q.field}:\"{' '.join(q.terms)}\"~{q.slop}) "
                "[BM25 over phraseFreq]"
            ),
            "details": [],
        }
    if isinstance(q, MultiTermQ):
        return {
            "value": v,
            "description": f"{q.kind}({q.field}:{q.arg}), constant score rewrite",
            "details": [],
        }
    return {"value": v, "description": type(q).__name__, "details": []}
