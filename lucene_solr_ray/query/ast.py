"""Query AST + evaluation engine (single-sourced scoring semantics).

The same evaluator runs inside the pure-Python oracle (whole index) and inside
each SegmentSearcher actor (one partition): a :class:`TermSource` supplies
postings/norms/stats, the evaluator reproduces the reference's boolean
composition and float behavior:

* top-k total order ``(score desc, doc_id asc)`` — ``HitQueue.java:76-78``;
* conjunctions accumulate float32 in cost-ascending (df asc, stable) clause
  order — ``ConjunctionScorer.java:104-111`` + its cost sort;
* disjunctions accumulate double then cast to float —
  ``DisjunctionSumScorer.java:26,46-51``;
* required+optional = float add of the two sums — ``ReqOptSumScorer``;
* coord is 1 (BM25Similarity does not override ``Similarity.coord``);
* phrase weight idf = float32 sum of per-term idfs in phrase order —
  ``BM25Similarity.idfExplain(CollectionStatistics, TermStatistics[])``
  (:185-198); phrase freq = number of exact-phrase matches
  (``ExactPhraseScorer``).

Filters (:class:`FilterQ`, :class:`RangeQ`) follow Solr ``fq`` semantics: they
restrict the matched set and contribute no score.  A pure-filter query scores
a constant 1.0 per doc (ConstantScoreQuery with boost 1).

Distributed-vs-single-node statistics: scoring always uses GLOBAL df / maxdoc
/ avgdl from the build-time term-stats table, so a partitioned search is
score-identical to one big index (the reference's single-index semantics; Solr
4.x per-shard IDF drift is deliberately NOT reproduced).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Protocol

import numpy as np

from ..index import bm25

DEFAULT_FIELD = "text"


# ---- nodes ------------------------------------------------------------------


@dataclass(frozen=True)
class TermQ:
    term: str
    field: str = DEFAULT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class PhraseQ:
    """Exact (slop=0) or sloppy phrase.

    Sloppy matching (slop>0) follows the reference's contract shape
    (`SloppyPhraseScorer` + ``Similarity.sloppyFreq = 1/(distance+1)``,
    `BM25Similarity.java:69-71`): each match contributes ``1/(d+1)`` to the
    phrase freq where ``d`` is the positional displacement.  The match
    enumeration here is the minimal-window algorithm (for every occurrence of
    the first term, the smallest in-order completion window); Lucene's exact
    repeat-term/reorder edge cases are a documented deviation — oracle and
    engine share THIS implementation, so differential tests stay exact.
    """

    terms: tuple
    field: str = DEFAULT_FIELD
    boost: float = 1.0
    slop: int = 0


@dataclass(frozen=True)
class BoolQ:
    must: tuple = ()
    should: tuple = ()
    must_not: tuple = ()
    minimum_should_match: int = 0


@dataclass(frozen=True)
class FilterQ:
    """Keyword-field equality filter (Solr fq / StringField term filter)."""

    field: str
    value: str


@dataclass(frozen=True)
class RangeQ:
    """Range filter over a doc-values column ([lo TO hi], inclusive ends)."""

    field: str
    lo: object = None
    hi: object = None
    include_lo: bool = True
    include_hi: bool = True


@dataclass(frozen=True)
class DisMaxQ:
    """DisjunctionMaxQuery: score = max over matching clauses + tiebreak *
    (sum of the others) — `lucene/core/src/java/org/apache/lucene/search/
    DisjunctionMaxQuery.java` / ``DisjunctionMaxScorer`` (float arithmetic:
    ``scoreMax + (scoreSum - scoreMax) * tieBreakerMultiplier``)."""

    clauses: tuple
    tiebreak: float = 0.0


@dataclass(frozen=True)
class MatchAllQ:
    pass


@dataclass(frozen=True)
class FunctionQ:
    """FunctionQuery over a numeric doc-values field
    (`lucene/queries/src/java/org/apache/lucene/queries/function/FunctionQuery.java`
    ``AllScorer``: score = boost * floatVal(doc)); ``fn`` maps to the
    reference value sources (`log` = `LogFloatFunction` **log10**, `ln`,
    `sqrt` = `SqrtFloatFunction`, `identity` = the raw field source).
    Matches every doc that has the field (missing -> 0.0, the numeric
    doc-values default)."""

    field: str
    fn: str = "identity"  # identity | log | ln | sqrt
    boost: float = 1.0


@dataclass(frozen=True)
class FRangeQ:
    """FunctionRangeQuery — the Solr ``{!frange l= u= incl= incu=}func``
    parser (`solr/core/src/java/org/apache/solr/search/FunctionRangeQParserPlugin.java`,
    `ValueSourceRangeFilter.java`): matches docs whose FUNCTION value falls in
    [l, u], compared in float32 (``floatVal``), constant score 1.0."""

    func: "FunctionQ"
    lo: float = None
    hi: float = None
    include_lo: bool = True
    include_hi: bool = True


@dataclass(frozen=True)
class BoostedQ:
    """BoostedQuery (`lucene/queries/src/java/org/apache/lucene/queries/
    function/BoostedQuery.java`): score = child score * function value
    (float32 product) — the edismax multiplicative ``boost`` param."""

    child: object
    func: "FunctionQ" = None


@dataclass(frozen=True)
class BoostQ:
    """Multiplies the child subtree's scores by ``boost`` (float32) — the
    classic parser's ``(clause)^N`` on any node type (`BoostQuery.java`:
    score = boost * child score; TermQ/PhraseQ carry their boost inline in
    the weight, which is numerically identical since BM25 is linear in it)."""

    child: object
    boost: float = 1.0


@dataclass(frozen=True)
class MultiTermQ:
    """Prefix / wildcard / regexp / fuzzy query — expanded over the GLOBAL
    term dictionary then evaluated as a constant-score union of the matched
    terms' postings (the reference's CONSTANT_SCORE rewrite of
    ``MultiTermQuery``; `lucene/core/src/java/org/apache/lucene/search/
    MultiTermQuery.java`, `PrefixQuery/WildcardQuery/RegexpQuery/FuzzyQuery`).

    kind: "prefix" | "wildcard" | "regexp" | "fuzzy".
    For fuzzy, ``arg2`` is maxEdits (default 2, `FuzzyQuery` default).
    Expansion scans the dictionary (at scale: sorted-term range scan for
    prefix, automaton intersection for the rest — documented follow-up).
    """

    kind: str
    arg: str
    field: str = DEFAULT_FIELD
    arg2: int = 2


@dataclass(frozen=True)
class TermRangeQ:
    """TermRangeQuery (`lucene/core/src/java/org/apache/lucene/search/
    TermRangeQuery.java`): terms lexicographically in [lo, hi] (bytewise
    UTF-8 order, open ends via None), expanded over the sorted dictionary
    (a two-seek range scan, no automaton needed) and evaluated as a
    constant-score union like MultiTermQ."""

    lo: str = None
    hi: str = None
    field: str = DEFAULT_FIELD
    include_lo: bool = True
    include_hi: bool = True


@dataclass(frozen=True)
class PayloadScoreQ:
    """PayloadScoreQuery over a single term (`lucene/queries/src/java/org/
    apache/lucene/queries/payloads/PayloadScoreQuery.java` with the
    Max/Min/Average/SumPayloadFunction decoders; Solr surface =
    `solr/core/src/java/org/apache/solr/search/PayloadScoreQParserPlugin.java`).

    score(doc) = func over the float32 payloads at the term's positions
    (payload bytes decoded as one IEEE-754 float, PayloadHelper semantics);
    with ``include_span_score`` the payload score is MULTIPLIED by the span
    (== term, for a single clause) BM25 score, else returned alone —
    matching the plugin's ``includeSpanScore`` default false."""

    term: str
    field: str = DEFAULT_FIELD
    func: str = "max"  # max | min | average | sum
    include_span_score: bool = False
    boost: float = 1.0


@dataclass(frozen=True)
class PayloadCheckQ:
    """SpanPayloadCheckQuery subset (`lucene/queries/src/java/org/apache/
    lucene/queries/payloads/SpanPayloadCheckQuery.java`; Solr
    `PayloadCheckQParserPlugin.java`): matches docs containing the terms as
    an exact adjacent phrase where position i's payload equals
    ``payloads[i]`` (float32 equality after the float decoder). Constant
    score 1.0 (documented subset of the span scoring)."""

    terms: tuple
    payloads: tuple  # one float per term
    field: str = DEFAULT_FIELD


# ---- data source protocol ---------------------------------------------------


class TermSource(Protocol):
    """Supplies one scope's (whole index, or one partition's) postings."""

    def postings(self, field: str, term: str) -> tuple[np.ndarray, np.ndarray]:
        """-> (doc_ids asc int64, tfs int64); empty arrays if absent."""

    def positions(self, field: str, term: str) -> tuple[np.ndarray, np.ndarray, list]:
        """-> (doc_ids, tfs, per-doc position arrays)."""

    def norm_bytes(self, field: str, doc_ids: np.ndarray) -> np.ndarray:
        """-> uint8 norm byte per doc."""

    def filter_docs(self, q) -> np.ndarray:
        """doc_ids (asc) matching a FilterQ / RangeQ within this scope."""

    def all_docs(self) -> np.ndarray:
        """all doc_ids (asc) in this scope."""

    # global (index-wide) statistics — identical on every partition
    def global_df(self, field: str, term: str) -> int: ...
    def global_stats(self, field: str) -> tuple[int, int]:
        """-> (max_doc, sum_total_term_freq)."""

    def vocabulary(self, field: str):
        """iterable of all terms in the global dictionary (for MultiTermQ)."""


def _literal_prefix(q: "MultiTermQ") -> str:
    """Longest literal prefix of a wildcard/regexp pattern (empty if none)."""
    if q.kind == "wildcard":
        out = []
        for ch in q.arg:
            if ch in "*?":
                break
            out.append(ch)
        return "".join(out)
    if q.kind == "regexp":
        out = []
        for ch in q.arg:
            if not (ch.isalnum() and ch.isascii()) and ch != "_":
                break
            out.append(ch)
        rest = q.arg[len(out):]
        # a literal char followed by a quantifier is not a fixed prefix
        if out and rest[:1] in ("*", "?", "{", "+"):
            out.pop()
            rest = q.arg[len(out):]
        # a top-level alternation can bypass the prefix entirely
        depth = 0
        for ch in rest:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "|" and depth == 0:
                return ""
        return "".join(out)
    return ""


def multiterm_terms(src, q: "MultiTermQ") -> list[str]:
    """Dictionary expansion dispatch for a MultiTermQ over a TermSource —
    shared by the Evaluator's constant-score union and the span layer's
    SpanMultiQ rewrite (SpanMultiTermQueryWrapper analog)."""
    if q.kind == "prefix" and hasattr(src, "prefix_terms"):
        # sorted-dictionary range scan (BlockTree prefix seek) — no
        # full-vocabulary materialization
        return src.prefix_terms(q.field, q.arg)
    if q.kind == "fuzzy" and hasattr(src, "fuzzy_terms"):
        # DP-guided seek over the sorted dictionary (the Levenshtein
        # automaton ∩ BlockTree intersect analog) — visits ~automaton
        # frontier, never materializes the vocabulary
        return [t for t, _ in src.fuzzy_terms(q.field, q.arg, q.arg2)]
    if (
        q.kind in ("wildcard", "regexp")
        and hasattr(src, "prefix_terms")
        and _literal_prefix(q)
    ):
        # bound the scan to the pattern's literal prefix range, then
        # match the full pattern only within it (a cheap slice of the
        # automaton intersection the reference performs)
        cand = src.prefix_terms(q.field, _literal_prefix(q))
        return expand_multiterm(q, cand)
    return expand_multiterm(q, src.vocabulary(q.field))


def expand_multiterm(q: "MultiTermQ", vocabulary) -> list[str]:
    """Dictionary expansion for MultiTermQ (shared by oracle and engine)."""
    import re as _re

    if q.kind == "prefix":
        return sorted(t for t in vocabulary if t.startswith(q.arg))
    if q.kind == "wildcard":
        pat = _re.compile(
            "".join(
                ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
                for ch in q.arg
            )
            + r"\Z"
        )
        return sorted(t for t in vocabulary if pat.match(t))
    if q.kind == "regexp":
        pat = _re.compile(q.arg + r"\Z")
        return sorted(t for t in vocabulary if pat.match(t))
    if q.kind == "fuzzy":
        from .suggest import fuzzy_scan

        # prefix-sharing DP over the sorted dictionary (FuzzyQuery's
        # automaton intersection, approximated without the automaton)
        return [t for t, _ in fuzzy_scan(sorted(vocabulary), q.arg, q.arg2)]
    raise ValueError(q.kind)


# ---- evaluation -------------------------------------------------------------


_EMPTY_I = np.empty(0, dtype=np.int64)
_EMPTY_F = np.empty(0, dtype=np.float32)


def _function_scores(vals: np.ndarray, fn: str, boost: float) -> np.ndarray:
    """float32 FunctionQuery scores from float64 field values (the
    ``FloatFieldSource``/``DualFloatFunction`` float pipeline: value source
    computed in double, cast to float per doc, times the query boost)."""
    v = np.asarray(vals, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        if fn == "log":
            v = np.log10(v)  # LogFloatFunction: Math.log10 (0 -> -Infinity)
        elif fn == "ln":
            v = np.log(v)
        elif fn == "sqrt":
            v = np.sqrt(v)  # Math.sqrt semantics (negative -> NaN)
        elif fn != "identity":
            raise ValueError(fn)
    return (v.astype(np.float32) * np.float32(boost)).astype(np.float32)


def _align(scores_docs: np.ndarray, scores: np.ndarray, subset: np.ndarray) -> np.ndarray:
    """scores for `subset` (subset ⊆ scores_docs, both sorted asc)."""
    idx = np.searchsorted(scores_docs, subset)
    return scores[idx]


class Evaluator:
    """Evaluates a query AST against one TermSource scope."""

    def __init__(self, source: TermSource, field_stats_field: str = DEFAULT_FIELD):
        self.src = source

    def _weight_value(self, field: str, terms: list[str], boost: float) -> np.float32:
        """weight*(k1+1): idf summed f32 over terms (1 term = plain idf)."""
        n, _ = self.src.global_stats(field)
        acc = np.float32(0.0)
        for t in terms:
            acc = np.float32(acc + bm25.idf(self.src.global_df(field, t), n))
        w = np.float32(acc * np.float32(boost))
        return np.float32(w * np.float32(bm25.K1 + np.float32(1.0)))

    def _cache(self, field: str) -> np.ndarray:
        n, sttf = self.src.global_stats(field)
        return bm25.norm_cache(bm25.avg_dl(sttf, n))

    # returns (docs asc, float32 scores) of the scoring subtree
    def scored(self, q) -> tuple[np.ndarray, np.ndarray]:
        if isinstance(q, TermQ):
            docs, tfs = self.src.postings(q.field, q.term)
            if len(docs) == 0:
                return _EMPTY_I, _EMPTY_F
            wv = self._weight_value(q.field, [q.term], q.boost)
            nb = self.src.norm_bytes(q.field, docs)
            return docs, bm25.term_scores(tfs, nb, self._cache(q.field), wv)

        if isinstance(q, PhraseQ):
            return self._phrase(q)

        if isinstance(q, (FilterQ, RangeQ)):
            docs = self.src.filter_docs(q)
            return docs, np.full(len(docs), np.float32(1.0), dtype=np.float32)

        if isinstance(q, MatchAllQ):
            docs = self.src.all_docs()
            return docs, np.full(len(docs), np.float32(1.0), dtype=np.float32)

        if isinstance(q, FunctionQ):
            docs, vals = self.src.numeric_values(q.field)
            return docs, _function_scores(vals, q.fn, q.boost)

        if isinstance(q, FRangeQ):
            docs, vals = self.src.numeric_values(q.func.field)
            fv = _function_scores(vals, q.func.fn, q.func.boost)
            mask = np.ones(len(docs), dtype=bool)
            if q.lo is not None:
                lo = np.float32(q.lo)
                mask &= (fv >= lo) if q.include_lo else (fv > lo)
            if q.hi is not None:
                hi = np.float32(q.hi)
                mask &= (fv <= hi) if q.include_hi else (fv < hi)
            docs = docs[mask]
            return docs, np.full(len(docs), np.float32(1.0), dtype=np.float32)

        if isinstance(q, BoostedQ):
            docs, scores = self.scored(q.child)
            if len(docs) == 0:
                return docs, scores
            fdocs, vals = self.src.numeric_values(q.func.field)
            fv = np.zeros(len(docs), dtype=np.float32)
            if len(fdocs) == 0:
                # missing/unknown boost field: every matched doc has no value,
                # so the product degrades to 0 (same contract as docs outside
                # fdocs below) instead of indexing an empty array
                return docs, (scores * fv).astype(np.float32)
            idx = np.searchsorted(fdocs, docs)
            ok = (idx < len(fdocs)) & (fdocs[np.minimum(idx, len(fdocs) - 1)] == docs)
            fv[ok] = _function_scores(vals[idx[ok]], q.func.fn, q.func.boost)
            return docs, (scores * fv).astype(np.float32)

        if isinstance(q, DisMaxQ):
            evaled = [self.scored(c) for c in q.clauses]
            evaled = [(d, s) for d, s in evaled if len(d)]
            if not evaled:
                return _EMPTY_I, _EMPTY_F
            all_docs = np.unique(np.concatenate([d for d, _ in evaled]))
            smax = np.full(len(all_docs), -np.inf, dtype=np.float32)
            ssum = np.zeros(len(all_docs), dtype=np.float32)
            for d, s in evaled:
                idx = np.searchsorted(all_docs, d)
                np.maximum.at(smax, idx, s)
                ssum[idx] = (ssum[idx] + s).astype(np.float32)
            tie = np.float32(q.tiebreak)
            out = (smax + (ssum - smax) * tie).astype(np.float32)
            return all_docs, out

        if isinstance(q, TermRangeQ):
            if hasattr(self.src, "range_terms"):
                terms = self.src.range_terms(
                    q.field, q.lo, q.hi, q.include_lo, q.include_hi
                )
            else:
                def _in(t: str) -> bool:
                    if q.lo is not None and (t < q.lo or (t == q.lo and not q.include_lo)):
                        return False
                    if q.hi is not None and (t > q.hi or (t == q.hi and not q.include_hi)):
                        return False
                    return True

                terms = sorted(t for t in self.src.vocabulary(q.field) if _in(t))
            docs_parts = [self.src.postings(q.field, t)[0] for t in terms]
            docs_parts = [d for d in docs_parts if len(d)]
            if not docs_parts:
                return _EMPTY_I, _EMPTY_F
            docs = np.unique(np.concatenate(docs_parts))
            return docs, np.full(len(docs), np.float32(1.0), dtype=np.float32)

        if isinstance(q, MultiTermQ):
            terms = multiterm_terms(self.src, q)
            docs_parts = [self.src.postings(q.field, t)[0] for t in terms]
            docs_parts = [d for d in docs_parts if len(d)]
            if not docs_parts:
                return _EMPTY_I, _EMPTY_F
            docs = np.unique(np.concatenate(docs_parts))
            return docs, np.full(len(docs), np.float32(1.0), dtype=np.float32)

        if isinstance(q, PayloadScoreQ):
            return self._payload_score(q)

        if isinstance(q, PayloadCheckQ):
            docs = self._payload_check(q)
            return docs, np.full(len(docs), np.float32(1.0), dtype=np.float32)

        if isinstance(q, BoolQ):
            return self._bool(q)

        if isinstance(q, BoostQ):
            docs, scores = self.scored(q.child)
            return docs, (scores * np.float32(q.boost)).astype(np.float32)

        from .spans import SPAN_NODES, extract_terms, rewrite_spans, span_freqs

        if isinstance(q, SPAN_NODES):
            # SpanScorer: BM25 over the float sloppy freq; idf sums over the
            # query's unique terms in sorted order (spans.py scoring
            # contract).  SpanMultiQ wrappers rewrite to SpanOr-of-terms
            # first (SpanRewriteMethod), so scoring sees concrete terms.
            q = rewrite_spans(self.src, q)
            docs, freqs = span_freqs(self.src, q)
            if len(docs) == 0:
                return _EMPTY_I, _EMPTY_F
            field = q.field
            wv = self._weight_value(field, extract_terms(q), 1.0)
            nb = self.src.norm_bytes(field, docs)
            return docs, bm25.term_scores(freqs, nb, self._cache(field), wv)

        raise TypeError(f"unknown query node {type(q)}")

    # -- boolean composition --------------------------------------------------

    def _bool(self, q: BoolQ) -> tuple[np.ndarray, np.ndarray]:
        must_scoring = [c for c in q.must if not isinstance(c, (FilterQ, RangeQ))]
        must_filters = [c for c in q.must if isinstance(c, (FilterQ, RangeQ))]

        req_docs = None
        req_scores = None
        if must_scoring:
            # ConjunctionScorer: clauses sorted by cost (df) ascending, stable
            evaled = [self.scored(c) for c in must_scoring]
            order = sorted(range(len(evaled)), key=lambda i: len(evaled[i][0]))
            docs = evaled[order[0]][0]
            for i in order[1:]:
                docs = np.intersect1d(docs, evaled[i][0], assume_unique=True)
            acc = np.zeros(len(docs), dtype=np.float32)
            for i in order:  # float32 accumulation in cost order
                acc = (acc + _align(*evaled[i], docs)).astype(np.float32)
            req_docs, req_scores = docs, acc

        for f in must_filters:
            fd = self.src.filter_docs(f)
            if req_docs is None:
                req_docs = fd
                req_scores = np.full(len(fd), np.float32(1.0), dtype=np.float32)
            else:
                keep = np.isin(req_docs, fd, assume_unique=True)
                req_docs, req_scores = req_docs[keep], req_scores[keep]
        if must_filters and not must_scoring and q.should:
            # filter-only required part scores 0 (Solr fq semantics)
            req_scores = np.zeros(len(req_docs), dtype=np.float32)

        opt_docs, opt_scores, opt_count = self._disjunction(q.should)

        if req_docs is not None:
            docs, scores = req_docs, req_scores
            if q.should:
                msm = q.minimum_should_match
                if msm > 0:
                    ok = opt_docs[opt_count >= msm]
                    keep = np.isin(docs, ok, assume_unique=True)
                    docs, scores = docs[keep], scores[keep]
                # ReqOptSumScorer: float add where optional matches
                hit = np.isin(docs, opt_docs, assume_unique=True)
                add = np.zeros(len(docs), dtype=np.float32)
                add[hit] = _align(opt_docs, opt_scores, docs[hit])
                scores = (scores + add).astype(np.float32)
        else:
            msm = max(1, q.minimum_should_match)
            keep = opt_count >= msm
            docs, scores = opt_docs[keep], opt_scores[keep]

        for c in q.must_not:
            ex_docs, _ = self.scored(c)
            keep = ~np.isin(docs, ex_docs, assume_unique=True)
            docs, scores = docs[keep], scores[keep]
        return docs, scores

    def _disjunction(self, clauses) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (docs asc, float32 scores, match counts). Double accumulation."""
        if not clauses:
            return _EMPTY_I, _EMPTY_F, np.empty(0, dtype=np.int64)
        evaled = [self.scored(c) for c in clauses]
        all_docs = np.unique(np.concatenate([d for d, _ in evaled]))
        acc = np.zeros(len(all_docs), dtype=np.float64)
        cnt = np.zeros(len(all_docs), dtype=np.int64)
        for d, s in evaled:
            if len(d) == 0:
                continue
            idx = np.searchsorted(all_docs, d)
            acc[idx] += s.astype(np.float64)
            cnt[idx] += 1
        return all_docs, acc.astype(np.float32), cnt

    # -- phrase ---------------------------------------------------------------

    def _phrase(self, q: PhraseQ) -> tuple[np.ndarray, np.ndarray]:
        per_term = [self.src.positions(q.field, t) for t in q.terms]
        if any(len(d) == 0 for d, _, _ in per_term):
            return _EMPTY_I, _EMPTY_F
        docs = per_term[0][0]
        for d, _, _ in per_term[1:]:
            docs = np.intersect1d(docs, d, assume_unique=True)
        if len(docs) == 0:
            return _EMPTY_I, _EMPTY_F
        freqs = np.zeros(len(docs), dtype=np.float64)
        if q.slop == 0:
            # exact phrase, vectorized ACROSS candidate docs: tag each
            # position with its doc index, shift term i's positions by -i,
            # and intersect the (doc, shifted-pos) key sets of all terms in
            # one pass per term — no per-doc Python loop
            keys = None
            shift = np.int64(1) << np.int64(33)
            for i, (d, _, pl) in enumerate(per_term):
                idx = np.searchsorted(d, docs)
                sel = [np.asarray(pl[j], dtype=np.int64) for j in idx.tolist()]
                lens = np.array([len(x) for x in sel], dtype=np.int64)
                flat = np.concatenate(sel) if sel else np.empty(0, dtype=np.int64)
                doc_of = np.repeat(np.arange(len(docs), dtype=np.int64), lens)
                k = doc_of * shift + (flat - i + 64)
                keys = k if keys is None else np.intersect1d(keys, k, assume_unique=True)
                if len(keys) == 0:
                    break
            if keys is not None and len(keys):
                counts = np.bincount((keys // shift).astype(np.int64), minlength=len(docs))
                freqs = counts.astype(np.float64)
        else:
            # repeat groups are a query property: offsets sharing a TERM,
            # sorted by offset (SloppyPhraseScorer.gatherRptGroups simple
            # case — no multi-term postings in this engine)
            by_term: dict = {}
            for i, t in enumerate(q.terms):
                by_term.setdefault(t, []).append(i)
            rpt_groups = [offs for offs in by_term.values() if len(offs) > 1]
            for j, doc in enumerate(docs.tolist()):
                plists = []
                for i, (d, _, pl) in enumerate(per_term):
                    pi = np.searchsorted(d, doc)
                    plists.append(np.asarray(pl[pi], dtype=np.int64))
                freqs[j] = _sloppy_freq(plists, q.slop, rpt_groups)
        hit = freqs > 0
        docs, freqs = docs[hit], freqs[hit]
        if len(docs) == 0:
            return _EMPTY_I, _EMPTY_F
        wv = self._weight_value(q.field, list(q.terms), q.boost)
        nb = self.src.norm_bytes(q.field, docs)
        return docs, bm25.term_scores(freqs, nb, self._cache(q.field), wv)

    def _payload_score(self, q: PayloadScoreQ) -> tuple[np.ndarray, np.ndarray]:
        docs, tfs, _pls, pays = self.src.payloads(q.field, q.term)
        if len(docs) == 0:
            return _EMPTY_I, _EMPTY_F
        # per-doc payload reduce, vectorized over all matched docs: the flat
        # float32 payload stream segmented by tf boundaries (reduceat
        # accumulates sequentially in f4 — the PayloadFunction loop order)
        flat = np.concatenate(pays).astype(np.float32, copy=False)
        starts = np.zeros(len(docs), dtype=np.int64)
        np.cumsum(tfs[:-1], out=starts[1:])
        if q.func == "sum":
            ps = np.add.reduceat(flat, starts)
        elif q.func == "min":
            ps = np.minimum.reduceat(flat, starts)
        elif q.func == "average":
            ps = (np.add.reduceat(flat, starts) / tfs).astype(np.float32)
        elif q.func == "max":
            ps = np.maximum.reduceat(flat, starts)
        else:
            raise ValueError(f"unknown payload function {q.func!r}")
        ps = ps.astype(np.float32, copy=False)
        if q.include_span_score:
            wv = self._weight_value(q.field, [q.term], q.boost)
            nb = self.src.norm_bytes(q.field, docs)
            span = bm25.term_scores(tfs, nb, self._cache(q.field), wv)
            return docs, (span * ps).astype(np.float32)
        if q.boost != 1.0:
            ps = (ps * np.float32(q.boost)).astype(np.float32)
        return docs, ps

    def _payload_check(self, q: PayloadCheckQ) -> np.ndarray:
        """Docs where the terms form an exact adjacent phrase AND position
        i's payload float32-equals payloads[i] — the _phrase slop-0 key
        intersection with each term's position stream pre-masked to
        payload-matching occurrences."""
        if not q.terms:
            return _EMPTY_I
        per_term = [self.src.payloads(q.field, t) for t in q.terms]
        if any(len(d) == 0 for d, _, _, _ in per_term):
            return _EMPTY_I
        docs = per_term[0][0]
        for d, _, _, _ in per_term[1:]:
            docs = np.intersect1d(docs, d, assume_unique=True)
        if len(docs) == 0:
            return _EMPTY_I
        keys = None
        shift = np.int64(1) << np.int64(33)
        for i, (d, _, pl, pay) in enumerate(per_term):
            target = np.float32(q.payloads[i])
            idx = np.searchsorted(d, docs)
            sel_p = [np.asarray(pl[j], dtype=np.int64) for j in idx.tolist()]
            sel_y = [np.asarray(pay[j], dtype=np.float32) for j in idx.tolist()]
            lens = np.array([len(x) for x in sel_p], dtype=np.int64)
            flat = np.concatenate(sel_p) if sel_p else np.empty(0, dtype=np.int64)
            ys = np.concatenate(sel_y) if sel_y else np.empty(0, dtype=np.float32)
            doc_of = np.repeat(np.arange(len(docs), dtype=np.int64), lens)
            ok = ys == target
            k = (doc_of * shift + (flat - i + 64))[ok]
            keys = k if keys is None else np.intersect1d(keys, k, assume_unique=True)
            if len(keys) == 0:
                return _EMPTY_I
        return docs[np.unique(keys // shift)]


class _PP:
    """One query offset's position stream, phrase-shifted
    (PhrasePositions.java: position = term position - query offset, so an
    exact match puts every stream at the same position)."""

    __slots__ = ("pl", "idx", "offset", "position", "group")

    def __init__(self, pl: list, offset: int):
        self.pl = pl
        self.idx = 0
        self.offset = offset
        self.position = pl[0] - offset
        self.group = -1

    def next_position(self) -> bool:
        self.idx += 1
        if self.idx >= len(self.pl):
            return False
        self.position = self.pl[self.idx] - self.offset
        return True


def _sloppy_freq(plists: list, slop: int, rpt_groups: list) -> float:
    """Exact SloppyPhraseScorer semantics
    (`lucene/core/src/java/org/apache/lucene/search/SloppyPhraseScorer.java:
    100-134,238-321`, single-term postings so no multi-term repeats):

    * a priority queue over phrase-shifted position streams ordered
      (position, offset) — PhraseQueue.java:28-44;
    * always advance the minimal stream; when it overtakes the queue head,
      the minimized window length ``end - min position`` scores
      ``1/(matchLength+1)`` if within slop (BM25Similarity.sloppyFreq),
      accumulated in float32 like the reference's ``float freq``;
    * repeated query terms: the j-th repeat starts j occurrences in
      (advanceRepeatGroups), and a collision after an advance (two repeats
      on the same term position) advances the lesser stream until disjoint
      (advanceRpts) — the bijection constraint of the reference.
    """
    import heapq

    if len(plists) == 1:  # degenerate: every occurrence is an exact match
        return float(len(plists[0]))
    pps = [_PP(pl.tolist(), i) for i, pl in enumerate(plists)]
    groups: list[list[_PP]] = []
    for offs in rpt_groups:
        g = [pps[i] for i in sorted(offs)]
        for pp in g:
            pp.group = len(groups)
        groups.append(g)
    # advanceRepeatGroups (simple case): j-th repeat starts at occurrence j
    for g in groups:
        for j in range(1, len(g)):
            for _ in range(j):
                if not g[j].next_position():
                    return 0.0
    end = max(pp.position for pp in pps)

    def entry(pp):
        return (pp.position, pp.offset, pp)

    heap = [entry(pp) for pp in pps]
    heap.sort(key=lambda e: e[:2])
    heapq.heapify(heap)

    def advance_pp(pp) -> bool:
        nonlocal end
        if not pp.next_position():
            return False
        if pp.position > end:
            end = pp.position
        return True

    def collide(pp):
        rg = groups[pp.group]
        tp = pp.position + pp.offset
        for k, pp2 in enumerate(rg):
            if pp2 is not pp and pp2.position + pp2.offset == tp:
                return k
        return -1

    def advance_rpts(pp) -> bool:
        """Resolve repeat collisions caused by advancing ``pp``; may advance
        in-queue streams, so the heap is re-ordered afterwards."""
        if pp.group < 0:
            return True
        rg = groups[pp.group]
        cur, touched_queue = pp, False
        while True:
            k = collide(cur)
            if k < 0:
                break
            other = rg[k]
            nxt = (
                cur
                if (cur.position, cur.offset) < (other.position, other.offset)
                else other
            )
            if not advance_pp(nxt):
                return False
            if nxt is not pp:
                touched_queue = True
            cur = nxt
        if touched_queue:
            # total order (position, offset) is deterministic, so a full
            # re-heapify reproduces the reference's partial re-queue
            heap[:] = [entry(p) for _, _, p in heap]
            heap.sort(key=lambda e: e[:2])
            heapq.heapify(heap)
        return True

    def heap_push(pp):
        heapq.heappush(heap, entry(pp))

    acc = np.float32(0.0)
    _, _, pp = heapq.heappop(heap)
    match_length = end - pp.position
    nxt_pos = heap[0][2].position
    while advance_pp(pp):
        if groups and not advance_rpts(pp):
            break
        if pp.position > nxt_pos:
            if match_length <= slop:
                acc = np.float32(acc + np.float32(1.0) / np.float32(match_length + 1))
            heap_push(pp)
            _, _, pp = heapq.heappop(heap)
            nxt_pos = heap[0][2].position
            match_length = end - pp.position
        else:
            ml2 = end - pp.position
            if ml2 < match_length:
                match_length = ml2
    if match_length <= slop:
        acc = np.float32(acc + np.float32(1.0) / np.float32(match_length + 1))
    return float(acc)


def top_k(
    docs: np.ndarray,
    scores: np.ndarray,
    k: int,
    after: tuple[float, int] | None = None,
) -> list[tuple[float, int]]:
    """Total order (score desc, doc_id asc) — HitQueue.java:76-78.

    ``after=(score, doc_id)`` implements searchAfter / cursorMark deep paging
    (`IndexSearcher.java:242-266`, `solr/.../search/CursorMark.java:54-90`):
    only docs strictly after the totem in the total order are returned.
    Stateless and partition-stable — each scope can apply it independently.
    """
    if len(docs) == 0:
        return []
    if after is not None:
        a_score, a_doc = np.float32(after[0]), int(after[1])
        keep = (scores < a_score) | ((scores == a_score) & (docs > a_doc))
        docs, scores = docs[keep], scores[keep]
        if len(docs) == 0:
            return []
    order = np.lexsort((docs, -scores.astype(np.float64)))[:k]
    return [(float(scores[i]), int(docs[i])) for i in order]
