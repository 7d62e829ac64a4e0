"""Span queries over the positions codec.

Re-specification of the span operator family
(`lucene/core/src/java/org/apache/lucene/search/spans/SpanTermQuery.java`,
`SpanNearQuery.java` / ``NearSpansOrdered`` / ``NearSpansUnordered``,
`SpanOrQuery.java`, `SpanNotQuery.java`) over this engine's per-term position
lists.  A span is a half-open token interval ``(start, end)``.

Matching semantics:

* term -> one unit span per occurrence;
* near(in_order=True): one span per clause, each starting at or after the
  previous clause's end; total inter-clause gap <= slop.  Enumeration is
  greedy earliest-completion per first-clause span (exact for unit/term
  clauses; for nested variable-length clause spans the greedy choice is a
  documented deviation from NearSpansOrdered's backtracking);
* near(in_order=False): a window containing one span per clause (pairwise
  non-overlapping), width - sum(span lengths) <= slop; minimal-window sweep;
* or -> union of clause spans; not -> include spans overlapping no exclude
  span.

Scoring contract (`SpanScorer.java:55-76` in the 4.x line): per matching doc
``freq = Σ over enumerated spans of sloppyFreq(end - start)`` with BM25's
``sloppyFreq(d) = 1/(d+1)``, accumulated in float32; the doc scores as a
phrase with that float freq, and the weight's idf sums over the query's
unique terms in sorted order (`SpanWeight.java:56-63` extracts into a
TreeSet).  The SET of enumerated spans follows this module's matching
contract above (greedy earliest-completion for ordered-near — the one
documented deviation from NearSpansOrdered's backtracking on nested
variable-length clauses).  The SQL-gated driver entries consume only the
matching-doc set, which is unaffected by scoring.
"""

from __future__ import annotations

from bisect import bisect_left
from dataclasses import dataclass

import numpy as np

DEFAULT_FIELD = "text"


def _unify_span_field(node, child_fields) -> None:
    """Single-field contract for composite span nodes (`SpanNearQuery.java`
    ctor: "Clauses must have same field"; SpanOr/SpanNot likewise).  A
    composite left at the DEFAULT field inherits its clauses' field, so
    scoring (`ast.py` SPAN_NODES branch) reads idf/norms from the field the
    spans actually matched in; genuinely mixed clause fields raise."""
    fs = {f for f in child_fields}
    if len(fs) > 1:
        raise ValueError(f"span clauses must share one field, got {sorted(fs)}")
    if fs:
        cf = fs.pop()
        if node.field != cf:
            if node.field == DEFAULT_FIELD:
                object.__setattr__(node, "field", cf)
            else:
                raise ValueError(
                    f"span node field {node.field!r} != clause field {cf!r}"
                )


@dataclass(frozen=True)
class SpanTermQ:
    term: str
    field: str = DEFAULT_FIELD


@dataclass(frozen=True)
class SpanNearQ:
    clauses: tuple
    slop: int = 0
    in_order: bool = True
    field: str = DEFAULT_FIELD

    def __post_init__(self):
        _unify_span_field(self, (c.field for c in self.clauses))


@dataclass(frozen=True)
class SpanOrQ:
    clauses: tuple
    field: str = DEFAULT_FIELD

    def __post_init__(self):
        _unify_span_field(self, (c.field for c in self.clauses))


@dataclass(frozen=True)
class SpanNotQ:
    include: object
    exclude: object
    field: str = DEFAULT_FIELD

    def __post_init__(self):
        _unify_span_field(self, (c.field for c in (self.include, self.exclude)))


@dataclass(frozen=True)
class SpanFirstQ:
    """Spans of ``match`` ending within the first ``end`` positions
    (`SpanFirstQuery.java`)."""

    match: object
    end: int
    field: str = DEFAULT_FIELD

    def __post_init__(self):
        _unify_span_field(self, (self.match.field,))


@dataclass(frozen=True)
class SpanMultiQ:
    """SpanMultiTermQueryWrapper analog
    (`lucene/core/src/java/org/apache/lucene/search/spans/SpanMultiTermQueryWrapper.java`):
    a MultiTermQ (prefix/wildcard/regexp/fuzzy) usable as a span clause —
    the ComplexPhrase building block.  :func:`rewrite_spans` expands it
    against the dictionary into a SpanOrQ of SpanTermQ (the reference's
    SpanRewriteMethod) before evaluation/scoring."""

    multi: object  # ast.MultiTermQ
    field: str = DEFAULT_FIELD

    def __post_init__(self):
        _unify_span_field(self, (self.multi.field,))


SPAN_NODES = (SpanTermQ, SpanNearQ, SpanOrQ, SpanNotQ, SpanFirstQ, SpanMultiQ)


def rewrite_spans(src, q):
    """Expand every SpanMultiQ in the tree into a SpanOrQ of SpanTermQ over
    the dictionary-matched terms (no-op for trees without wrappers)."""
    if isinstance(q, SpanMultiQ):
        from .ast import multiterm_terms

        terms = multiterm_terms(src, q.multi)
        return SpanOrQ(tuple(SpanTermQ(t, field=q.field) for t in terms), field=q.field)
    if isinstance(q, (SpanNearQ, SpanOrQ)):
        return type(q)(
            tuple(rewrite_spans(src, c) for c in q.clauses),
            **{k: getattr(q, k) for k in ("slop", "in_order") if hasattr(q, k)},
            field=q.field,
        )
    if isinstance(q, SpanNotQ):
        return SpanNotQ(rewrite_spans(src, q.include), rewrite_spans(src, q.exclude), field=q.field)
    if isinstance(q, SpanFirstQ):
        return SpanFirstQ(rewrite_spans(src, q.match), q.end, field=q.field)
    return q


def _near_ordered(lists: list[list[tuple[int, int]]], slop: int) -> list[tuple[int, int]]:
    out = []
    starts = [[s for s, _ in L] for L in lists]
    for s0, e0 in lists[0]:
        cur = e0
        gap = 0
        ok = True
        for li in range(1, len(lists)):
            i = bisect_left(starts[li], cur)
            if i == len(lists[li]):
                ok = False
                break
            s, e = lists[li][i]
            gap += s - cur
            cur = e
        if ok and gap <= slop:
            out.append((s0, cur))
    return out


def _near_unordered(lists: list[list[tuple[int, int]]], slop: int) -> list[tuple[int, int]]:
    """Exhaustive branch-and-bound: pick one span per clause (any order),
    pairwise non-overlapping, window width minus total span length <= slop.
    Clauses are searched smallest-list-first; a branch is pruned as soon as
    the width the already-chosen spans force exceeds slop + the chosen+
    minimum-remaining span lengths.  Exact — the earlier single-pointer
    sweep missed matches when clause spans coincided or overlapped."""
    order = sorted(range(len(lists)), key=lambda i: len(lists[i]))
    ls = [sorted(lists[i]) for i in order]
    max_len = [max(e - s for s, e in L) for L in ls]
    out: set[tuple[int, int]] = set()

    def overlaps(sp, chosen):
        s, e = sp
        return any(cs < e and ce > s for cs, ce in chosen)

    starts_of = [[s for s, _ in L] for L in ls]

    def rec(ci, chosen, s_min, e_max, lens):
        if ci == len(ls):
            if (e_max - s_min) - lens <= slop:
                out.add((s_min, e_max))
            return
        rem_max = sum(max_len[ci + 1 :])
        # only spans inside the feasible window can complete this branch:
        # width <= budget forces start >= e_max - budget (bisect) and the
        # sorted order lets us BREAK once start > s_min + budget
        budget = slop + lens + max_len[ci] + rem_max
        lo = bisect_left(starts_of[ci], e_max - budget)
        for sp in ls[ci][lo:]:
            s, e = sp
            if s - s_min > budget:
                break
            ns, ne = min(s_min, s), max(e_max, e)
            # width cannot shrink; remaining spans contribute at most their
            # max lengths — if even that best case misses, prune the branch
            if (ne - ns) - (lens + (e - s) + rem_max) > slop:
                continue
            if overlaps(sp, chosen):
                continue
            chosen.append(sp)
            rec(ci + 1, chosen, ns, ne, lens + (e - s))
            chosen.pop()

    first = ls[0]
    for sp in first:
        rec(1, [sp], sp[0], sp[1], sp[1] - sp[0])
    return sorted(out)


def _overlaps(span: tuple[int, int], excl: list[tuple[int, int]]) -> bool:
    s, e = span
    return any(xs < e and xe > s for xs, xe in excl)


def eval_spans(src, q) -> dict[int, list[tuple[int, int]]]:
    """-> {doc_id: sorted span list} for a span-query subtree over one
    TermSource scope."""
    if isinstance(q, SpanMultiQ):
        return eval_spans(src, rewrite_spans(src, q))
    if isinstance(q, SpanTermQ):
        docs, _, pls = src.positions(q.field, q.term)
        return {
            int(d): [(int(p), int(p) + 1) for p in pl.tolist()]
            for d, pl in zip(docs.tolist(), pls)
        }
    if isinstance(q, SpanOrQ):
        acc: dict[int, list] = {}
        for c in q.clauses:
            for d, spans in eval_spans(src, c).items():
                acc.setdefault(d, []).extend(spans)
        return {d: sorted(set(v)) for d, v in acc.items()}
    if isinstance(q, SpanNearQ):
        per = [eval_spans(src, c) for c in q.clauses]
        if not per:
            return {}
        docs = set(per[0])
        for m in per[1:]:
            docs &= set(m)
        out: dict[int, list] = {}
        fn = _near_ordered if q.in_order else _near_unordered
        for d in sorted(docs):
            spans = fn([m[d] for m in per], q.slop)
            if spans:
                out[d] = spans
        return out
    if isinstance(q, SpanFirstQ):
        inc = eval_spans(src, q.match)
        out = {}
        for d, spans in inc.items():
            keep = [sp for sp in spans if sp[1] <= q.end]
            if keep:
                out[d] = keep
        return out
    if isinstance(q, SpanNotQ):
        inc = eval_spans(src, q.include)
        exc = eval_spans(src, q.exclude)
        out = {}
        for d, spans in inc.items():
            ex = exc.get(d)
            if not ex:
                out[d] = spans
                continue
            keep = [sp for sp in spans if not _overlaps(sp, ex)]
            if keep:
                out[d] = keep
        return out
    raise TypeError(f"not a span query: {type(q)}")


def span_matching_docs(src, q) -> np.ndarray:
    """Sorted doc_ids with at least one matching span."""
    return np.array(sorted(eval_spans(src, q)), dtype=np.int64)


def extract_terms(q) -> list[str]:
    """Unique query terms in sorted order — the ``SpanWeight`` idf-sum
    order (`SpanWeight.java:56-63`: ``extractTerms`` into a TreeSet)."""
    acc: set[str] = set()

    def walk(node):
        if isinstance(node, SpanTermQ):
            acc.add(node.term)
        elif isinstance(node, SpanNearQ) or isinstance(node, SpanOrQ):
            for c in node.clauses:
                walk(c)
        elif isinstance(node, SpanNotQ):
            # only the include side contributes to the weight
            walk(node.include)
        elif isinstance(node, SpanFirstQ):
            walk(node.match)
        else:
            raise TypeError(type(node))

    walk(q)
    return sorted(acc)


def span_freqs(src, q) -> tuple[np.ndarray, np.ndarray]:
    """-> (sorted doc_ids, float32 sloppy freqs): per doc,
    ``Σ 1/(end - start + 1)`` over its enumerated spans, float32-accumulated
    in span order (`SpanScorer.setFreqCurrentDoc`)."""
    by_doc = eval_spans(src, q)
    docs = np.array(sorted(by_doc), dtype=np.int64)
    freqs = np.empty(len(docs), dtype=np.float32)
    for i, d in enumerate(docs.tolist()):
        acc = np.float32(0.0)
        for s, e in by_doc[d]:
            acc = np.float32(acc + np.float32(1.0 / ((e - s) + 1)))
        freqs[i] = acc
    return docs, freqs
