"""Surround query language parser.

Re-specification of the reference's surround parser
(`lucene/queryparser/src/java/org/apache/lucene/queryparser/surround/parser/QueryParser.jj`
and `surround/query/*.java`): a span-oriented query language with

* positional operators ``W`` (ordered) and ``N`` (unordered) — the CODE's
  semantics (``WQuery()`` passes ``ordered=true``, ``NQuery()`` ``false``;
  the package javadoc prose has them swapped) — with an optional distance
  prefix 2-99 (``3W``, ``4N``); distance 1 (adjacent) by default.  A
  distance ``n`` becomes ``SpanNear(slop = n - 1)``
  (`surround/query/DistanceQuery.java:100`:
  ``new SpanNearQuery(spanClauses, getOpDistance() - 1, subQueriesOrdered())``);
* boolean operators ``AND`` / ``OR`` / ``NOT`` (infix; AND/OR/W/N also
  prefix: ``AND(a, b, c)``, ``3W(a, b)``), all case-insensitive;
* truncated terms ``pre*`` / ``te?t`` (`SrndTruncQuery.java`) usable INSIDE
  distance operators (the reference rewrites them through
  `SpanNearClauseFactory` -> SpanOr of matched terms; here ``SpanMultiQ``
  carries the MultiTermQ and ``rewrite_spans`` expands it);
* ``field:`` prefixes (`FieldsQuery.java`), ``^boost`` weights, quoted
  single terms, and comma-separated prefix-operator argument lists.

Precedence (loosest to tightest, all left-associative, from the .jj
production chain ``OrQuery -> AndQuery -> NotQuery -> NQuery -> WQuery ->
PrimaryQuery``): OR, AND, NOT, N, W.

The parser emits this engine's mixed AST: boolean composition over
``query/ast.py`` nodes (TermQ / MultiTermQ / BoolQ / BoostQ) with W/N
subtrees as ``query/spans.py`` nodes (SpanTermQ / SpanNearQ / SpanOrQ /
SpanMultiQ), which the evaluator scores natively.  Operands of W/N must be
span-convertible — term, truncation, OR-of-span-convertibles, or a nested
distance op — matching the reference's ``DistanceSubQuery`` restriction
(`surround/query/DistanceQuery.java:55-64` distanceSubQueryNotAllowed).
"""

from __future__ import annotations

import re

from .ast import BoolQ, BoostQ, MultiTermQ, TermQ
from .parser import QueryParseError
from .spans import DEFAULT_FIELD, SpanMultiQ, SpanNearQ, SpanOrQ, SpanTermQ

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) | (?P<comma>,) | (?P<colon>:)
      | (?P<boost>\^(?P<bval>\d+(?:\.\d+)?))
      | (?P<quoted>"(?P<qbody>[^"]*)")
      | (?P<word>[^\s(),:^"]+)
    )""",
    re.VERBOSE,
)

_DIST_OP = re.compile(r"^(\d{1,2})?([WwNn])$")
_BOOL_OPS = {"and", "or", "not"}


def _lex(s: str) -> list[tuple[str, object]]:
    toks: list[tuple[str, object]] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip():
                raise QueryParseError(f"surround: cannot lex at {s[pos:]!r}")
            break
        pos = m.end()
        if m.group("lparen"):
            toks.append(("(", None))
        elif m.group("rparen"):
            toks.append((")", None))
        elif m.group("comma"):
            toks.append((",", None))
        elif m.group("colon"):
            toks.append((":", None))
        elif m.group("boost"):
            toks.append(("^", float(m.group("bval"))))
        elif m.group("quoted"):
            toks.append(("term", m.group("qbody")))
        else:
            w = m.group("word")
            dm = _DIST_OP.match(w)
            if dm:
                n = int(dm.group(1)) if dm.group(1) else 1
                if dm.group(1) and not 2 <= n <= 99:
                    raise QueryParseError(f"surround: distance {n} out of 2-99")
                toks.append(("dist", (n, dm.group(2).lower() == "w")))
            elif w.lower() in _BOOL_OPS:
                toks.append((w.lower(), None))
            else:
                toks.append(("term", w))
    return toks


def _as_span(q, field: str):
    """Convert a parsed operand into a span clause (DistanceSubQuery check)."""
    if isinstance(q, (SpanTermQ, SpanNearQ, SpanOrQ, SpanMultiQ)):
        return q
    if isinstance(q, TermQ):
        return SpanTermQ(q.term, field=q.field)
    if isinstance(q, MultiTermQ):
        return SpanMultiQ(q, field=q.field)
    if isinstance(q, BoolQ) and q.should and not q.must and not q.must_not:
        return SpanOrQ(tuple(_as_span(c, field) for c in q.should), field=field)
    raise QueryParseError(
        f"surround: operand not allowed inside a distance operator: {q!r}"
    )


class SurroundParser:
    """Recursive-descent parser for the surround language (see module doc)."""

    def __init__(self, default_field: str = DEFAULT_FIELD):
        self.default_field = default_field

    def parse(self, s: str):
        self._toks = _lex(s)
        self._i = 0
        q = self._or(self.default_field)
        if self._i != len(self._toks):
            raise QueryParseError(
                f"surround: trailing input at token {self._toks[self._i]}"
            )
        return q

    # -- token helpers ---------------------------------------------------

    def _peek(self):
        return self._toks[self._i] if self._i < len(self._toks) else (None, None)

    def _next(self):
        t = self._peek()
        self._i += 1
        return t

    def _expect(self, kind: str):
        k, v = self._next()
        if k != kind:
            raise QueryParseError(f"surround: expected {kind!r}, got {k!r}")
        return v

    # -- productions (OrQuery -> AndQuery -> NotQuery -> NQuery -> WQuery) ----

    def _or(self, field):
        q = self._and(field)
        while self._peek()[0] == "or":
            self._next()
            r = self._and(field)
            q = self._merge_or(q, r)
        return q

    def _and(self, field):
        q = self._not(field)
        while self._peek()[0] == "and":
            self._next()
            r = self._not(field)
            q = self._merge_and(q, r)
        return q

    def _not(self, field):
        q = self._n(field)
        while self._peek()[0] == "not":
            self._next()
            r = self._n(field)
            q = BoolQ(must=(q,), must_not=(r,))
        return q

    def _n(self, field):
        q = self._w(field)
        while self._peek()[0] == "dist" and not self._peek()[1][1]:
            n, _ = self._next()[1]
            r = self._w(field)
            q = SpanNearQ(
                (_as_span(q, field), _as_span(r, field)),
                slop=n - 1,
                in_order=False,
                field=field,
            )
        return q

    def _w(self, field):
        q = self._primary(field)
        while self._peek()[0] == "dist" and self._peek()[1][1]:
            n, _ = self._next()[1]
            r = self._primary(field)
            q = SpanNearQ(
                (_as_span(q, field), _as_span(r, field)),
                slop=n - 1,
                in_order=True,
                field=field,
            )
        return q

    def _primary(self, field):
        k, v = self._peek()
        if k == "(":
            self._next()
            q = self._or(field)
            self._expect(")")
        elif k in ("or", "and") and self._toks[self._i + 1 : self._i + 2] == [("(", None)]:
            self._next()
            args = self._arg_list(field)
            if len(args) < 2:
                raise QueryParseError(f"surround: prefix {k.upper()} needs >= 2 args")
            q = args[0]
            for r in args[1:]:
                q = self._merge_or(q, r) if k == "or" else self._merge_and(q, r)
        elif k == "dist" and self._toks[self._i + 1 : self._i + 2] == [("(", None)]:
            n, ordered = self._next()[1]
            args = self._arg_list(field)
            if len(args) < 2:
                raise QueryParseError("surround: prefix distance op needs >= 2 args")
            q = SpanNearQ(
                tuple(_as_span(a, field) for a in args),
                slop=n - 1,
                in_order=ordered,
                field=field,
            )
        elif k == "term":
            # field prefix? (FieldsQuery: TERM ':' query)
            if self._toks[self._i + 1 : self._i + 2] == [(":", None)]:
                f = v
                self._i += 2
                return self._primary(f)
            self._next()
            q = self._term_query(v, field)
        else:
            raise QueryParseError(f"surround: unexpected token {k!r}")
        while self._peek()[0] == "^":
            q = BoostQ(q, float(self._next()[1]))
        return q

    def _arg_list(self, field):
        self._expect("(")
        args = [self._or(field)]
        while self._peek()[0] == ",":
            self._next()
            args.append(self._or(field))
        self._expect(")")
        return args

    def _term_query(self, w: str, field: str):
        # truncated terms (SrndTruncQuery): '*' / '?' anywhere; lowercase to
        # match the simple/standard analyzer contract used by span entries
        w = w.lower()
        if "*" in w or "?" in w:
            if w.endswith("*") and "*" not in w[:-1] and "?" not in w:
                return MultiTermQ("prefix", w[:-1], field=field)
            return MultiTermQ("wildcard", w, field=field)
        return TermQ(w, field=field)

    # -- boolean merges (left-associative flattening like SrndBooleanQuery) ---

    @staticmethod
    def _merge_or(a, b):
        if isinstance(a, BoolQ) and a.should and not a.must and not a.must_not:
            return BoolQ(should=a.should + (b,))
        return BoolQ(should=(a, b))

    @staticmethod
    def _merge_and(a, b):
        if isinstance(a, BoolQ) and a.must and not a.should and not a.must_not:
            return BoolQ(must=a.must + (b,))
        return BoolQ(must=(a, b))
