"""XML query parser — the reference's CoreParser element language
(`lucene/queryparser/src/java/org/apache/lucene/queryparser/xml/CoreParser.java`
plus its `builders/` package) mapped onto this engine's AST.

Supported elements (the CoreParser registry, minus the contrib-grade
builders that have no engine counterpart here):

===================  =========================================================
``<TermQuery>``       RAW term (no analysis — `TermQueryBuilder.java:40`),
                      attrs ``fieldName`` ``boost``
``<TermsQuery>``      text ANALYZED into a SHOULD-of-terms BooleanQuery
                      (`TermsQueryBuilder.java:44-60`)
``<MatchAllDocsQuery>`` MatchAllQ
``<BooleanQuery>``    ``<Clause occurs=must|mustNot|should|filter>`` children
                      (`BooleanQueryBuilder.java:58-75`), attrs
                      ``minimumNumberShouldMatch`` ``boost``; ``filter``
                      occurs maps RangeFilter/NumericRangeFilter clauses to
                      the engine's non-scoring fq nodes
``<UserQuery>``       classic query-parser syntax
                      (`UserInputQueryBuilder.java:55`)
``<DisjunctionMaxQuery>`` attr ``tieBreaker`` (`DisjunctionMaxQueryBuilder`)
``<NumericRangeQuery>``  numeric doc-values range
                      (`NumericRangeQueryBuilder.java:77-119`)
``<RangeQuery>`` /    lexicographic TermRangeQ over the sorted dictionary
``<RangeFilter>``     (`RangeFilterBuilder.java:39-52`; RangeQuery is the
                      5.x name for the same element shape)
``<NumericRangeFilter>`` RangeQ used as a non-scoring filter clause
``<ConstantScoreQuery>`` child filter evaluated constant-score
                      (`ConstantScoreQueryBuilder.java:40`)
``<FilteredQuery>``   ``<Query>`` + ``<Filter>`` children; filter joins the
                      query as a non-scoring MUST clause — exactly the
                      engine's fq semantics (`FilteredQueryBuilder.java`)
``<SpanTerm>`` ``<SpanNear>`` ``<SpanOr>`` ``<SpanOrTerms>`` ``<SpanFirst>``
``<SpanNot>``         span AST nodes (`SpanQueryBuilderFactory` set)
``<BoostingTermQuery>`` PayloadScoreQ func=average, includeSpanScore=true —
                      the 4.x `BoostingTermBuilder.java:45` builds
                      ``PayloadTermQuery(..., AveragePayloadFunction)``
===================  =========================================================

Unsupported builders (documented subset): FuzzyLikeThisQuery, LikeThisQuery,
BoostingQuery, DuplicateFilter, CachedFilter, TermsFilter — the first three
are contrib heuristics superseded by the engine's MLT/edismax surface.

A ``boost`` attribute on an element whose AST node carries no boost field is
honored by wrapping the node in :class:`BoostQ` (numerically identical —
score = boost * child score)."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from ..stages.tokenize import query_analyzer
from .ast import (
    BoolQ,
    BoostQ,
    DisMaxQ,
    FilterQ,
    MatchAllQ,
    PayloadScoreQ,
    RangeQ,
    TermQ,
    TermRangeQ,
)
from .parser import QueryParseError, QueryParser
from .spans import SpanFirstQ, SpanNearQ, SpanNotQ, SpanOrQ, SpanTermQ


def _bool_attr(e: ET.Element, name: str, default: bool) -> bool:
    v = e.get(name)
    if v is None:
        return default
    return v.strip().lower() == "true"


def _num(v: str):
    try:
        return int(v)
    except ValueError:
        return float(v)


class XMLQueryParser:
    """``parse(xml_string) -> AST`` (CoreParser.parse analog)."""

    def __init__(
        self,
        default_field: str = "text",
        analyzer: str = "standard",
        keyword_fields: tuple = ("host", "tld", "lang", "source"),
    ):
        self.default_field = default_field
        self._analyze = query_analyzer(analyzer)
        self._user_parser = QueryParser(
            default_field=default_field,
            keyword_fields=keyword_fields,
            analyzer=analyzer,
        )

    # -- public ---------------------------------------------------------

    def parse(self, xml: str):
        try:
            root = ET.fromstring(xml)
        except ET.ParseError as ex:
            raise QueryParseError(f"malformed query XML: {ex}") from ex
        return self._query(root)

    # -- element dispatch -------------------------------------------------

    def _query(self, e: ET.Element):
        name = e.tag
        fn = getattr(self, f"_q_{name}", None)
        if fn is None:
            raise QueryParseError(f"unknown query element <{name}>")
        node = fn(e)
        boost = e.get("boost")
        if boost is not None:
            b = float(boost)
            if isinstance(node, TermQ):
                node = TermQ(node.term, field=node.field, boost=b)
            elif b != 1.0:
                node = BoostQ(child=node, boost=b)
        return node

    def _field(self, e: ET.Element) -> str:
        return e.get("fieldName", self.default_field)

    def _text(self, e: ET.Element) -> str:
        t = (e.text or "").strip()
        if not t:
            raise QueryParseError(f"<{e.tag}> requires non-blank text")
        return t

    def _children(self, e: ET.Element):
        return [c for c in e if isinstance(c.tag, str)]

    # -- core queries ------------------------------------------------------

    def _q_TermQuery(self, e):
        return TermQ(self._text(e), field=self._field(e))

    def _q_TermsQuery(self, e):
        terms = tuple(t for t, _ in self._analyze(self._text(e)))
        return BoolQ(should=tuple(TermQ(t, field=self._field(e)) for t in terms))

    def _q_MatchAllDocsQuery(self, e):
        return MatchAllQ()

    def _q_UserQuery(self, e):
        return self._user_parser.parse(self._text(e))

    def _q_BooleanQuery(self, e):
        must, should, must_not = [], [], []
        for clause in self._children(e):
            if clause.tag != "Clause":
                raise QueryParseError(
                    f"<BooleanQuery> children must be <Clause>, got <{clause.tag}>"
                )
            occurs = clause.get("occurs", "should")
            kids = self._children(clause)
            if len(kids) != 1:
                raise QueryParseError("<Clause> requires exactly one child query")
            if occurs == "filter":
                node = self._filter(kids[0])
                must.append(node)
            else:
                node = self._query(kids[0])
                if occurs == "must":
                    must.append(node)
                elif occurs == "mustNot":
                    must_not.append(node)
                elif occurs == "should":
                    should.append(node)
                else:
                    raise QueryParseError(f"unknown occurs value {occurs!r}")
        return BoolQ(
            must=tuple(must),
            should=tuple(should),
            must_not=tuple(must_not),
            minimum_should_match=int(e.get("minimumNumberShouldMatch", "0")),
        )

    def _q_DisjunctionMaxQuery(self, e):
        return DisMaxQ(
            clauses=tuple(self._query(c) for c in self._children(e)),
            tiebreak=float(e.get("tieBreaker", "0.0")),
        )

    def _q_NumericRangeQuery(self, e):
        lo, hi = e.get("lowerTerm"), e.get("upperTerm")
        return RangeQ(
            field=self._field(e),
            lo=None if lo is None else _num(lo),
            hi=None if hi is None else _num(hi),
            include_lo=_bool_attr(e, "includeLower", True),
            include_hi=_bool_attr(e, "includeUpper", True),
        )

    def _q_RangeQuery(self, e):
        return TermRangeQ(
            lo=e.get("lowerTerm"),
            hi=e.get("upperTerm"),
            field=self._field(e),
            include_lo=_bool_attr(e, "includeLower", True),
            include_hi=_bool_attr(e, "includeUpper", True),
        )

    def _q_ConstantScoreQuery(self, e):
        kids = self._children(e)
        if len(kids) != 1:
            raise QueryParseError("<ConstantScoreQuery> requires one filter child")
        return self._filter(kids[0])

    def _q_FilteredQuery(self, e):
        q = f = None
        for c in self._children(e):
            kids = self._children(c)
            if len(kids) != 1:
                raise QueryParseError(f"<{c.tag}> requires exactly one child")
            if c.tag == "Query":
                q = self._query(kids[0])
            elif c.tag == "Filter":
                f = self._filter(kids[0])
            else:
                raise QueryParseError(f"unknown <FilteredQuery> child <{c.tag}>")
        if q is None or f is None:
            raise QueryParseError("<FilteredQuery> requires <Query> and <Filter>")
        # non-scoring MUST clause == FilteredQuery (score = inner query)
        return BoolQ(must=(q, f))

    def _q_BoostingTermQuery(self, e):
        # 4.x builds PayloadTermQuery(term, AveragePayloadFunction) — payload
        # average multiplied by the span score (includeSpanScore=true)
        return PayloadScoreQ(
            term=self._text(e),
            field=self._field(e),
            func="average",
            include_span_score=True,
        )

    # -- filters (non-scoring nodes) --------------------------------------

    def _filter(self, e: ET.Element):
        if e.tag == "RangeFilter":
            node = self._q_RangeQuery(e)
        elif e.tag == "NumericRangeFilter":
            node = self._q_NumericRangeQuery(e)
        elif e.tag == "TermFilter":
            # keyword-field equality (TermsFilter's single-term shape)
            node = FilterQ(self._field(e), self._text(e))
        else:
            raise QueryParseError(f"unknown filter element <{e.tag}>")
        return node

    # -- span queries -------------------------------------------------------

    def _span(self, e: ET.Element):
        name = e.tag
        fn = getattr(self, f"_s_{name}", None)
        if fn is None:
            raise QueryParseError(f"unknown span element <{name}>")
        return fn(e)

    def _s_SpanTerm(self, e):
        return SpanTermQ(self._text(e), field=self._field(e))

    def _s_SpanNear(self, e):
        return SpanNearQ(
            clauses=tuple(self._span(c) for c in self._children(e)),
            slop=int(e.get("slopFactor", "0")),
            in_order=_bool_attr(e, "inOrder", True),
        )

    def _s_SpanOr(self, e):
        return SpanOrQ(clauses=tuple(self._span(c) for c in self._children(e)))

    def _s_SpanOrTerms(self, e):
        field = self._field(e)
        terms = tuple(t for t, _ in self._analyze(self._text(e)))
        return SpanOrQ(clauses=tuple(SpanTermQ(t, field=field) for t in terms))

    def _s_SpanFirst(self, e):
        kids = self._children(e)
        if len(kids) != 1:
            raise QueryParseError("<SpanFirst> requires one span child")
        return SpanFirstQ(match=self._span(kids[0]), end=int(e.get("end", "1")))

    def _s_SpanNot(self, e):
        inc = exc = None
        for c in self._children(e):
            kids = self._children(c)
            if c.tag in ("Include", "Exclude") and not kids:
                raise QueryParseError(f"<{c.tag}> requires one span child")
            if c.tag == "Include":
                inc = self._span(kids[0])
            elif c.tag == "Exclude":
                exc = self._span(kids[0])
        if inc is None or exc is None:
            raise QueryParseError("<SpanNot> requires <Include> and <Exclude>")
        return SpanNotQ(include=inc, exclude=exc)

    # span elements are also valid top-level queries (constant-score doc-set
    # contract, same as the engine's other span entry points)
    _q_SpanTerm = _s_SpanTerm
    _q_SpanNear = _s_SpanNear
    _q_SpanOr = _s_SpanOr
    _q_SpanOrTerms = _s_SpanOrTerms
    _q_SpanFirst = _s_SpanFirst
    _q_SpanNot = _s_SpanNot
