"""XML query parser (CoreParser element language) — AST-shape tests per
builder element, error handling, and end-to-end hit/score identity against
the equivalent directly-constructed or classic-parsed queries."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_ray.index.reader import LocalIndex
from lucene_solr_ray.query.ast import (
    BoolQ,
    BoostQ,
    DisMaxQ,
    Evaluator,
    FilterQ,
    MatchAllQ,
    PayloadScoreQ,
    RangeQ,
    TermQ,
    TermRangeQ,
)
from lucene_solr_ray.query.parser import QueryParseError, QueryParser
from lucene_solr_ray.query.spans import (
    SpanFirstQ,
    SpanNearQ,
    SpanNotQ,
    SpanOrQ,
    SpanTermQ,
)
from lucene_solr_ray.query.xmlparser import XMLQueryParser


@pytest.fixture(scope="module")
def local_index(pages_corpus):
    return LocalIndex(pages_corpus["index_dir"])


P = XMLQueryParser()


class TestShapes:
    def test_term_query_raw_no_analysis(self):
        # TermQueryBuilder passes the text through UNanalyzed
        assert P.parse("<TermQuery>Fox</TermQuery>") == TermQ("Fox")
        assert P.parse('<TermQuery fieldName="title">fox</TermQuery>') == TermQ(
            "fox", field="title"
        )

    def test_term_query_boost_inline(self):
        assert P.parse('<TermQuery boost="2.5">fox</TermQuery>') == TermQ(
            "fox", boost=2.5
        )

    def test_terms_query_analyzes(self):
        # TermsQueryBuilder analyzes into SHOULD clauses (stopword dropped)
        q = P.parse("<TermsQuery>The Quick FOX</TermsQuery>")
        assert q == BoolQ(should=(TermQ("quick"), TermQ("fox")))

    def test_match_all(self):
        assert P.parse("<MatchAllDocsQuery/>") == MatchAllQ()

    def test_user_query_routes_classic_parser(self):
        assert P.parse("<UserQuery>quick AND fox</UserQuery>") == QueryParser().parse(
            "quick AND fox"
        )

    def test_boolean_query_clauses(self):
        q = P.parse(
            """
            <BooleanQuery minimumNumberShouldMatch="1">
              <Clause occurs="must"><TermQuery>quick</TermQuery></Clause>
              <Clause occurs="mustNot"><TermQuery>lazy</TermQuery></Clause>
              <Clause occurs="should"><TermQuery>fox</TermQuery></Clause>
              <Clause occurs="should"><TermQuery>dog</TermQuery></Clause>
            </BooleanQuery>"""
        )
        assert q == BoolQ(
            must=(TermQ("quick"),),
            should=(TermQ("fox"), TermQ("dog")),
            must_not=(TermQ("lazy"),),
            minimum_should_match=1,
        )

    def test_boolean_filter_clause_is_non_scoring_node(self):
        q = P.parse(
            """
            <BooleanQuery>
              <Clause occurs="must"><TermQuery>fox</TermQuery></Clause>
              <Clause occurs="filter">
                <NumericRangeFilter fieldName="dl" lowerTerm="1" upperTerm="5"/>
              </Clause>
            </BooleanQuery>"""
        )
        assert q == BoolQ(must=(TermQ("fox"), RangeQ("dl", 1, 5, True, True)))

    def test_dismax(self):
        q = P.parse(
            """
            <DisjunctionMaxQuery tieBreaker="0.3">
              <TermQuery>fox</TermQuery>
              <TermQuery fieldName="title">fox</TermQuery>
            </DisjunctionMaxQuery>"""
        )
        assert q == DisMaxQ(
            clauses=(TermQ("fox"), TermQ("fox", field="title")), tiebreak=0.3
        )

    def test_numeric_range_query(self):
        q = P.parse(
            '<NumericRangeQuery fieldName="dl" lowerTerm="3" upperTerm="9"'
            ' includeUpper="false"/>'
        )
        assert q == RangeQ("dl", 3, 9, True, False)

    def test_range_query_and_filter_are_term_ranges(self):
        q = P.parse('<RangeQuery lowerTerm="kalo" upperTerm="luko"/>')
        assert q == TermRangeQ(lo="kalo", hi="luko")
        q = P.parse(
            '<ConstantScoreQuery><RangeFilter lowerTerm="a" upperTerm="b"'
            ' includeLower="false"/></ConstantScoreQuery>'
        )
        assert q == TermRangeQ(lo="a", hi="b", include_lo=False)

    def test_filtered_query_joins_filter_as_fq(self):
        q = P.parse(
            """
            <FilteredQuery>
              <Query><TermQuery>fox</TermQuery></Query>
              <Filter><TermFilter fieldName="lang">en</TermFilter></Filter>
            </FilteredQuery>"""
        )
        assert q == BoolQ(must=(TermQ("fox"), FilterQ("lang", "en")))

    def test_boosting_term_query_is_avg_payload(self):
        # 4.x PayloadTermQuery(term, AveragePayloadFunction, includeSpanScore)
        q = P.parse("<BoostingTermQuery>fox</BoostingTermQuery>")
        assert q == PayloadScoreQ(
            term="fox", func="average", include_span_score=True
        )

    def test_boost_attr_wraps_boostq(self):
        q = P.parse(
            '<BooleanQuery boost="2.0">'
            "<Clause occurs='should'><TermQuery>fox</TermQuery></Clause>"
            "</BooleanQuery>"
        )
        assert q == BoostQ(BoolQ(should=(TermQ("fox"),)), 2.0)

    def test_spans(self):
        q = P.parse(
            """
            <SpanNear slopFactor="2" inOrder="false">
              <SpanTerm>quick</SpanTerm>
              <SpanOr>
                <SpanTerm>fox</SpanTerm>
                <SpanTerm>dog</SpanTerm>
              </SpanOr>
            </SpanNear>"""
        )
        assert q == SpanNearQ(
            clauses=(
                SpanTermQ("quick"),
                SpanOrQ(clauses=(SpanTermQ("fox"), SpanTermQ("dog"))),
            ),
            slop=2,
            in_order=False,
        )

    def test_span_or_terms_analyzes(self):
        q = P.parse("<SpanOrTerms>The Quick FOX</SpanOrTerms>")
        assert q == SpanOrQ(clauses=(SpanTermQ("quick"), SpanTermQ("fox")))

    def test_span_first_and_not(self):
        q = P.parse('<SpanFirst end="3"><SpanTerm>fox</SpanTerm></SpanFirst>')
        assert q == SpanFirstQ(match=SpanTermQ("fox"), end=3)
        q = P.parse(
            """
            <SpanNot>
              <Include><SpanTerm>fox</SpanTerm></Include>
              <Exclude><SpanTerm>lazy</SpanTerm></Exclude>
            </SpanNot>"""
        )
        assert q == SpanNotQ(include=SpanTermQ("fox"), exclude=SpanTermQ("lazy"))


class TestErrors:
    @pytest.mark.parametrize(
        "xml",
        [
            "<NoSuchQuery>x</NoSuchQuery>",
            "<TermQuery></TermQuery>",
            "<BooleanQuery><TermQuery>x</TermQuery></BooleanQuery>",
            "<Clause><TermQuery>x</TermQuery></Clause>",
            "not xml at all <",
            "<FilteredQuery><Query><TermQuery>x</TermQuery></Query></FilteredQuery>",
            "<SpanNot><Include/><Exclude><SpanTerm>x</SpanTerm></Exclude></SpanNot>",
        ],
    )
    def test_raise_parse_error(self, xml):
        with pytest.raises(QueryParseError):
            P.parse(xml)


class TestEndToEnd:
    def test_xml_equals_classic_on_index(self, local_index):
        """The XML and classic parsers route to the same evaluator nodes —
        scores must be bit-identical."""
        ev = Evaluator(local_index)
        pairs = [
            (
                "<BooleanQuery>"
                "<Clause occurs='must'><TermQuery>luko</TermQuery></Clause>"
                "<Clause occurs='must'><TermQuery>kalo</TermQuery></Clause>"
                "</BooleanQuery>",
                "luko AND kalo",
            ),
            ("<UserQuery>luko OR kalo</UserQuery>", "luko OR kalo"),
        ]
        cp = QueryParser()
        for xml, classic in pairs:
            d0, s0 = ev.scored(P.parse(xml))
            d1, s1 = ev.scored(cp.parse(classic))
            assert np.array_equal(d0, d1)
            assert np.array_equal(s0, s1)

    def test_span_xml_matches_direct_ast(self, local_index):
        ev = Evaluator(local_index)
        xml_q = P.parse(
            '<SpanNear slopFactor="3" inOrder="true">'
            "<SpanTerm>luko</SpanTerm><SpanTerm>kalo</SpanTerm></SpanNear>"
        )
        direct = SpanNearQ(
            clauses=(SpanTermQ("luko"), SpanTermQ("kalo")), slop=3, in_order=True
        )
        assert np.array_equal(ev.scored(xml_q)[0], ev.scored(direct)[0])
