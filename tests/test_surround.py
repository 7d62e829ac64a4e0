"""Surround query parser (`query/surround.py`) — grammar, precedence, span
conversion, and an indexed e2e differential vs an independent positional
oracle over the raw fixture texts."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.query.ast import BoolQ, BoostQ, MultiTermQ, TermQ
from lucene_solr_ray.query.parser import QueryParseError
from lucene_solr_ray.query.spans import SpanMultiQ, SpanNearQ, SpanOrQ, SpanTermQ
from lucene_solr_ray.query.surround import SurroundParser

P = SurroundParser()
SF = "/root/testdata/sf0.001"


class TestGrammar:
    def test_infix_w_is_ordered(self):
        q = P.parse("a w b")
        assert q == SpanNearQ((SpanTermQ("a"), SpanTermQ("b")), slop=0, in_order=True)

    def test_infix_n_is_unordered_with_distance(self):
        q = P.parse("a 4N b")
        assert q == SpanNearQ((SpanTermQ("a"), SpanTermQ("b")), slop=3, in_order=False)

    def test_prefix_distance_multi_operand(self):
        q = P.parse("3W(a, b, c)")
        assert isinstance(q, SpanNearQ) and q.in_order and q.slop == 2
        assert len(q.clauses) == 3

    def test_precedence_or_loosest_w_tightest(self):
        # a OR b 2W c == a OR (b 2W c)
        q = P.parse("a OR b 2W c")
        assert isinstance(q, BoolQ) and len(q.should) == 2
        assert q.should[0] == TermQ("a")
        assert isinstance(q.should[1], SpanNearQ)

    def test_n_binds_looser_than_w(self):
        # a N b W c == a N (b W c)  (NQuery -> WQuery chain)
        q = P.parse("a N b W c")
        assert isinstance(q, SpanNearQ) and not q.in_order
        assert isinstance(q.clauses[1], SpanNearQ) and q.clauses[1].in_order

    def test_infix_not(self):
        q = P.parse("a NOT b")
        assert q == BoolQ(must=(TermQ("a"),), must_not=(TermQ("b"),))

    def test_prefix_and_or(self):
        q = P.parse("AND(a, b, c)")
        assert isinstance(q, BoolQ) and len(q.must) == 3
        q = P.parse("or(a, b)")
        assert isinstance(q, BoolQ) and len(q.should) == 2

    def test_truncated_inside_distance(self):
        q = P.parse("pre* W b")
        assert isinstance(q.clauses[0], SpanMultiQ)
        assert q.clauses[0].multi == MultiTermQ("prefix", "pre")
        q2 = P.parse("t?st W b")
        assert q2.clauses[0].multi == MultiTermQ("wildcard", "t?st")

    def test_or_of_terms_inside_distance(self):
        q = P.parse("(a OR b) W c")
        assert isinstance(q.clauses[0], SpanOrQ)
        assert q.clauses[0].clauses == (SpanTermQ("a"), SpanTermQ("b"))

    def test_field_prefix_and_boost(self):
        q = P.parse("title:a 2W title:b")
        assert q.clauses[0] == SpanTermQ("a", field="title")
        q2 = P.parse("a^3")
        assert q2 == BoostQ(TermQ("a"), 3.0)

    def test_case_insensitive_operators_and_terms_lowercased(self):
        q = P.parse("Apple and Banana")
        assert q == BoolQ(must=(TermQ("apple"), TermQ("banana")))

    def test_quoted_term_is_literal(self):
        q = P.parse('"And" W b')
        assert q.clauses[0] == SpanTermQ("and")

    def test_errors(self):
        with pytest.raises(QueryParseError):
            P.parse("a W (b AND c)")  # AND not span-convertible
        with pytest.raises(QueryParseError):
            P.parse("101W(a, b)")  # distance out of 2-99
        with pytest.raises(QueryParseError):
            P.parse("W(a)")  # prefix distance needs >= 2 args
        with pytest.raises(QueryParseError):
            P.parse("a )")  # trailing input


def _simple_toks(text):
    import re

    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def _brute(texts, pred):
    return sorted(d for d, txt in texts.items() if pred(_simple_toks(txt)))


class TestIndexedE2E:
    @pytest.fixture(scope="class")
    def corpus(self, ray_session):
        t = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "text"])
        return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))

    def _run(self, query):
        from lucene_solr_ray.pipelines.fulltext import _search_docs
        from lucene_solr_ray.query.surround import SurroundParser

        return _search_docs(SF, SurroundParser().parse(query))["doc_id"].to_pylist()

    def test_ordered_distance(self, corpus):
        got = self._run("3W(customer, join)")

        def pred(toks):
            pos_a = [i for i, t in enumerate(toks) if t == "customer"]
            pos_b = {i for i, t in enumerate(toks) if t == "join"}
            return any(i + d in pos_b for i in pos_a for d in (1, 2, 3))

        assert got == _brute(corpus, pred)
        assert len(got) > 0

    def test_unordered_adjacent(self, corpus):
        got = self._run("stream N window")

        def pred(toks):
            pos_a = [i for i, t in enumerate(toks) if t == "stream"]
            pos_b = {i for i, t in enumerate(toks) if t == "window"}
            return any(i + d in pos_b for i in pos_a for d in (-1, 1))

        assert got == _brute(corpus, pred)
        assert len(got) > 0

    def test_boolean_over_spans(self, corpus):
        a = set(self._run("3W(customer, join)"))
        b = set(self._run("stream N window"))
        both = self._run("3W(customer, join) OR (stream N window)")
        assert both == sorted(a | b)
        neither = self._run("(customer W join) NOT hash")

        def pred(toks):
            pos_a = [i for i, t in enumerate(toks) if t == "customer"]
            pos_b = {i for i, t in enumerate(toks) if t == "join"}
            return any(i + 1 in pos_b for i in pos_a) and "hash" not in toks

        assert neither == _brute(corpus, pred)

    def test_truncation_in_distance(self, corpus):
        got = self._run("cust* W join")

        def pred(toks):
            pos_b = {i for i, t in enumerate(toks) if t == "join"}
            return any(
                i + 1 in pos_b for i, t in enumerate(toks) if t.startswith("cust")
            )

        assert got == _brute(corpus, pred)
