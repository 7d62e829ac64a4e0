"""edismax parser: AST shapes + execution rank-identity on a multi-field
index (engine vs oracle share the evaluator; the parser itself is under test,
so shapes are asserted structurally and execution differentially)."""

import os

import pytest

from lucene_solr_ray.query.ast import BoolQ, BoostQ, DisMaxQ, MatchAllQ, PhraseQ, TermQ, top_k
from lucene_solr_ray.query.edismax import EDisMaxParser


class TestShapes:
    def test_single_term_multi_field(self):
        p = EDisMaxParser(qf=(("text", 1.0), ("title", 2.0)), tie=0.1)
        assert p.parse("fox") == DisMaxQ(
            (TermQ("fox", "text", 1.0), TermQ("fox", "title", 2.0)), tiebreak=0.1
        )

    def test_single_field_collapses(self):
        p = EDisMaxParser(qf=(("text", 1.0),))
        assert p.parse("fox") == TermQ("fox", "text", 1.0)

    def test_required_prohibited(self):
        p = EDisMaxParser(qf=(("text", 1.0),))
        q = p.parse("+quick -lazy fox")
        assert q.must == (TermQ("quick"),)
        assert q.must_not == (TermQ("lazy"),)
        assert q.should == (TermQ("fox"),)

    def test_phrase_clause(self):
        p = EDisMaxParser(qf=(("text", 1.0), ("title", 3.0)))
        q = p.parse('"lazy dog"')
        assert q == DisMaxQ(
            (PhraseQ(("lazy", "dog"), field="text", boost=1.0),
             PhraseQ(("lazy", "dog"), field="title", boost=3.0)),
            tiebreak=0.0,
        )

    def test_mm_percent(self):
        p = EDisMaxParser(qf=(("text", 1.0),), mm="67%")
        q = p.parse("a1 b2 c3")
        assert isinstance(q, BoolQ) and q.minimum_should_match == 2

    def test_pf_adds_phrase_boost(self):
        p = EDisMaxParser(qf=(("text", 1.0),), pf=(("title", 5.0),))
        q = p.parse("quick fox")
        assert BoostQ(PhraseQ(("quick", "fox"), field="title"), 5.0) in q.should

    def test_pf_outside_mm_scope(self):
        """pf phrase boosts attach OUTSIDE the mm-bearing query (reference
        adds them to an outer BooleanQuery): a doc matching the phrase on a
        pf-only field must still satisfy mm over the qf term clauses."""
        p = EDisMaxParser(qf=(("text", 1.0),), pf=(("title", 5.0),), mm="100%")
        q = p.parse("quick fox")
        assert isinstance(q, BoolQ) and len(q.must) == 1
        inner = q.must[0]
        assert inner.minimum_should_match == 2
        assert all(not isinstance(c, BoostQ) for c in inner.should)
        assert q.should == (BoostQ(PhraseQ(("quick", "fox"), field="title"), 5.0),)

    def test_matchall_and_pure_negative(self):
        p = EDisMaxParser()
        assert p.parse("*:*") == MatchAllQ()
        q = p.parse("-fox")
        assert q.must == (MatchAllQ(),) and q.must_not == (TermQ("fox"),)

    def test_stopwords_analyzed_out(self):
        p = EDisMaxParser()
        assert p.parse("The Fox") == TermQ("fox")

    def test_mm_applies_with_required_clause(self):
        # minimum-should-match binds the OPTIONAL clauses independently of
        # any '+' required clause (the reference scopes mm to SHOULD only)
        p = EDisMaxParser(qf=(("text", 1.0),), mm=2)
        q = p.parse("+quick lazy fox dog")
        assert isinstance(q, BoolQ)
        assert q.must == (TermQ("quick"),)
        assert q.minimum_should_match == 2


@pytest.fixture(scope="module")
def mf(ray_session, tmp_path_factory):
    from lucene_solr_ray.analysis.html_extract import extract
    from lucene_solr_ray.fixtures import write_pages_parquet
    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.index.reader import LocalIndex
    from lucene_solr_ray.oracle import OracleIndex

    root = str(tmp_path_factory.mktemp("edismax"))
    files = write_pages_parquet(os.path.join(root, "pages"), 300, n_files=2)
    ix = os.path.join(root, "ix")
    build_index(files, ix, rows_per_partition=64, extra_text_fields=("title",))
    import pyarrow.parquet as pq

    df = pq.read_table(files).to_pandas()
    df = df.sort_values(["url", "warc_ts", "doc_id"]).groupby("url", as_index=False).last()
    rows = df.to_dict("records")
    for r in rows:
        r["title"] = extract(r["html"])[0]
    return {"loc": LocalIndex(ix), "oracle": OracleIndex(rows, extra_fields=("title",))}


class TestExecution:
    def test_rank_identical_engine_vs_oracle(self, mf):
        from lucene_solr_ray.query.ast import Evaluator

        p = EDisMaxParser(qf=(("text", 1.0), ("title", 2.0)), tie=0.3,
                          pf=(("text", 4.0),), mm=1)
        for q in ["luko", "luko kalo", "+luko kalo -zeph", '"luko kalo"', "luko kalo tali"]:
            ast = p.parse(q)
            docs, scores = Evaluator(mf["loc"]).scored(ast)
            got = top_k(docs, scores, 10)
            want = mf["oracle"].search(ast, 10)
            assert got == want, q

    def test_title_boost_changes_ranking(self, mf):
        """A strong title boost must surface title matches over text-only."""
        from lucene_solr_ray.query.ast import Evaluator

        t = list(mf["oracle"].vocabulary("title"))[0]
        low = EDisMaxParser(qf=(("text", 1.0), ("title", 0.01)))
        high = EDisMaxParser(qf=(("text", 0.01), ("title", 10.0)))
        ev = Evaluator(mf["loc"])
        d1, s1 = ev.scored(low.parse(t))
        d2, s2 = ev.scored(high.parse(t))
        assert len(d1) and len(d2)
        # title-boosted scores dominate where the term is in the title
        title_docs, _ = mf["loc"].postings("title", t)
        if len(title_docs):
            top_high = top_k(d2, s2, 1)[0][1]
            assert top_high in set(title_docs.tolist())
