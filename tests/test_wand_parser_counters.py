"""WAND rank-identity, query parser, sparse/NPlane counters."""

import numpy as np
import pytest

from lucene_solr_ray.index.reader import LocalIndex
from lucene_solr_ray.index.wand import wand_topk
from lucene_solr_ray.query.ast import BoolQ, Evaluator, FilterQ, MatchAllQ, MultiTermQ, PhraseQ, RangeQ, TermQ, top_k
from lucene_solr_ray.query.parser import QueryParser
from lucene_solr_ray.state.sparse_counter import CounterPool, NPlaneCounter, SparseCounter


@pytest.fixture(scope="module")
def local_index(pages_corpus):
    return LocalIndex(pages_corpus["index_dir"])


class TestWand:
    def test_single_term_rank_identical(self, local_index, oracle_index):
        for term in ["luko", "kalo", "zeph", "tali", "doesnotexist"]:
            got = wand_topk(local_index.parts, local_index.stats, [term], 10)
            assert got == oracle_index.search(TermQ(term), 10), term

    def test_disjunction_rank_identical(self, local_index, oracle_index):
        for terms in [["luko", "kalo"], ["zeph", "tali", "mado"], ["kibezimi", "luko"]]:
            got = wand_topk(local_index.parts, local_index.stats, terms, 10)
            want = oracle_index.search(BoolQ(should=tuple(TermQ(t) for t in terms)), 10)
            assert got == want, terms

    def test_large_k(self, local_index, oracle_index):
        got = wand_topk(local_index.parts, local_index.stats, ["luko"], 500)
        assert got == oracle_index.search(TermQ("luko"), 500)

    def test_conjunction_rank_identical(self, local_index, oracle_index):
        from lucene_solr_ray.index.wand import conjunction_topk

        for terms in [["luko", "kalo"], ["luko", "kalo", "zeph"],
                      ["kibezimi", "luko"], ["luko", "doesnotexist"]]:
            got, total = conjunction_topk(local_index.parts, local_index.stats, terms, 10)
            ast = BoolQ(must=tuple(TermQ(t) for t in terms))
            want = oracle_index.search(ast, 10)
            assert got == want, terms
            # exact hit count
            assert total == len(oracle_index.search(ast, 10**9)), terms

    def test_actor_conjunction_path(self, ray_session, pages_corpus, oracle_index):
        from lucene_solr_ray.index.searcher import RayIndexSearcher

        s = RayIndexSearcher(pages_corpus["index_dir"], num_actors=2)
        try:
            for ast in [
                BoolQ(must=(TermQ("luko"), TermQ("kalo"))),
                # mixed term + keyword filter (fq semantics, no score)
                BoolQ(must=(TermQ("luko"), FilterQ("tld", "com"))),
                # term + range filter + second term
                BoolQ(must=(TermQ("luko"), TermQ("kalo"), RangeQ("dl", 5, None))),
                # filter eliminating everything
                BoolQ(must=(TermQ("luko"), FilterQ("tld", "nosuchtld"))),
            ]:
                res = s.search(ast, k=10)
                assert res["topk"] == oracle_index.search(ast, 10), ast
                assert res["total_hits"] == len(oracle_index.search(ast, 10**9)), ast
        finally:
            s.shutdown()

    def test_actor_path_uses_wand(self, ray_session, pages_corpus, oracle_index):
        from lucene_solr_ray.index.searcher import RayIndexSearcher

        s = RayIndexSearcher(pages_corpus["index_dir"], num_actors=2)
        try:
            res = s.search(TermQ("luko"), k=10)
            assert res["topk"] == oracle_index.search(TermQ("luko"), 10)
            # exact total for single term
            assert res["total_hits"] == len(oracle_index.search(TermQ("luko"), 10**9))
        finally:
            s.shutdown()


class TestTimeAllowed:
    def test_deadline_routes_to_general_path(self, ray_session, pages_corpus, oracle_index):
        """time_allowed_ms must reach the deadline-aware evaluator loop even
        for queries the fast conjunction/WAND paths would otherwise take."""
        from lucene_solr_ray.index.searcher import RayIndexSearcher

        s = RayIndexSearcher(pages_corpus["index_dir"], num_actors=2)
        try:
            ast = BoolQ(must=(TermQ("luko"), TermQ("kalo")))
            res = s.search(ast, k=10, time_allowed_ms=60_000)
            # generous budget: identical results, through the general path
            assert res["topk"] == oracle_index.search(ast, 10)
            # exact count proves the exhaustive (deadline-aware) loop ran
            assert res["total_hits"] == len(oracle_index.search(ast, 10**9))
        finally:
            s.shutdown()


class TestParser:
    def test_shapes(self):
        p = QueryParser()
        assert p.parse("fox") == TermQ("fox")
        assert p.parse("quick AND fox") == BoolQ(must=(TermQ("quick"), TermQ("fox")))
        assert p.parse("quick OR fox") == BoolQ(should=(TermQ("quick"), TermQ("fox")))
        assert p.parse('"lazy dog"') == PhraseQ(("lazy", "dog"))
        assert p.parse("host:a.example") == FilterQ("host", "a.example")
        assert p.parse("dl:[1 TO 5]") == RangeQ("dl", 1, 5, True, True)
        assert p.parse("dl:{1 TO 5}") == RangeQ("dl", 1, 5, False, False)
        assert p.parse("*:*") == MatchAllQ()
        assert p.parse("fox^2.5") == TermQ("fox", boost=2.5)
        q = p.parse("+quick -lazy fox")
        assert q.must == (TermQ("quick"),) and q.must_not == (TermQ("lazy"),)

    def test_flat_classic_conjunction_semantics(self):
        """Classic has NO operator precedence: one flat clause list where AND
        promotes the PRECEDING clause to MUST unless prohibited
        (QueryParserBase.java:433-481 addClause) — `a AND b OR c` is
        `+a +b c`, NOT `(a AND b) OR c`."""
        p = QueryParser()
        assert p.parse("alpha AND beta OR gamma") == BoolQ(
            must=(TermQ("alpha"), TermQ("beta")), should=(TermQ("gamma"),)
        )
        # AND binds the adjacent pair only; earlier bare clauses stay SHOULD
        assert p.parse("alpha beta AND gamma") == BoolQ(
            must=(TermQ("beta"), TermQ("gamma")), should=(TermQ("alpha"),)
        )
        assert p.parse("alpha OR beta AND gamma") == BoolQ(
            must=(TermQ("beta"), TermQ("gamma")), should=(TermQ("alpha"),)
        )
        # AND NOT: promotion happens, the new clause is prohibited
        assert p.parse("alpha AND NOT beta") == BoolQ(
            must=(TermQ("alpha"),), must_not=(TermQ("beta"),)
        )
        # a prohibited preceding clause is never promoted by AND
        assert p.parse("-alpha AND beta") == BoolQ(
            must=(TermQ("beta"),), must_not=(TermQ("alpha"),)
        )

    def test_unquoted_multitoken_is_should_boolean(self):
        """An UNQUOTED value that analyzes to several tokens builds a SHOULD
        boolean, not a phrase (autoGeneratePhraseQueries defaults false since
        3.1; QueryBuilder.createFieldQuery !quoted branch).  Quoted input
        stays a phrase."""
        p = QueryParser()
        assert p.parse("foo-bar") == BoolQ(should=(TermQ("foo"), TermQ("bar")))
        assert p.parse('"foo-bar"') == PhraseQ(("foo", "bar"))
        assert p.parse("title:foo-bar") == BoolQ(
            should=(TermQ("foo", field="title"), TermQ("bar", field="title"))
        )
        assert p.parse('title:"foo-bar"') == PhraseQ(("foo", "bar"), field="title")

    def test_field_scoped_phrase_routing(self):
        from lucene_solr_ray.query.ast import BoostQ

        p = QueryParser()
        # keyword field: raw quoted value as a single untokenized filter term
        assert p.parse('host:"a b"') == FilterQ("host", "a b")
        # text field: analyzed phrase routed to that field
        assert p.parse('title:"alpha beta"') == PhraseQ(("alpha", "beta"), field="title")
        assert p.parse('title:"alpha"') == TermQ("alpha", field="title")
        # unknown field: analyzed phrase on the default text field
        assert p.parse('nosuch:"alpha beta"') == PhraseQ(("alpha", "beta"))

    def test_boost_on_any_clause(self):
        from lucene_solr_ray.query.ast import BoostQ

        p = QueryParser()
        assert p.parse("(quick OR fox)^2") == BoostQ(
            BoolQ(should=(TermQ("quick"), TermQ("fox"))), 2.0
        )
        assert p.parse("host:x^3") == BoostQ(FilterQ("host", "x"), 3.0)
        assert p.parse("pre*^2") == BoostQ(MultiTermQ("prefix", "pre"), 2.0)

    def test_boost_scales_scores(self, local_index):
        ev = Evaluator(local_index)
        from lucene_solr_ray.query.ast import BoostQ

        base = BoolQ(should=(TermQ("luko"), TermQ("kalo")))
        d0, s0 = ev.scored(base)
        d1, s1 = ev.scored(BoostQ(base, 2.0))
        assert np.array_equal(d0, d1)
        assert np.allclose(s1, (s0 * np.float32(2.0)).astype(np.float32))

    def test_total_hits_sentinel_propagates(self, ray_session, pages_corpus):
        from lucene_solr_ray.index.searcher import RayIndexSearcher

        s = RayIndexSearcher(pages_corpus["index_dir"], num_actors=2)
        try:
            # multi-term WAND path: hit count unknown -> -1, never -num_actors
            res = s.search(BoolQ(should=(TermQ("luko"), TermQ("kalo"))), k=5)
            assert res["total_hits"] == -1
            # facet path forces exhaustive evaluation -> exact count
            res2 = s.search(
                BoolQ(should=(TermQ("luko"), TermQ("kalo"))), k=5,
                facet_fields=("host",), facet_limit=5,
            )
            assert res2["total_hits"] >= len(res2["topk"])
        finally:
            s.shutdown()

    def test_analysis_applied(self):
        p = QueryParser()
        # query text is analyzed: lowercased, stopwords removed
        assert p.parse("The Fox") == TermQ("fox")
        assert p.parse("the") == MatchAllQ()  # all-stopword query

    def test_parsed_query_executes(self, local_index, oracle_index):
        p = QueryParser()
        for q in ["luko", "luko AND kalo", '+luko -kalo zeph', 'lang:en AND luko', '"luko kalo"']:
            ast = p.parse(q)
            docs, scores = Evaluator(local_index).scored(ast)
            assert top_k(docs, scores, 10) == oracle_index.search(ast, 10), q


class TestCounters:
    def _maxima(self):
        rng = np.random.default_rng(1)
        return np.concatenate(
            [np.ones(500), rng.integers(1, 4, 300), rng.integers(4, 300, 50), rng.integers(300, 50000, 5)]
        ).astype(np.int64)

    def test_nplane_equals_dense(self):
        maxima = self._maxima()
        n = len(maxima)
        rng = np.random.default_rng(2)
        c = NPlaneCounter(maxima)
        ref = np.zeros(n, dtype=np.int64)
        for _ in range(30):
            ords = rng.choice(n, size=rng.integers(1, 150))
            keep, tmp = [], ref.copy()
            for o in ords:
                if tmp[o] < maxima[o]:
                    keep.append(o)
                    tmp[o] += 1
            ords = np.array(keep, dtype=np.int64)
            c.inc(ords)
            np.add.at(ref, ords, 1)
        o, v = c.nonzero()
        assert (ref[o] == v).all() and len(o) == (ref > 0).sum()
        assert c.get(np.arange(n)).tolist() == ref.tolist()

    def test_nplane_plane_structure_is_longtail(self):
        c = NPlaneCounter(self._maxima())
        sizes = [len(p["members"]) for p in c.planes]
        assert sizes == sorted(sizes, reverse=True)  # fewer ords need more bits
        assert c.planes[0]["bits"] == 1

    def test_sparse_tracker_and_explosion(self):
        c = SparseCounter(10_000, cutoff=0.01)
        c.inc(np.array([1, 1, 5]))
        assert c.is_sparse
        o, v = c.nonzero()
        assert o.tolist() == [1, 5] and v.tolist() == [2, 1]
        c.inc(np.arange(5000))  # way past cutoff -> explodes to dense
        assert not c.is_sparse
        o, v = c.nonzero()
        assert v.sum() == 3 + 5000

    def test_sparse_heuristic(self):
        assert SparseCounter.use_sparse(hits=10, avg_refs=1.0, n_ords=10_000)
        assert not SparseCounter.use_sparse(hits=9_000, avg_refs=1.0, n_ords=10_000)

    def test_pool_reuse(self):
        pool = CounterPool()
        a = pool.acquire("f", lambda: SparseCounter(100))
        a.inc(np.array([1]))
        pool.release("f", a)
        b = pool.acquire("f", lambda: SparseCounter(100))
        assert b is a and b.nonzero()[0].size == 0  # cleared on release
        assert pool.hits == 1 and pool.misses == 1


class TestNPlaneFacetPath:
    def test_nplane_path_equals_oracle(self, pages_corpus, oracle_index, monkeypatch):
        from lucene_solr_ray.index.searcher import SegmentSearcher
        from lucene_solr_ray.query.ast import MatchAllQ, TermQ

        monkeypatch.setattr(SegmentSearcher, "NPLANE_MIN_ORDS", 1)  # force NPlane
        man = pages_corpus["manifest"]
        pids = [p["partition_id"] for p in man["partitions"]]
        s = SegmentSearcher(pages_corpus["index_dir"], pids)
        for q in [MatchAllQ(), TermQ("luko")]:
            res = s.search(q, k=5, facet_fields=("host", "links_sim"))
            o_hits = [d for _, d in oracle_index.search(q, 10**9)]
            for f in ("host", "links_sim"):
                ords, counts, _missing = res["facets"][f]
                vocab = s.stats.dicts[f]
                got = sorted(
                    ((vocab[o], int(c)) for o, c in zip(ords.tolist(), counts.tolist())),
                    key=lambda vc: (-vc[1], vc[0].encode()),
                )
                want = [vc for vc in oracle_index.facet(o_hits, f, limit=10**9, mincount=1)]
                assert got == want, (q, f)
