"""Differential end-to-end tests: Ray-built index vs pure-Python oracle.

The oracle pattern mirrors the reference's dominant test strategy
(`BaseDistributedSearchTestCase.compareResponses`, `SparseFacetTest.java`):
identical docs into a single-process control and the distributed engine,
identical queries, exact comparison.
"""

import os

import numpy as np
import pytest

from lucene_solr_ray.fixtures import make_query_set, query_to_ast
from lucene_solr_ray.index.reader import LocalIndex
from lucene_solr_ray.oracle import OracleIndex
from lucene_solr_ray.query.ast import BoolQ, Evaluator, FilterQ, MatchAllQ, PhraseQ, TermQ, top_k


@pytest.fixture(scope="module")
def local_index(pages_corpus):
    return LocalIndex(pages_corpus["index_dir"])


def test_extraction_byte_identical(pages_corpus, oracle_rows):
    """Per-row invariant: pipeline extraction == `text` column, byte for byte."""
    from lucene_solr_ray.analysis.html_extract import extract

    for r in oracle_rows[:100]:
        _, body, _ = extract(r["html"])
        assert body == r["text"], r["url"]


def test_dedup_one_row_per_url(pages_corpus, oracle_rows, local_index):
    # fixture generates ~0.5% duplicated urls; exactly the most-recent survives
    assert local_index.stats.max_doc == len(oracle_rows)
    kept = set()
    for p in local_index.parts:
        kept.update(p.doc_ids.tolist())
    expect = {r["doc_id"] for r in oracle_rows}
    assert kept == expect


def test_norms_and_dl_match_oracle(oracle_index, local_index):
    o_map = dict(zip(oracle_index.doc_ids.tolist(), oracle_index.norms.tolist()))
    for p in local_index.parts:
        for d, nb in zip(p.doc_ids.tolist(), p.norms.tolist()):
            assert o_map[d] == nb


def test_global_stats_match(oracle_index, local_index):
    assert local_index.stats.max_doc == oracle_index.max_doc
    assert local_index.stats.sum_dl == oracle_index.sum_ttf
    # spot-check df for some terms
    for term in list(oracle_index._post.keys())[:50]:
        assert local_index.global_df("text", term) == oracle_index.global_df("text", term)


def test_rank_identical_queries(oracle_index, local_index):
    """Top-k docIDs AND float32 scores identical on the fixture query set."""
    ev = Evaluator(local_index)
    for q in make_query_set(60):
        ast = query_to_ast(q)
        docs, scores = ev.scored(ast)
        assert top_k(docs, scores, q["k"]) == oracle_index.search(ast, q["k"]), q


def test_distributed_full_query_set(ray_session, pages_corpus, oracle_index):
    """The whole fixture query set through the ACTOR pool (WAND included for
    term/OR shapes) — rank-identical to the oracle, scores included."""
    from lucene_solr_ray.index.searcher import RayIndexSearcher

    s = RayIndexSearcher(pages_corpus["index_dir"], num_actors=3)
    try:
        for q in make_query_set(40):
            ast = query_to_ast(q)
            assert s.search(ast, k=q["k"])["topk"] == oracle_index.search(ast, q["k"]), q
    finally:
        s.shutdown()


def test_handpicked_query_shapes(oracle_index, local_index):
    ev = Evaluator(local_index)
    queries = [
        MatchAllQ(),
        BoolQ(must=(TermQ("zeph"),), should=(TermQ("kalo"), TermQ("luko"))),
        BoolQ(should=(TermQ("kalo"), TermQ("luko"), TermQ("zeph")), minimum_should_match=2),
        BoolQ(must=(TermQ("luko"), FilterQ("lang", "en"))),
        PhraseQ(("luko", "kalo")),
        TermQ("doesnotexist"),
        FilterQ("tld", "dk"),
    ]
    for ast in queries:
        docs, scores = ev.scored(ast)
        assert top_k(docs, scores, 20) == oracle_index.search(ast, 20), ast


def test_facets_match_oracle(ray_session, pages_corpus, oracle_index):
    from lucene_solr_ray.index.searcher import RayIndexSearcher

    s = RayIndexSearcher(pages_corpus["index_dir"], num_actors=2)
    try:
        for ast in [MatchAllQ(), TermQ("luko"), BoolQ(should=(TermQ("kalo"), TermQ("zeph")))]:
            res = s.search(ast, k=10, facet_fields=("lang", "tld", "host"), facet_limit=30, facet_mincount=1)
            o_hits = [d for _, d in oracle_index.search(ast, 10**9)]
            for f in ("lang", "tld", "host"):
                assert res["facets"][f] == oracle_index.facet(o_hits, f, limit=30, mincount=1), (ast, f)
            # top-k via actors matches oracle too
            assert res["topk"] == oracle_index.search(ast, 10)
    finally:
        s.shutdown()


def test_facet_mincount_zero_includes_zero_counts(ray_session, pages_corpus, oracle_index):
    from lucene_solr_ray.index.searcher import RayIndexSearcher

    s = RayIndexSearcher(pages_corpus["index_dir"], num_actors=2)
    try:
        ast = TermQ("zeph")
        res = s.search(ast, facet_fields=("tld",), facet_limit=100, facet_mincount=0)
        o_hits = [d for _, d in oracle_index.search(ast, 10**9)]
        assert res["facets"]["tld"] == oracle_index.facet(o_hits, "tld", limit=100, mincount=0)
    finally:
        s.shutdown()


def test_distributed_overrequest_refinement_equals_exact(ray_session, pages_corpus):
    """Sparse==vanilla analog: refined distributed facets == exact facets."""
    from lucene_solr_ray.index.searcher import RayIndexSearcher

    s = RayIndexSearcher(pages_corpus["index_dir"], num_actors=3)
    try:
        for ast in [MatchAllQ(), TermQ("luko")]:
            exact = s.search(ast, facet_fields=("host", "links_sim"), facet_limit=10, facet_mincount=1)
            refined = s.search(
                ast, facet_fields=("host", "links_sim"), facet_limit=10, facet_mincount=1,
                facet_overrequest=True,
            )
            assert exact["facets"] == refined["facets"]
    finally:
        s.shutdown()


def test_multivalued_facet_links_sim(ray_session, pages_corpus, oracle_index):
    from lucene_solr_ray.index.searcher import RayIndexSearcher

    s = RayIndexSearcher(pages_corpus["index_dir"], num_actors=2)
    try:
        res = s.search(MatchAllQ(), facet_fields=("links_sim",), facet_limit=20, facet_mincount=1)
        o_hits = [d for _, d in oracle_index.search(MatchAllQ(), 10**9)]
        assert res["facets"]["links_sim"] == oracle_index.facet(o_hits, "links_sim", limit=20, mincount=1)
    finally:
        s.shutdown()
