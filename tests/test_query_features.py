"""searchAfter paging, ReRank, MultiTerm queries — engine vs oracle."""

import pytest

from lucene_solr_ray.index.reader import LocalIndex
from lucene_solr_ray.query.ast import (
    BoolQ,
    Evaluator,
    MultiTermQ,
    TermQ,
    top_k,
)


@pytest.fixture(scope="module")
def local_index(pages_corpus):
    return LocalIndex(pages_corpus["index_dir"])


def test_search_after_pages_are_disjoint_and_ordered(local_index, oracle_index):
    docs, scores = Evaluator(local_index).scored(TermQ("luko"))
    full = top_k(docs, scores, 30)
    # page through 3 pages of 10 and compare against the one-shot top-30
    pages, cursor = [], None
    for _ in range(3):
        page = top_k(docs, scores, 10, after=cursor)
        if not page:
            break
        pages.extend(page)
        cursor = page[-1]
    assert pages == full


def test_search_after_distributed(ray_session, pages_corpus, oracle_index):
    from lucene_solr_ray.index.searcher import RayIndexSearcher

    s = RayIndexSearcher(pages_corpus["index_dir"], num_actors=2)
    try:
        q = BoolQ(should=(TermQ("luko"), TermQ("kalo")))
        want = oracle_index.search(q, 30)
        got, cursor = [], None
        for _ in range(3):
            res = s.search_after(q, cursor, k=10)
            got.extend(res["topk"])
            cursor = res["next_cursor"]
            if cursor is None:
                break
        assert got == want
    finally:
        s.shutdown()


def test_rerank(ray_session, pages_corpus, oracle_index):
    from lucene_solr_ray.index.searcher import RayIndexSearcher
    import numpy as np

    s = RayIndexSearcher(pages_corpus["index_dir"], num_actors=2)
    try:
        base, boost = TermQ("luko"), TermQ("kalo")
        got = s.rerank(base, boost, k=10, rerank_docs=30, rerank_weight=2.0)
        # oracle-side replica of ReRank semantics
        first = oracle_index.search(base, 30)
        second = dict(
            (d, sc) for sc, d in oracle_index.search(boost, 10**9)
        )
        comb = []
        for sc, d in first:
            s2 = second.get(d)
            ns = np.float32(sc) if s2 is None else np.float32(
                np.float32(sc) + np.float32(2.0) * np.float32(s2)
            )
            comb.append((float(ns), d))
        comb.sort(key=lambda x: (-x[0], x[1]))
        assert got == comb[:10]
    finally:
        s.shutdown()


def test_multiterm_engine_equals_oracle(local_index, oracle_index):
    # engine expands over the global dict; oracle over its own postings keys —
    # same vocabulary by construction
    for q in [
        MultiTermQ("prefix", "lu"),
        MultiTermQ("wildcard", "z?ph*"),
        MultiTermQ("regexp", "ka.o"),
        MultiTermQ("fuzzy", "kalo", arg2=1),
        BoolQ(must=(MultiTermQ("prefix", "luk"), TermQ("zeph"))),
    ]:
        docs, scores = Evaluator(local_index).scored(q)
        assert top_k(docs, scores, 25) == oracle_index.search(q, 25), q


def test_sloppy_phrase_engine_equals_oracle(local_index, oracle_index):
    from lucene_solr_ray.query.ast import PhraseQ

    for slop in (1, 2, 4):
        q = PhraseQ(("luko", "kalo"), slop=slop)
        docs, scores = Evaluator(local_index).scored(q)
        assert top_k(docs, scores, 20) == oracle_index.search(q, 20), slop
    # slop widens the hit set monotonically
    n0 = len(Evaluator(local_index).scored(PhraseQ(("luko", "kalo")))[0])
    n4 = len(Evaluator(local_index).scored(PhraseQ(("luko", "kalo"), slop=4))[0])
    assert n4 >= n0


def test_dismax_engine_equals_oracle(local_index, oracle_index):
    from lucene_solr_ray.query.ast import DisMaxQ, PhraseQ

    for tie in (0.0, 0.3, 1.0):
        q = DisMaxQ((TermQ("luko"), TermQ("kalo"), PhraseQ(("luko", "kalo"))), tiebreak=tie)
        docs, scores = Evaluator(local_index).scored(q)
        assert top_k(docs, scores, 20) == oracle_index.search(q, 20), tie
    # tiebreak=1.0 equals plain disjunction sum on the same docs
    q1 = DisMaxQ((TermQ("luko"), TermQ("kalo")), tiebreak=1.0)
    qb = BoolQ(should=(TermQ("luko"), TermQ("kalo")))
    d1, s1 = Evaluator(local_index).scored(q1)
    db, sb = Evaluator(local_index).scored(qb)
    assert d1.tolist() == db.tolist()
    import numpy as np

    assert np.allclose(s1, sb, rtol=1e-6)


def test_fetch_fields_distributed(ray_session, pages_corpus, oracle_rows):
    from lucene_solr_ray.index.searcher import RayIndexSearcher

    s = RayIndexSearcher(pages_corpus["index_dir"], num_actors=3)
    try:
        res = s.search(TermQ("luko"), k=5)
        ids = [d for _, d in res["topk"]]
        fields = s.fetch_fields(ids, ["url", "host", "lang", "dl"])
        by_id = {r["doc_id"]: r for r in oracle_rows}
        assert set(fields) == set(ids)
        for d, row in fields.items():
            assert row["url"] == by_id[d]["url"]
            assert row["host"] == by_id[d]["host"]
            assert row["lang"] == by_id[d]["lang"]
    finally:
        s.shutdown()


def test_registry_and_ingest_chain(ray_session):
    import ray.data as rd

    from lucene_solr_ray.functions.registry import ingest_chain, lookup, names

    assert "tokenize" in names("stage") and "classic" in names("query_parser")
    ds = rd.from_items([{"doc_id": 1, "text": "Hello hello world"}])
    out = ingest_chain(ds, ["content_hash", "token_count", ("signature_md5", {"fields": ["text"]})])
    row = out.take_all()[0]
    assert row["n_tokens"] == 3 and len(row["content_hash"]) == 40 and len(row["signature"]) == 32
    assert lookup("scalar_fn", "sqrt")


def test_query_elevation(ray_session, pages_corpus, oracle_index):
    from lucene_solr_ray.index.searcher import RayIndexSearcher

    s = RayIndexSearcher(pages_corpus["index_dir"], num_actors=2)
    try:
        organic = s.search(TermQ("luko"), k=10)["topk"]
        pin = [organic[-1][1], organic[2][1]]  # pin two docs, editorial order
        got = s.search_elevated(TermQ("luko"), pin, k=10)
        assert [d for _, d in got[:2]] == pin  # pinned first, given order
        rest = [d for _, d in got[2:]]
        assert rest == [d for _, d in organic if d not in set(pin)][: len(rest)]
    finally:
        s.shutdown()


def test_search_many_matches_sequential(ray_session, pages_corpus, oracle_index):
    from lucene_solr_ray.index.searcher import RayIndexSearcher
    from lucene_solr_ray.query.ast import BoolQ, TermQ

    s = RayIndexSearcher(pages_corpus["index_dir"], num_actors=2)
    try:
        qs = [TermQ("luko"), BoolQ(should=(TermQ("kalo"), TermQ("zeph"))),
              BoolQ(must=(TermQ("luko"), TermQ("kalo")))]
        got = s.search_many(qs, k=10)
        for q, topk in zip(qs, got):
            assert topk == oracle_index.search(q, 10), q
    finally:
        s.shutdown()
