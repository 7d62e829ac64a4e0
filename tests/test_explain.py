"""Explain (debugQuery) gates: the root value must be bit-identical to the
evaluator's score, details must carry the BM25 factors, and non-matching
docs must explain to None."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_ray.query.ast import (
    BoolQ,
    BoostQ,
    DisMaxQ,
    Evaluator,
    MatchAllQ,
    PhraseQ,
    TermQ,
)
from lucene_solr_ray.query.explain import explain


@pytest.fixture(scope="module")
def local_ix(pages_corpus):
    from lucene_solr_ray.index.reader import LocalIndex

    return LocalIndex(pages_corpus["index_dir"])


QUERIES = [
    TermQ("luko"),
    BoostQ(TermQ("luko"), 2.5),
    BoolQ(must=(TermQ("luko"), TermQ("kalo"))),
    BoolQ(must=(TermQ("luko"),), should=(TermQ("kalo"), TermQ("vuri"))),
    DisMaxQ((TermQ("luko"), TermQ("kalo")), tiebreak=0.3),
    PhraseQ(("luko", "kalo"), slop=3),
]


@pytest.mark.parametrize("q", QUERIES, ids=[type(q).__name__ + str(i) for i, q in enumerate(QUERIES)])
def test_root_value_bit_identical(local_ix, q):
    docs, scores = Evaluator(local_ix).scored(q)
    assert len(docs) > 0, "fixture term missing"
    for j in [0, len(docs) // 2, len(docs) - 1]:
        e = explain(local_ix, q, int(docs[j]))
        assert e is not None
        assert np.float32(e["value"]) == scores[j]


def test_term_details_factorization(local_ix):
    q = TermQ("luko")
    docs, scores = Evaluator(local_ix).scored(q)
    e = explain(local_ix, q, int(docs[0]))
    descs = [d["description"] for d in e["details"]]
    assert any(d.startswith("idf(") for d in descs)
    assert any("tfNorm" in d for d in descs)
    # idf * tfNorm reproduces the score to float32 rounding
    prod = np.float32(e["details"][0]["value"]) * np.float32(e["details"][1]["value"])
    assert abs(float(prod) - e["value"]) <= 1e-6 * max(1.0, abs(e["value"]))


def test_no_match_is_none(local_ix):
    q = TermQ("luko")
    docs, _ = Evaluator(local_ix).scored(q)
    missing = set(range(int(docs[-1]) + 2)) - set(docs.tolist())
    e = explain(local_ix, q, sorted(missing)[0])
    assert e is None


def test_bool_details_cover_matching_children(local_ix):
    q = BoolQ(must=(TermQ("luko"),), should=(TermQ("kalo"),))
    docs, _ = Evaluator(local_ix).scored(q)
    e = explain(local_ix, q, int(docs[0]))
    assert len(e["details"]) >= 1
    assert all("value" in d for d in e["details"])


def test_matchall_constant(local_ix):
    e = explain(local_ix, MatchAllQ(), 0)
    assert e is not None and e["value"] == 1.0


def test_distributed_explain_matches_local(ray_session, pages_corpus, local_ix):
    from lucene_solr_ray.index.searcher import RayIndexSearcher

    q = TermQ("luko")
    docs, scores = Evaluator(local_ix).scored(q)
    s = RayIndexSearcher(pages_corpus["index_dir"], num_actors=2)
    try:
        e = s.explain(q, int(docs[0]))
        assert e is not None
        assert np.float32(e["value"]) == scores[0]
        assert s.explain(q, int(docs[-1]) + 10**6) is None
    finally:
        s.shutdown()
