"""MoreLikeThis differential gates: term selection vs a pure-Python oracle
over the raw fixture texts; query results vs exhaustive rescoring."""

from __future__ import annotations

import math

import numpy as np
import pytest

from lucene_solr_ray.analysis.tokenizer import analyze
from lucene_solr_ray.index.reader import LocalIndex
from lucene_solr_ray.query.ast import Evaluator, top_k
from lucene_solr_ray.query.mlt import interesting_terms, mlt_query


@pytest.fixture(scope="module")
def local_index(pages_corpus):
    return LocalIndex(pages_corpus["index_dir"])


def _oracle_terms(oracle_rows, text, min_tf, min_df, max_terms):
    # df over the whole corpus with the standard chain
    df: dict[str, int] = {}
    for r in oracle_rows:
        for t in {t for t, _ in analyze(r["text"])}:
            df[t] = df.get(t, 0) + 1
    tf: dict[str, int] = {}
    for t, _ in analyze(text):
        tf[t] = tf.get(t, 0) + 1
    n = len(oracle_rows)
    cand = [
        (t, c * (math.log(n / (df.get(t, 0) + 1.0)) + 1.0))
        for t, c in tf.items()
        if c >= min_tf and df.get(t, 0) >= min_df
    ]
    cand.sort(key=lambda ts: (-ts[1], ts[0]))
    return cand[:max_terms]


def test_interesting_terms_match_oracle(local_index, oracle_rows):
    for r in oracle_rows[:10]:
        got = interesting_terms(
            r["text"], local_index, analyzer="standard",
            min_term_freq=2, min_doc_freq=3, max_query_terms=8,
        )
        want = _oracle_terms(oracle_rows, r["text"], 2, 3, 8)
        assert [t for t, _ in got] == [t for t, _ in want], r["doc_id"]
        assert np.allclose([s for _, s in got], [s for _, s in want])


def test_frequency_gates():
    class FakeSrc:
        def global_stats(self, field):
            return 100, 1000

        def global_df(self, field, term):
            return {"common": 50, "rare": 1}.get(term, 10)

    text = "common common rare rare once solo solo"
    got = interesting_terms(text, FakeSrc(), min_term_freq=2, min_doc_freq=5)
    terms = [t for t, _ in got]
    assert "rare" not in terms      # df 1 < 5
    assert "once" not in terms      # tf 1 < 2
    assert set(terms) == {"common", "solo"}
    # idf_classic ranks the lower-df term higher at equal tf
    assert terms == ["solo", "common"]


def test_mlt_query_results_self_similar(local_index, oracle_rows):
    """The source doc itself must be the top hit of its own MLT query
    (it contains every selected term at maximal tf for its length)."""
    ev = Evaluator(local_index)
    hits_top1 = 0
    for r in oracle_rows[:8]:
        q = mlt_query(r["text"], local_index, analyzer="standard",
                      min_term_freq=2, min_doc_freq=3, max_query_terms=8)
        if q is None:
            continue
        docs, scores = ev.scored(q)
        best = top_k(docs, scores, 1)
        if best and best[0][1] == r["doc_id"]:
            hits_top1 += 1
    assert hits_top1 >= 6  # synthetic corpus: near-all self-retrievals
