"""Multi-field indexing: title + text with per-field norms and statistics."""

import os

import pytest

from lucene_solr_ray.analysis.html_extract import extract
from lucene_solr_ray.fixtures import write_pages_parquet
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.index.reader import LocalIndex
from lucene_solr_ray.oracle import OracleIndex
from lucene_solr_ray.query.ast import BoolQ, DisMaxQ, Evaluator, MultiTermQ, PhraseQ, TermQ, top_k
from lucene_solr_ray.query.parser import QueryParser


@pytest.fixture(scope="module")
def mf_setup(ray_session, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mf"))
    files = write_pages_parquet(os.path.join(root, "pages"), 400, n_files=3)
    ix = os.path.join(root, "ix")
    build_index(files, ix, rows_per_partition=64, extra_text_fields=("title",))
    import pyarrow.parquet as pq

    df = pq.read_table(files).to_pandas()
    df = df.sort_values(["url", "warc_ts", "doc_id"]).groupby("url", as_index=False).last()
    rows = df.to_dict("records")
    for r in rows:
        r["title"] = extract(r["html"])[0]
    oracle = OracleIndex(rows, extra_fields=("title",))
    return {"ix": ix, "oracle": oracle}


def test_title_term_query_rank_identical(mf_setup):
    loc = LocalIndex(mf_setup["ix"])
    orc = mf_setup["oracle"]
    # a few title terms drawn from the title vocabulary
    title_terms = list(orc.vocabulary("title"))[:6]
    assert title_terms
    for t in title_terms:
        q = TermQ(t, field="title")
        docs, scores = Evaluator(loc).scored(q)
        assert top_k(docs, scores, 15) == orc.search(q, 15), t


def test_field_stats_are_field_scoped(mf_setup):
    loc = LocalIndex(mf_setup["ix"])
    orc = mf_setup["oracle"]
    assert loc.global_stats("title") == orc.global_stats("title")
    assert loc.global_stats("text") == orc.global_stats("text")
    # title avgdl differs from text avgdl (titles are much shorter)
    assert loc.global_stats("title")[1] < loc.global_stats("text")[1]
    t = list(orc.vocabulary("title"))[0]
    assert loc.global_df("title", t) == orc.global_df("title", t)


def test_text_queries_unchanged_by_extra_field(mf_setup):
    loc = LocalIndex(mf_setup["ix"])
    orc = mf_setup["oracle"]
    for q in [TermQ("luko"), BoolQ(must=(TermQ("luko"), TermQ("kalo"))), PhraseQ(("luko", "kalo"))]:
        docs, scores = Evaluator(loc).scored(q)
        assert top_k(docs, scores, 15) == orc.search(q, 15), q


def test_dismax_over_fields(mf_setup):
    loc = LocalIndex(mf_setup["ix"])
    orc = mf_setup["oracle"]
    t = list(orc.vocabulary("title"))[0]
    q = DisMaxQ((TermQ(t, field="text"), TermQ(t, field="title")), tiebreak=0.4)
    docs, scores = Evaluator(loc).scored(q)
    assert top_k(docs, scores, 15) == orc.search(q, 15)


def test_title_multiterm_and_parser(mf_setup):
    loc = LocalIndex(mf_setup["ix"])
    orc = mf_setup["oracle"]
    q = MultiTermQ("prefix", "l", field="title")
    docs, scores = Evaluator(loc).scored(q)
    assert top_k(docs, scores, 25) == orc.search(q, 25)
    # parser routes title: to a scored field query
    p = QueryParser()
    t = list(orc.vocabulary("title"))[0]
    ast = p.parse(f"title:{t}")
    assert ast == TermQ(t, field="title")
    docs, scores = Evaluator(loc).scored(ast)
    assert top_k(docs, scores, 10) == orc.search(ast, 10)
