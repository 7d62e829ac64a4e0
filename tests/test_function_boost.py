"""FunctionQuery / BoostedQuery / edismax bf+boost gates — differential
against an independent recomputation (docmap parquet read directly, float32
op order replayed by hand)."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.query.ast import (
    BoolQ,
    BoostedQ,
    Evaluator,
    FunctionQ,
    TermQ,
)
from lucene_solr_ray.query.edismax import EDisMaxParser


@pytest.fixture(scope="module")
def local_ix(pages_corpus):
    from lucene_solr_ray.index.reader import LocalIndex

    return LocalIndex(pages_corpus["index_dir"])


@pytest.fixture(scope="module")
def dl_by_doc(pages_corpus):
    files = glob.glob(
        os.path.join(pages_corpus["index_dir"], "docmap", "**", "*.parquet"),
        recursive=True,
    )
    t = pq.read_table(files, columns=["doc_id", "dl"])
    return dict(zip(t["doc_id"].to_pylist(), t["dl"].to_pylist()))


def test_function_query_scores(local_ix, dl_by_doc):
    docs, scores = Evaluator(local_ix).scored(FunctionQ("dl", fn="log", boost=2.0))
    assert len(docs) == len(dl_by_doc)
    with np.errstate(divide="ignore"):
        exp = (
            np.log10(np.array([dl_by_doc[int(d)] for d in docs], dtype=np.float64))
            .astype(np.float32)
            * np.float32(2.0)
        ).astype(np.float32)
    assert (scores == exp).all()


def test_function_sqrt_identity(local_ix, dl_by_doc):
    docs, s_id = Evaluator(local_ix).scored(FunctionQ("dl"))
    _, s_sqrt = Evaluator(local_ix).scored(FunctionQ("dl", fn="sqrt"))
    assert (s_sqrt == np.sqrt(s_id.astype(np.float64)).astype(np.float32)).all()


def test_additive_bf_via_reqopt(local_ix, dl_by_doc):
    """+term (bf): score = f32(termScore + f32(f64(bfval)))."""
    term = TermQ("luko")
    tdocs, tscores = Evaluator(local_ix).scored(term)
    q = BoolQ(must=(term,), should=(FunctionQ("dl", fn="log"),))
    docs, scores = Evaluator(local_ix).scored(q)
    assert (docs == tdocs).all()
    bf = np.array([dl_by_doc[int(d)] for d in docs], dtype=np.float64)
    with np.errstate(divide="ignore"):
        bf32 = np.log10(bf).astype(np.float32)
    # _disjunction accumulates in float64 then casts back
    exp = (tscores + bf32.astype(np.float64).astype(np.float32)).astype(np.float32)
    assert (scores == exp).all()


def test_boosted_query_product(local_ix, dl_by_doc):
    term = TermQ("luko")
    tdocs, tscores = Evaluator(local_ix).scored(term)
    docs, scores = Evaluator(local_ix).scored(
        BoostedQ(term, FunctionQ("dl", fn="sqrt"))
    )
    assert (docs == tdocs).all()
    fv = np.sqrt(
        np.array([dl_by_doc[int(d)] for d in docs], dtype=np.float64)
    ).astype(np.float32)
    assert (scores == (tscores * fv).astype(np.float32)).all()


def test_edismax_bf_parse_shape(local_ix):
    p = EDisMaxParser(
        qf=(("text", 1.0),),
        mm=1,
        bf=(FunctionQ("dl", fn="log"),),
        boost=(FunctionQ("dl", fn="sqrt"),),
    )
    q = p.parse("luko kalo")
    assert isinstance(q, BoostedQ)
    assert isinstance(q.child, BoolQ)
    assert q.child.should and isinstance(q.child.should[0], FunctionQ)
    # evaluates without error and scores the same doc set as without boosts
    plain = EDisMaxParser(qf=(("text", 1.0),), mm=1).parse("luko kalo")
    d0, _ = Evaluator(local_ix).scored(plain)
    d1, _ = Evaluator(local_ix).scored(q)
    assert (d0 == d1).all()


def test_bf_does_not_gate_or_count_mm(local_ix):
    """A doc matching only bf must not appear; mm still binds user clauses."""
    p = EDisMaxParser(qf=(("text", 1.0),), mm=2, bf=(FunctionQ("dl"),))
    q = p.parse("luko kalo")
    plain = EDisMaxParser(qf=(("text", 1.0),), mm=2).parse("luko kalo")
    d0, _ = Evaluator(local_ix).scored(plain)
    d1, _ = Evaluator(local_ix).scored(q)
    assert (d0 == d1).all()
