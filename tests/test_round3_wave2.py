"""Differential gates for the round-3 wave-2 surfaces: MultiTerm hit sets
(prefix/wildcard/fuzzy), NumericRangeQuery, {!frange}, DisMax-with-tiebreak
top-k, and the LLM quality signals (Gopher repetition, stopword ratio) —
engine vs the same DuckDB SQL the driver runs (sf0.001 for speed; the driver
re-checks at sf0.01), plus crafted-input kernel checks."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF, "documents.parquet")),
    reason="testdata not present",
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "events"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(SF, t)}.parquet')"
        )
    return c


def _both(ray_session, con, name):
    import __ray_entry__

    eng = __ray_entry__.queries()[name](SF)
    if hasattr(eng, "to_pandas"):
        eng = eng.to_pandas()
    ora = con.execute(__ray_entry__.oracle_sql()[name]).fetchdf()
    eng = eng[sorted(eng.columns)].reset_index(drop=True)
    ora = ora[sorted(ora.columns)].reset_index(drop=True)
    return eng, ora


@pytest.mark.parametrize(
    "name",
    [
        "search_prefix_docs",
        "search_wildcard_docs",
        "search_fuzzy_docs",
        "search_term_range_docs",
        "search_numeric_range_docs",
        "facet_source_prefix",
        "frange_docs",
        "dismax_topk_simple",
        "repetition_docs",
        "stopword_docs",
        "dup_span_docs",
        "suggest_infix",
        "edismax_bq_topk",
        "facet_refined_lang",
        "events_sliding_counts",
        "search_with_deletes",
        "expunge_index_stats",
        "pii_scrub_docs",
    ],
)
def test_wave2_entry_matches_oracle(ray_session, con, name):
    eng, ora = _both(ray_session, con, name)
    assert list(eng.columns) == list(ora.columns)
    assert len(eng) == len(ora) > 0
    for c in eng.columns:
        if eng[c].dtype.kind == "f":
            assert np.allclose(eng[c].to_numpy(), ora[c].to_numpy(), rtol=0, atol=0), c
        else:
            assert (eng[c].astype(str) == ora[c].astype(str)).all(), c


def test_fuzzy_entry_expands_to_multiple_terms(ray_session):
    """The S-gated fuzzy query must exercise a MULTI-term expansion."""
    from lucene_solr_ray.index.reader import LocalIndex
    from lucene_solr_ray.pipelines.fulltext import documents_index
    from lucene_solr_ray.query.ast import MultiTermQ, expand_multiterm

    ix = documents_index(SF)
    vocab = list(LocalIndex(ix).vocabulary("text"))
    terms = expand_multiterm(MultiTermQ("fuzzy", "slot", arg2=2), vocab)
    assert len(terms) >= 2 and "slow" in terms and "sort" in terms


def test_term_range_expansion_matches_vocabulary_filter(ray_session):
    """range_terms (two-seek dictionary scan) == brute vocabulary filter,
    for every inclusive/exclusive/open-end combination."""
    from lucene_solr_ray.index.reader import LocalIndex
    from lucene_solr_ray.pipelines.fulltext import documents_index

    ix = documents_index(SF)
    loc = LocalIndex(ix)
    vocab = sorted(loc.vocabulary("text"))

    def brute(lo, hi, il, ih):
        out = []
        for t in vocab:
            if lo is not None and (t < lo or (t == lo and not il)):
                continue
            if hi is not None and (t > hi or (t == hi and not ih)):
                continue
            out.append(t)
        return out

    cases = [
        ("order", "scan", True, True),
        ("order", "scan", False, False),
        ("order", "scan", True, False),
        (None, "hash", True, True),
        ("stream", None, False, True),
        (None, None, True, True),
        ("aaa", "aab", True, True),  # empty range
    ]
    for lo, hi, il, ih in cases:
        got = loc.range_terms("text", lo, hi, il, ih)
        assert got == brute(lo, hi, il, ih), (lo, hi, il, ih)


def test_parser_text_range_builds_term_range_query():
    """`text:[order TO scan]` through the classic parser -> TermRangeQ with
    lowercased bounds; non-text fields keep the doc-values RangeQ."""
    from lucene_solr_ray.query.ast import RangeQ, TermRangeQ
    from lucene_solr_ray.query.parser import QueryParser

    p = QueryParser()
    assert p.parse("text:[Order TO Scan]") == TermRangeQ("order", "scan", field="text")
    assert p.parse("text:{order TO scan}") == TermRangeQ(
        "order", "scan", field="text", include_lo=False, include_hi=False
    )
    assert isinstance(p.parse("dl:[1 TO 5]"), RangeQ)


def test_parser_local_params_dispatch():
    """Solr {!name k=v}rest local-params syntax -> QParserPlugin dispatch."""
    from lucene_solr_ray.query.ast import (
        FilterQ,
        FRangeQ,
        FunctionQ,
        MultiTermQ,
        TermQ,
    )
    from lucene_solr_ray.query.parser import QueryParseError, QueryParser

    p = QueryParser()
    assert p.parse("{!term f=lang}en") == FilterQ("lang", "en")
    # raw value, no analysis: 'Running' stays unstemmed/uncased
    assert p.parse("{!term f=text}Running") == TermQ("Running", field="text")
    assert p.parse("{!prefix f=text}cust") == MultiTermQ("prefix", "cust")
    fr = p.parse("{!frange l=2.5 u=2.8 incu=false}log(n_chars)")
    assert fr == FRangeQ(
        FunctionQ("n_chars", fn="log"), lo=2.5, hi=2.8, include_hi=False
    )
    assert p.parse("{!frange l=1}n_chars") == FRangeQ(FunctionQ("n_chars"), lo=1.0)
    # {!lucene} is the classic parser itself
    assert p.parse("{!lucene}join AND hash") == p.parse("join AND hash")
    import pytest as _pytest

    with _pytest.raises(QueryParseError):
        p.parse("{!nosuch}x")


def test_frange_bounds_are_float32_and_exclusive_flags_work():
    """FRangeQ compares in float32 (ValueSourceRangeFilter.floatVal) and
    honors incl/incu — checked against a hand-built numeric source."""
    from lucene_solr_ray.query.ast import Evaluator, FRangeQ, FunctionQ

    class Src:
        def numeric_values(self, field):
            return (
                np.arange(4, dtype=np.int64),
                np.array([1.0, 2.5, 2.8, 3.0], dtype=np.float64),
            )

    ev = Evaluator(Src())
    docs, scores = ev.scored(FRangeQ(FunctionQ("x"), lo=2.5, hi=2.8))
    assert docs.tolist() == [1, 2] and (scores == np.float32(1.0)).all()
    docs, _ = ev.scored(FRangeQ(FunctionQ("x"), lo=2.5, hi=2.8, include_lo=False))
    assert docs.tolist() == [2]
    docs, _ = ev.scored(FRangeQ(FunctionQ("x"), lo=2.5, hi=2.8, include_hi=False))
    assert docs.tolist() == [1]
    docs, _ = ev.scored(FRangeQ(FunctionQ("x"), lo=None, hi=2.5))
    assert docs.tolist() == [0, 1]


def test_duplicate_ngram_spans_crafted(ray_session):
    """ExactSubstr spans on crafted docs: a 4-token window shared by three
    occurrences keeps only the (min doc, min pos) canonical one."""
    import ray.data as rd

    from lucene_solr_ray.stages.dedup import duplicate_ngram_spans

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": [
                "alpha beta gamma delta tail0",          # canonical at (0, 0)
                "head alpha beta gamma delta tail1",     # dup at (1, 1)
                "alpha beta gamma delta",                # dup at (2, 0)
            ],
        }
    )
    out = (
        duplicate_ngram_spans(rd.from_arrow(t), window=4)
        .to_pandas()
        .sort_values(["doc_id", "pos"])
    )
    spans = list(zip(out["doc_id"], out["pos"], out["gram"]))
    assert spans == [
        (1, 1, "alpha beta gamma delta"),
        (2, 0, "alpha beta gamma delta"),
    ]


def test_repetition_kernel_crafted():
    """Known trigram/bigram counts on crafted rows (Gopher signals)."""
    from lucene_solr_ray.stages.textstats import repetition_batch

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": [
                "a b c a b c a b c",  # 7 trigrams, 3 distinct -> 4 dups
                "x y z w",            # 2 trigrams, both distinct
                "q q q q",            # 2 trigrams 'q q q' -> 1 dup; top bigram 'q q' x3
                "one two",            # no trigrams
            ],
        }
    )
    out = repetition_batch(t)
    assert out["n_trigrams"].to_pylist() == [7, 2, 2, 0]
    assert out["n_dup_trigrams"].to_pylist() == [4, 0, 1, 0]
    assert out["dup_trigram_frac"].to_pylist() == [4 / 7, 0.0, 0.5, 0.0]
    # 'a b' occurs 3x in row 0; 'q q' occurs 3x in row 2; row 3 has 1
    assert out["top_bigram_n"].to_pylist() == [3, 1, 3, 1]


def test_pii_scrub_kernel_crafted():
    from lucene_solr_ray.stages.textstats import pii_scrub_batch

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": [
                "mail a.b+c@ex-ample.org or 192.168.0.1 call +1 (555) 123-4567 ok",
                "no pii here",
            ],
        }
    )
    out = pii_scrub_batch(t)
    assert out["scrubbed"][0].as_py() == "mail <EMAIL> or <IP> call <PHONE> ok"
    assert out["n_pii"].to_pylist() == [3, 0]
    assert out["scrubbed"][1].as_py() == "no pii here"


def test_stopword_kernel_crafted():
    from lucene_solr_ray.stages.textstats import stopword_batch

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": ["the cat and the hat", "zebra quux"],
        }
    )
    out = stopword_batch(t)
    # 'the', 'and', 'the' are stopwords; 'cat'/'hat' are not
    assert out["n_stopwords"].to_pylist() == [3, 0]
    assert out["n_tokens"].to_pylist() == [5, 2]
    assert out["stop_ratio"].to_pylist() == [0.6, 0.0]


def test_facet_range_other_entry_matches_oracle(ray_session, con):
    eng, ora = _both(ray_session, con, "facet_range_other_events")
    assert list(eng.columns) == list(ora.columns)
    assert len(eng) == len(ora) == 9
    for c in eng.columns:
        assert (eng[c].astype(str) == ora[c].astype(str)).all(), c


def test_facet_range_include_all_double_counts_edges(ray_session):
    """include=all: a value exactly on a shared bucket edge counts in BOTH
    adjacent buckets (Solr's documented behavior), and other=all rows use
    strict before/after with inclusive between."""
    import numpy as np

    from lucene_solr_ray.pipelines.relational import (
        FRO_GAP,
        FRO_START,
        facet_range_other_events,
    )

    t = facet_range_other_events(SF).to_pandas().set_index("bucket")
    # bucket sums exceed 'between' exactly by the number of edge-sitting
    # values counted twice (non-negative; equality iff no value sits on an
    # interior edge)
    import pyarrow.parquet as pq

    v = pq.read_table(SF + "/events.parquet", columns=["value"])["value"].to_numpy()
    interior_edges = np.arange(FRO_START + FRO_GAP, 350.0, FRO_GAP)
    dup = int(np.isin(v, interior_edges).sum())
    bucket_sum = int(t.loc[[str(int(x)) for x in np.arange(50.0, 350.0, 50.0)], "cnt"].sum())
    assert bucket_sum == int(t.loc["between", "cnt"]) + dup
    assert (
        int(t.loc["before", "cnt"])
        + int(t.loc["after", "cnt"])
        + int(t.loc["between", "cnt"])
        == len(v)
    )
