"""Exact SloppyPhraseScorer semantics against the reference's own vectors.

Every expectation below is ported from
`lucene/core/src/test/org/apache/lucene/search/TestSloppyPhraseQuery.java`
(fixture strings DOC_1..DOC_5, LUCENE-1310 / LUCENE-3412 regressions) and the
`SloppyPhraseScorer.java:82-99` javadoc example.  No Ray needed — the scorer
is pure per-doc arithmetic.
"""

from __future__ import annotations

import numpy as np

from lucene_solr_ray.query.ast import _sloppy_freq

S_1 = "A A A"
S_2 = "A 1 2 3 A 4 5 6 A"
DOC_1 = "X " + S_1 + " Y"
DOC_2 = "X " + S_2 + " Y"
DOC_3 = "X " + S_1 + " A Y"
DOC_1_B = "X " + S_1 + " Y N N N N " + S_1 + " Z"
DOC_2_B = "X " + S_2 + " Y N N N N " + S_2 + " Z"
DOC_3_B = "X " + S_1 + " A Y N N N N " + S_1 + " A Y"
DOC_4 = "A A X A X B A X B B A A X B A A"
DOC_5_3 = "H H H X X X H H H X X X H H H"
DOC_5_4 = "H H H H"


def freq(doc: str, query: str, slop: int) -> float:
    toks = doc.split()
    qts = query.split()
    plists = []
    for t in qts:
        pos = [i for i, w in enumerate(toks) if w == t]
        if not pos:
            return 0.0
        plists.append(np.asarray(pos, dtype=np.int64))
    by_term: dict = {}
    for i, t in enumerate(qts):
        by_term.setdefault(t, []).append(i)
    groups = [offs for offs in by_term.values() if len(offs) > 1]
    return _sloppy_freq(plists, slop, groups)


def test_doc4_query4_all_slops():
    # QUERY_4 "X A A": fuzzy len=1 match, so slop 0 fails, every slop>=1 hits
    for slop in range(30):
        f = freq(DOC_4, "X A A", slop)
        assert (f > 0) == (slop >= 1), (slop, f)


def test_doc1_query1_all_slops():
    # exact match present: every slop (incl. 1 — LUCENE-1310) must hit
    for slop in range(30):
        assert freq(DOC_1, S_1, slop) > 0, slop


def test_doc2_query1_slop6_minimum():
    # LUCENE-1310: 6 is the minimum slop for "A A A" on DOC_2 (not 7)
    for slop in range(30):
        f = freq(DOC_2, S_1, slop)
        assert (f > 0) == (slop >= 6), (slop, f)


def test_doc2_query2_all_slops():
    for slop in range(30):
        assert freq(DOC_2, S_2, slop) > 0, slop


def test_doc3_query1_all_slops():
    for slop in range(30):
        assert freq(DOC_3, S_1, slop) > 0, slop


def test_doc5_lucene3412_consistency():
    # "H H H H" matches DOC_5_4 and never matches DOC_5_3 at slop 0..2
    for slop in range(3):
        assert freq(DOC_5_4, "H H H H", slop) > 0, slop
        assert freq(DOC_5_3, "H H H H", slop) == 0.0, slop


def test_b_docs_score_higher():
    # two phrase occurrences accumulate more sloppy freq than one
    for slop in range(30):
        if freq(DOC_2, S_1, slop) > 0:
            assert freq(DOC_2_B, S_1, slop) > freq(DOC_2, S_1, slop), slop
        assert freq(DOC_1_B, S_1, slop) > freq(DOC_1, S_1, slop), slop
        assert freq(DOC_2_B, S_2, slop) > freq(DOC_2, S_2, slop), slop
        assert freq(DOC_3_B, S_1, slop) > freq(DOC_3, S_1, slop), slop


def test_javadoc_example_two_matches():
    # SloppyPhraseScorer.java:88-89 — "a b"~2 on "x a b a y" scores twice:
    # once at distance 0 and once (reversed) at distance 2
    f = freq("x a b a y", "a b", 2)
    want = float(np.float32(np.float32(1.0) + np.float32(1.0) / np.float32(3.0)))
    assert f == want, f
    # and with slop 1 only the exact occurrence scores
    assert freq("x a b a y", "a b", 1) == 1.0


def test_exact_slop0_equals_phrase_count():
    assert freq("a b c a b", "a b", 0) == 2.0
    assert freq("a b c a b", "b a", 0) == 0.0


def test_repeat_bijection_no_double_count():
    # "A A" on a doc with a single A: repeats cannot both bind to one
    # occurrence (the bijection constraint)
    assert freq("X A Y", "A A", 10) == 0.0
    # two occurrences: "A A" matches once at the gap distance
    assert freq("A X A", "A A", 0) == 0.0
    assert freq("A X A", "A A", 1) > 0


def test_engine_matches_scorer_on_adversarial_fixtures(ray_session, tmp_path):
    """End-to-end: the indexed engine's sloppy hit-sets and freqs equal the
    direct per-doc scorer over the same raw token streams."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.index.reader import LocalIndex
    from lucene_solr_ray.query.ast import Evaluator, PhraseQ

    docs = [
        DOC_1, DOC_2, DOC_3, DOC_1_B, DOC_2_B, DOC_3_B, DOC_4,
        DOC_5_3, DOC_5_4, "A B C B A", "A B C B A F G", "X A Y",
    ]
    p = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(docs)), type=pa.int64()),
            "text": pa.array([d.lower() for d in docs]),
        }),
        p,
    )
    ix = str(tmp_path / "ix")
    build_index([p], ix, rows_per_partition=4, extract_html=False,
                dedup_url=False, facet_fields=(), analyzer="simple",
                input_columns=("doc_id", "text"))
    li = LocalIndex(ix)
    ev = Evaluator(li)
    for query, slop in [
        ("a a a", 1), ("a a a", 6), ("a a a", 12), ("x a a", 1),
        ("h h h h", 2), ("a b c", 4), ("c b a", 4), ("c b", 2), ("a b", 2),
    ]:
        d, s = ev.scored(PhraseQ(tuple(query.split()), slop=slop))
        got = dict(zip(d.tolist(), s.tolist()))
        for i, doc in enumerate(docs):
            f = freq(doc, query.upper(), slop)
            assert (i in got) == (f > 0), (query, slop, i)
