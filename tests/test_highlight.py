"""Passage highlighter gates: offset fidelity, passage selection, formatter
wrapping, the searcher round-trip, and the batch kernel."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_ray.query.highlight import (
    analyze_offsets,
    highlight_batch,
    highlight_text,
    query_term_idfs,
)


class TestOffsets:
    def test_simple_offsets_slice_back(self):
        text = "The Quick-Brown fox; 42 foxes!"
        offs = analyze_offsets(text, "simple")
        assert [(t, text[s:e]) for t, s, e in offs] == [
            ("the", "The"), ("quick", "Quick"), ("brown", "Brown"),
            ("fox", "fox"), ("42", "42"), ("foxes", "foxes"),
        ]

    def test_standard_offsets_skip_stopwords(self):
        text = "The fox and the hound"
        offs = analyze_offsets(text, "standard")
        assert [t for t, _, _ in offs] == ["fox", "hound"]
        for t, s, e in offs:
            assert text[s:e].lower() == t


class TestHighlight:
    IDFS = {"fox": 2.0, "dog": 1.0}

    def test_wraps_all_occurrences_in_best_passage(self):
        text = "A fox met a dog. The fox ran. Nothing here."
        out = highlight_text(text, self.IDFS, max_passages=1)
        # first sentence scores 2+1=3 > second's 2
        assert out == "A <em>fox</em> met a <em>dog</em>."

    def test_multi_passage_document_order(self):
        text = "Only dog here. Filler text. A fox appears."
        out = highlight_text(text, self.IDFS, max_passages=2)
        # fox passage scores higher but output is document-ordered
        assert out == "Only <em>dog</em> here. ... A <em>fox</em> appears."

    def test_none_when_no_match(self):
        assert highlight_text("nothing to see", self.IDFS) is None

    def test_tie_breaks_to_earlier_passage(self):
        text = "dog one. dog two."
        out = highlight_text(text, self.IDFS, max_passages=1)
        assert out == "<em>dog</em> one."

    def test_case_preserved_in_output(self):
        out = highlight_text("FOX runs.", self.IDFS)
        assert out == "<em>FOX</em> runs."


def test_search_highlighted_round_trip(ray_session, pages_corpus):
    from lucene_solr_ray.index.searcher import RayIndexSearcher
    from lucene_solr_ray.query.ast import TermQ

    s = RayIndexSearcher(pages_corpus["index_dir"], num_actors=2)
    try:
        out = s.search_highlighted(TermQ("luko"), k=5, analyzer="standard")
        assert len(out) == 5
        for _score, _doc, snip in out:
            assert snip is not None and "<em>" in snip
            inner = [
                w[: w.index("</em>")].lower()
                for w in snip.split("<em>")[1:]
            ]
            assert all(t == "luko" for t in inner)
    finally:
        s.shutdown()


def test_highlight_batch_kernel(ray_session):
    import pyarrow as pa
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": pa.array(["a fox ran.", "no match here."]),
            }
        )
    )
    out = ds.map_batches(
        highlight_batch,
        batch_format="pyarrow",
        fn_kwargs={"term_idf": {"fox": 1.0}},
    ).take_all()
    by_id = {r["doc_id"]: r["snippet"] for r in out}
    assert by_id[0] == "a <em>fox</em> ran."
    assert by_id[1] is None
