"""Hypothesis property tests for the analysis chain (UAX#29 invariants)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_ray.analysis.tokenizer import (
    ENGLISH_STOP_WORDS,
    analyze,
    analyze_counts,
    simple_tokenize,
)

texts = st.text(max_size=300)
ascii_texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=300
)


class TestProperties:
    @given(texts)
    @settings(max_examples=200, deadline=None)
    def test_positions_strictly_increasing(self, s):
        toks = analyze(s)
        pos = [p for _, p in toks]
        assert pos == sorted(pos)
        assert len(set(pos)) == len(pos)

    @given(texts)
    @settings(max_examples=200, deadline=None)
    def test_terms_lowercase_nonempty_no_stopwords(self, s):
        for t, _ in analyze(s):
            assert t and t == t.lower()
            assert t not in ENGLISH_STOP_WORDS
            assert len(t) <= 255

    @given(ascii_texts)
    @settings(max_examples=200, deadline=None)
    def test_simple_matches_duckdb_regex_semantics(self, s):
        want = [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
        assert simple_tokenize(s) == want

    @given(texts)
    @settings(max_examples=200, deadline=None)
    def test_counts_consistent_with_analyze(self, s):
        terms, tfs, n = analyze_counts(s)
        assert n == len(analyze(s))
        assert sum(tfs) == n
        assert len(terms) == len(set(terms)) == len(tfs)

    @given(texts, texts)
    @settings(max_examples=100, deadline=None)
    def test_concatenation_stability(self, a, b):
        """Tokens of `a` survive prefix-concatenation with a space barrier
        (no token can span a whitespace boundary)."""
        ta = [t for t, _ in analyze(a)]
        tab = [t for t, _ in analyze(a + " " + b)]
        assert tab[: len(ta)] == ta
