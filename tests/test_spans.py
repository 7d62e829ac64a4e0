"""Span queries: differential vs an independent positional scan of raw text.

The reference implementation here recomputes token positions directly from
the fixture texts with the analyzer chain and enumerates matches by brute
force — independent of the engine's postings/eval path.
"""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_ray.analysis.tokenizer import analyze
from lucene_solr_ray.index.reader import LocalIndex
from lucene_solr_ray.query.ast import Evaluator
from lucene_solr_ray.query.spans import (
    SpanFirstQ,
    SpanNearQ,
    SpanNotQ,
    SpanOrQ,
    SpanTermQ,
)


@pytest.fixture(scope="module")
def local_index(pages_corpus):
    return LocalIndex(pages_corpus["index_dir"])


@pytest.fixture(scope="module")
def doc_positions(oracle_rows):
    """{doc_id: {term: [positions]}} recomputed from raw text."""
    out = {}
    for r in oracle_rows:
        per: dict[str, list[int]] = {}
        for term, pos in analyze(r["text"]):
            per.setdefault(term, []).append(pos)
        out[r["doc_id"]] = per
    return out


def _ref_near_ordered(pos_map, terms, slop):
    """Brute force: exists p1<...<pn (pi from terms[i]) with consecutive
    positions strictly increasing and total gap <= slop (unit spans)."""
    lists = [pos_map.get(t) for t in terms]
    if any(not L for L in lists):
        return False

    def rec(i, cur_end, gap):
        if i == len(lists):
            return gap <= slop
        return any(
            rec(i + 1, p + 1, gap + (p - cur_end))
            for p in lists[i]
            if p >= cur_end and gap + (p - cur_end) <= slop
        )

    return any(rec(1, p0 + 1, 0) for p0 in lists[0])


def _ref_near_unordered(pos_map, terms, slop):
    lists = [pos_map.get(t) for t in terms]
    if any(not L for L in lists):
        return False
    from itertools import product

    for combo in product(*lists):
        if len(set(combo)) != len(combo):
            continue
        width = max(combo) - min(combo) + 1
        if width - len(combo) <= slop:
            return True
    return False


class TestSpans:
    def test_near_ordered_matches_reference(self, local_index, doc_positions):
        ev = Evaluator(local_index)
        for terms, slop in [(("luko", "kalo"), 0), (("luko", "kalo"), 3),
                            (("kalo", "luko"), 2), (("luko", "kalo", "zeph"), 5)]:
            q = SpanNearQ(tuple(SpanTermQ(t) for t in terms), slop=slop, in_order=True)
            got = ev.scored(q)[0].tolist()
            want = sorted(
                d for d, pm in doc_positions.items() if _ref_near_ordered(pm, terms, slop)
            )
            assert got == want, (terms, slop)

    def test_near_unordered_matches_reference(self, local_index, doc_positions):
        ev = Evaluator(local_index)
        for terms, slop in [(("luko", "kalo"), 0), (("luko", "kalo"), 2),
                            (("zeph", "tali"), 4)]:
            q = SpanNearQ(tuple(SpanTermQ(t) for t in terms), slop=slop, in_order=False)
            got = ev.scored(q)[0].tolist()
            want = sorted(
                d for d, pm in doc_positions.items() if _ref_near_unordered(pm, terms, slop)
            )
            assert got == want, (terms, slop)

    def test_span_or(self, local_index, doc_positions):
        ev = Evaluator(local_index)
        q = SpanOrQ((SpanTermQ("luko"), SpanTermQ("zeph")))
        got = ev.scored(q)[0].tolist()
        want = sorted(
            d for d, pm in doc_positions.items() if pm.get("luko") or pm.get("zeph")
        )
        assert got == want

    def test_span_first(self, local_index, doc_positions):
        ev = Evaluator(local_index)
        for end in [1, 5, 20]:
            q = SpanFirstQ(SpanTermQ("luko"), end)
            got = ev.scored(q)[0].tolist()
            want = sorted(
                d
                for d, pm in doc_positions.items()
                if any(p + 1 <= end for p in pm.get("luko", []))
            )
            assert got == want, end

    def test_span_not(self, local_index, doc_positions):
        """near(luko, kalo, slop=4) spans containing no 'zeph' inside."""
        ev = Evaluator(local_index)
        q = SpanNotQ(
            SpanNearQ((SpanTermQ("luko"), SpanTermQ("kalo")), slop=4, in_order=True),
            SpanTermQ("zeph"),
        )
        got = ev.scored(q)[0].tolist()

        def ref(pm):
            lk = pm.get("luko", [])
            ka = pm.get("kalo", [])
            ze = set(pm.get("zeph", []))
            for p0 in lk:
                # greedy earliest completion — the engine's span per p0
                cands = [p for p in ka if p >= p0 + 1]
                if not cands:
                    continue
                p1 = min(cands)
                if p1 - p0 - 1 <= 4:
                    span = (p0, p1 + 1)
                    if not any(span[0] <= z < span[1] for z in ze):
                        return True
            return False

        want = sorted(d for d, pm in doc_positions.items() if ref(pm))
        assert got == want

    def test_unordered_matches_bruteforce_spans(self):
        """_near_unordered vs exhaustive combination search, including
        coinciding spans, overlapping spans, and variable widths (the
        single-pointer sweep used to miss these)."""
        import itertools
        import random

        from lucene_solr_ray.query.spans import _near_unordered

        rnd = random.Random(13)
        for _trial in range(300):
            k = rnd.randint(1, 3)
            lists = []
            for _ in range(k):
                m = rnd.randint(1, 4)
                spans = []
                for _ in range(m):
                    s = rnd.randint(0, 12)
                    spans.append((s, s + rnd.randint(1, 3)))
                lists.append(sorted(set(spans)))
            slop = rnd.randint(0, 4)
            got = set(_near_unordered(lists, slop))
            want = set()
            for combo in itertools.product(*lists):
                ivs = sorted(combo)
                if any(ivs[j][1] > ivs[j + 1][0] for j in range(len(ivs) - 1)):
                    continue
                s_min = min(s for s, _ in combo)
                e_max = max(e for _, e in combo)
                lens = sum(e - s for s, e in combo)
                if (e_max - s_min) - lens <= slop:
                    want.add((s_min, e_max))
            assert got == want, (lists, slop, got, want)

    def test_unordered_regression_coinciding_spans(self):
        from lucene_solr_ray.query.spans import _near_unordered

        # the exact counterexample the sweep missed
        assert _near_unordered([[(5, 6)], [(5, 6), (7, 8)]], 1) == [(5, 8)]

    def test_span_constant_score(self, local_index):
        ev = Evaluator(local_index)
        docs, scores = ev.scored(SpanNearQ((SpanTermQ("luko"), SpanTermQ("kalo")), slop=8))
        assert np.all(scores == np.float32(1.0))
