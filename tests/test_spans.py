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

    def test_span_term_scoring_matches_independent_formula(
        self, local_index, doc_positions
    ):
        """SpanScorer contract for a term span: freq = 0.5 * occurrences
        (sloppyFreq(1) per unit span, f32-accumulated); score = BM25 with
        that float freq.  Expected values recomputed from the RAW texts
        (doc_positions) and the published BM25 formulas."""
        from lucene_solr_ray.index import bm25
        from lucene_solr_ray.smallfloat import encode_norm

        ev = Evaluator(local_index)
        docs, scores = ev.scored(SpanTermQ("luko"))
        df = sum(1 for pm in doc_positions.values() if pm.get("luko"))
        n_docs = len(doc_positions)
        sum_dl = sum(sum(len(v) for v in pm.values()) for pm in doc_positions.values())
        wv = np.float32(
            bm25.idf(df, n_docs) * np.float32(1.0) * np.float32(bm25.K1 + np.float32(1.0))
        )
        cache = bm25.norm_cache(bm25.avg_dl(sum_dl, n_docs))
        for d, s in zip(docs.tolist(), scores.tolist()):
            occ = len(doc_positions[d]["luko"])
            freq = np.float32(0.0)
            for _ in range(occ):
                freq = np.float32(freq + np.float32(0.5))
            dl = sum(len(v) for v in doc_positions[d].values())
            nb = encode_norm(np.array([dl], dtype=np.int64))[0]
            expect = np.float32((wv * freq) / (freq + cache[nb]))
            assert np.float32(s) == expect, d

    def test_span_near_scoring_width_sensitive(self, ray_session, tmp_path):
        """Tighter spans score higher: same terms, same doc length, the doc
        with the adjacent pair must outrank the doc with the spread pair
        (sloppyFreq(width) decreases in width)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from lucene_solr_ray.index.build import build_index
        from lucene_solr_ray.index.reader import LocalIndex

        rows = pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": pa.array(
                    [
                        "alpha beta pad1 pad2 pad3 pad4",   # adjacent: width 2
                        "alpha pad1 pad2 pad3 beta pad4",   # spread: width 5
                    ]
                ),
            }
        )
        src = str(tmp_path / "d.parquet")
        pq.write_table(rows, src)
        ix = str(tmp_path / "ix")
        build_index([src], ix, rows_per_partition=8, extract_html=False,
                    dedup_url=False, analyzer="simple", facet_fields=(),
                    resume=False)
        ev2 = Evaluator(LocalIndex(ix))
        q = SpanNearQ((SpanTermQ("alpha"), SpanTermQ("beta")), slop=4)
        docs, scores = ev2.scored(q)
        assert docs.tolist() == [0, 1]
        assert scores[0] > scores[1]
        # freq ratio: sloppyFreq over (end-start): 1/(2+1) vs 1/(5+1)
        from lucene_solr_ray.index import bm25

        n = bm25.norm_cache(bm25.avg_dl(12, 2))[
            __import__("lucene_solr_ray.smallfloat", fromlist=["encode_norm"])
            .encode_norm(np.array([6], dtype=np.int64))[0]
        ]
        f0, f1 = np.float32(1.0 / 3.0), np.float32(1.0 / 6.0)
        assert np.isclose(scores[0] / scores[1], (f0 / (f0 + n)) / (f1 / (f1 + n)), rtol=1e-6)
