"""Suggester + spellcheck vs brute-force recomputation from raw texts."""

from __future__ import annotations

import pytest

from lucene_solr_ray.analysis.tokenizer import analyze
from lucene_solr_ray.index.reader import GlobalStats
from lucene_solr_ray.query.suggest import PrefixSuggester, spellcheck


@pytest.fixture(scope="module")
def term_stats(oracle_rows):
    """{term: (df, ttf)} recomputed from the raw fixture texts."""
    df: dict[str, int] = {}
    ttf: dict[str, int] = {}
    for r in oracle_rows:
        toks = [t for t, _ in analyze(r["text"])]
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
        for t in toks:
            ttf[t] = ttf.get(t, 0) + 1
    return df, ttf


class TestFuzzyScan:
    def test_matches_bruteforce(self):
        import random

        from lucene_solr_ray.query.suggest import fuzzy_scan

        def dist(a, b):
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i] + [0] * len(b)
                for j, cb in enumerate(b, 1):
                    cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                prev = cur
            return prev[-1]

        rnd = random.Random(21)
        vocab = sorted(
            {"".join(rnd.choice("abcd") for _ in range(rnd.randint(1, 7))) for _ in range(1500)}
        )
        for w in ["abc", "dd", "abcdabc", "zzzz", ""]:
            for k in (0, 1, 2):
                got = fuzzy_scan(vocab, w, k)
                want = [(t, dist(t, w)) for t in vocab if dist(t, w) <= k]
                assert got == want, (w, k)

    def test_generator_input(self):
        from lucene_solr_ray.query.suggest import fuzzy_scan

        got = fuzzy_scan((t for t in ["abc", "abd", "xyz"]), "abc", 1)
        assert got == [("abc", 0), ("abd", 1)]


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


class _CountingView:
    """Sorted-dictionary facade that counts term materializations."""

    def __init__(self, inner):
        self.inner = inner
        self.visits = 0

    def __len__(self):
        return len(self.inner)

    def __getitem__(self, i):
        self.visits += 1
        return self.inner[i]

    def lower_bound(self, b):
        return self.inner.lower_bound(b)

    def prefix_range(self, p):
        return self.inner.prefix_range(p)


class TestFuzzySeek:
    """DP-guided seek == brute force, and it really skips prefix blocks."""

    def _view(self, vocab):
        import pyarrow as pa

        from lucene_solr_ray.index.termdict import SortedStrings

        return SortedStrings(pa.array(vocab, type=pa.string()))

    def test_matches_bruteforce(self):
        import random

        from lucene_solr_ray.query.suggest import fuzzy_seek

        rnd = random.Random(37)
        vocab = sorted(
            {"".join(rnd.choice("abcd") for _ in range(rnd.randint(1, 7))) for _ in range(1500)}
        )
        view = self._view(vocab)
        for w in ["abc", "dd", "abcdabc", "zzzz", ""]:
            for k in (0, 1, 2):
                got = fuzzy_seek(view, w, k)
                want = [(t, _lev(t, w)) for t in vocab if _lev(t, w) <= k]
                assert got == want, (w, k)

    def test_visits_are_bounded_not_ovocab(self):
        import random

        from lucene_solr_ray.query.suggest import fuzzy_seek

        rnd = random.Random(11)
        vocab = sorted(
            {"".join(rnd.choice("abcdefgh") for _ in range(rnd.randint(5, 10)))
             for _ in range(4000)}
        )
        view = _CountingView(self._view(vocab))
        out = fuzzy_seek(view, "abcab", 1)
        assert out == [(t, _lev(t, "abcab")) for t in vocab if _lev(t, "abcab") <= 1]
        # block seeks must prune most of the dictionary (automaton frontier)
        assert view.visits < len(vocab) // 4, view.visits

    def test_field_scoped_and_sep_blocks_skipped(self):
        from lucene_solr_ray.query.suggest import fuzzy_seek
        from lucene_solr_ray.stages.tokenize import FIELD_SEP

        vocab = sorted(
            ["cat", "cot", "dog", "dot"]
            + [f"title{FIELD_SEP}{t}" for t in ("cat", "cut", "pig")],
            key=lambda s: s.encode(),
        )
        view = self._view(vocab)
        assert fuzzy_seek(view, "cat", 1, field="text") == [("cat", 0), ("cot", 1)]
        assert fuzzy_seek(view, "cat", 1, field="title") == [("cat", 0), ("cut", 1)]
        assert fuzzy_seek(view, "dog", 1, field="title") == []


class TestSuggest:
    def test_prefix_suggestions_match_brute(self, pages_corpus, term_stats):
        _, ttf = term_stats
        sg = PrefixSuggester(GlobalStats(pages_corpus["index_dir"]))
        for pref in ["lu", "ka", "z", "ta", "nosuchprefix"]:
            got = sg.suggest(pref, top=10)
            want = sorted(
                ((t, w) for t, w in ttf.items() if t.startswith(pref)),
                key=lambda tw: (-tw[1], tw[0]),
            )[:10]
            assert got == want, pref

    def test_spellcheck_matches_brute(self, pages_corpus, term_stats):
        df, _ = term_stats
        stats = GlobalStats(pages_corpus["index_dir"])

        def brute(word, max_edits=2, top=5):
            import itertools

            def dist(a, b):
                prev = list(range(len(b) + 1))
                for i, ca in enumerate(a, 1):
                    cur = [i] + [0] * len(b)
                    for j, cb in enumerate(b, 1):
                        cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                    prev = cur
                return prev[-1]

            cands = []
            for t, d_ in df.items():
                d = dist(t, word)
                if 1 <= d <= max_edits:
                    cands.append((d, -d_, t))
            cands.sort()
            return [(t, d, -nd) for d, nd, t in cands[:top]]

        # take some real terms and perturb them
        some = sorted(df)[:4]
        for w in [t[:-1] + "x" for t in some if len(t) > 3] + ["zzzzzz"]:
            assert spellcheck(stats, w) == brute(w), w

    def test_existing_word_not_suggested(self, pages_corpus, term_stats):
        df, _ = term_stats
        stats = GlobalStats(pages_corpus["index_dir"])
        word = sorted(df)[0]
        assert all(s != word for s, _, _ in spellcheck(stats, word))


def _osa(a, b):
    """Damerau OSA distance (transpositions allowed, no substring reuse)."""
    rows = [list(range(len(b) + 1))]
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            c = min(rows[i - 1][j] + 1, cur[j - 1] + 1, rows[i - 1][j - 1] + (ca != cb))
            if i >= 2 and j >= 2 and ca == b[j - 2] and a[i - 2] == cb:
                c = min(c, rows[i - 2][j - 2] + 1)
            cur.append(c)
        rows.append(cur)
    return rows[-1][-1]


class TestFuzzySuggest:
    """FuzzySuggester analog vs a brute all-vocab prefix-automaton oracle."""

    def _brute(self, ttf, q, *, max_edits=1, non_fuzzy_prefix=1,
               min_fuzzy_length=3, top=10):
        me = max_edits if len(q) >= min_fuzzy_length else 0
        pref, rest = q[:non_fuzzy_prefix], q[non_fuzzy_prefix:]
        cands = []
        for t, w in ttf.items():
            if not t.startswith(pref):
                continue
            t_rest = t[len(pref):]
            if any(_osa(t_rest[:k], rest) <= me for k in range(len(t_rest) + 1)):
                cands.append((-w, t))
        cands.sort()
        return [(t, -nw) for nw, t in cands[:top]]

    def test_matches_brute(self, pages_corpus, term_stats):
        from lucene_solr_ray.query.suggest import fuzzy_suggest

        _, ttf = term_stats
        stats = GlobalStats(pages_corpus["index_dir"])
        some = sorted(ttf)[:3]
        queries = ["lu", "ka", "zzz"] + [t[:-1] + "x" for t in some if len(t) > 4]
        for q in queries:
            got = fuzzy_suggest(stats, q)
            want = self._brute(ttf, q)
            assert got == want, q

    def test_short_query_is_exact_prefix(self, pages_corpus, term_stats):
        from lucene_solr_ray.query.suggest import fuzzy_suggest

        _, ttf = term_stats
        stats = GlobalStats(pages_corpus["index_dir"])
        got = fuzzy_suggest(stats, "lu")  # < min_fuzzy_length → 0 edits
        want = sorted(((t, w) for t, w in ttf.items() if t.startswith("lu")),
                      key=lambda tw: (-tw[1], tw[0]))[:10]
        assert got == want

    def test_transposition_is_one_edit(self):
        # pure-DP check: 'sacn' matches 'scan...' completions at 1 OSA edit
        assert _osa("acn", "can") == 1


def test_blended_infix_matches_brute(ray_session, tmp_path):
    """BlendedInfixSuggester analog vs a per-doc brute recomputation:
    first-8-token suggestion window, POSITION_RECIPROCAL blending
    weight/(1+first match pos), (score desc, doc_id asc) top-10."""
    import re

    import pyarrow as pa
    import pyarrow.parquet as pqt

    from lucene_solr_ray.pipelines.fulltext import blended_infix_suggest_docs

    texts = [
        "alpha joins the sort engine",            # 'jo' at pos 1, w=5
        "zeta beta gamma delta epsilon eta theta iota joint",  # 'jo' at pos 8 -> outside window
        "jolt first token here",                  # 'jo' at pos 0, w=4
        "sorted merging of sorted runs",          # 'sor' at pos 0, w=5
        "one two sort",                           # 'sor' at pos 2, w=3
        "",                                        # no tokens
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts)})
    pqt.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = blended_infix_suggest_docs(str(tmp_path)).to_pandas()

    want_rows = []
    for q in ("jo", "sor"):
        cands = []
        for did, s in enumerate(texts):
            toks = [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
            hits = [i for i, t in enumerate(toks[:8]) if t.startswith(q)]
            if hits:
                cands.append((len(toks) / (1 + hits[0]), did))
        cands.sort(key=lambda sd: (-sd[0], sd[1]))
        for rank, (score, did) in enumerate(cands[:10]):
            want_rows.append((q, rank, did, round(score, 6)))
    got_rows = list(zip(got["q"], got["rank"], got["doc_id"], got["score"]))
    assert got_rows == want_rows


class TestFuzzySuggestRandomized:
    """Seek-path differential: random prefix-heavy dictionaries stress the
    accept-block take-all, abandon-block lower_bound skip, and shared-prefix
    DP row reuse against an all-vocab prefix-automaton brute force."""

    class _FakeStats:
        def __init__(self, ttf: dict[str, int]):
            import bisect

            import numpy as np

            terms = sorted(ttf)
            enc = [t.encode("utf-8") for t in terms]
            w = np.array([ttf[t] for t in terms], dtype=np.int64)

            class _T:
                def __len__(self):
                    return len(terms)

                def __getitem__(self, i):
                    return terms[int(i)]

                def lower_bound(self, b: bytes) -> int:
                    return bisect.bisect_left(enc, b)

                def prefix_range(self, prefix: str):
                    pb = prefix.encode("utf-8")
                    return (bisect.bisect_left(enc, pb),
                            bisect.bisect_left(enc, pb + b"\xff\xff\xff\xff"))

            self.terms = _T()
            self._w = w

        def ttf_slice(self, lo: int, hi: int):
            return self._w[lo:hi]

    @staticmethod
    def _brute(ttf, q, *, max_edits, non_fuzzy_prefix, min_fuzzy_length, top):
        me = max_edits if len(q) >= min_fuzzy_length else 0
        pref, rest = q[:non_fuzzy_prefix], q[non_fuzzy_prefix:]
        cands = []
        for t, w in ttf.items():
            if not t.startswith(pref):
                continue
            t_rest = t[len(pref):]
            if any(_osa(t_rest[:k], rest) <= me for k in range(len(t_rest) + 1)):
                cands.append((-w, t))
        cands.sort()
        return [(t, -nw) for nw, t in cands[:top]]

    def test_random_dictionaries_match_brute(self):
        import random

        from lucene_solr_ray.query.suggest import fuzzy_suggest

        rnd = random.Random(1307)
        alphabet = "abc"
        for trial in range(40):
            vocab = {
                "".join(rnd.choice(alphabet)
                        for _ in range(rnd.randint(1, 7))): rnd.randint(1, 50)
                for _ in range(rnd.randint(5, 120))
            }
            stats = self._FakeStats(vocab)
            params = dict(
                max_edits=rnd.choice([1, 2]),
                non_fuzzy_prefix=rnd.choice([0, 1, 2]),
                min_fuzzy_length=rnd.choice([1, 3]),
                top=rnd.choice([3, 10]),
            )
            for _ in range(6):
                q = "".join(rnd.choice(alphabet)
                            for _ in range(rnd.randint(1, 6)))
                got = fuzzy_suggest(stats, q, **params)
                want = self._brute(vocab, q, **params)
                assert got == want, (trial, q, params)
