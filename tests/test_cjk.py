"""CJK bigram chain (CJKAnalyzer shape) — differential + e2e gates.

Expectations are hand-derived from the CJKBigramFilter contract
(`lucene/analysis/common/src/java/org/apache/lucene/analysis/cjk/CJKBigramFilter.java`,
analyzer defaults: all four scripts bigrammed, outputUnigrams=false) plus a
brute-force sliding-window oracle for generated inputs.
"""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_ray.analysis.cjk import cjk_analyze, cjk_bigram, cjk_width_fold


def terms(text):
    return [t for t, _ in cjk_analyze(text)]


class TestWidthFold:
    def test_fullwidth_ascii_folds(self):
        assert cjk_width_fold("ＡＢＣ１２３") == "ABC123"
        assert terms("ＡＢＣ１２３") == ["abc123"]

    def test_halfwidth_katakana_composes(self):
        # halfwidth KA + dakuten -> GA
        assert cjk_width_fold("ｶﾞ") == "ガ"

    def test_non_width_chars_untouched(self):
        s = "Grüße 日本語 naïve"
        assert cjk_width_fold(s) == s


class TestBigram:
    def test_han_run_bigrams(self):
        assert terms("日本語") == ["日本", "本語"]

    def test_lone_cjk_char_single(self):
        assert terms("cat 日 dog") == ["cat", "日", "dog"]

    def test_stream_adjacency_joins_across_space(self):
        # CJKBigramFilter buffers consecutive stream tokens; whitespace is
        # not a boundary (the tokenizer already dropped it)
        assert terms("日 本") == ["日本"]

    def test_katakana_run_contributes_chars(self):
        assert terms("アパート") == ["アパ", "パー", "ート"]

    def test_mixed_scripts_pool(self):
        # hiragana chars + han chars are one buffer
        assert terms("これは日本") == ["これ", "れは", "は日", "日本"]

    def test_non_cjk_breaks_buffer(self):
        out = cjk_analyze("check日本語test")
        assert out == [("check", 0), ("日本", 1), ("本語", 2), ("test", 3)]

    def test_stopword_consumes_position(self):
        assert cjk_analyze("the 日本") == [("日本", 1)]

    def test_hangul_bigrams(self):
        assert terms("한국어") == ["한국", "국어"]

    def test_bigram_types(self):
        out = cjk_bigram([("日", "IDEOGRAPHIC"), ("本", "IDEOGRAPHIC")])
        assert out == [("日本", "DOUBLE")]
        out = cjk_bigram([("日", "IDEOGRAPHIC")])
        assert out == [("日", "SINGLE")]

    def test_sliding_window_oracle_random_runs(self):
        # brute-force oracle: a pure-CJK string with no breaks bigrams to
        # every adjacent char pair in order
        rng = np.random.default_rng(3)
        pool = list("日本語文書検索引擎大規模分散処理ぁあぃいアイウエ가나다라")
        for _ in range(50):
            n = int(rng.integers(1, 12))
            s = "".join(rng.choice(pool, size=n))
            expect = [s[i : i + 2] for i in range(n - 1)] if n > 1 else [s]
            assert terms(s) == expect, s


class TestIndexIntegration:
    def test_cjk_index_phrase_and_term(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from lucene_solr_ray.index.build import build_index
        from lucene_solr_ray.index.reader import LocalIndex
        from lucene_solr_ray.query.ast import Evaluator, PhraseQ, TermQ, top_k

        rows = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "lang": pa.array(["ja", "zh", "en"]),
                "text": pa.array(
                    ["日本語の文書検索", "大規模分散処理", "latin only text here"]
                ),
            }
        )
        src = str(tmp_path / "d.parquet")
        pq.write_table(rows, src)
        ix = str(tmp_path / "ix")
        build_index([src], ix, rows_per_partition=8, extract_html=False,
                    dedup_url=False, analyzer="cjk", facet_fields=("lang",),
                    resume=False)
        loc = LocalIndex(ix)
        assert loc.postings("text", "日本")[0].tolist() == [0]
        assert loc.postings("text", "分散")[0].tolist() == [1]
        assert loc.postings("text", "latin")[0].tolist() == [2]
        ev = Evaluator(loc)
        # phrase over consecutive bigrams: 文書検索 == "文書"+"書検"+"検索"
        docs, scores = ev.scored(PhraseQ(("文書", "書検", "検索")))
        assert [d for _, d in top_k(docs, scores, 5)] == [0]
        docs, scores = ev.scored(TermQ("処理"))
        assert [d for _, d in top_k(docs, scores, 5)] == [1]

    def test_by_lang_routes_cjk(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from lucene_solr_ray.index.build import build_index
        from lucene_solr_ray.index.reader import LocalIndex

        rows = pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "lang": pa.array(["ja", "en"]),
                "text": pa.array(["検索引擎", "searching engines"]),
            }
        )
        src = str(tmp_path / "d.parquet")
        pq.write_table(rows, src)
        ix = str(tmp_path / "ix")
        build_index([src], ix, rows_per_partition=8, extract_html=False,
                    dedup_url=False, analyzer="by_lang", facet_fields=("lang",),
                    resume=False)
        loc = LocalIndex(ix)
        assert loc.postings("text", "検索")[0].tolist() == [0]
        # en doc porter-stems
        from lucene_solr_ray.analysis.filters import porter_stem

        assert loc.postings("text", porter_stem("searching"))[0].tolist() == [1]
