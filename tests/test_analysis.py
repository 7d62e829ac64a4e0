"""Unit tests: SmallFloat quantization, HTML extraction, tokenizer chain."""

import numpy as np
import pytest

from lucene_solr_ray.analysis.html_extract import FramesetError, extract
from lucene_solr_ray.analysis.tokenizer import (
    ENGLISH_STOP_WORDS,
    analyze,
    analyze_counts,
    simple_tokenize,
    standard_tokenize,
)
from lucene_solr_ray.smallfloat import NORM_TABLE, byte315_to_float, encode_norm, float_to_byte315


class TestSmallFloat:
    def test_known_values(self):
        # SmallFloat.java:76-78 documented range for (mantissa=3, zeroExp=15)
        assert float_to_byte315(np.float32(0.0)) == 0
        assert float_to_byte315(np.float32(-1.0)) == 0
        assert float_to_byte315(np.float32(1e-12)) == 1  # underflow -> smallest
        assert float_to_byte315(np.float32(1e20)) == 255  # overflow -> (byte)-1
        assert byte315_to_float(np.uint8(0)) == 0.0
        # smallest non-zero value = 5.820766E-10
        assert byte315_to_float(np.uint8(1)) == pytest.approx(5.820766e-10)
        # largest value = 7.5161928E9
        assert byte315_to_float(np.uint8(255)) == pytest.approx(7.5161928e9)

    def test_round_trip_monotone(self):
        vals = np.float32(10) ** np.linspace(-8, 9, 500, dtype=np.float32)
        enc = float_to_byte315(vals)
        assert (np.diff(enc.astype(int)) >= 0).all()  # monotone
        dec = byte315_to_float(enc)
        # re-encoding the decoded value is a fixed point
        assert (float_to_byte315(dec) == enc).all()

    def test_norm_table_is_one_over_f_squared(self):
        f = byte315_to_float(np.arange(1, 256, dtype=np.uint8))
        assert np.allclose(NORM_TABLE[1:], 1.0 / (f * f), rtol=0)
        assert np.isinf(NORM_TABLE[0])

    def test_encode_norm_quantizes_lengths(self):
        # dl=3 and dl=4 collapse to the same byte (epsilon=0.125 quantization)
        assert encode_norm([3])[0] == encode_norm([4])[0]
        assert encode_norm([1])[0] != encode_norm([4])[0]


class TestHtmlExtract:
    def test_demo_parser_rules(self):
        html = (
            "<html><head><title> T1 </title>"
            '<meta name="Author" content="me"><meta http-equiv="Refresh" content="5">'
            "</head><body>a<p>b</p><script>skip()</script><style>.x{}</style>"
            '<img alt="pic"><img src="x.png">c<br>d'
            "<div>e<div>f</div></div><ul><li>g</li></ul></body></html>"
        )
        title, body, meta = extract(html)
        assert title == "T1"
        # p/div/li/ul/br end tags emit \n; script/style suppressed; img alt -> [pic]
        assert body == "ab\n[pic]c\nd" + "ef\n\ng\n\n"
        assert meta == {"author": "me", "refresh": "5"}

    def test_head_text_not_in_body(self):
        _, body, _ = extract("<html><head><title>x</title>junk</head><body>ok</body></html>")
        assert body == "ok"

    def test_entities_decoded(self):
        _, body, _ = extract("<html><body>&amp; &#233; &lt;</body></html>")
        assert body == "& é <"

    def test_frameset_rejected(self):
        with pytest.raises(FramesetError):
            extract("<html><frameset><frame src='x'></frameset></html>")

    def test_table_rows_breaks(self):
        _, body, _ = extract("<html><body><table><tr><td>a</td></tr></table></body></html>")
        # tr end -> \n, table end -> \n
        assert body == "a\n\n"

    def test_bytes_input(self):
        _, body, _ = extract("<html><body>café</body></html>".encode("utf-8"))
        assert body == "café"


class TestTokenizer:
    def test_types_and_midjoiners(self):
        toks = standard_tokenize("Foo's bar_baz 3.14 1,024 a.b x:y")
        assert ("Foo's", "ALPHANUM") in toks
        assert ("bar_baz", "ALPHANUM") in toks
        assert ("3.14", "NUM") in toks
        assert ("1,024", "NUM") in toks
        assert ("a.b", "ALPHANUM") in toks
        # ':' is NOT a mid-letter joiner (Unicode 6.3, LUCENE_4_7+ grammar)
        assert ("x", "ALPHANUM") in toks and ("y", "ALPHANUM") in toks

    def test_cjk_classes(self):
        toks = standard_tokenize("漢字です カタカナ 한국어")
        kinds = [t for _, t in toks]
        assert kinds == ["IDEOGRAPHIC", "IDEOGRAPHIC", "HIRAGANA", "HIRAGANA", "KATAKANA", "HANGUL"]

    def test_stopwords_and_positions(self):
        out = analyze("The quick fox and the dog")
        # 33-word stop set removed, positions keep gaps
        assert out == [("quick", 1), ("fox", 2), ("dog", 5)]
        assert len(ENGLISH_STOP_WORDS) == 33

    def test_max_token_length_skips_but_counts_position(self):
        long = "x" * 300
        out = analyze(f"aa {long} bb")
        assert out == [("aa", 0), ("bb", 2)]

    def test_counts_and_dl(self):
        terms, tfs, dl = analyze_counts("the cat sat on the mat with a cat")
        assert dict(zip(terms, tfs)) == {"cat": 2, "sat": 1, "mat": 1}
        assert dl == 4  # post-stop token count (norm length)

    def test_simple_tokenize_matches_duckdb_regex(self):
        import duckdb

        text = "Hello, WORLD! 42-foo_bar baz's"
        ours = simple_tokenize(text)
        sql = duckdb.sql(
            "SELECT t FROM unnest(regexp_split_to_array(lower($$" + text + "$$), '[^a-z0-9]+')) AS u(t) WHERE t != ''"
        ).fetchall()
        assert ours == [r[0] for r in sql]


class TestPipelineEdgeCases:
    def test_frameset_flows_through_build_stages(self):
        """Frameset docs are flagged, not fatal: extract_ok=False, empty
        token stream, dl=0 (norm byte 255 = inf) — they match nothing."""
        import pyarrow as pa

        from lucene_solr_ray.stages.extract import extract_batch
        from lucene_solr_ray.stages.tokenize import tokenize_batch

        t = pa.table(
            {
                "doc_id": [1, 2],
                "partition_id": [0, 0],
                "html": [b"<html><frameset></frameset></html>", b"<html><body>ok text</body></html>"],
            }
        )
        e = extract_batch(t)
        assert e["extract_ok"].to_pylist() == [False, True]
        tok = tokenize_batch(e)
        assert tok["dl"].to_pylist() == [0, 2]
        assert tok["norm"].to_pylist()[0] == 255
        assert tok["terms"].to_pylist() == [[], ["ok", "text"]]
