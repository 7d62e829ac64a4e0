"""Token filter library: Porter vectors (from the 1980 paper), folding,
shingles, n-grams, synonyms."""

from lucene_solr_ray.analysis.filters import (
    ascii_fold,
    edge_ngram_terms,
    ngram_terms,
    porter_stem,
    shingle_tokens,
    stop_filter,
    synonym_expand,
)

# examples published in Porter (1980), "An algorithm for suffix stripping"
PORTER_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "fizzed": "fizz", "failing": "fail", "filing": "file",
    "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "radicalli": "radic", "differentli": "differ", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "effective": "effect", "bowdlerize": "bowdler",
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
}


class TestPorter:
    def test_paper_vectors(self):
        bad = {
            w: (porter_stem(w), want)
            for w, want in PORTER_VECTORS.items()
            if porter_stem(w) != want
        }
        assert not bad, bad

    def test_short_words_untouched(self):
        for w in ["a", "is", "be", "xy"]:
            assert porter_stem(w) == w

    def test_idempotent_on_many(self):
        # stemming a stem must not crash; re-stem stability not guaranteed by
        # the algorithm, so only check it still returns a string
        for w in PORTER_VECTORS:
            assert isinstance(porter_stem(porter_stem(w)), str)


class TestFolding:
    def test_basic_accents(self):
        assert ascii_fold("café") == "cafe"
        assert ascii_fold("über") == "uber"
        assert ascii_fold("naïve") == "naive"
        assert ascii_fold("crème brûlée") == "creme brulee"

    def test_ligatures_and_specials(self):
        assert ascii_fold("œuvre") == "oeuvre"
        assert ascii_fold("straße") == "strasse"
        assert ascii_fold("Ørsted") == "Orsted"
        assert ascii_fold("Þing") == "THing"

    def test_ascii_passthrough_and_nonlatin_kept(self):
        assert ascii_fold("hello42") == "hello42"
        assert ascii_fold("日本") == "日本"  # not foldable -> unchanged


class TestLightStemmers:
    def test_german(self):
        from lucene_solr_ray.analysis.filters import german_light_stem as g

        # plural/case endings collapse; umlauts normalize
        assert g("häuser") == g("hauses") == g("haus")
        assert g("katzen") == g("katze")
        assert g("straße") == g("strassen")  # ß folds, plural strips
        assert g("buch") == "buch"

    def test_french(self):
        from lucene_solr_ray.analysis.filters import french_light_stem as f

        assert f("chevaux") == f("cheval")
        assert f("maisons") == f("maison")
        assert f("chats") == f("chat")
        assert f("porte") == f("portes")

    def test_spanish(self):
        from lucene_solr_ray.analysis.filters import spanish_light_stem as s

        assert s("perros") == s("perro") == s("perra") == s("perras")
        assert s("colores") == s("color")
        assert s("ciudades") == s("ciudad")
        assert s("gato") == "gato"  # <5 chars: untouched (the light guard)

    def test_by_lang_routing_stems_per_language(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from lucene_solr_ray.index.build import build_index
        from lucene_solr_ray.index.reader import LocalIndex

        rows = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "lang": pa.array(["de", "es", "fr"]),
                "text": pa.array(["katzen hier", "gatos aqui", "maisons ici"]),
            }
        )
        src = str(tmp_path / "d.parquet")
        pq.write_table(rows, src)
        ix = str(tmp_path / "ix")
        build_index([src], ix, rows_per_partition=8, extract_html=False,
                    dedup_url=False, analyzer="by_lang", facet_fields=("lang",),
                    resume=False)
        loc = LocalIndex(ix)
        from lucene_solr_ray.analysis.filters import (
            french_light_stem,
            german_light_stem,
            spanish_light_stem,
        )

        assert loc.postings("text", german_light_stem("katzen"))[0].tolist() == [0]
        assert loc.postings("text", spanish_light_stem("gatos"))[0].tolist() == [1]
        assert loc.postings("text", french_light_stem("maisons"))[0].tolist() == [2]


class TestStructural:
    def test_shingles(self):
        toks = ["quick", "brown", "fox"]
        assert shingle_tokens(toks) == ["quick", "brown", "fox", "quick_brown", "brown_fox"]
        assert shingle_tokens(toks, max_size=3, output_unigrams=False) == [
            "quick_brown", "brown_fox", "quick_brown_fox"
        ]

    def test_ngrams(self):
        assert ngram_terms("abc", 1, 2) == ["a", "b", "c", "ab", "bc"]
        assert edge_ngram_terms("abcd", 1, 3) == ["a", "ab", "abc"]
        assert edge_ngram_terms("ab", 1, 5) == ["a", "ab"]

    def test_synonyms_share_position(self):
        out = synonym_expand([("fast", 0), ("car", 1)], {"fast": ["quick", "rapid"]})
        assert out == [("fast", 0), ("quick", 0), ("rapid", 0), ("car", 1)]

    def test_stop_filter_keeps_gaps(self):
        out = stop_filter([("the", 0), ("fox", 1), ("and", 2), ("dog", 3)], {"the", "and"})
        assert out == [("fox", 1), ("dog", 3)]
