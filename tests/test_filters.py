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
