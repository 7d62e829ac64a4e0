"""Token filter library (analysis chain building blocks).

Re-specifications of the commonly-used reference filters
(`lucene/analysis/common/src/java/org/apache/lucene/analysis/...`):

* :func:`ascii_fold`       — ``miscellaneous/ASCIIFoldingFilter.java`` (the
  Latin-1/Extended subset the fixtures exercise; NFKD + special ligatures)
* :func:`porter_stem`      — ``en/PorterStemFilter.java`` (the classic
  Porter 1980 algorithm, as published)
* :func:`shingle_tokens`   — ``shingle/ShingleFilter.java`` (word n-grams
  with ``_`` separator, optional unigram output)
* :func:`ngram_terms` / :func:`edge_ngram_terms` —
  ``ngram/NGramTokenFilter.java`` / ``EdgeNGramTokenFilter.java``
* :func:`synonym_expand`   — ``synonym/SynonymFilter.java`` (dict-based,
  expansion at the same position)
* :func:`stop_filter`      — parametric ``core/StopFilter.java``

Filters operate on plain term lists (or (term, pos) streams where position
semantics matter) so they compose with both the batch tokenizer stage and
query-time analysis.
"""

from __future__ import annotations

import unicodedata

_SPECIAL_FOLD = {
    "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE", "ß": "ss",
    "ø": "o", "Ø": "O", "đ": "d", "Đ": "D", "þ": "th", "Þ": "TH",
    "ð": "d", "Ð": "D", "ł": "l", "Ł": "L", "ı": "i",
}


def ascii_fold(term: str) -> str:
    """Fold accented/ligature Latin characters to their ASCII base."""
    out = []
    for ch in term:
        if ord(ch) < 128:
            out.append(ch)
            continue
        if ch in _SPECIAL_FOLD:
            out.append(_SPECIAL_FOLD[ch])
            continue
        decomp = unicodedata.normalize("NFKD", ch)
        folded = "".join(c for c in decomp if not unicodedata.combining(c))
        out.append(folded if all(ord(c) < 128 for c in folded) else ch)
    return "".join(out)


# ---- Porter stemmer (Porter 1980, as in PorterStemmer.java) -----------------


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in "aeiou":
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences."""
    m = 0
    i = 0
    n = len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    if not (_is_cons(w, len(w) - 3) and not _is_cons(w, len(w) - 2) and _is_cons(w, len(w) - 1)):
        return False
    return w[-1] not in "wxy"


def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ]:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 3
    for suf, rep in [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ]:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 4
    for suf in [
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ]:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    pass
                else:
                    w = stem
            break
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


# ---- light stemmers (Savoy 1999 / Jacques Savoy's CLEF family, the
# algorithms behind `analysis/de/GermanLightStemmer.java`,
# `fr/FrenchLightStemmer.java` light variants, `es/SpanishLightStemmer.java`) --


def german_light_stem(word: str) -> str:
    """Plural/case suffix stripping for German (light variant): normalize
    umlauts/ß, then iteratively strip e/s/n/t/em/er/nd endings."""
    w = word
    for a, b in (("ä", "a"), ("ö", "o"), ("ü", "u"), ("ß", "ss")):
        w = w.replace(a, b)
    while len(w) > 3:
        if len(w) > 5 and (w.endswith("em") or w.endswith("er") or w.endswith("nd")):
            w = w[:-2]
        elif w[-1] in ("e", "s", "n", "t"):
            w = w[:-1]
        else:
            break
    return w


def french_light_stem(word: str) -> str:
    """Light French stemmer: strip plural and frequent derivational endings
    (aux/eaux -> al/eau, x after i/ou, s, final doubled letters, é/e)."""
    w = word
    if len(w) > 4 and w.endswith("aux") and not w.endswith("eaux"):
        return w[:-2] + "l"
    if len(w) > 4 and w.endswith("x"):
        w = w[:-1]
    if len(w) > 4 and w.endswith("s"):
        w = w[:-1]
    if len(w) > 8 and w.endswith("issement"):
        return w[:-6] + "r"
    if len(w) > 5 and w.endswith("ement"):
        w = w[:-4]
    if len(w) > 4 and w[-1] in "éeè":
        w = w[:-1]
    if len(w) > 3 and w[-1] == w[-2]:
        w = w[:-1]
    return w


def spanish_light_stem(word: str) -> str:
    """Light Spanish stemmer: de-accent, strip plural -es/-s, gendered and
    diminutive-free noun/adjective endings (o/a/os/as)."""
    w = word
    for a, b in (("á", "a"), ("é", "e"), ("í", "i"), ("ó", "o"), ("ú", "u")):
        w = w.replace(a, b)
    if len(w) < 5:
        return w
    if w.endswith("es") and len(w) > 5 and w[-3] in "rndlcz":
        return w[:-2]
    for suf in ("os", "as", "o", "a", "e"):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            return w[: -len(suf)]
    return w


def english_stem(word: str) -> str:
    """The full English chain step (fold + Porter) — kept identical to the
    'english' analyzer so 'light_en' and by_lang('en') can never diverge."""
    return porter_stem(ascii_fold(word))


LIGHT_STEMMERS = {
    "de": german_light_stem,
    "fr": french_light_stem,
    "es": spanish_light_stem,
    "en": english_stem,
}


# ---- structural filters -----------------------------------------------------


def shingle_tokens(tokens: list[str], min_size: int = 2, max_size: int = 2,
                   sep: str = "_", output_unigrams: bool = True) -> list[str]:
    """Word n-grams over adjacent tokens (ShingleFilter defaults)."""
    out = list(tokens) if output_unigrams else []
    n = len(tokens)
    for size in range(max(min_size, 2), max_size + 1):
        for i in range(n - size + 1):
            out.append(sep.join(tokens[i : i + size]))
    return out


def ngram_terms(term: str, min_gram: int = 1, max_gram: int = 2) -> list[str]:
    """All character n-grams of each length in [min_gram, max_gram], in
    gram-size-major order (NGramTokenFilter pre-4.4 order)."""
    out = []
    for g in range(min_gram, max_gram + 1):
        for i in range(len(term) - g + 1):
            out.append(term[i : i + g])
    return out


def edge_ngram_terms(term: str, min_gram: int = 1, max_gram: int = 2) -> list[str]:
    """Front-anchored n-grams (EdgeNGramTokenFilter, Side.FRONT)."""
    return [term[:g] for g in range(min_gram, min(max_gram, len(term)) + 1)]


def synonym_expand(tokens: list[tuple[str, int]], synonyms: dict[str, list[str]]) -> list[tuple[str, int]]:
    """Expansion-style SynonymFilter: injected synonyms share the original
    token's position (posIncrement 0)."""
    out: list[tuple[str, int]] = []
    for term, pos in tokens:
        out.append((term, pos))
        for s in synonyms.get(term, ()):
            out.append((s, pos))
    return out


def stop_filter(tokens: list[tuple[str, int]], stopwords) -> list[tuple[str, int]]:
    """Parametric StopFilter (positions keep their gaps)."""
    sw = frozenset(stopwords)
    return [(t, p) for t, p in tokens if t not in sw]
