"""StandardAnalyzer-equivalent analysis chain.

Executable re-specification of the reference chain
``StandardTokenizer -> StandardFilter -> LowerCaseFilter -> StopFilter``
(`lucene/analysis/common/src/java/org/apache/lucene/analysis/standard/StandardAnalyzer.java:56-123`).

Tokenizer: a UAX#29-word-break-approximating scanner mirroring the JFlex
grammar of ``StandardTokenizerImpl`` (`StandardTokenizerImpl.java:25-42`,
Unicode 6.3 properties, LUCENE_4_7+ branch of `StandardTokenizer.java:166-178`):

* ALPHANUM / NUM: runs of letters/digits/underscore (ExtendNumLet) joined by
  MidNumLet (``. ' ’``) between same-kind neighbours, MidLetter
  (``·``) between letters, MidNum (``, ;``) between digits.
* IDEOGRAPHIC (Han) and HIRAGANA: ONE TOKEN PER CHARACTER.
* KATAKANA and HANGUL: runs.
* ``maxTokenLength=255``: longer matches are skipped entirely but still
  consume a position (`StandardTokenizer.java:204-222`).

Filters: lowercase (``str.lower``; deviation: Java ``Character.toLowerCase``
differs on a handful of codepoints e.g. dotted-I — not exercised by fixtures);
stop-word removal with position-increment gaps, using the 33-word
``StopAnalyzer.ENGLISH_STOP_WORDS_SET``
(`lucene/analysis/common/src/java/org/apache/lucene/analysis/core/StopAnalyzer.java:50-57`).

Scanner deviation (documented): the non-CJK letter class covers Latin, Greek,
Cyrillic, Hebrew and Arabic ranges rather than the full Unicode Alphabetic
property; fixture languages (en de fr es da zh ja) are fully covered.
"""

from __future__ import annotations

import re

__all__ = [
    "ENGLISH_STOP_WORDS",
    "MAX_TOKEN_LENGTH",
    "standard_tokenize",
    "analyze",
    "analyze_counts",
    "simple_tokenize",
]

# StopAnalyzer.java:50-57 (33 words)
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.DEFAULT_MAX_TOKEN_LENGTH

# ---- character classes ------------------------------------------------------
_L = (
    "A-Za-z"
    "À-ÖØ-öø-ɏ"  # Latin-1/Extended letters (no x/÷)
    "ΆΈ-Ͽ"                      # Greek
    "Ѐ-ӿ"                            # Cyrillic
    "֐-ת"                            # Hebrew
    "ؠ-ي"                            # Arabic
)
_D = "0-9"
_AN = f"[{_L}{_D}_]"

# one token: alnum runs glued by type-matched mid punctuation (UAX#29 WB6/7/11/12)
_WORD = (
    f"{_AN}+"
    f"(?:(?:(?<=[{_L}])['’.·](?=[{_L}])|(?<=[{_D}])['’.,;](?=[{_D}])){_AN}+)*"
)

# class CONTENTS are exported separately: the Arrow-scan fast path
# (stages/tokenize.py) builds its re2 delimiter class from these so the two
# scanners can never diverge on what counts as a token character
_IDEO_C = "々〇㐀-䶿一-鿿豈-﫿"
_HIRA_C = "ぁ-ゖゝゞ"
_KATA_C = "ァ-ヺー-ヿㇰ-ㇿ"
_HANG_C = "ᄀ-ᇿ㄰-㆏가-힣"
_MID_C = "'’.,;·"  # MidNumLet/MidLetter/MidNum glue chars (inside _WORD only)
_IDEO = f"[{_IDEO_C}]"
_HIRA = f"[{_HIRA_C}]"
_KATA = f"[{_KATA_C}]+"
_HANG = f"[{_HANG_C}]+"

_SCANNER = re.compile(
    f"(?P<word>{_WORD})|(?P<kata>{_KATA})|(?P<hang>{_HANG})"
    f"|(?P<ideo>{_IDEO})|(?P<hira>{_HIRA})"
)

# group-free twin of _SCANNER (same alternation order): with no capturing
# groups, ``findall`` returns the matched strings as a C-built list — the
# vectorized tokenize path (stages/tokenize.py) scans with this and does all
# per-token work (lower/stop/maxlen/grouping) in Arrow/numpy kernels
_SCANNER_FLAT = re.compile(
    f"(?:{_WORD})|(?:{_KATA})|(?:{_HANG})|(?:{_IDEO})|(?:{_HIRA})"
)

_NUM_RE = re.compile(f"^[{_D}'’.,;_]+$")
_SIMPLE = re.compile(r"[a-z0-9]+")


def standard_tokenize(text: str) -> list[tuple[str, str]]:
    """Scan *text* -> list of ``(token, type)``; type in
    {ALPHANUM, NUM, IDEOGRAPHIC, HIRAGANA, KATAKANA, HANGUL}.
    Over-length tokens (>255) are dropped here; position accounting for the
    drop happens in :func:`analyze` (each dropped token still advances pos).
    """
    out: list[tuple[str, str]] = []
    for m in _SCANNER.finditer(text):
        tok = m.group(0)
        kind = m.lastgroup
        if kind == "word":
            ttype = "NUM" if _NUM_RE.match(tok) else "ALPHANUM"
        elif kind == "ideo":
            ttype = "IDEOGRAPHIC"
        elif kind == "hira":
            ttype = "HIRAGANA"
        elif kind == "kata":
            ttype = "KATAKANA"
        else:
            ttype = "HANGUL"
        out.append((tok, ttype))
    return out


def analyze(text: str) -> list[tuple[str, int]]:
    """Full chain -> list of ``(term, position)``.

    Positions are 0-based token indexes BEFORE stop removal (StopFilter with
    enablePositionIncrements leaves gaps); over-length tokens consume a
    position but emit nothing (StandardTokenizer.java:220-222).
    """
    out: list[tuple[str, int]] = []
    pos = -1
    for m in _SCANNER.finditer(text):
        pos += 1
        tok = m.group(0)
        if len(tok) > MAX_TOKEN_LENGTH:
            continue
        term = tok.lower()
        if term in ENGLISH_STOP_WORDS:
            continue
        out.append((term, pos))
    return out


def analyze_counts(text: str) -> tuple[list[str], list[int], int]:
    """-> ``(unique_terms, tfs, field_length)`` for one document.

    ``field_length`` = number of emitted (post-stop) tokens =
    ``FieldInvertState.getLength()`` (overlap tokens would be discounted per
    `BM25Similarity.java:135-140`; this chain produces none).
    Unique terms are returned in first-occurrence order.
    """
    tf: dict[str, int] = {}
    n = 0
    for m in _SCANNER.finditer(text):
        tok = m.group(0)
        if len(tok) > MAX_TOKEN_LENGTH:
            continue
        term = tok.lower()
        if term in ENGLISH_STOP_WORDS:
            continue
        n += 1
        tf[term] = tf.get(term, 0) + 1
    return list(tf.keys()), list(tf.values()), n


def standard_postings(text: str) -> tuple[dict[str, list[int]], int]:
    """Fused hot path for the index build: full standard chain straight into
    ``{term: [positions]}`` plus the emitted-token count (dl) — identical
    output to aggregating :func:`analyze`, without the per-token tuple and
    generator overhead (this is the inner loop of the tokenize stage)."""
    per: dict[str, list[int]] = {}
    pos = -1
    n = 0
    stop = ENGLISH_STOP_WORDS
    for m in _SCANNER.finditer(text):
        pos += 1
        tok = m.group(0)
        if len(tok) > MAX_TOKEN_LENGTH:
            continue
        term = tok.lower()
        if term in stop:
            continue
        n += 1
        lst = per.get(term)
        if lst is None:
            per[term] = [pos]
        else:
            lst.append(pos)
    return per, n


def simple_postings(text: str) -> tuple[dict[str, list[int]], int]:
    """Fused ``simple``-analyzer counterpart of :func:`standard_postings`."""
    per: dict[str, list[int]] = {}
    pos = -1
    for t in _SIMPLE.findall(text.lower()):
        pos += 1
        lst = per.get(t)
        if lst is None:
            per[t] = [pos]
        else:
            lst.append(pos)
    return per, pos + 1


def simple_tokenize(text: str) -> list[str]:
    """SQL-parity tokenizer: lowercase then runs of ``[a-z0-9]+``.

    Exactly ``unnest(regexp_split_to_array(lower(text),'[^a-z0-9]+'))`` minus
    empty strings in DuckDB — used by the oracle-checked df/ttf/search queries
    so tokenization is identical on both sides of the correctness gate.
    """
    return _SIMPLE.findall(text.lower())
