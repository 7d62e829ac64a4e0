"""CJK bigram analysis chain (CJKAnalyzer shape).

Executable re-specification of the reference chain
``StandardTokenizer -> CJKWidthFilter -> LowerCaseFilter -> CJKBigramFilter
-> StopFilter``
(`lucene/analysis/common/src/java/org/apache/lucene/analysis/cjk/CJKAnalyzer.java:60-74`).

* :func:`cjk_width_fold` — ``CJKWidthFilter.java``: fullwidth ASCII variants
  (U+FF01–U+FF5E) fold to their Basic Latin forms; halfwidth Katakana
  variants (U+FF66–U+FF9F) fold to Katakana, composing dakuten/handakuten
  marks (NFKC covers exactly these two mappings for this block).
* :func:`cjk_bigram` — ``CJKBigramFilter.java`` with the analyzer defaults
  (HAN | HIRAGANA | KATAKANA | HANGUL bigrammed, ``outputUnigrams=false``):
  characters of consecutive CJK-typed tokens are buffered and emitted as
  overlapping character bigrams ("DOUBLE" tokens); a lone CJK character
  with no CJK neighbour is emitted as-is ("SINGLE"); non-CJK tokens pass
  through unchanged.  Stream adjacency (not byte adjacency) joins runs,
  exactly as the reference filter buffers consecutive tokens.

Positions: each emitted token consumes one position and removed stopwords
leave gaps — the same enablePositionIncrements contract as the standard
chain, so phrase queries over bigrams match consecutive bigrams.
"""

from __future__ import annotations

import unicodedata

from .tokenizer import ENGLISH_STOP_WORDS, MAX_TOKEN_LENGTH, standard_tokenize

__all__ = ["cjk_width_fold", "cjk_bigram", "cjk_analyze", "CJK_TYPES"]

CJK_TYPES = frozenset({"IDEOGRAPHIC", "HIRAGANA", "KATAKANA", "HANGUL"})

# Halfwidth and Fullwidth Forms block — the only range CJKWidthFilter maps
_WIDTH_LO, _WIDTH_HI = 0xFF01, 0xFFEF


def cjk_width_fold(text: str) -> str:
    """Fold the Halfwidth/Fullwidth Forms block via NFKC; other characters
    are untouched (CJKWidthFilter maps only this block)."""
    if not any(_WIDTH_LO <= ord(c) <= _WIDTH_HI for c in text):
        return text
    out = []
    run: list[str] = []
    for c in text:
        if _WIDTH_LO <= ord(c) <= _WIDTH_HI:
            run.append(c)
        else:
            if run:
                out.append(unicodedata.normalize("NFKC", "".join(run)))
                run = []
            out.append(c)
    if run:
        out.append(unicodedata.normalize("NFKC", "".join(run)))
    return "".join(out)


def cjk_bigram(tokens):
    """``[(tok, type)] -> [(term, type)]`` per CJKBigramFilter defaults.

    Consecutive CJK-typed tokens pool their characters; runs of length >= 2
    emit overlapping bigrams (type DOUBLE), a lone character emits itself
    (type SINGLE).  Non-CJK tokens pass through with their original type.
    """
    out: list[tuple[str, str]] = []
    buf: list[str] = []

    def flush():
        if not buf:
            return
        if len(buf) == 1:
            out.append((buf[0], "SINGLE"))
        else:
            for i in range(len(buf) - 1):
                out.append((buf[i] + buf[i + 1], "DOUBLE"))
        buf.clear()

    for tok, ttype in tokens:
        if ttype in CJK_TYPES:
            buf.extend(tok)  # KATAKANA/HANGUL runs contribute every char
        else:
            flush()
            out.append((tok, ttype))
    flush()
    return out


def cjk_analyze(text: str) -> list[tuple[str, int]]:
    """Full CJK chain -> ``(term, position)`` list.

    Width fold -> standard scan -> lowercase -> bigram -> stop removal.
    Over-length non-CJK tokens are dropped but consume a position, as in
    the standard chain; bigrams are always length 2 so never over-length.
    """
    folded = cjk_width_fold(text)
    stream = []
    for tok, ttype in standard_tokenize(folded):
        if ttype in CJK_TYPES:
            stream.append((tok, ttype))
        else:
            stream.append((tok.lower(), ttype))
    out: list[tuple[str, int]] = []
    pos = -1
    for term, ttype in cjk_bigram(stream):
        pos += 1
        if ttype not in ("DOUBLE", "SINGLE"):
            if len(term) > MAX_TOKEN_LENGTH:
                continue
            if term in ENGLISH_STOP_WORDS:
                continue
        out.append((term, pos))
    return out
