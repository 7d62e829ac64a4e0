"""Suggesters + spellcheck over the global term dictionary.

Re-specification of the user-visible behavior of
`lucene/suggest/src/java/org/apache/lucene/search/suggest/analyzing/
AnalyzingSuggester.java` (prefix completion weighted by a corpus statistic)
and `lucene/suggest/src/java/org/apache/lucene/search/spell/
DirectSpellChecker.java` (dictionary-driven corrections ranked by edit
distance then popularity) — built directly on the engine's sorted-array
term dictionary:

* prefix suggestions are a SORTED RANGE SCAN (no vocabulary scan) + a
  vectorized top-N over the ttf weights in that range;
* spellcheck scans the dictionary with the banded-DP early-exit edit
  distance (the FST/automaton intersection of the reference is the
  documented scale follow-up), ranking (distance asc, df desc, term asc).
"""

from __future__ import annotations

import numpy as np

from ..stages.tokenize import FIELD_SEP, field_term_key
from .ast import _edit_distance_le


class PrefixSuggester:
    """Weighted prefix completion over one field's terms (weight = ttf)."""

    def __init__(self, stats, field: str = "text"):
        self.stats = stats
        self.field = field

    def suggest(self, prefix: str, top: int = 10) -> list[tuple[str, int]]:
        key_pref = field_term_key(self.field, prefix)
        lo, hi = self.stats.terms.prefix_range(key_pref)
        if lo >= hi:
            return []
        w = self.stats._ttf[lo:hi]
        strip = len(key_pref) - len(prefix)
        order = np.lexsort((np.arange(len(w)), -w))  # weight desc, term asc
        out = []
        for oi in order.tolist():
            t = self.stats.terms[lo + oi]
            body = t[strip:]
            if FIELD_SEP in body:  # a longer field prefix sharing the range
                continue
            out.append((body, int(w[oi])))
            if len(out) >= top:
                break
        return out


def spellcheck(stats, word: str, *, field: str = "text", max_edits: int = 2,
               top: int = 5) -> list[tuple[str, int, int]]:
    """-> [(suggestion, distance, df)] ranked (distance asc, df desc, term
    asc); the input word itself (distance 0) is never suggested."""
    cands: list[tuple[int, int, str]] = []
    pref = "" if field == "text" else field + FIELD_SEP
    lo, hi = (0, len(stats.terms)) if field == "text" else stats.terms.prefix_range(pref)
    for i in range(lo, hi):
        t = stats.terms[i]
        body = t[len(pref):]
        if field == "text" and FIELD_SEP in t:
            continue
        if abs(len(body) - len(word)) > max_edits:
            continue
        if not _edit_distance_le(body, word, max_edits):
            continue
        # exact distance (bounded, small strings)
        d = _exact_distance(body, word, max_edits)
        if d == 0:
            continue
        cands.append((d, -int(stats._df[i]), body))
    cands.sort()
    return [(t, d, -negdf) for d, negdf, t in cands[:top]]


def _exact_distance(a: str, b: str, cap: int) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]
