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


def fuzzy_scan(sorted_terms, word: str, max_edits: int):
    """All (term, distance) with Levenshtein(term, word) <= max_edits from a
    SORTED term iterable, via DP-row reuse across shared prefixes (the poor
    man's Levenshtein automaton: consecutive sorted terms share long
    prefixes, so each term extends the previous term's DP stack instead of
    recomputing from scratch; a row whose minimum exceeds max_edits abandons
    the term early)."""
    W = len(word)
    rows: list[list[int]] = [list(range(W + 1))]
    prev = ""
    out: list[tuple[str, int]] = []
    for t in sorted_terms:
        if abs(len(t) - W) > max_edits:
            # rows still describe `prev`'s prefix — leave them (and prev) be
            continue
        cp = 0
        lim = min(len(t), len(prev), len(rows) - 1)
        while cp < lim and t[cp] == prev[cp]:
            cp += 1
        del rows[cp + 1 :]
        ok = True
        for j in range(cp, len(t)):
            last = rows[-1]
            cur = [last[0] + 1]
            cj = t[j]
            for i in range(1, W + 1):
                cur.append(min(last[i] + 1, cur[i - 1] + 1, last[i - 1] + (cj != word[i - 1])))
            rows.append(cur)
            if min(cur) > max_edits:
                ok = False
                break
        prev = t
        if ok and len(rows) - 1 == len(t) and rows[-1][W] <= max_edits:
            out.append((t, rows[-1][W]))
    return out


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
        w = self.stats.ttf_slice(lo, hi)
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
    asc); the input word itself (distance 0) is never suggested.  The
    dictionary scan shares DP rows across the sorted terms' common prefixes
    (:func:`fuzzy_scan`)."""
    pref = "" if field == "text" else field + FIELD_SEP
    lo, hi = (0, len(stats.terms)) if field == "text" else stats.terms.prefix_range(pref)

    def bodies():
        # streamed: fuzzy_scan iterates once, nothing is materialized (with
        # the sharded dictionary, iter_range holds one shard at a time)
        for t in stats.terms.iter_range(lo, hi):
            if field == "text" and FIELD_SEP in t:
                continue
            yield t[len(pref):]

    cands: list[tuple[int, int, str]] = []
    for t, d in fuzzy_scan(bodies(), word, max_edits):
        if d == 0:
            continue
        # df resolved by binary search only for the few matches
        cands.append((d, -int(stats.df.get(field_term_key(field, t), 0)), t))
    cands.sort()
    return [(t, d, -negdf) for d, negdf, t in cands[:top]]
