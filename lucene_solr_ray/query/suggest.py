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


_HI = b"\xff\xff\xff\xff"  # > any UTF-8 byte: upper bound of a prefix block


def fuzzy_seek(terms, word: str, max_edits: int, *, field: str = "text"):
    """All (body, distance) of ``field`` with Levenshtein <= max_edits, via a
    DP-GUIDED SEEK over the sorted dictionary — the
    `LevenshteinAutomata.java` ∩ BlockTree ``intersect()`` analog
    (`lucene/core/src/java/org/apache/lucene/search/FuzzyTermsEnum.java`)
    without building the automaton: whenever a prefix's DP row minimum
    exceeds ``max_edits``, NO term sharing that prefix can match, so the scan
    ``lower_bound``-seeks past the whole prefix block.  Visited terms ~ the
    automaton frontier, not O(vocab); never materializes the vocabulary.

    ``terms`` is a sorted dictionary view (``SortedStrings`` /
    ``ShardedStringsView``): ``[i] -> str``, ``lower_bound(bytes) -> int``,
    ``prefix_range(str)``, ``len``."""
    if field == "text":
        pref, lo, hi = "", 0, len(terms)
    else:
        pref = field + FIELD_SEP
        lo, hi = terms.prefix_range(pref)
    W = len(word)
    rows: list[list[int]] = [list(range(W + 1))]
    prev = ""
    out: list[tuple[str, int]] = []
    i = lo
    while i < hi:
        t = terms[i]
        body = t[len(pref):]
        if field == "text" and FIELD_SEP in body:
            # an interleaved `other_field\x1f` block: seek past all of it
            sep = body.index(FIELD_SEP)
            i = max(i + 1, terms.lower_bound(body[: sep + 1].encode("utf-8") + _HI))
            continue
        # shared-prefix DP reuse (rows[0..cp] already describe body[:cp])
        cp = 0
        lim = min(len(body), len(prev), len(rows) - 1)
        while cp < lim and body[cp] == prev[cp]:
            cp += 1
        del rows[cp + 1 :]
        abandoned = -1
        for j in range(cp, len(body)):
            last = rows[-1]
            cur = [last[0] + 1]
            cj = body[j]
            for k in range(1, W + 1):
                cur.append(min(last[k] + 1, cur[k - 1] + 1, last[k - 1] + (cj != word[k - 1])))
            rows.append(cur)
            if min(cur) > max_edits:
                abandoned = j
                break
        prev = body[: len(rows) - 1]
        if abandoned >= 0:
            # no term extending body[:abandoned+1] can ever match: skip block
            blk = (pref + body[: abandoned + 1]).encode("utf-8")
            i = max(i + 1, terms.lower_bound(blk + _HI))
            continue
        if rows[-1][W] <= max_edits:
            out.append((body, rows[-1][W]))
        i += 1
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
    asc); the input word itself (distance 0) is never suggested.  Shares the
    DP-guided seek scan with FuzzyQuery (:func:`fuzzy_seek`) — visited terms
    ~ automaton frontier, not O(vocab)."""
    cands: list[tuple[int, int, str]] = []
    for t, d in fuzzy_seek(stats.terms, word, max_edits, field=field):
        if d == 0:
            continue
        # df resolved by binary search only for the few matches
        cands.append((d, -int(stats.df.get(field_term_key(field, t), 0)), t))
    cands.sort()
    return [(t, d, -negdf) for d, negdf, t in cands[:top]]


def spellcheck_collate(stats, words, *, field: str = "text", max_edits: int = 2) -> list[str]:
    """SpellCheckCollator analog
    (`solr/core/src/java/org/apache/solr/spelling/SpellCheckCollator.java:60-140`):
    substitute the TOP-1 suggestion for every query term missing from the
    dictionary (df == 0), keep in-dictionary terms verbatim, and return the
    collated term list; the caller re-runs the collation as one query and
    reports its hit count, which is exactly how the reference verifies
    candidate collations (re-query with substituted terms, keep those with
    hits)."""
    out = []
    for w in words:
        if stats.df.get(field_term_key(field, w), 0) > 0:
            out.append(w)
            continue
        sug = spellcheck(stats, w, field=field, max_edits=max_edits, top=1)
        out.append(sug[0][0] if sug else w)
    return out


def fuzzy_suggest(stats, q: str, *, field: str = "text", max_edits: int = 1,
                  non_fuzzy_prefix: int = 1, min_fuzzy_length: int = 3,
                  top: int = 10) -> list[tuple[str, int]]:
    """FuzzySuggester analog
    (`lucene/suggest/src/java/org/apache/lucene/search/suggest/analyzing/FuzzySuggester.java:54-110`):
    completions whose analyzed form starts with the query's first
    ``non_fuzzy_prefix`` chars exactly and has SOME PREFIX of the remainder
    within ``max_edits`` Damerau (transpositions=true, the reference
    default) edits of the query remainder — the Levenshtein-automaton
    ⋂ suggest-FST intersection, where automaton-final states accept every
    completion.  A query shorter than ``min_fuzzy_length`` allows no edits
    (`FuzzySuggester.java:93` DEFAULT_MIN_FUZZY_LENGTH) and degrades to
    exact prefix completion.  Ranked (weight desc, term asc), weight = ttf
    — the AnalyzingSuggester ordering.

    The scan is a DP-GUIDED SEEK over the non-fuzzy prefix's sorted range —
    the :func:`fuzzy_seek` shape with two extra moves the prefix-accept
    semantics enables: (a) when a dictionary prefix's DP row reaches
    ``row[W] <= max_edits``, EVERY term extending it matches
    (automaton-final states accept all completions), so the whole accept
    block is consumed at once with a vectorized weight top-N; (b) when the
    row minimum exceeds ``max_edits`` no extension can ever match
    (row minima are non-decreasing) and the block is ``lower_bound``-seeked
    past.  DP rows are reused across the sorted terms' shared prefixes, so
    visited terms ~ the automaton frontier, not O(prefix range).  At web
    vocabulary the seek rides the same mmapped shard scan as
    :func:`fuzzy_seek`."""
    me = max_edits if len(q) >= min_fuzzy_length else 0
    pref = q[:non_fuzzy_prefix]
    q_rest = q[non_fuzzy_prefix:]
    W = len(q_rest)
    key_pref = field_term_key(field, pref)
    terms = stats.terms
    lo, hi = terms.prefix_range(key_pref)
    if lo >= hi:
        return []
    strip = len(key_pref) - len(pref)

    def _interval_top(i0: int, i1: int) -> list[tuple[int, str]]:
        # top-`top` of one ACCEPTED dictionary interval by (weight desc,
        # term asc): weights come vectorized from the ttf column; term
        # strings resolve lazily, only for the winners (dict order == term
        # asc within the interval, so the arange tiebreak is exact)
        w = stats.ttf_slice(i0, i1)
        order = np.lexsort((np.arange(len(w)), -w))
        got: list[tuple[int, str]] = []
        for oi in order.tolist():
            body = terms[i0 + oi][strip:]
            if FIELD_SEP in body:  # another field's interleaved key block
                continue
            got.append((-int(w[oi]), body))
            if len(got) >= top:
                break
        return got

    matches: list[tuple[int, str]] = []  # (-weight, body)
    if W <= me:
        # empty remainder is already within distance: the whole range is
        # one accept block (exact prefix completion when me == 0)
        matches = _interval_top(lo, hi)
    else:
        rows: list[list[int]] = [list(range(W + 1))]
        prev = ""
        i = lo
        while i < hi:
            t_full = terms[i]
            body = t_full[strip:]
            fs = body.find(FIELD_SEP)
            if fs >= 0:
                # interleaved `other_field\x1f` key block: seek past it
                blk = t_full[: strip + fs + 1].encode("utf-8")
                i = max(i + 1, terms.lower_bound(blk + _HI))
                continue
            t_rest = body[len(pref):]
            # shared-prefix DP reuse (rows[0..cp] already describe
            # t_rest[:cp]); every retained row has row[W] > me (else its
            # term accepted and the block was consumed) and min <= me
            # (else the block was abandoned), so no re-check is needed
            cp = 0
            lim = min(len(t_rest), len(prev), len(rows) - 1)
            while cp < lim and t_rest[cp] == prev[cp]:
                cp += 1
            del rows[cp + 1:]
            accepted = abandoned = -1
            for j in range(cp, len(t_rest)):
                last = rows[-1]
                cj = t_rest[j]
                cur = [last[0] + 1]
                for k in range(1, W + 1):
                    c = min(last[k] + 1, cur[k - 1] + 1,
                            last[k - 1] + (cj != q_rest[k - 1]))
                    if (j >= 1 and k >= 2 and cj == q_rest[k - 2]
                            and t_rest[j - 1] == q_rest[k - 1]):
                        c = min(c, rows[j - 1][k - 2] + 1)
                    cur.append(c)
                rows.append(cur)
                if cur[W] <= me:
                    accepted = j
                    break
                if min(cur) > me:
                    abandoned = j
                    break
            prev = t_rest[: len(rows) - 1]
            if accepted >= 0:
                blk = t_full[: strip + len(pref) + accepted + 1].encode("utf-8")
                end = min(max(i + 1, terms.lower_bound(blk + _HI)), hi)
                matches.extend(_interval_top(i, end))
                i = end
                continue
            if abandoned >= 0:
                blk = t_full[: strip + len(pref) + abandoned + 1].encode("utf-8")
                i = max(i + 1, terms.lower_bound(blk + _HI))
                continue
            i += 1  # full term consumed with no accepting prefix: no match
        matches.sort()
    return [(t, -negw) for negw, t in matches[:top]]


def spellcheck_collations(stats, words, verify, *, field: str = "text",
                          max_edits: int = 2, top_per_term: int = 5,
                          max_tries: int = 10, max_collations: int = 2):
    """Multi-collation search — the full SpellCheckCollator contract
    (`solr/core/src/java/org/apache/solr/spelling/SpellCheckCollator.java:66-185`
    with ``maxCollationTries`` > 0): instead of substituting only the top-1
    suggestion per misspelled term, enumerate CORRECTION COMBINATIONS the way
    `spelling/PossibilityIterator.java:200-258` does — an odometer over the
    per-term ranked suggestion lists (last term's index advancing fastest),
    each combination ranked by the SUM of its per-term suggestion indices,
    tried in (rank asc, generation-index asc) order — and VERIFY each against
    the index by re-running the collated query (`SpellCheckCollator.java:95-164`:
    tryNo counts every verification, a collation is kept iff its re-query
    hits > 0, the loop stops at ``max_tries`` tries or ``max_collations``
    kept collations, whichever first).

    ``verify(corrected_words) -> int`` re-runs the collation (the caller
    preserves the original query structure, e.g. a phrase stays a phrase —
    `getCollation`'s in-place token replacement).  In-dictionary words pass
    through verbatim and take no part in the enumeration.  Returns the TRIED
    sequence, in try order: ``[{try_no, rank, collation(list[str]), hits,
    kept}]`` — the kept collations are the ``kept == 1`` rows.
    """
    fixed: list[str | None] = []  # verbatim word, or None -> misspelled slot
    cand_lists: list[list[str]] = []
    for w in words:
        if stats.df.get(field_term_key(field, w), 0) > 0:
            fixed.append(w)
        else:
            sugs = [t for t, _d, _df in
                    spellcheck(stats, w, field=field, max_edits=max_edits,
                               top=top_per_term)]
            fixed.append(None)
            cand_lists.append(sugs if sugs else [w])  # no suggestion: keep
    if not cand_lists:
        hits = int(verify(list(words)))
        return [{"try_no": 0, "rank": 0, "collation": list(words),
                 "hits": hits, "kept": int(hits > 0)}]
    # Odometer enumeration, LAZY in (rank asc, generation asc) order.  The
    # odometer (last slot advancing fastest) emits index tuples in
    # lexicographic order, so generation order == lex order, and the
    # (rank, gen) try order is exactly "for each rank r ascending, all
    # tuples summing to r in lex order".  Enumerating that directly costs
    # O(tries x n_slots) instead of the full cross-product (10 misspelled
    # terms at top_per_term=5 would otherwise sort 5^10 tuples on the
    # driver before applying the 10-try cap).
    sizes = [len(c) for c in cand_lists]
    suffix_max = [0] * (len(sizes) + 1)
    for p in range(len(sizes) - 1, -1, -1):
        suffix_max[p] = suffix_max[p + 1] + sizes[p] - 1

    def _lex_sum(pos: int, r: int, prefix: tuple[int, ...]):
        if pos == len(sizes):
            if r == 0:
                yield prefix
            return
        for i in range(min(sizes[pos] - 1, r) + 1):
            if r - i <= suffix_max[pos + 1]:
                yield from _lex_sum(pos + 1, r - i, prefix + (i,))

    def _ranked():
        for r in range(suffix_max[0] + 1):
            for tup in _lex_sum(0, r, ()):
                yield r, tup

    out = []
    try_no = 0
    kept_n = 0
    for rank, choice in _ranked():
        if try_no >= max_tries or kept_n >= max_collations:
            break
        corrected: list[str] = []
        ci = 0
        for f in fixed:
            if f is not None:
                corrected.append(f)
            else:
                corrected.append(cand_lists[ci][choice[ci]])
                ci += 1
        hits = int(verify(corrected))
        kept = int(hits > 0)
        out.append({"try_no": try_no, "rank": rank, "collation": corrected,
                    "hits": hits, "kept": kept})
        try_no += 1
        kept_n += kept
    return out


def infix_suggest(stats, sub: str, *, field: str = "text", top: int = 10) -> list[tuple[str, int]]:
    """AnalyzingInfixSuggester analog
    (`lucene/suggest/src/java/org/apache/lucene/search/suggest/analyzing/AnalyzingInfixSuggester.java`):
    terms CONTAINING ``sub``, ordered (weight desc, term asc) with
    weight = ttf.  Infix matching cannot be range-bounded, so this is a
    STREAMED full-dictionary scan — one shard resident at a time
    (``GlobalStats.term_chunks``), matching vectorized per shard with
    ``pc.match_substring``; the running top-N is merged per chunk.  (The
    reference builds a dedicated infix Lucene index; at web vocab the analog
    is a persisted ngram->term auxiliary table — documented trade.)"""
    import pyarrow as pa
    import pyarrow.compute as pc

    key_pref = field_term_key(field, "")
    strip = len(key_pref)
    best: list[tuple[int, str]] = []  # (-weight, term) merged per chunk
    for arr, ttf, _lo in stats.term_chunks(field):
        # slice the `field\x1f` key prefix off BEFORE matching, so a
        # substring occurring in the field NAME can never match (mirrors
        # prefix_terms' key stripping; ADVICE round-3 fix)
        bodies = pc.utf8_slice_codeunits(arr, strip) if strip else arr
        mask = pc.match_substring(bodies, sub)
        if field == "text":
            # exclude other fields' interleaved `field\x1fterm` keys
            mask = pc.and_(mask, pc.invert(pc.match_substring(arr, FIELD_SEP)))
        sel = np.asarray(mask, dtype=bool)
        if not sel.any():
            continue
        idx = np.flatnonzero(sel)
        terms = bodies.take(pa.array(idx))
        for t, w in zip(terms.to_pylist(), ttf[idx].tolist()):
            best.append((-int(w), t))
        best.sort()
        del best[top:]
    return [(t, -nw) for nw, t in best]
