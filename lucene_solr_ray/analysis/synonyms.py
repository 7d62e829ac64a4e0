"""Query-time multi-word synonym handling (graph semantics).

Behavioral re-specification (NOT a port) of the reference synonym stack:

* rule syntax — ``SolrSynonymParser.java:1-120``: ``a, b, c`` equivalence
  lines (with ``expand=true`` every member maps to the whole class) and
  ``a b => x, y`` explicit-mapping lines (matched input REPLACED by the
  outputs, original not kept);
* matching — ``analysis/synonym/SynonymFilter.java:93-107``: greedy
  LONGEST-only match over the token stream ("bigger mappings win"),
  non-overlapping, scanning resumes after the matched input;
* query construction — Solr ``sow=false`` behavior
  (``ExtendedDismaxQParser`` + ``QueryBuilder.analyzeGraphBoolean``): the
  whole query string runs through the analyzer as ONE stream (so multi-word
  inputs can match across whitespace), each matched segment becomes an OR
  group of its alternatives, multi-token alternatives as exact phrases.

The AST produced uses only gate-verified primitives (TermQ / PhraseQ /
BoolQ), so the whole expansion is SQL-replayable: term -> ``list_contains``
over the simple tokenization, phrase -> the positional regexp the
``search_phrase`` oracle uses.
"""

from __future__ import annotations

from ..stages.tokenize import query_analyzer


class SynonymMap:
    """rules: input token tuple -> list of output token tuples (the input
    itself included when the rule keeps the original)."""

    def __init__(self, rules: dict[tuple[str, ...], list[tuple[str, ...]]]):
        self.rules = rules
        self.max_len = max((len(k) for k in rules), default=0)

    @classmethod
    def parse(cls, lines, analyzer: str = "simple", expand: bool = True) -> "SynonymMap":
        """Solr synonyms.txt syntax; both sides run through *analyzer* so
        index- and query-side normalization can never diverge
        (`SolrSynonymParser.analyze`)."""
        an = query_analyzer(analyzer)

        def norm(phrase: str) -> tuple[str, ...]:
            return tuple(t for t, _ in an(phrase))

        rules: dict[tuple[str, ...], list[tuple[str, ...]]] = {}
        for raw in lines:
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            if "=>" in line:
                lhs, rhs = line.split("=>", 1)
                outputs = [norm(p) for p in rhs.split(",")]
                outputs = [o for o in outputs if o]
                for inp in (norm(p) for p in lhs.split(",")):
                    if inp:
                        rules.setdefault(inp, []).extend(
                            o for o in outputs if o not in rules.get(inp, [])
                        )
            else:
                members = [m for m in (norm(p) for p in line.split(",")) if m]
                if expand:
                    # every member maps to the whole class (itself included)
                    for m in members:
                        rules.setdefault(m, []).extend(
                            o for o in members if o not in rules.get(m, [])
                        )
                elif members:
                    # expand=false: all members collapse to the first
                    for m in members:
                        if members[0] not in rules.get(m, []):
                            rules.setdefault(m, []).append(members[0])
        return cls(rules)

    def segments(self, tokens: list[str]) -> list[tuple[tuple[str, ...], list[tuple[str, ...]]]]:
        """Greedy longest-only scan -> [(matched_input, alternatives)];
        unmatched tokens come back as ((token,), []) passthrough segments."""
        out = []
        i, n = 0, len(tokens)
        while i < n:
            match = None
            for L in range(min(self.max_len, n - i), 0, -1):
                cand = tuple(tokens[i : i + L])
                if cand in self.rules:
                    match = cand
                    break
            if match is None:
                out.append(((tokens[i],), []))
                i += 1
            else:
                out.append((match, list(self.rules[match])))
                i += len(match)
        return out


def _seq_query(seq: tuple[str, ...], field: str):
    from ..query.ast import PhraseQ, TermQ

    if len(seq) == 1:
        return TermQ(seq[0], field=field)
    return PhraseQ(seq, field=field)


def expand_synonyms(text: str, syn: SynonymMap, *, analyzer: str = "simple",
                    field: str = "text", op: str = "or"):
    """Analyze *text* as one stream (sow=false), apply greedy synonym
    matching, build the boolean AST: each segment is an OR group of its
    alternatives (the matched input included only for equivalence rules,
    matching SynonymFilter's keepOrig semantics); segments combine with
    *op* ("or" = default q.op, "and" = q.op=AND)."""
    from ..query.ast import BoolQ, MatchAllQ

    tokens = [t for t, _ in query_analyzer(analyzer)(text)]
    if not tokens:
        return MatchAllQ()
    clauses = []
    for inp, alts in syn.segments(tokens):
        if not alts:
            clauses.append(_seq_query(inp, field))
            continue
        qs = tuple(_seq_query(a, field) for a in alts)
        clauses.append(qs[0] if len(qs) == 1 else BoolQ(should=qs))
    if len(clauses) == 1:
        return clauses[0]
    if op == "and":
        return BoolQ(must=tuple(clauses))
    return BoolQ(should=tuple(clauses))
