"""Extended DisMax (edismax) query parser.

Re-specification of the user-facing surface of
`solr/core/src/java/org/apache/solr/search/ExtendedDismaxQParser.java` (+
``DisMaxQParser.java``): a lenient user query is decomposed into clauses,
each scored as a DisjunctionMax over the ``qf`` field/boost list, with

* ``qf``  — (field, boost) pairs; every term/phrase clause becomes
  ``DisMaxQ(TermQ(t, field, boost) per qf, tiebreak=tie)``;
* ``mm``  — minimum-should-match for the optional clauses (int or "N%");
* ``pf``  — phrase-boost fields: the WHOLE query as a phrase on each pf
  field, added as an optional boosted clause (``pf``/``pf2`` family);
* ``tie`` — DisjunctionMax tiebreaker;
* ``bf``  — additive boost functions (`DisMaxQParser.java` ``getBoostFunctions``):
  each FunctionQ is appended as a pure optional clause, so its float32 value
  adds to every matching doc's score via ReqOptSumScorer — it never gates
  matching and never counts toward mm;
* ``bq``  — additive boost QUERIES (`DisMaxQParser.java` ``getBoostQueries``):
  arbitrary query ASTs appended as optional clauses exactly like ``bf``
  (score adds where they match, never gate, never count toward mm);
* ``boost`` — multiplicative boost functions
  (`ExtendedDismaxQParser.java` ``getMultiplicativeBoosts`` / BoostedQuery):
  the whole query is wrapped in BoostedQ per function;
* ``+`` / ``-`` prefixes and quoted phrases as in the classic parser.

The output is an ordinary AST (BoolQ/DisMaxQ/TermQ/PhraseQ/BoostQ), so the
same evaluator/oracle machinery scores it.
"""

from __future__ import annotations

import re

from ..stages.tokenize import query_analyzer
from .ast import BoolQ, BoostQ, BoostedQ, DisMaxQ, FunctionQ, MatchAllQ, PhraseQ, TermQ

_CLAUSE_RE = re.compile(r'([+-]?)(?:"([^"]*)"|(\S+))')


class EDisMaxParser:
    def __init__(
        self,
        qf: tuple = (("text", 1.0),),
        pf: tuple = (),
        tie: float = 0.0,
        mm: int | str = 0,
        analyzer: str = "standard",
        bf: tuple = (),
        boost: tuple = (),
        bq: tuple = (),
    ):
        self.qf = tuple(qf)
        self.pf = tuple(pf)
        self.tie = float(tie)
        self.mm = mm
        self.bf = tuple(bf)        # FunctionQ instances, additive
        self.boost = tuple(boost)  # FunctionQ instances, multiplicative
        self.bq = tuple(bq)        # query ASTs, additive (getBoostQueries)
        self._analyze = query_analyzer(analyzer)

    def _field_clauses(self, terms: tuple, is_phrase: bool):
        out = []
        for f, boost in self.qf:
            if is_phrase and len(terms) > 1:
                out.append(PhraseQ(terms, field=f, boost=boost))
            else:
                out.append(TermQ(terms[0], field=f, boost=boost))
        return tuple(out)

    def _resolve_mm(self, n_should: int) -> int:
        mm = self.mm
        if isinstance(mm, str) and mm.endswith("%"):
            return int(n_should * int(mm[:-1]) / 100)
        return int(mm)

    def parse(self, q: str):
        if q.strip() in ("", "*", "*:*"):
            return MatchAllQ()
        must, must_not, should = [], [], []
        all_terms: list[str] = []
        for sign, phrase, word in _CLAUSE_RE.findall(q):
            body = phrase if phrase else word
            terms = tuple(t for t, _ in self._analyze(body))
            if not terms:
                continue
            if sign != "-":
                all_terms.extend(terms)
            node = self._dismax(self._field_clauses(terms, is_phrase=bool(phrase)))
            if sign == "+":
                must.append(node)
            elif sign == "-":
                must_not.append(node)
            else:
                should.append(node)
        # pf: whole-query phrase boost per phrase field — attached OUTSIDE
        # the mm-bearing query (the reference adds phrase boosts to an outer
        # BooleanQuery around the main dismax, `ExtendedDismaxQParser`
        # addShingledPhraseQueries: they add score where they match but never
        # count toward mm; keeping them inside would admit a doc matching the
        # phrase on a pf field NOT in qf with fewer than mm term matches)
        phrase_boosts: list = []
        if len(all_terms) > 1:
            for f, boost in self.pf:
                phrase_boosts.append(BoostQ(PhraseQ(tuple(all_terms), field=f), boost))
        # mm applies to the optional clauses independently of any '+' required
        # clauses (the reference scopes minimum-should-match to SHOULD only;
        # BoolQ's evaluator does the same, so no special-casing on `must`).
        msm = self._resolve_mm(len(should))
        if not must and not should and must_not:
            out = BoolQ(must=(MatchAllQ(),), must_not=tuple(must_not))
        elif len(should) == 1 and not must and not must_not:
            out = should[0]
        elif len(must) == 1 and not should and not must_not:
            out = must[0]
        else:
            out = BoolQ(
                must=tuple(must),
                should=tuple(should),
                must_not=tuple(must_not),
                minimum_should_match=msm,
            )
        if phrase_boosts or self.bf or self.bq:
            # `+(user query) (pf) (bq) (bf)` (DisMaxQParser.getBoostQueries /
            # getBoostFunctions + the pf phrase boosts above): the base query
            # keeps its own mm internally; these clauses are optional on top,
            # so they add score via ReqOptSumScorer but never gate matching
            # and never count toward mm
            out = BoolQ(
                must=(out,),
                should=tuple(phrase_boosts) + tuple(self.bq) + tuple(self.bf),
            )
        for fq in self.boost:
            out = BoostedQ(out, fq)
        return out

    def _dismax(self, clauses: tuple):
        if len(clauses) == 1:
            return clauses[0]
        return DisMaxQ(clauses, tiebreak=self.tie)
