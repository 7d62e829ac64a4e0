"""Classic Lucene query-syntax parser (subset) -> query AST.

Recursive-descent re-specification of the classic JavaCC grammar
(`lucene/queryparser/src/java/org/apache/lucene/queryparser/classic/QueryParserBase.java:486-799`
+ ``QueryParser.jj``) covering the surface the fixtures/tests exercise:

* bare terms (analyzed through the same chain as indexing);
* ``field:term`` (keyword fields -> FilterQ, the default text field -> TermQ);
* ``"quoted phrase"`` -> PhraseQ (terms analyzed; stopwords removed);
* ``+required -prohibited`` prefixes and ``AND / OR / NOT`` operators;
* parenthesized groups;
* ``term^2.5`` boosts;
* ``field:[a TO b]`` / ``{a TO b}`` ranges -> RangeQ (doc values) or
  TermRangeQ (analyzed fields);
* Solr local-params dispatch ``{!name k=v ...}rest`` for the ``lucene``,
  ``term``, ``prefix`` and ``frange`` QParserPlugins
  (`solr/core/src/java/org/apache/solr/search/QParserPlugin.java:40-70`;
  `TermQParserPlugin` takes the RAW value with no analysis,
  `FunctionRangeQParserPlugin` takes l/u/incl/incu over a value source).

Default operator is OR (``QueryParserBase.operators`` default), matching the
reference's default ``q.op``.
"""

from __future__ import annotations

import re

from ..stages.tokenize import query_analyzer
from .ast import BoolQ, BoostQ, FilterQ, MatchAllQ, MultiTermQ, PhraseQ, RangeQ, TermQ

_TOKEN_RE = re.compile(
    r"""
    (?P<lparen>\() | (?P<rparen>\)) |
    (?P<and>AND\b) | (?P<or>OR\b) | (?P<not>NOT\b) |
    (?P<plus>\+) | (?P<minus>-) |
    (?P<phrase>"(?P<phrase_body>[^"]*)"(?:~(?P<pslop>\d+))?) |
    (?P<range>(?P<rfield>[A-Za-z_][\w.]*):(?P<lb>[\[{])(?P<lo>[^\s\]}]+)\s+TO\s+(?P<hi>[^\s\]}]+)(?P<rb>[\]}])) |
    (?P<regexq>/(?P<rbody>[^/]+)/) |
    (?P<fuzzy>(?P<fbody>[^\s()^"~+-][^\s()^"~]*)~(?P<fedits>\d)?) |
    (?P<fphrase>(?P<pfield>[A-Za-z_][\w.]*):"(?P<pbody>[^"]*)") |
    (?P<fielded>(?P<field>[A-Za-z_][\w.]*):(?P<fvalue>[^\s()^"]+)) |
    (?P<term>[^\s()^"+-][^\s()^"]*) |
    (?P<boost>\^(?P<bval>\d+(?:\.\d+)?))
    """,
    re.VERBOSE,
)


class QueryParseError(ValueError):
    pass


def _num(v: str):
    try:
        return int(v)
    except ValueError:
        try:
            return float(v)
        except ValueError:
            return v


class QueryParser:
    """``parse(q)`` with a set of keyword (untokenized, StringField-like)
    fields; everything else is analyzed full-text against ``default_field``."""

    def __init__(
        self,
        default_field: str = "text",
        keyword_fields: tuple = ("host", "tld", "lang", "source"),
        text_fields: tuple = ("title",),
        analyzer: str = "standard",
    ):
        self.default_field = default_field
        self.keyword_fields = set(keyword_fields)
        self.text_fields = set(text_fields)  # analyzed fields -> scored TermQ
        self._analyze = query_analyzer(analyzer)  # same chain as the index

    _LOCAL_RE = re.compile(
        r"^\{!(?P<name>[A-Za-z_]\w*)(?P<params>[^}]*)\}(?P<rest>.*)$", re.DOTALL
    )
    _PARAM_RE = re.compile(r"(\w+)=(\"[^\"]*\"|\S+)")

    def parse(self, q: str):
        m = self._LOCAL_RE.match(q.strip())
        if m:
            return self._parse_local(
                m.group("name"),
                {
                    k: v.strip('"')
                    for k, v in self._PARAM_RE.findall(m.group("params"))
                },
                m.group("rest").strip(),
            )
        return self._parse_classic(q)

    def _parse_local(self, name: str, params: dict, rest: str):
        """QParserPlugin dispatch (`QParserPlugin.java:40-70` registry)."""
        if name == "lucene":
            return self._parse_classic(rest)
        if name == "term":
            # TermQParserPlugin: RAW value, no analysis
            f = params.get("f", self.default_field)
            if f in self.keyword_fields:
                return FilterQ(f, rest)
            return TermQ(rest, field=f if f in self.text_fields else self.default_field)
        if name == "prefix":
            f = params.get("f", self.default_field)
            target = f if f in self.text_fields else self.default_field
            return MultiTermQ("prefix", rest, field=target)
        if name == "frange":
            from .ast import FRangeQ

            return FRangeQ(
                self._parse_func(rest),
                lo=float(params["l"]) if "l" in params else None,
                hi=float(params["u"]) if "u" in params else None,
                include_lo=params.get("incl", "true").lower() != "false",
                include_hi=params.get("incu", "true").lower() != "false",
            )
        if name == "complexphrase":
            return self._parse_complexphrase(rest, params)
        if name == "payload_score":
            # PayloadScoreQParserPlugin: f=field func=min|max|average|sum
            # includeSpanScore=bool, v (== rest) analyzed by the payload
            # chain == whitespace+lowercase; single-term subset
            from .ast import PayloadScoreQ

            toks = rest.split()
            if len(toks) != 1:
                raise QueryParseError("{!payload_score} supports one term")
            return PayloadScoreQ(
                toks[0].lower(),
                field=params.get("f", self.default_field),
                func=params.get("func", "max"),
                include_span_score=params.get("includeSpanScore", "false").lower()
                == "true",
            )
        if name == "payload_check":
            # PayloadCheckQParserPlugin: payloads="p1 p2 ..." one float per
            # term of v, exact adjacent-phrase + payload equality
            from .ast import PayloadCheckQ

            terms = tuple(t.lower() for t in rest.split())
            pays = tuple(float(p) for p in params.get("payloads", "").split())
            if len(terms) != len(pays) or not terms:
                raise QueryParseError(
                    "{!payload_check} needs payloads= with one value per term"
                )
            return PayloadCheckQ(
                terms, pays, field=params.get("f", self.default_field)
            )
        raise QueryParseError(f"unknown query parser {{!{name}}}")

    _CPHRASE_RE = re.compile(r'^"(?P<body>[^"]*)"(?:~(?P<slop>\d+))?$')
    _CPHRASE_FUZZY_RE = re.compile(r"^(?P<tok>[^~*?\s]+)~(?P<edits>[012])?$")

    def _parse_complexphrase(self, rest: str, params: dict):
        """ComplexPhraseQParserPlugin subset
        (`solr/core/src/java/org/apache/solr/search/ComplexPhraseQParserPlugin.java`
        over `lucene/queryparser/.../complexPhrase/ComplexPhraseQueryParser.java`):
        wildcard and fuzzy tokens INSIDE a quoted phrase — each becomes a
        SpanMultiQ (SpanMultiTermQueryWrapper), literal tokens SpanTermQ, the
        phrase a SpanNearQ(slop, inOrder).  ``inOrder`` param as in the
        reference (default true)."""
        from .ast import MultiTermQ
        from .spans import SpanMultiQ, SpanNearQ, SpanTermQ

        m = self._CPHRASE_RE.match(rest.strip())
        if not m:
            raise QueryParseError(f"complexphrase expects a quoted phrase, got {rest!r}")
        in_order = params.get("inOrder", "true").lower() != "false"
        slop = int(m.group("slop") or 0)
        clauses: list = []
        for raw in m.group("body").split():
            fz = self._CPHRASE_FUZZY_RE.match(raw)
            if fz:
                # fuzzy-in-phrase ("joh~1 smith"): FuzzyQuery wrapped exactly
                # like the wildcard path (ComplexPhraseQueryParser hands ANY
                # MultiTermQuery to SpanMultiTermQueryWrapper); bare ~ means
                # the FuzzyQuery default maxEdits=2
                max_edits = int(fz.group("edits")) if fz.group("edits") else 2
                mt = MultiTermQ(
                    "fuzzy", fz.group("tok").lower(), field=self.default_field,
                    arg2=max_edits,
                )
                clauses.append(SpanMultiQ(mt, field=self.default_field))
            elif "*" in raw or "?" in raw:
                # wildcards survive analysis untouched except case folding
                # (ComplexPhraseQueryParser passes them to the multiterm
                # path, which matches against lowercased dictionary terms)
                pat = raw.lower()
                if pat.endswith("*") and "*" not in pat[:-1] and "?" not in pat:
                    mt = MultiTermQ("prefix", pat[:-1], field=self.default_field)
                else:
                    mt = MultiTermQ("wildcard", pat, field=self.default_field)
                clauses.append(SpanMultiQ(mt, field=self.default_field))
            else:
                for term, _pos in self._analyze(raw):
                    clauses.append(SpanTermQ(term, field=self.default_field))
        if not clauses:
            return MatchAllQ()
        if len(clauses) == 1:
            return clauses[0]
        return SpanNearQ(tuple(clauses), slop=slop, in_order=in_order,
                         field=self.default_field)

    _FUNC_RE = re.compile(r"^(?:(?P<fn>log|ln|sqrt)\()?(?P<field>[A-Za-z_][\w.]*)\)?$")

    def _parse_func(self, s: str):
        """Minimal value-source parser: ``field`` | ``log|ln|sqrt(field)``
        (the ValueSourceParser subset FunctionQ evaluates)."""
        from .ast import FunctionQ

        m = self._FUNC_RE.match(s.strip())
        if not m:
            raise QueryParseError(f"cannot parse function {s!r}")
        return FunctionQ(m.group("field"), fn=m.group("fn") or "identity")

    def _parse_classic(self, q: str):
        self._toks = self._lex(q)
        self._i = 0
        node = self._parse_query()
        if self._i != len(self._toks):
            raise QueryParseError(f"trailing input at token {self._i}: {self._toks[self._i:]}")
        if node is None:
            return MatchAllQ()
        return node

    # -- lexer ----------------------------------------------------------------

    def _lex(self, q: str):
        out = []
        pos = 0
        if q.strip() in ("", "*", "*:*"):
            return [("matchall", None)]
        while pos < len(q):
            if q[pos].isspace():
                pos += 1
                continue
            m = _TOKEN_RE.match(q, pos)
            if not m:
                raise QueryParseError(f"cannot lex at {pos}: {q[pos:pos+10]!r}")
            kind = m.lastgroup if m.lastgroup in (
                "lparen", "rparen", "and", "or", "not", "plus", "minus") else None
            if kind:
                out.append((kind, None))
            elif m.group("phrase") is not None:
                out.append(("phrase", (m.group("phrase_body"), int(m.group("pslop") or 0))))
            elif m.group("range") is not None:
                out.append(
                    (
                        "range",
                        (
                            m.group("rfield"),
                            _num(m.group("lo")),
                            _num(m.group("hi")),
                            m.group("lb") == "[",
                            m.group("rb") == "]",
                        ),
                    )
                )
            elif m.group("regexq") is not None:
                out.append(("regexq", m.group("rbody")))
            elif m.group("fuzzy") is not None:
                out.append(("fuzzy", (m.group("fbody"), int(m.group("fedits") or 2))))
            elif m.group("fphrase") is not None:
                out.append(("fphrase", (m.group("pfield"), m.group("pbody"))))
            elif m.group("fielded") is not None:
                out.append(("fielded", (m.group("field"), m.group("fvalue"))))
            elif m.group("boost") is not None:
                out.append(("boost", float(m.group("bval"))))
            else:
                out.append(("term", m.group("term")))
            pos = m.end()
        return out

    # -- parser ---------------------------------------------------------------

    def _peek(self):
        return self._toks[self._i] if self._i < len(self._toks) else (None, None)

    _CLAUSE_STARTS = frozenset(
        ("term", "fielded", "phrase", "fphrase", "range", "lparen", "matchall",
         "regexq", "fuzzy")
    )

    def _parse_query(self):
        """``Query ::= (Conjunction? Modifiers? Clause)*`` — ONE FLAT boolean,
        the classic grammar's exact clause-list semantics
        (`QueryParserBase.java:433-481` ``addClause``): ``AND`` promotes the
        PRECEDING clause to MUST (unless prohibited) and makes the next
        clause MUST; under the default OR operator ``OR`` is occur-neutral.
        There is NO operator precedence / nesting in classic
        (that's PrecedenceQueryParser) — ``a AND b OR c`` is ``+a +b c``."""
        clauses: list[list] = []  # [occur, node], document order
        while True:
            kind, _ = self._peek()
            conj_and = False
            if kind == "and":
                conj_and = True
                self._i += 1
                kind, _ = self._peek()
            elif kind == "or":
                # CONJ_OR: occur-neutral under the default OR operator
                # (QueryParserBase.java:444-452 only fires for AND_OPERATOR)
                self._i += 1
                kind, _ = self._peek()
            mods = 0  # 0 none, 1 required (+), -1 prohibited (-/NOT)
            if kind == "plus":
                mods = 1
                self._i += 1
                kind, _ = self._peek()
            elif kind in ("minus", "not"):
                mods = -1
                self._i += 1
                kind, _ = self._peek()
            if kind not in self._CLAUSE_STARTS:
                if conj_and or mods:
                    raise QueryParseError(f"dangling operator before {kind}")
                break
            # AND promotes the preceding clause before the new one is added
            # — even when the new clause analyzes away (addClause runs the
            # promotion before its q == null return)
            if clauses and conj_and and clauses[-1][0] != "must_not":
                clauses[-1][0] = "must"
            node = self._parse_atom()
            if node is None:
                continue  # term filtered away by the analyzer
            prohibited = mods == -1
            required = mods == 1 or (conj_and and not prohibited)
            occur = "must_not" if prohibited else ("must" if required else "should")
            clauses.append([occur, node])

        must = tuple(n for o, n in clauses if o == "must")
        should = tuple(n for o, n in clauses if o == "should")
        must_not = tuple(n for o, n in clauses if o == "must_not")
        if not must and not should and must_not:
            # pure negation: prohibit against all docs (Solr-style -foo)
            return BoolQ(must=(MatchAllQ(),), must_not=must_not)
        if len(must) == 1 and not should and not must_not:
            return must[0]  # single-MUST BooleanQuery rewrites to its clause
        if len(should) == 1 and not must and not must_not:
            return should[0]
        if not must and not should and not must_not:
            return None
        return BoolQ(must=must, should=should, must_not=must_not)

    def _parse_atom(self):
        kind, val = self._peek()
        if kind == "matchall":
            self._i += 1
            return MatchAllQ()
        if kind == "lparen":
            self._i += 1
            node = self._parse_query()
            if self._peek()[0] != "rparen":
                raise QueryParseError("unbalanced parenthesis")
            self._i += 1
            return self._maybe_boost(node)
        if kind == "phrase":
            self._i += 1
            body, slop = val
            terms = tuple(t for t, _ in self._analyze(body))
            if not terms:
                return None
            node = PhraseQ(terms, slop=slop) if len(terms) > 1 else TermQ(terms[0])
            return self._maybe_boost(node)
        if kind == "fphrase":
            # field-scoped phrase: keyword fields take the raw quoted value as
            # one term (StringField semantics); text fields get an analyzed
            # field-routed phrase (QueryParserBase.getFieldQuery with quoted=true)
            self._i += 1
            f, body = val
            if f in self.keyword_fields:
                return self._maybe_boost(FilterQ(f, body))
            terms = tuple(t for t, _ in self._analyze(body))
            if not terms:
                return None
            target = f if f in self.text_fields else self.default_field
            node = (
                PhraseQ(terms, field=target)
                if len(terms) > 1
                else TermQ(terms[0], field=target)
            )
            return self._maybe_boost(node)
        if kind == "regexq":
            self._i += 1
            return MultiTermQ("regexp", val.lower())
        if kind == "fuzzy":
            self._i += 1
            body, edits = val
            return MultiTermQ("fuzzy", body.lower(), arg2=edits)
        if kind == "range":
            self._i += 1
            f, lo, hi, inc_lo, inc_hi = val
            lo = None if lo == "*" else lo
            hi = None if hi == "*" else hi
            if f in self.text_fields or f == self.default_field:
                # a range on an ANALYZED field is a TermRangeQuery over the
                # dictionary; endpoints lowercased (lowercaseExpandedTerms
                # default, `QueryParserBase.getRangeQuery`)
                from .ast import TermRangeQ

                return TermRangeQ(
                    None if lo is None else str(lo).lower(),
                    None if hi is None else str(hi).lower(),
                    field=f, include_lo=inc_lo, include_hi=inc_hi,
                )
            return RangeQ(f, lo, hi, inc_lo, inc_hi)
        if kind == "fielded":
            self._i += 1
            f, v = val
            if f in self.keyword_fields:
                return self._maybe_boost(FilterQ(f, v))
            terms = [t for t, _ in self._analyze(v)]
            if not terms:
                return None
            target = f if f in self.text_fields else self.default_field
            node = (
                TermQ(terms[0], field=target)
                if len(terms) == 1
                # UNQUOTED multi-token analysis -> SHOULD boolean, not a
                # phrase (autoGeneratePhraseQueries defaults FALSE since 3.1;
                # `QueryBuilder.java` createFieldQuery !quoted branch,
                # occur = SHOULD under the default OR operator)
                else BoolQ(should=tuple(TermQ(t, field=target) for t in terms))
            )
            return self._maybe_boost(node)
        if kind == "term":
            self._i += 1
            if "*" in val or "?" in val:
                # wildcard terms are lowercased but NOT analyzed
                # (QueryParserBase.getWildcardQuery / lowercase_expanded_terms)
                w = val.lower()
                if w.endswith("*") and "*" not in w[:-1] and "?" not in w:
                    return self._maybe_boost(MultiTermQ("prefix", w[:-1]))
                return self._maybe_boost(MultiTermQ("wildcard", w))
            terms = [t for t, _ in self._analyze(val)]
            if not terms:
                return None  # pure stopword — dropped like an empty clause
            node = (
                TermQ(terms[0])
                if len(terms) == 1
                # see the fielded branch: unquoted multi-token -> SHOULD bool
                else BoolQ(should=tuple(TermQ(t) for t in terms))
            )
            return self._maybe_boost(node)
        raise QueryParseError(f"unexpected token {kind}")

    def _maybe_boost(self, node):
        if self._peek()[0] == "boost":
            _, b = self._toks[self._i]
            self._i += 1
            if isinstance(node, (TermQ, PhraseQ)):
                node = type(node)(**{**node.__dict__, "boost": b})
            elif node is not None:
                # any other clause type: explicit boost wrapper (BoostQuery)
                node = BoostQ(node, b)
        return node
