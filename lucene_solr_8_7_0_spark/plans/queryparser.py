"""Classic query parser — the queryparser/classic surface.

Re-derives the behavior of QueryParserBase + QueryParser.jj
(lucene/queryparser/src/java/org/apache/lucene/queryparser/classic/
QueryParserBase.java:105, QueryParser.jj grammar) for the syntax a
user actually types:

* terms, ``"quoted phrases"`` with ``~slop``, ``term~`` / ``term~N``
  fuzzy, ``prefix*``, ``wild*card?``, ``/regexp/``,
* ``+must`` / ``-must_not`` / ``NOT`` prefixes, ``AND`` / ``OR`` /
  ``&&`` / ``||`` connectors (default operator OR, like the
  reference's default),
* ``( grouping )`` with ``^boost`` on any clause,
* ``field:term`` — keyword metadata fields compile to FieldTermQuery
  (StringField equality); the default field (``content``/``text``)
  falls through to term queries,
* ``field:[a TO b]`` / ``field:{a TO b}`` ranges — numeric bounds on a
  metadata field compile to PointRangeQuery (inclusive/exclusive per
  bracket, ``*`` = open end); an un-fielded or default-field range is
  a TermRangeQuery over the term dictionary.

AND/OR semantics follow the classic parser (QueryParser.jj Conjunction
production): ``a AND b`` requires both (the AND retroactively upgrades
the left clause to MUST), ``a OR b`` leaves both optional, an explicit
``+``/``-`` prefix always wins.  Analysis: terms are lowercased with
the same analyzer the index was built with (caller passes it).
"""

from __future__ import annotations

import re

from . import queries as Q

__all__ = ["QueryParser", "parse"]

_TOKEN_RE = re.compile(
    r"""
    (?P<lparen>\() | (?P<rparen>\)) |
    (?P<boost>\^[0-9.]+) |
    (?P<prefix>[+-]) |
    (?P<phrase>(?:[\w.]+:)?"[^"]*"(?:~\d+)?) |
    (?P<range>(?:[\w.]+:)?[\[{][^\]}]*[\]}]) |
    (?P<regexp>(?:[\w.]+:)?/[^/]*/) |
    (?P<word>[^\s()^]+)
    """,
    re.VERBOSE | re.UNICODE,
)


class QueryParser:
    """parser = QueryParser(default_field, analyzer); parser.parse(s)

    ``synonyms``: optional term -> [alternatives] map applied to plain
    term clauses — the SynonymGraphFilter surface (analysis/common
    synonym/SynonymGraphFilter.java): a term with synonyms becomes a
    SynonymQuery over the group, scored with blended statistics
    exactly as the reference produces for single-token synonyms at a
    position."""

    def __init__(self, default_field: str = "content", analyzer: str = "simple",
                 numeric_fields: tuple[str, ...] = ("length",),
                 synonyms: dict[str, list[str]] | None = None):
        self.default_field = default_field
        self.analyzer = analyzer
        self.numeric_fields = set(numeric_fields)
        self.synonyms = synonyms or {}

    # ---- lexer ----

    def _lex(self, s: str) -> list[tuple[str, str]]:
        out = []
        for m in _TOKEN_RE.finditer(s):
            kind = m.lastgroup
            out.append((kind, m.group()))
        return out

    # ---- parser ----

    def parse(self, s: str) -> Q.Query:
        if s.count('"') % 2:
            # QueryParserBase raises ParseException on an unterminated
            # quote (QueryParser.jj <QUOTED> token); without this check
            # the dangling quote lexes as part of a plain word and
            # silently becomes a wrong term/equality query
            raise ValueError(f"malformed phrase (unterminated quote?): {s!r}")
        toks = self._lex(s)
        q, rest = self._parse_query(toks)
        return q

    def _parse_query(self, toks) -> tuple[Q.Query, list]:
        clauses: list[list] = []  # [occur, query] — occur mutable for AND upgrade
        pending = None  # occur forced by a connector/prefix for the NEXT clause
        while toks:
            kind, text = toks[0]
            if kind == "rparen":
                break
            toks = toks[1:]
            if kind == "word" and text in ("AND", "&&"):
                # classic Conjunction: upgrade the PREVIOUS clause to
                # required unless it was explicitly prohibited
                if clauses and clauses[-1][0] == Q.Occur.SHOULD:
                    clauses[-1][0] = Q.Occur.MUST
                pending = Q.Occur.MUST
                continue
            if kind == "word" and text in ("OR", "||"):
                pending = Q.Occur.SHOULD
                continue
            if kind == "word" and text == "NOT":
                pending = Q.Occur.MUST_NOT
                continue
            if kind == "prefix":
                pending = Q.Occur.MUST if text == "+" else Q.Occur.MUST_NOT
                continue
            if kind == "boost":
                # dangling boost (after a clause): applies to the last
                if clauses:
                    clauses[-1][1] = Q.BoostQuery(
                        clauses[-1][1], float(text[1:])
                    )
                continue
            if kind == "lparen":
                sub, toks = self._parse_query(toks)
                if toks and toks[0][0] == "rparen":
                    toks = toks[1:]
                q = sub
            else:
                q = self._parse_clause(kind, text)
            # boost directly after the clause
            if toks and toks[0][0] == "boost":
                q = Q.BoostQuery(q, float(toks[0][1][1:]))
                toks = toks[1:]
            occur = pending if pending is not None else Q.Occur.SHOULD
            pending = None
            if not isinstance(q, Q.MatchNoDocsQuery) or occur != Q.Occur.SHOULD:
                clauses.append([occur, q])
        if not clauses:
            return Q.MatchNoDocsQuery("empty query string"), toks
        if len(clauses) == 1 and clauses[0][0] in (Q.Occur.SHOULD, Q.Occur.MUST):
            return clauses[0][1], toks
        b = Q.Builder()
        for occur, q in clauses:
            b.add(q, occur)
        return b.build(), toks

    def _split_field(self, text: str) -> tuple[str | None, str]:
        m = re.match(r"([\w.]+):(.*)", text, re.DOTALL)
        if m and m.group(2):
            f = m.group(1)
            if f in (self.default_field, "text"):
                return None, m.group(2)
            return f, m.group(2)
        return None, text

    def _analyze_term(self, t: str) -> str:
        from ..functions.analysis import tokenize_text

        parts = tokenize_text(t, self.analyzer)
        return parts[0] if parts else t.lower()

    def _parse_clause(self, kind: str, text: str) -> Q.Query:
        field, body = self._split_field(text)
        if kind == "phrase":
            m = re.match(r'"([^"]*)"(?:~(\d+))?$', body)
            if m is None:
                # e.g. lang:"unclosed — QueryParserBase raises ParseException
                # on an unterminated quote; surface the parser's own error
                # family rather than an AttributeError on the failed match
                raise ValueError(f"malformed phrase (unterminated quote?): {text}")
            if field is not None:
                # fielded phrase: metadata fields are keyword
                # (StringField) fields, whose analyzer keeps the whole
                # value as ONE un-analyzed token — the classic parser's
                # field:"..." therefore compiles to exact equality on
                # the raw quoted text (QueryParserBase.getFieldQuery
                # with a KeywordAnalyzer field), never a silent
                # default-field phrase
                return Q.FieldTermQuery(field, m.group(1))
            words, slop = m.group(1).split(), int(m.group(2) or 0)
            from ..functions.analysis import tokenize_text

            terms = [w for t in words for w in tokenize_text(t, self.analyzer)]
            if not terms:
                return Q.MatchNoDocsQuery("empty phrase")
            if len(terms) == 1:
                return Q.TermQuery(terms[0])
            return Q.PhraseQuery(tuple(terms), slop=slop)
        if kind == "range":
            inc_lo, inc_hi = body[0] == "[", body[-1] == "]"
            m = re.match(r".(.*?)\s+TO\s+(.*?).$", body, re.IGNORECASE)
            if not m:
                raise ValueError(f"malformed range: {text}")
            lo = None if m.group(1) == "*" else m.group(1)
            hi = None if m.group(2) == "*" else m.group(2)
            if field is not None and field in self.numeric_fields:
                return Q.PointRangeQuery(
                    field,
                    None if lo is None else float(lo),
                    None if hi is None else float(hi),
                    include_lower=inc_lo, include_upper=inc_hi,
                )
            if field is not None:
                raise ValueError(
                    f"range on non-numeric field {field!r} is not supported"
                )
            return Q.TermRangeQuery(
                None if lo is None else self._analyze_term(lo),
                None if hi is None else self._analyze_term(hi),
                include_lower=inc_lo, include_upper=inc_hi,
            )
        if kind == "regexp":
            if field is not None:
                # regexp over a keyword metadata field is not part of
                # the engine's query algebra — fail loudly (same policy
                # as the non-numeric-range error above) instead of
                # silently matching against the default field
                raise ValueError(
                    f"regexp on non-default field {field!r} is not supported"
                )
            return Q.RegexpQuery(body[1:-1])
        # word: fuzzy / wildcard / prefix / plain term
        if field is not None:
            if field in self.numeric_fields:
                v = float(body)
                return Q.PointRangeQuery(field, v, v)
            return Q.FieldTermQuery(field, body)
        m = re.match(r"(.*?)~(\d*)$", body)
        if m and m.group(1):
            base = self._analyze_term(m.group(1))
            edits = int(m.group(2)) if m.group(2) else 2
            if edits == 0:
                return Q.TermQuery(base)
            return Q.FuzzyQuery(base, max_edits=min(edits, 2))
        if "*" in body or "?" in body:
            lowered = body.lower()
            if (
                lowered.endswith("*")
                and "*" not in lowered[:-1]
                and "?" not in lowered
            ):
                return Q.PrefixQuery(lowered[:-1])
            return Q.WildcardQuery(lowered)
        t = self._analyze_term(body)
        syns = self.synonyms.get(t)
        if syns:
            from ..functions.analysis import tokenize_text

            paths = [
                tuple(tokenize_text(s, self.analyzer)) or (s.lower(),)
                for s in syns
            ]
            if any(len(p) > 1 for p in paths):
                # MULTI-WORD synonym -> the graph side-path shape
                # (QueryBuilder.analyzeGraphBoolean:539-588 with
                # GraphTokenStreamFiniteStrings side paths): every
                # finite string becomes its own query — single tokens
                # TermQuery, multi-token paths PhraseQuery (the
                # autoGenerateMultiTermSynonymsPhraseQuery=true form,
                # QueryBuilder.java:341 / createSpanQuery's ordered
                # slop-0 contract :371) — combined SHOULD
                # (newGraphSynonymQuery :714-724).
                b = Q.Builder()
                b.add(Q.TermQuery(t), Q.Occur.SHOULD)
                seen = {(t,)}
                for p in paths:
                    if p in seen:
                        continue
                    seen.add(p)
                    if len(p) == 1:
                        b.add(Q.TermQuery(p[0]), Q.Occur.SHOULD)
                    else:
                        b.add(Q.PhraseQuery(p, slop=0), Q.Occur.SHOULD)
                return b.build()
            group = tuple(dict.fromkeys([t, *(p[0] for p in paths)]))
            return Q.SynonymQuery(group)
        return Q.TermQuery(t)


def parse(s: str, default_field: str = "content",
          analyzer: str = "simple") -> Q.Query:
    return QueryParser(default_field, analyzer).parse(s)


class ComplexPhraseQueryParser(QueryParser):
    """queryparser/complexPhrase/ComplexPhraseQueryParser.java:60-99:
    the classic grammar, except quoted phrases may embed wildcards,
    prefixes, fuzzy terms, and parenthesized alternative groups —
    '"(john jon jonath*) peters*"~2' — compiled to the span IR
    (ComplexPhraseQuery; the reference re-parses the phrase body and
    rewrites it to a SpanNearQuery, :224-335).  ``in_order`` mirrors
    setInOrder (:83).  Out of scope, loudly: ranges and negation
    INSIDE a phrase (the reference's SpanNot tail), nested groups."""

    def __init__(self, *args, in_order: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self.in_order = in_order

    def _phrase_member(self, w: str):
        """One phrase-body primitive -> str | multi-term Query (the
        same classification the classic word clause performs)."""
        m = re.match(r"(.*?)~(\d*)$", w)
        if m and m.group(1):
            edits = int(m.group(2)) if m.group(2) else 2
            base = self._analyze_term(m.group(1))
            if edits == 0:
                return base
            return Q.FuzzyQuery(base, max_edits=min(edits, 2))
        if "*" in w or "?" in w:
            lowered = w.lower()
            if (
                lowered.endswith("*")
                and "*" not in lowered[:-1]
                and "?" not in lowered
            ):
                return Q.PrefixQuery(lowered[:-1])
            return Q.WildcardQuery(lowered)
        if "(" in w or ")" in w or "[" in w or "]" in w:
            raise ValueError(
                f"unsupported phrase element {w!r} (nested groups and "
                "ranges inside a complex phrase are out of scope)"
            )
        return self._analyze_term(w)

    def _parse_clause(self, kind: str, text: str) -> Q.Query:
        field, body = self._split_field(text)
        if kind != "phrase" or field is not None:
            # fielded phrases keep the classic keyword-equality rule
            return super()._parse_clause(kind, text)
        m = re.match(r'"([^"]*)"(?:~(\d+))?$', body)
        if m is None:
            raise ValueError(f"malformed phrase (unterminated quote?): {text}")
        content, slop = m.group(1), int(m.group(2) or 0)
        slots = []
        for tok in re.finditer(r"\(([^()]*)\)|\S+", content):
            if tok.group(1) is not None:
                alts = tuple(
                    self._phrase_member(w) for w in tok.group(1).split()
                )
                if not alts:
                    raise ValueError("empty group in phrase")
            else:
                alts = (self._phrase_member(tok.group()),)
            slots.append(alts)
        if not slots:
            return Q.MatchNoDocsQuery("empty phrase")
        if len(slots) == 1 and len(slots[0]) == 1 and isinstance(
            slots[0][0], str
        ):
            return Q.TermQuery(slots[0][0])
        return Q.ComplexPhraseQuery(
            tuple(slots), slop=slop, in_order=self.in_order
        )
