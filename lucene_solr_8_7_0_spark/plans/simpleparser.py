"""SimpleQueryParser — the queryparser/simple surface.

Re-derives lucene/queryparser/src/java/org/apache/lucene/queryparser/
simple/SimpleQueryParser.java: the end-user-safe dialect whose defining
property is that it NEVER throws — any malformed operator sequence
degrades to literal text instead of a syntax error (SimpleQueryParser
class javadoc: "will never throw an exception, and will interpret any
errors as literal text").

Syntax (all features enabled, the reference's default flag set):

* whitespace-separated clauses join with the DEFAULT operator
  (``default_operator``, SHOULD like the reference default),
* ``+`` joins the adjacent clauses as MUST (AND) — higher precedence
  than ``|`` (OR), matching the reference's parse order,
* ``-term`` negates one clause (MUST_NOT prefix),
* ``"quoted phrase"`` with optional ``~N`` slop,
* ``term*`` prefix query; ``term~N`` fuzzy (default edits 2),
* ``( ... )`` grouping,
* ``\\`` escapes the next character.

Degradation rules (the never-throw contract): an unmatched ``)`` is
dropped; an unmatched ``(`` opens a group that ends at end-of-string;
an unclosed quote runs to end-of-string; bare operators with nothing
to combine are dropped.  Analysis runs through the same analyzer chain
as the index build (functions/analysis.tokenize_text).
"""

from __future__ import annotations

from ..functions.analysis import tokenize_text
from . import queries as Q

__all__ = ["SimpleQueryParser"]


class SimpleQueryParser:
    def __init__(self, default_field: str = "content",
                 analyzer: str = "simple",
                 default_operator: Q.Occur = Q.Occur.SHOULD):
        self.default_field = default_field
        self.analyzer = analyzer
        self.default_operator = default_operator

    # ---- lexer: yields ('op', ch) | ('term', text) | ('phrase', (text, slop))
    def _lex(self, s: str):
        toks = []
        i, n = 0, len(s)
        buf = []

        def flush():
            if buf:
                toks.append(("term", "".join(buf)))
                buf.clear()

        while i < n:
            c = s[i]
            if c == "\\" and i + 1 < n:  # escape: next char is literal
                buf.append(s[i + 1])
                i += 2
                continue
            if c.isspace():
                flush()
                i += 1
                continue
            if c in "+|()-":
                # '-' inside a word (mid-token) is literal, like the
                # reference's tokenization of hyphenated terms
                if c == "-" and buf:
                    buf.append(c)
                    i += 1
                    continue
                flush()
                toks.append(("op", c))
                i += 1
                continue
            if c == '"':
                flush()
                j = s.find('"', i + 1)
                if j == -1:  # unclosed quote: runs to end of string
                    body, i = s[i + 1:], n
                else:
                    body, i = s[i + 1:j], j + 1
                slop = 0
                if i < n and s[i] == "~":  # "..."~N
                    k = i + 1
                    while k < n and s[k].isdigit():
                        k += 1
                    if k > i + 1:
                        slop, i = int(s[i + 1:k]), k
                toks.append(("phrase", (body, slop)))
                continue
            buf.append(c)
            i += 1
        flush()
        return toks

    # ---- parser ----

    def parse(self, s: str) -> Q.Query:
        toks = self._lex(s or "")
        q, _ = self._parse_or(toks, 0, depth=0)
        return q if q is not None else Q.MatchNoDocsQuery()

    def _parse_or(self, toks, i, depth):
        groups, i = [], i
        while True:
            g, i = self._parse_and(toks, i, depth)
            if g is not None:
                groups.append(g)
            if i < len(toks) and toks[i] == ("op", "|"):
                i += 1
                continue
            break
        if not groups:
            return None, i
        if len(groups) == 1:
            return groups[0], i
        return Q.BooleanQuery(tuple(
            Q.BooleanClause(Q.Occur.SHOULD, g) for g in groups
        )), i

    def _parse_and(self, toks, i, depth):
        # clauses at this level: (occur, query); '+' upgrades BOTH
        # neighbours to MUST (SimpleQueryParser.java consumeToken AND
        # handling); juxtaposition applies the default operator
        clauses: list = []
        pending_and = False
        while i < len(toks):
            kind, val = toks[i]
            if kind == "op" and val == "|":
                break
            if kind == "op" and val == ")":
                if depth:
                    break
                i += 1  # stray ')' at top level: dropped (never-throw)
                continue
            if kind == "op" and val == "+":
                if clauses:
                    pending_and = True
                i += 1
                continue
            neg = False
            if kind == "op" and val == "-":
                i += 1
                if i >= len(toks):
                    break
                neg = True
                kind, val = toks[i]
            if kind == "op" and val == "(":
                sub, i = self._parse_or(toks, i + 1, depth + 1)
                if i < len(toks) and toks[i] == ("op", ")"):
                    i += 1
                q = sub
            elif kind == "phrase":
                q = self._phrase(*val)
                i += 1
            elif kind == "term":
                q = self._term(val)
                i += 1
            else:  # bare +, -, ( handled above; anything else: skip
                i += 1
                continue
            if q is None:
                pending_and = pending_and and bool(clauses)
                continue
            occur = Q.Occur.MUST_NOT if neg else self.default_operator
            if pending_and and not neg:
                occur = Q.Occur.MUST
                if clauses and clauses[-1][0] is Q.Occur.SHOULD:
                    clauses[-1] = (Q.Occur.MUST, clauses[-1][1])
            pending_and = False
            clauses.append((occur, q))
        if not clauses:
            return None, i
        if len(clauses) == 1 and clauses[0][0] is not Q.Occur.MUST_NOT:
            return clauses[0][1], i
        if all(o is Q.Occur.MUST_NOT for o, _ in clauses):
            # pure negation matches nothing (reference: a query with
            # only prohibited clauses returns no documents)
            return Q.BooleanQuery(tuple(
                Q.BooleanClause(o, q) for o, q in clauses
            )), i
        return Q.BooleanQuery(tuple(
            Q.BooleanClause(o, q) for o, q in clauses
        )), i

    # ---- leaf builders ----

    def _term(self, text: str):
        fuzzy = None
        if "~" in text[1:]:
            base, _, tail = text.rpartition("~")
            if tail == "" or tail.isdigit():
                fuzzy = int(tail) if tail else 2
                text = base
        if text.endswith("*") and len(text) > 1 and fuzzy is None:
            toks = tokenize_text(text[:-1], self.analyzer)
            return Q.PrefixQuery(toks[-1]) if toks else None
        toks = tokenize_text(text, self.analyzer)
        if not toks:
            return None
        if fuzzy is not None:
            return Q.FuzzyQuery(toks[-1], max_edits=min(fuzzy, 2))
        if len(toks) == 1:
            return Q.TermQuery(toks[0])
        # one input word analyzing to several tokens forms a phrase
        return Q.PhraseQuery(tuple(toks))

    def _phrase(self, body: str, slop: int):
        toks = tokenize_text(body, self.analyzer)
        if not toks:
            return None
        if len(toks) == 1:
            return Q.TermQuery(toks[0])
        return Q.PhraseQuery(tuple(toks), slop=slop)
