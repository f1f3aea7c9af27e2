"""Surround query parser — the queryparser/surround module.

Reference: lucene/queryparser/src/java/org/apache/lucene/queryparser/
surround/parser/QueryParser.jj (grammar) and
surround/query/{DistanceQuery,OrQuery,AndQuery,NotQuery,
SimpleTerm}.java: span-oriented proximity language with BOTH infix
(``aa 3W bb``) and prefix (``3W(aa, bb, cc)``) notation:

* ``W`` / ``nW``  — ordered distance n (default 1): the operands must
  appear in order within n positions -> SpanNear slop = n - 1
  (DistanceQuery.getSpanNearQuery passes opDistance - 1).
* ``N`` / ``nN``  — same, unordered.
* ``AND`` / ``OR`` / ``NOT`` — boolean composition (infix, left
  associative, case-insensitive; also prefix ``AND(a, b, c)``).
* ``*`` / ``?``   — truncated terms, usable INSIDE distance ops
  (the reference expands them against the index via
  SimpleTerm.MatchingTermVisitor; here they ride the same budgeted
  termdict expansion as ComplexPhraseQuery).
* ``^f``          — boost suffix on any primary.

Precedence (loosest to tightest): OR, AND, NOT, distance ops —
matching the .jj production nesting (OrQuery > AndQuery > NotQuery >
NQuery > WQuery > primary).

Distance queries compile to the engine's ComplexPhraseQuery IR, so
multi-term operands expand through ONE pushed-down termdict probe per
slot and the match runs in the span kernels — identical machinery,
one more front-end.  Like the reference's span translation, distance
groups are constant-score clauses.
"""

from __future__ import annotations

import re

from . import queries as Q

__all__ = ["SurroundParser", "parse_surround"]

_TOK = re.compile(
    r"\s*(?:(?P<lparen>\()|(?P<rparen>\))|(?P<comma>,)"
    r"|(?P<boost>\^\d+(?:\.\d+)?)"
    r"|(?P<word>[^\s(),^]+))"
)


class SurroundParser:
    """parser = SurroundParser(analyzer); parser.parse(s) -> Query."""

    def __init__(self, analyzer: str = "simple",
                 max_expansions: int = 32):
        self.analyzer = analyzer
        self.max_expansions = max_expansions

    # ---- lexer ----

    def _lex(self, s: str):
        out, pos = [], 0
        while pos < len(s):
            m = _TOK.match(s, pos)
            if not m or m.end() == pos:
                if s[pos:].strip():
                    raise ValueError(f"cannot lex {s[pos:]!r}")
                break
            pos = m.end()
            out.append((m.lastgroup, m.group().strip()))
        return out

    # ---- helpers ----

    @staticmethod
    def _dist_op(text: str):
        m = re.fullmatch(r"(\d*)([WwNn])", text)
        if not m:
            return None
        n = int(m.group(1) or 1)
        if n < 1:
            raise ValueError(f"distance must be >= 1 in {text!r}")
        return n, m.group(2).upper() == "W"

    def _analyze(self, t: str) -> str:
        from ..functions.analysis import tokenize_text

        parts = tokenize_text(t, self.analyzer)
        return parts[0] if parts else t.lower()

    def _primary_term(self, w: str):
        """word -> str | multi-term Query (truncated)."""
        if "*" in w or "?" in w:
            lowered = w.lower()
            if (lowered.endswith("*") and "*" not in lowered[:-1]
                    and "?" not in lowered):
                return Q.PrefixQuery(lowered[:-1])
            return Q.WildcardQuery(lowered)
        return self._analyze(w)

    @staticmethod
    def _as_slot(q):
        """A parsed sub-expression -> one ComplexPhraseQuery slot
        (tuple of alternatives).  Only term-level operands and OR
        groups of them may appear inside a distance op — the same
        restriction the reference enforces per SrndQuery subtree."""
        if isinstance(q, (str, Q.PrefixQuery, Q.WildcardQuery)):
            return (q,)
        if isinstance(q, Q.TermQuery):
            return (q.term,)
        if isinstance(q, tuple):  # OR group of term-level operands
            return q
        raise ValueError(
            "distance operands must be terms, truncations, or OR "
            f"groups of them, got {q!r}"
        )

    def _finish(self, q):
        """Leaf/or-group marker -> engine Query."""
        if isinstance(q, str):
            return Q.TermQuery(q)
        if isinstance(q, (Q.PrefixQuery, Q.WildcardQuery)):
            return q  # standalone truncation: the multi-term rewrite applies
        if isinstance(q, tuple):
            b = Q.Builder()
            for a in q:
                b.add(self._finish(a), Q.Occur.SHOULD)
            return b.build()
        return q

    # ---- recursive descent (infix + prefix notation) ----

    def parse(self, s: str) -> Q.Query:
        toks = self._lex(s)
        q, rest = self._or(toks)
        if rest:
            raise ValueError(f"trailing input {rest!r}")
        return self._finish(q)

    def _or(self, toks):
        left, toks = self._and(toks)
        alts = [left]
        while toks and toks[0][0] == "word" and toks[0][1].upper() == "OR":
            right, toks = self._and(toks[1:])
            alts.append(right)
        if len(alts) == 1:
            return left, toks
        # an OR of pure term-level operands stays a slot-able group
        if all(isinstance(a, (str, Q.PrefixQuery, Q.WildcardQuery, tuple))
               for a in alts):
            flat = []
            for a in alts:
                flat.extend(a if isinstance(a, tuple) else (a,))
            return tuple(flat), toks
        b = Q.Builder()
        for a in alts:
            b.add(self._finish(a), Q.Occur.SHOULD)
        return b.build(), toks

    def _and(self, toks):
        left, toks = self._not(toks)
        parts = [left]
        while toks and toks[0][0] == "word" and toks[0][1].upper() == "AND":
            right, toks = self._not(toks[1:])
            parts.append(right)
        if len(parts) == 1:
            return left, toks
        b = Q.Builder()
        for p in parts:
            b.add(self._finish(p), Q.Occur.MUST)
        return b.build(), toks

    def _not(self, toks):
        left, toks = self._dist(toks)
        excl = []
        while toks and toks[0][0] == "word" and toks[0][1].upper() == "NOT":
            right, toks = self._dist(toks[1:])
            excl.append(right)
        if not excl:
            return left, toks
        b = Q.Builder()
        b.add(self._finish(left), Q.Occur.MUST)
        for e in excl:
            b.add(self._finish(e), Q.Occur.MUST_NOT)
        return b.build(), toks

    def _dist(self, toks):
        left, toks = self._primary(toks)
        slots = [left]
        op = None
        while toks and toks[0][0] == "word" and (
            d := self._dist_op(toks[0][1])
        ) is not None:
            if op is not None and d != op:
                raise ValueError(
                    "mixed distance operators need parentheses"
                )
            op = d
            right, toks = self._primary(toks[1:])
            slots.append(right)
        if op is None:
            return left, toks
        n, ordered = op
        return Q.ComplexPhraseQuery(
            tuple(self._as_slot(s) for s in slots),
            slop=n - 1, in_order=ordered,
            max_multi_term_expansions=self.max_expansions,
        ), toks

    def _primary(self, toks):
        if not toks:
            raise ValueError("unexpected end of query")
        kind, text = toks[0]
        if kind == "lparen":
            q, toks = self._or(toks[1:])
            if not toks or toks[0][0] != "rparen":
                raise ValueError("missing ')'")
            return self._boosted(q, toks[1:])
        if kind != "word":
            raise ValueError(f"unexpected {text!r}")
        up = text.upper()
        if up in ("AND", "OR", "NOT") or self._dist_op(text) is not None:
            # prefix notation: OP(a, b, c)
            if len(toks) > 1 and toks[1][0] == "lparen":
                args, rest = self._args(toks[2:])
                if up == "AND":
                    b = Q.Builder()
                    for a in args:
                        b.add(self._finish(a), Q.Occur.MUST)
                    return self._boosted(b.build(), rest)
                if up == "OR":
                    if all(isinstance(a, (str, Q.PrefixQuery,
                                          Q.WildcardQuery, tuple))
                           for a in args):
                        flat = []
                        for a in args:
                            flat.extend(a if isinstance(a, tuple) else (a,))
                        return self._boosted(tuple(flat), rest)
                    b = Q.Builder()
                    for a in args:
                        b.add(self._finish(a), Q.Occur.SHOULD)
                    return self._boosted(b.build(), rest)
                if up == "NOT":
                    if len(args) < 2:
                        raise ValueError("NOT(...) needs >= 2 args")
                    b = Q.Builder()
                    b.add(self._finish(args[0]), Q.Occur.MUST)
                    for e in args[1:]:
                        b.add(self._finish(e), Q.Occur.MUST_NOT)
                    return self._boosted(b.build(), rest)
                n, ordered = self._dist_op(text)
                if len(args) < 2:
                    raise ValueError(f"{text}(...) needs >= 2 args")
                return self._boosted(
                    Q.ComplexPhraseQuery(
                        tuple(self._as_slot(a) for a in args),
                        slop=n - 1, in_order=ordered,
                        max_multi_term_expansions=self.max_expansions,
                    ),
                    rest,
                )
            raise ValueError(f"operator {text!r} needs operands")
        return self._boosted(self._primary_term(text), toks[1:])

    def _args(self, toks):
        args = []
        while True:
            a, toks = self._or(toks)
            args.append(a)
            if toks and toks[0][0] == "comma":
                toks = toks[1:]
                continue
            if toks and toks[0][0] == "rparen":
                return args, toks[1:]
            raise ValueError("expected ',' or ')' in operator args")

    def _boosted(self, q, toks):
        if toks and toks[0][0] == "boost":
            boost = float(toks[0][1][1:])
            return Q.BoostQuery(self._finish(q), boost), toks[1:]
        return q, toks


def parse_surround(s: str, analyzer: str = "simple") -> Q.Query:
    return SurroundParser(analyzer).parse(s)
