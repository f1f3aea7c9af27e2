"""Function-query parser — Solr's ValueSource expression dialect.

Reference: solr/core/src/java/org/apache/solr/search/
ValueSourceParser.java (the registry of named function parsers:
linear :188, recip :197, div :216, map :241, sum :276, product :285,
sub :294, sqrt :475, log = LOG BASE 10 :487-491, ln :493, pow :577,
max :595, min :602, abs :253, field :427) and the valuesource
implementations in lucene/queries/src/java/org/apache/lucene/queries/
function/valuesource/ (e.g. ReciprocalFloatFunction.java:68
``a/(m*x + b)``, LinearFloatFunction.java:36 ``m*x + c``).

``parse_func(expr)`` compiles one expression string into a Spark
Column over docmeta columns plus the set of referenced fields —
the whole function evaluates inside whole-stage codegen, per
candidate document, exactly where the reference evaluates its
per-doc FunctionValues.  Grammar: float literals, bare field names,
``field(name)``, and the nested function calls above.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

__all__ = ["parse_func"]

_NAME = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_NUM = re.compile(r"-?(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE]-?[0-9]+)?")


class _P:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def _ws(self):
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def _eat(self, ch: str):
        self._ws()
        if self.i >= len(self.s) or self.s[self.i] != ch:
            raise ValueError(
                f"function query: expected {ch!r} at {self.i} in {self.s!r}"
            )
        self.i += 1

    def expr(self) -> tuple[Column, set]:
        self._ws()
        m = _NUM.match(self.s, self.i)
        if m and not _NAME.match(self.s, self.i):
            self.i = m.end()
            return F.lit(float(m.group())), set()
        m = _NAME.match(self.s, self.i)
        if not m:
            raise ValueError(
                f"function query: bad token at {self.i} in {self.s!r}"
            )
        name = m.group()
        self.i = m.end()
        self._ws()
        if self.i < len(self.s) and self.s[self.i] == "(":
            return self._call(name.lower())
        # bare field reference
        return F.col(name).cast("double"), {name}

    def _args(self, n_min: int, n_max: int) -> list[tuple[Column, set]]:
        self._eat("(")
        out = [self.expr()]
        self._ws()
        while self.i < len(self.s) and self.s[self.i] == ",":
            self.i += 1
            out.append(self.expr())
            self._ws()
        self._eat(")")
        if not (n_min <= len(out) <= n_max):
            raise ValueError(
                f"function query: wrong arity {len(out)} in {self.s!r}"
            )
        return out

    def _call(self, fn: str) -> tuple[Column, set]:
        if fn == "field":
            # field(name): positional identifier, not a sub-expression
            self._eat("(")
            self._ws()
            m = _NAME.match(self.s, self.i)
            if not m:
                raise ValueError(f"field(): bad name in {self.s!r}")
            self.i = m.end()
            self._eat(")")
            return F.col(m.group()).cast("double"), {m.group()}
        if fn == "map":
            args = self._args(4, 5)
            x, mn, mx, tgt = (a[0] for a in args[:4])
            dflt = args[4][0] if len(args) == 5 else x
            fields = set().union(*(a[1] for a in args))
            return (
                F.when((x >= mn) & (x <= mx), tgt).otherwise(dflt),
                fields,
            )
        simple = {
            "sum": lambda a: _fold(a, lambda x, y: x + y),
            "product": lambda a: _fold(a, lambda x, y: x * y),
            "mul": lambda a: _fold(a, lambda x, y: x * y),
            "sub": lambda a: a[0] - a[1],
            "div": lambda a: _jdiv(a[0], a[1]),
            "mod": lambda a: F.when(a[1] != 0.0, a[0] % a[1])
                              .otherwise(F.lit(float("nan"))),
            "abs": lambda a: F.abs(a[0]),
            "sqrt": lambda a: F.sqrt(a[0]),
            "log": lambda a: F.log10(a[0]),
            "ln": lambda a: F.log(a[0]),
            "pow": lambda a: F.pow(a[0], a[1]),
            "max": lambda a: F.greatest(*a),
            "min": lambda a: F.least(*a),
            "linear": lambda a: a[1] * a[0] + a[2],
            "recip": lambda a: _jdiv(a[2], a[1] * a[0] + a[3]),
        }
        arity = {
            "sub": (2, 2), "div": (2, 2), "mod": (2, 2), "pow": (2, 2),
            "abs": (1, 1), "sqrt": (1, 1), "log": (1, 1), "ln": (1, 1),
            "linear": (3, 3), "recip": (4, 4),
            "sum": (1, 16), "product": (1, 16), "mul": (1, 16),
            "max": (2, 16), "min": (2, 16),
        }
        if fn not in simple:
            raise ValueError(f"function query: unknown function {fn!r}")
        args = self._args(*arity[fn])
        cols = [a[0] for a in args]
        fields = set().union(*(a[1] for a in args))
        return simple[fn](cols), fields


def _jdiv(x: Column, y: Column) -> Column:
    """Java double division (the reference's DivFloatFunction /
    ReciprocalFloatFunction evaluate in IEEE float math, where x/0 is
    ±Infinity and 0/0 is NaN) — Spark's ANSI mode would instead raise
    DIVIDE_BY_ZERO, so the zero-divisor cases are branched explicitly;
    the division only evaluates on the nonzero branch."""
    return (
        F.when(y != 0.0, x / y)
        .when(x > 0.0, F.lit(float("inf")))
        .when(x < 0.0, F.lit(float("-inf")))
        .otherwise(F.lit(float("nan")))
    )


def _fold(cols, op):
    out = cols[0]
    for c in cols[1:]:
        out = op(out, c)
    return out


def parse_func(expr: str) -> tuple[Column, set]:
    """Compile a Solr function-query string into (Column, fields)."""
    p = _P(expr)
    col, fields = p.expr()
    p._ws()
    if p.i != len(p.s):
        raise ValueError(
            f"function query: trailing input at {p.i} in {expr!r}"
        )
    return col, fields
