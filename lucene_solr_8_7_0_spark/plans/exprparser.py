"""lucene/expressions — the Javascript expression compiler.

Reference: lucene/expressions/src/java/org/apache/lucene/expressions/
js/JavascriptCompiler.java (compiles the expression to bytecode over
``double`` values; variables resolve through Bindings —
SimpleBindings.java:37 binds ``_score`` to DoubleValuesSource.SCORES)
and the grammar Javascript.g4: ternary ``?:``, logical ``|| &&``,
bitwise ``| ^ &``, equality/relational, shifts ``<< >> >>>``,
additive/multiplicative/unary, calls, parentheses.  Every value is a
double; comparisons and logicals yield 1.0/0.0; bitwise and shift
operators round-trip through long exactly like the compiled bytecode
(JavascriptCompiler pushes D2L / L2D around those ops).  The function
table is the compiler's JavascriptCompiler.properties (abs..tanh,
haversin = SloppyMath.haversinKilometers).

``parse_js(expr)`` -> (Column, variables) compiles ONE expression into
a whole-stage-codegen Spark Column over docmeta columns; ``_score``
stays a free variable the caller binds to the query score — the same
shape as the reference's per-document DoubleValues evaluation, but
vectorized by Tungsten instead of interpreted per doc.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

__all__ = ["parse_js"]

_NAME = re.compile(r"[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*")
_HEX = re.compile(r"0[xX][0-9a-fA-F]+")
_NUM = re.compile(r"(?:[0-9]+\.?[0-9]*|\.[0-9]+)(?:[eE][+-]?[0-9]+)?")

_D = lambda c: c.cast("double")
_L = lambda c: c.cast("long")
_B = lambda c: c != F.lit(0.0)  # JS-expression truthiness: != 0
_N = lambda b: F.when(b, F.lit(1.0)).otherwise(F.lit(0.0))

_EARTH_2R_KM = 2 * 6371.0087714  # SloppyMath TO_KILOMETERS mean radius


def _haversin(lat1, lon1, lat2, lon2):
    """SloppyMath.haversinKilometers: 2R*asin(sqrt(h)) with
    h = sin^2(dlat/2) + cos(lat1)cos(lat2)sin^2(dlon/2)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    h = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon / 2), 2)
    )
    return F.lit(_EARTH_2R_KM) * F.asin(F.sqrt(h))


_FUNCS: dict[str, tuple[int, object]] = {
    # JavascriptCompiler.properties, verbatim
    "abs": (1, F.abs), "acos": (1, F.acos), "acosh": (1, F.acosh),
    "asin": (1, F.asin), "asinh": (1, F.asinh), "atan": (1, F.atan),
    "atan2": (2, F.atan2), "atanh": (1, F.atanh),
    "ceil": (1, lambda x: _D(F.ceil(x))), "cos": (1, F.cos),
    "cosh": (1, F.cosh), "exp": (1, F.exp),
    "floor": (1, lambda x: _D(F.floor(x))),
    "haversin": (4, _haversin), "ln": (1, F.log), "log10": (1, F.log10),
    "logn": (2, lambda b, x: F.log(x) / F.log(b)),
    "max": (2, F.greatest), "min": (2, F.least), "pow": (2, F.pow),
    "sin": (1, F.sin), "sinh": (1, F.sinh), "sqrt": (1, F.sqrt),
    "tan": (1, F.tan), "tanh": (1, F.tanh),
}


class _JS:
    def __init__(self, s: str):
        self.s = s
        self.i = 0
        self.vars: set[str] = set()

    # --- lexer helpers ---
    def _ws(self):
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def _peek(self, tok: str) -> bool:
        self._ws()
        return self.s.startswith(tok, self.i)

    def _take(self, tok: str) -> bool:
        if self._peek(tok):
            self.i += len(tok)
            return True
        return False

    def _expect(self, tok: str):
        if not self._take(tok):
            raise ValueError(
                f"js expression: expected {tok!r} at {self.i} in {self.s!r}"
            )

    # --- precedence-climbing grammar (Javascript.g4 order) ---
    def parse(self) -> Column:
        c = self.ternary()
        self._ws()
        if self.i != len(self.s):
            raise ValueError(
                f"js expression: trailing input at {self.i} in {self.s!r}"
            )
        return c

    def ternary(self) -> Column:
        cond = self.logical_or()
        if self._take("?"):
            a = self.ternary()
            self._expect(":")
            b = self.ternary()
            return F.when(_B(cond), a).otherwise(b)
        return cond

    def logical_or(self) -> Column:
        c = self.logical_and()
        while self._take("||"):
            c = _N(_B(c) | _B(self.logical_and()))
        return c

    def logical_and(self) -> Column:
        c = self.bit_or()
        while self._peek("&&"):
            self._take("&&")
            c = _N(_B(c) & _B(self.bit_or()))
        return c

    def bit_or(self) -> Column:
        c = self.bit_xor()
        while self._peek("|") and not self._peek("||"):
            self._take("|")
            c = _D(_L(c).bitwiseOR(_L(self.bit_xor())))
        return c

    def bit_xor(self) -> Column:
        c = self.bit_and()
        while self._take("^"):
            c = _D(_L(c).bitwiseXOR(_L(self.bit_and())))
        return c

    def bit_and(self) -> Column:
        c = self.equality()
        while self._peek("&") and not self._peek("&&"):
            self._take("&")
            c = _D(_L(c).bitwiseAND(_L(self.equality())))
        return c

    def equality(self) -> Column:
        c = self.relational()
        while True:
            if self._take("=="):
                c = _N(c == self.relational())
            elif self._take("!="):
                c = _N(c != self.relational())
            else:
                return c

    def relational(self) -> Column:
        c = self.shift()
        while True:
            if self._take("<="):
                c = _N(c <= self.shift())
            elif self._take(">="):
                c = _N(c >= self.shift())
            elif self._peek("<") and not self._peek("<<"):
                self._take("<")
                c = _N(c < self.shift())
            elif (self._peek(">") and not self._peek(">>")
                  and not self._peek(">=")):
                self._take(">")
                c = _N(c > self.shift())
            else:
                return c

    def shift(self) -> Column:
        c = self.additive()
        while True:
            if self._take(">>>"):
                # unsigned shift on the long, like the compiled L2D
                c = _D(self._ushr(c))
            elif self._take("<<"):
                c = _D(self._shift_amount(F.shiftleft, c))
            elif self._peek(">>") and not self._peek(">>>"):
                self._take(">>")
                c = _D(self._shift_amount(F.shiftright, c))
            else:
                return c

    def _shift_amount(self, fn, left: Column) -> Column:
        # pyspark shift functions need a literal count; the grammar
        # only ever sees literal shift counts in practice — enforce it
        save = self.i
        self._ws()
        m = _NUM.match(self.s, self.i)
        if not m:
            raise ValueError(
                f"js expression: shift count must be a literal at {save}"
            )
        self.i = m.end()
        return fn(_L(left), int(float(m.group())))

    def _ushr(self, left: Column) -> Column:
        return self._shift_amount(F.shiftrightunsigned, left)

    def additive(self) -> Column:
        c = self.multiplicative()
        while True:
            if self._take("+"):
                c = c + self.multiplicative()
            elif self._take("-"):
                c = c - self.multiplicative()
            else:
                return c

    def multiplicative(self) -> Column:
        c = self.unary()
        while True:
            if self._take("*"):
                c = c * self.unary()
            elif self._take("/"):
                c = c / self.unary()
            elif self._take("%"):
                c = c % self.unary()
            else:
                return c

    def unary(self) -> Column:
        if self._take("!"):
            return _N(~_B(self.unary()))
        if self._take("~"):
            return _D(_L(self.unary()).bitwiseXOR(F.lit(-1).cast("long")))
        if self._take("-"):
            return -self.unary()
        if self._take("+"):
            return self.unary()
        return self.primary()

    def primary(self) -> Column:
        self._ws()
        if self._take("("):
            c = self.ternary()
            self._expect(")")
            return c
        m = _HEX.match(self.s, self.i)
        if m:
            self.i = m.end()
            return F.lit(float(int(m.group(), 16)))
        m = _NUM.match(self.s, self.i)
        if m:
            self.i = m.end()
            return F.lit(float(m.group()))
        m = _NAME.match(self.s, self.i)
        if not m:
            raise ValueError(
                f"js expression: bad token at {self.i} in {self.s!r}"
            )
        name = m.group()
        self.i = m.end()
        if self._peek("("):
            if name not in _FUNCS:
                raise ValueError(f"js expression: unknown function {name!r}")
            arity, fn = _FUNCS[name]
            self._expect("(")
            args = [self.ternary()]
            while self._take(","):
                args.append(self.ternary())
            self._expect(")")
            if len(args) != arity:
                raise ValueError(
                    f"js expression: {name} expects {arity} args, "
                    f"got {len(args)}"
                )
            return fn(*args)
        self.vars.add(name)
        return _D(F.col(name))


def parse_js(expr: str) -> tuple[Column, set]:
    """Compile a Lucene-expressions Javascript string to a Spark Column
    plus the set of referenced variable names (``_score`` included when
    used — the caller binds it, SimpleBindings-style)."""
    p = _JS(expr)
    return p.parse(), p.vars
