"""Compiled score expressions — the reference's ``lucene/expressions``
module (``expressions/js/JavascriptCompiler.java:138`` ``compile()``: a
JavaScript-subset source string over double-valued bindings becomes a
``DoubleValuesSource``; grammar in ``expressions/js/Javascript.g4:28-43``,
function table in ``JavascriptCompiler.properties``).

Spark-first shape: instead of ASM bytecode generation, ``compile_expression``
parses the same grammar (Pratt parser, identical precedence ladder) into an
AST whose ``to_column(bindings)`` emits ONE Catalyst Column tree — every
arithmetic node stays JVM-side inside whole-stage codegen; no Python runs per
row. Bindings map variable names to Columns exactly like the reference's
``Bindings`` maps names to DoubleValuesSources (``_score`` → the query
score); an unbound variable raises at compile time, mirroring
``SimpleBindings`` validation.

Semantics parity with the reference compiler:
- everything is a double; comparisons / logical ops yield 1.0 or 0.0 and the
  ternary condition treats nonzero as true (``JavascriptCompiler.java``
  pushes doubles for boolean ops);
- bitwise / shift operators cast the double operands to long, operate, and
  return double (Java ``(long)`` cast semantics);
- the full DEFAULT_FUNCTIONS table is supported (abs … tanh, atan2, pow,
  min, max, logn(base, x) = ln(x)/ln(base), haversin/haversinMeters); the
  reference's haversin uses SloppyMath's table-driven trig — we use exact
  trig, a documented sub-ulp-level deviation;
- Java's IEEE edge semantics are reproduced with CASE shims where Spark
  differs (ANSI mode throws on /0 and %0; ln/log10 of non-positive return
  NULL; least() drops NaN; comparisons treat NaN as largest/equal): x/0 →
  ±Infinity/NaN, x%0 → NaN, ln(0) → -Infinity, ln(neg) → NaN, min(NaN, x)
  → NaN, NaN comparisons → false (!= → true). Known deviation: a
  negative-zero divisor yields +Infinity (Java: -Infinity) — SQL equality
  can't see the sign of -0.0.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, functions as F

__all__ = ["compile_expression", "CompiledExpression", "ExpressionError"]


class ExpressionError(ValueError):
    """Parse or binding failure (ParseException analogue)."""


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>0[xX][0-9a-fA-F]+|(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)"
    r"|(?P<ident>[A-Za-z_$][A-Za-z_$0-9]*(?:\.[A-Za-z_$][A-Za-z_$0-9]*)*)"
    r"|(?P<op><<|>>>|>>|<=|>=|==|!=|&&|\|\||[-+*/%()<>!~&^|?:,])"
    r")"
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    toks, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if m is None or m.end() == i:
            if src[i:].strip() == "":
                break
            raise ExpressionError(
                f"unexpected character {src[i:]!r} at offset {i}")
        if m.group("num") is not None:
            toks.append(("num", m.group("num")))
        elif m.group("ident") is not None:
            toks.append(("ident", m.group("ident")))
        else:
            toks.append(("op", m.group("op")))
        i = m.end()
    toks.append(("end", ""))
    return toks


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class _Num:
    value: float


@dataclass(frozen=True)
class _Var:
    name: str


@dataclass(frozen=True)
class _Unary:
    op: str
    operand: object


@dataclass(frozen=True)
class _Binary:
    op: str
    left: object
    right: object


@dataclass(frozen=True)
class _Ternary:
    cond: object
    then: object
    other: object


@dataclass(frozen=True)
class _Call:
    name: str
    args: tuple


# binary precedence ladder, Javascript.g4:33-42 (higher binds tighter)
_PRECEDENCE = {
    "||": 1,
    "&&": 2,
    "|": 3,
    "^": 4,
    "&": 5,
    "==": 6, "!=": 6,
    "<": 7, "<=": 7, ">": 7, ">=": 7,
    "<<": 8, ">>": 8, ">>>": 8,
    "+": 9, "-": 9,
    "*": 10, "/": 10, "%": 10,
}
_TERNARY_PREC = 0  # right-assoc, below ||


class _Parser:
    def __init__(self, src: str):
        self.toks = _tokenize(src)
        self.pos = 0

    def peek(self):
        return self.toks[self.pos]

    def next(self):
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, op: str):
        kind, val = self.next()
        if kind != "op" or val != op:
            raise ExpressionError(f"expected {op!r}, got {val!r}")

    def parse(self):
        node = self.parse_expr(_TERNARY_PREC)
        if self.peek()[0] != "end":
            raise ExpressionError(f"trailing input at {self.peek()[1]!r}")
        return node

    def parse_expr(self, min_prec: int):
        node = self.parse_unary()
        while True:
            kind, val = self.peek()
            if kind != "op":
                return node
            if val == "?" and min_prec <= _TERNARY_PREC:
                self.next()
                then = self.parse_expr(_TERNARY_PREC)  # right-assoc
                self.expect(":")
                other = self.parse_expr(_TERNARY_PREC)
                node = _Ternary(node, then, other)
                continue
            prec = _PRECEDENCE.get(val)
            if prec is None or prec < min_prec:
                return node
            self.next()
            right = self.parse_expr(prec + 1)  # all binaries left-assoc
            node = _Binary(val, node, right)

    def parse_unary(self):
        kind, val = self.peek()
        if kind == "op" and val in ("-", "+", "!", "~"):
            self.next()
            return _Unary(val, self.parse_unary())
        return self.parse_atom()

    def parse_atom(self):
        kind, val = self.next()
        if kind == "num":
            v = float(int(val, 16)) if val[:2].lower() == "0x" else float(val)
            return _Num(v)
        if kind == "ident":
            k2, v2 = self.peek()
            if k2 == "op" and v2 == "(":
                self.next()
                args = []
                if not (self.peek() == ("op", ")")):
                    args.append(self.parse_expr(_TERNARY_PREC))
                    while self.peek() == ("op", ","):
                        self.next()
                        args.append(self.parse_expr(_TERNARY_PREC))
                self.expect(")")
                return _Call(val, tuple(args))
            return _Var(val)
        if kind == "op" and val == "(":
            node = self.parse_expr(_TERNARY_PREC)
            self.expect(")")
            return node
        raise ExpressionError(f"unexpected token {val!r}")


# ---------------------------------------------------------------------------
# compilation to a Catalyst Column
# ---------------------------------------------------------------------------

_D = "double"

# ---- Java double-semantics shims -----------------------------------------
# Spark diverges from java.lang.Math in ways that matter under ANSI mode
# (the session default here): double division/remainder by zero THROWS
# (Java: ±Infinity / NaN), ln/log10 of non-positive returns NULL (Java:
# -Infinity at 0, NaN below), least() returns the non-NaN operand (Java
# Math.min propagates NaN), and comparisons treat NaN as largest-and-equal
# (Java: every NaN comparison is false, != is true). Each shim emits a CASE
# tree so the whole expression still compiles to one codegen Project.
# Known remaining deviation: a NEGATIVE-ZERO divisor yields +Infinity here
# (Java: -Infinity) — SQL comparison can't see the sign of -0.0.


def _nan():
    return F.lit(float("nan"))


def _java_div(a, b):
    inf = F.lit(float("inf"))
    zero_case = (
        F.when(a.isNull(), F.lit(None).cast(_D))
        .when(F.isnan(a) | (a == 0.0), _nan())
        .when(a > 0.0, inf)
        .otherwise(-inf)
    )
    return F.when(b == 0.0, zero_case).otherwise(a / b)


def _java_mod(a, b):
    zero_case = F.when(a.isNull(), F.lit(None).cast(_D)).otherwise(_nan())
    return F.when(b == 0.0, zero_case).otherwise(a % b)


def _ln(c):
    # Math.log: 0 → -Inf, negative → NaN (Spark log returns NULL for both)
    return (
        F.when(c.isNull(), F.lit(None).cast(_D))
        .when(c == 0.0, F.lit(float("-inf")))
        .when(c < 0.0, _nan())
        .otherwise(F.log(c))
    )


def _log10(c):
    return (
        F.when(c.isNull(), F.lit(None).cast(_D))
        .when(c == 0.0, F.lit(float("-inf")))
        .when(c < 0.0, _nan())
        .otherwise(F.log10(c))
    )


def _logn(base, x):
    return _java_div(_ln(x), _ln(base))  # MathUtil.log(base, x)


def _java_min(a, b):
    # Math.min propagates NaN; Spark least() drops it (NaN sorts largest)
    return F.when(F.isnan(a) | F.isnan(b), _nan()).otherwise(F.least(a, b))


_EARTH_MEAN_RADIUS_M = 6_371_008.7714  # SloppyMath.TO_METERS basis


def _haversin_m(lat1, lon1, lat2, lon2):
    to_rad = 3.141592653589793 / 180.0
    p1, p2 = lat1 * to_rad, lat2 * to_rad
    dp, dl = (lat2 - lat1) * to_rad, (lon2 - lon1) * to_rad
    h = (
        F.pow(F.sin(dp / 2), F.lit(2.0))
        + F.cos(p1) * F.cos(p2) * F.pow(F.sin(dl / 2), F.lit(2.0))
    )
    return (
        F.lit(2.0 * _EARTH_MEAN_RADIUS_M)
        * F.asin(F.sqrt(h))
    )


# JavascriptCompiler.properties, all 26 entries
_FUNCTIONS = {
    "abs": (1, F.abs),
    "acos": (1, F.acos),
    "acosh": (1, F.acosh),
    "asin": (1, F.asin),
    "asinh": (1, F.asinh),
    "atan": (1, F.atan),
    "atan2": (2, F.atan2),
    "atanh": (1, F.atanh),
    "ceil": (1, F.ceil),
    "cos": (1, F.cos),
    "cosh": (1, F.cosh),
    "exp": (1, F.exp),
    "floor": (1, F.floor),
    "haversin": (4, lambda *a: _haversin_m(*a) / F.lit(1000.0)),
    "haversinMeters": (4, _haversin_m),
    "ln": (1, _ln),
    "log10": (1, _log10),
    "logn": (2, _logn),
    "max": (2, F.greatest),  # Spark greatest: NaN sorts largest, like Math.max
    "min": (2, _java_min),
    "pow": (2, F.pow),
    "sin": (1, F.sin),
    "sinh": (1, F.sinh),
    "sqrt": (1, F.sqrt),
    "tan": (1, F.tan),
    "tanh": (1, F.tanh),
}


def _bool(c: Column) -> Column:
    """double → SQL boolean (nonzero = true), Java double truthiness."""
    return c != F.lit(0.0)


def _num(c: Column) -> Column:
    """SQL boolean → 1.0 / 0.0 double."""
    return F.when(c, F.lit(1.0)).otherwise(F.lit(0.0))


def _emit(node, bindings) -> Column:
    if isinstance(node, _Num):
        return F.lit(node.value).cast(_D)
    if isinstance(node, _Var):
        try:
            return bindings[node.name].cast(_D)
        except KeyError:
            raise ExpressionError(f"unbound variable: {node.name!r}")
    if isinstance(node, _Unary):
        x = _emit(node.operand, bindings)
        if node.op == "-":
            return -x
        if node.op == "+":
            return x
        if node.op == "!":
            return _num(~_bool(x))
        # ~ : (long) cast, bitwise not, back to double
        return F.bitwise_not(x.cast("long")).cast(_D)
    if isinstance(node, _Ternary):
        return F.when(
            _bool(_emit(node.cond, bindings)),
            _emit(node.then, bindings),
        ).otherwise(_emit(node.other, bindings))
    if isinstance(node, _Call):
        spec = _FUNCTIONS.get(node.name)
        if spec is None:
            raise ExpressionError(f"unknown function: {node.name!r}")
        arity, fn = spec
        if len(node.args) != arity:
            raise ExpressionError(
                f"{node.name} takes {arity} args, got {len(node.args)}")
        return fn(*(_emit(a, bindings) for a in node.args)).cast(_D)
    # _Binary
    a = _emit(node.left, bindings)
    b = _emit(node.right, bindings)
    op = node.op
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        return _java_div(a, b)
    if op == "%":
        return _java_mod(a, b)
    if op in ("<", "<=", ">", ">=", "==", "!="):
        raw = {
            "<": a < b, "<=": a <= b, ">": a > b,
            ">=": a >= b, "==": a == b, "!=": a != b,
        }[op]
        # Java: every comparison with a NaN operand is false, except !=
        # which is true (Spark: NaN compares largest and NaN == NaN)
        either_nan = F.isnan(a) | F.isnan(b)
        return _num(F.when(either_nan, F.lit(op == "!=")).otherwise(raw))
    if op == "&&":
        return _num(_bool(a) & _bool(b))
    if op == "||":
        return _num(_bool(a) | _bool(b))
    la, lb = a.cast("long"), b.cast("long")
    if op == "&":
        return (la.bitwiseAND(lb)).cast(_D)
    if op == "|":
        return (la.bitwiseOR(lb)).cast(_D)
    if op == "^":
        return (la.bitwiseXOR(lb)).cast(_D)
    # shift counts use Java's low-6-bit masking on longs; the pyspark
    # shiftleft/shiftright wrappers take only int literals, so call the SQL
    # functions directly for column-valued counts
    shift = ((lb % 64 + 64) % 64).cast("int")
    if op == "<<":
        return F.call_function("shiftleft", la, shift).cast(_D)
    if op == ">>":
        return F.call_function("shiftright", la, shift).cast(_D)
    if op == ">>>":
        return F.call_function("shiftrightunsigned", la, shift).cast(_D)
    raise ExpressionError(f"unknown operator {op!r}")


class CompiledExpression:
    """Parsed expression; ``to_column(bindings)`` is the DoubleValuesSource
    analogue — every referenced variable must be bound to a Column."""

    def __init__(self, source: str):
        self.source = source
        self._ast = _Parser(source).parse()

    def variables(self) -> set[str]:
        out: set[str] = set()

        def walk(n):
            if isinstance(n, _Var):
                out.add(n.name)
            elif isinstance(n, _Unary):
                walk(n.operand)
            elif isinstance(n, _Binary):
                walk(n.left), walk(n.right)
            elif isinstance(n, _Ternary):
                walk(n.cond), walk(n.then), walk(n.other)
            elif isinstance(n, _Call):
                for a in n.args:
                    walk(a)

        walk(self._ast)
        return out

    def to_column(self, bindings: dict[str, Column]) -> Column:
        return _emit(self._ast, bindings).cast(_D)


def compile_expression(source: str) -> CompiledExpression:
    return CompiledExpression(source)
