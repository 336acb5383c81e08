"""Surround query parser — the ``lucene/queryparser`` surround language
(``queryparser/surround/parser/QueryParser.jj``): proximity-first query
syntax with ordered/unordered distance operators over the span machinery.

Grammar (faithful subset, precedence tightest-last like the reference's
production chain OrQuery → AndQuery → NotQuery → NQuery → WQuery →
Primary):

- ``a OR b``, ``a AND b``, ``a NOT b`` — boolean composition, infix or
  prefix (``AND(a, b, c)``); case-insensitive operator names (:64-66)
- ``a 3W b`` / ``3W(a, b)`` — ordered distance; ``a 3N b`` — unordered;
  distance defaults to 1, accepted range 2-99 as a prefix (:69-72);
  maps to :class:`ast.SpanNearQuery` with ``slop = distance - 1``
  (``surround/query/DistanceQuery.java`` getSpanNearQuery)
- ``pre*`` / ``wild?card`` — truncated terms (``SrndPrefixQuery`` /
  ``SrndTruncQuery``): standalone they run as constant-score
  MultiTermQuery; INSIDE a distance operator they expand against the
  term dictionary into a SpanOr slot
  (``surround/query/SpanNearClauseFactory.java``)
- ``field:term`` / ``field:(...)`` — field scope (FieldsQuery)
- ``term^2.5`` — boost

Documented divergences: the reference keeps terms unanalyzed and
case-sensitive; this parser lowercases by default (our indexes store
lowercased terms — pass ``lowercase=False`` for raw). Distance operators
over nested distance queries (``2W(3N(a,b), c)``) raise — the span kernel
takes term/SpanOr slots only. Span scoring is the engine's constant-score
v1 span cut.
"""

from __future__ import annotations

import re

from lucene_spark.search import ast

_TOKEN_RE = re.compile(r'\s*("(?:[^"]*)"|\(|\)|,|\^[0-9.]+|[^\s(),^"]+)')
#: _DISTOP_NUM is ("2"-"9")("0"-"9")? in the reference lexer
#: (QueryParser.jj:201-216) — "1w" and "10w".."19w" lex as plain TERMS
_DIST_RE = re.compile(r"^([2-9][0-9]?)?([wWnN])$")
_FIELD_RE = re.compile(r"^([a-zA-Z_][a-zA-Z0-9_]*):(.*)$", re.S)


class SurroundSyntaxError(ValueError):
    pass


def _tokenize(text: str) -> list[str]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            if text[pos:].strip():
                raise SurroundSyntaxError(f"cannot tokenize at: {text[pos:]!r}")
            break
        out.append(m.group(1))
        pos = m.end()
    return out


def _is_op(tok: str, *names: str) -> bool:
    return tok.upper() in names


def _dist_op(tok: str):
    """(distance, ordered) for W/N tokens, else None. Bare W/N = 1;
    numeric prefix 2-99 (:126-130 getOpDistance)."""
    m = _DIST_RE.match(tok)
    if not m:
        return None
    d = int(m.group(1)) if m.group(1) else 1
    return d, m.group(2).lower() == "w"


def _to_slot(searcher, node, max_expansions: int):
    """A distance-operator operand → a span slot: a term name or a tuple
    of SpanOr alternatives (``SpanNearClauseFactory``: terms, truncations,
    and OR groups become span-near clauses; anything else is rejected like
    ``distanceSubQueryNotAllowed``)."""
    from lucene_spark.search.multiterm import expand_terms_hybrid

    if isinstance(node, ast.TermQuery):
        return node.term
    if isinstance(node, ast.MultiTermQuery):
        terms = expand_terms_hybrid(searcher.reader, node,
                                    max_terms=max_expansions)
        return tuple(terms)  # empty tuple = dead slot (handled downstream)
    if (isinstance(node, ast.BooleanQuery)
            and all(occ == ast.SHOULD for occ, _ in node.clauses)
            and node.min_should_match <= 1):
        alts: list[str] = []
        for _occ, sub in node.clauses:
            slot = _to_slot(searcher, sub, max_expansions)
            alts.extend(slot if isinstance(slot, tuple) else (slot,))
        return tuple(dict.fromkeys(alts))
    raise SurroundSyntaxError(
        "distance operator operands must be terms, truncations, or OR "
        f"groups of those (got {type(node).__name__}) — "
        "DistanceQuery.distanceSubQueryNotAllowed")


class _Parser:
    def __init__(self, searcher, toks: list[str], field: str,
                 lowercase: bool, max_expansions: int):
        self.searcher = searcher
        self.toks = toks
        self.i = 0
        self.field = field
        self.lowercase = lowercase
        self.max_expansions = max_expansions

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise SurroundSyntaxError("unexpected end of query")
        self.i += 1
        return t

    def expect(self, tok: str):
        t = self.next()
        if t != tok:
            raise SurroundSyntaxError(f"expected {tok!r}, got {t!r}")

    # precedence chain (loosest first): OR > AND > NOT > N > W > primary
    def parse_or(self, field):
        parts = [self.parse_and(field)]
        while self.peek() is not None and _is_op(self.peek(), "OR"):
            self.next()
            parts.append(self.parse_and(field))
        if len(parts) == 1:
            return parts[0]
        return ast.BooleanQuery(tuple((ast.SHOULD, p) for p in parts))

    def parse_and(self, field):
        parts = [self.parse_not(field)]
        while self.peek() is not None and _is_op(self.peek(), "AND"):
            self.next()
            parts.append(self.parse_not(field))
        if len(parts) == 1:
            return parts[0]
        return ast.BooleanQuery(tuple((ast.MUST, p) for p in parts))

    def parse_not(self, field):
        first = self.parse_dist(field, ordered=False)
        excl = []
        while self.peek() is not None and _is_op(self.peek(), "NOT"):
            self.next()
            excl.append(self.parse_dist(field, ordered=False))
        if not excl:
            return first
        return ast.BooleanQuery(tuple(
            [(ast.MUST, first)] + [(ast.MUST_NOT, e) for e in excl]))

    def parse_dist(self, field, ordered: bool):
        """N level wraps the W level (W binds tighter, per the production
        chain NQuery := WQuery (N WQuery)*)."""
        inner = (self.parse_primary if ordered else
                 lambda f: self.parse_dist(f, ordered=True))
        first = inner(field)
        want = "W" if ordered else "N"
        parts, dist = [first], None
        while self.peek() is not None:
            op = _dist_op(self.peek())
            if op is None or (op[1] != (want == "W")):
                break
            d, _ = op
            if dist is not None and d != dist:
                raise SurroundSyntaxError(
                    "mixed distances in one infix chain")
            dist = d
            self.next()
            parts.append(inner(field))
        if len(parts) == 1:
            return first
        return self._distance_query(parts, dist, want == "W", field)

    def _distance_query(self, parts, dist, in_order, field):
        slots = tuple(_to_slot(self.searcher, p, self.max_expansions)
                      for p in parts)
        return ast.SpanNearQuery(slots, slop=int(dist) - 1,
                                 in_order=in_order, field=field)

    def parse_primary(self, field):
        tok = self.next()
        # prefix operator forms: AND(a, b) / OR(a, b) / 3W(a, b) / N(a, b)
        up = tok.upper()
        d = _dist_op(tok)
        if self.peek() == "(" and (up in ("AND", "OR") or d is not None):
            args = self._args(field)
            if up == "AND":
                return ast.BooleanQuery(tuple((ast.MUST, a) for a in args))
            if up == "OR":
                return ast.BooleanQuery(tuple((ast.SHOULD, a) for a in args))
            return self._distance_query(args, d[0], d[1], field)
        if tok == "(":
            q = self.parse_or(field)
            self.expect(")")
            return self._boost(q)
        m = _FIELD_RE.match(tok)
        if m and m.group(2):
            # field:term (field:( ... ) arrives as 'field:' + '(')
            return self._boost(self._term(m.group(2), m.group(1)))
        if m is not None and not m.group(2) or tok.endswith(":"):
            f2 = tok[:-1]
            return self.parse_primary(f2)
        if tok in (")", ","):
            raise SurroundSyntaxError(f"unexpected {tok!r}")
        return self._boost(self._term(tok, field))

    def _args(self, field):
        self.expect("(")
        args = [self.parse_or(field)]
        while self.peek() == ",":
            self.next()
            args.append(self.parse_or(field))
        self.expect(")")
        return args

    def _boost(self, q):
        if self.peek() is not None and self.peek().startswith("^"):
            b = float(self.next()[1:])
            if hasattr(q, "boosted"):
                return q.boosted(b)
            import dataclasses

            return dataclasses.replace(q, boost=q.boost * b)
        return q

    def _term(self, text: str, field: str):
        if text.startswith('"') and text.endswith('"') and len(text) >= 2:
            text = text[1:-1]
        if self.lowercase:
            text = text.lower()
        if text.endswith("*") and "?" not in text and "*" not in text[:-1]:
            return ast.MultiTermQuery("prefix", text[:-1], field=field)
        if "*" in text or "?" in text:
            return ast.MultiTermQuery("wildcard", text, field=field)
        return ast.TermQuery(text, field)


def parse_surround(searcher, text: str, field: str = "text",
                   lowercase: bool = True, max_expansions: int = 128):
    """Parse a surround-syntax query into the engine's AST (see module
    docstring). Truncations inside distance operators expand against the
    term dictionary at parse time (one driver-dict pass or one pushdown
    scan via ``expand_terms_hybrid``)."""
    p = _Parser(searcher, _tokenize(text), field, lowercase, max_expansions)
    q = p.parse_or(field)
    if p.peek() is not None:
        raise SurroundSyntaxError(f"trailing input: {p.toks[p.i:]}")
    return q
