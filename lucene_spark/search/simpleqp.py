"""SimpleQueryParser — the ``lucene/queryparser/simple`` human-friendly
syntax (``queryparser/simple/SimpleQueryParser.java``): a parser that NEVER
throws — any malformed input degrades to the closest sensible query.

Operators (each behind a feature flag, ``SimpleQueryParser.java:106-128``):

- ``+`` AND, ``|`` OR between tokens (``token1+token2``, ``token1|token2``)
- ``-`` negates the NEXT single token (``-token``; ``--token`` un-negates)
- ``"..."`` phrase; ``"..."~N`` sloppy phrase (NEAR)
- ``term*`` prefix query (trailing ``*`` only)
- ``term~N`` fuzzy query (edit distance, capped at 2; bare ``~`` → 2)
- ``( )`` precedence grouping
- ``\\`` escapes the next character
- whitespace delimits tokens

Semantics mirrored from the reference state machine
(``SimpleQueryParser.java:150-524``):

- the default operator between tokens is SHOULD (OR), settable to MUST
  (``:130,631-637``)
- operator precedence is a left fold: whenever the operator CHANGES, the
  tree built so far is wrapped as one clause of a fresh BooleanQuery
  (``buildQueryTree``, ``:455-476``) — so ``t1 | t2 + t3`` evaluates
  ``(t1 OR t2) AND t3``
- a negated token wraps as ``BooleanQuery[(MUST_NOT, q), (SHOULD,
  MatchAllDocsQuery)]`` (``:440-447``) — note this means e.g. ``a -b``
  (default OR) matches ``a ∪ complement(b)``, exactly like the reference
- unmatched ``(`` / ``"`` are treated as extraneous characters
  (``:268-272,323-326``); a dangling operator is ignored
- ``"*"`` alone → MatchAllDocsQuery (``:150-153``); empty input →
  MatchNoDocsQuery (``:159-163``)
- fuzziness/slop parse: empty ``~`` → 2, non-numeric → 0, negative → 0
  (``parseFuzziness``, ``:484-516``); fuzzy edit distance caps at
  LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE = 2 (``:403-404``)
- multi-field ``weights``: each leaf becomes a SHOULD-of-fields with the
  field boost applied per leaf (``newDefaultQuery``, ``:547-561``).
  Documented divergence: the reference multiplies a whole sub-tree by the
  field weight via BoostQuery; our AST carries boost on leaves, identical
  in exact arithmetic and differing only in float32 rounding order.
"""

from __future__ import annotations

import re as _re

from lucene_spark.search import ast

#: feature flags (SimpleQueryParser.java:106-128)
AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9
ALL_OPERATORS = -1

_WS = (" ", "\t", "\n", "\r")
_MAX_FUZZY = 2  # LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE


class _State:
    """Parse state (SimpleQueryParser.State, :639-658)."""

    __slots__ = ("data", "index", "length", "current_op", "previous_op",
                 "not_count", "top")

    def __init__(self, data: str, index: int, length: int):
        self.data = data
        self.index = index
        self.length = length
        self.current_op = None   # occur set by an explicit +/| operator
        self.previous_op = None  # occur used for the previous combine
        self.not_count = 0
        self.top = None          # the query tree built so far


class SimpleQueryParser:
    """``SimpleQueryParser(analyzer, field_or_weights, flags)`` — parse
    human query text to the engine AST. ``weights``: either one field name
    or a {field: boost} dict (multi-field leaves combine as SHOULD)."""

    def __init__(self, analyzer, weights="text", flags: int = ALL_OPERATORS,
                 default_operator: str = ast.SHOULD):
        if isinstance(weights, str):
            weights = {weights: 1.0}
        if default_operator not in (ast.SHOULD, ast.MUST):
            raise ValueError(
                "invalid operator: only SHOULD or MUST are allowed")
        self.analyzer = analyzer
        self.weights = dict(weights)
        self.flags = flags
        self.default_operator = default_operator

    # -- entry ---------------------------------------------------------
    def parse(self, query_text: str):
        """Parse; never raises on malformed syntax (:150-165)."""
        if query_text.strip() == "*":
            return ast.MatchAllDocsQuery()
        state = _State(query_text, 0, len(query_text))
        self._parse_sub_query(state)
        if state.top is None:
            return ast.MatchNoDocsQuery()
        return state.top

    # -- state machine (parseSubQuery, :167-231) ------------------------
    def _flag(self, f: int) -> bool:
        return (self.flags & f) != 0

    def _parse_sub_query(self, state: _State) -> None:
        while state.index < state.length:
            ch = state.data[state.index]
            if ch == "(" and self._flag(PRECEDENCE_OPERATORS):
                self._consume_sub_query(state)
            elif ch == ")" and self._flag(PRECEDENCE_OPERATORS):
                state.index += 1  # extraneous — ignored
            elif ch == '"' and self._flag(PHRASE_OPERATOR):
                self._consume_phrase(state)
            elif ch == "+" and self._flag(AND_OPERATOR):
                # explicit AND; ignored when an op is already pending or
                # nothing precedes it (:179-190)
                if state.current_op is None and state.top is not None:
                    state.current_op = ast.MUST
                state.index += 1
            elif ch == "|" and self._flag(OR_OPERATOR):
                if state.current_op is None and state.top is not None:
                    state.current_op = ast.SHOULD
                state.index += 1
            elif ch == "-" and self._flag(NOT_OPERATOR):
                # two '-' in a row negate each other (:203-210)
                state.not_count += 1
                state.index += 1
                continue  # keep not_count across THIS char only
            elif ch in _WS and self._flag(WHITESPACE_OPERATOR):
                state.index += 1
            else:
                self._consume_token(state)
            # the not op binds directly to the next token — any other
            # consumed char resets it (:227-229)
            state.not_count = 0

    def _consume_sub_query(self, state: _State) -> None:
        """(…) group (consumeSubQuery, :233-290)."""
        state.index += 1
        start = state.index
        precedence = 1
        escaped = False
        while state.index < state.length:
            ch = state.data[state.index]
            if not escaped:
                if ch == "\\" and self._flag(ESCAPE_OPERATOR):
                    escaped = True
                    state.index += 1
                    continue
                if ch == "(":
                    precedence += 1
                elif ch == ")":
                    precedence -= 1
                    if precedence == 0:
                        break
            escaped = False
            state.index += 1
        if state.index == state.length:
            state.index = start  # no ')' → '(' is extraneous (:268-272)
        elif state.index == start:
            state.current_op = None  # '()' resets the pending op (:273-279)
            state.index += 1
        else:
            sub = _State(state.data, start, state.index)
            self._parse_sub_query(sub)
            self._build_query_tree(state, sub.top)
            state.index += 1

    def _consume_phrase(self, state: _State) -> None:
        """"…" [~N] (consumePhrase, :292-356)."""
        state.index += 1
        start = state.index
        buf = []
        escaped = False
        has_slop = False
        while state.index < state.length:
            ch = state.data[state.index]
            if not escaped:
                if ch == "\\" and self._flag(ESCAPE_OPERATOR):
                    escaped = True
                    state.index += 1
                    continue
                if ch == '"':
                    if (state.length > state.index + 1
                            and state.data[state.index + 1] == "~"
                            and self._flag(NEAR_OPERATOR)):
                        state.index += 1
                        if state.length > state.index + 1:
                            has_slop = True
                        break
                    break
            escaped = False
            buf.append(ch)
            state.index += 1
        if state.index == state.length:
            state.index = start  # unmatched '"' is extraneous (:323-326)
        elif state.index == start:
            state.current_op = None  # empty phrase resets op (:327-333)
            state.index += 1
        else:
            phrase = "".join(buf)
            slop = self._parse_fuzziness(state) if has_slop else 0
            self._build_query_tree(state, self._new_phrase_query(phrase,
                                                                 slop))
            state.index += 1

    def _consume_token(self, state: _State) -> None:
        """Bare term [*|~N] (consumeToken, :358-424)."""
        buf = []
        escaped = False
        prefix = False
        fuzzy = False
        while state.index < state.length:
            ch = state.data[state.index]
            if not escaped:
                if ch == "\\" and self._flag(ESCAPE_OPERATOR):
                    escaped = True
                    prefix = False
                    state.index += 1
                    continue
                if self._token_finished(state):
                    break
                if buf and ch == "~" and self._flag(FUZZY_OPERATOR):
                    fuzzy = True
                    break
                # prefix is true only while the LAST copied char is an
                # unescaped '*' with at least one char before it (:386-391)
                prefix = bool(buf) and ch == "*" \
                    and self._flag(PREFIX_OPERATOR)
            escaped = False
            buf.append(ch)
            state.index += 1
        if buf:
            if fuzzy:
                token = "".join(buf)
                fuzziness = min(self._parse_fuzziness(state), _MAX_FUZZY)
                branch = (self._new_default_query(token) if fuzziness == 0
                          else self._new_fuzzy_query(token, fuzziness))
            elif prefix:
                branch = self._new_prefix_query("".join(buf[:-1]))
            else:
                branch = self._new_default_query("".join(buf))
            self._build_query_tree(state, branch)

    def _token_finished(self, state: _State) -> bool:
        """True at a token-delimiting operator char (:518-535)."""
        ch = state.data[state.index]
        return (
            (ch == '"' and self._flag(PHRASE_OPERATOR))
            or (ch == "|" and self._flag(OR_OPERATOR))
            or (ch == "+" and self._flag(AND_OPERATOR))
            or (ch in "()" and self._flag(PRECEDENCE_OPERATORS))
            or (ch in _WS and self._flag(WHITESPACE_OPERATOR))
        )

    def _parse_fuzziness(self, state: _State) -> int:
        """~N → N; bare ~ → 2; junk → 0; negative → 0 (:484-516)."""
        if state.index >= state.length or state.data[state.index] != "~":
            return 0
        buf = []
        while state.index < state.length:
            state.index += 1
            if state.index < state.length:
                if self._token_finished(state):
                    break
                buf.append(state.data[state.index])
        text = "".join(buf)
        if text == "":
            return 2
        # Integer.parseInt parity: plain decimal digits only (Python's
        # int() would accept '2_0' and unbounded magnitudes Java rejects)
        if not _re.fullmatch(r"[+-]?[0-9]{1,9}", text):
            return 0
        return max(int(text), 0)

    # -- tree building (buildQueryTree, :426-482) ------------------------
    def _build_query_tree(self, state: _State, branch) -> None:
        if branch is None:
            return
        if state.not_count % 2 == 1:
            # negation wrapper (:440-447): NOT(branch) ∧ match-all
            branch = ast.BooleanQuery((
                (ast.MUST_NOT, branch),
                (ast.SHOULD, ast.MatchAllDocsQuery()),
            ))
        if state.top is None:
            state.top = branch
        else:
            if state.current_op is None:
                state.current_op = self.default_operator
            if state.previous_op != state.current_op:
                # operator change → the tree so far becomes one clause of a
                # fresh parent (:465-470) — this IS the left-fold precedence
                state.top = ast.BooleanQuery(
                    ((state.current_op, state.top),))
            state.top = ast.BooleanQuery(
                state.top.clauses + ((state.current_op, branch),),
                state.top.min_should_match)
            state.previous_op = state.current_op
        state.current_op = None

    # -- leaf factories (:545-621) ---------------------------------------
    def _per_field(self, make) -> object | None:
        """SHOULD-combine one leaf across the weighted fields, simplified
        for the single-field case (newDefaultQuery et al. + simplify)."""
        subs = []
        for f, w in self.weights.items():
            q = make(f, float(w))
            if q is not None:
                subs.append(q)
        if not subs:
            return None
        if len(subs) == 1:
            return subs[0]
        return ast.BooleanQuery(tuple((ast.SHOULD, q) for q in subs))

    def _new_default_query(self, text: str):
        """Analyze; 1 token → term, n tokens → boolean of terms with the
        default operator (QueryBuilder.createBooleanQuery)."""
        def make(f, w):
            toks = self.analyzer.tokenize_text(text)
            if not toks:
                return None
            if len(toks) == 1:
                return ast.TermQuery(toks[0], f, w)
            return ast.BooleanQuery(tuple(
                (self.default_operator, ast.TermQuery(t, f, w))
                for t in toks))
        return self._per_field(make)

    def _new_fuzzy_query(self, text: str, fuzziness: int):
        return self._per_field(lambda f, w: ast.MultiTermQuery(
            "fuzzy", value=self._normalize(text), max_edits=fuzziness,
            field=f, boost=w))

    def _new_prefix_query(self, text: str):
        return self._per_field(lambda f, w: ast.MultiTermQuery(
            "prefix", value=self._normalize(text), field=f, boost=w))

    def _new_phrase_query(self, text: str, slop: int):
        """Analyze; 1 token → term, n → PhraseQuery with slop
        (QueryBuilder.createPhraseQuery)."""
        def make(f, w):
            toks = self.analyzer.tokenize_text(text)
            if not toks:
                return None
            if len(toks) == 1:
                return ast.TermQuery(toks[0], f, w)
            return ast.PhraseQuery(tuple(toks), f, w, slop)
        return self._per_field(make)

    def _normalize(self, text: str) -> str:
        """Analyzer.normalize analogue for unanalyzed leaves (prefix/fuzzy):
        run the chain's per-token normalization without splitting — our
        analyzers' single-token output when the text tokenizes whole, else
        plain lowercase."""
        toks = self.analyzer.tokenize_text(text)
        return toks[0] if len(toks) == 1 else text.lower()


def parse_simple(query_text: str, analyzer, weights="text",
                 flags: int = ALL_OPERATORS,
                 default_operator: str = ast.SHOULD):
    """Functional convenience over :class:`SimpleQueryParser`."""
    return SimpleQueryParser(analyzer, weights, flags,
                             default_operator).parse(query_text)
