"""ComplexPhraseQueryParser — phrases with embedded wildcards / fuzzy /
ranges / OR groups (``queryparser/complexPhrase/ComplexPhraseQueryParser.java``):
``"(john jon jonathan~) peters*"`` matches docs where any of the first
group's alternatives is adjacent (within the phrase slop) to a term
starting with ``peters``.

Mirrors the reference's two-pass design (:85-135): pass one parses the
top-level query with the classic grammar, treating each quoted phrase as
an opaque unit; pass two parses each phrase's contents and rewrites it to
span form (``ComplexPhraseQuery.rewrite``, :255-365):

- each whitespace-level element becomes one span slot, in sequence
- a plain term → a term slot; wildcard/prefix/fuzzy/range elements expand
  against the term dictionary into a SpanOr slot (the
  SCORING_BOOLEAN_REWRITE pass the reference forces, :96-110); an
  ``(a b c)`` group unions its alternatives' expansions (SpanOrQuery,
  ``addComplexPhraseClause`` :374-420)
- an element whose expansion is empty keeps a dead never-match slot — the
  reference inserts a dummy term so ``"fred smithe*"`` cannot match on
  just ``fred`` (:300-316)
- ``"…"~n`` sets the SpanNearQuery slop to n (slopFactor, :88); word
  order is enforced by default and relaxed with ``in_order=False``
  (``setInOrder``, :67-76)
- single-element phrase content returns the element's query directly
  (TermQuery / MultiTermQuery — :262-266 returns contents unrewritten)

Documented divergences: negated elements INSIDE a phrase (the reference's
mixed positive/negative SpanNot rewrite, :333-364) raise
NotImplementedError — our SpanNotQuery excludes single terms, not span
sequences; terms are lowercased like the engine's other parsers (pass
``lowercase=False`` for raw); boosts inside phrase elements are ignored
(the reference unwraps them too, :291-293 — span slots are unscored under
the constant-score span v1 cut).
"""

from __future__ import annotations

import dataclasses
import re

from lucene_spark.search import ast

#: one quoted phrase with optional ~slop (and any ^boost left for the
#: classic pass to attach to the placeholder)
_PHRASE_RE = re.compile(r'"([^"]*)"(?:~(\d+))?')
#: phrase-content elements: (group) | [range] | {range} | bare token
_ELEM_RE = re.compile(r"\(([^)]*)\)|(\[[^\]]*\]|\{[^}]*\})|([^\s()]+)")
_RANGE_RE = re.compile(r"([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])", re.I)
_PLACEHOLDER = "cpqph{}"


class ComplexPhraseSyntaxError(ValueError):
    pass


def _element_query(tok: str, field: str, lowercase: bool):
    """One phrase element → TermQuery or MultiTermQuery (the classic
    grammar's term-level shapes, minus boosts)."""
    if tok.startswith("-"):
        raise NotImplementedError(
            "negated elements inside a complex phrase are not supported "
            "(SpanNot over span sequences — documented divergence)")
    tok = tok.lstrip("+")
    tok = re.sub(r"\^[0-9.]+$", "", tok)  # element boosts are unscored
    m = _RANGE_RE.match(tok)
    if m:
        lo, hi = m.group(2), m.group(3)
        if lowercase:
            lo, hi = lo.lower(), hi.lower()
        return ast.MultiTermQuery(
            "range", lower=None if lo == "*" else lo,
            upper=None if hi == "*" else hi,
            include_lower=m.group(1) == "[",
            include_upper=m.group(4) == "]", field=field)
    fm = re.match(r"^(.*?)~(\d*)$", tok)
    if fm and fm.group(1):
        base = fm.group(1).lower() if lowercase else fm.group(1)
        edits = int(fm.group(2)) if fm.group(2) else 2
        return ast.MultiTermQuery("fuzzy", value=base,
                                  max_edits=min(edits, 2), field=field)
    if lowercase:
        tok = tok.lower()
    if tok.endswith("*") and "?" not in tok and "*" not in tok[:-1]:
        return ast.MultiTermQuery("prefix", value=tok[:-1], field=field)
    if "*" in tok or "?" in tok:
        return ast.MultiTermQuery("wildcard", value=tok, field=field)
    if not tok:
        raise ComplexPhraseSyntaxError("empty phrase element")
    return ast.TermQuery(tok, field)


def _to_slot(searcher, q, max_expansions: int):
    """Element query → span slot: term name, or a tuple of SpanOr
    alternatives (empty tuple = dead never-match slot)."""
    from lucene_spark.search.multiterm import expand_terms_hybrid

    if isinstance(q, ast.TermQuery):
        return q.term
    return tuple(expand_terms_hybrid(searcher.reader, q,
                                     max_terms=max_expansions))


def _build_phrase(searcher, content: str, slop: int, in_order: bool,
                  field: str, lowercase: bool, max_expansions: int):
    """Phrase contents → SpanNearQuery (or the single element's query)."""
    elems = []
    for gm in _ELEM_RE.finditer(content):
        group, rng, tok = gm.groups()
        if group is not None:
            alts = [_element_query(t, field, lowercase)
                    for t in group.split() if t.upper() != "OR"]
            if not alts:
                raise ComplexPhraseSyntaxError("empty group in phrase")
            elems.append(alts)
        else:
            elems.append([_element_query(rng or tok, field, lowercase)])
    if not elems:
        return ast.MatchNoDocsQuery()
    if len(elems) == 1 and len(elems[0]) == 1:
        # single-element phrase: the element query runs directly
        # (ComplexPhraseQuery.rewrite :262-266)
        return elems[0][0]
    slots = []
    for alts in elems:
        if len(alts) == 1 and isinstance(alts[0], ast.TermQuery):
            slots.append(alts[0].term)
            continue
        union: list[str] = []
        for a in alts:
            s = _to_slot(searcher, a, max_expansions)
            union.extend(s if isinstance(s, tuple) else (s,))
        slots.append(tuple(dict.fromkeys(union)))
    return ast.SpanNearQuery(tuple(slots), slop=slop, in_order=in_order,
                             field=field)


def parse_complex_phrase(searcher, query_str: str, field: str = "text",
                         in_order: bool = True, lowercase: bool = True,
                         max_expansions: int = 128):
    """Parse classic-syntax ``query_str`` whose quoted phrases may embed
    wildcard/prefix/fuzzy/range elements and ``(…)`` alternative groups.
    Returns the engine AST: phrases rewrite to SpanNearQuery clauses
    (expanded against the index's term dictionary at parse time), and all
    surrounding classic syntax (booleans, fields, boosts) is untouched."""
    phrases: list[tuple[str, int]] = []

    def mask(m: re.Match) -> str:
        phrases.append((m.group(1), int(m.group(2) or 0)))
        return _PLACEHOLDER.format(len(phrases) - 1)

    masked = _PHRASE_RE.sub(mask, query_str)
    outer = ast.parse(masked, searcher.analyzer, default_field=field,
                      fields=("text", field) if field != "text"
                      else ("text",))
    if not phrases:
        return outer

    built = {}

    def replace(node):
        if isinstance(node, ast.TermQuery):
            m = re.fullmatch(_PLACEHOLDER.format(r"(\d+)"), node.term)
            if m:
                i = int(m.group(1))
                if i not in built:
                    content, slop = phrases[i]
                    built[i] = _build_phrase(
                        searcher, content, slop, in_order, node.field
                        if node.field != "text" else field, lowercase,
                        max_expansions)
                q = built[i]
                if node.boost != 1.0 and hasattr(q, "boost"):
                    q = dataclasses.replace(q, boost=q.boost * node.boost)
                return q
        if isinstance(node, ast.BooleanQuery):
            return ast.BooleanQuery(
                tuple((occ, replace(sub)) for occ, sub in node.clauses),
                node.min_should_match)
        return node

    return replace(outer)
