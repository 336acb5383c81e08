"""XML query parser — the reference's ``queryparser/xml`` CoreParser
(``CoreParser.java:55,88-135`` element → builder registry) re-expressed as
ElementTree → AST.

Supported elements (each cites its builder):

- ``TermQuery`` (`builders/TermQueryBuilder.java:30-40`): raw unanalyzed
  text content, ``fieldName`` inheritable attribute, ``boost``.
- ``TermsQuery`` (`TermsQueryBuilder.java:46-70`): ANALYZED text → SHOULD
  boolean of term clauses, ``minimumNumberShouldMatch``.
- ``BooleanQuery`` / ``Clause occurs=`` (`BooleanQueryBuilder.java:44-82`):
  must / mustNot / should / filter, ``minimumNumberShouldMatch``, nested
  anything.
- ``UserQuery`` (`UserInputQueryBuilder.java`): classic-syntax passthrough
  to :func:`lucene_spark.search.ast.parse`.
- ``MatchAllDocsQuery`` (`MatchAllDocsQueryBuilder.java`).
- ``RangeQuery`` (`RangeQueryBuilder.java`): lowerTerm/upperTerm,
  includeLower/includeUpper → TermRangeQuery (constant-score rewrite).
- ``ConstantScoreQuery`` (`ConstantScoreQueryBuilder.java`): wraps its
  child query at f32(boost).
- ``DisjunctionMaxQuery`` (`DisjunctionMaxQueryBuilder.java`):
  ``tieBreaker``; v1 children must be TermQuery elements (the engine's
  dismax scorer takes term subs — non-term children raise).
- Spans (`SpanTermBuilder/SpanNearBuilder/SpanOrBuilder/
  SpanOrTermsBuilder/SpanFirstBuilder/SpanNotBuilder`): SpanTerm, SpanOr
  (of SpanTerms), SpanOrTerms (analyzed alternatives), SpanNear
  (slop/inOrder), SpanFirst (end), SpanNot (Include/Exclude) — mapped onto
  the engine's slot-based span AST; a standalone SpanTerm/SpanOr is a
  one-slot SpanNear (same match set).

Documented out (raise ParserException): PointRangeQuery (numeric
doc-values ranges run through the native WHERE surface, not the query
AST), BoostingTermQuery (payload scoring has its own entry point),
LikeThisQuery / FuzzyLikeThisQuery, SpanPositionRange beyond SpanFirst.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from lucene_spark.search import ast


class ParserException(ValueError):
    """Mirrors ``queryparser/xml/ParserException.java``."""


def _field(e: ET.Element, inherited: str) -> str:
    return e.get("fieldName", inherited)


def _boost(e: ET.Element) -> float:
    return float(e.get("boost", "1.0"))


def _boosted(q, b: float):
    """Apply a group boost: leaves multiply their boost (the reference's
    BoostQuery rewrite); a BooleanQuery — which carries no boost of its
    own, exactly like the reference — distributes onto its SCORING
    clauses (MUST/SHOULD), mirroring ``ast._combined_boost`` semantics."""
    if b == 1.0:
        return q
    if isinstance(q, ast.BooleanQuery):
        return ast.BooleanQuery(
            tuple((occ, _boosted(sub, b)
                   if occ in (ast.MUST, ast.SHOULD) else sub)
                  for occ, sub in q.clauses),
            min_should_match=q.min_should_match)
    import dataclasses

    return dataclasses.replace(q, boost=q.boost * b)


def _text(e: ET.Element) -> str:
    t = (e.text or "").strip()
    if not t:
        raise ParserException(f"<{e.tag}> requires non-blank text")
    return t


_OCCURS = {"should": ast.SHOULD, "must": ast.MUST,
           "mustnot": ast.MUST_NOT, "filter": ast.FILTER, "": ast.SHOULD}


class XmlQueryParser:
    """CoreParser analogue: ``parse(xml_string) -> AST``."""

    def __init__(self, analyzer, default_field: str = "text",
                 fields: tuple = ("text",)):
        self.analyzer = analyzer
        self.default_field = default_field
        self.fields = fields

    def parse(self, xml: str):
        try:
            root = ET.fromstring(xml)
        except ET.ParseError as ex:
            raise ParserException(f"malformed XML: {ex}") from ex
        return ast.normalize(self._query(root, self.default_field))

    # -- query elements ------------------------------------------------------
    def _query(self, e: ET.Element, field: str):
        tag = e.tag
        if tag == "TermQuery":
            return ast.TermQuery(_text(e), field=_field(e, field),
                                 boost=_boost(e))
        if tag == "TermsQuery":
            f = _field(e, field)
            toks = self.analyzer.tokenize_text(_text(e))
            msm = int(e.get("minimumNumberShouldMatch", "0"))
            bq = ast.BooleanQuery(
                tuple((ast.SHOULD, ast.TermQuery(t, field=f))
                      for t in toks),
                min_should_match=msm)
            return _boosted(bq, _boost(e)) if _boost(e) != 1.0 else bq
        if tag == "MatchAllDocsQuery":
            return ast.MatchAllDocsQuery()
        if tag == "UserQuery":
            q = ast.parse(_text(e), self.analyzer,
                          default_field=self.default_field,
                          fields=self.fields)
            b = _boost(e)
            return _boosted(q, b) if b != 1.0 else q
        if tag == "BooleanQuery":
            clauses = []
            for c in e:
                if c.tag != "Clause":
                    continue
                occ = _OCCURS.get(c.get("occurs", "").lower())
                if occ is None:
                    raise ParserException(
                        f"invalid occurs: {c.get('occurs')!r}")
                subs = [x for x in c]
                if len(subs) != 1:
                    raise ParserException("Clause needs exactly one query")
                clauses.append((occ, self._query(subs[0],
                                                 _field(e, field))))
            bq = ast.BooleanQuery(
                tuple(clauses),
                min_should_match=int(
                    e.get("minimumNumberShouldMatch", "0")))
            b = _boost(e)
            return _boosted(bq, b) if b != 1.0 else bq
        if tag == "RangeQuery":
            return ast.MultiTermQuery(
                "range", field=_field(e, field),
                lower=e.get("lowerTerm"), upper=e.get("upperTerm"),
                include_lower=e.get("includeLower", "true") == "true",
                include_upper=e.get("includeUpper", "true") == "true",
                boost=_boost(e))
        if tag == "ConstantScoreQuery":
            subs = [x for x in e]
            if len(subs) != 1:
                raise ParserException("ConstantScoreQuery needs one child")
            return ast.ConstantScoreQuery(
                self._query(subs[0], field), boost=_boost(e))
        if tag == "DisjunctionMaxQuery":
            terms = []
            f = _field(e, field)
            for c in e:
                if c.tag != "TermQuery":
                    raise ParserException(
                        "v1 DisjunctionMaxQuery children must be "
                        "TermQuery elements (engine dismax takes terms)")
                # never silently ignore child attributes the engine's
                # single-field / unweighted dismax cannot honor
                if _field(c, f) != f or _boost(c) != 1.0:
                    raise ParserException(
                        "v1 DisjunctionMaxQuery children cannot carry "
                        "their own fieldName/boost")
                terms.append(_text(c))
            return ast.DisjunctionMaxQuery(
                tuple(terms), tie_breaker=float(e.get("tieBreaker", "0.0")),
                field=_field(e, field), boost=_boost(e))
        if tag in ("SpanTerm", "SpanOr", "SpanOrTerms", "SpanNear",
                   "SpanFirst", "SpanNot"):
            return self._span_query(e, field)
        raise ParserException(f"unsupported element: <{tag}>")

    # -- span elements -------------------------------------------------------
    def _span_slot(self, e: ET.Element, field: str):
        """One span child → a slot (tuple of term alternatives)."""
        if e.tag == "SpanTerm":
            return (_text(e),)
        if e.tag == "SpanOr":
            alts = []
            for c in e:
                if c.tag != "SpanTerm":
                    raise ParserException(
                        "v1 SpanOr children must be SpanTerm")
                alts.append(_text(c))
            return tuple(alts)
        if e.tag == "SpanOrTerms":
            toks = self.analyzer.tokenize_text(_text(e))
            if not toks:
                raise ParserException("SpanOrTerms analyzed to nothing")
            return tuple(toks)
        raise ParserException(f"unsupported span element: <{e.tag}>")

    def _span_query(self, e: ET.Element, field: str):
        f = _field(e, field)
        b = _boost(e)
        if e.tag in ("SpanTerm", "SpanOr", "SpanOrTerms"):
            # standalone single-slot span — same doc match set
            return ast.SpanNearQuery((self._span_slot(e, f),), field=f,
                                     slop=0, in_order=True, boost=b)
        if e.tag == "SpanNear":
            slots = tuple(self._span_slot(c, f) for c in e)
            return ast.SpanNearQuery(
                slots, field=f, slop=int(e.get("slop", "0")),
                in_order=e.get("inOrder", "true") == "true", boost=b)
        if e.tag == "SpanFirst":
            subs = [x for x in e]
            if len(subs) != 1:
                raise ParserException("SpanFirst needs one child span")
            return ast.SpanFirstQuery(
                (self._span_slot(subs[0], f),), end=int(e.get("end", "1")),
                field=f, boost=b)
        if e.tag == "SpanNot":
            inc = e.find("Include")
            exc = e.find("Exclude")
            if inc is None or exc is None:
                raise ParserException("SpanNot needs Include and Exclude")
            inc_subs = [x for x in inc]
            exc_subs = [x for x in exc]
            if len(inc_subs) != 1 or len(exc_subs) != 1:
                raise ParserException(
                    "Include/Exclude need exactly one span each")
            inc_q = inc_subs[0]
            if inc_q.tag == "SpanNear":
                slots = tuple(self._span_slot(c, f) for c in inc_q)
                slop = int(inc_q.get("slop", "0"))
                in_order = inc_q.get("inOrder", "true") == "true"
            else:
                slots = (self._span_slot(inc_q, f),)
                slop, in_order = 0, True
            exc_slot = self._span_slot(exc_subs[0], f)
            if len(exc_slot) != 1:
                raise ParserException("v1 Exclude must be a single term")
            return ast.SpanNotQuery(
                slots, exclude=exc_slot[0], slop=slop, in_order=in_order,
                field=f, boost=b)
        raise ParserException(f"unsupported span element: <{e.tag}>")


def parse_xml(xml: str, analyzer, default_field: str = "text",
              fields: tuple = ("text",)):
    return XmlQueryParser(analyzer, default_field, fields).parse(xml)
