"""Query-time synonym graph expansion (SynonymGraphFilter + QueryBuilder).

Reference semantics re-expressed, not ported:

- ``analysis/common/src/java/org/apache/lucene/analysis/synonym/
  SynonymGraphFilter.java:88-110``: the filter matches rule inputs against
  the token stream with an FST, LEFTMOST-LONGEST per match start, and a
  match consumes its input tokens (no new match starts inside a matched
  region); matched spans carry the original path plus each synonym output
  as side paths of one token graph.
- ``core/src/java/org/apache/lucene/util/QueryBuilder.java`` (
  ``analyzeGraphBoolean`` :470-520, ``newGraphSynonymQuery`` :660-684):
  query-time graphs are cut at articulation points into spans; a span whose
  alternatives are ALL single tokens becomes a ``SynonymQuery`` (blended
  df = max, tf summed), a span with any multi-token alternative becomes a
  SHOULD ``BooleanQuery`` of per-path queries (term or exact phrase); the
  spans combine under the default operator (SHOULD for OR, MUST for AND).

The expansion here produces exactly that AST (``ast.SynonymQuery`` /
nested ``ast.BooleanQuery`` with ``ast.PhraseQuery`` alternatives), so the
standard mixed-boolean kernel executes it and the nested DuckDB oracle can
reproduce it — no new execution machinery beyond the ``synonym`` clause
kind in :mod:`lucene_spark.search.phrase`.

At 100-TB scale this is a pure driver-side rewrite: the rule table is
query-side metadata (thousands of rules → an in-memory dict), never a
distributed join; the expanded query runs through the same one-scan
per-segment kernels as any boolean.
"""

from __future__ import annotations

from lucene_spark.search import ast


class SynonymMap:
    """Analyzed synonym rules: input token sequence → alternative output
    token sequences (``SynonymMap.Builder.add`` with ``includeOrig`` —
    query-time expansion always keeps the original path, the QueryBuilder
    convention)."""

    def __init__(self, rules, analyzer=None):
        """``rules``: iterable of (input, outputs) where ``input`` is a
        string or token tuple and ``outputs`` an iterable of strings/tuples.
        When ``analyzer`` is given, rule text analyzes through it (the
        reference builds rules through the same analyzer as the query,
        SynonymMap.Builder.join/analyze)."""

        def toks(x):
            if isinstance(x, str):
                return (tuple(analyzer.tokenize_text(x)) if analyzer
                        else tuple(x.split()))
            return tuple(x)

        self.rules: dict[tuple, tuple] = {}
        for inp, outs in rules:
            key = toks(inp)
            if not key:
                continue
            alts = tuple(o for o in (toks(o) for o in outs) if o)
            if not alts:
                continue
            self.rules[key] = self.rules.get(key, ()) + alts
        self.max_len = max((len(k) for k in self.rules), default=0)


def expand_spans(tokens, syn_map: SynonymMap):
    """Token list → list of spans, each span a tuple of alternative token
    paths (original path FIRST). Matching is leftmost-longest and a match
    consumes its input (SynonymGraphFilter FST scan)."""
    spans = []
    i, n = 0, len(tokens)
    while i < n:
        match = None
        for ln in range(min(syn_map.max_len, n - i), 0, -1):
            key = tuple(tokens[i:i + ln])
            if key in syn_map.rules:
                match = (ln, syn_map.rules[key])
                break
        if match is None:
            spans.append(((tokens[i],),))
            i += 1
        else:
            ln, alts = match
            orig = tuple(tokens[i:i + ln])
            # dedup alternatives, original first (stable order)
            seen = {orig: None}
            for a in alts:
                seen.setdefault(a, None)
            spans.append(tuple(seen))
            i += ln
    return spans


def _span_query(alts, field: str):
    """One graph span → its query (QueryBuilder.newGraphSynonymQuery):
    all-single-token spans blend as SynonymQuery; otherwise a SHOULD
    boolean of term / exact-phrase alternatives."""
    if len(alts) == 1:
        path = alts[0]
        if len(path) == 1:
            return ast.TermQuery(path[0], field=field)
        return ast.PhraseQuery(tuple(path), field=field)
    if all(len(p) == 1 for p in alts):
        return ast.SynonymQuery(tuple(p[0] for p in alts), field=field)
    return ast.BooleanQuery(tuple(
        (ast.SHOULD,
         ast.TermQuery(p[0], field=field) if len(p) == 1
         else ast.PhraseQuery(tuple(p), field=field))
        for p in alts
    ))


def graph_boolean(text: str, syn_map: SynonymMap, analyzer,
                  field: str = "text", operator: str = "or"):
    """Analyze ``text``, expand synonyms, and compose the spans under the
    default operator (``QueryBuilder.analyzeGraphBoolean``): one clause per
    span, SHOULD for "or" / MUST for "and". Returns an AST node (a single
    span collapses to its own query, the reference's single-clause
    simplification)."""
    tokens = analyzer.tokenize_text(text)
    if not tokens:
        return ast.MatchNoDocsQuery()
    spans = expand_spans(tokens, syn_map)
    occur = ast.MUST if operator == "and" else ast.SHOULD
    subs = [_span_query(alts, field) for alts in spans]
    if len(subs) == 1:
        return subs[0]
    return ast.BooleanQuery(tuple((occur, s) for s in subs))
