"""MemoryIndex: a single-document, driver-local index for one-off scoring
and percolation (``memory/src/java/org/apache/lucene/index/memory/
MemoryIndex.java`` — "a high-performance single-document main memory
Index… typical use: percolation / prospective search").

Semantics mirrored from the reference:

- ``add_field(name, value)`` analyzes the value into the per-field inverted
  data (``MemoryIndex.addField`` :431); ``"text"``-like fields analyze
  through the configured chain, ``keyword=True`` fields store the raw value
  unanalyzed (StringField analogy, same split as the distributed builder).
- ``search(query) -> float`` scores the ONE document against any query
  shape and returns its score, 0.0 on no match (``MemoryIndex.search``
  :236-259). Collection statistics are the single document's own —
  docCount = 1, sumTotalTermFreq = the doc's dl, every present term df = 1
  — exactly what the reference's single-doc reader reports, so BM25 here
  equals a real one-doc index's score (pytest-pinned against the Spark
  engine on a one-doc build).
- ``freeze()`` analogy is implicit: the index builds lazily on first
  search and rebuilds after further ``add_field`` calls.

This is intentionally a DRIVER-side structure (the reference class is
explicitly not an on-disk index): at cluster scale you hold one per
executor task for percolation-style matching, never a distributed job per
document. The full query surface (booleans incl. nested, phrases incl.
sloppy/multi, multiterm expansions, spans, synonyms) comes from the same
numpy evaluation core the test goldens pin against the distributed engine.
"""

from __future__ import annotations

import pandas as pd

from lucene_spark.goldens import BruteForceIndex
from lucene_spark.search import ast
from lucene_spark.similarity import BM25Similarity


class MemoryIndex:
    def __init__(self, analyzer: str = "standard", similarity=None):
        self._analyzer = analyzer
        self._similarity = similarity or BM25Similarity()
        self._text: dict[str, str] = {}
        self._keyword: dict[str, str] = {}
        self._idx: BruteForceIndex | None = None

    def add_field(self, name: str, value: str, keyword: bool = False):
        """Add one field (re-adding a field replaces it — the common
        MemoryIndex usage builds a fresh instance per document; the
        reference's append-with-position-gap multi-add is out of scope)."""
        if keyword:
            self._keyword[name] = value
        else:
            self._text[name] = value
        self._idx = None
        return self

    @classmethod
    def from_text(cls, text: str, analyzer: str = "standard",
                  similarity=None) -> "MemoryIndex":
        return cls(analyzer, similarity).add_field("text", text)

    def _index(self) -> BruteForceIndex:
        if self._idx is None:
            row = {"conv_id": ["m"], "turn_idx": [0], "role": [None],
                   "text": [self._text.get("text", "")],
                   "tool": [None], "ts": [None]}
            for k, v in self._keyword.items():
                row[k] = [v]
            self._idx = BruteForceIndex(
                pd.DataFrame(row), analyzer=self._analyzer,
                similarity=self._similarity,
                keyword_fields=tuple(self._keyword))
        return self._idx

    def search(self, query) -> float:
        """Score of the single document for ``query`` (AST node or classic
        syntax string), 0.0 when it does not match — MemoryIndex.search."""
        idx = self._index()
        if isinstance(query, str):
            query = ast.parse(query, idx.analyzer,
                              fields=("text",) + tuple(self._keyword))
        hits = idx.search(query, 1)
        return float(hits[0][1]) if hits else 0.0

    def matches(self, query) -> bool:
        """Percolation predicate: does the doc match at all? (score > 0 is
        NOT the right test — constant-score and filter-only queries can
        match at 0.0, so this checks membership, not score)."""
        idx = self._index()
        if isinstance(query, str):
            query = ast.parse(query, idx.analyzer,
                              fields=("text",) + tuple(self._keyword))
        return len(idx.search(query, 1)) > 0
