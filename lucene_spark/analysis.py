"""Vectorized analyzers — the tokenize/lowercase/stop chain of the reference.

Reference semantics (``core/analysis/standard/StandardAnalyzer.java:85-97``):
StandardTokenizer (UAX#29 word break) → LowerCaseFilter → StopFilter with an
EMPTY default stop set. Tokens longer than ``maxTokenLength`` (255 default,
``StandardAnalyzer.java:37``) are dropped by the tokenizer (they still bump the
position counter, ``StandardTokenizer.java:145-168``) and therefore do NOT
contribute to the field length used for norms.

We implement two analyzers, both as batch-vectorized pandas operations (no
per-row Python UDFs — these run inside Arrow ``mapInPandas`` batches):

- ``StandardAnalyzer``: UAX#29-compatible on the declared ASCII corpus
  alphabet: alphanumeric(+underscore ExtendNumLet) runs, with mid-token
  joiners per UAX#29 WB6-12 — ``'`` and ``.`` join alnum on both sides,
  ``:`` joins letters only, ``,`` joins digits only. Exact parity with the
  reference on any text restricted to ``[a-z A-Z 0-9]`` words and plain
  punctuation separators (which is what the test corpus declares); documented
  approximation outside that alphabet (full Unicode UAX#29 is out of scope).
- ``SimpleAnalyzer``: lowercase ``[a-z0-9]+`` runs. Trivially expressible in
  ANSI SQL (``regexp_split_to_array``-style), used for the DuckDB-checked
  oracle queries. Mirrors the spirit of Lucene's SimpleAnalyzer
  (letter-run tokenizer + lowercase).
"""

from __future__ import annotations

import itertools
import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.java:37

# ASCII UAX#29 word-break approximation (see module docstring).
# Base run: [A-Za-z0-9_]+ ; joiners between base runs:
#   '  and .  : both-sided alnum (Single_Quote / MidNumLet, WB6-7 + WB11-12)
#   :         : letters both sides (MidLetter, WB6-7)
#   ,         : digits both sides (MidNum, WB11-12)
_STANDARD_RE = re.compile(
    r"[A-Za-z0-9_]+"
    r"(?:(?:['.]|(?<=[A-Za-z]):(?=[A-Za-z])|(?<=[0-9]),(?=[0-9]))[A-Za-z0-9_]+)*"
)
# a token must contain at least one letter or digit (pure "_" runs are not words)
_HAS_ALNUM_RE = re.compile(r"[A-Za-z0-9]")

_SIMPLE_RE = re.compile(r"[a-z0-9]+")


@dataclass(frozen=True)
class StandardAnalyzer:
    """UAX#29-ish tokenizer + lowercase + (empty) stop set. See module doc."""

    max_token_length: int = MAX_TOKEN_LENGTH
    stopwords: frozenset = field(default_factory=frozenset)

    name = "standard"

    def tokenize_text(self, text: str) -> list[str]:
        if not text:
            return []
        toks = [
            t.lower()
            for t in _STANDARD_RE.findall(text)
            if len(t) <= self.max_token_length and _HAS_ALNUM_RE.search(t)
        ]
        if self.stopwords:
            toks = [t for t in toks if t not in self.stopwords]
        return toks

    def tokenize_series(self, texts: pd.Series) -> pd.Series:
        """Batch tokenize a pandas string Series → Series of list[str]."""
        s = texts.fillna("")
        out = s.str.findall(_STANDARD_RE)
        if self.max_token_length < 10**9:
            ml = self.max_token_length
            out = out.map(
                lambda ts: [
                    t.lower() for t in ts if len(t) <= ml and _HAS_ALNUM_RE.search(t)
                ]
            )
        if self.stopwords:
            sw = self.stopwords
            out = out.map(lambda ts: [t for t in ts if t not in sw])
        return out

    def tokenize_flat(self, texts: pd.Series):
        """Batch tokenize → (flat_tokens: object ndarray, per_row_counts: int64).

        The hot path for index builds: one C-level findall over lowercased
        text, one chain-flatten, then vectorized length/underscore filtering
        (the per-token regex fallback runs only on the rare '_' tokens).
        ASCII casing doesn't move token boundaries, so lowercase-then-tokenize
        ≡ tokenize-then-lowercase for this analyzer.
        """
        lists = texts.fillna("").str.lower().str.findall(_STANDARD_RE)
        lens = np.fromiter((len(x) for x in lists), dtype=np.int64, count=len(lists))
        flat = pd.Series(
            list(itertools.chain.from_iterable(lists)), dtype=object
        )
        if len(flat) == 0:
            return np.array([], dtype=object), lens
        tlen = flat.str.len().to_numpy()
        keep = tlen <= self.max_token_length
        has_us = flat.str.contains("_", regex=False).to_numpy()
        if has_us.any():
            sub = flat[has_us]
            ok = sub.map(lambda t: _HAS_ALNUM_RE.search(t) is not None).to_numpy()
            keep[np.flatnonzero(has_us)] &= ok
        if self.stopwords:
            keep &= ~flat.isin(self.stopwords).to_numpy()
        if not keep.all():
            row_ids = np.repeat(np.arange(lens.size), lens)
            lens = np.bincount(row_ids[keep], minlength=lens.size).astype(np.int64)
            flat = flat[keep]
        return flat.to_numpy(dtype=object), lens


@dataclass(frozen=True)
class SimpleAnalyzer:
    """lowercase [a-z0-9]+ runs — ANSI-SQL-expressible; used by oracle queries.

    DuckDB equivalent of ``tokenize_series``:
    ``unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))``.
    Spark SQL equivalent (JVM-side, no UDF):
    ``explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0))``.
    """

    name = "simple"

    def tokenize_text(self, text: str) -> list[str]:
        if not text:
            return []
        return _SIMPLE_RE.findall(text.lower())

    def tokenize_series(self, texts: pd.Series) -> pd.Series:
        return texts.fillna("").str.lower().str.findall(_SIMPLE_RE)

    def tokenize_flat(self, texts: pd.Series):
        lists = texts.fillna("").str.lower().str.findall(_SIMPLE_RE)
        lens = np.fromiter((len(x) for x in lists), dtype=np.int64, count=len(lists))
        flat = np.array(list(itertools.chain.from_iterable(lists)), dtype=object)
        return flat, lens


def get_analyzer(name: str):
    if name == "standard":
        return StandardAnalyzer()
    if name == "simple":
        return SimpleAnalyzer()
    raise ValueError(f"unknown analyzer: {name}")
