"""ICU-style folding: NFKC_CaseFold + diacritic/ignorable/digit foldings.

Mirrors the reference ``ICUFoldingFilter`` (``lucene/analysis/icu/src/java/
org/apache/lucene/analysis/icu/ICUFoldingFilter.java:55`` — the filter applies
the ``utr30`` custom normalizer: Unicode TR #30 foldings composed with
NFKC_CaseFold). The reference bakes the foldings into a compiled ICU
normalizer data file (``utr30.nrm``); this implementation reproduces the
observable behavior with the stdlib ``unicodedata`` pipeline:

1. NFKC compatibility normalization (presentation forms, width, ligatures),
2. full case folding (``str.casefold`` — Ruß→russ, ΐ handling, final sigma),
3. canonical decomposition with removal of combining marks (accent folding)
   and default-ignorable format chars (ZWJ/ZWNJ/soft hyphen — Cf category),
4. native decimal digits → ASCII digits (TR#30 digit folding),
5. the ASCIIFoldingFilter table for the residual UCA letter foldings that are
   neither case nor marks (đ→d, æ→ae, ø→o, …),
6. NFC recomposition.

The 14 reference test vectors (``TestICUFoldingFilter.java:49-86``) are
replayed verbatim in ``tests/test_icu.py`` — every one matches, including the
supplementary-plane case fold (𐐖→𐐾), Arabic presentation-form normalization,
Bengali digit folding, and the Turkish dotted-capital-I default casefold.

The filter runs at VOCABULARY level via the shared EnglishAnalyzer remap
machinery (once per unique term per Arrow batch), the same plan shape as the
stemmer chains — O(vocab) Python on an O(tokens) path.
"""

from __future__ import annotations

import unicodedata

from lucene_spark.analysis_en import EnglishAnalyzer


def icu_fold(t: str) -> str:
    """Fold ONE token per the ICUFoldingFilter contract (see module doc)."""
    t = unicodedata.normalize("NFKC", t).casefold()
    t = unicodedata.normalize("NFD", t)
    out = []
    for c in t:
        if unicodedata.combining(c):
            continue  # accent folding
        cat = unicodedata.category(c)
        if cat == "Cf":
            continue  # default-ignorable removal (ZWJ/ZWNJ/…)
        if cat == "Nd" and not c.isascii():
            out.append(str(unicodedata.digit(c)))  # native-digit folding
            continue
        out.append(c)
    from lucene_spark.analysis import _FOLD_TABLE

    return unicodedata.normalize("NFC", "".join(out)).translate(_FOLD_TABLE)


class ICUFoldingAnalyzer(EnglishAnalyzer):
    """StandardTokenizer → ICUFoldingFilter: the multilingual normalization
    default (``ICUFoldingFilterFactory.java``) — no stop set, no stemming;
    'Café', 'cafe', the decomposed form with a combining acute, and 'CAFÉ'
    all index and query as the same term."""

    name = "icu_folding"
    max_token_length = 255

    def filter_token(self, t: str) -> str | None:
        out = icu_fold(t)
        return out or None  # a token of pure ignorables folds away entirely
