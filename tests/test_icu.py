"""ICU folding parity: the reference's TestICUFoldingFilter vectors.

The reference test drives ICUFoldingFilter behind a whitespace MockTokenizer
(``lucene/analysis/icu/src/test/org/apache/lucene/analysis/icu/
TestICUFoldingFilter.java:36-40``), so each whitespace token folds
independently — replayed here through :func:`icu_fold` one token at a time,
plus end-to-end analyzer/session coverage for the engine integration.
"""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.analysis import get_analyzer  # noqa: E402
from lucene_spark.analysis_icu import ICUFoldingAnalyzer, icu_fold  # noqa: E402

# TestICUFoldingFilter.java:49-86 — (input, expected tokens) verbatim
REFERENCE_VECTORS = [
    ("This is a test", ["this", "is", "a", "test"]),       # case folding
    ("Ruß", ["russ"]),                                      # case folding
    ("ΜΆΪΟΣ", ["μαιοσ"]),                 # case folding with accent removal
    ("Μάϊος", ["μαιοσ"]),
    ("𐐖", ["𐐾"]),                           # supplementary case folding
    ("ﴳﴺﰧ", ["طمطمطم"]),                               # normalization
    ("क्‍ष", ["कष"]),                # removal of default ignorables
    ("résumé", ["resume"]),            # latin accent removal (composed)
    ("résumé", ["resume"]),  # latin accents (decomposed)
    ("৭০৬", ["706"]),                                 # fold native digits
    ("đis is cræzy", ["dis", "is", "craezy"]),  # ascii-folding-type stuff
    ("ELİF", ["elif"]),                # Turkish dotted-capital-I casefold
    ("eli̇f", ["elif"]),        # decomposed combining-dot-above
]


@pytest.mark.parametrize("text,expected", REFERENCE_VECTORS)
def test_reference_vectors(text, expected):
    assert [icu_fold(t) for t in text.split(" ")] == expected


def test_empty_term():
    # TestICUFoldingFilter.testEmptyTerm — checkOneTerm(a, "", "")
    assert icu_fold("") == ""


def test_idempotent():
    for text, expected in REFERENCE_VECTORS:
        for t in expected:
            assert icu_fold(t) == t


def test_analyzer_chain_end_to_end():
    a = get_analyzer("icu_folding")
    assert isinstance(a, ICUFoldingAnalyzer)
    assert a.tokenize_text("Das Résumé von Straße 42") == [
        "das", "resume", "von", "strasse", "42"]
    # vocabulary-level remap path (the indexing path)
    s = pd.Series(["Résumé straße", "resume strasse", None])
    toks = a.tokenize_series(s).tolist()
    assert toks[0] == toks[1] == ["resume", "strasse"]
    assert toks[2] == []


def test_tokenize_ids_matches_text_path():
    a = ICUFoldingAnalyzer()
    s = pd.Series(["Café résumé café", "ΜΆΪΟΣ και μάϊος", "straße 706"])
    uniq, codes, lens = a.tokenize_ids(s)
    flat = [uniq[c] for c in codes]
    expect = [t for row in s for t in a.tokenize_text(row)]
    assert flat == expect
    assert lens.tolist() == [len(a.tokenize_text(r)) for r in s]
