"""Greek analysis chain parity vs the reference's own test vectors.

``TestGreekStemmer.java`` pins 343 word→stem vectors through the full
GreekAnalyzer chain (lowercase/fold + stop + stem); when the reference tree
is present we extract and replay every one of them. The inline subset keeps
the algorithm pinned without the tree.
"""

import os
import re

import pandas as pd
import pytest

from lucene_spark.analysis_el import (
    GREEK_STOP_WORDS,
    GreekAnalyzer,
    greek_lower,
    greek_stem,
)

_REF_TEST = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
             "lucene/analysis/el/TestGreekStemmer.java")

# inline subset (from TestGreekStemmer.java)
INLINE = [
    ("άνθρωπος", "ανθρωπ"), ("ανθρώπου", "ανθρωπ"), ("άνθρωπο", "ανθρωπ"),
    ("άνθρωπε", "ανθρωπ"), ("άνθρωποι", "ανθρωπ"), ("ανθρώπων", "ανθρωπ"),
    ("ανθρώπους", "ανθρωπ"),
    ("πελάτης", "πελατ"), ("πελάτη", "πελατ"), ("πελάτες", "πελατ"),
    ("πελατών", "πελατ"),
]


@pytest.mark.parametrize("word,stem", INLINE)
def test_inline_goldens(word, stem):
    a = GreekAnalyzer()
    assert a.tokenize_text(word) == [stem]


def test_full_reference_vector_set():
    if not os.path.exists(_REF_TEST):
        pytest.skip("reference tree not available")
    src = open(_REF_TEST, encoding="utf-8").read()
    pairs = re.findall(r'checkOneTerm\(\s*a,\s*"([^"]*)",\s*"([^"]*)"\)', src)
    assert len(pairs) >= 300  # the reference ships 343
    a = GreekAnalyzer()
    bad = []
    for w, want in pairs:
        toks = a.tokenize_text(w)
        got = toks[0] if toks else ""
        if got != want:
            bad.append((w, want, got))
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_lowercase_filter():
    # final sigma standardizes, tonos/dialytika strip, capitals fold
    assert greek_lower("ΜΆΪΟΣ") == "μαιοσ"
    assert greek_lower("ΜΑΪΟΣ") == "μαιοσ"
    assert greek_lower("Άνθρωπος") == "ανθρωποσ"
    assert greek_lower("ς") == "σ"
    assert greek_lower("αΰλος") == "αυλοσ"


def test_stopwords_drop():
    a = GreekAnalyzer()
    assert a.tokenize_text("και το τραπεζι") == [greek_stem("τραπεζι")]
    for w in ("και", "του", "εκεινοσ"):
        assert w in GREEK_STOP_WORDS


def test_short_words_unstemmed():
    assert greek_stem("και") == "και"
    assert greek_stem("α") == "α"


def test_ids_path_matches_text_path():
    a = GreekAnalyzer()
    texts = pd.Series([
        "και το ΤΡΑΠΕΖΙ με τιμές", "κυριος ανθρωπου", None, "",
        "mixed ascii τραπεζια text",
    ])
    uniq, codes, per_row = a.tokenize_ids(texts)
    flat = [uniq[c] for c in codes]
    rows, i = [], 0
    for n in per_row:
        rows.append(flat[i:i + n])
        i += n
    assert rows == [a.tokenize_text(t or "") for t in texts]
