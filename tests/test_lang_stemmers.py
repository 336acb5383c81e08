"""German/French light stemmer parity vs the reference's golden data.

The reference pins these stemmers with full-vocabulary data files
(``delighttestdata.zip`` 35k pairs, ``frlighttestdata.zip`` 20k pairs,
vocabulary tests in ``TestGermanLightStemFilter.java`` /
``TestFrenchLightStemFilter.java``); when the reference tree is present we
replay the ENTIRE vocabulary, else the inline subset keeps the algorithm
pinned.
"""

import os
import zipfile

import pandas as pd
import pytest

from lucene_spark.analysis_lang import (
    LightStemAnalyzer,
    french_light_stem,
    german_light_stem,
)

_REF = "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/analysis"

# inline subset of the reference golden files (public Apache test data)
DE_GOLDENS = [
    ("aalglatten", "aalglatt"), ("häuser", "haus"), ("hauses", "haus"),
    ("tables", "tabl"), ("bildern", "bild"), ("schönste", "schon"),
]
FR_GOLDENS = [
    ("chevaux", "cheval"), ("cheval", "cheval"), ("hiboux", "hibou"),
    ("chantés", "chant"), ("chanter", "chant"), ("baronnes", "baron"),
    ("investissement", "investi"), ("justificatrice", "justifi"),
    ("communicateur", "comuniqu"), ("pratiquement", "pratiqu"),
    ("administrativement", "administratif"),
]


@pytest.mark.parametrize("word,stem", DE_GOLDENS)
def test_german_inline_goldens(word, stem):
    assert german_light_stem(word) == stem


@pytest.mark.parametrize("word,stem", FR_GOLDENS)
def test_french_inline_goldens(word, stem):
    assert french_light_stem(word) == stem


def _replay(zip_path, fname, stem_fn):
    if not os.path.exists(zip_path):
        pytest.skip("reference tree not available")
    data = zipfile.ZipFile(zip_path).read(fname).decode("utf-8")
    bad = [
        (w, want, stem_fn(w))
        for w, want in (ln.split("\t") for ln in data.splitlines() if ln)
        if stem_fn(w) != want
    ]
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_german_full_vocabulary():
    _replay(f"{_REF}/de/delighttestdata.zip", "delight.txt",
            german_light_stem)


def test_french_full_vocabulary():
    _replay(f"{_REF}/fr/frlighttestdata.zip", "frlight.txt",
            french_light_stem)


@pytest.mark.parametrize("lang,zname,fname,fn", [
    ("es", "eslighttestdata.zip", "eslight.txt", "spanish_light"),
    ("it", "itlighttestdata.zip", "itlight.txt", "italian_light"),
    ("sv", "svlighttestdata.zip", "svlight.txt", "swedish_light"),
    ("pt", "ptlighttestdata.zip", "ptlight.txt", "portuguese_light"),
    ("fi", "filighttestdata.zip", "filight.txt", "finnish_light"),
    ("hu", "hulighttestdata.zip", "hulight.txt", "hungarian_light"),
    ("ru", "rulighttestdata.zip", "rulight.txt", "russian_light"),
    ("de", "deminimaltestdata.zip", "deminimal.txt", "german_minimal"),
    ("fr", "frminimaltestdata.zip", "frminimal.txt", "french_minimal"),
    ("pt", "ptminimaltestdata.zip", "ptminimal.txt", "portuguese_minimal"),
])
def test_other_full_vocabularies(lang, zname, fname, fn):
    from lucene_spark.analysis_lang import STEMMERS
    _replay(f"{_REF}/{lang}/{zname}", fname, STEMMERS[fn])


# EnglishMinimalStemmer (S-stemmer) — TestEnglishMinimalStemFilter.java:51-59
@pytest.mark.parametrize("word,stem", [
    ("queries", "query"), ("phrases", "phrase"), ("corpus", "corpus"),
    ("stress", "stress"), ("kings", "king"), ("panels", "panel"),
    ("aerodynamics", "aerodynamic"), ("congress", "congress"),
    ("serious", "serious"), ("", ""),
])
def test_english_minimal_goldens(word, stem):
    from lucene_spark.analysis_lang import english_minimal_stem
    assert english_minimal_stem(word) == stem


@pytest.mark.parametrize("fname,fn", [
    ("nb_light.txt", "norwegian_light"),
    ("nn_light.txt", "nynorsk_light"),
    ("nb_minimal.txt", "norwegian_minimal"),
    ("nn_minimal.txt", "nynorsk_minimal"),
])
def test_norwegian_vocabularies(fname, fn):
    # Norwegian goldens ship as plain txt (TestNorwegianLightStemFilter
    # testVocabulary / testNynorskVocabulary data files)
    path = f"{_REF}/no/{fname}"
    if not os.path.exists(path):
        pytest.skip("reference tree not available")
    from lucene_spark.analysis_lang import STEMMERS
    stem = STEMMERS[fn]
    with open(path, encoding="utf-8") as fh:
        pairs = [ln.strip().split("\t") for ln in fh
                 if ln.strip() and not ln.startswith("#")]
    bad = [(w, want, stem(w)) for w, want in pairs if stem(w) != want]
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_bulgarian_reference_vectors():
    # TestBulgarianStemmer.java pins 101 word→stem pairs; extract and
    # replay all of them when the reference tree is present
    import re
    path = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
            "lucene/analysis/bg/TestBulgarianStemmer.java")
    if not os.path.exists(path):
        pytest.skip("reference tree not available")
    from lucene_spark.analysis_lang import bulgarian_stem
    src = open(path, encoding="utf-8").read()
    pairs = re.findall(
        r'assertAnalyzesTo\(\s*a,\s*"([^"]*)",\s*new String\[\]\s*\{"([^"]*)"\}\)',
        src)
    assert len(pairs) >= 100
    bad = [(w, want, bulgarian_stem(w)) for w, want in pairs
           if bulgarian_stem(w) != want]
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_bulgarian_inline_goldens():
    from lucene_spark.analysis_lang import bulgarian_stem
    # ц→к plural rewrite, definite article, vowel strips
    assert bulgarian_stem("таблиците") == "таблик"
    assert bulgarian_stem("таблици") == "таблик"
    assert bulgarian_stem("ценности") == "ценност"
    assert bulgarian_stem("кон") == "кон"  # < 4 chars unstemmed


def test_indonesian_reference_vectors():
    # TestIndonesianStemmer.java: analyzer 'a' = derivational (63 vectors),
    # 'b' = inflectional-only (4 vectors)
    import re
    path = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
            "lucene/analysis/id/TestIndonesianStemmer.java")
    if not os.path.exists(path):
        pytest.skip("reference tree not available")
    from lucene_spark.analysis_lang import (
        indonesian_inflectional_stem,
        indonesian_stem,
    )
    src = open(path, encoding="utf-8").read()
    for var, fn, floor in [("a", indonesian_stem, 60),
                           ("b", indonesian_inflectional_stem, 4)]:
        pairs = re.findall(
            r'checkOneTerm\(\s*' + var + r',\s*"([^"]*)",\s*"([^"]*)"\)', src)
        assert len(pairs) >= floor
        bad = [(w, want, fn(w)) for w, want in pairs if fn(w) != want]
        assert not bad, f"{var}: {len(bad)} mismatches, first: {bad[:5]}"


def test_indonesian_inline_goldens():
    from lucene_spark.analysis_lang import indonesian_stem
    # derivational: meny→s rewrite, ber- prefix, -kan suffix with flag guard
    assert indonesian_stem("menyapu") == "sapu"
    assert indonesian_stem("berlari") == "lari"
    assert indonesian_stem("bukunya") == "buku"
    assert indonesian_stem("bukukah") == "buku"
    # ≤2 syllables stay unstemmed (English tokens mostly pass through)
    assert indonesian_stem("tables") == "tables"


def test_minimal_registry():
    from lucene_spark.analysis import get_analyzer
    for name in ("german_minimal", "french_minimal", "english_minimal",
                 "portuguese_minimal"):
        assert get_analyzer(name).name == name


def test_keyword_marker_exclusions():
    a = LightStemAnalyzer("german_light", exclusions={"tables"})
    assert a.filter_token("tables") == "tables"
    assert a.filter_token("bildern") == "bild"


def test_ids_path_matches_text_path():
    for lang in ("german_light", "french_light"):
        from lucene_spark.analysis import get_analyzer
        a = get_analyzer(lang)
        texts = pd.Series(
            ["tables values bildern chevaux", "chantés baronnes", None, ""])
        uniq, codes, per_row = a.tokenize_ids(texts)
        flat = [uniq[c] for c in codes]
        rows, i = [], 0
        for n in per_row:
            rows.append(flat[i:i + n])
            i += n
        assert rows == [a.tokenize_text(t or "") for t in texts]
