"""Korean (nori-analogue) segmentation: reference vectors + shared-lattice
invariants.

Vector sources: ``lucene/analysis/nori/src/test/org/apache/lucene/analysis/
ko/TestKoreanTokenizer.java`` — testSeparateNumber (:128-143), testSpaces /
testPartOfSpeechs (:145-176, 화학 이외의 것 → 화학|이외|의|것 with the josa
의 split off).
"""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.analysis import get_analyzer  # noqa: E402
from lucene_spark.analysis_ko import KoreanAnalyzer, KoreanTokenizer  # noqa: E402

REFERENCE_VECTORS = [
    # TestKoreanTokenizer.java:145-176 — particle split
    ("화학 이외의 것", ["화학", "이외", "의", "것"]),
    # :146-152 — whitespace spans don't change the tokens
    ("화학        이외의         것", ["화학", "이외", "의", "것"]),
    # :128-134 — numbers separate from Hangul
    ("44사이즈", ["44", "사이즈"]),
]


@pytest.mark.parametrize("text,expected", REFERENCE_VECTORS)
def test_reference_segmentations(text, expected):
    assert KoreanAnalyzer().tokenize_text(text) == expected


def test_particle_splitting_and_oov_grouping():
    a = KoreanAnalyzer()
    assert a.tokenize_text("데이터를 검색했다") == [
        "데이터", "를", "검색", "했다"]
    # out-of-vocabulary Hangul run stays one token (unknown grouping class)
    assert a.tokenize_text("서울타워") == ["서울타워"]
    assert a.tokenize_text("") == []


def test_lossless_and_series_paths():
    t = KoreanTokenizer()
    for run in ["화학이외의것", "한국어의형태소분석", "데이터를검색"]:
        assert "".join(t.segment(run)) == run
    a = get_analyzer("korean")
    assert isinstance(a, KoreanAnalyzer)
    s = pd.Series(["화학 이외의 것", None])
    toks = a.tokenize_series(s).tolist()
    assert toks == [["화학", "이외", "의", "것"], []]
    uniq, codes, lens = a.tokenize_ids(s)
    assert [uniq[c] for c in codes] == toks[0]
    assert lens.tolist() == [4, 0]


def test_japanese_chain_unaffected_by_subclassing():
    from lucene_spark.analysis_ja import JapaneseAnalyzer

    ja = JapaneseAnalyzer()
    assert ja.tokenize_text("関西国際空港に行った") == [
        "関西", "国際", "空港", "に", "行っ", "た"]
    assert ja.tokenize_text("すもももももももものうち") == [
        "すもも", "も", "もも", "も", "もも", "の", "うち"]
