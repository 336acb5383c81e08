"""Thai dictionary segmentation + stop chain: reference TestThaiAnalyzer
vectors (``lucene/analysis/common/src/test/org/apache/lucene/analysis/th/
TestThaiAnalyzer.java``).
"""

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.analysis import get_analyzer  # noqa: E402
from lucene_spark.analysis_th import (  # noqa: E402
    THAI_STOP_WORDS, ThaiAnalyzer, ThaiTokenizer)

SENT = "การที่ได้ต้องแสดงว่างานดี"
ALL_TOKENS = ["การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี"]


def test_tokenizer_reference_vector():
    # TestThaiAnalyzer.java:40-48 — ThaiAnalyzer(EMPTY_SET)
    assert ThaiAnalyzer(stopwords=frozenset()).tokenize_text(SENT) == ALL_TOKENS
    assert ThaiTokenizer().segment(SENT) == ALL_TOKENS


def test_default_stop_set_reference_vector():
    # TestThaiAnalyzer.java:51-58 — default Thai stop set
    assert ThaiAnalyzer().tokenize_text(SENT) == ["แสดง", "งาน", "ดี"]


def test_stop_positions_leave_holes():
    a = ThaiAnalyzer()
    uniq, codes, lens, pos = a.tokenize_ids(
        pd.Series([SENT]), with_positions=True)
    assert [uniq[c] for c in codes] == ["แสดง", "งาน", "ดี"]
    # surviving tokens keep their ordinals among ALL eight tokens
    assert pos.tolist() == [4, 6, 7]
    assert lens.tolist() == [3]  # dl excludes stopped tokens


def test_mixed_thai_english():
    # TestThaiAnalyzer.java:67-74 keeps the Thai words around an English
    # stopword; with OUR default (Thai) stop set 'the' survives as a term
    a = ThaiAnalyzer(stopwords=frozenset())
    assert a.tokenize_text("การที่ได้ต้อง the แสดงว่างานดี") == (
        ALL_TOKENS[:4] + ["the"] + ALL_TOKENS[4:])
    # :76-82 — stopword adjacent to Thai text with no whitespace
    assert a.tokenize_text("การที่ได้ต้องthe แสดงว่างานดี") == (
        ALL_TOKENS[:4] + ["the"] + ALL_TOKENS[4:])


def test_reference_stop_set_size_and_membership():
    assert len(THAI_STOP_WORDS) == 115
    for w in ("การ", "ที่", "ได้", "ต้อง", "ว่า"):
        assert w in THAI_STOP_WORDS
    for w in ("แสดง", "งาน", "ดี"):
        assert w not in THAI_STOP_WORDS


def test_oov_run_groups_whole_and_registry():
    a = get_analyzer("thai")
    assert isinstance(a, ThaiAnalyzer)
    # out-of-lexicon Thai text degrades to whole-run tokens, not per-char
    assert ThaiTokenizer().segment("สวัสดีครับ") == ["สวัสดีครับ"]
    assert a.tokenize_text("") == []
