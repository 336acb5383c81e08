"""Chinese (smartcn-analogue) segmentation: reference vectors + invariants.

Vector source: ``lucene/analysis/smartcn/src/test/org/apache/lucene/
analysis/cn/smart/TestSmartChineseAnalyzer.java:28-50`` (stop-word filtering
is a documented cut, so the function words 我/了/和 appear in our stream —
the reference keeps them too in these vectors).
"""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.analysis import get_analyzer  # noqa: E402
from lucene_spark.analysis_zh import ChineseAnalyzer, ChineseTokenizer  # noqa: E402

REFERENCE_VECTORS = [
    # TestSmartChineseAnalyzer.java:28-38
    ("我购买了道具和服装。", ["我", "购买", "了", "道具", "和", "服装"]),
    # :44-50 — two phrases through the sentence chain
    ("我购买了道具和服装。 我购买了道具和服装。",
     ["我", "购买", "了", "道具", "和", "服装"] * 2),
]


@pytest.mark.parametrize("text,expected", REFERENCE_VECTORS)
def test_reference_segmentations(text, expected):
    assert ChineseAnalyzer().tokenize_text(text) == expected


def test_crossing_ambiguity_resolves_by_cost():
    # 搜索引擎: the crossing candidates 搜索|索引 overlap; the lattice must
    # pick 搜索|引擎 (both dictionary words), not strand single chars
    a = ChineseAnalyzer()
    assert a.tokenize_text("搜索引擎") == ["搜索", "引擎"]
    assert a.tokenize_text("中文分词的结果") == ["中文", "分词", "的", "结果"]


def test_oov_hanzi_per_char_and_mixed_script():
    a = ChineseAnalyzer()
    # OOV hanzi fall back to single-character words (smartcn behavior)
    assert a.tokenize_text("鑫垚") == ["鑫", "垚"]
    assert a.tokenize_text("Spark 是搜索引擎吗") == [
        "spark", "是", "搜索", "引擎", "吗"]
    assert a.tokenize_text("") == []


def test_lossless_and_series_paths():
    t = ChineseTokenizer()
    for run in ["我购买了道具和服装", "搜索引擎", "数据库查询"]:
        assert "".join(t.segment(run)) == run
    a = get_analyzer("smart_chinese")
    assert isinstance(a, ChineseAnalyzer)
    s = pd.Series(["我购买了道具和服装。", None])
    toks = a.tokenize_series(s).tolist()
    assert toks == [["我", "购买", "了", "道具", "和", "服装"], []]
    uniq, codes, lens = a.tokenize_ids(s)
    assert [uniq[c] for c in codes] == toks[0]
    assert lens.tolist() == [6, 0]
