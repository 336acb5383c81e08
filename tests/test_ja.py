"""Japanese morphological segmentation: reference kuromoji vectors + lattice
invariants.

Vector sources (``lucene/analysis/kuromoji/src/test/org/apache/lucene/
analysis/ja/TestJapaneseTokenizer.java``): the NORMAL-mode katakana compound
(:162), the userDict sentence 関西国際空港に行った (:468-473), the readings
sentence 多くの学生が試験に落ちた。(:627), the supplementary unknown-kanji
string (:409), and the classic すもも ambiguity. Segmentations replayed with
the embedded dictionary — the point pinned here is that the LATTICE resolves
them the same way the reference's Viterbi does, including the
connection-cost-dependent alternating parse.
"""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.analysis import get_analyzer  # noqa: E402
from lucene_spark.analysis_ja import (  # noqa: E402
    JA_DICT, JapaneseAnalyzer, JapaneseTokenizer)

REFERENCE_VECTORS = [
    # TestJapaneseTokenizer.java:627 (punctuation discarded by the analyzer)
    ("多くの学生が試験に落ちた。",
     ["多く", "の", "学生", "が", "試験", "に", "落ち", "た"]),
    # TestJapaneseTokenizer.java:468-473
    ("関西国際空港に行った", ["関西", "国際", "空港", "に", "行っ", "た"]),
    # TestJapaneseTokenizer.java:162 — NORMAL mode keeps the unknown
    # katakana compound whole
    ("シニアソフトウェアエンジニア", ["シニアソフトウェアエンジニア"]),
    # TestJapaneseTokenizer.java:409 — unknown kanji emit per char,
    # including supplementary-plane
    ("𩬅艱鍟䇹愯瀛", ["𩬅", "艱", "鍟", "䇹", "愯", "瀛"]),
    # connection-cost-dependent alternating parse (see module doc)
    ("すもももももももものうち",
     ["すもも", "も", "もも", "も", "もも", "の", "うち"]),
]


@pytest.mark.parametrize("text,expected", REFERENCE_VECTORS)
def test_reference_segmentations(text, expected):
    assert JapaneseAnalyzer().tokenize_text(text) == expected


def test_cost_based_disambiguation():
    # 東京都 = 東京|都 (not 東|京都): word costs decide, both are 2-word
    a = JapaneseAnalyzer()
    assert a.tokenize_text("東京都") == ["東京", "都"]


def test_mixed_script_and_punctuation():
    a = JapaneseAnalyzer()
    assert a.tokenize_text("Lucene は検索エンジン") == [
        "lucene", "は", "検索", "エンジン"]
    assert a.tokenize_text("") == []
    assert a.tokenize_text("、。！") == []  # discardPunctuation


def test_segmentation_is_exhaustive_and_lossless():
    # every char of a Japanese run lands in exactly one token, in order
    t = JapaneseTokenizer()
    for run in ["データベースのテーブルを検索した", "日本語の形態素解析",
                "すもももももももものうち", "関西国際空港に行った"]:
        assert "".join(t.segment(run)) == run


def test_viterbi_minimality_brute_force():
    # the lattice's answer must equal brute-force min-cost enumeration
    # (word costs + 2-class connection costs) on short runs
    import itertools

    t = JapaneseTokenizer()
    from lucene_spark.analysis_ja import CONN_NN, CONN_PP, JA_PARTICLES

    def path_cost(words):
        cost, prev = 0, None
        for w in words:
            if w not in t.entries:
                return None  # brute force only walks dictionary paths
            cls = 1 if w in JA_PARTICLES else 0
            cost += t.entries[w]
            if prev is not None:
                cost += CONN_PP if (prev == 1 and cls == 1) else (
                    CONN_NN if (prev == 0 and cls == 0) else 0)
            prev = cls
        return cost

    def brute(run):
        n = len(run)
        bestc, bestp = None, None
        for cuts in itertools.product([0, 1], repeat=n - 1):
            words, s = [], 0
            for k, c in enumerate(cuts, 1):
                if c:
                    words.append(run[s:k])
                    s = k
            words.append(run[s:])
            pc = path_cost(words)
            if pc is not None and (bestc is None or pc < bestc):
                bestc, bestp = pc, words
        return bestp

    for run in ["東京都", "もものうち", "すもももも", "日本語の試験"]:
        expect = brute(run)
        if expect is not None:
            assert t.segment(run) == expect, run


def test_analyzer_series_and_ids_paths():
    a = get_analyzer("japanese")
    assert isinstance(a, JapaneseAnalyzer)
    s = pd.Series(["関西国際空港に行った", None, "データの検索"])
    toks = a.tokenize_series(s).tolist()
    assert toks[0] == ["関西", "国際", "空港", "に", "行っ", "た"]
    assert toks[1] == []
    assert toks[2] == ["データ", "の", "検索"]
    uniq, codes, lens = a.tokenize_ids(s)
    assert [uniq[c] for c in codes] == [t for row in toks for t in row]
    assert lens.tolist() == [6, 0, 3]
