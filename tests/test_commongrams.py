"""CommonGramsFilter expansion semantics (CommonGramsFilter.java:40-118)."""

import duckdb
import pandas as pd

from lucene_spark.analysis import CommonGramsAnalyzer, get_analyzer
from lucene_spark.analysis_en import ENGLISH_STOP_WORDS
from lucene_spark.oracle import common_grams_tokens_expr


def test_expansion_order_and_rule():
    a = CommonGramsAnalyzer()
    # gram when either side is common, emitted between the two unigrams
    assert a.tokenize_text("the quick fox") == [
        "the", "the_quick", "quick", "fox"]
    assert a.tokenize_text("quick the fox") == [
        "quick", "quick_the", "the", "the_fox", "fox"]
    # no common word → no grams
    assert a.tokenize_text("quick brown fox") == ["quick", "brown", "fox"]
    # single word / empty
    assert a.tokenize_text("the") == ["the"]
    assert a.tokenize_text("") == []


def test_custom_common_set():
    a = CommonGramsAnalyzer(common_words={"fox"})
    assert a.tokenize_text("quick fox runs") == [
        "quick", "quick_fox", "fox", "fox_runs", "runs"]


def test_duckdb_expression_parity():
    a = CommonGramsAnalyzer()
    texts = [
        "the quick brown fox is on the table",
        "a b c the d",
        "nocommon words here",
        "the",
        "",
    ]
    e = common_grams_tokens_expr(ENGLISH_STOP_WORDS)("t")
    got = [r[0] for r in duckdb.sql(
        f"SELECT {e} FROM (SELECT unnest(?) AS t)", params=[texts]
    ).fetchall()]
    assert got == [a.tokenize_text(t) for t in texts]


def test_ids_path_matches_text_path():
    a = get_analyzer("common_grams")
    texts = pd.Series(["the quick fox", "on the table", None, ""])
    uniq, codes, per_row = a.tokenize_ids(texts)
    flat = [uniq[c] for c in codes]
    rows, i = [], 0
    for n in per_row:
        rows.append(flat[i:i + n])
        i += n
    assert rows == [a.tokenize_text(t or "") for t in texts]
