"""Analyzer semantics: UAX#29-on-ASCII parity cases + the 255-char drop rule
(StandardTokenizer.java:145-168, StandardAnalyzer.java:37)."""

import pandas as pd

from lucene_spark.analysis import SimpleAnalyzer, StandardAnalyzer


def toks(s):
    return StandardAnalyzer().tokenize_text(s)


def test_basic_words():
    assert toks("Hello, World! foo bar") == ["hello", "world", "foo", "bar"]


def test_alnum_mix_and_underscore():
    assert toks("abc123 foo_bar a1b2") == ["abc123", "foo_bar", "a1b2"]
    assert toks("___") == []  # pure ExtendNumLet is not a word


def test_joiners():
    assert toks("don't stop") == ["don't", "stop"]
    assert toks("3.14 1,000 a.b") == ["3.14", "1,000", "a.b"]
    assert toks("a:b 1:2") == ["a:b", "1", "2"]  # ':' joins letters only
    assert toks("a, b .c d.") == ["a", "b", "c", "d"]  # edge joiners break


def test_max_token_length_dropped():
    giant = "x" * 300
    ok255 = "y" * 255
    assert toks(f"foo {giant} bar {ok255}") == ["foo", "bar", ok255.lower()]


def test_empty_and_none():
    assert toks("") == []
    a = StandardAnalyzer()
    out = a.tokenize_series(pd.Series(["a b", None, ""]))
    assert out.tolist() == [["a", "b"], [], []]


def test_series_matches_scalar():
    texts = ["Hello don't 3.14", "x" * 300 + " ok", "", "A_B c,d 1,2"]
    a = StandardAnalyzer()
    assert a.tokenize_series(pd.Series(texts)).tolist() == [
        a.tokenize_text(t) for t in texts
    ]


def test_simple_analyzer_sql_equivalence_shape():
    a = SimpleAnalyzer()
    assert a.tokenize_text("Hello, World-3.14!") == ["hello", "world", "3", "14"]
    assert a.tokenize_series(pd.Series(["A b", None])).tolist() == [["a", "b"], []]
