"""MemoryIndex (single-document driver-local index — memory module)."""

import shutil

import pytest

from lucene_spark.memory import MemoryIndex
from lucene_spark.search import ast

TEXT = ("the table scan joins the value column with the hash table "
        "before the sort")


def test_scores_match_real_one_doc_index(spark, tmp_path):
    """MemoryIndex score ≡ a real one-document distributed index's score —
    the single-doc collection stats (docCount=1, sumTTF=dl, df=1) are
    exactly what a one-doc IndexSearcher reports."""
    import pandas as pd

    from lucene_spark.indexing.builder import IndexBuilder
    from lucene_spark.search.searcher import IndexSearcher

    d = str(tmp_path / "onedoc")
    shutil.rmtree(d, ignore_errors=True)
    pdf = pd.DataFrame({"conv_id": ["c0"], "turn_idx": [0],
                        "role": ["user"], "text": [TEXT],
                        "tool": [None], "ts": [None]})
    IndexBuilder(spark, d, num_segments=1).build(spark.createDataFrame(pdf))
    s = IndexSearcher(spark, d)
    mi = MemoryIndex.from_text(TEXT)
    for q in ("table", "table value", "+table +sort", '"hash table"',
              "table^2.5 value", "scan column sort"):
        hits = s.search(q, 1)
        expect = hits[0].score if hits else 0.0
        assert mi.search(q) == expect, f"mismatch for {q!r}"


def test_no_match_scores_zero():
    mi = MemoryIndex.from_text(TEXT)
    assert mi.search("zzznotaterm") == 0.0
    assert mi.search("+zzznotaterm table") == 0.0
    assert MemoryIndex.from_text("").search("table") == 0.0


def test_matches_vs_score():
    mi = MemoryIndex.from_text(TEXT)
    assert mi.matches("table")
    assert not mi.matches("zzznotaterm")
    # constant-score shapes match at boost score (not 0-vs-score confusion)
    assert mi.matches(ast.MultiTermQuery("prefix", "tab"))
    assert mi.search(ast.MultiTermQuery("prefix", "tab")) == 1.0
    # phrase, sloppy phrase, must_not
    assert mi.matches('"value column"')
    assert not mi.matches('"column value"')
    assert mi.matches(ast.PhraseQuery(("table", "joins"), slop=1))
    assert not mi.matches("+table -sort")


def test_keyword_fields_and_rebuild():
    mi = (MemoryIndex().add_field("text", TEXT)
          .add_field("role", "assistant", keyword=True))
    assert mi.matches(ast.BooleanQuery((
        (ast.MUST, ast.TermQuery("table")),
        (ast.FILTER, ast.TermQuery("assistant", field="role")))))
    assert not mi.matches(ast.BooleanQuery((
        (ast.MUST, ast.TermQuery("table")),
        (ast.FILTER, ast.TermQuery("user", field="role")))))
    # re-adding a field replaces and rebuilds lazily
    mi.add_field("text", "completely different words")
    assert not mi.matches("table")
    assert mi.matches("different")


def test_percolation_loop():
    """The canonical MemoryIndex use: match ONE doc against MANY stored
    queries (prospective search)."""
    queries = {"q_table": "+table +value", "q_phrase": '"hash table"',
               "q_miss": "+zzz", "q_not": "+scan -table"}
    mi = MemoryIndex.from_text(TEXT)
    matched = sorted(k for k, q in queries.items() if mi.matches(q))
    assert matched == ["q_phrase", "q_table"]
