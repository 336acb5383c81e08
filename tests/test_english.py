"""EnglishAnalyzer: Porter stemmer golden vectors (official algorithm
outputs), possessive + stop chain, and engine ≡ golden on a stemmed index."""

import shutil

import pandas as pd
import pytest

from lucene_spark.analysis_en import (
    ENGLISH_STOP_WORDS,
    EnglishAnalyzer,
    porter_stem,
)
from lucene_spark.goldens import BruteForceIndex
from lucene_spark.indexing.builder import IndexBuilder
from lucene_spark.search.searcher import IndexSearcher

# hand-checked against the published Porter algorithm (the reference's
# en/PorterStemmer.java comments include several of these)
VECTORS = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("motoring", "motor"), ("sing", "sing"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"), ("filing", "file"),
    ("sized", "size"),
    ("happy", "happi"), ("sky", "sky"),
    ("relational", "relat"), ("conditional", "condit"),
    ("generalization", "gener"), ("oscillators", "oscil"),
    ("matting", "mat"), ("mating", "mate"), ("meeting", "meet"),
    ("milling", "mill"), ("messing", "mess"), ("meetings", "meet"),
    ("disabled", "disabl"),
    ("a", "a"), ("is", "is"), ("be", "be"),  # length <= 2 untouched
]


def test_porter_golden_vectors():
    for w, exp in VECTORS:
        assert porter_stem(w) == exp, f"{w}: {porter_stem(w)} != {exp}"


def test_english_chain():
    an = EnglishAnalyzer()
    # possessive strip happens before stop + stem
    assert an.tokenize_text("The dog's bones are John's") == \
        ["dog", "bone", "john"]
    assert "the" in ENGLISH_STOP_WORDS and "it" in ENGLISH_STOP_WORDS
    # stopwords leave position holes (phrase positions skip them)
    toks = an.tokenize_text("running of the mills")
    assert toks == ["run", "mill"]


def test_english_vectorized_matches_per_string():
    an = EnglishAnalyzer()
    texts = pd.Series([
        "The ponies were racing happily", "dogs' and dog's agreed meetings",
        None, "", "such that there will be nothing left",
        "oscillators generalization conditional",
    ])
    uniq, codes, per_row, pos = an.tokenize_ids(texts, with_positions=True)
    flat = [uniq[c] for c in codes]
    # reassemble per row and compare with the per-string reference chain
    out, i = [], 0
    for n in per_row:
        out.append(flat[i:i + int(n)])
        i += int(n)
    exp = [an.tokenize_text(t or "") for t in texts]
    assert out == exp


def test_english_index_golden_identity(spark, tmp_path):
    pdf = pd.DataFrame({
        "conv_id": [f"c{i:04d}" for i in range(8)],
        "turn_idx": [0] * 8,
        "role": ["user"] * 8,
        "text": [
            "the cats were meeting near the mills",
            "a cat sized for the meetings",
            "plastered walls and motoring cars",
            "hopping and falling, tanned hides",
            "relational conditional generalization",
            "the dog's bone was agreed",
            "sky is happy today",
            "oscillators hissing fizzed",
        ],
        "tool": [None] * 8,
        "ts": [None] * 8,
    })
    d = str(tmp_path / "enidx")
    shutil.rmtree(d, ignore_errors=True)
    IndexBuilder(spark, d, analyzer="english", num_segments=2).build(
        spark.createDataFrame(pdf))
    s = IndexSearcher(spark, d)
    golden = BruteForceIndex(pdf, analyzer="english")
    # query text is analyzed with the same chain: "meetings" → "meet"
    for q in ["meetings", "cat", "+meeting mills", "hopping tanned",
              '"the cats"', "agreed"]:
        exp = golden.search(q, 20)
        got = [(h.doc_id, h.score) for h in s.search(q, 20)]
        assert got == exp, f"english mismatch for {q!r}"
    # stemmed term stats: "meeting(s)" and "meet" collapse to one term
    from pyspark.sql import functions as F

    ts = spark.read.parquet(f"{d}/term_stats")
    terms = {r["term"] for r in ts.filter(F.col("field") == "text").collect()}
    assert "meet" in terms and "meetings" not in terms and "meeting" not in terms
