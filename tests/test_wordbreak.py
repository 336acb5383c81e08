"""WordBreakSpellChecker (suggest/.../spell/WordBreakSpellChecker.java):
break/combine suggestions vs a brute enumeration over the test vocabulary."""

import pytest

from lucene_spark.search.searcher import IndexSearcher
from lucene_spark.search.suggest import word_break_suggest, word_combine_suggest


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return IndexSearcher(spark, index_dir)


def _vocab_df(searcher, words):
    return searcher.reader.term_stats(sorted(set(words)))


def test_break_simple_and_recursive(searcher):
    """Concatenations of corpus words split back; a 3-part input needs the
    maxChanges=2 recursion."""
    from lucene_spark.corpus import VOCAB

    stats = searcher.reader.term_stats(list(VOCAB[:50]))
    present = [t for t in VOCAB[:50] if stats.get(t, {}).get("df", 0) > 0]
    assert len(present) >= 3
    a, b, c = present[:3]
    got = word_break_suggest(searcher.reader, a + b, k=5)
    assert any(s == f"{a} {b}" for s, n, _ in got if n == 2)
    got3 = word_break_suggest(searcher.reader, a + b + c, k=10,
                              max_changes=2)
    assert any(s == f"{a} {b} {c}" for s, n, _ in got3 if n == 3)
    # maxChanges=1 must NOT produce 3-part suggestions
    got1 = word_break_suggest(searcher.reader, a + b + c, k=10,
                              max_changes=1)
    assert all(n == 2 for _, n, _ in got1)


def test_break_in_index_term_returns_empty(searcher):
    """SUGGEST_WHEN_NOT_IN_INDEX: a term already in the dictionary gets no
    break suggestions."""
    from lucene_spark.corpus import VOCAB

    stats = searcher.reader.term_stats(list(VOCAB[:20]))
    term = next(t for t in VOCAB[:20] if stats.get(t, {}).get("df", 0) > 0)
    assert word_break_suggest(searcher.reader, term) == []


def test_break_rank_fewer_words_then_max_freq(searcher):
    """Ranking: 2-part suggestions before 3-part, then max word freq DESC."""
    from lucene_spark.corpus import VOCAB

    stats = searcher.reader.term_stats(list(VOCAB[:80]))
    present = [t for t in VOCAB[:80] if stats.get(t, {}).get("df", 0) > 0]
    a, b, c = present[:3]
    got = word_break_suggest(searcher.reader, a + b + c, k=20)
    nums = [n for _, n, _ in got]
    assert nums == sorted(nums)
    for n in set(nums):
        freqs = [f for _, m, f in got if m == n]
        assert freqs == sorted(freqs, reverse=True) or len(freqs) <= 1


def test_combine(searcher):
    """Adjacent fragments whose concatenation is a dictionary word combine;
    runs where every term is already in the index are filtered
    (WHEN_NOT_IN_INDEX needs min original freq == 0)."""
    from lucene_spark.corpus import VOCAB

    stats = searcher.reader.term_stats(list(VOCAB[:20]))
    present = [t for t in VOCAB[:20]
               if stats.get(t, {}).get("df", 0) > 0 and len(t) >= 4]
    w = present[0]
    frags = [w[:2], w[2:]]
    got = word_combine_suggest(searcher.reader, frags, k=5)
    assert any(comb == w for _, _, comb, _ in got)
    # two full dictionary words adjacent: min orig freq > 0 → no suggestion
    got2 = word_combine_suggest(searcher.reader, present[:2], k=5)
    assert all(comb != present[0] + present[1]
               for _, _, comb, _ in got2)


def test_string_distance_reference_goldens():
    """JaroWinklerDistance + NGramDistance ports match the reference test
    expectations (TestJaroWinklerDistance.java / TestNGramDistance.java)."""
    from lucene_spark.search.suggest import jaro_winkler as jw
    from lucene_spark.search.suggest import ngram_similarity as ng

    assert jw("al", "al") == 1.0
    assert 0.961 < jw("martha", "marhta") < 0.962
    assert 0.832 < jw("jones", "johnson") < 0.833
    assert 0.958 < jw("abcvwxyz", "cabvwxyz") < 0.959
    assert 0.84 < jw("dwayne", "duane") < 0.841
    assert 0.813 < jw("dixon", "dicksonx") < 0.814
    assert jw("fvie", "ten") == 0.0
    assert jw("zac ephron", "zac efron") > jw("zac ephron", "kai ephron")
    # the reference's UNCAPPED prefix (vs textbook Winkler's 4-cap):
    # "table"/"tables" shares a 5-char prefix → bonus uses all 5
    assert abs(jw("table", "tables") - 0.9722222) < 1e-6
    for nsz, cases in {
        1: [("martha", "marhta", 0.6666), ("jones", "johnson", 0.4285),
            ("abcvwxyz", "cabvwxyz", 0.75), ("dixon", "dicksonx", 0.5),
            ("natural", "contrary", 0.25)],
        2: [("martha", "marhta", 0.6666), ("abcvwxyz", "cabvwxyz", 0.625),
            ("dwayne", "duane", 0.5833), ("a", "aa", 0.5)],
    }.items():
        for a, b, exp in cases:
            assert abs(ng(a, b, nsz) - exp) < 0.001, (nsz, a, b)
    assert ng("al", "al", 2) == 1.0 and ng("b", "a", 1) == 0.0


def test_spell_suggest_pluggable_distance(spark, index_dir):
    """spell_suggest(distance=...) ranks the SAME DL candidate set by the
    plugged similarity (DirectSpellChecker.setDistance)."""
    import pytest

    from lucene_spark.search.reader import IndexReader
    from lucene_spark.search.suggest import (
        jaro_winkler,
        spell_suggest,
    )

    rd = IndexReader(spark, index_dir)
    base = spell_suggest(rd, "cas", k=10)       # DL ranking
    jws = spell_suggest(rd, "cas", k=10, distance="jaro_winkler")
    assert base and jws
    assert {t for t, _, _ in jws} <= {t for t, _, _ in base} or \
        len(jws) == len(base)  # same candidate pool, re-ranked
    # ranking really is by the plugged similarity
    sims = [s for _, _, s in jws]
    assert sims == sorted(sims, reverse=True)
    assert all(abs(s - jaro_winkler("cas", t)) < 1e-9 for t, _, s in jws)
    ngs = spell_suggest(rd, "cas", k=10, distance="ngram")
    assert [s for _, _, s in ngs] == sorted(
        (s for _, _, s in ngs), reverse=True)
    with pytest.raises(ValueError):
        spell_suggest(rd, "cas", distance="nope")


def test_levenshtein_distance_goldens():
    """LevenshteinDistance + LuceneLevenshteinDistance reference goldens
    (TestLevenshteinDistance.java; the Lucene variant scales by MIN len
    and counts transpositions as one edit)."""
    from lucene_spark.search.suggest import (
        levenshtein_similarity as lev,
        lucene_levenshtein_similarity as llev,
    )

    assert lev("al", "al") == 1.0
    assert abs(lev("martha", "marhta") - 0.6666) < 0.001
    assert abs(lev("jones", "johnson") - 0.4285) < 0.001
    assert abs(lev("abcvwxyz", "cabvwxyz") - 0.75) < 0.001
    assert abs(lev("dwayne", "duane") - 0.666) < 0.001
    assert abs(lev("dixon", "dicksonx") - 0.5) < 0.001
    assert lev("six", "ten") == 0.0
    # Lucene variant: transposition is ONE edit; scaled by min length
    assert llev("martha", "marhta") == 1.0 - 1.0 / 6   # one transposition
    assert llev("ab", "bca") == 1.0 - 3.0 / 2          # parallel edits: 3
    assert llev("al", "al") == 1.0
