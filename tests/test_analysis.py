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


def test_unicode_tokenizer_parity():
    """Byte-level tokenizer ≡ regex chain on Latin-1 letters (word-joining,
    lowercase À→à, ß, ÿ, × ÷ excluded), CJK ideographs + Hiragana (one token
    per character), Katakana + Hangul (run tokens — jflex {KatakanaEx}+ /
    {HangulEx}+); SimpleAnalyzer stays ASCII-only."""
    import pandas as pd

    from lucene_spark.analysis import SimpleAnalyzer, StandardAnalyzer

    an = StandardAnalyzer()
    cases = [
        "Café au lait, naïve RÉSUMÉ",
        "值得一提的是 spark 引擎",
        "tàblé 值 mixed ascii123",
        "×÷ odd À Þ ß ÿ",
        "día niño über Straße",
        "日本語テキスト",  # 3 Han singles + Katakana run "テキスト"
        "can't stop won't O.K. 3,000",
        "中文mixed字母abc",
        "",
        "ÀÁÂÃÄÅÆÇÈÉÊËÌÍÎÏÐÑÒÓÔÕÖ×ØÙÚÛÜÝÞß"
        "àáâãäåæçèéêëìíîïðñòóôõö÷øùúûüýþÿ",
        "一丁 鿿 龥",  # U+4E00 start / U+9FFF end / U+9FA5 inside
        "테이블 조회 value",      # Hangul runs (AC00–D7A3)
        "ぎょう row ぎ",          # Hiragana singles (3041–3096, 309D–309F)
        "バリューチェーン ー",     # Katakana runs incl. 30FC prolonged mark
        "한글テストabc値ひら",     # script adjacency breaks runs
        "カタカナ、ひらがな。漢字",  # CJK punctuation separates
        "ΣΟΦΟΣ σοφός ΤΙΜΉ",      # Greek; per-char Σ→σ (NO final-sigma ς)
        "Я МЫ Привет котёнок",    # Cyrillic incl. cross-lead Я→я, ё
        "tableтест τιμήvalue",    # ALetter×ALetter: cross-script single runs
        "Ο'ΝΕΙΛ д.т знач·τιμή",  # joiners apply; U+0387 · separates
        "ЀЍѐџ ѣѢ",               # 0400–045F in scope; 0463 Ѣ out (separator)
        # UAX#29 Extend (U+0300–U+036F combining marks, WB4 absorption)
        "café time",            # NFD e+acute joins the word
        "CAFÉ X",               # uppercase base + mark
        "́leading mark",         # mark at start of text drops
        "after ́space",          # mark after separator drops
        "don'́t",                # mark breaks the apostrophe join
        "dón't again",          # mark inside a joined token
        "é̂chain x́́́y",  # mark chains
        "á:b 1̀1,2",       # mark breaks ':' join, ',' still joins
        "σοφός плю́с",     # marks on Greek/Cyrillic letters
        "1̀ digits̏",       # marks on digits / at token end
        "Ͱʹ",               # CD B0+ (Greek archaic) is NOT Extend
        # marks BEFORE a joiner are transparent for '/'.'.' (the word run
        # consumed them), but break ':'/',' (physical lookarounds)
        "caf\u00e8.com",              # precomposed control: plain join
        "cafe\u0300.com",             # NFD mark + '.' still joins
        "do\u0300'nt x\u0300'y",     # NFD mark + apostrophe joins
        "e\u0300.\u0301x",           # mark AFTER '.' breaks the join
        "a\u0300:b 1\u0300,2",       # mark before ':'/',' breaks
        # 3-byte Extend/Format absorption (WB4 ExtFmtZwj): kana voicing
        # marks U+3099/309A + ZWNJ U+200C / ZWJ U+200D glue LEFT into
        # hiragana/han singles, katakana/hangul runs, and word runs
        "\u304e\u3099 \u30d0\u30ea\u30e5\u30fc ta\u200cble \u5024\u3099 x",
        "\u3073\u3099\u3089",       # mark glues to the FIRST hiragana single
        "\u30ab\u30bf\u3099\u30ab\u30ca",  # voicing mark inside a katakana run
        " \u3099orphan",              # orphan mark after a separator drops
        "a\u200d b\u200cc",          # ZWJ at word end, ZWNJ mid-word
        "\u5024\u3099\u6f22",       # han single + mark, then han
        "\ud55c\uad74\u3099runs \ud55c\u200c\uae00",  # hangul + marks
        "\u3073\u30a2 \u30a2\u3070",  # hira|kata adjacency around marks
        "x\u3099y 1\u200c,2 a\u3099:b",  # absorb vs ':'/',' break
        "ca\u200cfe.com",             # ZWNJ + '.' join still works
        "\u3099\u3099\u3099",       # mark-only text → nothing
        "\u30a2\u3099\u3099\u3099\u3070\u3099\u3099",  # mark chains
        "caf\u00e8\u3099x",          # mixed 2-byte + 3-byte mark chain
        # Thai Complex_Context: one token per contiguous run (jflex :274);
        # in-run combining vowels/tone marks are Complex_Context themselves
        "\u0e15\u0e32\u0e23\u0e32\u0e07 \u0e04\u0e48\u0e32 x",
        "\u0e2a\u0e41\u0e01\u0e19scan",        # script break latin|thai
        "\u0e01\u0e32\u0e3f\u0e1a\u0e32\u0e17",  # ฿ (non-SA) splits runs
        "\u0e40\u0e2d\u0e01 \u4e2d\u0e01",    # thai|han adjacency
        # halfwidth katakana (WB:Katakana) + halfwidth voicing (WB:Extend)
        "\uff76\uff80\uff76\uff85 x",          # halfwidth run
        "\uff76\uff9e\uff77\uff9e value",      # halfwidth voicing absorbs
        "\u30d0\uff76 mixed",                    # fullwidth+halfwidth one run
        " \uff9eorphan a\uff9eb",                # orphan drops / latin absorb
        # Hangul jamo (Script:Hangul ∩ WB:ALetter → HangulEx)
        "\u1100\u1161\u11a8 \ud55c\uae00",    # jamo run + syllable run
        "\ud55c\u1100\uae00",                   # jamo inside syllable run
    ]
    for s in cases:
        uniq, codes, _pr = an.tokenize_ids(pd.Series([s]))
        assert [uniq[c] for c in codes] == an.tokenize_text(s), repr(s)
    uniq, codes, per_row = an.tokenize_ids(pd.Series(cases))
    assert [uniq[c] for c in codes] == [
        t for s in cases for t in an.tokenize_text(s)]
    # each ideograph is its own token and bumps the position counter
    u, c, _pr, pos = an.tokenize_ids(pd.Series(["值 x 值值"]),
                                     with_positions=True)
    assert [u[i] for i in c] == ["值", "x", "值", "值"]
    assert list(pos) == [0, 1, 2, 3]
    # SimpleAnalyzer (the oracle contract) remains strictly [a-z0-9]
    sa = SimpleAnalyzer()
    u2, c2, _p2 = sa.tokenize_ids(pd.Series(["Café 值 abc123"]))
    assert [u2[i] for i in c2] == ["caf", "abc123"]


def test_english_curly_apostrophe():
    """EnglishPossessiveFilter accepts ’ and ＇ apostrophe variants
    (normalized before the byte tokenizer)."""
    import pandas as pd

    from lucene_spark.analysis_en import EnglishAnalyzer

    an = EnglishAnalyzer()
    for s in ["the dog’s bone", "the dog's bone", "the dog＇s bone"]:
        assert an.tokenize_text(s) == ["dog", "bone"], repr(s)
        uniq, codes, _ = an.tokenize_ids(pd.Series([s]))
        assert [uniq[c] for c in codes] == ["dog", "bone"], repr(s)


def test_max_token_length_counts_characters():
    """maxTokenLength is a CHARACTER cap (reference contract), not UTF-8
    bytes: a 255-char accented token survives both analyzer paths, a
    256-char one is dropped by both."""
    import pandas as pd

    from lucene_spark.analysis import StandardAnalyzer

    an = StandardAnalyzer()
    keep = "é" + "x" * 254   # 255 chars, 256 bytes
    drop = "é" + "x" * 255   # 256 chars
    uniq, codes, _ = an.tokenize_ids(pd.Series([keep]))
    assert [uniq[c] for c in codes] == an.tokenize_text(keep) == [keep]
    uniq, codes, _ = an.tokenize_ids(pd.Series([drop]))
    assert list(codes) == [] and an.tokenize_text(drop) == []


def test_wildcard_cached_expansion_caps_matches_not_prefix_range():
    """The driver-dict wildcard expansion bounds ACTUAL matches; many terms
    merely sharing the literal prefix must not raise TooManyClauses."""
    from lucene_spark.search import ast
    from lucene_spark.search.multiterm import expand_terms_cached

    class FakeReader:
        def sorted_terms(self, f):
            return [f"a{i:03d}" for i in range(10)]

        def has_term(self, f, t):
            return True

    q = ast.MultiTermQuery("wildcard", "a*9")
    assert expand_terms_cached(FakeReader(), q, 5) == ["a009"]


def test_core_analyzers():
    """WhitespaceAnalyzer (case-preserving, \\S+ split, 255-char run
    chunking per CharTokenizer), LetterAnalyzer (the reference
    SimpleAnalyzer: letter runs + lowercase, digits separate),
    stop_analyzer (letter + English stop set, position holes), and
    KeywordAnalyzer (whole input = one untouched token)."""
    import numpy as np
    import pandas as pd

    from lucene_spark.analysis import (
        KeywordAnalyzer,
        LetterAnalyzer,
        WhitespaceAnalyzer,
        get_analyzer,
        stop_analyzer,
    )

    ws = WhitespaceAnalyzer()
    assert ws.tokenize_text("Hello  WORLD\tfoo-bar") == [
        "Hello", "WORLD", "foo-bar"]
    long = "a" * 600
    assert ws.tokenize_text(long) == ["a" * 255, "a" * 255, "a" * 90]

    le = LetterAnalyzer()
    assert le.tokenize_text("Hello42 WORLD über") == ["hello", "world", "über"]

    st = stop_analyzer()
    u, c, l, p = st.tokenize_ids(
        pd.Series(["The quick brown fox and the dog"]), with_positions=True)
    assert [u[i] for i in c] == ["quick", "brown", "fox", "dog"]
    assert list(p) == [1, 2, 3, 6]  # holes where the/and were dropped

    kw = KeywordAnalyzer()
    assert kw.tokenize_text("One Whole  String") == ["One Whole  String"]
    u2, c2, l2 = kw.tokenize_ids(pd.Series(["A b", None, ""]))
    assert list(l2) == [1, 0, 0] and u2[c2[0]] == "A b"

    for name in ("whitespace", "letter", "stop", "keyword"):
        a = get_analyzer(name)
        assert a.name == name
        # uniq pool sorts in code-point (== UTF-8 byte) order
        uu, cc, ll = a.tokenize_ids(pd.Series(["b a c", "a zz"]))
        assert list(uu) == sorted(uu)
        assert int(ll.sum()) == len(cc)


def test_ascii_folding_analyzer():
    """FoldingAnalyzer (ASCIIFoldingFilter.java, Latin-1 + Extended-A
    scope): accents fold to base letters, specials (ß Æ Ø Þ Đ ı Ł) use the
    reference's explicit mappings, non-letters ×/÷ stay separators, and the
    batch ids path agrees with the text path."""
    import pandas as pd

    from lucene_spark.analysis import FoldingAnalyzer, get_analyzer

    f = get_analyzer("standard_folding")
    assert isinstance(f, FoldingAnalyzer)
    assert f.tokenize_text("Café straße Œuvre Łódź") == [
        "cafe", "strasse", "oeuvre", "lodz"]
    assert f.tokenize_text("Æon Øre Þing Đen ıce") == [
        "aeon", "ore", "thing", "den", "ice"]
    assert f.tokenize_text("3×4 naïve") == ["3", "4", "naive"]
    texts = ["Café straße Œuvre Łódź", "Æon Øre", None]
    u, c, l = f.tokenize_ids(pd.Series(texts))
    got = [u[i] for i in c]
    want = [t for s in texts for t in f.tokenize_text(s or "")]
    assert got == want


def test_underscore_run_leaves_no_position_hole():
    """A pure-'_' run is not a word under UAX#29 — the reference tokenizer
    never emits it, so it must not consume a position (unlike stopwords and
    over-length drops, which leave Lucene-style holes)."""
    import pandas as pd

    from lucene_spark.analysis import StandardAnalyzer

    an = StandardAnalyzer()
    u, c, _pr, pos = an.tokenize_ids(pd.Series(["foo _ bar", "_ x __ y"]),
                                     with_positions=True)
    toks = [u[i] for i in c]
    assert toks == ["foo", "bar", "x", "y"]
    assert pos.tolist() == [0, 1, 0, 1]  # adjacent — no holes

    # stopword holes stay (positions keep counting through stop terms)
    an2 = StandardAnalyzer(stopwords=frozenset({"the"}))
    u2, c2, _p2, pos2 = an2.tokenize_ids(pd.Series(["foo the bar"]),
                                         with_positions=True)
    assert [u2[i] for i in c2] == ["foo", "bar"]
    assert pos2.tolist() == [0, 2]  # hole at 1


def test_tokenize_series_normalizes_with_huge_length_cap():
    """tokenize_series must lowercase + word-filter even when
    max_token_length is effectively unlimited (regression: the whole map
    was gated on the cap)."""
    import pandas as pd

    from lucene_spark.analysis import StandardAnalyzer

    an = StandardAnalyzer(max_token_length=10**9)
    out = an.tokenize_series(pd.Series(["Foo _ BAR"])).iloc[0]
    assert out == ["foo", "bar"]
    assert out == an.tokenize_text("Foo _ BAR")


def test_shingle_analyzer():
    """ShingleAnalyzerWrapper(min=max=N, no unigrams) contract
    (analysis/common/.../shingle/ShingleFilter.java): space-joined N-grams
    of the StandardAnalyzer stream, one token per gram, posIncr 1."""
    import pandas as pd

    from lucene_spark.analysis import ShingleAnalyzer, get_analyzer

    an = get_analyzer("shingle")
    assert isinstance(an, ShingleAnalyzer) and an.shingle_size == 2
    assert an.tokenize_text("Table hash JOIN") == ["table hash", "hash join"]
    assert an.tokenize_text("one") == []          # shorter than the shingle
    assert an.tokenize_text("") == []
    # joiners flow through the delegate ("3.14" is ONE word)
    assert an.tokenize_text("pi is 3.14 ok") == [
        "pi is", "is 3.14", "3.14 ok"]
    # series/ids parity with the scalar path
    texts = ["Table hash JOIN", "", "one", "a b c d"]
    assert an.tokenize_series(pd.Series(texts)).tolist() == [
        an.tokenize_text(t) for t in texts]
    uniq, codes, per_row, pos = an.tokenize_ids(pd.Series(texts),
                                                with_positions=True)
    flat = [uniq[c] for c in codes]
    assert flat == [t for s in texts for t in an.tokenize_text(s)]
    assert per_row.tolist() == [2, 0, 0, 3]
    assert pos.tolist() == [0, 1, 0, 1, 2]
    # size-3 variant via the registry suffix
    an3 = get_analyzer("shingle3")
    assert an3.tokenize_text("a b c d") == ["a b c", "b c d"]


def test_cjk_bigram_analyzer():
    """CJKBigramFilter semantics (flags HAN|HIRAGANA, outputUnigrams=false):
    n-char runs → n−1 overlapping bigrams, lone char → unigram, other
    scripts pass through; dl counts the EXPANDED stream."""
    import pandas as pd

    from lucene_spark.analysis import get_analyzer

    an = get_analyzer("cjk_bigram")
    assert an.tokenize_text("run 数据表格 scan") == [
        "run", "数据", "据表", "表格", "scan"]
    assert an.tokenize_text("lone 值 char") == ["lone", "值", "char"]
    assert an.tokenize_text("ひらがな") == ["ひら", "らが", "がな"]
    # Katakana / Hangul runs pass through unsplit (documented divergence)
    assert an.tokenize_text("カタカナ 한글") == ["カタカナ", "한글"]
    # uppercase latin lowers through the shared chain
    assert an.tokenize_text("ABC 光值") == ["abc", "光值"]
    s = pd.Series(["数据表格 x", None, ""], dtype=object)
    lists = an.tokenize_series(s)
    assert lists.tolist() == [["数据", "据表", "表格", "x"], [], []]
    flat, lens = an.tokenize_flat(s)
    assert lens.tolist() == [4, 0, 0]
    assert flat.tolist() == ["数据", "据表", "表格", "x"]
    # positions are ordinals over the expanded stream (posIncr 1 per bigram)
    uniq, codes, cnt, pos = an.tokenize_ids(s, with_positions=True)
    assert pos.tolist() == [0, 1, 2, 3]


def test_edge_ngram_analyzer():
    """EdgeNGramTokenFilter semantics (min=2, max=4,
    preserveOriginal=false): word → prefixes 2..min(4, len); shorter
    words drop; registry parses size suffixes."""
    import pandas as pd

    from lucene_spark.analysis import get_analyzer

    an = get_analyzer("edge_ngram")
    assert an.tokenize_text("table x scan") == [
        "ta", "tab", "tabl", "sc", "sca", "scan"]
    assert an.tokenize_text("ab") == ["ab"]
    assert an.tokenize_text("a") == []
    # uppercase lowers through the shared standard chain
    assert an.tokenize_text("TABLE") == ["ta", "tab", "tabl"]
    s = pd.Series(["go table", None, ""], dtype=object)
    assert an.tokenize_series(s).tolist() == [
        ["go", "ta", "tab", "tabl"], [], []]
    flat, lens = an.tokenize_flat(s)
    assert lens.tolist() == [4, 0, 0]
    an13 = get_analyzer("edge_ngram1_3")
    assert an13.tokenize_text("scan a") == ["s", "sc", "sca", "a"]


def test_ngram_analyzer():
    """NGramTokenFilter semantics (position-major loop, min..max grams per
    start offset, preserveOriginal=false): sub-min words drop."""
    from lucene_spark.analysis import get_analyzer

    an = get_analyzer("ngram")  # 3..3
    assert an.tokenize_text("table") == ["tab", "abl", "ble"]
    assert an.tokenize_text("ab x") == []
    an23 = get_analyzer("ngram2_3")
    # position-major: at each offset emit sizes 2 then 3
    assert an23.tokenize_text("abcd") == [
        "ab", "abc", "bc", "bcd", "cd"]
    assert an23.tokenize_text("AB") == ["ab"]


def test_cjk_bigram_long_run_not_capped():
    """max_token_length caps EMITTED tokens, not the raw Han run: a 300-char
    run still yields its 299 bigrams (the reference tokenizer emits one
    token per ideograph — run length never caps there); a 300-char latin
    word still drops."""
    import pandas as pd

    from lucene_spark.analysis import get_analyzer

    an = get_analyzer("cjk_bigram")
    run = "一" * 300
    toks = an.tokenize_text(run)
    assert len(toks) == 299 and toks[0] == "一一"
    assert an.tokenize_text("x" * 300) == []
    assert an.tokenize_series(pd.Series([run])).iloc[0] == toks
