"""Property-based tests (hypothesis) — the randomized-testing layer of the
reference test strategy (SURVEY.md §5):

- BM25 monotonicity invariants, mirroring
  ``tf/search/similarities/BaseSimilarityTestCase.java:360-470``: score is
  finite, ≥ 0, non-decreasing in tf, non-increasing in doclen and df;
- SmallFloat norm encoding round-trip invariants
  (``core/util/SmallFloat.java:147-167``);
- varint codec round-trip over adversarial int distributions;
- byte-level tokenizer ≡ regex chain on arbitrary ASCII-ish text.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from lucene_spark.analysis import SimpleAnalyzer, StandardAnalyzer
from lucene_spark.indexing.blocks import decode_varints, encode_varints
from lucene_spark.similarity import BM25Similarity
from lucene_spark.smallfloat import byte4_to_int, int_to_byte4

SIM = BM25Similarity()


@settings(max_examples=200, deadline=None)
@given(
    df=st.integers(1, 10**9),
    doc_count=st.integers(1, 2 * 10**9),
    sum_ttf=st.integers(1, 10**12),
    tf=st.integers(1, 10**6),
    norm=st.integers(0, 255),
)
def test_bm25_score_bounds(df, doc_count, sum_ttf, tf, norm):
    df = min(df, doc_count)
    sc = SIM.scorer(1.0, doc_count, sum_ttf, [df])
    s = sc.score(np.array([tf]), np.array([norm]))[0]
    assert np.isfinite(s) and s >= 0
    # bounded by weight (the tf→∞ limit)
    assert s <= sc.weight * (1 + 1e-6)


@settings(max_examples=100, deadline=None)
@given(
    df=st.integers(1, 10**6),
    doc_count=st.integers(10, 10**7),
    sum_ttf=st.integers(10, 10**9),
    tf=st.integers(1, 10**4),
    norm=st.integers(0, 254),
)
def test_bm25_monotonicity(df, doc_count, sum_ttf, tf, norm):
    df = min(df, doc_count)
    sc = SIM.scorer(1.0, doc_count, sum_ttf, [df])
    s = float(sc.score(np.array([tf]), np.array([norm]))[0])
    # non-decreasing in tf
    s_tf = float(sc.score(np.array([tf + 1]), np.array([norm]))[0])
    assert s_tf >= s
    # non-increasing in decoded doc length (norm codes order lengths; skip the
    # 0→1 wrap: LENGTH_TABLE[0] is 0)
    if norm >= 1:
        s_len = float(sc.score(np.array([tf]), np.array([norm + 1]))[0])
        assert s_len <= s + 1e-7
    # non-increasing in df
    if df + 1 <= doc_count:
        sc2 = SIM.scorer(1.0, doc_count, sum_ttf, [df + 1])
        s_df = float(sc2.score(np.array([tf]), np.array([norm]))[0])
        assert s_df <= s + 1e-7


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_smallfloat_roundtrip_invariants(dl):
    c = int(int_to_byte4(np.array([dl]))[0])
    assert 0 <= c <= 255
    dec = int(byte4_to_int(np.array([c]))[0])
    assert dec <= dl  # decoded (lossy) length never exceeds the true length
    # values < 40 are exact (SmallFloat.java:103-122)
    if dl < 40:
        assert dec == dl
    # re-encoding the decoded value is a fixpoint
    assert int(int_to_byte4(np.array([dec]))[0]) == c


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(0, 127),
            st.integers(0, 2**20),
            st.integers(0, 2**62),
        ),
        max_size=300,
    )
)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    assert decode_varints(encode_varints(arr)).tolist() == vals


_TEXT_ALPHABET = st.text(
    alphabet="abcXYZ019_'.:, \t\n-!?\"()" + "é光",  # joiners + separators + non-ASCII
    max_size=120,
)

# full extended alphabet: every script family + Extend/Format marks the
# round-4 tokenizer supports — latin-1, greek, cyrillic, han, hiragana,
# katakana (full+half width), hangul (syllable+jamo), SE-Asian SA
# (thai/lao/myanmar/khmer), combining diacritics, kana voicing
# (full+half width), ZWNJ/ZWJ, joiners, separators
_EXT_ALPHABET = st.text(
    alphabet=("abZ09_'.:, \t-?" "éßÿ" "Σσώ" "Яёж" "光值" "ぎらゝ" "バーｶﾅ"
              "한글가" "ตค่า" "ກຳມ" "မန်ာ" "ខ្រ" "\u0300\u0301\u3099\u309a\uff9e"
              "\u200c\u200d"),
    max_size=80,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_EXT_ALPHABET, max_size=6))
def test_tokenizer_extended_alphabet_parity(texts):
    """Byte kernel ≡ regex chain over random mixed-script text drawn from
    the FULL supported alphabet — scripts, marks, joiners, and separators
    interleaved arbitrarily (the adversarial shapes the curated parity
    cases can't enumerate)."""
    import pandas as pd

    s = pd.Series(texts, dtype=object)
    an = StandardAnalyzer()
    flat, lens = an.tokenize_flat(s)
    lists = an.tokenize_series(s)
    assert lens.tolist() == [len(x) for x in lists]
    assert flat.tolist() == [t for ts in lists for t in ts]


@settings(max_examples=150, deadline=None)
@given(st.lists(_TEXT_ALPHABET, max_size=8))
def test_tokenizer_byte_path_equals_regex_path(texts):
    import pandas as pd

    s = pd.Series(texts, dtype=object)
    for an in (StandardAnalyzer(), SimpleAnalyzer()):
        flat, lens = an.tokenize_flat(s)
        lists = an.tokenize_series(s)
        assert lens.tolist() == [len(x) for x in lists]
        assert flat.tolist() == [t for ts in lists for t in ts]


@given(
    pos_lists=st.lists(
        st.lists(st.integers(0, 60), min_size=1, max_size=8, unique=True),
        min_size=2, max_size=4,
    ),
    slop=st.integers(0, 6),
)
@settings(max_examples=300, deadline=None)
def test_sloppy_matcher_invariants(pos_lists, slop):
    """Independent invariants of the sloppy matcher (no shared code):
    1. slop=0 ≡ exact matching: freq == count of aligned start positions;
    2. binary match ⟺ some alignment tuple has window ≤ slop (brute force);
    3. freq is monotone non-decreasing in slop.
    """
    import itertools

    import numpy as np

    from lucene_spark.search.phrase import _sloppy_freq_doc

    pls = [np.array(sorted(p), dtype=np.int64) - i
           for i, p in enumerate(pos_lists)]

    # 1. slop=0 equals exact count (intersection of adjusted positions)
    exact = len(set(pls[0].tolist()).intersection(
        *[set(p.tolist()) for p in pls[1:]]))
    assert _sloppy_freq_doc(pls, 0) == float(np.float32(exact))

    # 2. binary match vs brute force over all alignment tuples
    f = _sloppy_freq_doc(pls, slop)
    brute = any(
        max(t) - min(t) <= slop
        for t in itertools.product(*[p.tolist() for p in pls])
    )
    assert (f > 0.0) == brute, (pos_lists, slop, f)

    # 3. monotone in slop
    assert _sloppy_freq_doc(pls, slop + 1) >= f - 1e-6


def _segment_from_docs(docs_tokens):
    """Encode a list of per-doc token streams as one-segment postings rows
    (one block per term), independent of the builder."""
    from lucene_spark.indexing.blocks import CODEC_VARINT, _encode_one

    def encode_varints(arr):  # tagged, as the builder writes them
        return _encode_one(np.asarray(arr, dtype=np.int64), CODEC_VARINT)

    by_term: dict = {}
    for d, toks in enumerate(docs_tokens):
        for p, t in enumerate(toks):
            by_term.setdefault(t, {}).setdefault(d, []).append(p)
    terms, fds, lds, cnts, gaps, tfs, nms, poss = [], [], [], [], [], [], [], []
    for t in sorted(by_term):
        dmap = by_term[t]
        ds = sorted(dmap)
        terms.append(t)
        fds.append(ds[0])
        lds.append(ds[-1])
        cnts.append(len(ds))
        gaps.append(encode_varints(
            np.diff(np.array(ds, dtype=np.int64))))
        tfs.append(encode_varints(
            np.array([len(dmap[d]) for d in ds], dtype=np.int64)))
        nms.append(bytes([24]) * len(ds))
        deltas = []
        for d in ds:
            ps = dmap[d]
            deltas.extend([ps[0]] + list(np.diff(ps)))
        poss.append(encode_varints(np.array(deltas, dtype=np.int64)))
    return {
        "term": np.array(terms, dtype=object),
        "first_doc": np.array(fds, dtype=np.int64),
        "last_doc": np.array(lds, dtype=np.int64),
        "count": np.array(cnts, dtype=np.int64),
        "doc_gaps": np.array(gaps, dtype=object),
        "tfs": np.array(tfs, dtype=object),
        "norms": np.array(nms, dtype=object),
        "positions": np.array(poss, dtype=object),
    }


def _brute_span(docs_tokens, terms, slop, in_order, max_end=None,
                exclude=None, pre=0, post=0, contain=None):
    import itertools

    out = []
    for d, toks in enumerate(docs_tokens):
        pls = [[p for p, t in enumerate(toks) if t == q] for q in terms]
        if any(not p for p in pls):
            continue
        orders = ([list(range(len(terms)))] if in_order
                  else [list(o) for o in
                        itertools.permutations(range(len(terms)))])
        hit = False
        for od in orders:
            for combo in itertools.product(*[pls[i] for i in od]):
                if len(terms) > 1 and not all(
                        combo[j] > combo[j - 1]
                        for j in range(1, len(terms))):
                    continue
                if len(set(combo)) != len(combo):
                    continue
                s, e = combo[0], combo[-1]
                if e - s - (len(terms) - 1) > slop:
                    continue
                if max_end is not None and e + 1 > max_end:
                    continue
                if exclude is not None and any(
                        toks[p] == exclude for p in
                        range(max(0, s - pre),
                              min(len(toks), e + post + 1))):
                    continue
                if contain is not None and not any(
                        toks[p] == contain for p in range(s, e + 1)):
                    continue
                hit = True
                break
            if hit:
                break
        if hit:
            out.append(d)
    return out


_SPAN_DOC = st.lists(st.sampled_from("abcy"), min_size=1, max_size=14)


@given(
    docs=st.lists(_SPAN_DOC, min_size=1, max_size=4),
    terms=st.lists(st.sampled_from("abc"), min_size=1, max_size=3),
    slop=st.integers(0, 5),
    in_order=st.booleans(),
    variant=st.sampled_from(["plain", "first", "not", "contain"]),
)
@settings(max_examples=400, deadline=None)
def test_span_kernel_randomized_vs_brute(docs, terms, slop, in_order,
                                         variant):
    """The span kernel (ordered/unordered, SpanFirst/SpanNot/
    SpanContaining variants) equals full brute enumeration on random
    token streams."""
    from lucene_spark.search.phrase import segment_span_near

    rows = _segment_from_docs(docs)
    kw, bw = {}, {}
    if variant == "first":
        kw = bw = {"max_end": 4}
    elif variant == "not":
        kw = bw = {"exclude": "y", "pre": 1, "post": 1}
    elif variant == "contain":
        kw = bw = {"contain": "y"}
    present = {t for d in docs for t in d}
    if any(t not in present for t in terms):
        got = []  # dead required slot
        exp = []
    else:
        got = segment_span_near(rows, list(terms), slop,
                                in_order=in_order, **kw).tolist()
        exp = _brute_span(docs, list(terms), slop, in_order, **bw)
    assert got == exp, (docs, terms, slop, in_order, variant)
