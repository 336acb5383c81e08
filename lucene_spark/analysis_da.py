"""Danish Snowball stemmer (``org/tartarus/snowball/ext/DanishStemmer.java``,
generated from Martin Porter's public danish.sbl; the reference's
SnowballPorterFilterFactory(language=Danish) chain).

Transcribed from the generated driver: R1 (standard definition, floored at
position 3), main suffix removal restricted to R1 (longest among, the 's'
case gated on the Danish valid-s-ending class), consonant-pair undoubling
(gd/dt/gt/kt drop the final letter), other-suffix pass (the igst fast path
plus ig/lig/elig/els deletion with a consonant-pair retry and løst→løs),
final double-consonant undoubling. Parity pinned by the reference's own
2000-word golden (``snowball/danish.zip``) in tests/test_porter2.py.
"""

from __future__ import annotations

from lucene_spark.analysis_en import EnglishAnalyzer

_VOW = frozenset("aeiouyåæø")  # g_v
# g_s_ending: letters a valid pre-'s' position may hold
_S_END = frozenset("abcdfghjklmnoprtvyzå")
_CONS = frozenset("bcdfghjklmnpqrstvwxz")  # g_c (undouble class)

# a_0 case-1 suffixes (delete within R1); 's' is the case-2 entry
_A0 = sorted(
    ("hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene", "erne",
     "ere", "en", "heden", "eren", "er", "heder", "erer", "heds", "es",
     "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens", "erens",
     "ers", "ets", "erets", "et", "eret", "s"),
    key=len, reverse=True)


def _p1(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    i = 0
    while i < n and w[i] not in _VOW:
        i += 1
    while i < n and w[i] in _VOW:
        i += 1
    if i >= n:
        return n
    return max(i + 1, 3)


def _consonant_pair(w: str, p1: int) -> str:
    if (len(w) >= 2 and w[-2:] in ("gd", "dt", "gt", "kt")
            and len(w) - 2 >= p1):
        return w[:-1]
    return w


def danish_stem(word: str) -> str:
    w = word
    p1 = _p1(w)
    # main suffix: longest a_0 entry that fits entirely within R1
    for suf in _A0:
        if w.endswith(suf) and len(w) - len(suf) >= p1:
            if suf == "s":
                if len(w) >= 2 and w[-2] in _S_END:
                    w = w[:-1]
            else:
                w = w[:-len(suf)]
            break
    w = _consonant_pair(w, p1)
    # other suffix: the (un-gated) igst fast path, then the R1-gated list
    if w.endswith("igst"):
        w = w[:-2]
    for suf in ("elig", "løst", "lig", "els", "ig"):
        if w.endswith(suf) and len(w) - len(suf) >= p1:
            if suf == "løst":
                w = w[:-1]  # løst → løs
            else:
                w = w[:-len(suf)]
                w = _consonant_pair(w, p1)
            break
    # undouble a trailing double consonant within R1
    if (len(w) >= 2 and w[-1] == w[-2] and w[-1] in _CONS
            and len(w) - 1 >= p1):
        w = w[:-1]
    return w


class DanishAnalyzer(EnglishAnalyzer):
    """StandardTokenizer → LowerCase → SnowballFilter(DanishStemmer) — no
    stop set; vocabulary-level remap like the other stemmer chains."""

    name = "danish"
    max_token_length = 255

    def filter_token(self, t: str) -> str | None:
        return danish_stem(t)
