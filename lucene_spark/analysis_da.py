"""Scandinavian Snowball stemmers: Danish, Swedish, Norwegian
(``org/tartarus/snowball/ext/{Danish,Swedish,Norwegian}Stemmer.java``,
generated from Martin Porter's public danish/swedish/norwegian.sbl; the
reference's SnowballPorterFilterFactory chains). Each replays its full
2000-word snowball golden vocabulary in tests/test_porter2.py.

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


# ---- Swedish Snowball (org/tartarus/snowball/ext/SwedishStemmer.java) ----

_SV_VOW = frozenset("aeiouyäåö")
_SV_S_END = frozenset("bcdfghjklmnoprtvy")
_SV_A0 = sorted(
    ("a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
     "arne", "are", "aste", "en", "anden", "aren", "heten", "ern", "ar",
     "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es", "ades",
     "andes", "ens", "arens", "hetens", "erns", "at", "andet", "het",
     "ast", "s"),
    key=len, reverse=True)


def _sv_p1(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    i = 0
    while i < n and w[i] not in _SV_VOW:
        i += 1
    while i < n and w[i] in _SV_VOW:
        i += 1
    if i >= n:
        return n
    return max(i + 1, 3)


def swedish_stem(word: str) -> str:
    """Swedish Snowball stem (``SwedishStemmer.java``): R1-fitted suffix
    among (with the valid-s-ending class), dd/gd/nn/dt/gt/kt consonant
    pairs, then ig/lig/els deletion and löst→lös / fullt→full."""
    w = word
    p1 = _sv_p1(w)
    for suf in _SV_A0:
        if w.endswith(suf) and len(w) - len(suf) >= p1:
            if suf == "s":
                if len(w) >= 2 and w[-2] in _SV_S_END:
                    w = w[:-1]
            else:
                w = w[:-len(suf)]
            break
    if (len(w) >= 2 and w[-2:] in ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
            and len(w) - 2 >= p1):
        w = w[:-1]
    for suf in ("fullt", "löst", "lig", "els", "ig"):
        if w.endswith(suf) and len(w) - len(suf) >= p1:
            if suf == "fullt":
                w = w[:-1]
            elif suf == "löst":
                w = w[:-1]
            else:
                w = w[:-len(suf)]
            break
    return w


# --- Norwegian Snowball (org/tartarus/snowball/ext/NorwegianStemmer.java) --

_NO_VOW = frozenset("aeiouyåæø")
_NO_S_END = frozenset("bcdfghjlmnoprtvyz")  # no k — handled separately
_NO_A0_DEL = sorted(
    ("a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en", "heten",
     "ar", "er", "heter", "as", "es", "edes", "endes", "enes", "hetenes",
     "ens", "hetens", "ers", "ets", "et", "het", "ast"),
    key=len, reverse=True)
_NO_A2 = sorted(
    ("leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
     "slov", "hetslov"),
    key=len, reverse=True)


def _no_p1(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    i = 0
    while i < n and w[i] not in _NO_VOW:
        i += 1
    while i < n and w[i] in _NO_VOW:
        i += 1
    if i >= n:
        return n
    return max(i + 1, 3)


def norwegian_snowball_stem(word: str) -> str:
    """Norwegian Snowball stem (``NorwegianStemmer.java``): R1-fitted
    suffix among (erte/ert→er; 's' after a valid ending or k-after-
    non-vowel), dt/vt consonant pairs, then the leg/eleg/ig/…/hetslov
    deletions."""
    w = word
    p1 = _no_p1(w)
    # main suffix — longest of the delete list, erte/ert, and s
    cands = _NO_A0_DEL + ["erte", "ert", "s"]
    cands.sort(key=len, reverse=True)
    for suf in cands:
        if w.endswith(suf) and len(w) - len(suf) >= p1:
            if suf in ("erte", "ert"):
                w = w[:-len(suf)] + "er"
            elif suf == "s":
                ok = len(w) >= 2 and w[-2] in _NO_S_END
                if not ok and len(w) >= 3 and w[-2] == "k" \
                        and w[-3] not in _NO_VOW:
                    ok = True
                if ok:
                    w = w[:-1]
            else:
                w = w[:-len(suf)]
            break
    if (len(w) >= 2 and w[-2:] in ("dt", "vt") and len(w) - 2 >= p1):
        w = w[:-1]
    for suf in _NO_A2:
        if w.endswith(suf) and len(w) - len(suf) >= p1:
            w = w[:-len(suf)]
            break
    return w


class DanishAnalyzer(EnglishAnalyzer):
    """StandardTokenizer → LowerCase → SnowballFilter(DanishStemmer) — no
    stop set; vocabulary-level remap like the other stemmer chains."""

    name = "danish"
    max_token_length = 255

    def filter_token(self, t: str) -> str | None:
        return danish_stem(t)


class SwedishSnowballAnalyzer(EnglishAnalyzer):
    name = "swedish_snowball"
    max_token_length = 255

    def filter_token(self, t: str) -> str | None:
        return swedish_stem(t)


class NorwegianSnowballAnalyzer(EnglishAnalyzer):
    name = "norwegian_snowball"
    max_token_length = 255

    def filter_token(self, t: str) -> str | None:
        return norwegian_snowball_stem(t)
