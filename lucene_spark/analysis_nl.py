"""Dutch Snowball stemmer (``org/tartarus/snowball/ext/DutchStemmer.java``,
generated from Martin Porter's public dutch.sbl; the reference's
SnowballPorterFilterFactory(language=Dutch) chain).

Transcribed from the generated driver: prelude (umlaut/acute folding,
consonant i→I / y→Y marking), R1 (floored at 3) / R2, the standard-suffix
cascade (heden→heid, en/ene endings with the gem-guard and dd/kk/tt
undoubling, s/se after a non-v_j character, R1 e-ending with undoubling,
R2 heid with the c-guard + chained en, end/ing with the ig follow-up,
lijk + e-ending, baar, bar gated on a fired e-ending, and the long-vowel
aa/ee/oo/uu undoubling before a final consonant), postlude unmarking.
Parity pinned by the reference's own 2000-word golden
(``snowball/dutch.zip``) in tests/test_porter2.py.
"""

from __future__ import annotations

from lucene_spark.analysis_en import EnglishAnalyzer

_VOW = frozenset("aeiouyè")          # g_v (marked I/Y are consonants)
_VOW_I = frozenset("aeiouyèI")       # g_v_I
_VOW_J = frozenset("aeijouyè")       # g_v_j
_FOLD = str.maketrans({"á": "a", "ä": "a", "é": "e", "ë": "e",
                       "í": "i", "ï": "i", "ó": "o", "ö": "o",
                       "ú": "u", "ü": "u"})


def _undouble(w: str) -> str:
    if w.endswith(("dd", "kk", "tt")):
        return w[:-1]
    return w


def dutch_stem(word: str) -> str:
    # prelude
    w = word.translate(_FOLD)
    chars = list(w)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(len(chars) - 1):
        if chars[i] in _VOW:
            if (chars[i + 1] == "i" and i + 2 < len(chars)
                    and chars[i + 2] in _VOW):
                chars[i + 1] = "I"
            elif chars[i + 1] == "y":
                chars[i + 1] = "Y"
    w = "".join(chars)

    # regions (R1 floored at 3)
    def _scan(s: str, i: int) -> int:
        n = len(s)
        while i < n and s[i] not in _VOW:
            i += 1
        while i < n and s[i] in _VOW:
            i += 1
        if i >= n:
            return n
        return i + 1

    # the p2 scan continues from the RAW p1 position; only I_p1 is floored
    raw1 = _scan(w, 0)
    p1 = max(raw1, 3) if raw1 < len(w) else raw1
    p2 = _scan(w, raw1)

    e_found = False

    def en_ending(stem: str, suf_len: int) -> str:
        """r_en_ending at the current end: R1, preceded by a non-vowel,
        not preceded by 'gem'; delete + undouble. Returns the (possibly
        unchanged) word."""
        cut = len(stem) - suf_len
        if cut < p1:
            return stem
        if cut == 0 or stem[cut - 1] in _VOW:
            return stem
        if stem[:cut].endswith("gem"):
            return stem
        return _undouble(stem[:cut])

    def e_ending(stem: str) -> str:
        nonlocal e_found
        if (stem.endswith("e") and len(stem) - 1 >= p1
                and len(stem) >= 2 and stem[-2] not in _VOW):
            e_found = True
            return _undouble(stem[:-1])
        return stem

    # part 1: longest of heden / ene / en / se / s
    if w.endswith("heden"):
        if len(w) - 5 >= p1:
            w = w[:-5] + "heid"
    elif w.endswith("ene"):
        w = en_ending(w, 3)
    elif w.endswith("en"):
        w = en_ending(w, 2)
    elif w.endswith("se"):
        if (len(w) - 2 >= p1 and len(w) >= 3 and w[-3] not in _VOW_J):
            w = w[:-2]
    elif w.endswith("s"):
        if (len(w) - 1 >= p1 and len(w) >= 2 and w[-2] not in _VOW_J):
            w = w[:-1]

    # part 2: e-ending
    w = e_ending(w)

    # part 3: heid (R2, not after c), then a chained en-ending
    if (w.endswith("heid") and len(w) - 4 >= p2
            and not w[:-4].endswith("c")):
        w = w[:-4]
        if w.endswith("en"):
            w = en_ending(w, 2)

    # part 4: longest of lijk / baar / end / ing / bar / ig
    if w.endswith("lijk"):
        if len(w) - 4 >= p2:
            w = e_ending(w[:-4])
    elif w.endswith("baar"):
        if len(w) - 4 >= p2:
            w = w[:-4]
    elif w.endswith(("end", "ing")):
        if len(w) - 3 >= p2:
            w = w[:-3]
            if (w.endswith("ig") and len(w) - 2 >= p2
                    and not w[:-2].endswith("e")):
                w = w[:-2]
            else:
                w = _undouble(w)
    elif w.endswith("bar"):
        if len(w) - 3 >= p2 and e_found:
            w = w[:-3]
    elif w.endswith("ig"):
        if len(w) - 2 >= p2 and not w[:-2].endswith("e"):
            w = w[:-2]

    # part 5: undouble a long vowel before a final consonant
    if (len(w) >= 4 and w[-1] not in _VOW_I
            and w[-3:-1] in ("aa", "ee", "oo", "uu")
            and w[-4] not in _VOW):
        w = w[:-2] + w[-1]

    # postlude
    return w.replace("I", "i").replace("Y", "y")


class DutchAnalyzer(EnglishAnalyzer):
    """StandardTokenizer → LowerCase → SnowballFilter(DutchStemmer) — no
    stop set; vocabulary-level remap like the other stemmer chains."""

    name = "dutch"
    max_token_length = 255

    def filter_token(self, t: str) -> str | None:
        return dutch_stem(t)
