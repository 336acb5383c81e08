"""German Snowball stemmer (``org/tartarus/snowball/ext/GermanStemmer.java``,
generated from Martin Porter's public german.sbl; the reference's
SnowballPorterFilterFactory(language=German) chain — the FULL algorithm
alongside the UniNE light/minimal variants in analysis_lang.py).

Transcribed from the generated driver: prelude (ß→ss, u/y between vowels
marked U/Y), R1 floored at 3 with the raw-position p2 scan, the three
suffix passes (declensional e/em/en/ern/er/es/s with the niss rule and the
valid-s-ending class; en/er/est/st with the st-ending class and the ≥3
guard; R2 derivational end/ung → ig, ig/isch/ik after non-e, lich/heit →
er/en, keit → lich/ig), postlude unmark + umlaut fold. Parity pinned by
the reference's own 2000-word golden (``snowball/german.zip``).
"""

from __future__ import annotations

from lucene_spark.analysis_en import EnglishAnalyzer

_VOW = frozenset("aeiouyäöü")
_S_END = frozenset("bdfghklmnrt")
_ST_END = frozenset("bdfghklmnt")
_POSTLUDE = str.maketrans({"U": "u", "Y": "y", "ä": "a", "ö": "o", "ü": "u"})


def _mark_uy(w: str) -> str:
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if (chars[i] in "uy" and chars[i - 1] in _VOW
                and chars[i + 1] in _VOW):
            chars[i] = chars[i].upper()
    return "".join(chars)


def german2_snowball_stem(word: str) -> str:
    """German2 variant (``org/tartarus/snowball/ext/German2Stemmer.java``):
    marks intervocalic u/y FIRST, then rewrites ß→ss and ae/oe/ue → ä/ö/ü
    (qu protected, marked U exempt by case), and runs the shared German
    suffix core."""
    chars = list(_mark_uy(word))
    res: list[str] = []
    i, n = 0, len(chars)
    while i < n:
        c = chars[i]
        if c == "ß":
            res.append("s")
            res.append("s")
            i += 1
        elif c == "q" and i + 1 < n and chars[i + 1] == "u":
            res.append("q")
            res.append("u")
            i += 2
        elif (c in "aou" and i + 1 < n and chars[i + 1] == "e"):
            res.append({"a": "ä", "o": "ö", "u": "ü"}[c])
            i += 2
        else:
            res.append(c)
            i += 1
    return _german_core("".join(res))


def german_snowball_stem(word: str) -> str:
    # prelude: ß→ss, then intervocalic u/y marking
    return _german_core(_mark_uy(word.replace("ß", "ss")))


def _german_core(w: str) -> str:

    # regions: R1 floored at 3, p2 scans on from the raw position
    def _scan(s: str, i: int) -> int:
        n = len(s)
        while i < n and s[i] not in _VOW:
            i += 1
        while i < n and s[i] in _VOW:
            i += 1
        if i >= n:
            return n
        return i + 1

    raw1 = _scan(w, 0)
    p1 = max(raw1, 3) if raw1 < len(w) else raw1
    p2 = _scan(w, raw1)

    # part 1 (R1): declensional suffixes
    for suf in ("ern", "em", "er", "en", "es", "e", "s"):
        if w.endswith(suf):
            if len(w) - len(suf) >= p1:
                if suf == "s":
                    if len(w) >= 2 and w[-2] in _S_END:
                        w = w[:-1]
                elif suf in ("e", "en", "es"):
                    w = w[:-len(suf)]
                    if w.endswith("niss"):  # Verhältnisse → Verhältnis
                        w = w[:-1]
                else:
                    w = w[:-len(suf)]
            break
    # part 2 (R1): en/er/est, st after a valid ending with ≥3 chars before
    for suf in ("est", "en", "er", "st"):
        if w.endswith(suf):
            if len(w) - len(suf) >= p1:
                if suf == "st":
                    # valid st-ending char, itself preceded by ≥3 letters
                    if len(w) >= 6 and w[-3] in _ST_END:
                        w = w[:-2]
                else:
                    w = w[:-len(suf)]
            break
    # part 3 (R2): derivational suffixes
    for suf in ("lich", "heit", "keit", "isch", "end", "ung", "ig", "ik"):
        if w.endswith(suf):
            if len(w) - len(suf) >= p2:
                if suf in ("end", "ung"):
                    w = w[:-len(suf)]
                    if (w.endswith("ig") and not w[:-2].endswith("e")
                            and len(w) - 2 >= p2):
                        w = w[:-2]
                elif suf in ("ig", "isch", "ik"):
                    if not w[:-len(suf)].endswith("e"):
                        w = w[:-len(suf)]
                elif suf in ("lich", "heit"):
                    w = w[:-len(suf)]
                    for sub in ("er", "en"):
                        if w.endswith(sub) and len(w) - 2 >= p1:
                            w = w[:-2]
                            break
                else:  # keit
                    w = w[:-len(suf)]
                    for sub in ("lich", "ig"):
                        if (w.endswith(sub)
                                and len(w) - len(sub) >= p2):
                            w = w[:-len(sub)]
                            break
            break
    # postlude
    return w.translate(_POSTLUDE)


class GermanSnowballAnalyzer(EnglishAnalyzer):
    name = "german_snowball"
    max_token_length = 255

    def filter_token(self, t: str) -> str | None:
        return german_snowball_stem(t)


class German2SnowballAnalyzer(EnglishAnalyzer):
    name = "german2_snowball"
    max_token_length = 255

    def filter_token(self, t: str) -> str | None:
        return german2_snowball_stem(t)
