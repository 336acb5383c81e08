"""Finnish Snowball stemmer
(``org/tartarus/snowball/ext/FinnishStemmer.java``, generated from the
public finnish.sbl; the FULL algorithm alongside the CLEF light variant in
analysis_lang.py).

Transcribed from the generated driver: R1/R2 over the Finnish vowel class,
then the pass sequence — particle (harmony pairs kaan/kään, han/hän, …
after a particle-end character; sti in R2), possessives (si-not-after-k,
ni with the kse→ksi restore, the an/än/en context classes), case endings
(illative han/hen/hin/hon/hän/hön harmony checks, den/tten/siin via the
i-after-V2 condition, seen via a long vowel, n with the long/ie extension,
a/ä after vowel+consonant), comparative endings in R2 (mpi/mma family,
po-guarded), then i-plural OR t-plural depending on whether a case ending
fired, and the four tidy rules (long-vowel shortening, AEI-after-
consonant, oj/uj/jo, final consonant undoubling before trailing vowels).
Parity pinned by the reference's own 2000-word golden
(``snowball/finnish.zip``) in tests/test_porter2.py.
"""

from __future__ import annotations

from lucene_spark.analysis_en import EnglishAnalyzer

_V1 = frozenset("aeiouyäö")
_V2 = frozenset("aeiouäö")
_AEI = frozenset("aeiä")
_CONS = frozenset("bcdfghjklmnpqrstvwxz")
_PARTICLE_END = frozenset("aeinotuyäö")
_LONGS = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")

_PARTICLE = sorted([("kaan", 1), ("kään", 1), ("han", 1), ("hän", 1),
                    ("kin", 1), ("sti", 2), ("pa", 1), ("pä", 1),
                    ("ko", 1), ("kö", 1)], key=lambda m: len(m[0]),
                   reverse=True)
_POSS = sorted([("nsa", 3), ("nsä", 3), ("mme", 3), ("nne", 3), ("ni", 2),
                ("si", 1), ("an", 4), ("än", 5), ("en", 6)],
               key=lambda m: len(m[0]), reverse=True)
_AN_PRE = ("lla", "na", "ssa", "ta", "lta", "sta")
_AEN_PRE = ("llä", "nä", "ssä", "tä", "ltä", "stä")
_EN_PRE = ("lle", "ine")

_CASE = sorted([
    ("tten", "VI"), ("siin", "VI"), ("seen", "LONG"),
    ("lla", None), ("ssa", None), ("lta", None), ("sta", None),
    ("tta", "e"), ("lle", None), ("ine", None), ("ksi", None),
    ("han", "a"), ("den", "VI"), ("hen", "e"), ("hin", "i"),
    ("hon", "o"), ("hän", "ä"), ("hön", "ö"),
    ("llä", None), ("ssä", None), ("ltä", None), ("stä", None),
    ("ttä", "e"),
    ("na", None), ("ta", None), ("nä", None), ("tä", None),
    ("a", "VC"), ("ä", "VC"), ("n", "N"),
], key=lambda m: len(m[0]), reverse=True)

_OTHER = sorted([("imma", None), ("impa", None), ("immi", None),
                 ("impi", None), ("immä", None), ("impä", None),
                 ("eja", None), ("ejä", None),
                 ("mma", "po"), ("mpa", "po"), ("mmi", "po"),
                 ("mpi", "po"), ("mmä", "po"), ("mpä", "po")],
                key=lambda m: len(m[0]), reverse=True)


def finnish_snowball_stem(word: str) -> str:
    w = word
    n = len(w)

    def _scan(i: int) -> int:
        while i < n and w[i] not in _V1:
            i += 1
        while i < n and w[i] in _V1:
            i += 1
        if i >= n:
            return n
        return i + 1

    p1 = _scan(0)
    p2 = _scan(p1)
    ending_removed = False

    def fits(m: int, ln: int) -> bool:
        return len(w) - ln >= m

    # particle etc.
    for suf, act in _PARTICLE:
        if w.endswith(suf) and fits(p1, len(suf)):
            cut = len(w) - len(suf)
            if act == 1:
                if cut >= 1 and w[cut - 1] in _PARTICLE_END:
                    w = w[:cut]
            else:  # sti — R2
                if cut >= p2:
                    w = w[:cut]
            break
    # possessive
    for suf, act in _POSS:
        if w.endswith(suf) and fits(p1, len(suf)):
            cut = len(w) - len(suf)
            if act == 1:  # si, not after k
                if not (cut >= 1 and w[cut - 1] == "k"):
                    w = w[:cut]
            elif act == 2:  # ni, with kse → ksi restore
                w = w[:cut]
                if w.endswith("kse"):
                    w = w[:-3] + "ksi"
            elif act == 3:
                w = w[:cut]
            elif act == 4:
                if w[:cut].endswith(_AN_PRE):
                    w = w[:cut]
            elif act == 5:
                if w[:cut].endswith(_AEN_PRE):
                    w = w[:cut]
            else:  # en
                if w[:cut].endswith(_EN_PRE):
                    w = w[:cut]
            break
    # case ending. The VI/LONG entries carry among-ROUTINE conditions: a
    # failure falls back to shorter candidates (the among parent chain),
    # unlike the switch-case gates which commit.
    for suf, cond in _CASE:
        if w.endswith(suf) and fits(p1, len(suf)):
            cut = len(w) - len(suf)
            if cond == "VI":
                if not (cut >= 2 and w[cut - 1] == "i"
                        and w[cut - 2] in _V2):
                    continue  # routine failure → try shorter suffixes
            elif cond == "LONG":
                if not (cut >= 2 and w[cut - 2:cut] in _LONGS):
                    continue
            extra = 0
            ok = True
            if cond == "VC":
                ok = (cut >= 2 and w[cut - 1] in _V1
                      and w[cut - 2] in _CONS)
            elif cond == "N":
                if ((cut >= 2 and w[cut - 2:cut] in _LONGS)
                        or w[:cut].endswith("ie")):
                    extra = 1
            elif cond not in (None, "VI", "LONG"):
                ok = cut >= 1 and w[cut - 1] == cond
            if ok:
                w = w[:cut - extra]
                ending_removed = True
            break
    # other endings (comparatives, R2)
    for suf, cond in _OTHER:
        if w.endswith(suf) and fits(p2, len(suf)):
            cut = len(w) - len(suf)
            if cond == "po" and w[:cut].endswith("po"):
                break
            w = w[:cut]
            break
    # plurals
    if ending_removed:
        if w and w[-1] in "ij" and len(w) - 1 >= p1:
            w = w[:-1]
    else:
        if (w.endswith("t") and len(w) - 1 >= p1
                and len(w) >= 2 and w[-2] in _V1):
            w = w[:-1]
            for suf, cond in (("imma", None), ("mma", "po")):
                if w.endswith(suf) and len(w) - len(suf) >= p2:
                    cut = len(w) - len(suf)
                    if cond == "po" and w[:cut].endswith("po"):
                        break
                    w = w[:cut]
                    break
    # tidy
    if len(w) >= 2 and w[-2:] in _LONGS and len(w) - 2 >= p1:
        w = w[:-1]
    # both consumed characters must lie within R1 (the generated code
    # consumes them under limit_backward = I_p1)
    if (len(w) >= 2 and w[-1] in _AEI and w[-2] in _CONS
            and len(w) - 2 >= p1):
        w = w[:-1]
    if (len(w) >= 2 and w[-1] == "j" and w[-2] in "ou"
            and len(w) - 2 >= p1):
        w = w[:-1]
    if (len(w) >= 2 and w[-1] == "o" and w[-2] == "j"
            and len(w) - 2 >= p1):
        w = w[:-1]
    # final consonant undoubling before trailing vowels (unrestricted)
    k = len(w) - 1
    while k >= 0 and w[k] in _V1:
        k -= 1
    if k >= 1 and w[k] in _CONS and w[k - 1] == w[k]:
        w = w[:k] + w[k + 1:]
    return w


class FinnishSnowballAnalyzer(EnglishAnalyzer):
    name = "finnish_snowball"
    max_token_length = 255

    def filter_token(self, t: str) -> str | None:
        return finnish_snowball_stem(t)
