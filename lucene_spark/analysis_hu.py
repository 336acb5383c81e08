"""Hungarian Snowball stemmer
(``org/tartarus/snowball/ext/HungarianStemmer.java``, generated from the
public hungarian.sbl; the FULL algorithm alongside the UniNE light variant
in analysis_lang.py).

Transcribed from the generated driver: the Hungarian R1 (after the first
consonant-or-digraph when the word starts with a vowel — cs/dzs/gy/ly/ny/
sz/ty/zs count as one — else after the first vowel), then nine independent
backward passes: instrumental al/el after a doubled consonant (with
undoubling), case endings + á/é→a/e v-ending, the án/én/ánként specials,
stul/stül, factive á/é with undoubling, owned/sing-owner/plur-owner
possessives, and plurals. Parity pinned by the reference's own 2000-word
golden (``snowball/hungarian.zip``) in tests/test_porter2.py.
"""

from __future__ import annotations

from lucene_spark.analysis_en import EnglishAnalyzer

_V = frozenset("aeiouáéíóöúüőű")
_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_DOUBLES = ("ccs", "zzs", "ggy", "lly", "nny", "tty", "ssz", "bb", "cc",
            "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn", "pp", "rr",
            "ss", "tt", "vv", "zz")

_CASE = sorted(
    ("ba", "ra", "be", "re", "ig", "nak", "nek", "val", "vel", "ul",
     "nál", "nél", "ból", "ról", "tól", "ül", "ből", "ről", "től", "n",
     "an", "ban", "en", "ben", "képpen", "on", "ön", "képp", "kor", "t",
     "at", "et", "ként", "anként", "enként", "onként", "ot", "ért", "öt",
     "hez", "hoz", "höz", "vá", "vé"), key=len, reverse=True)

_OWNED = sorted([("éi", 1), ("áéi", 3), ("ééi", 2), ("é", 1), ("ké", 1),
                 ("aké", 1), ("eké", 1), ("oké", 1), ("áké", 3),
                 ("éké", 2), ("öké", 1), ("éé", 2)],
                key=lambda m: len(m[0]), reverse=True)
_SING = sorted([("a", 1), ("ja", 1), ("d", 1), ("ad", 1), ("ed", 1),
                ("od", 1), ("ád", 2), ("éd", 3), ("öd", 1), ("e", 1),
                ("je", 1), ("nk", 1), ("unk", 1), ("ánk", 2), ("énk", 3),
                ("ünk", 1), ("uk", 1), ("juk", 1), ("ájuk", 2), ("ük", 1),
                ("jük", 1), ("éjük", 3), ("m", 1), ("am", 1), ("em", 1),
                ("om", 1), ("ám", 2), ("ém", 3), ("o", 1), ("á", 2),
                ("é", 3)], key=lambda m: len(m[0]), reverse=True)
_PLUR = sorted([("id", 1), ("aid", 1), ("jaid", 1), ("eid", 1),
                ("jeid", 1), ("áid", 2), ("éid", 3), ("i", 1), ("ai", 1),
                ("jai", 1), ("ei", 1), ("jei", 1), ("ái", 2), ("éi", 3),
                ("itek", 1), ("eitek", 1), ("jeitek", 1), ("éitek", 3),
                ("ik", 1), ("aik", 1), ("jaik", 1), ("eik", 1),
                ("jeik", 1), ("áik", 2), ("éik", 3), ("ink", 1),
                ("aink", 1), ("jaink", 1), ("eink", 1), ("jeink", 1),
                ("áink", 2), ("éink", 3), ("aitok", 1), ("jaitok", 1),
                ("áitok", 2), ("im", 1), ("aim", 1), ("jaim", 1),
                ("eim", 1), ("jeim", 1), ("áim", 2), ("éim", 3)],
               key=lambda m: len(m[0]), reverse=True)
_PLURAL = sorted([("k", 3), ("ak", 3), ("ek", 3), ("ok", 3), ("ák", 1),
                  ("ék", 2), ("ök", 3)], key=lambda m: len(m[0]),
                 reverse=True)


def _p1(w: str) -> int:
    n = len(w)
    if not n:
        return 0
    if w[0] in _V:
        i = 0
        while i < n and w[i] in _V:
            i += 1
        if i == n:
            return n
        for d in _DIGRAPHS:
            if w.startswith(d, i):
                return i + len(d)
        return i + 1
    i = 0
    while i < n and w[i] not in _V:
        i += 1
    return i + 1 if i < n else n


def hungarian_snowball_stem(word: str) -> str:
    w = word
    p1 = _p1(w)

    def r1(ln: int) -> bool:
        return len(w) - ln >= p1

    def v_ending():
        nonlocal w
        if w.endswith("á") and r1(1):
            w = w[:-1] + "a"
        elif w.endswith("é") and r1(1):
            w = w[:-1] + "e"

    def undouble():
        nonlocal w
        if len(w) >= 2:
            w = w[:-2] + w[-1]

    # instrumental: al/el after a doubled consonant
    if w.endswith(("al", "el")) and r1(2):
        rest = w[:-2]
        if rest.endswith(_DOUBLES):
            w = rest
            undouble()
    # case
    for suf in _CASE:
        if w.endswith(suf):
            if r1(len(suf)):
                w = w[:-len(suf)]
                v_ending()
            break
    # case special: ánként/án → a, én → e
    for suf, rep in (("ánként", "a"), ("án", "a"), ("én", "e")):
        if w.endswith(suf):
            if r1(len(suf)):
                w = w[:-len(suf)] + rep
            break
    # case other: stul/stül delete; ástul → a; éstül → e
    for suf, rep in (("ástul", "a"), ("éstül", "e"), ("astul", ""),
                     ("estül", ""), ("stul", ""), ("stül", "")):
        if w.endswith(suf):
            if r1(len(suf)):
                w = w[:-len(suf)] + rep
            break
    # factive: á/é after a doubled consonant
    if w.endswith(("á", "é")) and r1(1):
        rest = w[:-1]
        if rest.endswith(_DOUBLES):
            w = rest
            undouble()
    # owned
    for suf, act in _OWNED:
        if w.endswith(suf):
            if r1(len(suf)):
                w = w[:-len(suf)] + {1: "", 2: "e", 3: "a"}[act]
            break
    # sing owner
    for suf, act in _SING:
        if w.endswith(suf):
            if r1(len(suf)):
                w = w[:-len(suf)] + {1: "", 2: "a", 3: "e"}[act]
            break
    # plur owner
    for suf, act in _PLUR:
        if w.endswith(suf):
            if r1(len(suf)):
                w = w[:-len(suf)] + {1: "", 2: "a", 3: "e"}[act]
            break
    # plural
    for suf, act in _PLURAL:
        if w.endswith(suf):
            if r1(len(suf)):
                w = w[:-len(suf)] + {1: "a", 2: "e", 3: ""}[act]
            break
    return w


class HungarianSnowballAnalyzer(EnglishAnalyzer):
    name = "hungarian_snowball"
    max_token_length = 255

    def filter_token(self, t: str) -> str | None:
        return hungarian_snowball_stem(t)
