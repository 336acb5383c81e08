"""Porter2 (Snowball English) stemmer — the reference's SnowballFilter +
``org/tartarus/snowball/ext/EnglishStemmer.java`` (generated from Martin
Porter's public english.sbl; algorithm published at snowballstem.org).

Transcribed from the generated driver's exact control flow
(``EnglishStemmer.java:820-890``): exception list on the raw word, ≤2-letter
words unchanged, prelude (leading-apostrophe strip + consonant-y marking),
R1/R2 with the gener/commun/arsen override, step 0 (apostrophe suffixes),
step 1a, the post-1a exception list, steps 1b–5, postlude. Parity is pinned
by the reference's own 2000-word golden vocabulary
(``analysis/common/src/test/.../snowball/english.zip``), replayed in
``tests/test_porter2.py``.
"""

from __future__ import annotations

from lucene_spark.analysis_en import EnglishAnalyzer

_V = frozenset("aeiouy")  # g_v — lowercase y only; marked 'Y' is a consonant
_WXY = frozenset("aeiouywxY")  # g_v_WXY
_VALID_LI = frozenset("cdeghkmnrt")  # g_valid_LI
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")  # a_3

# a_10 — whole-word exceptions checked first (EnglishStemmer.java:738-783)
_EXC1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
# a_9 — stop after step 1a (EnglishStemmer.java:726-736)
_EXC2 = frozenset(("inning", "outing", "canning", "herring", "earring",
                   "proceed", "exceed", "succeed"))

# step 2 (a_5): longest suffix, R1-gated; (suffix, replacement, condition)
_STEP2 = (
    ("ational", "ate", None), ("fulness", "ful", None),
    ("iveness", "ive", None), ("ization", "ize", None),
    ("ousness", "ous", None), ("biliti", "ble", None),
    ("lessli", "less", None), ("tional", "tion", None),
    ("alism", "al", None), ("aliti", "al", None), ("ation", "ate", None),
    ("entli", "ent", None), ("fulli", "ful", None), ("iviti", "ive", None),
    ("ousli", "ous", None), ("abli", "able", None), ("alli", "al", None),
    ("anci", "ance", None), ("ator", "ate", None), ("enci", "ence", None),
    ("izer", "ize", None), ("bli", "ble", None),
    ("ogi", "og", "l"),  # only after l
    ("li", "", "LI"),    # only after a valid li-ending
)
# step 3 (a_6): R1-gated; "R2" condition for ative
_STEP3 = (
    ("ational", "ate", None), ("tional", "tion", None),
    ("alize", "al", None), ("icate", "ic", None), ("iciti", "ic", None),
    ("ative", "", "R2"), ("ical", "ic", None), ("ness", "", None),
    ("ful", "", None),
)
# step 4 (a_7): R2-gated deletions; ion only after s/t
_STEP4 = ("ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
          "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic")


def _shortv(w: str, end: int) -> bool:
    """r_shortv at position ``end`` (exclusive) — EnglishStemmer.java:312."""
    if end >= 2 and w[end - 1] not in _WXY and w[end - 2] in _V:
        if end == 2 or w[end - 3] not in _V:
            return True
    return end == 2 and w[0] in _V and w[1] not in _V


def porter2_stem(word: str) -> str:
    w = word
    if w in _EXC1:
        return _EXC1[w]
    if len(w) < 3:
        return w
    # prelude: one leading apostrophe, consonant-y marking
    if w.startswith("'"):
        w = w[1:]
    y_found = False
    chars = list(w)
    if chars and chars[0] == "y":
        chars[0] = "Y"
        y_found = True
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _V:
            chars[i] = "Y"
            y_found = True
    w = "".join(chars)

    # mark regions (with the gener/commun/arsen R1 override)
    def _scan(s: str, i: int) -> int:
        n = len(s)
        while i < n and s[i] not in _V:
            i += 1
        i += 1  # consume the vowel
        while i < n and s[i] in _V:
            i += 1
        i += 1  # consume the non-vowel
        return min(i, n)

    for pre in ("arsen", "commun", "gener"):
        if w.startswith(pre):
            p1 = len(pre)
            break
    else:
        p1 = _scan(w, 0)
    p2 = _scan(w, p1)

    # step 0: apostrophe suffixes (a_1, longest)
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[:-len(suf)]
            break

    # step 1a (a_2, longest)
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith("us") or w.endswith("ss"):
        pass
    elif w.endswith("s"):
        if any(ch in _V for ch in w[:-2]):
            w = w[:-1]

    if w in _EXC2:
        return w

    # step 1b (a_4, longest)
    if w.endswith("eedly"):
        if len(w) - 5 >= p1:
            w = w[:-3]
    elif w.endswith("eed"):
        if len(w) - 3 >= p1:
            w = w[:-1]
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[:-len(suf)]
                if any(ch in _V for ch in stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_DOUBLES):
                        w = w[:-1]
                    elif len(w) == p1 and _shortv(w, len(w)):
                        w += "e"
                break

    # step 1c: y/Y → i after a non-vowel that is not the first letter
    if (len(w) > 2 and w[-1] in "yY" and w[-2] not in _V):
        w = w[:-1] + "i"

    # step 2 (R1)
    for suf, rep, cond in _STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= p1:
                stem = w[:-len(suf)]
                if cond == "l":
                    if stem.endswith("l"):
                        w = stem + rep
                elif cond == "LI":
                    if stem and stem[-1] in _VALID_LI:
                        w = stem
                else:
                    w = stem + rep
            break

    # step 3 (R1; ative additionally R2)
    for suf, rep, cond in _STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= p1:
                if cond == "R2":
                    if len(w) - len(suf) >= p2:
                        w = w[:-len(suf)]
                else:
                    w = w[:-len(suf)] + rep
            break

    # step 4 (R2)
    for suf in _STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= p2:
                if suf == "ion":
                    if w[:-3].endswith(("s", "t")):
                        w = w[:-3]
                else:
                    w = w[:-len(suf)]
            break

    # step 5
    if w.endswith("e"):
        if (len(w) - 1 >= p2
                or (len(w) - 1 >= p1 and not _shortv(w, len(w) - 1))):
            w = w[:-1]
    elif w.endswith("ll") and len(w) - 1 >= p2:
        w = w[:-1]

    # postlude
    if y_found:
        w = w.replace("Y", "y")
    return w


class Porter2Analyzer(EnglishAnalyzer):
    """StandardTokenizer → LowerCase → SnowballFilter(EnglishStemmer) — the
    reference's ``SnowballPorterFilterFactory(language=English)`` chain
    without a stop set. Vocabulary-level remap like the Porter1 chain."""

    name = "porter2"
    max_token_length = 255

    def filter_token(self, t: str) -> str | None:
        return porter2_stem(t)
