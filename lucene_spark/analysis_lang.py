"""Language-specific light stemmers: German + French (UniNE algorithm).

Mirrors the reference light-stem filters
(``lucene/analysis/common/src/java/org/apache/lucene/analysis/de/
GermanLightStemmer.java`` and ``fr/FrenchLightStemmer.java``), which
implement Jacques Savoy's published UniNE light-stemming algorithms
("Light Stemming Approaches for the French, Portuguese, German and
Hungarian Languages"). The chain here is StandardTokenizer → LowerCase →
LightStemFilter — the ``GermanLightStemFilter`` / ``FrenchLightStemFilter``
wiring without the language stop sets (stop filtering composes upstream and
is gated separately). An optional ``exclusions`` set reproduces
``SetKeywordMarkerFilter``: excluded tokens skip stemming
(``GermanLightStemFilter.java:39-44`` keywordAttr check).

Parity is pinned by the reference's own full-vocabulary golden data
(``delighttestdata.zip`` / ``frlighttestdata.zip``, 35k/17k word→stem
pairs) in ``tests/test_lang_stemmers.py``.

Like the Porter chain, stemming runs at VOCABULARY level (once per unique
term of an Arrow batch) — O(vocab) Python on an O(tokens) pipeline.
"""

from __future__ import annotations

from lucene_spark.analysis_en import EnglishAnalyzer

_DE_FOLD = str.maketrans({
    "ä": "a", "à": "a", "á": "a", "â": "a",
    "ö": "o", "ò": "o", "ó": "o", "ô": "o",
    "ï": "i", "ì": "i", "í": "i", "î": "i",
    "ü": "u", "ù": "u", "ú": "u", "û": "u",
})

_DE_ST_ENDING = frozenset("bdfghklmnt")


def german_light_stem(word: str) -> str:
    """German light stem of one lowercase token
    (``GermanLightStemmer.java:63-147``): fold umlauts/accents, then two
    suffix-strip steps (plural/case endings, then superlative/inflection)."""
    s = word.translate(_DE_FOLD)
    n = len(s)
    # step 1 (GermanLightStemmer.step1)
    if n > 5 and s.endswith("ern"):
        n -= 3
    elif n > 4 and s[n - 2] == "e" and s[n - 1] in "mnrs":
        n -= 2
    elif n > 3 and s[n - 1] == "e":
        n -= 1
    elif n > 3 and s[n - 1] == "s" and s[n - 2] in _DE_ST_ENDING:
        n -= 1
    # step 2 (GermanLightStemmer.step2)
    if n > 5 and s[n - 3:n] == "est":
        n -= 3
    elif n > 4 and s[n - 2] == "e" and s[n - 1] in "rn":
        n -= 2
    elif n > 4 and s[n - 2:n] == "st" and s[n - 3] in _DE_ST_ENDING:
        n -= 2
    return s[:n]


_FR_FOLD = str.maketrans({
    "à": "a", "á": "a", "â": "a", "ô": "o",
    "è": "e", "é": "e", "ê": "e",
    "ù": "u", "û": "u", "î": "i", "ç": "c",
})


def _fr_norm(s: list[str]) -> str:
    """FrenchLightStemmer.norm: fold accents, collapse adjacent duplicate
    letters, strip trailing ie / r / e / e / duplicate."""
    if len(s) > 4:
        s = list("".join(s).translate(_FR_FOLD))
        out = [s[0]]
        for ch in s[1:]:
            if ch == out[-1] and ch.isalpha():
                continue
            out.append(ch)
        s = out
    if len(s) > 4 and s[-2] == "i" and s[-1] == "e":
        del s[-2:]
    if len(s) > 4:
        if s[-1] == "r":
            del s[-1]
        if s[-1] == "e":
            del s[-1]
        if s[-1] == "e":
            del s[-1]
        if s[-1] == s[-2] and s[-1].isalpha():
            del s[-1]
    return "".join(s)


def french_light_stem(word: str) -> str:
    """French light stem of one lowercase token
    (``FrenchLightStemmer.java:63-210``): the UniNE suffix cascade with its
    rewrite rules (-aux→-al, -issement→-ir, -cateur→-quer, …) followed by
    ``norm``'s fold/collapse/strip."""
    s = list(word)

    def ends(suf: str) -> bool:
        return len(s) >= len(suf) and "".join(s[-len(suf):]) == suf

    if len(s) > 5 and s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u" and s[-4] != "e":
            s[-2] = "l"
        del s[-1]
    if len(s) > 3 and s[-1] == "x":
        del s[-1]
    if len(s) > 3 and s[-1] == "s":
        del s[-1]
    if len(s) > 9 and ends("issement"):
        del s[-6:]
        s[-1] = "r"
        return _fr_norm(s)
    if len(s) > 8 and ends("issant"):
        del s[-4:]
        s[-1] = "r"
        return _fr_norm(s)
    if len(s) > 6 and ends("ement"):
        del s[-4:]
        if len(s) > 3 and ends("ive"):
            del s[-1]
            s[-1] = "f"
        return _fr_norm(s)
    if len(s) > 11 and ends("ficatrice"):
        del s[-5:]
        s[-2] = "e"
        s[-1] = "r"
        return _fr_norm(s)
    if len(s) > 10 and ends("ficateur"):
        del s[-4:]
        s[-2] = "e"
        s[-1] = "r"
        return _fr_norm(s)
    if len(s) > 9 and ends("catrice"):
        del s[-3:]
        s[-4] = "q"
        s[-3] = "u"
        s[-2] = "e"
        return _fr_norm(s)
    if len(s) > 8 and ends("cateur"):
        del s[-2:]
        s[-4] = "q"
        s[-3] = "u"
        s[-2] = "e"
        s[-1] = "r"
        return _fr_norm(s)
    if len(s) > 8 and ends("atrice"):
        del s[-4:]
        s[-2] = "e"
        s[-1] = "r"
        return _fr_norm(s)
    if len(s) > 7 and ends("ateur"):
        del s[-3:]
        s[-2] = "e"
        s[-1] = "r"
        return _fr_norm(s)
    if len(s) > 6 and ends("trice"):
        del s[-1]
        s[-3] = "e"
        s[-2] = "u"
        s[-1] = "r"
        # no return — falls through, like the reference
    if len(s) > 5 and ends("ième"):
        del s[-4:]
        return _fr_norm(s)
    if len(s) > 7 and ends("teuse"):
        del s[-2:]
        s[-1] = "r"
        return _fr_norm(s)
    if len(s) > 6 and ends("teur"):
        del s[-1]
        s[-1] = "r"
        return _fr_norm(s)
    if len(s) > 5 and ends("euse"):
        del s[-2:]
        return _fr_norm(s)
    if len(s) > 8 and ends("ère"):
        del s[-1]
        s[-2] = "e"
        return _fr_norm(s)
    if len(s) > 7 and ends("ive"):
        del s[-1]
        s[-1] = "f"
        return _fr_norm(s)
    if len(s) > 4 and (ends("folle") or ends("molle")):
        del s[-2:]
        s[-1] = "u"
        return _fr_norm(s)
    if len(s) > 9 and ends("nnelle"):
        del s[-5:]
        return _fr_norm(s)
    if len(s) > 9 and ends("nnel"):
        del s[-3:]
        return _fr_norm(s)
    if len(s) > 4 and ends("ète"):
        del s[-1]
        s[-2] = "e"
        # no return
    if len(s) > 8 and ends("ique"):
        del s[-4:]
        # no return
    if len(s) > 8 and ends("esse"):
        del s[-3:]
        return _fr_norm(s)
    if len(s) > 7 and ends("inage"):
        del s[-3:]
        return _fr_norm(s)
    if len(s) > 9 and ends("isation"):
        del s[-7:]
        if len(s) > 5 and ends("ual"):
            s[-2] = "e"
        return _fr_norm(s)
    if len(s) > 9 and ends("isateur"):
        del s[-7:]
        return _fr_norm(s)
    if len(s) > 8 and ends("ation"):
        del s[-5:]
        return _fr_norm(s)
    if len(s) > 8 and ends("ition"):
        del s[-5:]
        return _fr_norm(s)
    return _fr_norm(s)


STEMMERS = {
    "german_light": german_light_stem,
    "french_light": french_light_stem,
}


class LightStemAnalyzer(EnglishAnalyzer):
    """StandardTokenizer → LowerCase → (keyword-marker) → LightStemFilter.

    Reuses the English chain's vocabulary-level remap machinery; no stop
    set, no possessive strip, no position holes. ``exclusions`` reproduces
    SetKeywordMarkerFilter (excluded tokens skip the stemmer)."""

    max_token_length = 255

    def __init__(self, lang: str = "german_light", exclusions=frozenset()):
        if lang not in STEMMERS:
            raise ValueError(f"unknown light stemmer: {lang}")
        self.lang = lang
        self._stem = STEMMERS[lang]
        self.exclusions = frozenset(exclusions)
        self.name = lang

    def filter_token(self, t: str) -> str | None:
        if t in self.exclusions:
            return t
        return self._stem(t)
