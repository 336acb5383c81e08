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


_ES_IT_FOLD = str.maketrans({
    "à": "a", "á": "a", "â": "a", "ä": "a",
    "ò": "o", "ó": "o", "ô": "o", "ö": "o",
    "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ù": "u", "ú": "u", "û": "u", "ü": "u",
    "ì": "i", "í": "i", "î": "i", "ï": "i",
})


def spanish_light_stem(word: str) -> str:
    """Spanish light stem (``es/SpanishLightStemmer.java:60-114``, Savoy
    CLEF-2001): fold accents, strip final o/a/e and plural -s forms
    (-eses→-es, -ces→-z)."""
    if len(word) < 5:
        return word
    s = list(word.translate(_ES_IT_FOLD))
    n = len(s)
    last = s[n - 1]
    if last in "oae":
        return "".join(s[:n - 1])
    if last == "s":
        if s[n - 2] == "e" and s[n - 3] == "s" and s[n - 4] == "e":
            return "".join(s[:n - 2])
        if s[n - 2] == "e" and s[n - 3] == "c":
            s[n - 3] = "z"
            return "".join(s[:n - 2])
        if s[n - 2] in "oae":
            return "".join(s[:n - 2])
    return "".join(s)


def italian_light_stem(word: str) -> str:
    """Italian light stem (``it/ItalianLightStemmer.java:60-115``, Savoy
    CLEF-2001): fold accents, strip final vowel (plus plural i/h marker)."""
    if len(word) < 6:
        return word
    s = word.translate(_ES_IT_FOLD)
    last, prev = s[-1], s[-2]
    if last == "e":
        return s[:-2] if prev in "ih" else s[:-1]
    if last == "i":
        return s[:-2] if prev in "hi" else s[:-1]
    if last in "ao":
        return s[:-2] if prev == "i" else s[:-1]
    return s


def swedish_light_stem(word: str) -> str:
    """Swedish light stem (``sv/SwedishLightStemmer.java:63-100``, Savoy
    CLEF-2003): strip final -s, then definite/comparative suffixes."""
    s = word
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 7 and (s.endswith("elser") or s.endswith("heten")):
        return s[:n - 5]
    if n > 6 and s[n - 4:] in ("arne", "erna", "ande", "else",
                              "aste", "orna", "aren"):
        return s[:n - 4]
    if n > 5 and s[n - 3:] in ("are", "ast", "het"):
        return s[:n - 3]
    if n > 4 and s[n - 2:] in ("ar", "er", "or", "en", "at", "te", "et"):
        return s[:n - 2]
    if n > 3 and s[-1] in "taen":
        return s[:n - 1]
    return s


_PT_FOLD = str.maketrans({
    "à": "a", "á": "a", "â": "a", "ä": "a", "ã": "a",
    "ò": "o", "ó": "o", "ô": "o", "ö": "o", "õ": "o",
    "è": "e", "é": "e", "ê": "e", "ë": "e",
    "ù": "u", "ú": "u", "û": "u", "ü": "u",
    "ì": "i", "í": "i", "î": "i", "ï": "i",
    "ç": "c",
})


def _pt_remove_suffix(s: list[str]) -> list[str]:
    n = len(s)

    def ends(suf):
        return n >= len(suf) and "".join(s[n - len(suf):n]) == suf

    if n > 4 and ends("es") and s[n - 3] in "rslz":
        return s[:n - 2]
    if n > 3 and ends("ns"):
        s[n - 2] = "m"
        return s[:n - 1]
    if n > 4 and (ends("eis") or ends("éis")):
        s[n - 3] = "e"
        s[n - 2] = "l"
        return s[:n - 1]
    if n > 4 and ends("ais"):
        s[n - 2] = "l"
        return s[:n - 1]
    if n > 4 and ends("óis"):
        s[n - 3] = "o"
        s[n - 2] = "l"
        return s[:n - 1]
    if n > 4 and ends("is"):
        s[n - 1] = "l"
        return s
    if n > 3 and (ends("ões") or ends("ães")):
        s = s[:n - 1]
        s[-2] = "ã"
        s[-1] = "o"
        return s
    if n > 6 and ends("mente"):
        return s[:n - 5]
    if n > 3 and s[n - 1] == "s":
        return s[:n - 1]
    return s


def _pt_norm_feminine(s: list[str]) -> list[str]:
    n = len(s)

    def ends(suf):
        return n >= len(suf) and "".join(s[n - len(suf):n]) == suf

    if n > 7 and (ends("inha") or ends("iaca") or ends("eira")):
        s[n - 1] = "o"
        return s
    if n > 6:
        if (ends("osa") or ends("ica") or ends("ida") or ends("ada")
                or ends("iva") or ends("ama")):
            s[n - 1] = "o"
            return s
        if ends("ona"):
            s[n - 3] = "ã"
            s[n - 2] = "o"
            return s[:n - 1]
        if ends("ora"):
            return s[:n - 1]
        if ends("esa"):
            s[n - 3] = "ê"
            return s[:n - 1]
        if ends("na"):
            s[n - 1] = "o"
            return s
    return s


def portuguese_light_stem(word: str) -> str:
    """Portuguese light stem (``pt/PortugueseLightStemmer.java:63-209``,
    UniNE): plural/adverb suffix removal (with the -ões→-ão / -is→-l
    rewrites), feminine normalization, final-vowel strip, THEN accent fold
    (the reference folds last, so suffix checks see accented forms)."""
    if len(word) < 4:
        return word
    s = _pt_remove_suffix(list(word))
    if len(s) > 3 and s[-1] == "a":
        s = _pt_norm_feminine(s)
    if len(s) > 4 and s[-1] in "eao":
        s = s[:-1]
    return "".join(s).translate(_PT_FOLD)


_FI_VOWELS = frozenset("aeiouy")


def _fi_step1(s: list[str], n: int) -> int:
    if n > 8:
        if "".join(s[n - 3:n]) == "kin":
            return _fi_step1(s, n - 3)
        if "".join(s[n - 2:n]) == "ko":
            return _fi_step1(s, n - 2)
    if n > 11:
        if "".join(s[n - 8:n]) == "dellinen":
            return n - 8
        if "".join(s[n - 9:n]) == "dellisuus":
            return n - 9
    return n


def finnish_light_stem(word: str) -> str:
    """Finnish light stem (``fi/FinnishLightStemmer.java:63-233``, Savoy
    CLEF-2003): fold ä/å/ö, strip clitics (-kin/-ko), case endings (with
    the -hde→-ksi and -nnen→-s rewrites), then the two normalization
    passes incl. the k/p/t geminate collapse."""
    if len(word) < 4:
        return word
    s = list(word.translate(str.maketrans({"ä": "a", "å": "a", "ö": "o"})))
    n = _fi_step1(s, len(s))

    def ends(m, suf):
        return m >= len(suf) and "".join(s[m - len(suf):m]) == suf

    # step2
    if n > 5:
        if ends(n, "lla") or ends(n, "tse") or ends(n, "sti"):
            n -= 3
        elif ends(n, "ni"):
            n -= 2
        elif ends(n, "aa"):
            n -= 1
    # step3
    done = False
    if n > 8:
        if ends(n, "nnen"):
            s[n - 4] = "s"
            n, done = n - 3, True
        elif ends(n, "ntena"):
            s[n - 5] = "s"
            n, done = n - 4, True
        elif ends(n, "tten"):
            n, done = n - 4, True
        elif ends(n, "eiden"):
            n, done = n - 5, True
    if not done and n > 6:
        if (ends(n, "neen") or ends(n, "niin") or ends(n, "seen")
                or ends(n, "teen") or ends(n, "inen")):
            n, done = n - 4, True
        elif s[n - 3] == "h" and s[n - 2] in _FI_VOWELS and s[n - 1] == "n":
            n, done = n - 3, True
        elif ends(n, "den"):
            s[n - 3] = "s"
            n, done = n - 2, True
        elif ends(n, "ksen"):
            s[n - 4] = "s"
            n, done = n - 3, True
        elif (ends(n, "ssa") or ends(n, "sta") or ends(n, "lla")
                or ends(n, "lta") or ends(n, "tta") or ends(n, "ksi")
                or ends(n, "lle")):
            n, done = n - 3, True
    if not done and n > 5:
        if ends(n, "na") or ends(n, "ne"):
            n, done = n - 2, True
        elif ends(n, "nei"):
            n, done = n - 3, True
    if not done and n > 4:
        if ends(n, "ja") or ends(n, "ta"):
            n -= 2
        elif s[n - 1] == "a":
            n -= 1
        elif s[n - 1] == "n" and s[n - 2] in _FI_VOWELS:
            n -= 2
        elif s[n - 1] == "n":
            n -= 1
    # norm1
    if n > 5 and ends(n, "hde"):
        s[n - 3] = "k"
        s[n - 2] = "s"
        s[n - 1] = "i"
    if n > 4 and (ends(n, "ei") or ends(n, "at")):
        n -= 2
    elif n > 3 and s[n - 1] in "tsjeai":
        n -= 1
    # norm2
    if n > 8 and s[n - 1] in "eou":
        n -= 1
    if n > 4:
        if s[n - 1] == "i":
            n -= 1
        if n > 4:
            out = [s[0]]
            for ch in s[1:n]:
                if ch == out[-1] and ch in "kpt":
                    continue
                out.append(ch)
            return "".join(out)
    return "".join(s[:n])


_HU_FOLD = str.maketrans({
    "á": "a", "ë": "e", "é": "e", "í": "i",
    "ó": "o", "ő": "o", "õ": "o", "ö": "o",
    "ú": "u", "ű": "u", "ũ": "u", "û": "u", "ü": "u",
})

_HU_VOWELS = frozenset("aeiouy")


def hungarian_light_stem(word: str) -> str:
    """Hungarian light stem (``hu/HungarianLightStemmer.java:62-242``,
    UniNE): fold accents, remove case endings, possessive markers, the -k
    plural, then the final-vowel normalization."""
    s = list(word.translate(_HU_FOLD))
    n = len(s)

    def ends(m, suf):
        return m >= len(suf) and "".join(s[m - len(suf):m]) == suf

    # removeCase
    if n > 6 and ends(n, "kent"):
        n -= 4
    else:
        done = False
        if n > 5:
            if (ends(n, "nak") or ends(n, "nek") or ends(n, "val")
                    or ends(n, "vel") or ends(n, "ert") or ends(n, "rol")
                    or ends(n, "ban") or ends(n, "ben") or ends(n, "bol")
                    or ends(n, "nal") or ends(n, "nel") or ends(n, "hoz")
                    or ends(n, "hez") or ends(n, "tol")):
                n, done = n - 3, True
            elif ((ends(n, "al") or ends(n, "el"))
                    and s[n - 3] not in _HU_VOWELS
                    and s[n - 3] == s[n - 4]):
                n, done = n - 3, True
        if not done and n > 4:
            if (ends(n, "at") or ends(n, "et") or ends(n, "ot")
                    or ends(n, "va") or ends(n, "ve") or ends(n, "ra")
                    or ends(n, "re") or ends(n, "ba") or ends(n, "be")
                    or ends(n, "ul") or ends(n, "ig")):
                n -= 2
            elif ((ends(n, "on") or ends(n, "en"))
                    and s[n - 3] not in _HU_VOWELS):
                n -= 2
            elif s[n - 1] in "tn":
                n -= 1
            elif (s[n - 1] in "ae" and s[n - 2] == s[n - 3]
                    and s[n - 2] not in _HU_VOWELS):
                n -= 2
    # removePossessive
    done = False
    if n > 6:
        if (s[n - 5] not in _HU_VOWELS
                and (ends(n, "atok") or ends(n, "otok") or ends(n, "etek"))):
            n, done = n - 4, True
        elif ends(n, "itek") or ends(n, "itok"):
            n, done = n - 4, True
    if not done and n > 5:
        if (s[n - 4] not in _HU_VOWELS
                and (ends(n, "unk") or ends(n, "tok") or ends(n, "tek"))):
            n, done = n - 3, True
        elif s[n - 4] in _HU_VOWELS and ends(n, "juk"):
            n, done = n - 3, True
        elif ends(n, "ink"):
            n, done = n - 3, True
    if not done and n > 4:
        if (s[n - 3] not in _HU_VOWELS
                and (ends(n, "am") or ends(n, "em") or ends(n, "om")
                     or ends(n, "ad") or ends(n, "ed") or ends(n, "od")
                     or ends(n, "uk"))):
            n, done = n - 2, True
        elif (s[n - 3] in _HU_VOWELS
                and (ends(n, "nk") or ends(n, "ja") or ends(n, "je"))):
            n, done = n - 2, True
        elif ends(n, "im") or ends(n, "id") or ends(n, "ik"):
            n, done = n - 2, True
    if not done and n > 3:
        if s[n - 1] in "ae":
            if s[n - 2] not in _HU_VOWELS:
                n -= 1
        elif s[n - 1] in "md":
            if s[n - 2] in _HU_VOWELS:
                n -= 1
        elif s[n - 1] == "i":
            n -= 1
    # removePlural
    if n > 3 and s[n - 1] == "k":
        n = n - 2 if (s[n - 2] in "aoe" and n > 4) else n - 1
    # normalize
    if n > 3 and s[n - 1] in "aeio":
        n -= 1
    return "".join(s[:n])


def russian_light_stem(word: str) -> str:
    """Russian light stem (``ru/RussianLightStemmer.java:63-148``, Dolamic
    & Savoy): remove case endings, then normalize final ь/и/нн."""
    s = word
    n = len(s)
    if n > 6 and s[n - 4:] in ("иями", "оями"):
        n -= 4
    elif n > 5 and s[n - 3:n] in (
            "иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему",
            "ери", "ими", "ого", "ому", "ыми", "оев"):
        n -= 3
    elif n > 4 and s[n - 2:n] in (
            "ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв",
            "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев",
            "ий", "им", "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми"):
        n -= 2
    elif n > 3 and s[n - 1] in "аеиоуйыяь":
        n -= 1
    # normalize
    if n > 3:
        if s[n - 1] in "ьи":
            n -= 1
        elif s[n - 1] == "н" and s[n - 2] == "н":
            n -= 1
    return s[:n]


def german_minimal_stem(word: str) -> str:
    """German minimal stem (``de/GermanMinimalStemmer.java:60-104``,
    Savoy's minimal plural stripper): fold umlauts, strip -nen / -en/-se/
    -es/-er pairs / single n,e,s,r."""
    if len(word) < 5:
        return word
    s = word.translate(str.maketrans({"ä": "a", "ö": "o", "ü": "u"}))
    n = len(s)
    if n > 6 and s.endswith("nen"):
        return s[:n - 3]
    if n > 5 and s[n - 2:] in ("en", "se", "es", "er"):
        return s[:n - 2]
    if s[n - 1] in "nesr":
        return s[:n - 1]
    return s


def french_minimal_stem(word: str) -> str:
    """French minimal stem (``fr/FrenchMinimalStemmer.java:56-70``):
    -aux→-al, else strip one each of s/r/e/é then a trailing double."""
    if len(word) < 6:
        return word
    s = list(word)
    if s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u":
            s[-2] = "l"
        return "".join(s[:-1])
    if s[-1] == "s":
        del s[-1]
    if s[-1] == "r":
        del s[-1]
    if s[-1] == "e":
        del s[-1]
    if s[-1] == "é":
        del s[-1]
    if s[-1] == s[-2] and s[-1].isalpha():
        del s[-1]
    return "".join(s)


def english_minimal_stem(word: str) -> str:
    """English minimal stem (``en/EnglishMinimalStemmer.java:24-44``,
    S-stemmer, Donna Harman): plural -s removal only (-ies→-y except
    -aies/-eies; -us/-ss and vowel+es forms kept)."""
    n = len(word)
    if n < 3 or word[n - 1] != "s":
        return word
    p = word[n - 2]
    if p in "us":
        return word
    if p == "e":
        if n > 3 and word[n - 3] == "i" and word[n - 4] not in "ae":
            return word[:n - 3] + "y"
        if word[n - 3] in "iaoe":
            return word
    return word[:n - 1]


# RSLP "Plural" step of portuguese.rslp (min=3, whole-word exceptions,
# conditional suffix 's'; rules fire first-match in order)
_PT_PLURAL_RULES = (
    ("ns", 1, "m", frozenset()),
    ("ões", 3, "ão", frozenset()),
    ("ães", 1, "ão", frozenset({"mães"})),
    ("ais", 1, "al", frozenset({"cais", "mais"})),
    ("éis", 2, "el", frozenset()),
    ("eis", 2, "el", frozenset()),
    ("óis", 2, "ol", frozenset()),
    ("is", 2, "il", frozenset({"lápis", "cais", "mais", "crúcis",
                               "biquínis", "pois", "depois", "dois",
                               "leis"})),
    ("les", 3, "l", frozenset()),
    ("res", 3, "r", frozenset({"árvores"})),
    ("s", 2, "", frozenset({"aliás", "pires", "lápis", "cais", "mais",
                            "mas", "menos", "férias", "fezes", "pêsames",
                            "crúcis", "gás", "atrás", "moisés", "através",
                            "convés", "ês", "país", "após", "ambas",
                            "ambos", "messias", "depois"})),
)


def portuguese_minimal_stem(word: str) -> str:
    """Portuguese minimal stem (``pt/PortugueseMinimalStemmer.java:29-37``:
    the RSLP "Plural" step of ``portuguese.rslp``, applied via
    ``RSLPStemmerBase.Step.apply:218-238`` — first matching rule fires,
    whole-word exception sets)."""
    if len(word) < 3 or not word.endswith("s"):
        return word
    for suf, mn, rep, exc in _PT_PLURAL_RULES:
        if (word.endswith(suf) and len(word) - len(suf) >= mn
                and word not in exc):
            return word[:len(word) - len(suf)] + rep
    return word


def _norwegian_light(bokmaal: bool):
    """NorwegianLightStemmer (``no/NorwegianLightStemmer.java:84-182``,
    flags BOKMAAL xor NYNORSK — the two written standards share the common
    endings and differ on the dialect-specific ones)."""
    nynorsk = not bokmaal

    def stem(word: str) -> str:
        s = word
        n = len(s)
        if n > 4 and s[n - 1] == "s":  # possessive -s, continue
            n -= 1
        e = s[:n]
        if n > 7 and ((bokmaal and (e.endswith("heter") or e.endswith("heten")))
                      or (nynorsk and e.endswith("heita"))):
            return s[:n - 5]
        if n > 8 and nynorsk and (e.endswith("heiter") or e.endswith("leiken")
                                  or e.endswith("leikar")):
            return s[:n - 6]
        if n > 5 and (e.endswith("dom") or (bokmaal and e.endswith("het"))):
            return s[:n - 3]
        if n > 6 and nynorsk and (e.endswith("heit") or e.endswith("semd")
                                  or e.endswith("leik")):
            return s[:n - 4]
        if n > 7 and (e.endswith("elser") or e.endswith("elsen")):
            return s[:n - 5]
        if n > 6 and ((bokmaal and e.endswith("ende"))
                      or (nynorsk and e.endswith("ande"))
                      or e.endswith("else")
                      or (bokmaal and e.endswith("este"))
                      or (nynorsk and e.endswith("aste"))
                      or (bokmaal and e.endswith("eren"))
                      or (nynorsk and e.endswith("aren"))):
            return s[:n - 4]
        if n > 5 and ((bokmaal and e.endswith("ere"))
                      or (nynorsk and e.endswith("are"))
                      or (bokmaal and e.endswith("est"))
                      or (nynorsk and e.endswith("ast"))
                      or e.endswith("ene")
                      or (nynorsk and e.endswith("ane"))):
            return s[:n - 3]
        if n > 4 and (e.endswith("er") or e.endswith("en") or e.endswith("et")
                      or (nynorsk and e.endswith("ar"))
                      or (bokmaal and e.endswith("st"))
                      or e.endswith("te")):
            return s[:n - 2]
        if n > 3 and s[n - 1] in "aen":
            return s[:n - 1]
        return s[:n]

    return stem


def _norwegian_minimal(bokmaal: bool):
    """NorwegianMinimalStemmer (``no/NorwegianMinimalStemmer.java:81-109``):
    known noun plural forms + genitive -s only."""
    nynorsk = not bokmaal

    def stem(word: str) -> str:
        s = word
        n = len(s)
        if n > 4 and s[n - 1] == "s":
            n -= 1
        e = s[:n]
        if n > 5 and (e.endswith("ene") or (nynorsk and e.endswith("ane"))):
            return s[:n - 3]
        if n > 4 and (e.endswith("er") or e.endswith("en") or e.endswith("et")
                      or (nynorsk and e.endswith("ar"))):
            return s[:n - 2]
        if n > 3 and s[n - 1] in "ae":
            return s[:n - 1]
        return s[:n]

    return stem


norwegian_light_stem = _norwegian_light(bokmaal=True)
nynorsk_light_stem = _norwegian_light(bokmaal=False)
norwegian_minimal_stem = _norwegian_minimal(bokmaal=True)
nynorsk_minimal_stem = _norwegian_minimal(bokmaal=False)


def bulgarian_stem(word: str) -> str:
    """Bulgarian light stem (``bg/BulgarianStemmer.java:36-135``, Savoy
    BUIR): -ища, definite-article removal, plural reduction with the
    ц→к / з→г / е→я rewrites, then final я/а/о/е strips and the ен/ъN
    normalizations."""
    if len(word) < 4:
        return word
    s = list(word)
    n = len(s)

    def ew(m, suf):
        return m >= len(suf) and s[m - len(suf):m] == list(suf)

    if n > 5 and ew(n, "ища"):
        return "".join(s[:n - 3])
    # removeArticle
    if n > 6 and ew(n, "ият"):
        n -= 3
    elif n > 5 and (ew(n, "ът") or ew(n, "то") or ew(n, "те") or ew(n, "та")
                    or ew(n, "ия")):
        n -= 2
    elif n > 4 and ew(n, "ят"):
        n -= 2
    # removePlural
    if n > 6 and ew(n, "овци"):
        n -= 3
    elif n > 6 and ew(n, "ове"):
        n -= 3
    elif n > 6 and ew(n, "еве"):
        s[n - 3] = "й"
        n -= 2
    elif n > 5 and ew(n, "ища"):
        n -= 3
    elif n > 5 and ew(n, "та"):
        n -= 2
    elif n > 5 and ew(n, "ци"):
        s[n - 2] = "к"
        n -= 1
    elif n > 5 and ew(n, "зи"):
        s[n - 2] = "г"
        n -= 1
    elif n > 5 and s[n - 3] == "е" and s[n - 1] == "и":
        s[n - 3] = "я"
        n -= 1
    elif n > 4 and ew(n, "си"):
        s[n - 2] = "х"
        n -= 1
    elif n > 4 and ew(n, "и"):
        n -= 1
    # final vowel strips
    if n > 3:
        if ew(n, "я"):
            n -= 1
        if ew(n, "а") or ew(n, "о") or ew(n, "е"):
            n -= 1
    # ен → н (the paper's duplicated rule, fixed like the reference)
    if n > 4 and ew(n, "ен"):
        s[n - 2] = "н"
        n -= 1
    # ъN → N
    if n > 5 and s[n - 2] == "ъ":
        s[n - 2] = s[n - 1]
        n -= 1
    return "".join(s[:n])


_ID_KE, _ID_PENG, _ID_DI, _ID_MENG, _ID_TER, _ID_BER, _ID_PE = (
    1, 2, 4, 8, 16, 32, 64)


def indonesian_stem(word: str, derivational: bool = True) -> str:
    """Indonesian stemmer (``id/IndonesianStemmer.java:42-270``, Asian/
    Williams/Tahaghoghi): inflectional suffixes (particles, possessive
    pronouns) always; derivational prefixes/suffixes with the reference's
    fired-rule branching and removed-prefix flag guards. ``numSyllables``
    gates every step, decremented per removed affix."""
    s = list(word)
    syll = sum(ch in "aeiou" for ch in s)
    flags = 0

    def ends(suf):
        return len(s) >= len(suf) and s[len(s) - len(suf):] == list(suf)

    def starts(pre):
        return len(s) >= len(pre) and s[:len(pre)] == list(pre)

    def remove_particle():
        nonlocal syll
        if ends("kah") or ends("lah") or ends("pun"):
            syll -= 1
            del s[-3:]

    def remove_possessive():
        nonlocal syll
        if ends("ku") or ends("mu"):
            syll -= 1
            del s[-2:]
        elif ends("nya"):
            syll -= 1
            del s[-3:]

    def first_order_prefix():
        nonlocal syll, flags
        if starts("meng"):
            flags |= _ID_MENG
            syll -= 1
            del s[:4]
        elif starts("meny") and len(s) > 4 and s[4] in "aeiou":
            flags |= _ID_MENG
            s[3] = "s"
            syll -= 1
            del s[:3]
        elif starts("men") or starts("mem"):
            flags |= _ID_MENG
            syll -= 1
            del s[:3]
        elif starts("me"):
            flags |= _ID_MENG
            syll -= 1
            del s[:2]
        elif starts("peng"):
            flags |= _ID_PENG
            syll -= 1
            del s[:4]
        elif starts("peny") and len(s) > 4 and s[4] in "aeiou":
            flags |= _ID_PENG
            s[3] = "s"
            syll -= 1
            del s[:3]
        elif starts("peny"):
            flags |= _ID_PENG
            syll -= 1
            del s[:4]
        elif starts("pen") and len(s) > 3 and s[3] in "aeiou":
            flags |= _ID_PENG
            s[2] = "t"
            syll -= 1
            del s[:2]
        elif starts("pen") or starts("pem"):
            flags |= _ID_PENG
            syll -= 1
            del s[:3]
        elif starts("di"):
            flags |= _ID_DI
            syll -= 1
            del s[:2]
        elif starts("ter"):
            flags |= _ID_TER
            syll -= 1
            del s[:3]
        elif starts("ke"):
            flags |= _ID_KE
            syll -= 1
            del s[:2]

    def second_order_prefix():
        nonlocal syll, flags
        if starts("ber"):
            flags |= _ID_BER
            syll -= 1
            del s[:3]
        elif len(s) == 7 and starts("belajar"):
            flags |= _ID_BER
            syll -= 1
            del s[:3]
        elif (starts("be") and len(s) > 4 and s[2] not in "aeiou"
                and s[3] == "e" and s[4] == "r"):
            flags |= _ID_BER
            syll -= 1
            del s[:2]
        elif starts("per"):
            syll -= 1
            del s[:3]
        elif len(s) == 7 and starts("pelajar"):
            syll -= 1
            del s[:3]
        elif starts("pe"):
            flags |= _ID_PE
            syll -= 1
            del s[:2]

    def remove_suffix():
        nonlocal syll
        if (ends("kan") and not flags & _ID_KE and not flags & _ID_PENG
                and not flags & _ID_PE):
            syll -= 1
            del s[-3:]
        elif (ends("an") and not flags & _ID_DI and not flags & _ID_MENG
                and not flags & _ID_TER):
            syll -= 1
            del s[-2:]
        elif (ends("i") and not ends("si") and not flags & _ID_BER
                and not flags & _ID_KE and not flags & _ID_PENG):
            syll -= 1
            del s[-1:]

    if syll > 2:
        remove_particle()
    if syll > 2:
        remove_possessive()
    if derivational:
        old = len(s)
        if syll > 2:
            first_order_prefix()
        if old != len(s):  # a first-order rule fired
            old = len(s)
            if syll > 2:
                remove_suffix()
            if old != len(s):  # a suffix rule fired
                if syll > 2:
                    second_order_prefix()
        else:
            if syll > 2:
                second_order_prefix()
            if syll > 2:
                remove_suffix()
    return "".join(s)


def indonesian_inflectional_stem(word: str) -> str:
    """IndonesianStemFilter(stemDerivational=false) — inflectional only."""
    return indonesian_stem(word, derivational=False)


STEMMERS = {
    "german_light": german_light_stem,
    "french_light": french_light_stem,
    "spanish_light": spanish_light_stem,
    "italian_light": italian_light_stem,
    "swedish_light": swedish_light_stem,
    "portuguese_light": portuguese_light_stem,
    "finnish_light": finnish_light_stem,
    "hungarian_light": hungarian_light_stem,
    "russian_light": russian_light_stem,
    "bulgarian_light": bulgarian_stem,
    "indonesian": indonesian_stem,
    "indonesian_inflectional": indonesian_inflectional_stem,
    "norwegian_light": norwegian_light_stem,
    "nynorsk_light": nynorsk_light_stem,
    "norwegian_minimal": norwegian_minimal_stem,
    "nynorsk_minimal": nynorsk_minimal_stem,
    "german_minimal": german_minimal_stem,
    "french_minimal": french_minimal_stem,
    "english_minimal": english_minimal_stem,
    "portuguese_minimal": portuguese_minimal_stem,
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
