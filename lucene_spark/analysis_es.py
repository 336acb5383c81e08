"""Spanish Snowball stemmer (``org/tartarus/snowball/ext/SpanishStemmer.java``,
generated from Martin Porter's public spanish.sbl; the reference's
SnowballPorterFilterFactory(language=Spanish) chain — the FULL algorithm
alongside the CLEF light variant in analysis_lang.py).

Transcribed from the generated driver: the Spanish RV definition, R1/R2,
attached-pronoun removal with the accent-restoring gerund/infinitive
rewrites (iéndo→iendo, ár→ar, …, u+yendo), the standard-suffix cascade
(all nine action groups incl. logía→log, ución→u, encia→ente,
amente/mente/idad/iva chains), RV-confined y-verb (u+y…) and verb
suffixes (with the gu→u follow-up on en/es/éis/emos), residual vowels
(with the RV-gated gu handling on e/é), and the de-accenting postlude.
Parity pinned by the reference's own 2000-word golden
(``snowball/spanish.zip``) in tests/test_porter2.py.
"""

from __future__ import annotations

from lucene_spark.analysis_en import EnglishAnalyzer

_V = frozenset("aeiouáéíóúü")
_POSTLUDE = str.maketrans({"á": "a", "é": "e", "í": "i", "ó": "o", "ú": "u"})

_PRONOUNS = sorted(("la", "sela", "le", "me", "se", "lo", "selo", "las",
                    "selas", "les", "los", "selos", "nos"),
                   key=len, reverse=True)
# a_2: (marker, replacement); None replacement = plain delete of pronoun
_MARKERS = sorted((
    ("iéndo", "iendo"), ("ándo", "ando"), ("ár", "ar"), ("ér", "er"),
    ("ír", "ir"), ("ando", None), ("iendo", None), ("ar", None),
    ("er", None), ("ir", None), ("yendo", "Y")),  # "Y": needs preceding u
    key=lambda m: len(m[0]), reverse=True)

_STD1 = ("ica", "osa", "ista", "anza", "able", "ible", "ico", "ismo",
         "oso", "amiento", "imiento", "icas", "osas", "istas", "anzas",
         "ables", "ibles", "icos", "ismos", "osos", "amientos",
         "imientos")
_STD2 = ("ancia", "adora", "ante", "ación", "ador", "ancias", "adoras",
         "aciones", "adores", "antes")
_STD9 = ("iva", "ivo", "ivas", "ivos")
_A6 = sorted(
    [(s, 1) for s in _STD1] + [(s, 2) for s in _STD2]
    + [("logía", 3), ("logías", 3), ("ución", 4), ("uciones", 4),
       ("encia", 5), ("encias", 5), ("amente", 6), ("mente", 7),
       ("idad", 8), ("idades", 8)]
    + [(s, 9) for s in _STD9],
    key=lambda m: len(m[0]), reverse=True)

_YV = sorted(("ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yas",
              "yes", "yais", "yamos", "yó"), key=len, reverse=True)
_VERB1 = ("en", "es", "éis", "emos")
_VERB2 = (
    "aba", "ada", "ida", "ara", "iera", "ía", "aría", "ería", "iría",
    "ad", "ed", "id", "ase", "iese", "aste", "iste", "an", "aban", "aran",
    "ieran", "ían", "arían", "erían", "irían", "asen", "iesen", "aron",
    "ieron", "arán", "erán", "irán", "ado", "ido", "ando", "iendo", "ar",
    "er", "ir", "as", "abas", "adas", "idas", "aras", "ieras", "ías",
    "arías", "erías", "irías", "ases", "ieses", "abais", "arais",
    "ierais", "íais", "aríais", "eríais", "iríais", "aseis", "ieseis",
    "asteis", "isteis", "áis", "aréis", "eréis", "iréis", "ados", "idos",
    "amos", "ábamos", "áramos", "iéramos", "íamos", "aríamos", "eríamos",
    "iríamos", "aremos", "eremos", "iremos", "ásemos", "iésemos", "imos",
    "arás", "erás", "irás", "ís", "ará", "erá", "irá", "aré", "eré",
    "iré", "ió")
_A8 = sorted([(s, 1) for s in _VERB1] + [(s, 2) for s in _VERB2],
             key=lambda m: len(m[0]), reverse=True)


def _regions(w: str):
    n = len(w)
    # RV (the Spanish/French snowball definition)
    rv = n
    if n >= 2:
        if w[0] in _V:
            if w[1] not in _V:  # vowel + consonant: after the next vowel
                j = 2
                while j < n and w[j] not in _V:
                    j += 1
                rv = j + 1 if j < n else n
            else:  # two vowels: after the next consonant
                j = 2
                while j < n and w[j] in _V:
                    j += 1
                rv = j + 1 if j < n else n
        else:
            if w[1] not in _V:  # two consonants: after the next vowel
                j = 2
                while j < n and w[j] not in _V:
                    j += 1
                rv = j + 1 if j < n else n
            else:  # consonant + vowel: after the third letter
                rv = 3 if n > 2 else n
    # R1 / R2 (standard)

    def _scan(i: int) -> int:
        while i < n and w[i] not in _V:
            i += 1
        while i < n and w[i] in _V:
            i += 1
        if i >= n:
            return n
        return i + 1

    p1 = _scan(0)
    p2 = _scan(p1)
    return rv, p1, p2


def spanish_snowball_stem(word: str) -> str:
    w = word
    rv, p1, p2 = _regions(w)

    # attached pronoun
    for pron in _PRONOUNS:
        if w.endswith(pron):
            rest = w[:-len(pron)]
            for marker, rep in _MARKERS:
                if rest.endswith(marker):
                    if len(rest) - len(marker) >= rv:
                        if rep == "Y":  # u + yendo keeps the gerund
                            if rest[:-len(marker)].endswith("u"):
                                w = rest
                        elif rep is None:
                            w = rest
                        else:
                            w = rest[:-len(marker)] + rep
                    break
            break

    def fits(m: int, ln: int) -> bool:
        return len(w) - ln >= m

    # standard OR y-verb OR verb suffix (first that fires)
    fired = False
    for suf, act in _A6:
        if w.endswith(suf):
            ln = len(suf)
            if act == 1 and fits(p2, ln):
                w, fired = w[:-ln], True
            elif act == 2 and fits(p2, ln):
                w, fired = w[:-ln], True
                if w.endswith("ic") and fits(p2, 2):
                    w = w[:-2]
            elif act == 3 and fits(p2, ln):
                w, fired = w[:-(ln - 3)], True  # logía(s) → log
            elif act == 4 and fits(p2, ln):
                w, fired = w[:-(ln - 1)], True  # ución(es) → u
            elif act == 5 and fits(p2, ln):
                w, fired = w[:-ln] + "ente", True
            elif act == 6 and fits(p1, ln):
                w, fired = w[:-ln], True
                if w.endswith("iv") and fits(p2, 2):
                    w = w[:-2]
                    if w.endswith("at") and fits(p2, 2):
                        w = w[:-2]
                elif (w.endswith(("ic", "ad", "os")) and fits(p2, 2)):
                    w = w[:-2]
            elif act == 7 and fits(p2, ln):
                w, fired = w[:-ln], True
                for sub in ("able", "ible", "ante"):
                    if w.endswith(sub) and fits(p2, 4):
                        w = w[:-4]
                        break
            elif act == 8 and fits(p2, ln):
                w, fired = w[:-ln], True
                for sub in ("abil", "ic", "iv"):
                    if w.endswith(sub) and fits(p2, len(sub)):
                        w = w[:-len(sub)]
                        break
            elif act == 9 and fits(p2, ln):
                w, fired = w[:-ln], True
                if w.endswith("at") and fits(p2, 2):
                    w = w[:-2]
            break
    if not fired:
        for suf in _YV:  # y-verb: fits RV, preceded by u
            if w.endswith(suf) and fits(rv, len(suf)):
                if w[:-len(suf)].endswith("u"):
                    w, fired = w[:-len(suf)], True
                break
    if not fired:
        for suf, act in _A8:
            if w.endswith(suf) and fits(rv, len(suf)):
                w = w[:-len(suf)]
                if act == 1 and w.endswith("gu"):
                    w = w[:-1]
                break

    # residual suffix — single longest-match action
    for suf in ("os", "a", "o", "á", "í", "ó", "e", "é"):
        if w.endswith(suf):
            if fits(rv, len(suf)):
                if suf in ("e", "é"):
                    w = w[:-1]
                    if w.endswith("gu") and len(w) - 1 >= rv:
                        w = w[:-1]
                else:
                    w = w[:-len(suf)]
            break

    return w.translate(_POSTLUDE)


class SpanishSnowballAnalyzer(EnglishAnalyzer):
    name = "spanish_snowball"
    max_token_length = 255

    def filter_token(self, t: str) -> str | None:
        return spanish_snowball_stem(t)
