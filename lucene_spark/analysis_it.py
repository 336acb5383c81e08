"""Italian Snowball stemmer (``org/tartarus/snowball/ext/ItalianStemmer.java``,
generated from Martin Porter's public italian.sbl; the reference's
SnowballPorterFilterFactory(language=Italian) chain — the FULL algorithm
alongside the CLEF light variant in analysis_lang.py).

Transcribed from the generated driver: prelude (acute→grave folding,
qu→qU, intervocalic u/i marking), the Spanish-style RV + R1/R2 regions,
attached-pronoun removal (36 pronouns after ando/endo → delete, after
ar/er/ir → replace with e), the standard-suffix cascade (nine action
groups incl. logia→log, usione/uzione→u, enza→ente, amenti/imenti on RV,
amente's a_4 chain, ità and iva follow-ups), RV-confined verb suffixes,
the vowel-suffix step (final AEIO + chained i, and c/g + h), unmark
postlude. Parity pinned by the reference's own 2000-word golden
(``snowball/italian.zip``) in tests/test_porter2.py.
"""

from __future__ import annotations

from lucene_spark.analysis_en import EnglishAnalyzer

_V = frozenset("aeiouàèìòù")
_AEIO = frozenset("aeioàèìò")
_ACUTE = str.maketrans({"á": "à", "é": "è", "í": "ì", "ó": "ò", "ú": "ù"})

_PRONOUNS = sorted(
    ("la", "cela", "gliela", "mela", "tela", "vela", "le", "cele",
     "gliele", "mele", "tele", "vele", "ne", "cene", "gliene", "mene",
     "sene", "tene", "vene", "ci", "li", "celi", "glieli", "meli", "teli",
     "veli", "gli", "mi", "si", "ti", "vi", "lo", "celo", "glielo",
     "melo", "telo", "velo"), key=len, reverse=True)

_STD1 = ("ica", "osa", "ista", "anza", "ice", "atrice", "iche", "abile",
         "ibile", "ose", "ante", "mente", "iste", "anze", "ici", "atrici",
         "ichi", "abili", "ibili", "ismi", "osi", "anti", "isti", "ico",
         "ismo", "oso", "istà", "istè", "istì")
_STD2 = ("azione", "atore", "azioni", "atori")
_STD4 = ("usione", "uzione", "usioni", "uzioni")
_STD9 = ("iva", "ive", "ivi", "ivo")
_A6 = sorted(
    [(s, 1) for s in _STD1] + [(s, 2) for s in _STD2]
    + [("logia", 3), ("logie", 3)] + [(s, 4) for s in _STD4]
    + [("enza", 5), ("enze", 5), ("amenti", 6), ("imenti", 6),
       ("amento", 6), ("imento", 6), ("amente", 7), ("ità", 8)]
    + [(s, 9) for s in _STD9],
    key=lambda m: len(m[0]), reverse=True)

_VERB = sorted(
    ("isca", "enda", "ata", "ita", "uta", "ava", "eva", "iva", "erebbe",
     "irebbe", "isce", "ende", "are", "ere", "ire", "asse", "ate",
     "avate", "evate", "ivate", "ete", "erete", "irete", "ite", "ereste",
     "ireste", "ute", "erai", "irai", "isci", "endi", "erei", "irei",
     "assi", "ati", "iti", "eresti", "iresti", "uti", "avi", "evi", "ivi",
     "isco", "ando", "endo", "Yamo", "iamo", "avamo", "evamo", "ivamo",
     "eremo", "iremo", "assimo", "ammo", "emmo", "eremmo", "iremmo",
     "immo", "ano", "iscano", "avano", "evano", "ivano", "eranno",
     "iranno", "ono", "iscono", "arono", "erono", "irono", "erebbero",
     "irebbero", "assero", "essero", "issero", "ato", "ito", "uto", "avo",
     "evo", "ivo", "ar", "ir", "erà", "irà", "erò", "irò"),
    key=len, reverse=True)


def _regions(w: str):
    n = len(w)
    rv = n
    if n >= 2:
        if w[0] in _V:
            j = 2
            if w[1] not in _V:
                while j < n and w[j] not in _V:
                    j += 1
                rv = j + 1 if j < n else n
            else:
                while j < n and w[j] in _V:
                    j += 1
                rv = j + 1 if j < n else n
        else:
            if w[1] not in _V:
                j = 2
                while j < n and w[j] not in _V:
                    j += 1
                rv = j + 1 if j < n else n
            else:
                rv = 3 if n > 2 else n

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


def italian_snowball_stem(word: str) -> str:
    # prelude
    w = word.translate(_ACUTE).replace("qu", "qU")
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if (chars[i] in "ui" and chars[i - 1] in _V
                and chars[i + 1] in _V):
            chars[i] = chars[i].upper()
    w = "".join(chars)
    rv, p1, p2 = _regions(w)

    def fits(m: int, ln: int) -> bool:
        return len(w) - ln >= m

    # attached pronoun
    for pron in _PRONOUNS:
        if w.endswith(pron):
            rest = w[:-len(pron)]
            for marker, act in sorted(
                    [("ando", 1), ("endo", 1), ("ar", 2), ("er", 2),
                     ("ir", 2)], key=lambda m: len(m[0]), reverse=True):
                if rest.endswith(marker):
                    if len(rest) - len(marker) >= rv:
                        w = rest if act == 1 else rest + "e"
                    break
            break

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
                w, fired = w[:-2], True  # logia/logie → log
            elif act == 4 and fits(p2, ln):
                w, fired = w[:-(ln - 1)], True  # → u
            elif act == 5 and fits(p2, ln):
                w, fired = w[:-ln] + "ente", True
            elif act == 6 and fits(rv, ln):
                w, fired = w[:-ln], True
            elif act == 7 and fits(p1, ln):
                w, fired = w[:-ln], True
                if w.endswith("iv") and fits(p2, 2):
                    w = w[:-2]
                    if w.endswith("at") and fits(p2, 2):
                        w = w[:-2]
                elif w.endswith(("abil", "ic", "os")):
                    sub = "abil" if w.endswith("abil") else w[-2:]
                    if fits(p2, len(sub)):
                        w = w[:-len(sub)]
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
                    if w.endswith("ic") and fits(p2, 2):
                        w = w[:-2]
            break
    if not fired:
        for suf in _VERB:
            if w.endswith(suf) and fits(rv, len(suf)):
                w = w[:-len(suf)]
                break

    # vowel suffix: final AEIO (RV), then chained i (RV)
    if w and w[-1] in _AEIO and fits(rv, 1):
        w = w[:-1]
        if w.endswith("i") and fits(rv, 1):
            w = w[:-1]
    # c/g + h (RV measured after consuming both chars)
    if (len(w) >= 2 and w[-1] == "h" and w[-2] in "cg" and fits(rv, 2)):
        w = w[:-1]

    return w.replace("I", "i").replace("U", "u")


class ItalianSnowballAnalyzer(EnglishAnalyzer):
    name = "italian_snowball"
    max_token_length = 255

    def filter_token(self, t: str) -> str | None:
        return italian_snowball_stem(t)
