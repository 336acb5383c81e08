"""Portuguese Snowball stemmer
(``org/tartarus/snowball/ext/PortugueseStemmer.java``, generated from
Martin Porter's public portuguese.sbl; the reference's
SnowballPorterFilterFactory(language=Portuguese) chain — the FULL
algorithm alongside the UniNE light/minimal variants in analysis_lang.py).

Transcribed from the generated driver: ã/õ → a~/o~ marking prelude, the
Spanish-style RV + R1/R2, the standard-suffix cascade (log/u/ente
rewrites, amente's a_2 chain, mente/idade/iva follow-ups, eira→eir), the
RV-confined 120-suffix verb pass, the ci-deletion after a fired pass,
residual vowels, the residual-form step (final e/é/ê with the gu/ci
follow-up, ç→c), and the unmarking postlude. Parity pinned by the
reference's own 2000-word golden (``snowball/portuguese.zip``).
"""

from __future__ import annotations

from lucene_spark.analysis_en import EnglishAnalyzer

_V = frozenset("aeiouáâéêíóôú")

_STD1 = ("ica", "ância", "adora", "osa", "ista", "eza", "ante", "ável",
         "ível", "ico", "ismo", "oso", "amento", "imento", "aça~o",
         "ador", "icas", "adoras", "osas", "istas", "ezas", "adores",
         "antes", "aço~es", "icos", "ismos", "osos", "amentos",
         "imentos")
_A5 = sorted(
    [(s, 1) for s in _STD1]
    + [("logia", 2), ("logias", 2), ("uça~o", 3), ("uço~es", 3),
       ("ência", 4), ("ências", 4), ("amente", 5), ("mente", 6),
       ("idade", 7), ("idades", 7)]
    + [(s, 8) for s in ("iva", "ivo", "ivas", "ivos")]
    + [("ira", 9), ("iras", 9)],
    key=lambda m: len(m[0]), reverse=True)

_VERB = sorted(
    ("ada", "ida", "ia", "aria", "eria", "iria", "ara", "era", "ira",
     "ava", "asse", "esse", "isse", "aste", "este", "iste", "ei", "arei",
     "erei", "irei", "am", "iam", "ariam", "eriam", "iriam", "aram",
     "eram", "iram", "avam", "em", "arem", "erem", "irem", "assem",
     "essem", "issem", "ado", "ido", "ando", "endo", "indo", "ara~o",
     "era~o", "ira~o", "ar", "er", "ir", "as", "adas", "idas", "ias",
     "arias", "erias", "irias", "aras", "eras", "iras", "avas", "es",
     "ardes", "erdes", "irdes", "ares", "eres", "ires", "asses", "esses",
     "isses", "astes", "estes", "istes", "is", "ais", "eis", "areis",
     "ereis", "ireis", "áreis", "éreis", "íreis", "ásseis", "ésseis",
     "ísseis", "áveis", "íeis", "aríeis", "eríeis", "iríeis", "ados",
     "idos", "amos", "áramos", "éramos", "íramos", "ávamos", "íamos",
     "aríamos", "eríamos", "iríamos", "emos", "aremos", "eremos",
     "iremos", "ássemos", "êssemos", "íssemos", "imos", "armos", "ermos",
     "irmos", "ámos", "arás", "erás", "irás", "eu", "iu", "ou", "ará",
     "erá", "irá"),
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


def portuguese_snowball_stem(word: str) -> str:
    w = word.replace("ã", "a~").replace("õ", "o~")
    rv, p1, p2 = _regions(w)

    def fits(m: int, ln: int) -> bool:
        return len(w) - ln >= m

    fired = False
    for suf, act in _A5:
        if w.endswith(suf):
            ln = len(suf)
            if act == 1 and fits(p2, ln):
                w, fired = w[:-ln], True
            elif act == 2 and fits(p2, ln):
                w, fired = w[:-ln] + "log", True
            elif act == 3 and fits(p2, ln):
                w, fired = w[:-ln] + "u", True
            elif act == 4 and fits(p2, ln):
                w, fired = w[:-ln] + "ente", True
            elif act == 5 and fits(p1, ln):
                w, fired = w[:-ln], True
                for sub in ("iv", "ic", "ad", "os"):
                    if w.endswith(sub) and fits(p2, 2):
                        w = w[:-2]
                        if sub == "iv" and w.endswith("at") \
                                and fits(p2, 2):
                            w = w[:-2]
                        break
            elif act == 6 and fits(p2, ln):
                w, fired = w[:-ln], True
                for sub in ("ante", "avel", "ível"):
                    if w.endswith(sub) and fits(p2, 4):
                        w = w[:-4]
                        break
            elif act == 7 and fits(p2, ln):
                w, fired = w[:-ln], True
                for sub in ("abil", "ic", "iv"):
                    if w.endswith(sub) and fits(p2, len(sub)):
                        w = w[:-len(sub)]
                        break
            elif act == 8 and fits(p2, ln):
                w, fired = w[:-ln], True
                if w.endswith("at") and fits(p2, 2):
                    w = w[:-2]
            elif act == 9 and fits(rv, ln):
                if w[:-ln].endswith("e"):
                    # eira(s) → eir
                    w, fired = w[:-ln] + "ir", True
            break
    if not fired:
        for suf in _VERB:
            if w.endswith(suf) and fits(rv, len(suf)):
                w, fired = w[:-len(suf)], True
                break
    if fired:
        if w.endswith("ci") and len(w) - 1 >= rv:
            w = w[:-1]
    else:
        for suf in ("os", "a", "i", "o", "á", "í", "ó"):
            if w.endswith(suf):
                if fits(rv, len(suf)):
                    w = w[:-len(suf)]
                break

    # residual form
    if w.endswith(("e", "é", "ê")):
        if fits(rv, 1):
            w = w[:-1]
            if ((w.endswith("gu") or w.endswith("ci"))
                    and len(w) - 1 >= rv):
                w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


class PortugueseSnowballAnalyzer(EnglishAnalyzer):
    name = "portuguese_snowball"
    max_token_length = 255

    def filter_token(self, t: str) -> str | None:
        return portuguese_snowball_stem(t)
