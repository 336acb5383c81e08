"""Romanian Snowball stemmer
(``org/tartarus/snowball/ext/RomanianStemmer.java``, generated from the
public romanian.sbl).

Transcribed from the generated driver: intervocalic u/i → U/I marking,
Spanish-style RV + R1/R2, step 0 (plural/article endings with the
ul/aua/ea/ile-unless-ab/atei/aţia rewrites), the combo-suffix loop
(abilitate→abil, ivitate→iv, ical→ic, ativ→at, itiv→it families, repeated
to a fixed point) + the R2 standard suffixes (ţiune→t, ist forms), verb
suffixes confined to RV (the large a_4 table; the first group requires a
preceding non-vowel or u within RV), final vowels (a/e/ie/i/ă in RV), and
the unmarking postlude. Parity pinned by the reference's own 2000-word
golden (``snowball/romanian.zip``) in tests/test_porter2.py.
"""

from __future__ import annotations

from lucene_spark.analysis_en import EnglishAnalyzer

_V = frozenset("aeiouâîă")

_STEP0 = sorted([
    ("ea", 3), ("aţia", 7), ("aua", 2), ("iua", 4), ("aţie", 7),
    ("ele", 3), ("ile", 5), ("iile", 4), ("iei", 4), ("atei", 6),
    ("ii", 4), ("ului", 1), ("ul", 1), ("elor", 3), ("ilor", 4),
    ("iilor", 4),
], key=lambda m: len(m[0]), reverse=True)
_STEP0_REP = {1: "", 2: "a", 3: "e", 4: "i", 5: "i", 6: "at", 7: "aţi"}

_COMBO = sorted([
    ("icala", 4), ("iciva", 4), ("ativa", 5), ("itiva", 6), ("icale", 4),
    ("aţiune", 5), ("iţiune", 6), ("atoare", 5), ("itoare", 6),
    ("ătoare", 5), ("icitate", 4), ("abilitate", 1), ("ibilitate", 2),
    ("ivitate", 3), ("icive", 4), ("ative", 5), ("itive", 6),
    ("icali", 4), ("atori", 5), ("icatori", 4), ("itori", 6),
    ("ători", 5), ("icitati", 4), ("abilitati", 1), ("ivitati", 3),
    ("icivi", 4), ("ativi", 5), ("itivi", 6), ("icităi", 4),
    ("abilităi", 1), ("ivităi", 3), ("icităţi", 4), ("abilităţi", 1),
    ("ivităţi", 3), ("ical", 4), ("ator", 5), ("icator", 4),
    ("itor", 6), ("ător", 5), ("iciv", 4), ("ativ", 5), ("itiv", 6),
    ("icală", 4), ("icivă", 4), ("ativă", 5), ("itivă", 6),
], key=lambda m: len(m[0]), reverse=True)
_COMBO_REP = {1: "abil", 2: "ibil", 3: "iv", 4: "ic", 5: "at", 6: "it"}

_STD = sorted([
    ("ica", 1), ("abila", 1), ("ibila", 1), ("oasa", 1), ("ata", 1),
    ("ita", 1), ("anta", 1), ("ista", 3), ("uta", 1), ("iva", 1),
    ("ic", 1), ("ice", 1), ("abile", 1), ("ibile", 1), ("isme", 3),
    ("iune", 2), ("oase", 1), ("ate", 1), ("itate", 1), ("ite", 1),
    ("ante", 1), ("iste", 3), ("ute", 1), ("ive", 1), ("ici", 1),
    ("abili", 1), ("ibili", 1), ("iuni", 2), ("atori", 1), ("osi", 1),
    ("ati", 1), ("itati", 1), ("iti", 1), ("anti", 1), ("isti", 3),
    ("uti", 1), ("işti", 3), ("ivi", 1), ("ităi", 1), ("oşi", 1),
    ("ităţi", 1), ("abil", 1), ("ibil", 1), ("ism", 3), ("ator", 1),
    ("os", 1), ("at", 1), ("it", 1), ("ant", 1), ("ist", 3), ("ut", 1),
    ("iv", 1), ("ică", 1), ("abilă", 1), ("ibilă", 1), ("oasă", 1),
    ("ată", 1), ("ită", 1), ("antă", 1), ("istă", 3), ("ută", 1),
    ("ivă", 1),
], key=lambda m: len(m[0]), reverse=True)

_VERB1 = ("ea", "ia", "esc", "ăsc", "ind", "ând", "are", "ere", "ire",
          "âre", "ase", "ise", "use", "âse", "eşte", "ăşte", "eze", "ai",
          "eai", "iai", "eşti", "ăşti", "ui", "ezi", "âi", "aşi", "aseşi",
          "iseşi", "useşi", "âseşi", "işi", "uşi", "âşi", "eaţi", "iaţi",
          "arăţi", "aserăţi", "iserăţi", "userăţi", "âserăţi", "irăţi",
          "urăţi", "ârăţi", "am", "eam", "iam", "asem", "isem", "usem",
          "âsem", "arăm", "aserăm", "iserăm", "userăm", "âserăm", "irăm",
          "urăm", "ârăm", "au", "eau", "iau", "indu", "ându", "ez",
          "ească", "ară", "aseră", "iseră", "useră", "âseră", "iră",
          "ură", "âră", "ează")
_VERB2 = ("se", "sese", "sei", "seşi", "seseşi", "aţi", "eţi", "iţi",
          "âţi", "serăţi", "seserăţi", "em", "sesem", "im", "âm", "ăm",
          "serăm", "seserăm", "seră", "seseră")
_VERB = sorted([(s, 1) for s in _VERB1] + [(s, 2) for s in _VERB2],
               key=lambda m: len(m[0]), reverse=True)

_VOWEL = sorted(("a", "e", "ie", "i", "ă"), key=len, reverse=True)


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


def romanian_stem(word: str) -> str:
    # prelude: intervocalic u/i → U/I
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if (chars[i] in "ui" and chars[i - 1] in _V
                and chars[i + 1] in _V):
            chars[i] = chars[i].upper()
    w = "".join(chars)
    rv, p1, p2 = _regions(w)

    def fits(m: int, ln: int) -> bool:
        return len(w) - ln >= m

    # step 0 (R1)
    for suf, act in _STEP0:
        if w.endswith(suf):
            if fits(p1, len(suf)):
                if act == 5 and w[:-len(suf)].endswith("ab"):
                    pass  # ile unless preceded by ab
                else:
                    w = w[:-len(suf)] + _STEP0_REP[act]
            break
    # standard suffix: combo loop + R2 pass
    removed = False
    while True:
        fired = False
        for suf, act in _COMBO:
            if w.endswith(suf):
                if fits(p1, len(suf)):
                    w = w[:-len(suf)] + _COMBO_REP[act]
                    removed = fired = True
                break
        if not fired:
            break
    for suf, act in _STD:
        if w.endswith(suf):
            if fits(p2, len(suf)):
                if act == 1:
                    w = w[:-len(suf)]
                    removed = True
                elif act == 2:
                    if w[:-len(suf)].endswith("ţ"):
                        w = w[:-len(suf) - 1] + "t"
                        removed = True
                else:
                    w = w[:-len(suf)] + "ist"
                    removed = True
            break
    # verb suffix only when no standard suffix fired (RV-fitted)
    if not removed:
        for suf, act in _VERB:
            if w.endswith(suf) and fits(rv, len(suf)):
                cut = len(w) - len(suf)
                if act == 1:
                    # preceded, within RV, by a non-vowel or u
                    if cut - 1 >= rv and (w[cut - 1] not in _V
                                          or w[cut - 1] == "u"):
                        w = w[:cut]
                else:
                    w = w[:cut]
                break
    # final vowel (RV)
    for suf in _VOWEL:
        if w.endswith(suf):
            if fits(rv, len(suf)):
                w = w[:-len(suf)]
            break
    return w.replace("I", "i").replace("U", "u")


class RomanianAnalyzer(EnglishAnalyzer):
    name = "romanian"
    max_token_length = 255

    def filter_token(self, t: str) -> str | None:
        return romanian_stem(t)
