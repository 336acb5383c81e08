"""Russian Snowball stemmer (``org/tartarus/snowball/ext/RussianStemmer.java``,
generated from Martin Porter's public russian.sbl; the reference's
SnowballPorterFilterFactory(language=Russian) chain — the FULL algorithm
alongside the Dolamic/Savoy light variant in analysis_lang.py).

Transcribed from the generated driver: ё→е fold, RV (after the first
vowel) / R2 regions, step 1 (perfective gerund, else optional reflexive +
first of adjectival / verb / noun — the а/я-context groups reproduced),
step 2 trailing-и, R2 derivational ост/ость, tidy-up (ейше/ейш, нн→н, ь).
Every suffix operation is RV-confined like the generated code
(limit_backward = pV). Parity pinned by the reference's own 2000-word
golden (``snowball/russian.zip``) in tests/test_porter2.py.
"""

from __future__ import annotations

from lucene_spark.analysis_en import EnglishAnalyzer

_V = frozenset("аеиоуыэюя")

_PERF_GERUND = (  # (suffix, needs_preceding_а_я), longest first
    ("ившись", False), ("ывшись", False), ("вшись", True),
    ("ивши", False), ("ывши", False), ("вши", True),
    ("ив", False), ("ыв", False), ("в", True),
)
_ADJECTIVE = sorted(
    ("ее", "ие", "ое", "ые", "ими", "ыми", "ей", "ий", "ой", "ый", "ем",
     "им", "ом", "ым", "его", "ого", "ему", "ому", "их", "ых", "ею", "ою",
     "ую", "юю", "ая", "яя"), key=len, reverse=True)
_PARTICIPLE = (("ующ", False), ("ивш", False), ("ывш", False),
               ("ем", True), ("нн", True), ("вш", True), ("ющ", True),
               ("щ", True))
_VERB = (  # longest first; (suffix, needs_preceding_а_я)
    ("ейте", False), ("уйте", False), ("ите", False),
    ("ила", False), ("ыла", False), ("ена", False), ("ете", True),
    ("йте", True), ("или", False), ("ыли", False), ("ило", False),
    ("ыло", False), ("ено", False), ("нно", True), ("ует", False),
    ("уют", False), ("ены", False), ("ить", False), ("ыть", False),
    ("ишь", False), ("ешь", True), ("ла", True), ("на", True),
    ("ли", True), ("ем", True), ("ло", True), ("но", True), ("ет", True),
    ("ют", True), ("ны", True), ("ть", True), ("ей", False), ("уй", False),
    ("ил", False), ("ыл", False), ("им", False), ("ым", False),
    ("ен", False), ("ит", False), ("ыт", False), ("ят", False),
    ("ую", False), ("й", True), ("л", True), ("н", True), ("ю", False),
)
_NOUN = sorted(
    ("а", "ев", "ов", "е", "ие", "ье", "и", "еи", "ии", "ами", "ями",
     "иями", "й", "ей", "ией", "ий", "ой", "ам", "ем", "ием", "ом", "ям",
     "иям", "о", "у", "ах", "ях", "иях", "ы", "ь", "ю", "ию", "ью", "я",
     "ия", "ья"), key=len, reverse=True)


def russian_snowball_stem(word: str) -> str:
    w = word.replace("ё", "е")
    n = len(w)
    # regions
    i = 0
    while i < n and w[i] not in _V:
        i += 1
    if i == n:
        rv = p2 = n
    else:
        rv = i + 1
        j = rv
        while j < n and w[j] in _V:
            j += 1
        if j == n:
            p2 = n
        else:
            j += 1
            while j < n and w[j] not in _V:
                j += 1
            if j == n:
                p2 = n
            else:
                j += 1
                while j < n and w[j] in _V:
                    j += 1
                p2 = n if j == n else j + 1

    def fits(ln: int) -> bool:
        return len(w) - ln >= rv

    def try_group(groups) -> bool:
        """(suffix, needs а/я) list, longest-fitting-first; True if fired."""
        nonlocal w
        for suf, needs in sorted(groups, key=lambda g: len(g[0]),
                                 reverse=True):
            if w.endswith(suf) and fits(len(suf)):
                if needs:
                    cut = len(w) - len(suf)
                    if cut - 1 < rv or w[cut - 1] not in "ая":
                        return False  # among committed; no shorter retry
                w = w[:-len(suf)]
                return True
        return False

    # step 1
    if not try_group(_PERF_GERUND):
        for suf in ("сь", "ся"):  # reflexive (optional)
            if w.endswith(suf) and fits(2):
                w = w[:-2]
                break
        # adjectival = adjective + optional participle
        fired = False
        for suf in _ADJECTIVE:
            if w.endswith(suf) and fits(len(suf)):
                w = w[:-len(suf)]
                fired = True
                try_group(_PARTICIPLE)  # optional, failure keeps w
                break
        if not fired:
            fired = try_group(_VERB)
        if not fired:
            for suf in _NOUN:
                if w.endswith(suf) and fits(len(suf)):
                    w = w[:-len(suf)]
                    break
    # step 2: trailing и
    if w.endswith("и") and fits(1):
        w = w[:-1]
    # derivational (R2)
    for suf in ("ость", "ост"):
        if w.endswith(suf) and len(w) - len(suf) >= p2 and fits(len(suf)):
            w = w[:-len(suf)]
            break
    # tidy up
    if w.endswith("ейше") and fits(4):
        w = w[:-4]
        if w.endswith("нн") and fits(2):
            w = w[:-1]
    elif w.endswith("ейш") and fits(3):
        w = w[:-3]
        if w.endswith("нн") and fits(2):
            w = w[:-1]
    elif w.endswith("нн") and fits(1):
        w = w[:-1]
    elif w.endswith("ь") and fits(1):
        w = w[:-1]
    return w


class RussianSnowballAnalyzer(EnglishAnalyzer):
    name = "russian_snowball"
    max_token_length = 255

    def filter_token(self, t: str) -> str | None:
        return russian_snowball_stem(t)
