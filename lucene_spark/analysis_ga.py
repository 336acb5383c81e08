"""Irish Snowball stemmer (``org/tartarus/snowball/ext/IrishStemmer.java``,
generated from the public irish.sbl).

Transcribed from the generated driver: initial-mutation restoration
(eclipsis/lenition prefixes: bhf→f, gc→c, dt→t, mb→b, … and the
apostrophe/hyphen prefixes deleted), RV (after the first vowel) + R1/R2
on the mutated word, then three independent backward passes — noun
suffixes (R1/R2), derivational suffixes (with the arc/gin/graf/paite/óid
rewrites), verb suffixes (RV/R1). Parity pinned by the reference's own
1000-word golden (``snowball/irish.zip``) in tests/test_porter2.py.
"""

from __future__ import annotations

from lucene_spark.analysis_en import EnglishAnalyzer

_V = frozenset("aeiouáéíóú")

# a_0: initial mutation prefixes → restored initial (longest match first);
# None = plain delete
_INITIAL = sorted([
    ("b'", None), ("bhf", "f"), ("bh", "b"), ("bp", "p"), ("ch", "c"),
    ("d'fh", "f"), ("d'", None), ("dh", "d"), ("dt", "t"), ("fh", "f"),
    ("gc", "c"), ("gh", "g"), ("h-", None), ("m'", None), ("mb", "b"),
    ("mh", "m"), ("n-", None), ("nd", "d"), ("ng", "g"), ("ph", "p"),
    ("sh", "s"), ("t-", None), ("th", "t"), ("ts", "s"),
], key=lambda m: len(m[0]), reverse=True)

_NOUN = sorted([
    ("íochta", 1), ("aíochta", 1), ("ire", 2), ("aire", 2), ("abh", 1),
    ("eabh", 1), ("ibh", 1), ("aibh", 1), ("amh", 1), ("eamh", 1),
    ("imh", 1), ("aimh", 1), ("íocht", 1), ("aíocht", 1), ("irí", 2),
    ("airí", 2),
], key=lambda m: len(m[0]), reverse=True)

_DERIV = sorted([
    ("óideacha", 6), ("patacha", 5), ("achta", 1), ("arcachta", 2),
    ("eachta", 1), ("grafaíochta", 4), ("paite", 5), ("ach", 1),
    ("each", 1), ("óideach", 6), ("gineach", 3), ("patach", 5),
    ("grafaíoch", 4), ("pataigh", 5), ("óidigh", 6), ("achtúil", 1),
    ("eachtúil", 1), ("gineas", 3), ("ginis", 3), ("acht", 1),
    ("arcacht", 2), ("eacht", 1), ("grafaíocht", 4), ("arcachtaí", 2),
    ("grafaíochtaí", 4),
], key=lambda m: len(m[0]), reverse=True)
_DERIV_REP = {2: "arc", 3: "gin", 4: "graf", 5: "paite", 6: "óid"}

_VERB = sorted([
    ("imid", 1), ("aimid", 1), ("ímid", 1), ("aímid", 1), ("adh", 2),
    ("eadh", 2), ("faidh", 1), ("fidh", 1), ("áil", 2), ("ain", 2),
    ("tear", 2), ("tar", 2),
], key=lambda m: len(m[0]), reverse=True)


def irish_stem(word: str) -> str:
    w = word
    for pre, rep in _INITIAL:
        if w.startswith(pre):
            w = (rep or "") + w[len(pre):]
            break
    n = len(w)
    i = 0
    while i < n and w[i] not in _V:
        i += 1
    rv = i + 1 if i < n else n

    def _scan(j: int) -> int:
        while j < n and w[j] not in _V:
            j += 1
        while j < n and w[j] in _V:
            j += 1
        if j >= n:
            return n
        return j + 1

    p1 = _scan(0)
    p2 = _scan(p1)

    def region_for(act: int, table) -> int:
        return table[act]

    for suf, act in _NOUN:
        if w.endswith(suf):
            gate = p1 if act == 1 else p2
            if len(w) - len(suf) >= gate:
                w = w[:-len(suf)]
            break
    for suf, act in _DERIV:
        if w.endswith(suf):
            if act == 1:
                if len(w) - len(suf) >= p2:
                    w = w[:-len(suf)]
            else:
                w = w[:-len(suf)] + _DERIV_REP[act]
            break
    for suf, act in _VERB:
        if w.endswith(suf):
            gate = rv if act == 1 else p1
            if len(w) - len(suf) >= gate:
                w = w[:-len(suf)]
            break
    return w


class IrishAnalyzer(EnglishAnalyzer):
    name = "irish"
    max_token_length = 255

    def filter_token(self, t: str) -> str | None:
        return irish_stem(t)
