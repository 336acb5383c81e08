"""Nepali Snowball stemmer (``org/tartarus/snowball/ext/NepaliStemmer.java``,
generated from the public nepali.sbl — Bal Krishna Bal's algorithm).

Category 1 removes postpositions (the का/कि/की/कै/को forms only when not
preceded by ए or े), then a loop alternates conditional category-2 marks
(ँ/ं after यौ/छौ/नौ/थे, ै after त्र) with the large category-3 verb-suffix
table — the loop continues only while a category-3 suffix fires. Parity
pinned by the reference's own golden (``snowball/nepali.zip``) in
tests/test_porter2.py.
"""

from __future__ import annotations

from lucene_spark.analysis_en import EnglishAnalyzer

_CAT1_PLAIN = sorted(("लाइ", "लाई", "सँग", "संग", "मार्फत", "रत", "मा",
                      "द्वारा", "पछि", "ले", "सँगै", "मै"),
                     key=len, reverse=True)
_CAT1_KA = ("का", "कि", "की", "कै", "को")
_CAT3 = sorted((
    "थिए", "छ", "इछ", "एछ", "िछ", "ेछ", "नेछ", "हुनेछ", "इन्छ", "िन्छ",
    "हुन्छ", "एका", "इएका", "िएका", "ेका", "नेका", "दा", "इदा", "िदा",
    "देखि", "माथि", "एकी", "इएकी", "िएकी", "ेकी", "देखी", "थी", "दी",
    "छु", "एछु", "ेछु", "नेछु", "नु", "हरु", "हरू", "छे", "थे", "ने",
    "एकै", "ेकै", "नेकै", "दै", "इदै", "िदै", "एको", "इएको", "िएको",
    "ेको", "नेको", "दो", "इदो", "िदो", "यो", "इयो", "भयो", "ियो",
    "थियो", "दियो", "थ्यो", "छौ", "इछौ", "एछौ", "िछौ", "ेछौ", "नेछौ",
    "यौ", "थियौ", "छ्यौ", "थ्यौ", "छन्", "इछन्", "एछन्", "िछन्",
    "ेछन्", "नेछन्", "लान्", "छिन्", "थिन्", "पर्", "इस्", "थिइस्",
    "छस्", "इछस्", "एछस्", "िछस्", "ेछस्", "नेछस्", "िस्", "थिस्",
    "छेस्", "होस्"), key=len, reverse=True)


def nepali_stem(word: str) -> str:
    w = word
    # category 1
    cands = sorted([(s, 1) for s in _CAT1_PLAIN]
                   + [(s, 2) for s in _CAT1_KA],
                   key=lambda m: len(m[0]), reverse=True)
    for suf, act in cands:
        if w.endswith(suf):
            rest = w[:-len(suf)]
            if act == 1:
                w = rest
            else:
                if not rest.endswith(("ए", "े")):
                    w = rest
            break
    # category 2/3 loop: cat3 must fire to continue
    while True:
        if w.endswith(("ँ", "ं")):
            if w[:-1].endswith(("यौ", "छौ", "नौ", "थे")):
                w = w[:-1]
        elif w.endswith("ै"):
            if w[:-1].endswith("त्र"):
                w = w[:-1]
        fired = False
        for suf in _CAT3:
            if w.endswith(suf):
                w = w[:-len(suf)]
                fired = True
                break
        if not fired:
            break
    return w


class NepaliAnalyzer(EnglishAnalyzer):
    name = "nepali"
    max_token_length = 255

    def filter_token(self, t: str) -> str | None:
        return nepali_stem(t)
