"""Lovins stemmer (``org/tartarus/snowball/ext/LovinsStemmer.java``,
generated from Martin Porter's public lovins.sbl — Julie Beth Lovins'
1968 algorithm, the first published stemmer).

One longest-match pass over the 294-ending table (extracted mechanically
from the generated source), each ending gated by one of the 29 contextual
conditions A-Z/AA/BB/CC evaluated against the candidate stem — a condition
failure falls back to shorter candidate endings (among semantics) — then
the consonant undoubling and the 34 respell transformations (iev→ief,
uct→uc, olv→olut, the conditional ul/end/her/et/ent rules, …). Parity
pinned by the reference's own 2000-word golden (``snowball/lovins.zip``)
in tests/test_porter2.py.
"""

from __future__ import annotations

from lucene_spark.analysis_en import EnglishAnalyzer

_AA_SET = ("ph", "th", "er", "or", "es", "d", "f", "l", "t")

# (ending, condition letter), longest first — LovinsStemmer.java a_1
_ENDINGS = (
    ("alistically", "B"), ("izationally", "B"), ("arizability", "A"), ("arisations", "A"),
    ("arizations", "A"), ("antialness", "A"), ("entialness", "A"), ("entialize", "A"),
    ("izational", "A"), ("entiation", "A"), ("arisation", "A"), ("arization", "A"),
    ("entations", "A"), ("eableness", "E"), ("ativeness", "A"), ("ionalness", "A"),
    ("itousness", "A"), ("antaneous", "A"), ("allically", "C"), ("istically", "A"),
    ("ationally", "B"), ("antiality", "A"), ("entiality", "A"), ("izability", "A"),
    ("arizable", "A"), ("ionalize", "A"), ("ionalism", "A"), ("entation", "A"),
    ("izations", "A"), ("ableness", "A"), ("ibleness", "A"), ("icalness", "A"),
    ("lessness", "A"), ("eousness", "A"), ("iousness", "A"), ("entially", "A"),
    ("ionality", "A"), ("alistic", "B"), ("aristic", "A"), ("ivistic", "A"),
    ("elihood", "E"), ("encible", "A"), ("entiate", "A"), ("icalize", "A"),
    ("arizing", "A"), ("istical", "A"), ("ational", "B"), ("icalism", "A"),
    ("ativism", "A"), ("ication", "G"), ("ination", "A"), ("isation", "A"),
    ("ization", "F"), ("alities", "A"), ("ivities", "A"), ("entials", "A"),
    ("ateness", "A"), ("iteness", "A"), ("iveness", "A"), ("ingness", "A"),
    ("ishness", "A"), ("ariness", "E"), ("fulness", "A"), ("ousness", "A"),
    ("entness", "A"), ("izement", "A"), ("icalist", "A"), ("atively", "A"),
    ("atingly", "A"), ("aically", "A"), ("oidally", "A"), ("ionally", "A"),
    ("entally", "A"), ("icianry", "A"), ("icality", "A"), ("ability", "A"),
    ("ibility", "A"), ("arized", "A"), ("icance", "A"), ("atable", "A"),
    ("izable", "E"), ("eature", "Z"), ("ionate", "D"), ("ialize", "A"),
    ("ancing", "B"), ("encing", "A"), ("ioning", "A"), ("enting", "C"),
    ("ancial", "A"), ("ential", "A"), ("oidism", "A"), ("action", "G"),
    ("ariser", "A"), ("arizer", "A"), ("istics", "A"), ("ancies", "A"),
    ("encies", "A"), ("nesses", "A"), ("atives", "A"), ("ionals", "A"),
    ("icians", "A"), ("ations", "B"), ("alness", "A"), ("icists", "A"),
    ("aceous", "A"), ("acious", "B"), ("ialist", "A"), ("ionist", "A"),
    ("entist", "A"), ("ically", "A"), ("efully", "A"), ("ifully", "A"),
    ("lessly", "A"), ("eously", "A"), ("iously", "A"), ("iality", "A"),
    ("allic", "BB"), ("antic", "C"), ("istic", "A"), ("anced", "B"),
    ("enced", "A"), ("ished", "A"), ("ioned", "A"), ("ented", "C"),
    ("aroid", "A"), ("ehood", "A"), ("ihood", "A"), ("icide", "A"),
    ("otide", "A"), ("idine", "I"), ("ature", "E"), ("inate", "A"),
    ("ative", "A"), ("alize", "A"), ("arize", "A"), ("aging", "B"),
    ("ening", "E"), ("ating", "I"), ("izing", "F"), ("aical", "A"),
    ("oidal", "A"), ("arial", "A"), ("ional", "A"), ("ental", "A"),
    ("icism", "A"), ("alism", "B"), ("inism", "J"), ("ician", "A"),
    ("ation", "B"), ("ances", "B"), ("ences", "A"), ("oides", "A"),
    ("acies", "A"), ("aries", "A"), ("ities", "A"), ("izers", "F"),
    ("ators", "A"), ("eless", "A"), ("eness", "E"), ("iness", "A"),
    ("itous", "A"), ("icant", "A"), ("ement", "A"), ("icist", "A"),
    ("alist", "A"), ("iedly", "A"), ("ately", "A"), ("ively", "A"),
    ("ingly", "B"), ("arily", "A"), ("ially", "A"), ("fully", "A"),
    ("early", "Y"), ("ously", "A"), ("ently", "A"), ("atory", "A"),
    ("acity", "A"), ("icity", "A"), ("ality", "A"), ("elity", "A"),
    ("inity", "CC"), ("arity", "B"), ("ivity", "A"), ("aric", "A"),
    ("atic", "B"), ("itic", "H"), ("ened", "E"), ("ated", "I"),
    ("ized", "F"), ("hood", "A"), ("ward", "A"), ("ance", "B"),
    ("ence", "A"), ("able", "A"), ("ible", "A"), ("wise", "A"),
    ("ying", "B"), ("yish", "A"), ("ical", "A"), ("eful", "A"),
    ("iful", "A"), ("ogen", "A"), ("izer", "F"), ("ator", "A"),
    ("ides", "L"), ("ages", "B"), ("ines", "M"), ("ates", "A"),
    ("ings", "N"), ("ials", "A"), ("isms", "B"), ("ians", "A"),
    ("ions", "B"), ("iers", "A"), ("less", "A"), ("ness", "A"),
    ("ants", "B"), ("ists", "A"), ("eous", "A"), ("ious", "A"),
    ("ancy", "B"), ("ency", "A"), ("ealy", "Y"), ("ably", "A"),
    ("ibly", "A"), ("edly", "E"), ("lily", "A"), ("ally", "B"),
    ("enly", "E"), ("arly", "K"), ("eity", "A"), ("ata", "A"),
    ("aic", "A"), ("ied", "A"), ("oid", "A"), ("ide", "L"),
    ("age", "B"), ("ene", "E"), ("ine", "M"), ("one", "R"),
    ("ese", "A"), ("ate", "A"), ("ite", "AA"), ("ive", "A"),
    ("ize", "F"), ("ing", "N"), ("ish", "C"), ("eal", "Y"),
    ("ial", "A"), ("ful", "A"), ("ism", "B"), ("ium", "A"),
    ("ian", "A"), ("ion", "Q"), ("ear", "Y"), ("ier", "A"),
    ("ics", "A"), ("ies", "P"), ("als", "BB"), ("ars", "O"),
    ("ous", "A"), ("ant", "B"), ("ent", "C"), ("ist", "A"),
    ("acy", "A"), ("ely", "E"), ("ily", "A"), ("ary", "F"),
    ("ery", "E"), ("ity", "A"), ("s'", "A"), ("ia", "A"),
    ("ic", "A"), ("ed", "E"), ("ae", "A"), ("al", "BB"),
    ("yl", "R"), ("um", "U"), ("en", "F"), ("on", "S"),
    ("ar", "X"), ("or", "T"), ("'s", "A"), ("as", "B"),
    ("es", "E"), ("is", "A"), ("us", "V"), ("ly", "B"),
    ("a", "A"), ("e", "A"), ("i", "A"), ("o", "A"),
    ("s", "W"), ("y", "B"),)


def _cond(name: str, e: str) -> bool:
    L = len(e)
    if name == "A":
        return L >= 2
    if name == "B":
        return L >= 3
    if name == "C":
        return L >= 4
    if name == "D":
        return L >= 5
    if name == "E":
        return L >= 2 and not e.endswith("e")
    if name == "F":
        return L >= 3 and not e.endswith("e")
    if name == "G":
        return L >= 3 and e.endswith("f")
    if name == "H":
        return L >= 2 and (e.endswith("t") or e.endswith("ll"))
    if name == "I":
        return L >= 2 and not e.endswith(("o", "e"))
    if name == "J":
        return L >= 2 and not e.endswith(("a", "e"))
    if name in ("K", "X"):
        base = 3 if name == "K" else 2
        return L >= base and (e.endswith(("l", "i"))
                              or (e.endswith("e") and L >= 3
                                  and e[-3] == "u"))
    if name == "L":
        if L < 2 or e.endswith(("u", "x")):
            return False
        return not (e.endswith("s") and not e.endswith("os"))
    if name == "M":
        return L >= 2 and not e.endswith(("a", "c", "e", "m"))
    if name == "N":
        if L < 3:
            return False
        return e[-3] != "s" or L >= 4
    if name == "O":
        return L >= 2 and e.endswith(("l", "i"))
    if name == "P":
        return L >= 2 and not e.endswith("c")
    if name == "Q":
        return L >= 3 and not e.endswith(("l", "n"))
    if name == "R":
        return L >= 2 and e.endswith(("n", "r"))
    if name == "S":
        if L < 2:
            return False
        return e.endswith("dr") or (e.endswith("t")
                                    and not e.endswith("tt"))
    if name == "T":
        if L < 2:
            return False
        return e.endswith("s") or (e.endswith("t")
                                   and not e.endswith("ot"))
    if name == "U":
        return L >= 2 and e.endswith(("l", "m", "n", "r"))
    if name == "V":
        return L >= 2 and e.endswith("c")
    if name == "W":
        return L >= 2 and not e.endswith(("s", "u"))
    if name == "Y":
        return L >= 2 and e.endswith("in")
    if name == "Z":
        return L >= 2 and not e.endswith("f")
    if name == "AA":
        return L >= 2 and e.endswith(_AA_SET)
    if name == "BB":
        return (L >= 3 and not e.endswith("met")
                and not e.endswith("ryst"))
    if name == "CC":
        return L >= 2 and e.endswith("l")
    raise ValueError(name)


_RESPELL = sorted([
    ("uad", "uas", None), ("vad", "vas", None), ("cid", "cis", None),
    ("lid", "lis", None), ("erid", "eris", None), ("pand", "pans", None),
    ("end", "ens", "s"), ("ond", "ons", None), ("lud", "lus", None),
    ("rud", "rus", None), ("ul", "l", "aio"), ("her", "hes", "pt"),
    ("metr", "meter", None), ("istr", "ister", None), ("urs", "ur", None),
    ("uct", "uc", None), ("et", "es", "n"), ("mit", "mis", None),
    ("ent", "ens", "m"), ("umpt", "um", None), ("rpt", "rb", None),
    ("ert", "ers", None), ("yt", "ys", None), ("iev", "ief", None),
    ("olv", "olut", None), ("ax", "ac", None), ("ex", "ec", None),
    ("bex", "bic", None), ("dex", "dic", None), ("pex", "pic", None),
    ("tex", "tic", None), ("ix", "ic", None), ("lux", "luc", None),
    ("yz", "ys", None),
], key=lambda m: len(m[0]), reverse=True)


def lovins_stem(word: str) -> str:
    w = word
    for suf, cond in _ENDINGS:
        if w.endswith(suf):
            stem = w[:-len(suf)]
            if _cond(cond, stem):
                w = stem
                break
            # condition failure → shorter candidates (among fallback)
    if len(w) >= 2 and w[-1] == w[-2] and w[-1] in "bdglmnprst":
        w = w[:-1]
    for suf, rep, guard in _RESPELL:
        if w.endswith(suf):
            pre = w[:-len(suf)]
            if guard and pre.endswith(tuple(guard)):
                break  # conditional rules commit on failure
            w = pre + rep
            break
    return w


class LovinsAnalyzer(EnglishAnalyzer):
    name = "lovins"
    max_token_length = 255

    def filter_token(self, t: str) -> str | None:
        return lovins_stem(t)
