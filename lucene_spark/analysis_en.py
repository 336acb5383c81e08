"""English analysis: possessive strip + stop set + Porter stemmer.

Semantics mirror the reference ``EnglishAnalyzer`` chain
(``lucene/analysis/common/.../en/EnglishAnalyzer.java:104-113``):
StandardTokenizer → EnglishPossessiveFilter → LowerCaseFilter →
StopFilter(ENGLISH_STOP_WORDS_SET) → PorterStemFilter. Removed stopwords
leave position holes and do not count toward the field length (norms), same
as the reference.

``porter_stem`` implements the classic 1980 Porter algorithm exactly as the
reference ships it (``en/PorterStemmer.java``, Martin Porter's public-domain
algorithm) including its documented departures (``bli``→``ble``,
``logi``→``log``) and the two bug fixes (step3/step5 guard at word start,
``j >= 0`` in the ``ion`` rule); words of length ≤ 2 are returned unchanged.

The heavy lifting stays vectorized: stemming is applied ONCE PER UNIQUE
TERM of a batch (vocabulary-level, after the byte tokenizer dedups), not
per token — O(vocab) Python cost on an O(tokens) pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

# EnglishAnalyzer.java:46-52 (the classic 33-word English stop set)
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

_VOWELS = "aeiou"


def porter_stem(word: str) -> str:
    """Porter-stem one lowercase word. See module docstring for provenance."""
    if len(word) <= 2:
        return word
    b = list(word)
    # k: index of last letter; j: set by _ends; k0 = 0 throughout
    state = {"k": len(b) - 1, "j": 0}

    def cons(i: int) -> bool:
        ch = b[i]
        if ch in _VOWELS:
            return False
        if ch == "y":
            return True if i == 0 else not cons(i - 1)
        return True

    def m() -> int:
        n, i, j = 0, 0, state["j"]
        while True:
            if i > j:
                return n
            if not cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not cons(i):
                    break
                i += 1
            i += 1

    def vowel_in_stem() -> bool:
        return any(not cons(i) for i in range(state["j"] + 1))

    def doublec(jj: int) -> bool:
        return jj >= 1 and b[jj] == b[jj - 1] and cons(jj)

    def cvc(i: int) -> bool:
        if i < 2 or not cons(i) or cons(i - 1) or not cons(i - 2):
            return False
        return b[i] not in "wxy"

    def ends(s: str) -> bool:
        o = state["k"] - len(s) + 1
        if o < 0:
            return False
        if "".join(b[o: o + len(s)]) != s:
            return False
        state["j"] = state["k"] - len(s)
        return True

    def setto(s: str):
        o = state["j"] + 1
        b[o: o + len(s)] = list(s)
        state["k"] = state["j"] + len(s)

    def r(s: str):
        if m() > 0:
            setto(s)

    # step 1: plurals and -ed / -ing
    if b[state["k"]] == "s":
        if ends("sses"):
            state["k"] -= 2
        elif ends("ies"):
            setto("i")
        elif b[state["k"] - 1] != "s":
            state["k"] -= 1
    if ends("eed"):
        if m() > 0:
            state["k"] -= 1
    elif (ends("ed") or ends("ing")) and vowel_in_stem():
        state["k"] = state["j"]
        if ends("at"):
            setto("ate")
        elif ends("bl"):
            setto("ble")
        elif ends("iz"):
            setto("ize")
        elif doublec(state["k"]):
            ch = b[state["k"]]
            state["k"] -= 1
            if ch in "lsz":
                state["k"] += 1
        elif m() == 1 and cvc(state["k"]):
            setto("e")

    # step 2: terminal y → i when the stem has a vowel
    if ends("y") and vowel_in_stem():
        b[state["k"]] = "i"

    # step 3: double suffices → single (m > 0)
    if state["k"] > 0:
        c = b[state["k"] - 1]
        if c == "a":
            if ends("ational"):
                r("ate")
            elif ends("tional"):
                r("tion")
        elif c == "c":
            if ends("enci"):
                r("ence")
            elif ends("anci"):
                r("ance")
        elif c == "e":
            if ends("izer"):
                r("ize")
        elif c == "l":
            if ends("bli"):
                r("ble")
            elif ends("alli"):
                r("al")
            elif ends("entli"):
                r("ent")
            elif ends("eli"):
                r("e")
            elif ends("ousli"):
                r("ous")
        elif c == "o":
            if ends("ization"):
                r("ize")
            elif ends("ation"):
                r("ate")
            elif ends("ator"):
                r("ate")
        elif c == "s":
            if ends("alism"):
                r("al")
            elif ends("iveness"):
                r("ive")
            elif ends("fulness"):
                r("ful")
            elif ends("ousness"):
                r("ous")
        elif c == "t":
            if ends("aliti"):
                r("al")
            elif ends("iviti"):
                r("ive")
            elif ends("biliti"):
                r("ble")
        elif c == "g":
            if ends("logi"):
                r("log")

    # step 4: -icate / -ative / -alize / -iciti / -ical / -ful / -ness
    c4 = b[state["k"]]
    if c4 == "e":
        if ends("icate"):
            r("ic")
        elif ends("ative"):
            r("")
        elif ends("alize"):
            r("al")
    elif c4 == "i":
        if ends("iciti"):
            r("ic")
    elif c4 == "l":
        if ends("ical"):
            r("ic")
        elif ends("ful"):
            r("")
    elif c4 == "s":
        if ends("ness"):
            r("")

    # step 5: drop suffix in <c>vcvc<v> context (m > 1)
    if state["k"] > 0:
        c = b[state["k"] - 1]
        matched = False
        if c == "a":
            matched = ends("al")
        elif c == "c":
            matched = ends("ance") or ends("ence")
        elif c == "e":
            matched = ends("er")
        elif c == "i":
            matched = ends("ic")
        elif c == "l":
            matched = ends("able") or ends("ible")
        elif c == "n":
            matched = (ends("ant") or ends("ement") or ends("ment")
                       or ends("ent"))
        elif c == "o":
            matched = (ends("ion") and state["j"] >= 0
                       and b[state["j"]] in "st") or ends("ou")
        elif c == "s":
            matched = ends("ism")
        elif c == "t":
            matched = ends("ate") or ends("iti")
        elif c == "u":
            matched = ends("ous")
        elif c == "v":
            matched = ends("ive")
        elif c == "z":
            matched = ends("ize")
        if matched and m() > 1:
            state["k"] = state["j"]

    # step 6: final -e / -ll cleanup
    state["j"] = state["k"]
    if b[state["k"]] == "e":
        a = m()
        if a > 1 or (a == 1 and not cvc(state["k"] - 1)):
            state["k"] -= 1
    if b[state["k"]] == "l" and doublec(state["k"]) and m() > 1:
        state["k"] -= 1

    return "".join(b[: state["k"] + 1])


_APOS_VARIANTS = ("'s", "’s", "＇s")


def _normalize_apostrophes(text: str) -> str:
    """Map the UAX#29 apostrophe variants (’ RIGHT SINGLE QUOTATION
    MARK, ＇ FULLWIDTH APOSTROPHE) to ASCII ``'`` before tokenizing, so
    "dog’s" tokenizes as one token and the possessive strips — the
    reference EnglishPossessiveFilter accepts all three variants
    (``en/EnglishPossessiveFilterFactory`` / ``EnglishPossessiveFilter.java:55-60``)."""
    if "’" in text:
        text = text.replace("’", "'")
    if "＇" in text:
        text = text.replace("＇", "'")
    return text


def strip_possessive(t: str) -> str:
    """EnglishPossessiveFilter: remove a trailing ``'s`` (any apostrophe
    variant)."""
    for suf in _APOS_VARIANTS:
        if t.endswith(suf):
            return t[:-2]
    return t


@dataclass(frozen=True)
class EnglishAnalyzer:
    """Standard tokenizer + possessive strip + English stop set + Porter.

    Shares the byte-level vectorized tokenizer with StandardAnalyzer; the
    filter chain runs at VOCABULARY level over the batch's unique terms.
    """

    name = "english"
    max_token_length: int = 255

    def filter_token(self, t: str) -> str | None:
        """Post-tokenizer chain for one lowercase token; None = dropped
        (position still advances — StopFilter hole semantics)."""
        t = strip_possessive(t)
        if t in ENGLISH_STOP_WORDS:
            return None
        return porter_stem(t)

    def tokenize_text(self, text: str) -> list[str]:
        from lucene_spark import analysis as A

        if not text:
            return []
        out = []
        for t in A._STANDARD_RE.findall(_normalize_apostrophes(text)):
            if len(t) > self.max_token_length or not A._HAS_ALNUM_RE.search(t):
                continue
            ft = self.filter_token(t.lower())
            if ft is not None:
                out.append(ft)
        return out

    def tokenize_series(self, texts: pd.Series) -> pd.Series:
        return texts.fillna("").map(self.tokenize_text)

    def tokenize_ids(self, texts: pd.Series, with_positions: bool = False):
        """Byte-tokenize, then apply the filter chain once per unique term
        and remap the integer codes (O(vocab) Python on an O(tokens) path)."""
        from lucene_spark.analysis import _tokenize_ids_bytes

        # normalize curly/fullwidth apostrophes so the byte tokenizer's
        # ASCII joiner rules see them (vectorized; no-op on ASCII corpora)
        texts = texts.str.replace("’", "'", regex=False).str.replace(
            "＇", "'", regex=False)
        res = _tokenize_ids_bytes(
            texts, joiners=True, max_token_length=self.max_token_length,
            stopwords=None, with_positions=with_positions,
        )
        uniq, codes, per_row = res[0], res[1], res[2]
        positions = res[3] if with_positions else None
        if uniq.size == 0:
            return res
        filtered = [self.filter_token(t) for t in uniq]
        drop = np.array([f is None for f in filtered], dtype=bool)
        kept_old = np.flatnonzero(~drop)
        if kept_old.size == 0:
            n_rows = len(texts)
            empty = (np.array([], dtype=object), np.zeros(0, np.int64),
                     np.zeros(n_rows, np.int64))
            return (*empty, np.zeros(0, np.int64)) if with_positions else empty
        stemmed = np.array([filtered[i] for i in kept_old], dtype=object)
        new_uniq, inv = np.unique(stemmed, return_inverse=True)
        code_remap = np.full(uniq.size, -1, dtype=np.int64)
        code_remap[kept_old] = inv
        tok_keep = ~drop[codes]
        n_rows = len(texts)
        row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), per_row)
        new_codes = code_remap[codes[tok_keep]]
        new_per_row = np.bincount(row_ids[tok_keep], minlength=n_rows).astype(np.int64)
        if with_positions:
            return new_uniq, new_codes, new_per_row, positions[tok_keep]
        return new_uniq, new_codes, new_per_row

    def tokenize_flat(self, texts: pd.Series):
        uniq, codes, lens = self.tokenize_ids(texts)
        return (uniq[codes] if codes.size else np.array([], dtype=object)), lens
