"""Phonetic analysis: Soundex / RefinedSoundex / Metaphone token encoders.

Mirrors the reference phonetic module
(``lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/phonetic/
PhoneticFilter.java`` + ``PhoneticFilterFactory.java:61-77`` encoder
registry), whose encoders are Apache commons-codec's ``language`` package.
The chain here is StandardTokenizer → LowerCaseFilter → PhoneticFilter with
``inject=false`` (replace-token mode): each term is replaced by its phonetic
code, so 'tabel' and 'table' index and query identically. ``inject=true``
(original + code at the same position) is a documented cut — it needs
overlap-token emission; replace-mode is the configuration used for dedicated
phonetic fields, which is the reference factory's primary use.

PhoneticFilter semantics reproduced exactly (``PhoneticFilter.java:70-85``):
the encoded form replaces the token only when it is non-empty and differs
from the original; encoder failures / unmapped inputs keep the original
token (the filter's ``catch (Exception ignored)``).

Encoder algorithms follow commons-codec (the artifact the reference build
depends on — public Apache-2.0 code):

* ``soundex`` — American Soundex incl. the H/W rule
  (``org.apache.commons.codec.language.Soundex``, US_ENGLISH mapping
  ``01230120022455012623010202``): 4-char codes, vowels reset the duplicate
  suppressor, consonants separated only by H/W collapse.
* ``refined_soundex`` — ``RefinedSoundex`` (mapping
  ``01360240043788015936020505``): unbounded length, vowels emit '0',
  consecutive identical codes collapse.
* ``metaphone`` — Lawrence Philips' 1990 Metaphone exactly as
  ``org.apache.commons.codec.language.Metaphone`` implements it
  (maxCodeLen=4), including its initial-pair rewrites (KN/GN/PN/AE/WR/WH/X)
  and every consonant context rule.

All encoding runs at VOCABULARY level (once per unique term of an Arrow
batch) on top of the shared byte tokenizer — O(vocab) Python on an
O(tokens) pipeline, same as the Porter chain (``analysis_en.py``).
"""

from __future__ import annotations

from lucene_spark.analysis_en import EnglishAnalyzer

_SOUNDEX_MAP = "01230120022455012623010202"  # A..Z
_REFINED_MAP = "01360240043788015936020505"  # A..Z

_VOWELS = "AEIOU"
_FRONTV = "EIY"
_VARSON = "CSPTG"


def _clean(word: str) -> str:
    """SoundexUtils.clean: uppercase, letters only (ASCII scope here — the
    byte tokenizer lowercases to ASCII for the gate corpora; non-ASCII
    letters make the encoder a no-op, matching the filter's catch-and-keep)."""
    return "".join(ch for ch in word.upper() if "A" <= ch <= "Z")


def soundex(word: str) -> str:
    """American Soundex of one token (commons-codec ``Soundex.soundex``).

    Returns '' when no letters remain after cleaning (caller keeps the
    original token, PhoneticFilter semantics)."""
    s = _clean(word)
    if not s:
        return ""
    if any(not ("A" <= ch <= "Z") for ch in word.upper() if ch.isalpha()):
        return ""  # non-ASCII letter → commons-codec throws → keep original

    def mapping_code(i: int) -> str | None:
        """Soundex.getMappingCode: None = skip entirely (H/W rule)."""
        mapped = _SOUNDEX_MAP[ord(s[i]) - 65]
        if i > 1 and mapped != "0":
            hw = s[i - 1]
            if hw in "HW":
                pre = s[i - 2]
                if _SOUNDEX_MAP[ord(pre) - 65] == mapped or pre in "HW":
                    return None
        return mapped

    out = [s[0], "0", "0", "0"]
    count = 1
    last = _SOUNDEX_MAP[ord(s[0]) - 65]
    i = 1
    while i < len(s) and count < 4:
        mapped = mapping_code(i)
        i += 1
        if mapped is None:
            continue
        if mapped != "0" and mapped != last:
            out[count] = mapped
            count += 1
        last = mapped
    return "".join(out)


def refined_soundex(word: str) -> str:
    """RefinedSoundex of one token (commons-codec ``RefinedSoundex``):
    first letter + one digit per run of same-coded chars (vowels '0')."""
    s = _clean(word)
    if not s:
        return ""
    if any(not ("A" <= ch <= "Z") for ch in word.upper() if ch.isalpha()):
        return ""
    out = [s[0]]
    last = None
    for ch in s:
        cur = _REFINED_MAP[ord(ch) - 65]
        if cur == last:
            continue
        out.append(cur)
        last = cur
    return "".join(out)


def metaphone(word: str, max_code_len: int = 4) -> str:
    """Metaphone of one token — a faithful transcription of commons-codec
    ``Metaphone.metaphone`` (Philips 1990): initial-pair rewrites, then the
    per-consonant context rules, code capped at ``max_code_len``."""
    if not word:
        return ""
    txt = word.upper()
    if len(txt) == 1:
        return txt
    inwd = list(txt)

    # initial 2-character exceptions (Metaphone.java switch on inwd[0])
    if inwd[0] in "KGP":
        local = inwd[1:] if inwd[1] == "N" else inwd[:]
    elif inwd[0] == "A":
        local = inwd[1:] if inwd[1] == "E" else inwd[:]
    elif inwd[0] == "W":
        if inwd[1] == "R":
            local = inwd[1:]
        elif inwd[1] == "H":
            local = inwd[1:]
            local[0] = "W"  # WH -> W
        else:
            local = inwd[:]
    elif inwd[0] == "X":
        inwd[0] = "S"
        local = inwd[:]
    else:
        local = inwd[:]

    wdsz = len(local)
    code: list[str] = []
    n = 0

    def is_vowel(i: int) -> bool:
        return 0 <= i < wdsz and local[i] in _VOWELS

    def is_prev(i: int, c: str) -> bool:
        return 0 < i < wdsz and local[i - 1] == c

    def is_next(i: int, c: str) -> bool:
        return 0 <= i < wdsz - 1 and local[i + 1] == c

    def is_last(i: int) -> bool:
        return i + 1 == wdsz

    def region(i: int, test: str) -> bool:
        return (i >= 0 and i + len(test) <= wdsz
                and "".join(local[i:i + len(test)]) == test)

    while len(code) < max_code_len and n < wdsz:
        symb = local[n]
        if symb != "C" and is_prev(n, symb):  # dedup adjacent letters, C exempt
            n += 1
            continue
        if symb in _VOWELS:
            if n == 0:
                code.append(symb)
        elif symb == "B":
            if not (is_prev(n, "M") and is_last(n)):  # silent terminal MB
                code.append(symb)
        elif symb == "C":
            if is_prev(n, "S") and not is_last(n) and local[n + 1] in _FRONTV:
                pass  # SCE/SCI/SCY: discard the C
            elif region(n, "CIA"):
                code.append("X")
            elif not is_last(n) and local[n + 1] in _FRONTV:
                code.append("S")  # CE/CI/CY
            elif is_prev(n, "S") and is_next(n, "H"):
                code.append("K")  # SCH
            elif is_next(n, "H"):
                # commons-codec: initial CH with a vowel at index 2 hardens
                # to K ("CHARACTER" → KRKT); every other CH → X ("TEACH" → TX)
                if n == 0 and wdsz >= 3 and is_vowel(2):
                    code.append("K")
                else:
                    code.append("X")
            else:
                code.append("K")
        elif symb == "D":
            if (not is_last(n + 1) and is_next(n, "G")
                    and local[n + 2] in _FRONTV):
                code.append("J")  # DGE/DGI/DGY
                n += 2
            else:
                code.append("T")
        elif symb == "G":
            silent = False
            if is_last(n + 1) and is_next(n, "H"):
                silent = True  # terminal GH
            elif (not is_last(n + 1) and is_next(n, "H")
                    and not is_vowel(n + 2)):
                silent = True  # GH + consonant
            elif n > 0 and (region(n, "GN") or region(n, "GNED")):
                silent = True
            if not silent:
                hard = is_prev(n, "G")
                if not is_last(n) and local[n + 1] in _FRONTV and not hard:
                    code.append("J")
                else:
                    code.append("K")
        elif symb == "H":
            if not is_last(n) and not (n > 0 and local[n - 1] in _VARSON):
                if is_vowel(n + 1):
                    code.append("H")
        elif symb in "FJLMNR":
            code.append(symb)
        elif symb == "K":
            if n == 0 or not is_prev(n, "C"):
                code.append(symb)
        elif symb == "P":
            code.append("F" if is_next(n, "H") else symb)
        elif symb == "Q":
            code.append("K")
        elif symb == "S":
            if region(n, "SH") or region(n, "SIO") or region(n, "SIA"):
                code.append("X")
            else:
                code.append("S")
        elif symb == "T":
            if region(n, "TIA") or region(n, "TIO"):
                code.append("X")
            elif region(n, "TCH"):
                pass  # silent in TCH
            elif region(n, "TH"):
                code.append("0")  # theta
            else:
                code.append("T")
        elif symb == "V":
            code.append("F")
        elif symb in "WY":
            if not is_last(n) and is_vowel(n + 1):
                code.append(symb)
        elif symb == "X":
            code.append("K")
            code.append("S")
        elif symb == "Z":
            code.append("S")
        # non-A–Z symbols: ignored (commons-codec default branch)
        n += 1
        if len(code) > max_code_len:
            del code[max_code_len:]
    return "".join(code)


ENCODERS = {
    "soundex": soundex,
    "refined_soundex": refined_soundex,
    "metaphone": metaphone,
}


class PhoneticAnalyzer(EnglishAnalyzer):
    """StandardTokenizer → LowerCase → PhoneticFilter(encoder, inject=false).

    Reuses the English chain's vocabulary-level remap machinery
    (``analysis_en.EnglishAnalyzer.tokenize_ids``) with the phonetic encode
    as the per-unique-term filter: no stop set, no possessive strip, no
    position holes (nothing is ever dropped — unmappable tokens pass
    through unchanged, ``PhoneticFilter.java:70-85``)."""

    max_token_length = 255

    def __init__(self, encoder: str = "metaphone"):
        if encoder not in ENCODERS:
            raise ValueError(f"unknown phonetic encoder: {encoder}")
        self.encoder = encoder
        self._encode = ENCODERS[encoder]
        self.name = f"phonetic_{encoder}"

    def filter_token(self, t: str) -> str | None:
        code = self._encode(t)
        # replace only when non-empty and different (PhoneticFilter rule)
        return code if code and code != t else t
