"""Kraaij-Pohlmann Dutch stemmer
(``org/tartarus/snowball/ext/KpStemmer.java``, generated from the public
kraaij_pohlmann.sbl — the KP alternative to the standard Dutch stemmer).

Transcribed from the generated driver: vowel-unit measure regions (ij
counts as one vowel), the consonant/vowel/ij context predicates, the
short-vowel lengthening rule (doubling a/o/u/e in a final closed syllable
with its three abort contexts — two of which the 2000-word golden caught:
the lab7 test fires on the char before the CONSUMED consonant, and
lengthening applies to the string INCLUDING a just-inserted character),
steps 1-4 with their fall-through branch semantics, ge- prefix and infix
loss with measure recomputation and the step-1c d/t cleanup, step 7
(ft/kt/pt) and the step-6 undoubling (plus v→f, z→s), and Y marking.
Parity pinned by the reference's own 2000-word golden
(``snowball/kp.zip``) in tests/test_porter2.py.
"""

from __future__ import annotations

from lucene_spark.analysis_en import EnglishAnalyzer

VOW = set("aeiouy")  # marked Y is a consonant
AOU = set("aou")
AIOU = set("aiou")
VWX = VOW | {"w", "x"}

def _is_v(w, pos):
    # vowel or ij ENDING at pos (exclusive index pos = chars w[:pos])
    if pos >= 1 and w[pos-1] in VOW: return True
    return pos >= 2 and w[pos-2:pos] == "ij"

def _is_c(w, pos):
    if pos >= 2 and w[pos-2:pos] == "ij": return False
    return pos >= 1 and w[pos-1] not in VOW

def _is_vx(w, pos):
    return _is_v(w, pos-1)

def lengthen_v(s):
    # operates at end of s
    if not s or s[-1] in VWX:
        return s
    c = s[-1]; rest = s[:-1]
    if rest and rest[-1] in AOU:
        if len(rest) == 1 or rest[-2] not in VOW:
            return rest + rest[-1] + c
        return s
    if rest and rest[-1] == "e":
        q = rest[:-1]
        if q and q[-1] in VOW:
            return s
        if q:
            if len(q) >= 2 and q[-2] in AIOU:
                return s
            if len(q) >= 4 and q[-3] in AIOU and q[-4] not in VOW:
                return s
        return rest + "e" + c
    return s

def measure(w):
    n = len(w)
    def adv(i):
        while i < n and w[i] not in VOW:
            i += 1
        cnt = 0
        while i < n:
            if w.startswith("ij", i):
                i += 2; cnt += 1
            elif w[i] in VOW:
                i += 1; cnt += 1
            else:
                break
        if cnt == 0: return None
        if i >= n or w[i] in VOW: return None
        return i + 1
    p1 = adv(0)
    if p1 is None: return n, n
    p2 = adv(p1)
    return p1, (p2 if p2 is not None else n)

def kp_stem(word):
    w = word
    y_found = False
    chars = list(w)
    if chars and chars[0] == "y":
        chars[0] = "Y"; y_found = True
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i-1] in VOW:
            chars[i] = "Y"; y_found = True
    w = "".join(chars)
    p1, p2 = measure(w)
    stemmed = False

    def R1(pos): return pos >= p1
    # ---- Step 1
    def step1(w):
        if w.endswith("nde"):
            return w[:-3] + "nd", True
        if w.endswith("'s"):
            return w[:-2], True
        if w.endswith("ies"):
            if R1(len(w)-3): return w[:-3] + "ie", True
            return w, False
        if w.endswith("aus"):
            pos = len(w)-3
            if R1(pos) and _is_v(w, pos):
                return w[:-1], True
            return w, False
        if w.endswith("es"):
            pos = len(w)-2
            if w[:pos].endswith("ar") and R1(pos-2) and _is_c(w, pos-2):
                return lengthen_v(w[:pos-2]), True
            if w[:pos].endswith("er") and R1(pos-2) and _is_c(w, pos-2):
                return w[:pos-2], True
            if R1(pos) and _is_c(w, pos):
                return w[:pos] + "e", True
            return w, False
        if w.endswith("en"):
            pos = len(w)-2
            if w[:pos].endswith("hed") and R1(pos-3):
                return w[:pos-3] + "heid", True
            if w[:pos].endswith("nd"):
                return w[:pos], True
            if w[:pos].endswith("d") and R1(pos-1) and _is_c(w, pos-1):
                return w[:pos-1], True
            if (w[:pos].endswith("i") or w[:pos].endswith("j")) and _is_v(w, pos-1):
                return w[:pos], True
            if R1(pos) and _is_c(w, pos):
                return lengthen_v(w[:pos]), True
            return w, False
        if w.endswith("s"):
            pos = len(w)-1
            if not R1(pos): return w, False
            if w[:pos].endswith("t") and R1(pos-1): return w, False
            if _is_c(w, pos): return w[:pos], True
            return w, False
        return w, False

    w2, f = step1(w)
    if f: stemmed = True
    w = w2
    # ---- Step 2
    def step2(w):
        cands = sorted([("ische",4),("lijke",3),("ieve",11),("ene",10),
                        ("de",5),("ge",2),("je",1),("le",9),("re",8),
                        ("se",7),("te",6)], key=lambda m: len(m[0]), reverse=True)
        for suf, act in cands:
            if not w.endswith(suf): continue
            pos = len(w) - len(suf)
            if act == 1:  # je — every guarded branch falls through
                pre = w[:pos]
                if pre.endswith("'t"): return w[:pos-2], True
                if pre.endswith("et") and R1(pos-2) and _is_c(w, pos-2):
                    return w[:pos-2], True
                if pre.endswith("rnt"): return w[:pos-3] + "rn", True
                if pre.endswith("t") and R1(pos-1) and _is_vx(w, pos-1):
                    return w[:pos-1], True
                if pre.endswith("ink"): return w[:pos-3] + "ing", True
                if pre.endswith("mp"): return w[:pos-2] + "m", True
                if pre.endswith("'") and R1(pos-1): return w[:pos-1], True
                if R1(pos) and _is_c(w, pos): return w[:pos], True
                return w, False
            if act == 2:
                if R1(pos): return w[:pos] + "g", True
                return w, False
            if act == 3:
                if R1(pos): return w[:pos] + "lijk", True
                return w, False
            if act == 4:
                if R1(pos): return w[:pos] + "isch", True
                return w, False
            if act == 5:
                if R1(pos) and _is_c(w, pos): return w[:pos], True
                return w, False
            if act == 6:
                if R1(pos): return w[:pos] + "t", True
                return w, False
            if act == 7:
                if R1(pos): return w[:pos] + "s", True
                return w, False
            if act == 8:
                if R1(pos): return w[:pos] + "r", True
                return w, False
            if act == 9:
                if not R1(pos): return w, False
                return lengthen_v(w[:pos] + "l"), True
            if act == 10:
                if not (R1(pos) and _is_c(w, pos)): return w, False
                return lengthen_v(w[:pos] + "en"), True
            if act == 11:
                if R1(pos) and _is_c(w, pos): return w[:pos] + "ief", True
                return w, False
        return w, False

    w2, f = step2(w)
    if f: stemmed = True
    w = w2
    # ---- Step 3
    def step3(w):
        cands = sorted([("heid",3),("fie",6),("gie",7),("atie",1),
                        ("isme",2),("ing",2),("arij",5),("erij",2),
                        ("sel",3),("rder",4),("ster",3),("iteit",2),
                        ("dst",9),("tst",8)], key=lambda m: len(m[0]), reverse=True)
        for suf, act in cands:
            if not w.endswith(suf): continue
            pos = len(w) - len(suf)
            if act == 1:
                if R1(pos): return w[:pos] + "eer", True
                return w, False
            if act == 2:
                if not R1(pos): return w, False
                return lengthen_v(w[:pos]), True
            if act == 3:
                if R1(pos): return w[:pos], True
                return w, False
            if act == 4:
                return w[:pos] + "r", True
            if act == 5:
                if R1(pos) and _is_c(w, pos): return w[:pos] + "aar", True
                return w, False
            if act == 6:
                if pos >= p2: return lengthen_v(w[:pos] + "f"), True
                return w, False
            if act == 7:
                if pos >= p2: return lengthen_v(w[:pos] + "g"), True
                return w, False
            if act == 8:
                if R1(pos) and _is_c(w, pos): return w[:pos] + "t", True
                return w, False
            if act == 9:
                if R1(pos) and _is_c(w, pos): return w[:pos] + "d", True
                return w, False
        return w, False

    w2, f = step3(w)
    if f: stemmed = True
    w = w2
    # ---- Step 4
    def step4(w):
        cands = sorted([("achtiger",3),("achtigst",3),("erigst",9),
                        ("achtig",3),("eriger",9),("ioneel",1),
                        ("atief",2),("lijker",8),("lijkst",8),
                        ("baar",3),("erig",9),("laar",5),("naar",4),
                        ("raar",6),("tant",7),("end",9)],
                       key=lambda m: len(m[0]), reverse=True)
        for suf, act in cands:
            if not w.endswith(suf): continue
            pos = len(w) - len(suf)
            ok = True
            if act == 1 and R1(pos): return w[:pos] + "ie", True
            elif act == 2 and R1(pos): return w[:pos] + "eer", True
            elif act == 3 and R1(pos): return w[:pos], True
            elif act == 4 and R1(pos) and _is_v(w, pos): return w[:pos] + "n", True
            elif act == 5 and R1(pos) and _is_v(w, pos): return w[:pos] + "l", True
            elif act == 6 and R1(pos) and _is_v(w, pos): return w[:pos] + "r", True
            elif act == 7 and R1(pos): return w[:pos] + "teer", True
            elif act == 8 and R1(pos): return w[:pos] + "lijk", True
            elif act == 9 and R1(pos) and _is_c(w, pos):
                return lengthen_v(w[:pos]), True
            break  # a_3 matched but gate failed → fall to a_4 alternative
        for suf in ("iger", "igst", "ig"):
            if w.endswith(suf):
                pos = len(w) - len(suf)
                if R1(pos) and _is_c(w, pos):
                    return lengthen_v(w[:pos]), True
                break
        return w, False

    w2, f = step4(w)
    if f: stemmed = True
    w = w2
    # ---- Lose prefix, then Step 1c
    ge_removed = False
    def vowel_then_cons(s):
        i = 0; n = len(s)
        while i < n and s[i] not in VOW: i += 1
        if i >= n: return False
        j = i
        while j < n and s[j] in VOW: j += 1
        return j < n
    if w.startswith("ge") and len(w) >= 5 and vowel_then_cons(w[2:]):
        w = w[2:]; ge_removed = True
        p1, p2 = measure(w)
    if ge_removed:
        w = step1c(w, p1)
    ge_removed = False
    idx = w.find("ge", 1)
    if idx >= 1 and len(w) - (idx + 2) >= 3 and vowel_then_cons(w[idx+2:]):
        w = w[:idx] + w[idx+2:]; ge_removed = True
        p1, p2 = measure(w)
    if ge_removed:
        w = step1c(w, p1)
    # ---- Step 7 / Step 6
    s7 = False
    for suf, rep in (("ft","f"),("kt","k"),("pt","p")):
        if w.endswith(suf):
            w = w[:-2] + rep; s7 = True
            break
    if s7: stemmed = True
    if stemmed or ge_removed:
        for suf, rep in sorted([("bb","b"),("cc","c"),("dd","d"),("ff","f"),
                                ("gg","g"),("hh","h"),("jj","j"),("kk","k"),
                                ("ll","l"),("mm","m"),("nn","n"),("pp","p"),
                                ("qq","q"),("rr","r"),("ss","s"),("tt","t"),
                                ("vv","v"),("ww","w"),("xx","x"),("zz","z"),
                                ("v","f"),("z","s")],
                               key=lambda m: len(m[0]), reverse=True):
            if w.endswith(suf):
                w = w[:-len(suf)] + rep
                break
    if y_found:
        w = w.replace("Y", "y")
    return w

def step1c(w, p1):
    if w.endswith("d"):
        pos = len(w)-1
        if pos >= p1 and _is_c(w, pos):
            if w[:pos].endswith("n") and pos-1 >= p1:
                return w
            return w[:pos]
        return w
    if w.endswith("t"):
        pos = len(w)-1
        if pos >= p1 and _is_c(w, pos):
            if w[:pos].endswith("h") and pos-1 >= p1:
                return w
            return w[:pos]
        return w
    return w



class KpAnalyzer(EnglishAnalyzer):
    name = "kp"
    max_token_length = 255

    def filter_token(self, t: str) -> str | None:
        return kp_stem(t)
