"""Greek analysis: GreekLowerCaseFilter + Greek stop set + GreekStemmer.

Mirrors the reference Greek chain (``lucene/analysis/common/src/java/org/
apache/lucene/analysis/el/GreekAnalyzer.java:35-47``): StandardTokenizer →
GreekLowerCaseFilter → StopFilter(el stop set) → GreekStemFilter.

``greek_lower`` reproduces ``GreekLowerCaseFilter.java:54-113``: lowercase,
final sigma ς → σ, and the tonos/dialytika diacritic strips (ά→α … ώ→ω).
Implemented as lower() + a single-pass translate — every mapping is
letter→letter, so token boundaries cannot move and it composes as a
pre-tokenizer fold (the FoldingAnalyzer pattern).

``greek_stem`` transcribes ``GreekStemmer.java:42-957`` (Ntais/Saroukos
algorithm): 21 "short" suffix rules with add-back exception sets, the long
rule-21 ending list applied only when no short rule fired, and the rule-22
comparative strip. The Java's exact operator precedence is preserved —
including the reference's own `&&`/`||` precedence quirks in rule0 and
rule8, which the 343 reference test vectors pin (``TestGreekStemmer.java``,
replayed verbatim in tests/test_greek.py). Exception-set literals are
extracted mechanically from the reference source. Add-back rules rely on
the Java char[]-buffer semantics (removed chars still present past ``len``)
— reproduced here with an explicit (buffer, length) pair.

Stemming runs at VOCABULARY level (once per unique term of an Arrow
batch), same as the Porter chain.
"""

from __future__ import annotations

from lucene_spark.analysis_en import EnglishAnalyzer

# GreekAnalyzer default stop set (el/stopwords.txt)
GREEK_STOP_WORDS = frozenset("""
ο η το οι τα του τησ των τον την και κι κ ειμαι εισαι ειναι ειμαστε ειστε
στο στον στη στην μα αλλα απο για προσ με σε ωσ παρα αντι κατα μετα θα να
δε δεν μη μην επι ενω εαν αν τοτε που πωσ ποιοσ ποια ποιο ποιοι ποιεσ
ποιων ποιουσ αυτοσ αυτη αυτο αυτοι αυτων αυτουσ αυτεσ αυτα εκεινοσ εκεινη
εκεινο εκεινοι εκεινεσ εκεινα εκεινων εκεινουσ οπωσ ομωσ ισωσ οσο οτι
""".split())

# GreekLowerCaseFilter's special cases, applied after str.lower()
# (capital-with-tonos forms lower() to small-with-tonos first)
_GREEK_FOLD = str.maketrans({
    "ς": "σ",  # final sigma → sigma
    "ά": "α",  # ά → α
    "έ": "ε",  # έ → ε
    "ή": "η",  # ή → η
    "ί": "ι", "ϊ": "ι", "ΐ": "ι",  # ί ϊ ΐ → ι
    "ύ": "υ", "ϋ": "υ", "ΰ": "υ",  # ύ ϋ ΰ → υ
    "ό": "ο",  # ό → ο
    "ώ": "ω",  # ώ → ω
    "΢": "ς",  # reserved → final sigma (back-compat case)
})


def greek_lower(text: str) -> str:
    """GreekLowerCaseFilter over a string (boundary-safe pre-tokenizer)."""
    return text.lower().translate(_GREEK_FOLD)


_VOWELS = frozenset("αεηιουω")
_VOWELS_NO_Y = frozenset("αεηιοω")  # endsWithVowelNoY excludes υ

_EXC4 = frozenset(['γαλ', 'δ', 'ελ', 'θ', 'ιδ', 'ν', 'π', 'παρ'])
_EXC6 = frozenset(['αδ', 'αλ', 'αμαν', 'αμμοχαλ', 'ανηθ', 'αντιδ', 'βρωμ',
                   'γερ', 'ενδ', 'εξωδ', 'ηθ', 'καλλιν', 'καλπ', 'καταδ',
                   'μουλ', 'μπαγιατ', 'μπαν', 'μπολ', 'μποσ', 'νιτ', 'ξικ',
                   'πετσ', 'πικαντ', 'πιτσ', 'πλιατσ', 'ποστελν', 'πρωτοδ',
                   'σερτ', 'συναδ', 'συνομηλ', 'τσαμ', 'υποδ', 'φιλον',
                   'φυλοδ', 'φυσ', 'χασ'])
_EXC7 = frozenset(['αναπ', 'αποθ', 'αποκ', 'αποστ', 'βουβ', 'ξεθ', 'ουλ',
                   'πεθ', 'πικρ', 'ποτ', 'σιχ', 'χ'])
_EXC8A = frozenset(['τρ', 'τσ'])
_EXC8B = frozenset(['αγ', 'αδαπ', 'αθιγγ', 'αμερικαν', 'αμηχ', 'ανικ',
                    'ανοργ', 'απηγ', 'απιθ', 'ατσιγγ', 'βαθυγαλ', 'βασ',
                    'βασκ', 'βετερ', 'βιομηχ', 'βουλκ', 'βραχμ', 'βραχυκ',
                    'γ', 'γαλ', 'γερ', 'δεκ', 'διατ', 'διαφ', 'διπλ',
                    'δραδουμ', 'ενοργ', 'ερ', 'ζωντ', 'θ', 'θυσ', 'ικ',
                    'καλπουζ', 'καπνοβιομηχ', 'καστ', 'καστελ', 'καταγαλ',
                    'κλιβ', 'κοιλαρφ', 'κοπ', 'κορμορ', 'λαοπλ', 'λιβ',
                    'λιχ', 'λουθηρ', 'μ', 'μαιντ', 'μεγλοβιομηχ', 'μελ',
                    'μικροβιομηχ', 'μουσουλμ', 'μωαμεθ', 'ν', 'νταβ',
                    'ξηροκλιβ', 'ολιγοδαμ', 'ολογαλ', 'ορφ', 'ουλ', 'ουρ',
                    'π', 'πελεκ', 'πενταρφ', 'περηφ', 'περιτρ', 'πιθ', 'πλ',
                    'πλατ', 'πολισ', 'πολυδαπ', 'πολυμηχ', 'πορτολ',
                    'πουριτ', 'σ', 'σαρακατσ', 'σιγ', 'σουλτ', 'σπ', 'στεγ',
                    'στεφ', 'ταβ', 'τετ', 'τραγ', 'τσαγ', 'τσαρλατ',
                    'τσιγγ', 'τσοπ', 'υπερηφ', 'υποκοπ', 'φ', 'φωτοστεφ',
                    'χ', 'χαμηλοδαπ', 'ψηλοταβ', 'ψυχοπλ'])
_EXC9 = frozenset(['αβαρ', 'αβρ', 'αδ', 'αθ', 'αν', 'απλ', 'βαρον', 'βεν',
                   'δ', 'εμ', 'εναρ', 'θ', 'θαρρ', 'κοπ', 'μπορ', 'νιφ',
                   'ντρ', 'παγ', 'παρακαλ', 'σερπ', 'σκ', 'σκελ', 'συρφ',
                   'τοκ', 'υ'])
_EXC12A = frozenset(['ακαταπ', 'αμεταμφ', 'απ', 'ασυμπ', 'π', 'συμπ'])
_EXC12B = frozenset(['αλ', 'αρ', 'εκτελ', 'ζ', 'μ', 'νισ', 'ξ', 'παρακαλ',
                     'προ'])
_EXC13 = frozenset(['διαθ', 'θ', 'παρακαταθ', 'προσθ', 'συνθ'])
_EXC14 = frozenset(['αγκ', 'αιθ', 'αμ', 'αναρρ', 'ανηκ', 'βρομ', 'δε',
                    'δεσποζ', 'δευτερευ', 'εκλιπ', 'ενδιαφερ', 'καθαρευ',
                    'λ', 'λαμπιδ', 'λεχ', 'μ', 'μεδ', 'μεσαζ', 'πατ', 'πλε',
                    'ρ', 'τσα', 'υποτειν', 'φαρμακ', 'χαδ'])
_EXC15A = frozenset(['αβαστ', 'αδηφ', 'αειπ', 'αιμοστ', 'αμαλ', 'αμαλλι',
                     'ανυπ', 'ανυστ', 'απερ', 'αποτ', 'αρτιπ', 'ασπ',
                     'ασπαρ', 'αφ', 'αχαρ', 'δερβεν', 'διατ', 'δροσοπ',
                     'εν', 'επιτ', 'κροκαλοπ', 'λ', 'μ', 'ναυ', 'νεοπ',
                     'νομοτ', 'ξεφ', 'ολοπ', 'ομοτ', 'ουλαμ', 'ουρ', 'π',
                     'παμφ', 'πολυφ', 'προστ', 'προσωποπ', 'ρ', 'σιδηροπ',
                     'συμπ', 'συντ', 'τ', 'τρ', 'υποτ', 'χαρ'])
_EXC15B = frozenset(['ναυλοχ', 'ψοφ'])
_EXC16 = frozenset(['δωδεκαν', 'επταν', 'ερημον', 'μεγαλον', 'ν', 'χερσον'])
_EXC17 = frozenset(['αειμν', 'απλ', 'ασβ', 'αχρ', 'δυσχρ', 'ευχρ',
                    'κοινοχρ', 'παλιμψ', 'σβ', 'χρ'])
_EXC18 = frozenset(['εξων', 'κακομουτσ', 'ν', 'ρ', 'σπι', 'στραβομουτσ'])
_EXC19 = frozenset(['αζ', 'αλλοσουσ', 'ασουσ', 'παρασουσ', 'φ', 'χ',
                    'ωριοπλ'])


def greek_stem(word: str) -> str:  # noqa: C901 — mirrors the 22-rule Java
    """Greek stem of one folded lowercase token (GreekStemmer.java:42-88)."""
    if len(word) < 4:
        return word
    s = list(word)  # buffer keeps removed chars past n (Java char[] semantics)
    n = len(s)

    def ew(m: int, suf: str) -> bool:
        return m >= len(suf) and s[m - len(suf):m] == list(suf)

    def pre(m: int) -> str:
        return "".join(s[:m])

    orig = n

    # rule0 — a Java `return` here exits rule0 only; rules 1-20 and 22
    # still run on the shortened length. Note the reference's own
    # precedence quirk on the σκαγιου group: the len guard binds only to
    # the first endsWith.
    def rule0(n: int) -> int:
        if n > 9 and (ew(n, "καθεστωτοσ") or ew(n, "καθεστωτων")):
            return n - 4
        if n > 8 and (ew(n, "γεγονοτοσ") or ew(n, "γεγονοτων")):
            return n - 4
        if n > 8 and ew(n, "καθεστωτα"):
            return n - 3
        if n > 7 and (ew(n, "τατογιου") or ew(n, "τατογιων")):
            return n - 4
        if n > 7 and ew(n, "γεγονοτα"):
            return n - 3
        if n > 7 and ew(n, "καθεστωσ"):
            return n - 2
        if ((n > 6 and ew(n, "σκαγιου")) or ew(n, "σκαγιων")
                or ew(n, "ολογιου") or ew(n, "ολογιων") or ew(n, "κρεατοσ")
                or ew(n, "κρεατων") or ew(n, "περατοσ") or ew(n, "περατων")
                or ew(n, "τερατοσ") or ew(n, "τερατων")):
            return n - 4
        if n > 6 and ew(n, "τατογια"):
            return n - 3
        if n > 6 and ew(n, "γεγονοσ"):
            return n - 2
        if n > 5 and (ew(n, "φαγιου") or ew(n, "φαγιων") or ew(n, "σογιου")
                      or ew(n, "σογιων")):
            return n - 4
        if n > 5 and (ew(n, "σκαγια") or ew(n, "ολογια") or ew(n, "κρεατα")
                      or ew(n, "περατα") or ew(n, "τερατα")):
            return n - 3
        if n > 4 and (ew(n, "φαγια") or ew(n, "σογια") or ew(n, "φωτοσ")
                      or ew(n, "φωτων")):
            return n - 3
        if n > 4 and (ew(n, "κρεασ") or ew(n, "περασ") or ew(n, "τερασ")):
            return n - 2
        if n > 3 and ew(n, "φωτα"):
            return n - 2
        if n > 2 and ew(n, "φωσ"):
            return n - 1
        return n

    n = rule0(n)

    # rule1
    if n > 4 and (ew(n, "αδεσ") or ew(n, "αδων")):
        n -= 4
        if not (ew(n, "οκ") or ew(n, "μαμ") or ew(n, "μαν") or ew(n, "μπαμπ")
                or ew(n, "πατερ") or ew(n, "γιαγι") or ew(n, "νταντ")
                or ew(n, "κυρ") or ew(n, "θει") or ew(n, "πεθερ")):
            n += 2  # add back -αδ
    # rule2
    if n > 4 and (ew(n, "εδεσ") or ew(n, "εδων")):
        n -= 4
        if (ew(n, "οπ") or ew(n, "ιπ") or ew(n, "εμπ") or ew(n, "υπ")
                or ew(n, "γηπ") or ew(n, "δαπ") or ew(n, "κρασπ")
                or ew(n, "μιλ")):
            n += 2  # add back -εδ
    # rule3
    if n > 5 and (ew(n, "ουδεσ") or ew(n, "ουδων")):
        n -= 5
        if (ew(n, "αρκ") or ew(n, "καλιακ") or ew(n, "πεταλ") or ew(n, "λιχ")
                or ew(n, "πλεξ") or ew(n, "σκ") or ew(n, "σ") or ew(n, "φλ")
                or ew(n, "φρ") or ew(n, "βελ") or ew(n, "λουλ")
                or ew(n, "χν") or ew(n, "σπ") or ew(n, "τραγ")
                or ew(n, "φε")):
            n += 3  # add back -ουδ
    # rule4
    if n > 3 and (ew(n, "εωσ") or ew(n, "εων")):
        n -= 3
        if pre(n) in _EXC4:
            n += 1  # add back -ε
    # rule5
    if n > 2 and ew(n, "ια"):
        n -= 2
        if n and s[n - 1] in _VOWELS:
            n += 1  # add back -ι
    elif n > 3 and (ew(n, "ιου") or ew(n, "ιων")):
        n -= 3
        if n and s[n - 1] in _VOWELS:
            n += 1
    # rule6
    removed = False
    if n > 3 and (ew(n, "ικα") or ew(n, "ικο")):
        n -= 3
        removed = True
    elif n > 4 and (ew(n, "ικου") or ew(n, "ικων")):
        n -= 4
        removed = True
    if removed and ((n and s[n - 1] in _VOWELS) or pre(n) in _EXC6):
        n += 2  # add back -ικ
    # rule7
    if n == 5 and ew(n, "αγαμε"):
        n -= 1
    else:
        if n > 7 and ew(n, "ηθηκαμε"):
            n -= 7
        elif n > 6 and ew(n, "ουσαμε"):
            n -= 6
        elif n > 5 and (ew(n, "αγαμε") or ew(n, "ησαμε") or ew(n, "ηκαμε")):
            n -= 5
        if n > 3 and ew(n, "αμε"):
            n -= 3
            if pre(n) in _EXC7:
                n += 2  # add back -αμ
    # rule8 — the reference's && / || precedence again: the len guard binds
    # only to the first endsWith of each group
    removed = False
    if n > 8 and ew(n, "ιουντανε"):
        n -= 8
        removed = True
    elif (n > 7 and ew(n, "ιοντανε")) or ew(n, "ουντανε") or ew(n, "ηθηκανε"):
        n -= 7
        removed = True
    elif (n > 6 and ew(n, "ιοτανε")) or ew(n, "οντανε") or ew(n, "ουσανε"):
        n -= 6
        removed = True
    elif (n > 5 and ew(n, "αγανε")) or ew(n, "ησανε") or ew(n, "οτανε") \
            or ew(n, "ηκανε"):
        n -= 5
        removed = True
    if removed and pre(n) in _EXC8A:
        n += 4
        s[n - 4], s[n - 3], s[n - 2], s[n - 1] = "α", "γ", "α", "ν"
    if n > 3 and ew(n, "ανε"):
        n -= 3
        if (n and s[n - 1] in _VOWELS_NO_Y) or pre(n) in _EXC8B:
            n += 2  # add back -αν
    # rule9
    if n > 5 and ew(n, "ησετε"):
        n -= 5
    if n > 3 and ew(n, "ετε"):
        n -= 3
        if (pre(n) in _EXC9 or (n and s[n - 1] in _VOWELS_NO_Y)
                or ew(n, "οδ") or ew(n, "αιρ") or ew(n, "φορ")
                or ew(n, "ταθ") or ew(n, "διαθ") or ew(n, "σχ")
                or ew(n, "ενδ") or ew(n, "ευρ") or ew(n, "τιθ")
                or ew(n, "υπερθ") or ew(n, "ραθ") or ew(n, "ενθ")
                or ew(n, "ροθ") or ew(n, "σθ") or ew(n, "πυρ")
                or ew(n, "αιν") or ew(n, "συνδ") or ew(n, "συν")
                or ew(n, "συνθ") or ew(n, "χωρ") or ew(n, "πον")
                or ew(n, "βρ") or ew(n, "καθ") or ew(n, "ευθ")
                or ew(n, "εκθ") or ew(n, "νετ") or ew(n, "ρον")
                or ew(n, "αρκ") or ew(n, "βαρ") or ew(n, "βολ")
                or ew(n, "ωφελ")):
            n += 2  # add back -ετ
    # rule10
    if n > 5 and (ew(n, "οντασ") or ew(n, "ωντασ")):
        n -= 5
        if n == 3 and ew(n, "αρχ"):
            n += 3
            s[n - 3] = "ο"
        if ew(n, "κρε"):
            n += 3
            s[n - 3] = "ω"
    # rule11
    if n > 6 and ew(n, "ομαστε"):
        n -= 6
        if n == 2 and ew(n, "ον"):
            n += 5  # buffer still holds -ομαστ
    elif n > 7 and ew(n, "ιομαστε"):
        n -= 7
        if n == 2 and ew(n, "ον"):
            n += 5
            s[n - 5], s[n - 4], s[n - 3], s[n - 2], s[n - 1] = \
                "ο", "μ", "α", "σ", "τ"
    # rule12
    if n > 5 and ew(n, "ιεστε"):
        n -= 5
        if pre(n) in _EXC12A:
            n += 4  # add back -ιεστ
    if n > 4 and ew(n, "εστε"):
        n -= 4
        if pre(n) in _EXC12B:
            n += 3  # add back -εστ
    # rule13
    if n > 6 and ew(n, "ηθηκεσ"):
        n -= 6
    elif n > 5 and (ew(n, "ηθηκα") or ew(n, "ηθηκε")):
        n -= 5
    removed = False
    if n > 4 and ew(n, "ηκεσ"):
        n -= 4
        removed = True
    elif n > 3 and (ew(n, "ηκα") or ew(n, "ηκε")):
        n -= 3
        removed = True
    if removed and (pre(n) in _EXC13 or ew(n, "σκωλ") or ew(n, "σκουλ")
                    or ew(n, "ναρθ") or ew(n, "σφ") or ew(n, "οθ")
                    or ew(n, "πιθ")):
        n += 2  # add back -ηκ
    # rule14
    removed = False
    if n > 5 and ew(n, "ουσεσ"):
        n -= 5
        removed = True
    elif n > 4 and (ew(n, "ουσα") or ew(n, "ουσε")):
        n -= 4
        removed = True
    if removed and (pre(n) in _EXC14 or (n and s[n - 1] in _VOWELS)
                    or ew(n, "ποδαρ") or ew(n, "βλεπ") or ew(n, "πανταχ")
                    or ew(n, "φρυδ") or ew(n, "μαντιλ") or ew(n, "μαλλ")
                    or ew(n, "κυματ") or ew(n, "λαχ") or ew(n, "ληγ")
                    or ew(n, "φαγ") or ew(n, "ομ") or ew(n, "πρωτ")):
        n += 3  # add back -ουσ
    # rule15
    removed = False
    if n > 4 and ew(n, "αγεσ"):
        n -= 4
        removed = True
    elif n > 3 and (ew(n, "αγα") or ew(n, "αγε")):
        n -= 3
        removed = True
    if removed:
        cond1 = (pre(n) in _EXC15A or ew(n, "οφ") or ew(n, "πελ")
                 or ew(n, "χορτ") or ew(n, "λλ") or ew(n, "σφ")
                 or ew(n, "ρπ") or ew(n, "φρ") or ew(n, "πρ")
                 or ew(n, "λοχ") or ew(n, "σμην"))
        cond2 = pre(n) in _EXC15B or ew(n, "κολλ")
        if cond1 and not cond2:
            n += 2  # add back -αγ
    # rule16
    removed = False
    if n > 4 and ew(n, "ησου"):
        n -= 4
        removed = True
    elif n > 3 and (ew(n, "ησε") or ew(n, "ησα")):
        n -= 3
        removed = True
    if removed and pre(n) in _EXC16:
        n += 2  # add back -ησ
    # rule17
    if n > 4 and ew(n, "ηστε"):
        n -= 4
        if pre(n) in _EXC17:
            n += 3  # add back -ηστ
    # rule18
    removed = False
    if n > 6 and (ew(n, "ησουνε") or ew(n, "ηθουνε")):
        n -= 6
        removed = True
    elif n > 4 and ew(n, "ουνε"):
        n -= 4
        removed = True
    if removed and pre(n) in _EXC18:
        n += 3
        s[n - 3], s[n - 2], s[n - 1] = "ο", "υ", "ν"
    # rule19
    removed = False
    if n > 6 and (ew(n, "ησουμε") or ew(n, "ηθουμε")):
        n -= 6
        removed = True
    elif n > 4 and ew(n, "ουμε"):
        n -= 4
        removed = True
    if removed and pre(n) in _EXC19:
        n += 3
        s[n - 3], s[n - 2], s[n - 1] = "ο", "υ", "μ"
    # rule20
    if n > 5 and (ew(n, "ματων") or ew(n, "ματοσ")):
        n -= 3
    elif n > 4 and ew(n, "ματα"):
        n -= 2

    # rule21 — the long ending list, only when no short rule changed length
    if n == orig:
        n = _rule21(s, n)

    # rule22
    if ew(n, "εστερ") or ew(n, "εστατ"):
        n -= 5
    elif (ew(n, "οτερ") or ew(n, "οτατ") or ew(n, "υτερ") or ew(n, "υτατ")
            or ew(n, "ωτερ") or ew(n, "ωτατ")):
        n -= 4
    return pre(n)


_R21_GROUPS = (
    (9, 9, ("ιοντουσαν",)),
    (8, 8, ("ιομασταν", "ιοσασταν", "ιουμαστε", "οντουσαν")),
    (7, 7, ("ιεμαστε", "ιεσαστε", "ιομουνα", "ιοσαστε", "ιοσουνα",
            "ιουνται", "ιουνταν", "ηθηκατε", "ομασταν", "οσασταν",
            "ουμαστε")),
    (6, 6, ("ιομουν", "ιονταν", "ιοσουν", "ηθειτε", "ηθηκαν", "ομουνα",
            "οσαστε", "οσουνα", "ουνται", "ουνταν", "ουσατε")),
    (5, 5, ("αγατε", "ιεμαι", "ιεται", "ιεσαι", "ιοταν", "ιουμα", "ηθεισ",
            "ηθουν", "ηκατε", "ησατε", "ησουν", "ομουν", "ονται", "ονταν",
            "οσουν", "ουμαι", "ουσαν")),
    (4, 4, ("αγαν", "αμαι", "ασαι", "αται", "ειτε", "εσαι", "εται", "ηδεσ",
            "ηδων", "ηθει", "ηκαν", "ησαν", "ησει", "ησεσ", "ομαι",
            "οταν")),
    (3, 3, ("αει", "εισ", "ηθω", "ησω", "ουν", "ουσ")),
    (2, 2, ("αν", "ασ", "αω", "ει", "εσ", "ησ", "οι", "οσ", "ου", "υσ",
            "ων")),
)


def _rule21(s: list[str], n: int) -> int:
    word = "".join(s[:n])
    for guard, cut, sufs in _R21_GROUPS:
        if n > guard and word.endswith(sufs):
            return n - cut
    if n > 1 and s[n - 1] in _VOWELS:
        return n - 1
    return n


class GreekAnalyzer(EnglishAnalyzer):
    """StandardTokenizer → GreekLowerCase → Stop(el) → GreekStemFilter.

    The lowercase/fold step runs pre-tokenization (letter→letter, boundary
    safe); the stop+stem chain runs at vocabulary level via the shared
    remap machinery."""

    name = "greek"
    max_token_length = 255

    def filter_token(self, t: str) -> str | None:
        if t in GREEK_STOP_WORDS:
            return None
        return greek_stem(t)

    def tokenize_text(self, text: str) -> list[str]:
        return super().tokenize_text(greek_lower(text or ""))

    def tokenize_series(self, texts):
        return super().tokenize_series(texts.fillna("").map(greek_lower))

    def tokenize_ids(self, texts, with_positions: bool = False):
        return super().tokenize_ids(
            texts.fillna("").map(greek_lower), with_positions=with_positions)
