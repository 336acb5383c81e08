"""Vectorized analyzers — the tokenize/lowercase/stop chain of the reference.

Reference semantics (``core/analysis/standard/StandardAnalyzer.java:85-97``):
StandardTokenizer (UAX#29 word break) → LowerCaseFilter → StopFilter with an
EMPTY default stop set. Tokens longer than ``maxTokenLength`` (255 default,
``StandardAnalyzer.java:37``) are dropped by the tokenizer (they still bump the
position counter, ``StandardTokenizer.java:145-168``) and therefore do NOT
contribute to the field length used for norms.

We implement two analyzers, both as batch-vectorized pandas operations (no
per-row Python UDFs — these run inside Arrow ``mapInPandas`` batches):

- ``StandardAnalyzer``: UAX#29-compatible on the declared ASCII corpus
  alphabet: alphanumeric(+underscore ExtendNumLet) runs, with mid-token
  joiners per UAX#29 WB6-12 — ``'`` and ``.`` join alnum on both sides,
  ``:`` joins letters only, ``,`` joins digits only. Exact parity with the
  reference on any text restricted to ``[a-z A-Z 0-9]`` words and plain
  punctuation separators (which is what the test corpus declares); documented
  approximation outside that alphabet (full Unicode UAX#29 is out of scope).
- ``SimpleAnalyzer``: lowercase ``[a-z0-9]+`` runs. Trivially expressible in
  ANSI SQL (``regexp_split_to_array``-style), used for the DuckDB-checked
  oracle queries. Mirrors the spirit of Lucene's SimpleAnalyzer
  (letter-run tokenizer + lowercase).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.java:37

# UAX#29 word-break approximation (see module docstring), extended beyond
# ASCII to the two highest-frequency non-ASCII classes (VERDICT r2 next-#6):
# - Latin-1 Supplement letters U+00C0–U+00FF minus × (00D7) ÷ (00F7) join
#   word runs like ASCII letters (UAX#29 ALetter);
# - CJK unified ideographs U+4E00–U+9FFF tokenize ONE CHARACTER PER TOKEN,
#   the reference StandardTokenizer's IDEOGRAPHIC emission
#   (``StandardTokenizerImpl.jflex:161-200`` — Han has no word breaks, each
#   ideograph is its own token).
# - Hangul syllables U+AC00–U+D7A3 form RUN tokens ({HangulEx}+ →
#   HANGUL_TYPE, ``StandardTokenizerImpl.jflex:220-221``);
# - Katakana U+30A1–U+30FA, U+30FC–U+30FE form RUN tokens ({KatakanaEx}+ →
#   KATAKANA_TYPE, ``:223-224``);
# - Hiragana U+3041–U+3096, U+309D–U+309F tokenize ONE CHARACTER PER TOKEN
#   ({HiraganaEx} → HIRAGANA_TYPE, ``:279``), like Han ideographs.
# - Greek (U+0386–U+03CE letters) and Cyrillic (U+0400–U+045F — all Slavic
#   alphabets) are UAX#29 ALetter: they join word runs exactly like Latin
#   letters (cross-script runs form ONE token, per WB5 ALetter×ALetter);
#   lowercase is per-CODE-POINT Character.toLowerCase (LowerCaseFilter.java)
#   — NO final-sigma contextual mapping (Σ→σ always, unlike str.lower()).
#   Extended/historic Cyrillic U+0460+ and Greek archaic letters stay out of
#   scope (separators), documented in SURVEY §7.3.
# Base run: [A-Za-z0-9_ + latin-1/greek/cyrillic letters]+ ; joiners:
#   '  and .  : both-sided alnum (Single_Quote / MidNumLet, WB6-7 + WB11-12)
#   :         : letters both sides (MidLetter, WB6-7)
#   ,         : digits both sides (MidNum, WB11-12)
_LAT1 = "À-ÖØ-öø-ÿ"
_GREEK = "ΆΈ-ΊΌΎ-ΡΣ-ώ"
_CYR = "Ѐ-џ"
_WORD_CLS = f"A-Za-z0-9_{_LAT1}{_GREEK}{_CYR}"
_LETTER_CLS = f"A-Za-z{_LAT1}{_GREEK}{_CYR}"

# per-code-point lowercase for Greek/Cyrillic capitals (Character.toLowerCase
# semantics); applied via str.translate BEFORE str.lower() so Python's
# contextual final-sigma rule never fires
_GC_LOWER = {}
for _cp in range(0x391, 0x3AC):
    if _cp != 0x3A2:
        _GC_LOWER[_cp] = _cp + 0x20
for _u, _l in ((0x386, 0x3AC), (0x388, 0x3AD), (0x389, 0x3AE),
               (0x38A, 0x3AF), (0x38C, 0x3CC), (0x38E, 0x3CD),
               (0x38F, 0x3CE)):
    _GC_LOWER[_u] = _l
for _cp in range(0x400, 0x410):
    _GC_LOWER[_cp] = _cp + 0x50
for _cp in range(0x410, 0x430):
    _GC_LOWER[_cp] = _cp + 0x20
# UAX#29 WB4 Extend absorption (jflex ``ExtFmtZwj`` macros,
# ``StandardTokenizerImpl.jflex:85-95`` — ``X (Extend|Format|ZWJ)* → X``):
# word characters absorb the Combining Diacritical Marks block
# (U+0300–U+036F) plus the 3-byte Extend/Format chars — kana voicing marks
# U+3099/309A, ZWNJ U+200C, ZWJ U+200D; CJK chars absorb the 3-byte set
# (``HanEx``/``HiraganaEx``/``KatakanaEx``/``HangulEx``). Absorbed marks
# stay in the token; marks after a separator/joiner attach to it and drop.
# Other Extend-class chars (halfwidth voicing U+FF9E/FF9F, presentation
# selectors, marks-after-CJK from the U+0300 block) remain documented out
# (SURVEY §7.3).
_EXT = "\u0300-\u036f\u3099\u309a\u200c\u200d\uff9e\uff9f"
_EXT3 = "\u3099\u309a\u200c\u200d\uff9e\uff9f"
# SE-Asian Complex_Context (LineBreak=SA) ranges — Thai, Lao, Myanmar,
# Khmer letters + dependent vowels/tone marks (jflex ``ComplexContext =
# [:LineBreak=Complex_Context:]``, ``StandardTokenizerImpl.jflex:100``).
# A contiguous SA run — regardless of which SA scripts it mixes — is ONE
# token (``{ComplexContextEx}+ -> SOUTH_EAST_ASIAN_TYPE``, jflex ``:274``).
# Digits (U+0E50-59, 0ED0-D9, 1040-49, 1090-99, 17E0-E9) and section
# punctuation are LB=NU/BA, not SA, hence the holes. Tai/Cham/Javanese SA
# blocks and the Myanmar Extended blocks remain documented out (SURVEY §7.3).
_SEA_PAIRS = (
    (0x0E01, 0x0E3A), (0x0E40, 0x0E4E),                    # Thai
    (0x0E81, 0x0E82), (0x0E84, 0x0E84), (0x0E86, 0x0E8A),  # Lao
    (0x0E8C, 0x0EA3), (0x0EA5, 0x0EA5), (0x0EA7, 0x0EBD),
    (0x0EC0, 0x0EC4), (0x0EC6, 0x0EC6), (0x0EC8, 0x0ECD),
    (0x0EDC, 0x0EDF),
    (0x1000, 0x103F), (0x1050, 0x108F), (0x109A, 0x109D),  # Myanmar
    (0x1780, 0x17D3), (0x17D7, 0x17D7), (0x17DC, 0x17DD),  # Khmer
)
_SEA = "".join(chr(lo) + ("-" + chr(hi) if hi > lo else "")
               for lo, hi in _SEA_PAIRS)
_SEA_LOS = np.array([p[0] for p in _SEA_PAIRS], dtype=np.int32)
_SEA_HIS = np.array([p[1] for p in _SEA_PAIRS], dtype=np.int32)
_STANDARD_RE = re.compile(
    f"(?:[{_WORD_CLS}][{_EXT}]*)+"
    f"(?:(?:['.]|(?<=[{_LETTER_CLS}]):(?=[{_LETTER_CLS}])"
    f"|(?<=[0-9]),(?=[0-9]))(?:[{_WORD_CLS}][{_EXT}]*)+)*"
    f"|(?:[가-힣\u1100-\u11ff][{_EXT3}]*)+"    # Hangul syllable+jamo runs (HangulEx+)
    f"|(?:[ァ-ヺー-ヾ\uff66-\uff9d][{_EXT3}]*)+"  # Katakana runs incl. halfwidth (KatakanaEx+)
    f"|(?:[{_SEA}][{_EXT3}]*)+"  # SE-Asian Complex_Context (SA) runs
    f"|[一-鿿][{_EXT3}]*"         # Han: one ideograph per token (HanEx)
    f"|[ぁ-ゖゝ-ゟ][{_EXT3}]*"     # Hiragana: one char per token (HiraganaEx)
)
# a token must contain at least one letter or digit (pure "_" runs are not words)
_HAS_ALNUM_RE = re.compile(
    f"[A-Za-z0-9{_LAT1}{_GREEK}{_CYR}一-鿿가-힣ァ-ヺー-ヾぁ-ゖゝ-ゟ{_SEA}\uff66-\uff9d\u1100-\u11ff]")

_SIMPLE_RE = re.compile(r"[a-z0-9]+")


# ---------------------------------------------------------------------------
# Byte-level vectorized tokenizer core (the index-build hot path).
#
# Produces integer term codes + a sorted unique-term pool instead of one
# Python string per token — the object-churn-free representation that keeps
# 32 concurrent Arrow workers memory-bandwidth-friendly. Unique-term order is
# raw byte order (np.void memcmp), i.e. exactly Lucene's unsigned-UTF-8 term
# order (``core/index/TermsHashPerField.java:110-112``).
# ---------------------------------------------------------------------------

_BASE = np.zeros(256, dtype=bool)       # [A-Za-z0-9_] (post-lowercase: a-z0-9_)
_LETTER = np.zeros(256, dtype=bool)
_DIGIT = np.zeros(256, dtype=bool)
_STRICT = np.zeros(256, dtype=bool)     # [a-z0-9] — the "is a word" test
for _c in range(ord("a"), ord("z") + 1):
    _BASE[_c] = _LETTER[_c] = _STRICT[_c] = True
for _c in range(ord("0"), ord("9") + 1):
    _BASE[_c] = _DIGIT[_c] = _STRICT[_c] = True
_BASE[ord("_")] = True


def _encode_rows(texts: pd.Series):
    """texts → (byte buffer with NUL separators, per-row start offsets)."""
    enc = texts.fillna("").str.encode("utf-8")
    lens = enc.str.len().to_numpy(dtype=np.int64)
    joined = b"\x00".join(enc.tolist()) + b"\x00" if len(enc) else b""
    buf = np.frombuffer(joined, dtype=np.uint8).copy()
    row_starts = np.zeros(lens.size, dtype=np.int64)
    if lens.size > 1:
        row_starts[1:] = np.cumsum(lens + 1)[:-1]
    return buf, row_starts


class _Scratch:
    """Grow-only per-process scratch buffers for the tokenizer hot path.

    This sandbox (and any memory-overcommitted VM) refaults freed-then-
    reallocated pages at ~67µs/page — retaining and reusing buffers across
    calls keeps the steady-state fault count near zero (measured 5-10×
    end-to-end on 32 concurrent Arrow workers). Works with the
    MALLOC_*_THRESHOLD_ env set in ``session.get_spark``.
    """

    def __init__(self):
        self._bufs: dict = {}

    def get(self, name: str, n: int, dtype) -> np.ndarray:
        key = (name, np.dtype(dtype).str)
        arr = self._bufs.get(key)
        if arr is None or arr.size < n:
            arr = np.empty(int(n * 1.25) + 64, dtype=dtype)
            self._bufs[key] = arr
        return arr[:n]


_SCR = _Scratch()


def _shift_and_into(out, cond, left, right):
    """out[1:-1] |= cond[1:-1] & left[:-2] & right[2:] (joiner rule), via
    slice views with no temporaries beyond ``cond`` itself."""
    np.logical_and(cond[1:-1], left[:-2], out=cond[1:-1])
    np.logical_and(cond[1:-1], right[2:], out=cond[1:-1])
    np.logical_or(out[1:-1], cond[1:-1], out=out[1:-1])


def _tokenize_ids_bytes(texts: pd.Series, *, joiners: bool, max_token_length: int,
                        stopwords=None, with_positions: bool = False):
    """Shared byte-level tokenizer → (uniq_terms, codes, per_row_counts
    [, positions]).

    uniq_terms: object ndarray of unique tokens sorted in byte order;
    codes: int64 per kept token (index into uniq_terms), document order;
    per_row_counts: kept tokens per input row;
    positions (when requested): the Lucene token position of each kept token —
    the ordinal over ALL tokens of its row including dropped over-length
    tokens, which "are skipped but still increment the position"
    (``core/analysis/standard/StandardTokenizer.java:145-168``). Stopword
    removal likewise leaves position holes (``core/analysis/StopFilter.java``).
    All large intermediates live in reused scratch buffers (see ``_Scratch``).
    """
    n_rows = len(texts)
    empty = (np.array([], dtype=object), np.zeros(0, np.int64),
             np.zeros(n_rows, np.int64))
    if with_positions:
        empty = (*empty, np.zeros(0, np.int64))
    if n_rows == 0:
        return empty
    src, row_starts = _encode_rows(texts)
    B = src.size
    if B == 0:
        return empty
    buf = _SCR.get("buf", B, np.uint8)
    np.copyto(buf, src)
    del src
    # ASCII lowercase in place (byte-class tokens only, so this is
    # equivalent to str.lower() before tokenization)
    t1 = _SCR.get("t1", B, bool)
    t2 = _SCR.get("t2", B, bool)
    np.greater_equal(buf, 65, out=t1)
    np.less_equal(buf, 90, out=t2)
    np.logical_and(t1, t2, out=t1)
    np.add(buf, 32, out=buf, where=t1)

    # ---- Unicode step-up (joiners/StandardAnalyzer mode only):
    # Latin-1 Supplement letters (UTF-8 C3 page) lowercase + letter-class;
    # CJK ideographs + Hiragana one-token-per-character; Katakana + Hangul
    # syllables as run tokens (jflex rule refs at the _STANDARD_RE comment).
    # ASCII-only batches detect in one cheap pass and allocate nothing; the
    # non-ASCII masks route through the _Scratch pool like the rest of the
    # hot path (this VM refaults freed pages at ~67µs/page).
    lat_lead = lat_cont = None
    extra_s = extra_e = None  # non-base 3-byte-script token spans
    ext3b = None  # lead-byte mask of 3-byte Extend/Format chars (WB4)
    has_non_ascii = bool((buf >= 0x80).any())
    if joiners and B > 2 and has_non_ascii:
        c3 = _SCR.get("u_c3", B, bool)
        np.equal(buf, 0xC3, out=c3)
        if c3.any():
            # lowercase: C3 80–9E minus 97 (À–Þ minus ×) → +0x20
            up = _SCR.get("u_up", B, bool)
            np.greater_equal(buf, 0x80, out=up)
            np.less_equal(buf, 0x9E, out=t1)
            np.logical_and(up, t1, out=up)
            np.not_equal(buf, 0x97, out=t1)
            np.logical_and(up, t1, out=up)
            up[0] = False
            np.logical_and(up[1:], c3[:-1], out=up[1:])
            np.add(buf, 0x20, out=buf, where=up)
            # letter continuations post-lowercase: 9F (ß) + A0–BF minus B7
            # (à–ÿ minus ÷)
            cont = up  # reuse
            np.greater_equal(buf, 0xA0, out=cont)
            np.less_equal(buf, 0xBF, out=t1)
            np.logical_and(cont, t1, out=cont)
            np.not_equal(buf, 0xB7, out=t1)
            np.logical_and(cont, t1, out=cont)
            np.equal(buf, 0x9F, out=t1)
            np.logical_or(cont, t1, out=cont)
            lat_cont = _SCR.get("u_lc", B, bool)
            lat_cont[:] = False
            np.logical_and(c3[:-1], cont[1:], out=lat_cont[1:])
            lat_lead = _SCR.get("u_ll", B, bool)
            lat_lead[:] = False
            lat_lead[:-1] = lat_cont[1:]
        # Greek (UTF-8 CE/CF pages) + Cyrillic (D0/D1): 2-byte letters.
        # Per-code-point lowercase REWRITES the pair in place (the lead byte
        # can change: Ω CE A9 → ω CF 89, Я D0 AF → я D1 8F), then both bytes
        # join the letter class like Latin-1.
        gl = _SCR.get("u_gc", B, bool)
        np.greater_equal(buf, 0xCE, out=gl)
        np.less_equal(buf, 0xD1, out=t1)
        np.logical_and(gl, t1, out=gl)
        gl[-1] = False
        if gl.any():
            li = np.flatnonzero(gl)
            cont = buf[li + 1]
            ok = (cont & 0xC0) == 0x80
            cp = (((buf[li].astype(np.int32) & 0x1F) << 6)
                  | (cont.astype(np.int32) & 0x3F))
            greek = ((cp >= 0x386) & (cp <= 0x3CE)
                     & (cp != 0x387) & (cp != 0x38B)
                     & (cp != 0x38D) & (cp != 0x3A2))
            cyr = (cp >= 0x400) & (cp <= 0x45F)
            letter = ok & (greek | cyr)
            if letter.any():
                lo = cp.copy()
                lo[(cp >= 0x391) & (cp <= 0x3AB) & (cp != 0x3A2)] += 0x20
                for u_, l_ in ((0x386, 0x3AC), (0x388, 0x3AD),
                               (0x389, 0x3AE), (0x38A, 0x3AF),
                               (0x38C, 0x3CC), (0x38E, 0x3CD),
                               (0x38F, 0x3CE)):
                    lo[cp == u_] = l_
                lo[(cp >= 0x400) & (cp <= 0x40F)] += 0x50
                lo[(cp >= 0x410) & (cp <= 0x42F)] += 0x20
                chg = letter & (lo != cp)
                if chg.any():
                    ci = li[chg]
                    buf[ci] = (0xC0 | (lo[chg] >> 6)).astype(np.uint8)
                    buf[ci + 1] = (0x80 | (lo[chg] & 0x3F)).astype(np.uint8)
                if lat_lead is None:
                    lat_lead = _SCR.get("u_ll", B, bool)
                    lat_lead[:] = False
                    lat_cont = _SCR.get("u_lc", B, bool)
                    lat_cont[:] = False
                gli = li[letter]
                lat_lead[gli] = True
                lat_cont[gli + 1] = True
        e_lead = _SCR.get("u_el", B, bool)
        np.greater_equal(buf, 0xE0, out=e_lead)
        np.less_equal(buf, 0xEF, out=t1)
        np.logical_and(e_lead, t1, out=e_lead)
        if e_lead.any():
            li = np.flatnonzero(e_lead[:-2])
            cp = ((buf[li].astype(np.int32) & 0x0F) << 12) \
                | ((buf[li + 1].astype(np.int32) & 0x3F) << 6) \
                | (buf[li + 2].astype(np.int32) & 0x3F)
            valid = ((buf[li + 1] >= 0x80) & (buf[li + 1] <= 0xBF)
                     & (buf[li + 2] >= 0x80) & (buf[li + 2] <= 0xBF))
            # one char per token: Han ideographs + Hiragana
            singles = valid & (((cp >= 0x4E00) & (cp <= 0x9FFF))
                               | ((cp >= 0x3041) & (cp <= 0x3096))
                               | ((cp >= 0x309D) & (cp <= 0x309F)))
            # run tokens, per script (a Katakana run never joins a Hangul run)
            kata = valid & (((cp >= 0x30A1) & (cp <= 0x30FA))
                            | ((cp >= 0x30FC) & (cp <= 0x30FE))
                            | ((cp >= 0xFF66) & (cp <= 0xFF9D)))
            hang = valid & (((cp >= 0xAC00) & (cp <= 0xD7A3))
                            | ((cp >= 0x1100) & (cp <= 0x11FF)))
            # SE-Asian Complex_Context (Thai/Lao/Myanmar/Khmer): one token
            # per contiguous SA run (jflex ``{ComplexContextEx}+ →
            # SOUTH_EAST_ASIAN_TYPE``, ``StandardTokenizerImpl.jflex:100,
            # 274``); combining vowels/tone marks are themselves SA, so
            # they sit inside the run naturally. Range membership via one
            # searchsorted over the shared ``_SEA_PAIRS`` table (the same
            # table builds the regex-path class — parity by construction).
            ri = np.searchsorted(_SEA_LOS, cp, side="right") - 1
            sea = ri >= 0
            sea[sea] = cp[sea] <= _SEA_HIS[ri[sea]]
            sea &= valid
            # 3-byte Extend/Format chars (UAX#29 WB4 `X (Extend|Format|ZWJ)*
            # → X`, jflex ExtFmtZwj macros :85-95): kana voicing marks
            # U+3099/309A + ZWNJ U+200C / ZWJ U+200D. They glue LEFT — into
            # the preceding Han/Hiragana single, the enclosing Katakana/
            # Hangul run, or (below, via the mark-inheritance machinery) the
            # preceding word run. Orphans (after a separator) drop.
            vm = valid & ((cp == 0x3099) | (cp == 0x309A)
                          | (cp == 0x200C) | (cp == 0x200D)
                          | (cp == 0xFF9E) | (cp == 0xFF9F))
            if vm.any():
                ext3b = _SCR.get("u_e3b", B, bool)
                ext3b[:] = False
                ext3b[li[vm]] = True
            parts_s, parts_e = [], []
            if singles.any():
                ss = li[singles]
                ee = ss + 3
                if ext3b is not None:
                    # absorb trailing mark chains (HanEx / HiraganaEx)
                    while True:
                        m2 = (ee <= B - 3)
                        m2[m2] = ext3b[ee[m2]]
                        if not m2.any():
                            break
                        ee[m2] += 3
                parts_s.append(ss)
                parts_e.append(ee)
            for m in (kata, hang, sea):
                if not m.any():
                    continue
                if ext3b is None:
                    cs_ = li[m]
                    brk = np.flatnonzero(np.diff(cs_) != 3)
                    parts_s.append(cs_[np.concatenate([[0], brk + 1])])
                    parts_e.append(np.concatenate([cs_[brk], cs_[-1:]]) + 3)
                    continue
                # runs with absorbed marks: (Kata Ext*)+ — group contiguous
                # (member|mark) chars, then trim LEADING marks (they belong
                # to whatever precedes, or drop); mark-only groups vanish
                sel = m | vm
                cs_ = li[sel]
                base = m[sel]
                brk = np.flatnonzero(np.diff(cs_) != 3)
                gs = np.concatenate([[0], brk + 1])
                ge = np.concatenate([brk, [cs_.size - 1]])
                bidx = np.flatnonzero(base)
                if bidx.size == 0:
                    continue
                fi = np.searchsorted(bidx, gs)
                ok = fi < bidx.size
                ok[ok] = bidx[fi[ok]] <= ge[ok]
                if not ok.any():
                    continue
                parts_s.append(cs_[bidx[fi[ok]]])
                parts_e.append(cs_[ge[ok]] + 3)
            if parts_s:
                extra_s = np.concatenate(parts_s)
                extra_e = np.concatenate(parts_e)

    is_base = _SCR.get("is_base", B, bool)
    np.take(_BASE, buf, out=is_base)
    if lat_lead is not None:
        np.logical_or(is_base, lat_lead, out=is_base)
        np.logical_or(is_base, lat_cont, out=is_base)

    # UAX#29 WB4 Extend detection (Combining Diacritical Marks U+0300–U+036F
    # = UTF-8 CC 80–CD AF), computed BEFORE the joiner rules so marks can be
    # transparent on the left of '/.'-joins (mirroring the regex chain,
    # where the preceding word run has already consumed the marks). Scratch-
    # pooled; batches without CC/CD lead bytes pay two equality scans only.
    ext_sel = ext_prev = None
    if joiners and has_non_ascii and B > 1:
        lead = None
        np.equal(buf, 0xCC, out=t1)
        np.equal(buf, 0xCD, out=t2)
        np.logical_or(t1, t2, out=t2)
        if t2.any():
            nxt = _SCR.get("u_exn", B, np.uint8)
            nxt[:-1] = buf[1:]
            nxt[-1] = 0
            lead = _SCR.get("u_exl", B, bool)
            # CC + any continuation → U+0300–033F; CD + cont ≤ AF → U+0340–036F
            np.equal(buf, 0xCC, out=lead)
            np.logical_and(lead, (nxt & 0xC0) == 0x80, out=lead)
            np.equal(buf, 0xCD, out=t1)
            np.logical_and(t1, nxt >= 0x80, out=t1)
            np.logical_and(t1, nxt <= 0xAF, out=t1)
            np.logical_or(lead, t1, out=lead)
            if not lead.any():
                lead = None
        if lead is not None or ext3b is not None:
            # mark-byte mask: both bytes of each 2-byte combining mark +
            # all three bytes of each 3-byte Extend/Format char (kana
            # voicing / ZWNJ / ZWJ) — one shared inheritance pass
            extb = _SCR.get("u_exb", B, bool)
            if lead is not None:
                np.copyto(extb, lead)
                np.logical_or(extb[1:], lead[:-1], out=extb[1:])
            else:
                extb[:] = False
            if ext3b is not None:
                np.logical_or(extb, ext3b, out=extb)
                np.logical_or(extb[1:], ext3b[:-1], out=extb[1:])
                np.logical_or(extb[2:], ext3b[:-2], out=extb[2:])
            prev = _SCR.get("u_exp", B, np.int64)
            prev[:] = np.arange(B, dtype=np.int64)
            prev[extb] = -1
            np.maximum.accumulate(prev, out=prev)
            ext_sel = _SCR.get("u_exs", B, bool)
            np.copyto(ext_sel, extb)
            np.logical_and(ext_sel, prev >= 0, out=ext_sel)
            ext_prev = prev

    if joiners:
        tok = _SCR.get("tok", B, bool)
        np.copyto(tok, is_base)
        if B > 2:
            # ' and . join base|base; a mark run on the LEFT is transparent
            # (the regex word-run `(?:[w][ext]*)+` consumed it), on the
            # RIGHT it breaks the join (regex requires a word char directly
            # after the joiner)
            left = is_base
            if ext_sel is not None:
                left = _SCR.get("u_bf", B, bool)
                np.copyto(left, is_base)
                left[ext_sel] = is_base[ext_prev[ext_sel]]
            np.equal(buf, 39, out=t1)
            np.equal(buf, 46, out=t2)
            np.logical_or(t1, t2, out=t1)
            _shift_and_into(tok, t1, left, is_base)
            # : joins letter|letter
            cls = _SCR.get("cls", B, bool)
            np.take(_LETTER, buf, out=cls)
            if lat_lead is not None:
                np.logical_or(cls, lat_lead, out=cls)
                np.logical_or(cls, lat_cont, out=cls)
            np.equal(buf, 58, out=t1)
            _shift_and_into(tok, t1, cls, cls)
            # , joins digit|digit
            np.take(_DIGIT, buf, out=cls)
            np.equal(buf, 44, out=t1)
            _shift_and_into(tok, t1, cls, cls)
    else:
        tok = _SCR.get("tok", B, bool)
        np.take(_STRICT, buf, out=tok)

    if ext_sel is not None:
        # WB4 Extend absorption: both bytes of each mark inherit the
        # token-membership of the last non-mark byte before the chain —
        # marks after a word char stay in the token (the jflex
        # ``ALetterEx``/``NumericEx`` macros), marks after a separator or
        # unjoined punctuation attach to it and drop. ':'/',' lookarounds
        # see the mark byte itself (not a letter/digit) on EITHER side, so
        # marks break those joins exactly like the regex chain.
        tok[ext_sel] = tok[ext_prev[ext_sel]]

    # run starts/ends: tok[i] & ~tok[i-1] / tok[i] & ~tok[i+1]
    np.copyto(t1, tok)
    np.greater(tok[1:], tok[:-1], out=t1[1:])
    starts = np.flatnonzero(t1)
    if starts.size == 0 and extra_s is None:
        return empty
    np.copyto(t1, tok)
    np.greater(tok[:-1], tok[1:], out=t1[:-1])
    ends = np.flatnonzero(t1) + 1
    lens = ends - starts

    # keep: length cap (the >maxTokenLength drop rule) + ≥1 strict alnum char.
    # add.reduceat on bool acts as logical-OR per [start, next_start) span;
    # inter-token gaps contain no strict chars, so the span OR == token OR.
    # Latin-1 letter leads count as word characters (a pure-accent run like
    # "àé" is a word).
    strict = _SCR.get("strict", B, bool)
    np.take(_STRICT, buf, out=strict)
    if lat_lead is not None:
        np.logical_or(strict, lat_lead, out=strict)
    has_alnum = (np.add.reduceat(strict, starts) if starts.size
                 else np.zeros(0, dtype=np.int64))
    # maxTokenLength counts CHARACTERS (the reference contract), not UTF-8
    # bytes: subtract continuation bytes (0x80–0xBF) per token span
    if has_non_ascii and starts.size:
        cont_b = (buf & 0xC0) == 0x80
        cs = np.concatenate([[0], np.cumsum(cont_b)])
        char_lens = lens - (cs[ends] - cs[starts])
    else:
        char_lens = lens
    keep = (char_lens <= max_token_length) & (has_alnum > 0)
    is_word = has_alnum > 0  # pure-'_' runs are NOT words (UAX#29)

    if extra_s is not None:
        # merge the script-token stream (Han/Hiragana singles, Katakana/
        # Hangul runs) into the base-run stream in text order; the streams
        # are byte-disjoint (these scripts are never base-class). Run tokens
        # obey the same maxTokenLength-in-CHARS drop rule (span/3 chars).
        all_starts = np.concatenate([starts, extra_s])
        order = np.argsort(all_starts, kind="stable")
        starts = all_starts[order]
        ends = np.concatenate([ends, extra_e])[order]
        lens = ends - starts
        xkeep = (extra_e - extra_s) // 3 <= max_token_length
        keep = np.concatenate([keep, xkeep])[order]
        # script tokens are always real words
        is_word = np.concatenate(
            [is_word, np.ones(extra_s.size, dtype=bool)])[order]
        if starts.size == 0:
            return empty
    positions = None
    if with_positions:
        # ordinal over WORD tokens of the row (pre-length-filter): the
        # reference tokenizer never EMITS a pure-'_' run (not a word under
        # UAX#29), so dropping one must not leave a position hole — unlike
        # over-length drops and stopwords, which do (Lucene holes)
        row_ids_all = np.searchsorted(row_starts, starts, side="right") - 1
        words_before = np.cumsum(is_word) - is_word
        firsts = np.searchsorted(row_ids_all, np.arange(n_rows))
        base = words_before[np.minimum(firsts, starts.size - 1)]
        positions = words_before - base[row_ids_all]
        positions = positions[keep]
    starts, ends, lens = starts[keep], ends[keep], lens[keep]
    if starts.size == 0:
        return empty

    row_ids = np.searchsorted(row_starts, starts, side="right") - 1

    # dedup via fixed-width byte matrix + void view (memcmp order)
    maxlen = int(lens.max())
    n_tok = starts.size
    mat = _SCR.get("mat", n_tok * maxlen, np.uint8).reshape(n_tok, maxlen)
    mat[:] = 0
    for k in range(maxlen):
        m = lens > k
        mat[m, k] = buf[starts[m] + k]
    v = mat.view(f"|V{maxlen}").ravel()
    uniq_v, codes = np.unique(v, return_inverse=True)
    uniq = np.array(
        [bytes(x).rstrip(b"\x00").decode("utf-8") for x in uniq_v], dtype=object
    )
    codes = codes.astype(np.int64)

    if stopwords:
        stop_mask = np.array([t in stopwords for t in uniq], dtype=bool)
        if stop_mask.any():
            tok_keep = ~stop_mask[codes]
            codes, row_ids = codes[tok_keep], row_ids[tok_keep]
            if positions is not None:
                positions = positions[tok_keep]
            # re-densify codes over the surviving vocabulary
            remap = np.cumsum(~stop_mask) - 1
            uniq = uniq[~stop_mask]
            codes = remap[codes] if codes.size else codes

    per_row = np.bincount(row_ids, minlength=n_rows).astype(np.int64)
    if with_positions:
        return uniq, codes, per_row, positions
    return uniq, codes, per_row


@dataclass(frozen=True)
class StandardAnalyzer:
    """UAX#29-ish tokenizer + lowercase + (empty) stop set. See module doc."""

    max_token_length: int = MAX_TOKEN_LENGTH
    stopwords: frozenset = field(default_factory=frozenset)

    name = "standard"

    def tokenize_text(self, text: str) -> list[str]:
        if not text:
            return []
        toks = [
            t.translate(_GC_LOWER).lower()
            for t in _STANDARD_RE.findall(text)
            if len(t) <= self.max_token_length and _HAS_ALNUM_RE.search(t)
        ]
        if self.stopwords:
            toks = [t for t in toks if t not in self.stopwords]
        return toks

    def tokenize_series(self, texts: pd.Series) -> pd.Series:
        """Batch tokenize a pandas string Series → Series of list[str]."""
        s = texts.fillna("")
        out = s.str.findall(_STANDARD_RE)
        # lowercase + word filter run UNCONDITIONALLY — only the length cap
        # is config-dependent (a huge cap must not skip normalization)
        ml = self.max_token_length
        out = out.map(
            lambda ts: [
                t.translate(_GC_LOWER).lower() for t in ts
                if len(t) <= ml and _HAS_ALNUM_RE.search(t)
            ]
        )
        if self.stopwords:
            sw = self.stopwords
            out = out.map(lambda ts: [t for t in ts if t not in sw])
        return out

    def tokenize_ids(self, texts: pd.Series, with_positions: bool = False):
        """Byte-level vectorized tokenize → (uniq_terms, codes, per_row_counts
        [, positions]).

        Parity with the regex chain is asserted by tests on the declared
        corpus alphabet (ASCII words + plain punctuation); the byte rules ARE
        the regex rules: base [A-Za-z0-9_], ``'``/``.`` join base|base,
        ``:`` letters, ``,`` digits, >255-char tokens dropped, pure-``_``
        runs dropped.
        """
        return _tokenize_ids_bytes(
            texts, joiners=True, max_token_length=self.max_token_length,
            stopwords=self.stopwords or None, with_positions=with_positions,
        )

    def tokenize_flat(self, texts: pd.Series):
        """(flat_tokens: object ndarray, per_row_counts) via tokenize_ids."""
        uniq, codes, lens = self.tokenize_ids(texts)
        return uniq[codes] if codes.size else np.array([], dtype=object), lens


@dataclass(frozen=True)
class SimpleAnalyzer:
    """lowercase [a-z0-9]+ runs — ANSI-SQL-expressible; used by oracle queries.

    DuckDB equivalent of ``tokenize_series``:
    ``unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))``.
    Spark SQL equivalent (JVM-side, no UDF):
    ``explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0))``.
    """

    name = "simple"

    def tokenize_text(self, text: str) -> list[str]:
        if not text:
            return []
        return _SIMPLE_RE.findall(text.lower())

    def tokenize_series(self, texts: pd.Series) -> pd.Series:
        return texts.fillna("").str.lower().str.findall(_SIMPLE_RE)

    def tokenize_ids(self, texts: pd.Series, with_positions: bool = False):
        return _tokenize_ids_bytes(
            texts, joiners=False, max_token_length=1 << 40, stopwords=None,
            with_positions=with_positions,
        )

    def tokenize_flat(self, texts: pd.Series):
        uniq, codes, lens = self.tokenize_ids(texts)
        return uniq[codes] if codes.size else np.array([], dtype=object), lens


class _ExpandingAnalyzer:
    """Shared plumbing for analyzers that rewrite a delegate token stream
    through a per-doc ``_expand(tokens) -> tokens`` (shingles, edge/n-grams,
    CJK bigrams): one flat posIncr-1 stream, ids/flat via the common token-
    list encoder. Subclasses define ``_expand`` (and may override the
    tokenize_* pair when they need a different raw tokenizer)."""

    def _delegate(self):
        return StandardAnalyzer()

    def tokenize_text(self, text: str) -> list[str]:
        return self._expand(self._delegate().tokenize_text(text))

    def tokenize_series(self, texts: pd.Series) -> pd.Series:
        return self._delegate().tokenize_series(texts).map(self._expand)

    def tokenize_ids(self, texts: pd.Series, with_positions: bool = False):
        return _ids_from_token_lists(
            self.tokenize_series(texts), len(texts), with_positions)

    def tokenize_flat(self, texts: pd.Series):
        uniq, codes, lens = self.tokenize_ids(texts)
        return (uniq[codes] if codes.size else np.array([], dtype=object),
                lens)


@dataclass(frozen=True)
class ShingleAnalyzer(_ExpandingAnalyzer):
    """Word n-grams over the StandardAnalyzer stream — the
    ``ShingleAnalyzerWrapper(delegate, N, N, " ", outputUnigrams=false,
    outputUnigramsIfNoShingles=false, fillerToken=null)`` configuration
    (``analysis/common/src/java/org/apache/lucene/analysis/shingle/
    ShingleAnalyzerWrapper.java:36-70`` over ``ShingleFilter.java``): every
    emitted token is one space-joined shingle of exactly ``shingle_size``
    consecutive words, each at position increment 1 — a flat token stream,
    so the norm/position accounting matches the builder protocol with no
    overlap discounting needed. v1 contract (documented): min == max
    shingle size (Lucene's mixed-size output interleaves posIncr-0 tokens),
    unigrams off, and an empty stop set upstream → no "_" filler tokens
    (``ShingleFilter.java`` FILLER_TOKEN is stop-hole-only)."""

    shingle_size: int = 2

    name = "shingle"

    def _expand(self, toks):
        k = self.shingle_size
        return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


# UAX29URLEmailTokenizer (lite): URL and EMAIL token types kept whole
# (analysis/common/.../email/UAX29URLEmailTokenizerImpl.jflex:185,198 —
# URL = HTTP/FTP/FILE url grammar, EMAIL = localPart "@" domain), everything
# else the word chain. Lite scope (documented): http(s)/ftp schemes with
# host[:port][/path][?query][#fragment], RFC-lite email localpart/domain;
# the full jflex grammar's FILE urls, bracketed IPv6 hosts, and
# scheme-less www hosts are out. The SAME pattern string drives the engine
# (python re) and the gate oracle (DuckDB RE2) — alternation is
# leftmost-first in both, EMAIL before URL before words.
EMAIL_PATTERN = r"[a-z0-9._%+-]+@[a-z0-9-]+(?:\.[a-z0-9-]+)+"
# host structured like the email domain — label(.label)* — so a sentence-final
# 'http://x.com.' tokenizes as 'http://x.com' (the jflex DomainName grammar
# never emits a trailing/doubled dot; ADVICE r4 #1)
URL_PATTERN = (r"(?:https?|ftp)://[a-z0-9-]+(?:\.[a-z0-9-]+)*"  # host
               r"(?::[0-9]+)?"                                  # [:port]
               r"(?:/[a-z0-9._/%+&=~#?-]*)?")                   # [/path?query]
URL_EMAIL_PATTERN = f"{EMAIL_PATTERN}|{URL_PATTERN}|[a-z0-9]+"


class URLEmailAnalyzer:
    """UAX29URLEmailTokenizer (lite) + LowerCaseFilter: URLs and email
    addresses index as SINGLE exact terms — the web-corpus tokenization the
    reference ships for mailto:/href extraction — other text as plain
    lowercase words."""

    name = "url_email"
    max_token_length = 255

    _RE = re.compile(URL_EMAIL_PATTERN)

    def tokenize_text(self, text: str) -> list[str]:
        if not text:
            return []
        return [t for t in self._RE.findall(text.lower())
                if len(t) <= self.max_token_length]

    def tokenize_series(self, texts: pd.Series) -> pd.Series:
        return texts.fillna("").map(self.tokenize_text)

    def tokenize_ids(self, texts: pd.Series, with_positions: bool = False):
        return _ids_from_token_lists(
            self.tokenize_series(texts), len(texts), with_positions)

    def tokenize_flat(self, texts: pd.Series):
        uniq, codes, lens = self.tokenize_ids(texts)
        return (uniq[codes] if codes.size else np.array([], dtype=object),
                lens)


class CommonGramsAnalyzer(_ExpandingAnalyzer):
    """CommonGramsFilter over the StandardAnalyzer stream
    (``analysis/common/src/java/org/apache/lucene/analysis/commongrams/
    CommonGramsFilter.java:40-118``): every adjacent word pair where either
    side is a common word additionally emits the '_'-joined gram
    (GRAM_TYPE separator :49), in the reference's emission order (first
    word's unigram, then the gram, then the second word's unigram) — so
    high-frequency stopword phrases like 'the_table' become single exact
    terms and phrase queries over them become term lookups. Common set
    defaults to the classic English stop set, the reference's documented
    pairing (``CommonGramsFilterFactory``). Same flat posIncr-1 stream
    contract as the Shingle / EdgeNGram rows (the reference emits the gram
    at posIncr 0 and discounts it from norms; here positions are
    expanded-stream ordinals and dl counts grams — the gate's oracle
    re-derives exactly that accounting)."""

    name = "common_grams"

    def __init__(self, common_words=None):
        if common_words is None:
            from lucene_spark.analysis_en import ENGLISH_STOP_WORDS

            common_words = ENGLISH_STOP_WORDS
        self.common_words = frozenset(common_words)

    def _expand(self, toks):
        common, out = self.common_words, []
        for i, t in enumerate(toks):
            out.append(t)
            if i + 1 < len(toks) and (t in common or toks[i + 1] in common):
                out.append(f"{t}_{toks[i + 1]}")
        return out


@dataclass(frozen=True)
class EdgeNGramAnalyzer(_ExpandingAnalyzer):
    """Edge n-grams over the StandardAnalyzer stream — the autocomplete /
    search-as-you-type indexing chain (``analysis/common/src/java/org/
    apache/lucene/analysis/ngram/EdgeNGramTokenFilter.java:92-135``): each
    word emits its prefixes of length ``min_gram``..min(``max_gram``,
    len(word)); words shorter than ``min_gram`` drop
    (preserveOriginal=false, the reference default :34). With an
    edge-ngram index a user's prefix IS an exact term — prefix search
    becomes a single term lookup instead of a dictionary expansion.
    Documented divergence (same contract as the Shingle / CJK rows): the
    reference emits all grams of one word at the SAME position (first gram
    carries the increment, rest posIncr 0, :118-121) and discountOverlaps
    norms count only the originals; this flat stream emits every gram at
    posIncr 1, so positions are expanded-stream ordinals and dl counts all
    grams — the gate's oracle re-derives exactly that accounting."""

    min_gram: int = 2
    max_gram: int = 4

    name = "edge_ngram"

    def _expand(self, toks):
        mn, mx = self.min_gram, self.max_gram
        return [t[:g] for t in toks if len(t) >= mn
                for g in range(mn, min(mx, len(t)) + 1)]


@dataclass(frozen=True)
class NGramAnalyzer(_ExpandingAnalyzer):
    """All character n-grams over the StandardAnalyzer stream — the
    substring-search indexing chain (``analysis/common/src/java/org/apache/
    lucene/analysis/ngram/NGramTokenFilter.java:98-140``,
    preserveOriginal=false): each word emits, position-major (the
    reference's curPos-outer loop :122-131), its grams of length
    ``min_gram``..``max_gram`` at every start offset; words shorter than
    ``min_gram`` drop. With an n-gram index an infix fragment IS an exact
    term — `*frag*` wildcard search becomes a term lookup. Same
    flat-position divergence contract as the EdgeNGram / Shingle / CJK
    rows (reference emits all grams of one word at one position)."""

    min_gram: int = 3
    max_gram: int = 3

    name = "ngram"

    def _expand(self, toks):
        mn, mx = self.min_gram, self.max_gram
        out = []
        for t in toks:
            n = len(t)
            for i in range(n):  # position-major like the reference loop
                for g in range(mn, mx + 1):
                    if i + g > n:
                        break
                    out.append(t[i:i + g])
        return out


# CJK bigram tokenization: Han + Hiragana RUNS match as one unit so the
# bigrammer sees intra-run adjacency; all other script families keep the
# StandardAnalyzer shapes. Built from the same module constants.
_CJK_BI_RE = re.compile(
    f"(?:[{_WORD_CLS}][{_EXT}]*)+"
    f"(?:(?:['.]|(?<=[{_LETTER_CLS}]):(?=[{_LETTER_CLS}])"
    f"|(?<=[0-9]),(?=[0-9]))(?:[{_WORD_CLS}][{_EXT}]*)+)*"
    f"|[\u4e00-\u9fff\u3041-\u3096\u309d-\u309f]+"  # Han+Hiragana runs
    f"|(?:[\uac00-\ud7a3\u1100-\u11ff][{_EXT3}]*)+"
    f"|(?:[\u30a1-\u30fa\u30fc-\u30fe\uff66-\uff9d][{_EXT3}]*)+"
    f"|(?:[{_SEA}][{_EXT3}]*)+"
)
_CJK_BI_FIRST = re.compile("[\u4e00-\u9fff\u3041-\u3096\u309d-\u309f]")


@dataclass
class CJKBigramAnalyzer(_ExpandingAnalyzer):
    """CJKAnalyzer-lite: overlapping CJK character bigrams
    (``analysis/common/.../cjk/CJKBigramFilter.java:46-128`` with flags
    HAN|HIRAGANA, outputUnigrams=false): a run of n ≥ 2 Han/Hiragana chars
    emits its n−1 overlapping bigrams, each at position increment 1; a lone
    CJK char emits as a unigram (the filter's "single" fallback,
    ``CJKBigramFilter.java:279-291``); every other token passes through the
    standard chain unchanged. Documented divergences: bigrams form only
    INSIDE a contiguous run (the reference filter also joins CJK singles
    across separators because it tracks token types, not offsets — moot on
    real CJK text, which has no separators), Katakana/Hangul runs pass
    through unsplit (≡ flags without KATAKANA|HANGUL), and the reference
    CJKAnalyzer's English stop set is not applied (empty stop set, as the
    rest of this repo's chains)."""

    max_token_length: int = MAX_TOKEN_LENGTH

    name = "cjk_bigram"

    def _expand(self, toks):
        out = []
        for t in toks:
            if _CJK_BI_FIRST.match(t) and len(t) > 1:
                out.extend(t[i:i + 2] for i in range(len(t) - 1))
            else:
                out.append(t)
        return out

    def tokenize_text(self, text: str) -> list[str]:
        if not text:
            return []
        ml = self.max_token_length
        # length cap applies to EMITTED tokens (post-expansion): a long Han
        # run still yields its 2-char bigrams — the reference tokenizer
        # emits one token per ideograph, so run length never caps there
        toks = [
            t.translate(_GC_LOWER).lower()
            for t in _CJK_BI_RE.findall(text)
            if _HAS_ALNUM_RE.search(t)
        ]
        return [t for t in self._expand(toks) if len(t) <= ml]

    def tokenize_series(self, texts: pd.Series) -> pd.Series:
        s = texts.fillna("")
        out = s.str.findall(_CJK_BI_RE)
        ml = self.max_token_length
        return out.map(
            lambda ts: [
                t for t in self._expand([
                    t.translate(_GC_LOWER).lower() for t in ts
                    if _HAS_ALNUM_RE.search(t)
                ]) if len(t) <= ml
            ]
        )


def get_analyzer(name: str):
    if name == "standard":
        return StandardAnalyzer()
    if name == "simple":
        return SimpleAnalyzer()
    if name == "english":
        from lucene_spark.analysis_en import EnglishAnalyzer

        return EnglishAnalyzer()
    if name == "whitespace":
        return WhitespaceAnalyzer()
    if name == "letter":
        return LetterAnalyzer()
    if name == "stop":
        return stop_analyzer()
    if name == "keyword":
        return KeywordAnalyzer()
    if name == "standard_folding":
        return FoldingAnalyzer()
    if name == "icu_folding":
        from lucene_spark.analysis_icu import ICUFoldingAnalyzer

        return ICUFoldingAnalyzer()
    if name == "japanese":
        from lucene_spark.analysis_ja import JapaneseAnalyzer

        return JapaneseAnalyzer()
    if name == "korean":
        from lucene_spark.analysis_ko import KoreanAnalyzer

        return KoreanAnalyzer()
    if name == "smart_chinese":
        from lucene_spark.analysis_zh import ChineseAnalyzer

        return ChineseAnalyzer()
    if name == "thai":
        from lucene_spark.analysis_th import ThaiAnalyzer

        return ThaiAnalyzer()
    if name == "delimited_payload":
        return DelimitedPayloadAnalyzer()
    if name == "cjk_bigram":
        return CJKBigramAnalyzer()
    if name == "shingle":
        return ShingleAnalyzer()
    if name.startswith("shingle"):  # "shingle3", "shingle4", …
        return ShingleAnalyzer(shingle_size=int(name[len("shingle"):]))
    if name == "edge_ngram":
        return EdgeNGramAnalyzer()
    if name.startswith("edge_ngram"):  # "edge_ngram1_3", "edge_ngram2_5", …
        mn, mx = name[len("edge_ngram"):].split("_")
        return EdgeNGramAnalyzer(min_gram=int(mn), max_gram=int(mx))
    if name == "common_grams":
        return CommonGramsAnalyzer()
    if name == "url_email":
        return URLEmailAnalyzer()
    if name == "porter2":
        from lucene_spark.analysis_porter2 import Porter2Analyzer

        return Porter2Analyzer()
    if name == "danish":
        from lucene_spark.analysis_da import DanishAnalyzer

        return DanishAnalyzer()
    if name == "dutch":
        from lucene_spark.analysis_nl import DutchAnalyzer

        return DutchAnalyzer()
    if name == "kp":
        from lucene_spark.analysis_kp import KpAnalyzer

        return KpAnalyzer()
    if name == "lovins":
        from lucene_spark.analysis_lovins import LovinsAnalyzer

        return LovinsAnalyzer()
    if name == "nepali":
        from lucene_spark.analysis_ne import NepaliAnalyzer

        return NepaliAnalyzer()
    if name == "romanian":
        from lucene_spark.analysis_ro import RomanianAnalyzer

        return RomanianAnalyzer()
    if name == "finnish_snowball":
        from lucene_spark.analysis_fi import FinnishSnowballAnalyzer

        return FinnishSnowballAnalyzer()
    if name == "hungarian_snowball":
        from lucene_spark.analysis_hu import HungarianSnowballAnalyzer

        return HungarianSnowballAnalyzer()
    if name == "irish":
        from lucene_spark.analysis_ga import IrishAnalyzer

        return IrishAnalyzer()
    if name == "portuguese_snowball":
        from lucene_spark.analysis_pt import PortugueseSnowballAnalyzer

        return PortugueseSnowballAnalyzer()
    if name == "italian_snowball":
        from lucene_spark.analysis_it import ItalianSnowballAnalyzer

        return ItalianSnowballAnalyzer()
    if name == "spanish_snowball":
        from lucene_spark.analysis_es import SpanishSnowballAnalyzer

        return SpanishSnowballAnalyzer()
    if name == "russian_snowball":
        from lucene_spark.analysis_ru import RussianSnowballAnalyzer

        return RussianSnowballAnalyzer()
    if name == "german_snowball":
        from lucene_spark.analysis_de import GermanSnowballAnalyzer

        return GermanSnowballAnalyzer()
    if name == "german2_snowball":
        from lucene_spark.analysis_de import German2SnowballAnalyzer

        return German2SnowballAnalyzer()
    if name == "swedish_snowball":
        from lucene_spark.analysis_da import SwedishSnowballAnalyzer

        return SwedishSnowballAnalyzer()
    if name == "norwegian_snowball":
        from lucene_spark.analysis_da import NorwegianSnowballAnalyzer

        return NorwegianSnowballAnalyzer()
    if name == "greek":
        from lucene_spark.analysis_el import GreekAnalyzer

        return GreekAnalyzer()
    if name in ("indonesian", "indonesian_inflectional"):
        from lucene_spark.analysis_lang import LightStemAnalyzer

        return LightStemAnalyzer(lang=name)
    if name.endswith("_minimal"):  # german/french/english/portuguese_minimal
        from lucene_spark.analysis_lang import LightStemAnalyzer

        return LightStemAnalyzer(lang=name)
    if name.endswith("_light"):  # german/french/spanish/…_light stemmers
        from lucene_spark.analysis_lang import LightStemAnalyzer

        return LightStemAnalyzer(lang=name)
    if name.startswith("phonetic_"):  # phonetic_soundex / _refined_soundex / _metaphone
        from lucene_spark.analysis_phonetic import PhoneticAnalyzer

        return PhoneticAnalyzer(encoder=name[len("phonetic_"):])
    if name == "ngram":
        return NGramAnalyzer()
    if name.startswith("ngram"):  # "ngram2_3", "ngram4_4", …
        mn, mx = name[len("ngram"):].split("_")
        return NGramAnalyzer(min_gram=int(mn), max_gram=int(mx))
    raise ValueError(f"unknown analyzer: {name}")


def _ids_from_token_lists(tok_lists, n_rows: int, with_positions: bool,
                          stopwords=None):
    """Generic (uniq_terms, codes, per_row_counts[, positions]) encoder for
    analyzers whose tokenizers are regex/split-based rather than
    byte-vectorized (whitespace/letter/stop/keyword — secondary build
    paths; the headline standard/simple chains stay on
    ``_tokenize_ids_bytes``). Positions are ordinals over ALL tokens of the
    row, so stop-filtering leaves position holes
    (``core/analysis/StopFilter.java``). uniq_terms sorts in code-point
    order == unsigned UTF-8 byte order (UTF-8 preserves ordering)."""
    lens_all = np.fromiter((len(l) for l in tok_lists), dtype=np.int64,
                           count=n_rows)
    total = int(lens_all.sum())
    if total == 0:
        out = (np.array([], dtype=object), np.zeros(0, np.int64),
               np.zeros(n_rows, np.int64))
        return (*out, np.zeros(0, np.int64)) if with_positions else out
    flat = np.empty(total, dtype=object)
    i = 0
    for l in tok_lists:
        for t in l:
            flat[i] = t
            i += 1
    starts = np.concatenate([[0], np.cumsum(lens_all)[:-1]]).astype(np.int64)
    row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), lens_all)
    pos = np.arange(total, dtype=np.int64) - starts[row_ids]
    per_row = lens_all
    if stopwords:
        keep = np.fromiter((t not in stopwords for t in flat), dtype=bool,
                           count=total)
        flat, pos, row_ids = flat[keep], pos[keep], row_ids[keep]
        per_row = np.bincount(row_ids, minlength=n_rows).astype(np.int64)
    uniq, codes = np.unique(flat, return_inverse=True)
    if with_positions:
        return uniq, codes.astype(np.int64), per_row, pos
    return uniq, codes.astype(np.int64), per_row


def _chunk255(tokens: list) -> list:
    """CharTokenizer splits runs longer than 255 chars into 255-char tokens
    (``core/analysis/util/CharTokenizer.java`` maxTokenLen behavior —
    unlike StandardTokenizer, which DROPS over-length tokens)."""
    if all(len(t) <= MAX_TOKEN_LENGTH for t in tokens):
        return tokens
    out = []
    for t in tokens:
        if len(t) <= MAX_TOKEN_LENGTH:
            out.append(t)
        else:
            out.extend(t[i:i + MAX_TOKEN_LENGTH]
                       for i in range(0, len(t), MAX_TOKEN_LENGTH))
    return out


@dataclass(frozen=True)
class WhitespaceAnalyzer:
    """``core/analysis/core/WhitespaceAnalyzer.java``: split on Unicode
    whitespace, NO lowercase, 255-char run chunking. DuckDB equivalent:
    ``unnest(regexp_extract_all(text, '\\S+'))``."""

    name = "whitespace"

    def tokenize_text(self, text: str) -> list[str]:
        return _chunk255(text.split()) if text else []

    def tokenize_series(self, texts: pd.Series) -> pd.Series:
        return texts.fillna("").map(self.tokenize_text)

    def tokenize_ids(self, texts: pd.Series, with_positions: bool = False):
        return _ids_from_token_lists(
            self.tokenize_series(texts), len(texts), with_positions)

    def tokenize_flat(self, texts: pd.Series):
        uniq, codes, lens = self.tokenize_ids(texts)
        return (uniq[codes] if codes.size else np.array([], dtype=object),
                lens)


_LETTER_RE = re.compile(f"[{_LETTER_CLS}]+")


@dataclass(frozen=True)
class LetterAnalyzer:
    """The reference's ``SimpleAnalyzer`` (LetterTokenizer + lowercase,
    ``core/analysis/core/SimpleAnalyzer.java``) — named ``letter`` here
    because this engine's ``simple`` is the [a-z0-9]+ oracle contract.
    Letter class = the declared tokenizer alphabet (ASCII + Latin-1 +
    Greek + Cyrillic letters); digits are separators."""

    stopwords: frozenset = field(default_factory=frozenset)

    name = "letter"

    def tokenize_text(self, text: str) -> list[str]:
        if not text:
            return []
        toks = _chunk255([t.translate(_GC_LOWER).lower()
                          for t in _LETTER_RE.findall(text)])
        if self.stopwords:
            toks = [t for t in toks if t not in self.stopwords]
        return toks

    def _raw_lists(self, texts: pd.Series) -> pd.Series:
        return texts.fillna("").map(
            lambda s: _chunk255([t.translate(_GC_LOWER).lower()
                                 for t in _LETTER_RE.findall(s)]))

    def tokenize_series(self, texts: pd.Series) -> pd.Series:
        out = self._raw_lists(texts)
        if self.stopwords:
            sw = self.stopwords
            out = out.map(lambda ts: [t for t in ts if t not in sw])
        return out

    def tokenize_ids(self, texts: pd.Series, with_positions: bool = False):
        return _ids_from_token_lists(
            self._raw_lists(texts), len(texts), with_positions,
            stopwords=self.stopwords or None)

    def tokenize_flat(self, texts: pd.Series):
        uniq, codes, lens = self.tokenize_ids(texts)
        return (uniq[codes] if codes.size else np.array([], dtype=object),
                lens)


def stop_analyzer(stopwords=None) -> LetterAnalyzer:
    """``core/analysis/core/StopAnalyzer.java``: LetterTokenizer +
    lowercase + stop filter (position holes). Defaults to the English stop
    set (``EnglishAnalyzer.ENGLISH_STOP_WORDS_SET``)."""
    if stopwords is None:
        from lucene_spark.analysis_en import ENGLISH_STOP_WORDS

        stopwords = ENGLISH_STOP_WORDS
    a = LetterAnalyzer(stopwords=frozenset(stopwords))
    object.__setattr__(a, "name", "stop")
    return a


@dataclass(frozen=True)
class DelimitedPayloadAnalyzer:
    """Whitespace tokenizer + lowercase + delimited-payload extraction —
    the ``WhitespaceAnalyzer`` + ``DelimitedPayloadTokenFilter`` chain with
    the integer encoder
    (``analysis/common/.../payloads/DelimitedPayloadTokenFilter.java:28-40``
    + ``IntegerEncoder.java``): a token ``term|N`` indexes as ``term``
    carrying per-occurrence integer payload ``N``.

    Documented divergences: the term part is lowercased (our indexes store
    lowercased terms; the raw reference chain is case-preserving); a token
    WITHOUT the delimiter carries payload 0 (the reference leaves the
    payload attribute unset — identical under the min/max/sum/avg payload
    functions whenever every token is delimited, the chain's intended
    input); payloads clamp at 0 (varint storage is unsigned); an empty
    term part drops the token, leaving a position hole.
    """

    name = "delimited_payload"
    payloads = True
    delimiter = "|"

    def _split(self, tok: str) -> tuple[str, int]:
        i = tok.rfind(self.delimiter)
        if i < 0:
            return tok.lower(), 0
        try:
            p = int(tok[i + 1:])
        except ValueError:
            p = 0
        return tok[:i].lower(), max(p, 0)

    def tokenize_text(self, text: str) -> list[str]:
        if not text:
            return []
        out = []
        for tok in text.split():
            t, _ = self._split(tok)
            if t:
                out.append(t)
        return out

    def tokenize_series(self, texts: pd.Series) -> pd.Series:
        return texts.fillna("").map(self.tokenize_text)

    def tokenize_ids(self, texts: pd.Series, with_positions: bool = False):
        uniq, codes, per_row, _pos, _pay = self.tokenize_ids_payload(
            texts, with_positions=True)
        if with_positions:
            return uniq, codes, per_row, _pos
        return uniq, codes, per_row

    def tokenize_flat(self, texts: pd.Series):
        uniq, codes, lens = self.tokenize_ids(texts)
        return (uniq[codes] if codes.size else np.array([], dtype=object),
                lens)

    def tokenize_ids_payload(self, texts: pd.Series,
                             with_positions: bool = False):
        """(uniq_terms, codes, per_row_counts, positions|None, payloads) —
        the builder's payload inversion input. Positions are ordinals over
        ALL whitespace tokens of the row (dropped empty-term tokens leave
        holes, the StopFilter convention)."""
        n_rows = len(texts)
        pairs_per_row = [
            [self._split(tok) for tok in (t.split() if t else [])]
            for t in texts.fillna("")
        ]
        lens_all = np.fromiter((len(l) for l in pairs_per_row),
                               dtype=np.int64, count=n_rows)
        total = int(lens_all.sum())
        if total == 0:
            return (np.array([], dtype=object), np.zeros(0, np.int64),
                    np.zeros(n_rows, np.int64),
                    np.zeros(0, np.int64) if with_positions else None,
                    np.zeros(0, np.int64))
        flat = np.empty(total, dtype=object)
        pays = np.empty(total, dtype=np.int64)
        i = 0
        for pr in pairs_per_row:
            for t, p in pr:
                flat[i] = t
                pays[i] = p
                i += 1
        starts = np.concatenate([[0], np.cumsum(lens_all)[:-1]]).astype(
            np.int64)
        row_ids = np.repeat(np.arange(n_rows, dtype=np.int64), lens_all)
        pos = np.arange(total, dtype=np.int64) - starts[row_ids]
        keep = np.fromiter((t != "" for t in flat), dtype=bool, count=total)
        if not keep.all():
            flat, pays, pos, row_ids = (flat[keep], pays[keep], pos[keep],
                                        row_ids[keep])
        per_row = np.bincount(row_ids, minlength=n_rows).astype(np.int64)
        uniq, codes = np.unique(flat, return_inverse=True)
        return (uniq, codes.astype(np.int64), per_row,
                pos if with_positions else None, pays)


class KeywordAnalyzer:
    """``core/analysis/core/KeywordAnalyzer.java``: the entire input is ONE
    token, untouched (no lowercase, no length cap) — the analysis-chain
    twin of StringField."""

    name = "keyword"

    def tokenize_text(self, text: str) -> list[str]:
        return [text] if text else []

    def tokenize_series(self, texts: pd.Series) -> pd.Series:
        return texts.fillna("").map(lambda s: [s] if s else [])

    def tokenize_ids(self, texts: pd.Series, with_positions: bool = False):
        return _ids_from_token_lists(
            self.tokenize_series(texts), len(texts), with_positions)

    def tokenize_flat(self, texts: pd.Series):
        uniq, codes, lens = self.tokenize_ids(texts)
        return (uniq[codes] if codes.size else np.array([], dtype=object),
                lens)


# ---- ASCII folding (``analysis/common/.../ASCIIFoldingFilter.java``) ------
# Scope: Latin-1 Supplement + Latin Extended-A letters (U+00C0–U+017F), the
# blocks real-world European text hits; every letter in range folds (NFKD
# strip-combining for the decomposables + the reference's explicit specials
# for Æ/Ø/Þ/Đ/ß/ı/Ł/... which have no ASCII decomposition). ×/÷ are not
# letters and stay separators. Folding runs BEFORE tokenization — identical
# to the reference's post-tokenizer filter on this range, because every
# mapping is letters → letters (token boundaries cannot move).
_FOLD_SPECIALS = {
    0xDF: "ss", 0xC6: "AE", 0xE6: "ae", 0x152: "OE", 0x153: "oe",
    0xD8: "O", 0xF8: "o", 0x110: "D", 0x111: "d", 0xDE: "TH", 0xFE: "th",
    0xD0: "D", 0xF0: "d", 0x131: "i", 0x141: "L", 0x142: "l",
    0x126: "H", 0x127: "h", 0x138: "k", 0x166: "T", 0x167: "t",
    0x14A: "N", 0x14B: "n",
}

# mappings excluded because they are NOT boundary-safe pre-tokenization
# (ADVICE r3): U+0149 ŉ folds to "'n" in the reference filter — a leading
# apostrophe is a separator here, so pre-fold would MOVE a token boundary;
# the char stays unfolded (it is already outside this tokenizer's letter
# coverage, a documented Unicode approximation). Remaining caveat: ß → "ss"
# expansion can push a >127ß-char token over the 255 limit that the
# reference (which folds after its length check) would keep — measured zero
# such tokens in the corpus alphabet.
_FOLD_UNSAFE = {0x149}


def _build_fold_table() -> dict:
    import unicodedata

    tbl = dict(_FOLD_SPECIALS)
    for cp in range(0xC0, 0x180):
        if cp in tbl or cp in (0xD7, 0xF7) or cp in _FOLD_UNSAFE:
            continue
        folded = "".join(c for c in unicodedata.normalize("NFKD", chr(cp))
                         if ord(c) < 128)
        if folded:
            tbl[cp] = folded
    return tbl


_FOLD_TABLE = _build_fold_table()


@dataclass(frozen=True)
class FoldingAnalyzer:
    """StandardAnalyzer chain with ASCIIFoldingFilter semantics
    (``analysis/common/src/java/org/apache/lucene/analysis/miscellaneous/
    ASCIIFoldingFilter.java``, Latin-1 + Latin Extended-A scope): accents
    fold to their ASCII base letters, so 'Café' and 'cafe' index and query
    identically."""

    name = "standard_folding"

    @property
    def _base(self) -> StandardAnalyzer:
        return StandardAnalyzer()

    # Folding runs before tokenization so folded chars the byte tokenizer
    # does not cover as letters (Œ, Ł, …) still join their tokens; every
    # table mapping is letters → letters, so token boundaries cannot move
    # (the one boundary-unsafe reference mapping is excluded — see
    # _FOLD_UNSAFE).

    def tokenize_text(self, text: str) -> list[str]:
        return self._base.tokenize_text(
            text.translate(_FOLD_TABLE) if text else text)

    def tokenize_series(self, texts: pd.Series) -> pd.Series:
        return self._base.tokenize_series(
            texts.fillna("").str.translate(_FOLD_TABLE))

    def tokenize_ids(self, texts: pd.Series, with_positions: bool = False):
        return self._base.tokenize_ids(
            texts.fillna("").str.translate(_FOLD_TABLE),
            with_positions=with_positions)

    def tokenize_flat(self, texts: pd.Series):
        uniq, codes, lens = self.tokenize_ids(texts)
        return (uniq[codes] if codes.size else np.array([], dtype=object),
                lens)
