"""DuckDB oracle-SQL generators for the driver's correctness gate.

These produce ANSI-ish SQL (DuckDB dialect) that recomputes engine results
from the raw ``documents`` parquet with NO shared code: tokenization is
``regexp_extract_all(lower(text), '[a-z0-9]+')`` (the SimpleAnalyzer
contract), the SmallFloat norm lossiness is baked in as a 256-row VALUES
range map, and BM25 is emitted with explicit ``::FLOAT`` casts after every
binary op so DuckDB's true float32 arithmetic reproduces the engine's
float32 scores bit-for-bit (verified: DuckDB FLOAT ops do not promote to
DOUBLE; cast rounding is IEEE round-to-nearest, same as numpy/JVM).

The documents→transcripts derivation is one-doc-one-turn
(``corpus.transcripts_from_documents``): docID == row_number over
conv_id == row_number over doc_id, minus 1.
"""

from __future__ import annotations

import numpy as np

from lucene_spark.search import ast
from lucene_spark.smallfloat import byte4_to_int

K1 = "CAST(1.2 AS FLOAT)"
B = "CAST(0.75 AS FLOAT)"


def norm_map_values() -> str:
    """256-row (lo, hi) VALUES list: dl ∈ [lo, hi] → decoded length lo."""
    dec = byte4_to_int(np.arange(256))
    rows = []
    for c in range(256):
        lo = int(dec[c])
        hi = int(dec[c + 1] - 1) if c < 255 else 2**31 - 1
        rows.append(f"({lo},{hi})")
    return ",".join(rows)


def base_ctes(doc_where: str = "TRUE") -> str:
    """The shared CTE block; ``doc_where`` filters the source docs BEFORE
    docID assignment (row_number) — used by the delete+compact gate, whose
    surviving docs are renumbered densely exactly like a fresh build."""
    return tokenizer_ctes(doc_where)


def tokenizer_ctes(doc_where: str = "TRUE",
                   txt: str = "lower(coalesce(text, ''))",
                   tok_re: str = "[a-z0-9]+",
                   order_by: str = "printf('c%010d', doc_id)") -> str:
    """Base CTEs with a pluggable tokenization contract: ``txt`` is the
    normalized-text expression, ``tok_re`` the token regex — e.g. the
    WhitespaceAnalyzer contract is ``coalesce(text, '')`` + ``\\S+``
    (case-preserving, split on whitespace). ``order_by``: the docID
    assignment order — override for sorted indexes
    (``IndexWriterConfig.setIndexSort``: did = row_number over the index
    sort instead of the (conv_id, turn_idx) default)."""
    return f"""
docs0 AS (
  SELECT row_number() OVER (ORDER BY {order_by}) - 1 AS did,
         lang, source,
         {txt} AS t
  FROM documents
  WHERE {doc_where}
),
toks AS (
  SELECT did, unnest(regexp_extract_all(t, '{tok_re}')) AS term FROM docs0
),
tf AS (
  SELECT did, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
),
dls AS (
  SELECT did, len(regexp_extract_all(t, '{tok_re}'))::BIGINT AS dl FROM docs0
),
normmap(lo, hi) AS (VALUES {norm_map_values()}),
dlen AS (
  SELECT d.did, d.dl, m.lo AS dlen
  FROM dls d JOIN normmap m ON d.dl BETWEEN m.lo AND m.hi
),
fstats AS (
  SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sum_ttf,
         CAST(sum(dl) / count(*)::DOUBLE AS FLOAT) AS avgdl
  FROM dls
),
tstats AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1)
"""


BASE_CTES = base_ctes()


def term_stats_sql(limit: int = 100) -> str:
    return f"""
WITH {BASE_CTES}
SELECT term, df, ttf FROM (
  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS ttf
  FROM tf GROUP BY term
) ORDER BY df DESC, term ASC LIMIT {limit}
"""


def high_freq_ttf_sql(limit: int = 100) -> str:
    """HighFreqTerms with the ``-t`` flag (misc/HighFreqTerms.java:64,
    TotalTermFreqComparator :155-167): top terms by totalTermFreq, equal
    frequencies break toward the larger term (the keep-highest PQ compares
    termtext ascending)."""
    return f"""
WITH {BASE_CTES}
SELECT term, df, ttf FROM (
  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS ttf
  FROM tf GROUP BY term
) ORDER BY ttf DESC, term DESC LIMIT {limit}
"""


def dv_stats_sql(query, mod: int = 7) -> str:
    """DocValuesStats oracle: stats of dl over the match set, where docs
    with did % mod == 0 are MISSING from the value table (exercises the
    missing counter, DocValuesStats.java:31-66). The double mean/variance/
    stdev expressions are the engine's own shared SQL strings evaluated
    over exact BIGINT sums — identical bits on both sides."""
    from lucene_spark.search.searcher import DV_MEAN_SQL, DV_VARIANCE_SQL

    inner = bm25_topk_sql(query, 10**9)
    return f"""
WITH matched AS (SELECT doc_id FROM ({inner})),
docs1 AS (
  SELECT row_number() OVER (ORDER BY printf('c%010d', doc_id)) - 1 AS did,
         len(regexp_extract_all(lower(coalesce(text, '')),
                                '[a-z0-9]+'))::BIGINT AS dl
  FROM documents
),
vals AS (SELECT did, dl FROM docs1 WHERE did % {mod} != 0),
agg AS (
  SELECT count(*)::BIGINT AS n_matched,
         count(v.dl)::BIGINT AS count,
         min(v.dl)::BIGINT AS vmin, max(v.dl)::BIGINT AS vmax,
         sum(v.dl)::BIGINT AS vsum,
         sum(v.dl * v.dl)::BIGINT AS _ssq
  FROM matched m LEFT JOIN vals v ON v.did = m.doc_id
)
SELECT count, (n_matched - count)::BIGINT AS missing, vmin, vmax, vsum,
       {DV_MEAN_SQL} AS mean, {DV_VARIANCE_SQL} AS variance,
       sqrt({DV_VARIANCE_SQL}) AS stdev
FROM agg
"""


def group_heads_sql(query, group_col: str = "source") -> str:
    """AllGroupHeadsCollector oracle: the head doc of every group under
    (dl DESC, docID ASC) over the match set."""
    inner = bm25_topk_sql(query, 10**9)
    return f"""
WITH matched AS (SELECT doc_id FROM ({inner})),
meta AS (
  SELECT row_number() OVER (ORDER BY printf('c%010d', doc_id)) - 1 AS did,
         {group_col} AS grp,
         len(regexp_extract_all(lower(coalesce(text, '')),
                                '[a-z0-9]+'))::BIGINT AS dl
  FROM documents
),
ranked AS (
  SELECT g.grp, m.doc_id, g.dl AS v,
         row_number() OVER (PARTITION BY g.grp
                            ORDER BY g.dl DESC, m.doc_id ASC) AS rn
  FROM matched m JOIN meta g ON g.did = m.doc_id
)
SELECT grp AS {group_col}, doc_id, v FROM ranked WHERE rn = 1
ORDER BY {group_col}
"""


def group_distinct_sql(query, group_col: str = "source",
                       value_col: str = "lang") -> str:
    """DistinctValuesCollector oracle: per-group COUNT(DISTINCT value)
    over the match set."""
    inner = bm25_topk_sql(query, 10**9)
    return f"""
WITH matched AS (SELECT doc_id FROM ({inner})),
meta AS (
  SELECT row_number() OVER (ORDER BY printf('c%010d', doc_id)) - 1 AS did,
         {group_col} AS grp, {value_col} AS val
  FROM documents
)
SELECT grp AS {group_col}, count(DISTINCT val)::BIGINT AS n
FROM matched m JOIN meta g ON g.did = m.doc_id
GROUP BY grp ORDER BY {group_col}
"""


def dv_terms_count_sql(query, value_col: str, values) -> str:
    """DocValuesTermsQuery oracle: matched docs whose doc value ∈ set."""
    inner = bm25_topk_sql(query, 10**9)
    vs = ", ".join(f"'{v}'" for v in values)
    return f"""
WITH matched AS (SELECT doc_id FROM ({inner})),
meta AS (
  SELECT row_number() OVER (ORDER BY printf('c%010d', doc_id)) - 1 AS did,
         {value_col} AS val
  FROM documents
)
SELECT count(*)::BIGINT AS hits
FROM matched m JOIN meta g ON g.did = m.doc_id
WHERE g.val IN ({vs})
"""


def geo_box_count_sql(min_lat: float, max_lat: float,
                      min_lon: float, max_lon: float) -> str:
    """LatLonPoint.newBoxQuery hit count — the engine's own box predicate
    SQL (grid-snapped bounds as shared double literals)."""
    from lucene_spark.search.geo import box_condition_sql

    cond = box_condition_sql("lat", "lon", min_lat, max_lat,
                             min_lon, max_lon)
    return f"""
WITH {BASE_CTES},
{geo_cte()}
SELECT count(*)::BIGINT AS hits FROM geo WHERE {cond}
"""


def field_exists_count_sql(query) -> str:
    """FieldExistsQuery oracle for the gate's planted side table (every 7th
    docID absent, every 11th null): matched docs with a non-null value."""
    inner = bm25_topk_sql(query, 10**9)
    return f"""
SELECT count(*)::BIGINT AS hits FROM ({inner})
WHERE doc_id % 7 != 0 AND doc_id % 11 != 0
"""


def geo_polygon_count_sql(lats, lons) -> str:
    """LatLonPoint.newPolygonQuery hit count — the engine's own PNPOLY
    crossing-parity predicate SQL (shared double-literal vertices)."""
    from lucene_spark.search.geo import polygon_condition_sql

    cond = polygon_condition_sql("lat", "lon", lats, lons)
    return f"""
WITH {BASE_CTES},
{geo_cte()}
SELECT count(*)::BIGINT AS hits FROM geo WHERE {cond}
"""


def doc_norms_sql() -> str:
    """(doc_id, dl, dlen) for every doc — validates docID order + SmallFloat."""
    return f"""
WITH {BASE_CTES}
SELECT did AS doc_id, dl, dlen::BIGINT AS dlen FROM dlen ORDER BY did
"""


def english_ctes(stem_map: dict[str, str], stopwords,
                 token_re: str = "[a-z0-9]+", replacements=()) -> str:
    """Base CTEs with the EnglishAnalyzer chain: tokenize → stop-filter →
    Porter stem via a LITERAL vocabulary map.

    ``stem_map`` maps every raw corpus token (and query token) to its Porter
    stem. The map is generated from the pytest-golden-verified
    ``analysis_en.porter_stem`` (the algorithm itself is checked against
    published Porter vectors in ``tests/test_english.py``), then embedded
    here as a VALUES literal so the SQL recomputes index stats, norms, and
    BM25 **independently** from the raw parquet — the VERDICT r2 next-#4
    oracle construction. Unmapped tokens keep themselves (identity stem), so
    a vocabulary drift between map generation and the gate corpus surfaces
    as a value mismatch, never a silent pass. Field length (norms) counts
    post-stop tokens only, matching StopFilter semantics.
    """
    mvals = ",".join(
        f"('{k}','{v}')" for k, v in sorted(stem_map.items())
    )
    stoplist = ", ".join(f"'{w}'" for w in sorted(stopwords))
    t_expr = "lower(coalesce(text, ''))"
    for pat, rep in replacements:  # vocabulary injection (unicode gates)
        t_expr = f"regexp_replace({t_expr}, '{pat}', '{rep}', 'g')"
    return f"""
docs0 AS (
  SELECT row_number() OVER (ORDER BY printf('c%010d', doc_id)) - 1 AS did,
         lang, source,
         {t_expr} AS t
  FROM documents
),
stemmap(raw, st) AS (VALUES {mvals}),
rawtoks AS (
  SELECT did, unnest(regexp_extract_all(t, '{token_re}')) AS raw FROM docs0
),
toks AS (
  SELECT r.did, coalesce(m.st, r.raw) AS term
  FROM rawtoks r LEFT JOIN stemmap m ON m.raw = r.raw
  WHERE r.raw NOT IN ({stoplist})
),
tf AS (
  SELECT did, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
),
dls AS (
  SELECT d.did, coalesce(c.dl, 0)::BIGINT AS dl
  FROM docs0 d LEFT JOIN (
    SELECT did, count(*)::BIGINT AS dl FROM toks GROUP BY did
  ) c ON c.did = d.did
),
normmap(lo, hi) AS (VALUES {norm_map_values()}),
dlen AS (
  SELECT d.did, d.dl, m.lo AS dlen
  FROM dls d JOIN normmap m ON d.dl BETWEEN m.lo AND m.hi
),
fstats AS (
  SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sum_ttf,
         CAST(sum(dl) / count(*)::DOUBLE AS FLOAT) AS avgdl
  FROM dls
),
tstats AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1)
"""


def english_topk_sql(stemmed_terms, k: int, stem_map: dict[str, str],
                     stopwords, token_re: str = "[a-z0-9]+",
                     replacements=()) -> str:
    """Float32-bit-exact BM25 top-k over a token-mapped (stemmed / encoded)
    corpus for a flat SHOULD query of (already-mapped) terms."""
    qvals = ",".join(
        f"({i}, '{t}', CAST(1.0 AS FLOAT))"
        for i, t in enumerate(stemmed_terms)
    )
    return f"""
WITH {english_ctes(stem_map, stopwords, token_re, replacements)},
qterms(cid, term, boost) AS (VALUES {qvals}),
weights AS (
  SELECT q.cid, q.term,
         q.boost * CAST(ln(1 + ((SELECT n FROM fstats) - ts.df + 0.5)
                              / (ts.df + 0.5)) AS FLOAT) AS w
  FROM qterms q JOIN tstats ts ON ts.term = q.term
),
clause_scores AS (
  SELECT tf.did,
         w.w - w.w / (CAST(1 AS FLOAT)
                      + CAST(tf.tf AS FLOAT)
                        * (CAST(1 AS FLOAT)
                           / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                      + ({B} * CAST(d.dlen AS FLOAT))
                                        / (SELECT avgdl FROM fstats))))) AS s
  FROM tf
  JOIN weights w ON w.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
summed AS (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM clause_scores GROUP BY did
)
SELECT did AS doc_id, CAST(score AS DOUBLE) AS score
FROM summed
ORDER BY score DESC, did ASC
LIMIT {k}
"""


UNICODE_TOKEN_RE = "[a-z0-9à-öø-ÿ]+|[一-鿿]"
# Extend step-up: UAX#29 WB4 — combining diacritical marks (U+0300–U+036F)
# absorb into the word run after any word character and stay in the token
UNICODE_EXT_TOKEN_RE = "(?:[a-z0-9à-öø-ÿ][̀-ͯ]*)+|[一-鿿]"
# kana/Hangul step-up: Hangul + Katakana RUNS, Han + Hiragana single chars
# (StandardTokenizerImpl.jflex:220-224,278-279 typing rules)
UNICODE_KANA_TOKEN_RE = (
    "[a-z0-9à-öø-ÿ]+|[가-힣]+|[ァ-ヺー-ヾ]+|[一-鿿]|[ぁ-ゖゝ-ゟ]")
# Greek/Cyrillic step-up: ALetter classes join the latin run (cross-script
# single tokens); lowercase-only classes suffice — the gate corpus is
# lower()ed before vocabulary injection
UNICODE_GC_TOKEN_RE = (
    "[a-z0-9à-öø-ÿά-ώа-џ]+|[가-힣]+|[ァ-ヺー-ヾ]+|[一-鿿]|[ぁ-ゖゝ-ゟ]")
# Extend/Format step-up (UAX#29 WB4 ExtFmtZwj, jflex :85-95): kana voicing
# marks U+3099/309A + ZWNJ/ZWJ absorb into the preceding word char, kana/
# hangul run member, or han/hiragana single and stay in the token
_VM = "゙゚‌‍"
UNICODE_VM_TOKEN_RE = (
    f"(?:[a-z0-9à-öø-ÿ][{_VM}]*)+"
    f"|(?:[가-힣][{_VM}]*)+"
    f"|(?:[ァ-ヺー-ヾ][{_VM}]*)+"
    f"|[一-鿿][{_VM}]*"
    f"|[ぁ-ゖゝ-ゟ][{_VM}]*")
# SE-Asian Complex_Context step-up: Thai runs are ONE token per run
# ({ComplexContextEx}+ -> SOUTH_EAST_ASIAN_TYPE, jflex :100,274)
UNICODE_THAI_TOKEN_RE = (
    "[a-z0-9\u00e0-\u00f6\u00f8-\u00ff]+"
    "|[\u0e01-\u0e3a\u0e40-\u0e4e]+"
    "|[\uac00-\ud7a3]+|[\u30a1-\u30fa\u30fc-\u30fe]+"
    "|[\u4e00-\u9fff]|[\u3041-\u3096\u309d-\u309f]")


def unicode_sea_token_re() -> str:
    """Token regex for SE-Asian Complex_Context oracles: SA runs (built
    from the engine's own ``_SEA_PAIRS`` table, so the class is shared by
    construction) + the Latin word class."""
    from lucene_spark.analysis import _SEA

    return f"[a-z0-9\u00e0-\u00f6\u00f8-\u00ff]+|[{_SEA}]+"


def cjk_bigram_tokens_expr(t: str) -> str:
    """DuckDB LIST expression mirroring ``analysis.CJKBigramAnalyzer``:
    word tokens pass through; a Han run of n chars becomes its n−1
    overlapping bigrams (lone char stays a unigram)."""
    return (
        "flatten(list_transform("
        f"regexp_extract_all({t}, "
        "'[a-z0-9\u00e0-\u00f6\u00f8-\u00ff]+|[\u4e00-\u9fff]+'), "
        "w -> CASE WHEN NOT regexp_matches(w, '^[\u4e00-\u9fff]') THEN [w] "
        "WHEN length(w) = 1 THEN [w] "
        "ELSE list_transform(range(1, length(w)), "
        "i -> substr(w, i::INT, 2)) END))"
    )


def edge_ngram_tokens_expr(min_gram: int = 2, max_gram: int = 4):
    """Factory: DuckDB LIST expression mirroring
    ``analysis.EdgeNGramAnalyzer`` — each word expands to its prefixes of
    length min_gram..min(max_gram, len), shorter words drop."""
    def expr(t: str) -> str:
        return (
            f"flatten(list_transform("
            f"regexp_extract_all({t}, '[a-z0-9]+'), "
            f"w -> CASE WHEN length(w) < {int(min_gram)} "
            f"THEN []::VARCHAR[] "
            f"ELSE list_transform("
            f"range({int(min_gram)}, least(length(w), {int(max_gram)}) + 1),"
            f" g -> substr(w, 1, g::INT)) END))"
        )
    return expr


def ngram_tokens_expr(min_gram: int = 3, max_gram: int = 3):
    """Factory: DuckDB LIST expression mirroring ``analysis.NGramAnalyzer``
    — each word expands position-major to its grams of length
    min_gram..max_gram at every start offset; shorter words drop."""
    mn, mx = int(min_gram), int(max_gram)

    def expr(t: str) -> str:
        return (
            f"flatten(list_transform("
            f"regexp_extract_all({t}, '[a-z0-9]+'), "
            f"w -> flatten(list_transform(range(1, length(w) + 1), "
            f"i -> list_transform("
            f"range({mn}, least({mx}, length(w) - i + 1) + 1), "
            f"g -> substr(w, i::INT, g::INT))))))"
        )
    return expr


def common_grams_tokens_expr(common_words):
    """Factory: DuckDB LIST expression mirroring
    ``analysis.CommonGramsAnalyzer`` — each word emits itself, plus the
    '_'-joined bigram with the next word when either side is common."""
    words = ", ".join(f"'{w}'" for w in sorted(common_words))

    def expr(t: str) -> str:
        base = f"regexp_extract_all({t}, '[a-z0-9]+')"
        return (
            f"flatten(list_transform(range(1, len({base}) + 1), i -> "
            f"CASE WHEN i < len({base}) AND ("
            f"list_contains([{words}], {base}[i::INT]) OR "
            f"list_contains([{words}], {base}[(i+1)::INT])) "
            f"THEN [{base}[i::INT], "
            f"{base}[i::INT] || '_' || {base}[(i+1)::INT]] "
            f"ELSE [{base}[i::INT]] END))"
        )

    return expr


def unicode_topk_sql(terms, k: int, replacements,
                     token_re: str = UNICODE_TOKEN_RE,
                     txt_wrap=None, tokens_list_expr=None) -> str:
    """Float32-bit-exact BM25 top-k over a corpus derived by injecting
    non-ASCII vocabulary (VERDICT r2 next-#6 gate): ``replacements`` is a
    list of (token_regex, replacement) applied to the raw text, then the
    oracle tokenizes with the Unicode contract — Latin-1 letter runs join
    words, CJK ideographs are ONE TOKEN PER CHARACTER (``[一-鿿]`` =
    U+4E00–U+9FFF) — recomputing stats/norms/scores independently of the
    engine's byte-level tokenizer."""
    t_expr = "lower(coalesce(text, ''))"
    for pat, rep in replacements:
        t_expr = f"regexp_replace({t_expr}, '{pat}', '{rep}', 'g')"
    if txt_wrap is not None:
        # post-replacement text transform (e.g. the HTML-strip chain)
        t_expr = txt_wrap(t_expr)
    # token derivation: a regex match list by default; ``tokens_list_expr``
    # overrides with any DuckDB LIST-typed expression over the text (e.g.
    # the CJK bigram expansion)
    toks_list = (tokens_list_expr("t") if tokens_list_expr
                 else f"regexp_extract_all(t, '{token_re}')")
    qvals = ",".join(
        f"({i}, '{t}', CAST(1.0 AS FLOAT))" for i, t in enumerate(terms)
    )
    return f"""
WITH docs0 AS (
  SELECT row_number() OVER (ORDER BY printf('c%010d', doc_id)) - 1 AS did,
         {t_expr} AS t
  FROM documents
),
toks AS (
  SELECT did, unnest({toks_list}) AS term
  FROM docs0
),
tf AS (
  SELECT did, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
),
dls AS (
  SELECT did, len({toks_list})::BIGINT AS dl
  FROM docs0
),
normmap(lo, hi) AS (VALUES {norm_map_values()}),
dlen AS (
  SELECT d.did, d.dl, m.lo AS dlen
  FROM dls d JOIN normmap m ON d.dl BETWEEN m.lo AND m.hi
),
fstats AS (
  SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sum_ttf,
         CAST(sum(dl) / count(*)::DOUBLE AS FLOAT) AS avgdl
  FROM dls
),
tstats AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
qterms(cid, term, boost) AS (VALUES {qvals}),
weights AS (
  SELECT q.cid, q.term,
         q.boost * CAST(ln(1 + ((SELECT n FROM fstats) - ts.df + 0.5)
                              / (ts.df + 0.5)) AS FLOAT) AS w
  FROM qterms q JOIN tstats ts ON ts.term = q.term
),
clause_scores AS (
  SELECT tf.did,
         w.w - w.w / (CAST(1 AS FLOAT)
                      + CAST(tf.tf AS FLOAT)
                        * (CAST(1 AS FLOAT)
                           / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                      + ({B} * CAST(d.dlen AS FLOAT))
                                        / (SELECT avgdl FROM fstats))))) AS s
  FROM tf
  JOIN weights w ON w.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
summed AS (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM clause_scores GROUP BY did
)
SELECT did AS doc_id, CAST(score AS DOUBLE) AS score
FROM summed
ORDER BY score DESC, did ASC
LIMIT {k}
"""


def _clause_rows(q) -> list[tuple[str, str, float]]:
    """AST → [(term, occur, boost)] (normalized, v1 flat boolean)."""
    q = ast.normalize(q)
    if isinstance(q, ast.MatchNoDocsQuery):
        return []
    if isinstance(q, ast.TermQuery):
        return [(q.term, ast.SHOULD, q.boost)]
    return [(tq.term, occ, tq.boost) for occ, tq in q.clauses]


def kw_const_cte(boost: float = 1.0) -> str:
    """CTE computing the float32 constant a keyword-field term clause adds
    per matching doc in the GATE corpus, where the keyword value sits on
    EVERY doc (documents→transcripts sets role='user' on each turn): the
    keyword field's collection stats are docCount = sumTTF = N (single-
    valued, tf = 1), so df = N, avgdl = 1, dl = 1, freq = 1. Mirrors
    ``searcher.keyword_const_score``'s float32 op order under BM25."""
    return f"""
kwc AS (
  SELECT CAST(w - w / (CAST(1 AS FLOAT)
                       + CAST(CAST(1 AS FLOAT) * inv AS FLOAT)) AS FLOAT) AS c
  FROM (
    SELECT CAST(CAST({boost!r} AS FLOAT)
                * CAST(ln(1 + 0.5 / ((SELECT n FROM fstats) + 0.5)) AS FLOAT)
                AS FLOAT) AS w,
           CAST(CAST(1 AS FLOAT)
                / ({K1} * ((CAST(1 AS FLOAT) - {B})
                           + CAST({B} * CAST(1 AS FLOAT) AS FLOAT)
                             / CAST(1 AS FLOAT))) AS FLOAT) AS inv
  )
)"""


def bm25_topk_sql(query, k: int, doc_where: str = "TRUE",
                  kw_const: float | None = None,
                  base_cte: str | None = None) -> str:
    """Float32-bit-exact BM25 top-k SQL for a (flat boolean) query AST.

    Emits (doc_id, score DOUBLE) — score is the exact float32 widened to
    double. Order: score DESC, doc_id ASC, LIMIT k.

    ``kw_const``: when set, every matching doc additionally receives the
    :func:`kw_const_cte` keyword-clause constant (boost = the given value)
    inside the double sum — the `+role:user` clause of the keyword gates.
    """
    clauses = _clause_rows(query)
    scoring = [(t, b) for t, o, b in clauses if o in (ast.MUST, ast.SHOULD)]
    must = sorted({t for t, o, _ in clauses if o in (ast.MUST, ast.FILTER)})
    must_not = sorted({t for t, o, _ in clauses if o == ast.MUST_NOT})
    n_req = sum(1 for t, o, _ in clauses if o in (ast.MUST, ast.FILTER))
    has_should = any(o == ast.SHOULD for _, o, _ in clauses)

    if not clauses or (not scoring and not must):
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS score WHERE FALSE"
    if not scoring:
        # FILTER-only boolean: matches with score 0 (BooleanWeight on a
        # filter-only query — the engine and golden both return the match
        # set at 0.0), k smallest docIDs by the standard tie-break
        conds = [
            f"EXISTS (SELECT 1 FROM tf m WHERE m.did = d.did AND m.term = '{t}')"
            for t in must
        ] + [
            f"NOT EXISTS (SELECT 1 FROM tf x WHERE x.did = d.did AND x.term = '{t}')"
            for t in must_not
        ]
        return f"""
WITH {base_cte or base_ctes(doc_where)}
SELECT did AS doc_id, CAST(0.0 AS DOUBLE) AS score
FROM dls d WHERE {" AND ".join(conds)}
ORDER BY did ASC
LIMIT {k}
"""

    qvals = ",".join(
        f"({i}, '{t}', CAST({b!r} AS FLOAT))" for i, (t, b) in enumerate(scoring)
    )
    # idf in DOUBLE, single cast to FLOAT; weight = boost*idf in FLOAT
    # inv = 1f/(k1*((1-b) + (b*dlen)/avgdl)) with every op FLOAT
    # clause score = w - w/(1f + tf*inv); per-doc sum in DOUBLE → cast FLOAT
    clause_cte = f"""
qterms(cid, term, boost) AS (VALUES {qvals}),
weights AS (
  SELECT q.cid, q.term,
         q.boost * CAST(ln(1 + ((SELECT n FROM fstats) - ts.df + 0.5)
                              / (ts.df + 0.5)) AS FLOAT) AS w
  FROM qterms q JOIN tstats ts ON ts.term = q.term
),
clause_scores AS (
  SELECT tf.did,
         w.w - w.w / (CAST(1 AS FLOAT)
                      + CAST(tf.tf AS FLOAT)
                        * (CAST(1 AS FLOAT)
                           / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                      + ({B} * CAST(d.dlen AS FLOAT))
                                        / (SELECT avgdl FROM fstats))))) AS s
  FROM tf
  JOIN weights w ON w.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
summed AS (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)){{kw_add}} AS FLOAT) AS score
  FROM clause_scores GROUP BY did
)
"""
    if kw_const is not None:
        clause_cte = kw_const_cte(kw_const) + "," + clause_cte
        clause_cte = clause_cte.replace(
            "{kw_add}", " + CAST((SELECT c FROM kwc) AS DOUBLE)")
    else:
        clause_cte = clause_cte.replace("{kw_add}", "")
    conds = []
    for t in must:
        conds.append(
            f"EXISTS (SELECT 1 FROM tf m WHERE m.did = summed.did AND m.term = '{t}')"
        )
    for t in must_not:
        conds.append(
            f"NOT EXISTS (SELECT 1 FROM tf x WHERE x.did = summed.did AND x.term = '{t}')"
        )
    if n_req == 0 and has_should:
        pass  # every row in `summed` already matched ≥1 scoring clause
    msm = getattr(query, "min_should_match", 0)
    if msm == 1 and n_req:
        # required (a OR b) group: at least one SHOULD term must be present
        shoulds = sorted({t for t, o, _ in clauses if o == ast.SHOULD})
        anyof = " OR ".join(
            f"EXISTS (SELECT 1 FROM tf s WHERE s.did = summed.did "
            f"AND s.term = '{t}')" for t in shoulds)
        conds.append(f"({anyof})")
    elif msm > 1:
        # minShouldMatch > 1 (WANDScorer.java:37-38): a doc needs ≥ msm
        # matching SHOULD CLAUSES — duplicate clauses on one term each
        # count (the kernel's scnt sums per-clause), hence a clause-list
        # VALUES join, not a distinct-term count
        svals = ",".join(f"('{t}')" for t, o, _ in clauses if o == ast.SHOULD)
        if svals:
            conds.append(
                f"(SELECT count(*) FROM (VALUES {svals}) sq(term) "
                f"JOIN tf s ON s.term = sq.term AND s.did = summed.did) "
                f">= {msm}"
            )
        else:
            # msm > 1 with zero SHOULD clauses can never be satisfied
            # (matches the kernel returning empty); empty VALUES would be a
            # syntax error
            conds.append("FALSE")
    where = (" WHERE " + " AND ".join(conds)) if conds else ""
    return f"""
WITH {base_cte or base_ctes(doc_where)},{clause_cte}
SELECT did AS doc_id, CAST(score AS DOUBLE) AS score
FROM summed{where}
ORDER BY score DESC, did ASC
LIMIT {k}
"""


def payload_topk_sql(term: str, fn: str, k: int) -> str:
    """PayloadScoreQuery oracle (``queries/payloads/PayloadScoreQuery.java``
    + Max/Min/Average/Sum payload functions) for the driver's payload gate:
    the gate index derives token payloads as the 0-based token ordinal
    (``word|i``), so the payload of an occurrence at 1-based DuckDB position
    ``pos`` is exactly ``pos - 1`` — no delimiter parsing needed. score =
    f32(fn over the doc's occurrence payloads); int payloads this small are
    exact in float32, so the fold order does not matter."""
    agg = {"max": "max(pos - 1)", "min": "min(pos - 1)",
           "sum": "sum(pos - 1)",
           "avg": "CAST(sum(pos - 1) AS FLOAT) / CAST(count(*) AS FLOAT)"}[fn]
    return f"""
WITH {BASE_CTES},{_TOKSP_CTE}
SELECT did AS doc_id,
       CAST(CAST(({agg}) AS FLOAT) AS DOUBLE) AS score
FROM toksp
WHERE term = '{term}'
GROUP BY did
ORDER BY score DESC, did ASC
LIMIT {k}
"""


def payload_check_count_sql(term: str, value: int, op: str) -> str:
    """SpanPayloadCheckQuery oracle (single-term span, INT payloads): docs
    with some occurrence whose payload (= 0-based token ordinal in the
    payload gate index) satisfies the comparison."""
    sql_op = {"eq": "=", "gt": ">", "gte": ">=", "lt": "<", "lte": "<="}[op]
    return f"""
WITH {BASE_CTES},{_TOKSP_CTE}
SELECT count(DISTINCT did)::BIGINT AS hits
FROM toksp
WHERE term = '{term}' AND pos - 1 {sql_op} {value}
"""


def _mt_term_cond(q) -> str:
    """SQL predicate over column ``term`` matching a MultiTermQuery's
    expansion (prefix/wildcard/range/set — the CONSTANT_SCORE rewrite
    shapes the nested oracle models; fuzzy/regexp leaves stay engine+pytest
    only)."""

    def esc_like(s: str) -> str:
        return s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")

    if q.kind == "prefix":
        return f"term LIKE '{esc_like(q.value)}%' ESCAPE '\\'"
    if q.kind == "wildcard":
        pat = esc_like(q.value).replace("*", "%").replace("?", "_")
        return f"term LIKE '{pat}' ESCAPE '\\'"
    if q.kind == "range":
        parts = []
        if q.lower is not None:
            parts.append(f"term >{'=' if q.include_lower else ''} '{q.lower}'")
        if q.upper is not None:
            parts.append(f"term <{'=' if q.include_upper else ''} '{q.upper}'")
        return " AND ".join(parts) or "TRUE"
    if q.kind == "set":
        vals = ", ".join(f"'{t}'" for t in q.terms)
        return f"term IN ({vals})" if vals else "FALSE"
    raise NotImplementedError(
        f"nested oracle: unsupported multiterm kind {q.kind!r}")


def nested_topk_sql(query, k: int, doc_where: str = "TRUE") -> str:
    """Float32-bit-exact BM25 top-k SQL for an ARBITRARILY NESTED boolean
    tree of term, phrase (exact), constant-score multiterm, and match-all
    clauses (``Boolean2ScorerSupplier`` composition — the engine's
    recursive mixed kernel).

    Per-node semantics (matching ``phrase._eval_boolean``): a doc matches a
    node iff every MUST/FILTER clause matches ∧ no MUST_NOT clause matches ∧
    (required clauses present ? SHOULD-count ≥ msm (when msm>0)
    : SHOULD-count ≥ max(1, msm)); node score = float32(Σ_double float32
    matching scoring-clause scores) — an inner node's float32 result is one
    float input to the outer double sum, like each Lucene Scorer returning
    float.
    """
    q = ast.normalize(query)
    if isinstance(q, (ast.MatchNoDocsQuery,)):
        return ("SELECT CAST(NULL AS BIGINT) AS doc_id, "
                "CAST(NULL AS DOUBLE) AS score WHERE FALSE")
    if isinstance(q, ast.TermQuery):
        q = ast.BooleanQuery(((ast.SHOULD, q),))

    leaves: list[tuple[str, float]] = []  # (term, boost) per scoring leaf

    phrase_ctes: list[str] = []

    def collect(bq):
        for occ, sub in bq.clauses:
            if isinstance(sub, ast.BooleanQuery):
                collect(sub)
            elif isinstance(sub, ast.TermQuery):
                if occ in (ast.MUST, ast.SHOULD):
                    leaves.append((sub.term, sub.boost))
            elif isinstance(sub, ast.PhraseQuery):
                if sub.slop:
                    raise NotImplementedError(
                        "nested oracle models exact phrases only (sloppy "
                        "phrase leaves: engine + sloppy_pair oracles)")
                phrase_ctes.append(
                    _phrase_freq_cte(f"nph{len(phrase_ctes)}", sub.terms))
            elif isinstance(sub, (ast.MatchAllDocsQuery, ast.MultiTermQuery,
                                  ast.SynonymQuery)):
                pass  # rendered inline in node_sql
            else:
                raise NotImplementedError(
                    "nested oracle supports term / exact-phrase / multiterm"
                    " / synonym / match-all leaves only")

    collect(q)
    # no scoring leaves (FILTER/MUST_NOT-only trees): an empty VALUES list
    # is a syntax error — emit one never-matching dummy row instead (cid -1
    # is never referenced by any node)
    qvals = ",".join(
        f"({i}, '{t}', CAST({b!r} AS FLOAT))"
        for i, (t, b) in enumerate(leaves)
    ) or "(-1, '', CAST(0.0 AS FLOAT))"

    counter = iter(range(len(leaves))) if leaves else iter(())
    ph_counter = iter(range(len(phrase_ctes)))

    def node_sql(bq) -> str:
        """SQL relation (did, s FLOAT) of docs matching this node."""
        sel_parts, neg_parts = [], []
        n_req = 0
        n_should = 0
        for ci, (occ, sub) in enumerate(bq.clauses):
            if isinstance(sub, ast.MatchAllDocsQuery):
                # MatchAllDocsQuery leaf (SimpleQueryParser NOT wrapper):
                # every doc matches at constant f32(boost) — docs0 covers
                # ALL docs, including zero-token ones
                b = float(np.float32(sub.boost))
                rel = (f"SELECT did, CAST({b!r} AS FLOAT) AS s "
                       f"FROM docs0")
            elif isinstance(sub, ast.PhraseQuery):
                # exact-phrase leaf: BM25 with summed-idf pseudo-term weight
                # and tf = phrase frequency (PhraseWeight — same contract as
                # bm25_mixed_topk_sql)
                name = f"nph{next(ph_counter)}"
                if occ in (ast.MUST, ast.SHOULD):
                    w = _clause_weight(sub.terms, sub.boost)
                    rel = (f"SELECT p.did, ({w}) - ({w}) / "
                           f"(CAST(1 AS FLOAT) + CAST(p.freq AS FLOAT)"
                           f" * {_INV}) AS s"
                           f" FROM {name} p JOIN dlen d ON d.did = p.did")
                else:
                    rel = f"SELECT did, CAST(0 AS FLOAT) AS s FROM {name}"
            elif isinstance(sub, ast.SynonymQuery):
                # SynonymQuery leaf: tf summed across members, one BM25
                # score with blended df = max over PRESENT members
                # (SynonymQuery.java:205-222; absent members have no tf /
                # tstats rows, so they drop from both sum and max like the
                # engine's present-filter)
                tl = ",".join(f"'{t}'" for t in dict.fromkeys(sub.terms))
                b = float(np.float32(sub.boost))
                w = (f"(CAST({b!r} AS FLOAT) * CAST(ln(1 + "
                     f"((SELECT n FROM fstats) - mxdf + 0.5) / (mxdf + 0.5))"
                     f" AS FLOAT))")
                if occ in (ast.MUST, ast.SHOULD):
                    rel = (
                        f"SELECT sy.did, ({w}) - ({w}) / "
                        f"(CAST(1 AS FLOAT) + CAST(sy.tfsum AS FLOAT)"
                        f" * {_INV}) AS s "
                        f"FROM (SELECT did, sum(tf)::BIGINT AS tfsum "
                        f"FROM tf WHERE term IN ({tl}) GROUP BY did) sy "
                        f"CROSS JOIN (SELECT max(df) AS mxdf FROM tstats "
                        f"WHERE term IN ({tl})) mx "
                        f"JOIN dlen d ON d.did = sy.did")
                else:
                    rel = (f"SELECT DISTINCT did, CAST(0 AS FLOAT) AS s "
                           f"FROM tf WHERE term IN ({tl})")
            elif isinstance(sub, ast.MultiTermQuery):
                # CONSTANT_SCORE rewrite: union doc set at f32(boost)
                b = float(np.float32(sub.boost))
                rel = (f"SELECT DISTINCT did, CAST({b!r} AS FLOAT) AS s "
                       f"FROM tf WHERE {_mt_term_cond(sub)}")
            elif isinstance(sub, ast.TermQuery):
                if occ in (ast.MUST, ast.SHOULD):
                    cid = next(counter)
                    rel = f"SELECT did, s FROM cs WHERE cid = {cid}"
                else:
                    rel = (f"SELECT did, CAST(0 AS FLOAT) AS s FROM tf "
                           f"WHERE term = '{sub.term}'")
            else:  # nested BooleanQuery
                rel = f"SELECT did, s FROM ({node_sql(sub)}) AS x{ci}"
            if occ == ast.MUST_NOT:
                neg_parts.append(f"SELECT did FROM ({rel}) AS nn{ci}")
                continue
            if occ in (ast.MUST, ast.FILTER):
                n_req += 1
            else:
                n_should += 1
            scoring = "TRUE" if occ in (ast.MUST, ast.SHOULD) else "FALSE"
            required = "TRUE" if occ in (ast.MUST, ast.FILTER) else "FALSE"
            sel_parts.append(
                f"SELECT did, s, {ci} AS cl, {scoring} AS scoring, "
                f"{required} AS required FROM ({rel}) AS c{ci}"
            )
        union = "\nUNION ALL\n".join(sel_parts)
        not_in = ""
        if neg_parts:
            negs = "\nUNION ALL\n".join(neg_parts)
            not_in = f"\nWHERE did NOT IN (SELECT did FROM ({negs}) AS neg)"
        msm = bq.min_should_match
        havings = [
            f"count(DISTINCT CASE WHEN required THEN cl END) = {n_req}"
        ]
        if n_req == 0 or msm > 0:
            need = max(1, msm) if n_req == 0 else msm
            havings.append(
                f"count(DISTINCT CASE WHEN NOT required THEN cl END) "
                f">= {need}"
            )
        having = " AND ".join(havings)
        return f"""
SELECT did,
       CAST(SUM(CASE WHEN scoring THEN CAST(s AS DOUBLE)
                     ELSE CAST(0 AS DOUBLE) END) AS FLOAT) AS s
FROM ({union}) AS u{not_in}
GROUP BY did
HAVING {having}"""

    root = node_sql(q)
    extra = ""
    if phrase_ctes:
        extra = "," + ",".join([TOKSP] + phrase_ctes)
    return f"""
WITH {base_ctes(doc_where)}{extra},
qterms(cid, term, boost) AS (VALUES {qvals}),
weights AS (
  SELECT q.cid, q.term,
         q.boost * CAST(ln(1 + ((SELECT n FROM fstats) - ts.df + 0.5)
                              / (ts.df + 0.5)) AS FLOAT) AS w
  FROM qterms q JOIN tstats ts ON ts.term = q.term
),
cs AS (
  SELECT tf.did, w.cid,
         w.w - w.w / (CAST(1 AS FLOAT)
                      + CAST(tf.tf AS FLOAT)
                        * (CAST(1 AS FLOAT)
                           / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                      + ({B} * CAST(d.dlen AS FLOAT))
                                        / (SELECT avgdl FROM fstats))))) AS s
  FROM tf
  JOIN weights w ON w.term = tf.term
  JOIN dlen d ON d.did = tf.did
)
SELECT did AS doc_id, CAST(s AS DOUBLE) AS score
FROM ({root}) AS rootq
ORDER BY score DESC, did ASC
LIMIT {k}
"""


def covering_topk_sql(terms, k: int, min_match_expr: str) -> str:
    """CoveringQuery oracle (``sandbox/search/CoveringQuery.java`` +
    ``CoveringScorer.java:136-141``): per-doc minMatch from a SQL
    expression over the doc length (``dl``), clamped ≥ 1; docs matching
    ≥ minMatch of the term sub-queries score f32(double Σ of the matched
    terms' float32 BM25 scores)."""
    qvals = ",".join(f"('{t}')" for t in terms)
    return f"""
WITH {BASE_CTES},
qterms(term) AS (VALUES {qvals}),
weights AS (
  SELECT q.term,
         CAST(ln(1 + ((SELECT n FROM fstats) - ts.df + 0.5)
                     / (ts.df + 0.5)) AS FLOAT) AS w
  FROM qterms q JOIN tstats ts ON ts.term = q.term
),
cs AS (
  SELECT tf.did,
         w.w - w.w / (CAST(1 AS FLOAT)
                      + CAST(tf.tf AS FLOAT)
                        * (CAST(1 AS FLOAT)
                           / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                      + ({B} * CAST(d.dlen AS FLOAT))
                                        / (SELECT avgdl FROM fstats))))) AS s
  FROM tf
  JOIN weights w ON w.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
agg AS (
  SELECT did, count(*) AS n_matched,
         CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM cs GROUP BY did
)
SELECT a.did AS doc_id, CAST(a.score AS DOUBLE) AS score
FROM agg a JOIN dls d ON d.did = a.did
WHERE a.n_matched >= GREATEST(1, CAST(({min_match_expr}) AS BIGINT))
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def common_terms_topk_sql(terms, k: int, max_term_frequency: float,
                          low_msm: int = 0, high_msm: int = 0) -> str:
    """Independent CommonTermsQuery oracle (SHOULD/SHOULD form): the SQL
    recomputes the high/low df split ITSELF from the corpus (same threshold
    rule as ``CommonTermsQuery.buildQuery``, ``queries/.../
    CommonTermsQuery.java:211-219``) — nothing about the split is baked in
    by the engine under test.

    Float32 contract mirrors the engine's normalized tree: the rewritten
    ``MUST(lowGroup) + SHOULD(highGroup)`` flattens the pure-SHOULD high
    group into the outer boolean (``BooleanQuery.java:519-545``), so each
    matched high term is its own float32 input to the outer double sum,
    while the low group stays one nested node whose double sum rounds to
    float32 before joining the outer sum. A single-term low group collapses
    to a bare clause — float32 of one float32 is itself, so the uniform
    expression below covers the collapse too.

    Match rule: if any low-freq terms exist (including terms absent from
    the index — null TermStates land low, :206-209), a doc must match
    ≥ max(1, low_msm) of them; otherwise ≥ max(1, high_msm) high terms.
    """
    qvals = ",".join(f"('{t}')" for t in dict.fromkeys(terms))
    if max_term_frequency >= 1.0:
        cut = f"CAST({float(max_term_frequency)!r} AS DOUBLE)"
    else:
        cut = (f"round({float(max_term_frequency)!r} * "
               f"(SELECT n FROM fstats))")
    return f"""
WITH {BASE_CTES},
qterms(term) AS (VALUES {qvals}),
tclass AS (
  SELECT q.term,
         CAST(ln(1 + ((SELECT n FROM fstats) - ts.df + 0.5)
                     / (ts.df + 0.5)) AS FLOAT) AS w,
         CASE WHEN ts.df > {cut} THEN 1 ELSE 0 END AS hi
  FROM qterms q JOIN tstats ts ON ts.term = q.term
),
nlo AS (
  SELECT count(*) FILTER (WHERE t.hi = 0)
         + (SELECT count(*) FROM qterms q
            WHERE q.term NOT IN (SELECT term FROM tclass)) AS n
  FROM tclass t
),
cs AS (
  SELECT tf.did, c.hi,
         c.w - c.w / (CAST(1 AS FLOAT)
                      + CAST(tf.tf AS FLOAT)
                        * (CAST(1 AS FLOAT)
                           / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                      + ({B} * CAST(d.dlen AS FLOAT))
                                        / (SELECT avgdl FROM fstats))))) AS s
  FROM tf
  JOIN tclass c ON c.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
agg AS (
  SELECT did,
         count(*) FILTER (WHERE hi = 0) AS lo_m,
         count(*) FILTER (WHERE hi = 1) AS hi_m,
         CAST(SUM(CASE WHEN hi = 0 THEN CAST(s AS DOUBLE) END)
              AS FLOAT) AS lo_s,
         SUM(CASE WHEN hi = 1 THEN CAST(s AS DOUBLE) END) AS hi_s
  FROM cs GROUP BY did
)
SELECT did AS doc_id,
       CAST(CAST(CAST(COALESCE(lo_s, 0) AS FLOAT) AS DOUBLE)
            + COALESCE(hi_s, 0) AS FLOAT)::DOUBLE AS score
FROM agg
WHERE CASE WHEN (SELECT n FROM nlo) > 0
           THEN lo_m >= GREATEST(1, {int(low_msm)})
           ELSE hi_m >= GREATEST(1, {int(high_msm)}) END
ORDER BY score DESC, did ASC
LIMIT {k}
"""


def _multiturn_scored_ctes(terms, words_per_turn: int = 40) -> str:
    """Shared CTE chain for multiturn-corpus oracles: derive the multi-turn
    corpus exactly like ``corpus.multiturn_from_documents`` (word-chunking,
    verified value-identical to the Spark derivation) and score turns with
    float32 BM25 for a flat SHOULD query — ends at ``summed(did, score)``
    plus ``docs0(did, conv_id, t)``."""
    w = words_per_turn
    qvals = ",".join(
        f"({i}, '{t}', CAST(1.0 AS FLOAT))" for i, t in enumerate(terms)
    )
    return rf"""src AS (
  SELECT printf('c%010d', doc_id) AS conv_id,
         regexp_split_to_array(coalesce(text, ''), '\s+') AS words
  FROM documents
),
sized AS (
  SELECT conv_id, words,
         greatest(1, CAST(ceil(len(words) / {w}.0) AS BIGINT)) AS n_turns
  FROM src
),
turns AS (
  SELECT conv_id, CAST(u.t AS INT) AS turn_idx,
         array_to_string(list_slice(words, u.t*{w} + 1, u.t*{w} + {w}),
                         ' ') AS txt
  FROM sized, unnest(range(n_turns)) AS u(t)
),
docs0 AS (
  SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS did,
         conv_id, lower(txt) AS t
  FROM turns
),
toks AS (
  SELECT did, unnest(regexp_extract_all(t, '[a-z0-9]+')) AS term FROM docs0
),
tf AS (
  SELECT did, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
),
dls AS (
  SELECT did, len(regexp_extract_all(t, '[a-z0-9]+'))::BIGINT AS dl
  FROM docs0
),
normmap(lo, hi) AS (VALUES {norm_map_values()}),
dlen AS (
  SELECT d.did, d.dl, m.lo AS dlen
  FROM dls d JOIN normmap m ON d.dl BETWEEN m.lo AND m.hi
),
fstats AS (
  SELECT count(*)::BIGINT AS n,
         CAST(sum(dl) / count(*)::DOUBLE AS FLOAT) AS avgdl
  FROM dls
),
tstats AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
qterms(cid, term, boost) AS (VALUES {qvals}),
weights AS (
  SELECT q.cid, q.term,
         q.boost * CAST(ln(1 + ((SELECT n FROM fstats) - ts.df + 0.5)
                              / (ts.df + 0.5)) AS FLOAT) AS w
  FROM qterms q JOIN tstats ts ON ts.term = q.term
),
clause_scores AS (
  SELECT tf.did,
         w.w - w.w / (CAST(1 AS FLOAT)
                      + CAST(tf.tf AS FLOAT)
                        * (CAST(1 AS FLOAT)
                           / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                      + ({B} * CAST(d.dlen AS FLOAT))
                                        / (SELECT avgdl FROM fstats))))) AS s
  FROM tf
  JOIN weights w ON w.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
summed AS (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM clause_scores GROUP BY did
)"""


def join_conv_topk_sql(terms, k: int, words_per_turn: int = 40) -> str:
    """Block-join oracle: per-turn float32 BM25 scores aggregated per
    conversation with MAX (float32-exact) —
    ``JoinUtil.createJoinQuery`` ScoreMode.Max (parent side)."""
    return f"""
WITH {_multiturn_scored_ctes(terms, words_per_turn)}
SELECT d0.conv_id, CAST(MAX(s0.score) AS DOUBLE) AS score
FROM summed s0 JOIN docs0 d0 ON d0.did = s0.did
GROUP BY d0.conv_id
ORDER BY MAX(s0.score) DESC, d0.conv_id ASC
LIMIT {k}
"""


def join_field_topk_sql(terms, k: int, words_per_turn: int = 40) -> str:
    """JoinUtil value-join oracle (``join/JoinUtil.java:90-118``,
    from_field = to_field = conv_id, ScoreMode.Max): every TURN of a
    conversation containing a match, scored by the conversation's MAX
    turn score (float32-exact), top-k by (score DESC, docID ASC)."""
    return f"""
WITH {_multiturn_scored_ctes(terms, words_per_turn)},
convs AS (
  SELECT d0.conv_id, MAX(s0.score) AS cscore
  FROM summed s0 JOIN docs0 d0 ON d0.did = s0.did
  GROUP BY d0.conv_id
)
SELECT d.did AS doc_id, CAST(c.cscore AS DOUBLE) AS score
FROM docs0 d JOIN convs c ON c.conv_id = d.conv_id
ORDER BY c.cscore DESC, d.did ASC
LIMIT {k}
"""


def parent_children_topk_sql(terms, k: int,
                             words_per_turn: int = 40) -> str:
    """ParentChildrenBlockJoinQuery oracle
    (``join/ParentChildrenBlockJoinQuery.java:40-57``): the child-query
    BM25 hits restricted to ONE parent conversation — the conversation
    with the most turns (conv_id ASC tie-break), derived in SQL itself —
    top-k by (score DESC, docID ASC)."""
    return f"""
WITH {_multiturn_scored_ctes(terms, words_per_turn)},
parent AS (
  SELECT conv_id FROM docs0 GROUP BY conv_id
  ORDER BY count(*) DESC, conv_id ASC LIMIT 1
)
SELECT s0.did AS doc_id, CAST(s0.score AS DOUBLE) AS score
FROM summed s0 JOIN docs0 d0 ON d0.did = s0.did
WHERE d0.conv_id = (SELECT conv_id FROM parent)
ORDER BY s0.score DESC, s0.did ASC
LIMIT {k}
"""


def diversified_topk_sql(terms, k: int, max_per_key: int,
                         words_per_turn: int = 40) -> str:
    """DiversifiedTopDocsCollector oracle
    (``misc/.../DiversifiedTopDocsCollector.java:69-157``): top-k turn hits
    keeping at most ``max_per_key`` per conversation — per-key rank filter
    on (score DESC, docID ASC) then global top-k (proven equivalent to the
    reference's greedy PQ insert/evict)."""
    return f"""
WITH {_multiturn_scored_ctes(terms, words_per_turn)},
ranked AS (
  SELECT s0.did, s0.score,
         row_number() OVER (PARTITION BY d0.conv_id
                            ORDER BY s0.score DESC, s0.did ASC) AS rn
  FROM summed s0 JOIN docs0 d0 ON d0.did = s0.did
)
SELECT did AS doc_id, CAST(score AS DOUBLE) AS score
FROM ranked WHERE rn <= {max_per_key}
ORDER BY score DESC, did ASC
LIMIT {k}
"""


def kw_should_topk_sql(query, k: int, const_boost: float = 1.0) -> str:
    """Top-k for a boolean of text SHOULD terms + ONE keyword-field SHOULD
    clause that every doc satisfies (the documents→transcripts mapping sets
    role='user' on every turn): match set = all docs, score = float32 of
    (Σ_double per-term float32 BM25 + double(:func:`kw_const_cte` constant))
    — the keyword clause's true BM25 weight at freq=1, dl=1 under the
    keyword field's own collection stats."""
    clauses = _clause_rows(query)
    scoring = [(t, b) for t, o, b in clauses if o == ast.SHOULD]
    qvals = ",".join(
        f"({i}, '{t}', CAST({b!r} AS FLOAT))" for i, (t, b) in enumerate(scoring)
    )
    return f"""
WITH {BASE_CTES},{kw_const_cte(const_boost)},
qterms(cid, term, boost) AS (VALUES {qvals}),
weights AS (
  SELECT q.cid, q.term,
         q.boost * CAST(ln(1 + ((SELECT n FROM fstats) - ts.df + 0.5)
                              / (ts.df + 0.5)) AS FLOAT) AS w
  FROM qterms q JOIN tstats ts ON ts.term = q.term
),
clause_scores AS (
  SELECT tf.did,
         w.w - w.w / (CAST(1 AS FLOAT)
                      + CAST(tf.tf AS FLOAT)
                        * (CAST(1 AS FLOAT)
                           / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                      + ({B} * CAST(d.dlen AS FLOAT))
                                        / (SELECT avgdl FROM fstats))))) AS s
  FROM tf
  JOIN weights w ON w.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
summed AS (
  SELECT d0.did,
         CAST(coalesce(cs.ss, 0)
              + CAST((SELECT c FROM kwc) AS DOUBLE) AS FLOAT)
           AS score
  FROM docs0 d0
  LEFT JOIN (SELECT did, SUM(CAST(s AS DOUBLE)) AS ss
             FROM clause_scores GROUP BY did) cs ON cs.did = d0.did
)
SELECT did AS doc_id, CAST(score AS DOUBLE) AS score
FROM summed
ORDER BY score DESC, did ASC
LIMIT {k}
"""


def phrase_topk_sql(terms, k: int, boost: float = 1.0) -> str:
    """Float32-bit-exact BM25 top-k for an exact phrase.

    freq = number of consecutive-position matches; weight = boost × float32 of
    the double-sum of per-term float32 idfs (BM25Similarity.java:185-194).
    """
    n_t = len(terms)
    toksp = """
toksp AS (
  SELECT did, unnest(regexp_extract_all(t, '[a-z0-9]+')) AS term,
         generate_subscripts(regexp_extract_all(t, '[a-z0-9]+'), 1) AS pos
  FROM docs0
)"""
    joins = "".join(
        f"\n  JOIN toksp t{i} ON t{i}.did = t0.did AND t{i}.pos = t0.pos + {i}"
        for i in range(1, n_t)
    )
    conds = " AND ".join(f"t{i}.term = '{t}'" for i, t in enumerate(terms))
    idf_f32 = [
        f"CAST(ln(1 + ((SELECT n FROM fstats) - (SELECT df FROM tstats WHERE term = '{t}') + 0.5)"
        f" / ((SELECT df FROM tstats WHERE term = '{t}') + 0.5)) AS FLOAT)"
        for t in terms
    ]
    sum_idf = " + ".join(f"CAST({x} AS DOUBLE)" for x in idf_f32)
    guard = " AND ".join(
        f"EXISTS (SELECT 1 FROM tstats WHERE term = '{t}')" for t in terms
    )
    return f"""
WITH {BASE_CTES},{toksp},
ph AS (
  SELECT t0.did, count(*)::BIGINT AS freq
  FROM toksp t0{joins}
  WHERE {conds}
  GROUP BY t0.did
),
pw AS (SELECT CAST({boost!r} AS FLOAT) * CAST(({sum_idf}) AS FLOAT) AS w
       WHERE {guard}),
scored AS (
  SELECT ph.did,
         pw.w - pw.w / (CAST(1 AS FLOAT)
                        + CAST(ph.freq AS FLOAT)
                          * (CAST(1 AS FLOAT)
                             / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                        + ({B} * CAST(d.dlen AS FLOAT))
                                          / (SELECT avgdl FROM fstats))))) AS s
  FROM ph CROSS JOIN pw
  JOIN dlen d ON d.did = ph.did
)
SELECT did AS doc_id, CAST(s AS DOUBLE) AS score
FROM scored
ORDER BY s DESC, did ASC
LIMIT {k}
"""


_TOKSP_CTE = """
toksp AS (
  SELECT did, unnest(regexp_extract_all(t, '[a-z0-9]+')) AS term,
         generate_subscripts(regexp_extract_all(t, '[a-z0-9]+'), 1) AS pos
  FROM docs0
)"""


def phrase_count_sql(terms) -> str:
    """Exact-phrase hit count (docs with ≥1 consecutive-position match)."""
    n_t = len(terms)
    joins = "".join(
        f"\n  JOIN toksp t{i} ON t{i}.did = t0.did AND t{i}.pos = t0.pos + {i}"
        for i in range(1, n_t)
    )
    conds = " AND ".join(f"t{i}.term = '{t}'" for i, t in enumerate(terms))
    return f"""
WITH {BASE_CTES},{_TOKSP_CTE}
SELECT count(*)::BIGINT AS hits FROM (
  SELECT t0.did FROM toksp t0{joins}
  WHERE {conds}
  GROUP BY t0.did
)
"""


def sloppy_pair_count_sql(t0: str, t1: str, slop: int) -> str:
    """Sloppy 2-term phrase hit count: a doc matches ``"t0 t1"~slop`` iff
    some position pair has |pos(t1) - pos(t0) - 1| <= slop (the minimal
    adjusted window the greedy SloppyPhraseMatcher finds for two distinct
    terms)."""
    return f"""
WITH {BASE_CTES},{_TOKSP_CTE}
SELECT count(*)::BIGINT AS hits FROM (
  SELECT a.did
  FROM toksp a JOIN toksp b ON b.did = a.did
  WHERE a.term = '{t0}' AND b.term = '{t1}'
    AND abs(b.pos - a.pos - 1) <= {slop}
  GROUP BY a.did
)
"""


def sloppy_repeat_count_sql(terms, slop: int) -> str:
    """Sloppy phrase hit count with REPEATED terms: a doc matches when some
    assignment of slots to DISTINCT token positions (repeat-collision
    resolution forces distinct positions; ``SloppyPhraseMatcher.java:286-323``)
    has adjusted-window width ≤ slop. The greedy matcher finds a match
    whenever one exists for single-term slots (pytest-verified against
    brute-force enumeration over randomized position sets), so brute-force
    existence is an exact hit-count oracle."""
    n = len(terms)
    joins = "".join(
        f"\n  JOIN toksp t{i} ON t{i}.did = t0.did" for i in range(1, n)
    )
    conds = [f"t{i}.term = '{t}'" for i, t in enumerate(terms)]
    for i in range(n):
        for j in range(i + 1, n):
            if terms[i] == terms[j]:
                conds.append(f"t{i}.pos <> t{j}.pos")
    adj = ", ".join(f"t{i}.pos - {i}" for i in range(n))
    conds.append(f"greatest({adj}) - least({adj}) <= {slop}")
    return f"""
WITH {BASE_CTES},{_TOKSP_CTE}
SELECT count(*)::BIGINT AS hits FROM (
  SELECT t0.did FROM toksp t0{joins}
  WHERE {" AND ".join(conds)}
  GROUP BY t0.did
)
"""


def _multiphrase_body_sql(joins, conds, sum_idf_expr: str, extra_ctes: str,
                          k: int, boost: float) -> str:
    """Shared MultiPhrase scoring skeleton (freq = count of matching start
    positions; weight = boost × f32(Σ f32 per-term idf),
    MultiPhraseQuery.java:234; BM25 tf saturation over the SmallFloat
    norm) — parameterized on the per-slot join/match conditions and the
    summed-idf expression so the literal-slots and derived-slot (prefix)
    oracles share ONE copy of the formula."""
    return f"""
WITH {BASE_CTES},{_TOKSP_CTE}{extra_ctes},
ph AS (
  SELECT t0.did, count(DISTINCT t0.pos)::BIGINT AS freq
  FROM toksp t0{"".join(joins)}
  WHERE {" AND ".join(conds)}
  GROUP BY t0.did
),
pw AS (SELECT CAST({boost!r} AS FLOAT) * CAST(({sum_idf_expr}) AS FLOAT) AS w),
scored AS (
  SELECT ph.did,
         pw.w - pw.w / (CAST(1 AS FLOAT)
                        + CAST(ph.freq AS FLOAT)
                          * (CAST(1 AS FLOAT)
                             / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                        + ({B} * CAST(d.dlen AS FLOAT))
                                          / (SELECT avgdl FROM fstats))))) AS s
  FROM ph CROSS JOIN pw
  JOIN dlen d ON d.did = ph.did
)
SELECT did AS doc_id, CAST(s AS DOUBLE) AS score
FROM scored
ORDER BY s DESC, did ASC
LIMIT {k}
"""


def multiphrase_topk_sql(slots, k: int, boost: float = 1.0) -> str:
    """Exact MultiPhrase top-k: slot i matches when ANY of its terms is at
    start+i (MultiPhraseQuery.java:303 union postings). Assumes every
    listed term occurs in the corpus (gate queries use corpus-vocabulary
    terms)."""
    all_terms = [t for slot in slots for t in slot]
    joins = []
    conds = []
    for i, slot in enumerate(slots):
        inlist = ", ".join(f"'{t}'" for t in slot)
        if i == 0:
            conds.append(f"t0.term IN ({inlist})")
        else:
            joins.append(
                f"\n  JOIN toksp t{i} ON t{i}.did = t0.did "
                f"AND t{i}.pos = t0.pos + {i}"
            )
            conds.append(f"t{i}.term IN ({inlist})")
    idf_f32 = [
        f"CAST(ln(1 + ((SELECT n FROM fstats) - (SELECT df FROM tstats WHERE term = '{t}') + 0.5)"
        f" / ((SELECT df FROM tstats WHERE term = '{t}') + 0.5)) AS FLOAT)"
        for t in all_terms
    ]
    sum_idf = " + ".join(f"CAST({x} AS DOUBLE)" for x in idf_f32)
    return _multiphrase_body_sql(joins, conds, sum_idf, "", k, boost)


def multiterm_sql(match_cond: str, k: int, boost: float = 1.0) -> str:
    """CONSTANT_SCORE multi-term query: docs with ≥1 token matching
    ``match_cond`` (SQL over column ``term``); k smallest docIDs, score=boost."""
    return f"""
WITH {BASE_CTES}
SELECT d.did AS doc_id, CAST({boost!r} AS DOUBLE) AS score
FROM dls d
WHERE EXISTS (SELECT 1 FROM tf x WHERE x.did = d.did AND ({match_cond}))
ORDER BY d.did ASC
LIMIT {k}
"""


def multiterm_count_sql(match_cond: str) -> str:
    return f"""
WITH {BASE_CTES}
SELECT count(*)::BIGINT AS hits FROM dls d
WHERE EXISTS (SELECT 1 FROM tf x WHERE x.did = d.did AND ({match_cond}))
"""


def synonym_topk_sql(terms, k: int, boost: float = 1.0) -> str:
    """SynonymQuery: tf summed across terms, one score with df = max(dfs)."""
    tl = ",".join(f"'{t}'" for t in terms)
    return f"""
WITH {BASE_CTES},
syn AS (
  SELECT did, sum(tf)::BIGINT AS tfsum FROM tf
  WHERE term IN ({tl}) GROUP BY did
),
sw AS (
  SELECT CAST({boost!r} AS FLOAT)
         * CAST(ln(1 + ((SELECT n FROM fstats) - mx.df + 0.5) / (mx.df + 0.5)) AS FLOAT) AS w
  FROM (SELECT max(df) AS df FROM tstats WHERE term IN ({tl})) mx
  WHERE mx.df IS NOT NULL
),
scored AS (
  SELECT s.did,
         sw.w - sw.w / (CAST(1 AS FLOAT)
                        + CAST(s.tfsum AS FLOAT)
                          * (CAST(1 AS FLOAT)
                             / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                        + ({B} * CAST(d.dlen AS FLOAT))
                                          / (SELECT avgdl FROM fstats))))) AS sc
  FROM syn s CROSS JOIN sw
  JOIN dlen d ON d.did = s.did
)
SELECT did AS doc_id, CAST(sc AS DOUBLE) AS score
FROM scored ORDER BY sc DESC, did ASC LIMIT {k}
"""


def dismax_topk_sql(terms, k: int, boost: float = 1.0) -> str:
    """DisjunctionMaxQuery with tie_breaker = 0: per-doc max of clause scores."""
    qvals = ",".join(f"('{t}')" for t in terms)
    return f"""
WITH {BASE_CTES},
qterms(term) AS (VALUES {qvals}),
weights AS (
  SELECT q.term,
         CAST({boost!r} AS FLOAT)
         * CAST(ln(1 + ((SELECT n FROM fstats) - ts.df + 0.5) / (ts.df + 0.5)) AS FLOAT) AS w
  FROM qterms q JOIN tstats ts ON ts.term = q.term
),
clause_scores AS (
  SELECT tf.did,
         w.w - w.w / (CAST(1 AS FLOAT)
                      + CAST(tf.tf AS FLOAT)
                        * (CAST(1 AS FLOAT)
                           / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                      + ({B} * CAST(d.dlen AS FLOAT))
                                        / (SELECT avgdl FROM fstats))))) AS s
  FROM tf
  JOIN weights w ON w.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
agg AS (SELECT did, max(s) AS sc FROM clause_scores GROUP BY did)
SELECT did AS doc_id, CAST(sc AS DOUBLE) AS score
FROM agg ORDER BY sc DESC, did ASC LIMIT {k}
"""


def blended_dismax_topk_sql(terms, k: int, tie: float = 0.01) -> str:
    """BlendedTermQuery oracle (``core/search/BlendedTermQuery.java``):
    the SQL derives the blended docFreq ITSELF (MAX df over the query
    terms, ``:281-286`` — nothing baked in), scores every term's BM25
    clause with that artificial df, and combines per doc with the
    DisjunctionMax tie-breaker chain mirroring the engine's float32 ops:
    ``f32(max + f32(tie · f32(f32(Σ_double) − max)))``. The blended
    totalTermFreq is invisible to BM25 (the scorer reads df and field
    stats only), like the reference under BM25Similarity. Use ≤2 terms:
    the engine's Σ is a float64 accumulation whose last-ulp depends on
    encounter order at ≥3 addends."""
    qvals = ",".join(f"('{t}')" for t in terms)
    return f"""
WITH {BASE_CTES},
qterms(term) AS (VALUES {qvals}),
blend AS (
  SELECT max(ts.df) AS bdf
  FROM qterms q JOIN tstats ts ON ts.term = q.term
),
weights AS (
  SELECT q.term,
         CAST(ln(1 + ((SELECT n FROM fstats) - (SELECT bdf FROM blend) + 0.5)
                     / ((SELECT bdf FROM blend) + 0.5)) AS FLOAT) AS w
  FROM qterms q JOIN tstats ts ON ts.term = q.term
),
clause_scores AS (
  SELECT tf.did,
         w.w - w.w / (CAST(1 AS FLOAT)
                      + CAST(tf.tf AS FLOAT)
                        * (CAST(1 AS FLOAT)
                           / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                      + ({B} * CAST(d.dlen AS FLOAT))
                                        / (SELECT avgdl FROM fstats))))) AS s
  FROM tf
  JOIN weights w ON w.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
agg AS (
  SELECT did,
         CAST(max(s)
              + CAST(CAST({tie!r} AS FLOAT)
                     * CAST(CAST(sum(CAST(s AS DOUBLE)) AS FLOAT) - max(s)
                       AS FLOAT) AS FLOAT) AS FLOAT) AS sc
  FROM clause_scores GROUP BY did
)
SELECT did AS doc_id, CAST(sc AS DOUBLE) AS score
FROM agg ORDER BY sc DESC, did ASC LIMIT {k}
"""


def fuzzy_blended_topk_sql(term: str, k: int, max_edits: int = 2,
                           max_expansions: int = 50) -> str:
    """FuzzyQuery default-rewrite oracle (``TopTermsBlendedFreqScoringRewrite``,
    ``core/search/FuzzyQuery.java:56-61`` + ``MultiTermQuery.java:197-236``):
    the SQL itself (1) expands vocabulary terms within OSA Damerau-Levenshtein
    ``max_edits`` of the query term, (2) boosts each ``ed == 0 → 1.0f`` else
    ``1f − ed/min(len)`` in float32 (``FuzzyTermsEnum.java:236-256``),
    (3) keeps the top ``max_expansions`` by (boost DESC, term ASC)
    (``TopTermsRewrite.java:118-121``), (4) blends df = MAX over the kept
    terms (``BlendedTermQuery.java:281-286``; the blended ttf is invisible to
    BM25), clamps negative boosts to 0 (``TopTermsRewrite.java:168-171``),
    and (5) sums the boosted clause scores per doc in DOUBLE → FLOAT like
    every boolean gate (exact: f32 addends in a 53-bit accumulator)."""
    qlen = len(term)
    return f"""
WITH {BASE_CTES},
fz AS (
  SELECT term, df,
         CASE WHEN term = '{term}' THEN CAST(1 AS FLOAT)
              ELSE CAST(1 AS FLOAT)
                   - CAST(damerau_levenshtein(term, '{term}') AS FLOAT)
                     / CAST(least(length(term), {qlen}) AS FLOAT) END AS boost
  FROM tstats
  WHERE damerau_levenshtein(term, '{term}') <= {max_edits}
),
kept AS (
  SELECT term, df, boost FROM fz
  ORDER BY boost DESC, term ASC LIMIT {max_expansions}
),
blend AS (SELECT max(df) AS bdf FROM kept),
weights AS (
  SELECT term,
         -- greatest() promotes FLOAT→DOUBLE in DuckDB; one rounding of the
         -- exact product == the engine's f32*f32, so a single outer cast
         -- restores the float32 weight contract
         CAST(greatest(boost, CAST(0 AS FLOAT))
              * CAST(ln(1 + ((SELECT n FROM fstats) - (SELECT bdf FROM blend) + 0.5)
                          / ((SELECT bdf FROM blend) + 0.5)) AS FLOAT)
              AS FLOAT) AS w
  FROM kept
),
clause_scores AS (
  SELECT tf.did,
         w.w - w.w / (CAST(1 AS FLOAT)
                      + CAST(tf.tf AS FLOAT)
                        * (CAST(1 AS FLOAT)
                           / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                      + ({B} * CAST(d.dlen AS FLOAT))
                                        / (SELECT avgdl FROM fstats))))) AS s
  FROM tf
  JOIN weights w ON w.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
summed AS (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM clause_scores GROUP BY did
)
SELECT did AS doc_id, CAST(score AS DOUBLE) AS score
FROM summed ORDER BY score DESC, did ASC LIMIT {k}
"""


def shingle_topk_sql(terms, k: int, size: int = 2) -> str:
    """ShingleAnalyzer oracle (``analysis/common/.../shingle/ShingleFilter.java``
    under the engine's min==max / no-unigrams contract): the SQL derives the
    shingled index ITSELF — space-joined ``size``-grams via self-joins on
    token positions, dl = max(n_tokens − size + 1, 0) — then scores the query
    shingles with the standard float32 BM25 chain."""
    joins = "".join(
        f"\n  JOIN toksp t{i} ON t{i}.did = t0.did AND t{i}.pos = t0.pos + {i}"
        for i in range(1, size))
    gram = " || ' ' || ".join(f"t{i}.term" for i in range(size))
    qvals = ",".join(f"({i}, '{t}', CAST(1.0 AS FLOAT))"
                     for i, t in enumerate(terms))
    return f"""
WITH docs0 AS (
  SELECT row_number() OVER (ORDER BY printf('c%010d', doc_id)) - 1 AS did,
         lower(coalesce(text, '')) AS t
  FROM documents
),{_TOKSP_CTE},
sh AS (
  SELECT t0.did, {gram} AS term
  FROM toksp t0{joins}
),
tf AS (SELECT did, term, count(*)::BIGINT AS tf FROM sh GROUP BY 1, 2),
dls AS (
  SELECT did,
         greatest(len(regexp_extract_all(t, '[a-z0-9]+')) - {size - 1},
                  0)::BIGINT AS dl
  FROM docs0
),
normmap(lo, hi) AS (VALUES {norm_map_values()}),
dlen AS (
  SELECT d.did, d.dl, m.lo AS dlen
  FROM dls d JOIN normmap m ON d.dl BETWEEN m.lo AND m.hi
),
fstats AS (
  SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sum_ttf,
         CAST(sum(dl) / count(*)::DOUBLE AS FLOAT) AS avgdl
  FROM dls
),
tstats AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
qterms(cid, term, boost) AS (VALUES {qvals}),
weights AS (
  SELECT q.cid, q.term,
         q.boost * CAST(ln(1 + ((SELECT n FROM fstats) - ts.df + 0.5)
                              / (ts.df + 0.5)) AS FLOAT) AS w
  FROM qterms q JOIN tstats ts ON ts.term = q.term
),
clause_scores AS (
  SELECT tf.did,
         w.w - w.w / (CAST(1 AS FLOAT)
                      + CAST(tf.tf AS FLOAT)
                        * (CAST(1 AS FLOAT)
                           / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                      + ({B} * CAST(d.dlen AS FLOAT))
                                        / (SELECT avgdl FROM fstats))))) AS s
  FROM tf
  JOIN weights w ON w.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
summed AS (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM clause_scores GROUP BY did
)
SELECT did AS doc_id, CAST(score AS DOUBLE) AS score
FROM summed ORDER BY score DESC, did ASC LIMIT {k}
"""


def word_break_suggest_sql(break_inputs, combine_terms, k: int = 5,
                           max_combine_length: int = 20) -> str:
    """``WordBreakSpellChecker`` oracle (``suggest/.../spell/
    WordBreakSpellChecker.java``, SUGGEST_WHEN_NOT_IN_INDEX,
    maxChanges=2): the SQL enumerates 2- and 3-way splits via substr over
    generated split points (a 3-way split needs every part in the
    dictionary — exactly the recursion's reachability condition), and
    2-/3-term combinations via ordinal self-joins; both ranked
    (num_parts ASC, freq DESC, deterministic tie-break) with a top-``k``
    window per input."""
    bvals = ",".join(f"('{t}')" for t in break_inputs)
    cvals = ",".join(f"({i}, '{t}')" for i, t in enumerate(combine_terms))
    return f"""
WITH {BASE_CTES},
binputs(input) AS (VALUES {bvals}),
pos2 AS (
  SELECT b.input, gs.i
  FROM binputs b, LATERAL (SELECT unnest(generate_series(1, len(b.input) - 1)) AS i) gs
  WHERE NOT EXISTS (SELECT 1 FROM tstats t WHERE t.term = b.input)
),
b2 AS (
  SELECT p.input,
         substr(p.input, 1, p.i) || ' ' || substr(p.input, p.i + 1) AS suggestion,
         2 AS num_parts,
         greatest(d1.df, d2.df)::BIGINT AS freq
  FROM pos2 p
  JOIN tstats d1 ON d1.term = substr(p.input, 1, p.i)
  JOIN tstats d2 ON d2.term = substr(p.input, p.i + 1)
),
pos3 AS (
  SELECT p.input, p.i, gs.j
  FROM pos2 p, LATERAL (SELECT unnest(generate_series(p.i + 1, len(p.input) - 1)) AS j) gs
),
b3 AS (
  SELECT p.input,
         substr(p.input, 1, p.i) || ' ' || substr(p.input, p.i + 1, p.j - p.i)
           || ' ' || substr(p.input, p.j + 1) AS suggestion,
         3 AS num_parts,
         greatest(d1.df, d2.df, d3.df)::BIGINT AS freq
  FROM pos3 p
  JOIN tstats d1 ON d1.term = substr(p.input, 1, p.i)
  JOIN tstats d2 ON d2.term = substr(p.input, p.i + 1, p.j - p.i)
  JOIN tstats d3 ON d3.term = substr(p.input, p.j + 1)
),
breaks AS (
  SELECT 'break' AS kind, input, suggestion, num_parts, freq,
         row_number() OVER (PARTITION BY input
                            ORDER BY num_parts ASC, freq DESC, suggestion ASC) AS rn
  FROM (SELECT * FROM b2 UNION ALL SELECT * FROM b3)
),
cterms(idx, term) AS (VALUES {cvals}),
cdf AS (
  SELECT c.idx, c.term, coalesce(t.df, 0)::BIGINT AS df
  FROM cterms c LEFT JOIN tstats t ON t.term = c.term
),
runs AS (
  SELECT a.idx AS i, b.idx AS j,
         a.term || ' ' || b.term AS input, a.term || b.term AS comb,
         2 AS num_parts, least(a.df, b.df) AS minf
  FROM cdf a JOIN cdf b ON b.idx = a.idx + 1
  UNION ALL
  SELECT a.idx, c.idx, a.term || ' ' || b.term || ' ' || c.term,
         a.term || b.term || c.term, 3, least(a.df, b.df, c.df)
  FROM cdf a JOIN cdf b ON b.idx = a.idx + 1 JOIN cdf c ON c.idx = a.idx + 2
),
combines AS (
  SELECT 'combine' AS kind, r.input, r.comb AS suggestion,
         r.num_parts, t.df::BIGINT AS freq,
         row_number() OVER (ORDER BY r.num_parts ASC, t.df DESC, r.i ASC) AS rn
  FROM runs r JOIN tstats t ON t.term = r.comb
  WHERE r.minf = 0 AND len(r.comb) <= {max_combine_length}
)
SELECT kind, input, suggestion, num_parts::INT AS num_parts, freq
FROM (SELECT * FROM breaks UNION ALL SELECT * FROM combines)
WHERE rn <= {k}
ORDER BY kind, input, num_parts, freq DESC, suggestion
"""


def multiterm_scored_topk_sql(term_cond: str, k: int) -> str:
    """``MultiTermQuery.SCORING_BOOLEAN_REWRITE`` oracle
    (``core/search/ScoringRewrite.java:44-79``): the SQL derives the
    expansion itself (``term_cond`` is a predicate over the vocabulary,
    e.g. ``term LIKE 's%'``) and scores each matched term as an independent
    SHOULD BM25 clause with its OWN df — per-doc clause scores summed in
    DOUBLE → FLOAT (order-exact for f32 addends)."""
    return f"""
WITH {BASE_CTES},
qterms AS (SELECT term, df FROM tstats WHERE {term_cond}),
weights AS (
  SELECT term,
         CAST(ln(1 + ((SELECT n FROM fstats) - df + 0.5)
                     / (df + 0.5)) AS FLOAT) AS w
  FROM qterms
),
clause_scores AS (
  SELECT tf.did,
         w.w - w.w / (CAST(1 AS FLOAT)
                      + CAST(tf.tf AS FLOAT)
                        * (CAST(1 AS FLOAT)
                           / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                      + ({B} * CAST(d.dlen AS FLOAT))
                                        / (SELECT avgdl FROM fstats))))) AS s
  FROM tf
  JOIN weights w ON w.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
summed AS (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM clause_scores GROUP BY did
)
SELECT did AS doc_id, CAST(score AS DOUBLE) AS score
FROM summed ORDER BY score DESC, did ASC LIMIT {k}
"""


def group_top1_sql(query, group_col: str = "source") -> str:
    """Top-1 doc per group by BM25 score (GroupingSearch analogy) — the
    n=1 projection of :func:`group_topn_sql` (no rn column, the original
    gate schema)."""
    return f"""
SELECT grp, doc_id, score FROM ({group_topn_sql(query, group_col, 1)})
ORDER BY grp
"""


def facet_counts_sql(query, facet_col: str = "lang") -> str:
    """Matching-doc counts per facet value (FacetsCollector analogy)."""
    inner = bm25_topk_sql(query, 10**9)
    return f"""
WITH matched AS (SELECT doc_id FROM ({inner})),
gmap AS (SELECT row_number() OVER (ORDER BY printf('c%010d', doc_id)) - 1 AS did,
                {facet_col} AS fv FROM documents)
SELECT g.fv AS {facet_col}, count(*)::BIGINT AS n
FROM matched m JOIN gmap g ON g.did = m.doc_id
GROUP BY g.fv ORDER BY g.fv
"""


def facet_sum_sql(query, facet_col: str = "lang") -> str:
    """Per-facet SUM of the doc length over the query's match set
    (TaxonomyFacetSumValueSource analogy)."""
    inner = bm25_topk_sql(query, 10**9)
    return f"""
WITH matched AS (SELECT doc_id FROM ({inner})),
gmap AS (SELECT row_number() OVER (ORDER BY printf('c%010d', doc_id)) - 1 AS did,
                {facet_col} AS fv FROM documents),
vals AS (SELECT row_number() OVER (ORDER BY printf('c%010d', doc_id)) - 1 AS did,
                len(regexp_extract_all(lower(coalesce(text, '')),
                                       '[a-z0-9]+'))::BIGINT AS dl
         FROM documents)
SELECT g.fv AS {facet_col}, sum(v.dl)::BIGINT AS s
FROM matched m
JOIN gmap g ON g.did = m.doc_id
JOIN vals v ON v.did = m.doc_id
GROUP BY g.fv ORDER BY g.fv
"""


def group_count_sql(query, group_col: str = "source") -> str:
    """Distinct-group count over the match set (AllGroupsCollector
    analogy) — one row, one BIGINT."""
    inner = bm25_topk_sql(query, 10**9)
    return f"""
WITH matched AS (SELECT doc_id FROM ({inner})),
gmap AS (SELECT row_number() OVER (ORDER BY printf('c%010d', doc_id)) - 1 AS did,
                {group_col} AS fv FROM documents)
SELECT count(DISTINCT g.fv)::BIGINT AS n
FROM matched m JOIN gmap g ON g.did = m.doc_id
"""


def group_facets_sql(query, group_col: str = "source",
                     facet_col: str = "lang") -> str:
    """GroupFacetCollector oracle
    (``grouping/GroupFacetCollector.java:28``): per facet value, the
    number of distinct groups with ≥1 matching doc carrying it."""
    inner = bm25_topk_sql(query, 10**9)
    return f"""
WITH matched AS (SELECT doc_id FROM ({inner})),
gmap AS (SELECT row_number() OVER (ORDER BY printf('c%010d', doc_id)) - 1 AS did,
                {group_col} AS gv, {facet_col} AS fv FROM documents)
SELECT g.fv AS {facet_col}, count(DISTINCT g.gv)::BIGINT AS n
FROM matched m JOIN gmap g ON g.did = m.doc_id
GROUP BY g.fv ORDER BY g.fv
"""


def search_after_sql(query, page: int, k: int) -> str:
    """Keyset pagination oracle: page ``page`` (0-based) of size k."""
    inner = bm25_topk_sql(query, (page + 1) * k)
    return f"""
SELECT doc_id, score FROM ({inner})
ORDER BY score DESC, doc_id ASC
LIMIT {k} OFFSET {page * k}
"""


def doc_range_sql(lo: int, hi: int, k: int) -> str:
    """PointRangeQuery analogy over the numeric dl doc value."""
    return f"""
WITH {BASE_CTES}
SELECT did AS doc_id, dl FROM dls
WHERE dl BETWEEN {lo} AND {hi}
ORDER BY did ASC LIMIT {k}
"""


TOKSP = """
toksp AS (
  SELECT did, unnest(regexp_extract_all(t, '[a-z0-9]+')) AS term,
         generate_subscripts(regexp_extract_all(t, '[a-z0-9]+'), 1) AS pos
  FROM docs0
)"""


def _phrase_freq_cte(name: str, terms) -> str:
    joins = "".join(
        f"\n  JOIN toksp t{i} ON t{i}.did = t0.did AND t{i}.pos = t0.pos + {i}"
        for i in range(1, len(terms))
    )
    conds = " AND ".join(f"t{i}.term = '{t}'" for i, t in enumerate(terms))
    return (f"{name} AS (\n  SELECT t0.did, count(*)::BIGINT AS freq"
            f"\n  FROM toksp t0{joins}\n  WHERE {conds}\n  GROUP BY t0.did\n)")


def _idf_f32(t: str) -> str:
    return (f"CAST(ln(1 + ((SELECT n FROM fstats) - "
            f"(SELECT df FROM tstats WHERE term = '{t}') + 0.5)"
            f" / ((SELECT df FROM tstats WHERE term = '{t}') + 0.5)) AS FLOAT)")


def _clause_weight(terms, boost: float) -> str:
    """boost × float32(Σ_double float32 per-term idfs)."""
    s = " + ".join(f"CAST({_idf_f32(t)} AS DOUBLE)" for t in terms)
    return f"CAST({boost!r} AS FLOAT) * CAST(({s}) AS FLOAT)"


_INV = (f"(CAST(1 AS FLOAT) / ({K1} * ((CAST(1 AS FLOAT) - {B})"
        f" + ({B} * CAST(d.dlen AS FLOAT)) / (SELECT avgdl FROM fstats))))")


def bm25_mixed_topk_sql(query, k: int) -> str:
    """BM25 top-k for boolean queries mixing term and phrase clauses."""
    q = ast.normalize(query)
    clauses = []  # (occur, terms tuple, boost)
    for occ, sub in q.clauses:
        if isinstance(sub, ast.PhraseQuery):
            clauses.append((occ, tuple(sub.terms), sub.boost))
        else:
            clauses.append((occ, (sub.term,), sub.boost))

    phrase_ctes, score_sqls, conds = [], [], []
    pi = 0
    for occ, terms, boost in clauses:
        is_phrase = len(terms) > 1
        if is_phrase:
            name = f"ph{pi}"
            pi += 1
            phrase_ctes.append(_phrase_freq_cte(name, terms))
        if occ in (ast.MUST, ast.SHOULD):
            w = _clause_weight(terms, boost)
            if is_phrase:
                score_sqls.append(
                    f"SELECT p.did, ({w}) - ({w}) / (CAST(1 AS FLOAT)"
                    f" + CAST(p.freq AS FLOAT) * {_INV}) AS s"
                    f" FROM {name} p JOIN dlen d ON d.did = p.did"
                )
            else:
                score_sqls.append(
                    f"SELECT tf.did, ({w}) - ({w}) / (CAST(1 AS FLOAT)"
                    f" + CAST(tf.tf AS FLOAT) * {_INV}) AS s"
                    f" FROM tf JOIN dlen d ON d.did = tf.did"
                    f" WHERE tf.term = '{terms[0]}'"
                )
        if occ == ast.MUST:
            if is_phrase:
                conds.append(f"EXISTS (SELECT 1 FROM {name} m WHERE m.did = summed.did)")
            else:
                conds.append(f"EXISTS (SELECT 1 FROM tf m WHERE m.did = summed.did"
                             f" AND m.term = '{terms[0]}')")
        elif occ == ast.MUST_NOT:
            if is_phrase:
                conds.append(f"NOT EXISTS (SELECT 1 FROM {name} x WHERE x.did = summed.did)")
            else:
                conds.append(f"NOT EXISTS (SELECT 1 FROM tf x WHERE x.did = summed.did"
                             f" AND x.term = '{terms[0]}')")
    # a required clause whose terms are absent from the corpus → empty result
    req_guard = " AND ".join(
        f"EXISTS (SELECT 1 FROM tstats WHERE term = '{t}')"
        for occ, terms, _ in clauses if occ in (ast.MUST, ast.FILTER)
        for t in terms
    ) or "TRUE"
    all_ctes = ",".join([BASE_CTES, TOKSP] + phrase_ctes)
    union = "\n  UNION ALL\n  ".join(score_sqls)
    where = (" AND " + " AND ".join(conds)) if conds else ""
    return f"""
WITH {all_ctes},
summed AS (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM ({union}) GROUP BY did
)
SELECT did AS doc_id, CAST(score AS DOUBLE) AS score
FROM summed
WHERE ({req_guard}){where}
ORDER BY score DESC, did ASC
LIMIT {k}
"""


def count_sql(query) -> str:
    """Exact hit count for a flat boolean query (integer result), with the
    kernel's full minShouldMatch semantics: MUST present → ≥ msm matching
    SHOULD CLAUSES (duplicates count, clause-list join) when msm > 0;
    no MUST → ≥ max(1, msm); prohibited-only queries match nothing."""
    clauses = _clause_rows(query)
    must = sorted({t for t, o, _ in clauses if o in (ast.MUST, ast.FILTER)})
    should_clauses = [t for t, o, _ in clauses if o == ast.SHOULD]
    must_not = sorted({t for t, o, _ in clauses if o == ast.MUST_NOT})
    msm = int(getattr(query, "min_should_match", 0) or 0)
    conds = []
    for t in must:
        conds.append(f"EXISTS (SELECT 1 FROM tf m WHERE m.did = d.did AND m.term = '{t}')")
    need = msm if must else max(1, msm)
    if need > 0:
        if not should_clauses:
            conds.append("FALSE")  # msm unsatisfiable / prohibited-only
        elif need == 1:
            ors = " OR ".join(
                f"EXISTS (SELECT 1 FROM tf s WHERE s.did = d.did AND s.term = '{t}')"
                for t in sorted(set(should_clauses))
            )
            conds.append(f"({ors})")
        else:
            svals = ",".join(f"('{t}')" for t in should_clauses)
            conds.append(
                f"(SELECT count(*) FROM (VALUES {svals}) sq(term) "
                f"JOIN tf s ON s.term = sq.term AND s.did = d.did) >= {need}"
            )
    for t in must_not:
        conds.append(f"NOT EXISTS (SELECT 1 FROM tf x WHERE x.did = d.did AND x.term = '{t}')")
    where = " AND ".join(conds) if conds else "FALSE"
    return f"""
WITH {BASE_CTES}
SELECT count(*)::BIGINT AS hits FROM dls d WHERE {where}
"""


def suggest_terms_sql(prefix: str, k: int) -> str:
    """Prefix suggester oracle: completions ranked (df DESC, term ASC)."""
    return f"""
WITH {BASE_CTES}
SELECT term, df FROM tstats
WHERE term LIKE '{prefix}%'
ORDER BY df DESC, term ASC
LIMIT {k}
"""


def spell_suggest_sql(term: str, k: int, max_edits: int = 2) -> str:
    """DirectSpellChecker oracle: corrections within DL <= max_edits ranked
    (dist ASC, df DESC, term ASC), input term excluded."""
    return f"""
WITH {BASE_CTES}
SELECT term, df, damerau_levenshtein(term, '{term}')::INT AS dist
FROM tstats
WHERE damerau_levenshtein(term, '{term}') <= {max_edits}
  AND term != '{term}'
ORDER BY dist ASC, df DESC, term ASC
LIMIT {k}
"""


def percolate_sql(term_q: str, and_terms, phrase_terms) -> str:
    """Monitor/percolator oracle: (query_id, doc_id) for three registered
    query shapes — a term query, a conjunction, and an exact phrase."""
    a0, a1 = and_terms
    joins = "".join(
        f"\n  JOIN toksp t{i} ON t{i}.did = t0.did AND t{i}.pos = t0.pos + {i}"
        for i in range(1, len(phrase_terms))
    )
    conds = " AND ".join(
        f"t{i}.term = '{t}'" for i, t in enumerate(phrase_terms)
    )
    return f"""
WITH {BASE_CTES},{_TOKSP_CTE}
SELECT 'q_term' AS query_id, did AS doc_id
FROM (SELECT DISTINCT did FROM tf WHERE term = '{term_q}')
UNION ALL
SELECT 'q_and', a.did
FROM (SELECT DISTINCT did FROM tf WHERE term = '{a0}') a
JOIN (SELECT DISTINCT did FROM tf WHERE term = '{a1}') b ON b.did = a.did
UNION ALL
SELECT 'q_phrase', did FROM (
  SELECT DISTINCT t0.did FROM toksp t0{joins}
  WHERE {conds}
)
"""


def sort_conv_early_sql(terms, k: int) -> str:
    """Index-order sorted top-k: docs matching ANY of ``terms``, ordered by
    (conv_id ASC, docID ASC) — the early-termination path's contract (the
    requested sort is a prefix of the index sort, so the k smallest
    matching docIDs are the answer)."""
    inlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {BASE_CTES},
matched AS (SELECT DISTINCT did FROM tf WHERE term IN ({inlist}))
SELECT m.did AS doc_id, printf('c%010d', dd.doc_id) AS conv_id
FROM matched m
JOIN (SELECT doc_id,
             row_number() OVER (ORDER BY printf('c%010d', doc_id)) - 1 AS did
      FROM documents) dd ON dd.did = m.did
ORDER BY conv_id ASC, m.did ASC
LIMIT {k}
"""


def sort_by_dl_sql(terms, k: int) -> str:
    """Sort-by-field (dl DESC, docID ASC) top-k over docs matching ANY of
    ``terms`` — the TopFieldCollector gate's oracle."""
    inlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {BASE_CTES}
SELECT d.did AS doc_id, d.dl AS dl
FROM dls d
WHERE EXISTS (SELECT 1 FROM tf
              WHERE tf.did = d.did AND tf.term IN ({inlist}))
ORDER BY d.dl DESC, d.did ASC
LIMIT {k}
"""


def _boolean_filtered(query):
    """Shared clause decomposition for alternative-similarity oracles."""
    clauses = _clause_rows(query)
    scoring = [(t, b) for t, o, b in clauses if o in (ast.MUST, ast.SHOULD)]
    must = sorted({t for t, o, _ in clauses if o in (ast.MUST, ast.FILTER)})
    must_not = sorted({t for t, o, _ in clauses if o == ast.MUST_NOT})
    return clauses, scoring, must, must_not


def _topk_tail(must, must_not, k):
    conds = []
    for t in must:
        conds.append(
            f"EXISTS (SELECT 1 FROM tf m WHERE m.did = summed.did AND m.term = '{t}')"
        )
    for t in must_not:
        conds.append(
            f"NOT EXISTS (SELECT 1 FROM tf x WHERE x.did = summed.did AND x.term = '{t}')"
        )
    where = (" WHERE " + " AND ".join(conds)) if conds else ""
    return f"""
SELECT did AS doc_id, CAST(score AS DOUBLE) AS score
FROM summed{where}
ORDER BY score DESC, did ASC
LIMIT {k}
"""


def classic_topk_sql(query, k: int) -> str:
    """ClassicSimilarity (vector-space TF-IDF) top-k, float32-bit-exact:
    clause score = f32(sqrt(tf)) · f32(boost·idf) · f32(1/sqrt(dlen)),
    idf = f32(ln((n+1)/(df+1)) + 1), per-doc clause sum in DOUBLE → f32."""
    clauses, scoring, must, must_not = _boolean_filtered(query)
    if not scoring:
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS score WHERE FALSE"
    qvals = ",".join(
        f"({i}, '{t}', CAST({b!r} AS FLOAT))" for i, (t, b) in enumerate(scoring)
    )
    body = f"""
qterms(cid, term, boost) AS (VALUES {qvals}),
weights AS (
  SELECT q.cid, q.term,
         CAST(q.boost * CAST(ln(((SELECT n FROM fstats) + 1) / (ts.df + 1.0))
                             + 1.0 AS FLOAT) AS FLOAT) AS w
  FROM qterms q JOIN tstats ts ON ts.term = q.term
),
clause_scores AS (
  SELECT tf.did,
         CAST(CAST(CAST(sqrt(CAST(tf.tf AS DOUBLE)) AS FLOAT) * w.w AS FLOAT)
              * CAST(1.0 / sqrt(CAST(d.dlen AS DOUBLE)) AS FLOAT) AS FLOAT) AS s
  FROM tf
  JOIN weights w ON w.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
summed AS (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM clause_scores GROUP BY did
)
"""
    return f"WITH {BASE_CTES},{body}{_topk_tail(must, must_not, k)}"


def boolean_sim_topk_sql(query, k: int) -> str:
    """BooleanSimilarity top-k: every matching scoring clause contributes
    exactly f32(boost); per-doc sum in DOUBLE → f32."""
    clauses, scoring, must, must_not = _boolean_filtered(query)
    if not scoring:
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS score WHERE FALSE"
    qvals = ",".join(
        f"({i}, '{t}', CAST({b!r} AS FLOAT))" for i, (t, b) in enumerate(scoring)
    )
    body = f"""
qterms(cid, term, boost) AS (VALUES {qvals}),
clause_scores AS (
  SELECT tf.did, q.boost AS s
  FROM tf JOIN qterms q ON q.term = tf.term
),
summed AS (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM clause_scores GROUP BY did
)
"""
    return f"WITH {BASE_CTES},{body}{_topk_tail(must, must_not, k)}"


def lm_dirichlet_topk_sql(query, k: int, mu: float = 2000.0) -> str:
    """LMDirichletSimilarity top-k: clause score =
    f32(max(0, boost·(ln(1 + tf/(μ·P)) + ln(μ/(dlen+μ))))) with
    P = (ttf+1)/(sum_ttf+1) in DOUBLE; per-doc clause sum in DOUBLE → f32.
    μ rounds through float32 first, mirroring the engine scorer's
    ``mu=float(F32(self.mu))`` (bit-parity for non-f32-representable μ)."""
    mu = float(np.float32(mu))
    clauses, scoring, must, must_not = _boolean_filtered(query)
    if not scoring:
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS score WHERE FALSE"
    qvals = ",".join(
        f"({i}, '{t}', CAST({b!r} AS DOUBLE))" for i, (t, b) in enumerate(scoring)
    )
    body = f"""
tstats2 AS (
  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS ttf
  FROM tf GROUP BY term
),
qterms(cid, term, boost) AS (VALUES {qvals}),
probs AS (
  SELECT q.cid, q.term, q.boost,
         (ts.ttf + 1.0) / ((SELECT sum_ttf FROM fstats) + 1.0) AS p
  FROM qterms q JOIN tstats2 ts ON ts.term = q.term
),
clause_scores AS (
  SELECT tf.did,
         CAST(GREATEST(
           pr.boost * (ln(1 + CAST(CAST(tf.tf AS FLOAT) AS DOUBLE)
                              / ({mu!r} * pr.p))
                       + ln({mu!r} / (CAST(d.dlen AS DOUBLE) + {mu!r}))),
           0.0) AS FLOAT) AS s
  FROM tf
  JOIN probs pr ON pr.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
summed AS (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM clause_scores GROUP BY did
)
"""
    return f"WITH {BASE_CTES},{body}{_topk_tail(must, must_not, k)}"


def dfr_gb2_topk_sql(query, k: int) -> str:
    """DFR GB2 top-k: per clause (double math, one float cast):
    F = ttf+1; λ = F/(N+F); A = log2(λ+1); B = log2((1+λ)/λ);
    ae = (F+1)/(df+1); tfn = tf·log2(1 + avgdl/dlen) with avgdl =
    sum_ttf/N in DOUBLE; s = f32(boost·(B − (B−A)/(1+tfn))·ae)."""
    clauses, scoring, must, must_not = _boolean_filtered(query)
    if not scoring:
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS score WHERE FALSE"
    qvals = ",".join(
        f"({i}, '{t}', CAST({b!r} AS DOUBLE))" for i, (t, b) in enumerate(scoring)
    )
    body = f"""
tstats2 AS (
  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS ttf
  FROM tf GROUP BY term
),
avg_d AS (
  SELECT CAST(sum_ttf AS DOUBLE) / n AS avgdl, CAST(n AS DOUBLE) AS nn
  FROM fstats
),
qterms(cid, term, boost) AS (VALUES {qvals}),
parts AS (
  SELECT q.cid, q.term, q.boost,
         ts.ttf + 1.0 AS f,
         (ts.ttf + 1.0) / ((SELECT nn FROM avg_d) + ts.ttf + 1.0) AS lam,
         (ts.ttf + 2.0) / (ts.df + 1.0) AS ae
  FROM qterms q JOIN tstats2 ts ON ts.term = q.term
),
clause_scores AS (
  SELECT tf.did,
         CAST(p.boost
              * ((ln((1 + p.lam) / p.lam) / ln(2))
                 - ((ln((1 + p.lam) / p.lam) / ln(2))
                    - (ln(p.lam + 1) / ln(2)))
                   / (1 + CAST(CAST(tf.tf AS FLOAT) AS DOUBLE)
                          * (ln(1 + (SELECT avgdl FROM avg_d)
                                    / CAST(d.dlen AS DOUBLE)) / ln(2))))
              * p.ae AS FLOAT) AS s
  FROM tf
  JOIN parts p ON p.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
summed AS (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM clause_scores GROUP BY did
)
"""
    return f"WITH {BASE_CTES},{body}{_topk_tail(must, must_not, k)}"


def ib_ll_topk_sql(query, k: int) -> str:
    """IB LL·DF·H2(c=1) top-k: λ = f32((df+1)/(N+1)) widened to double;
    tfn = tf·log2(1 + avgdl/dlen), avgdl = sum_ttf/N in DOUBLE;
    s = f32(boost · (−ln(λ/(tfn+λ))))."""
    clauses, scoring, must, must_not = _boolean_filtered(query)
    if not scoring:
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS score WHERE FALSE"
    qvals = ",".join(
        f"({i}, '{t}', CAST({b!r} AS DOUBLE))" for i, (t, b) in enumerate(scoring)
    )
    body = f"""
tstats2 AS (
  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS ttf
  FROM tf GROUP BY term
),
avg_d AS (
  SELECT CAST(sum_ttf AS DOUBLE) / n AS avgdl, CAST(n AS DOUBLE) AS nn
  FROM fstats
),
qterms(cid, term, boost) AS (VALUES {qvals}),
parts AS (
  -- LambdaDF.java:36-38: λ = f32((df+1)/(N+1)), nextDown'ed when exactly 1
  -- (a term present in EVERY doc); nextDown(1f) = 1 - 2^-24
  SELECT q.cid, q.term, q.boost,
         CASE WHEN CAST((ts.df + 1.0) / ((SELECT nn FROM avg_d) + 1.0)
                        AS FLOAT) = CAST(1.0 AS FLOAT)
              THEN CAST(CAST(0.99999994 AS FLOAT) AS DOUBLE)
              ELSE CAST(CAST((ts.df + 1.0)
                             / ((SELECT nn FROM avg_d) + 1.0) AS FLOAT)
                        AS DOUBLE)
         END AS lam
  FROM qterms q JOIN tstats2 ts ON ts.term = q.term
),
clause_scores AS (
  SELECT tf.did,
         CAST(p.boost * (-ln(p.lam
              / (CAST(CAST(tf.tf AS FLOAT) AS DOUBLE)
                 * (ln(1 + (SELECT avgdl FROM avg_d)
                           / CAST(d.dlen AS DOUBLE)) / ln(2))
                 + p.lam))) AS FLOAT) AS s
  FROM tf
  JOIN parts p ON p.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
summed AS (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM clause_scores GROUP BY did
)
"""
    return f"WITH {BASE_CTES},{body}{_topk_tail(must, must_not, k)}"


def dfi_chi2_topk_sql(query, k: int) -> str:
    """DFI chi-squared top-k: expected = (ttf+1)·dlen/(T+1), T = sum_ttf;
    s = 0 when tf ≤ expected else f32(boost·log2((tf−expected)²/expected+1))."""
    clauses, scoring, must, must_not = _boolean_filtered(query)
    if not scoring:
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS score WHERE FALSE"
    qvals = ",".join(
        f"({i}, '{t}', CAST({b!r} AS DOUBLE))" for i, (t, b) in enumerate(scoring)
    )
    body = f"""
tstats2 AS (
  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS ttf
  FROM tf GROUP BY term
),
qterms(cid, term, boost) AS (VALUES {qvals}),
parts AS (
  SELECT q.cid, q.term, q.boost, ts.ttf + 1.0 AS f1
  FROM qterms q JOIN tstats2 ts ON ts.term = q.term
),
clause_scores AS (
  SELECT tf.did,
         CASE WHEN CAST(CAST(tf.tf AS FLOAT) AS DOUBLE)
                   <= p.f1 * CAST(d.dlen AS DOUBLE)
                      / ((SELECT sum_ttf FROM fstats) + 1.0)
              THEN CAST(0.0 AS FLOAT)
              ELSE CAST(p.boost * (ln(
                     (CAST(CAST(tf.tf AS FLOAT) AS DOUBLE)
                      - p.f1 * CAST(d.dlen AS DOUBLE)
                        / ((SELECT sum_ttf FROM fstats) + 1.0))
                     * (CAST(CAST(tf.tf AS FLOAT) AS DOUBLE)
                        - p.f1 * CAST(d.dlen AS DOUBLE)
                          / ((SELECT sum_ttf FROM fstats) + 1.0))
                     / (p.f1 * CAST(d.dlen AS DOUBLE)
                        / ((SELECT sum_ttf FROM fstats) + 1.0))
                     + 1) / ln(2)) AS FLOAT)
         END AS s
  FROM tf
  JOIN parts p ON p.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
summed AS (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM clause_scores GROUP BY did
)
"""
    return f"WITH {BASE_CTES},{body}{_topk_tail(must, must_not, k)}"


def axiomatic_f2exp_topk_sql(query, k: int, s: float = 0.25,
                             kpar: float = 0.35) -> str:
    """Axiomatic F2EXP top-k: s = f32(boost · tf/(tf + s + s·dlen/avgdl)
    · ((N+1)/df)^k), avgdl = sum_ttf/N in DOUBLE; s/k float32-rounded
    hyperparams (the reference stores them as float)."""
    clauses, scoring, must, must_not = _boolean_filtered(query)
    if not scoring:
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS score WHERE FALSE"
    import numpy as _np

    sf = float(_np.float32(s))
    kf = float(_np.float32(kpar))
    qvals = ",".join(
        f"({i}, '{t}', CAST({b!r} AS DOUBLE))" for i, (t, b) in enumerate(scoring)
    )
    body = f"""
tstats2 AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
),
avg_d AS (
  SELECT CAST(sum_ttf AS DOUBLE) / n AS avgdl, CAST(n AS DOUBLE) AS nn
  FROM fstats
),
qterms(cid, term, boost) AS (VALUES {qvals}),
parts AS (
  SELECT q.cid, q.term, q.boost,
         pow(((SELECT nn FROM avg_d) + 1.0) / ts.df, {kf!r}) AS idf
  FROM qterms q JOIN tstats2 ts ON ts.term = q.term
),
clause_scores AS (
  SELECT tf.did,
         CAST(GREATEST(p.boost
              * (CAST(CAST(tf.tf AS FLOAT) AS DOUBLE)
                 / (CAST(CAST(tf.tf AS FLOAT) AS DOUBLE) + {sf!r}
                    + {sf!r} * CAST(d.dlen AS DOUBLE)
                      / (SELECT avgdl FROM avg_d)))
              * p.idf, 0.0) AS FLOAT) AS s
  FROM tf
  JOIN parts p ON p.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
summed AS (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM clause_scores GROUP BY did
)
"""
    return f"WITH {BASE_CTES},{body}{_topk_tail(must, must_not, k)}"


def constant_score_sql(query, k: int, boost: float = 1.0) -> str:
    """ConstantScoreQuery wrapper: matching docs of a (flat boolean) query,
    k smallest docIDs, score == f32(boost)."""
    clauses, scoring, must, must_not = _boolean_filtered(query)
    should = [t for t, o, _ in clauses if o == ast.SHOULD]
    conds = []
    for t in must:
        conds.append(
            f"EXISTS (SELECT 1 FROM tf m WHERE m.did = d.did AND m.term = '{t}')"
        )
    for t in must_not:
        conds.append(
            f"NOT EXISTS (SELECT 1 FROM tf x WHERE x.did = d.did AND x.term = '{t}')"
        )
    if not must:
        if should:
            ors = " OR ".join(
                f"EXISTS (SELECT 1 FROM tf s WHERE s.did = d.did AND s.term = '{t}')"
                for t in should
            )
            conds.append(f"({ors})")
        else:
            conds.append("FALSE")
    return f"""
WITH {BASE_CTES}
SELECT d.did AS doc_id, CAST(CAST({boost!r} AS FLOAT) AS DOUBLE) AS score
FROM dls d
WHERE {" AND ".join(conds)}
ORDER BY d.did ASC
LIMIT {k}
"""


def function_score_sql(query, k: int, rescore_expr: str | None = None) -> str:
    """FunctionScoreQuery boostByValue gate: BM25 score × ln(1+dl) in
    DOUBLE, cast once to f32 — mirrors searcher.function_score with
    value_col = ln(1 + dl). ``rescore_expr`` overrides the rescoring
    formula (DOUBLE-typed SQL over ``s.score`` = BM25 f32 score and
    ``dd.dl`` = doc length) for the compiled-expression gate."""
    clauses = _clause_rows(query)
    scoring = [(t, b) for t, o, b in clauses if o in (ast.MUST, ast.SHOULD)]
    must = sorted({t for t, o, _ in clauses if o in (ast.MUST, ast.FILTER)})
    must_not = sorted({t for t, o, _ in clauses if o == ast.MUST_NOT})
    qvals = ",".join(
        f"({i}, '{t}', CAST({b!r} AS FLOAT))" for i, (t, b) in enumerate(scoring)
    )
    body = f"""
qterms(cid, term, boost) AS (VALUES {qvals}),
weights AS (
  SELECT q.cid, q.term,
         q.boost * CAST(ln(1 + ((SELECT n FROM fstats) - ts.df + 0.5)
                              / (ts.df + 0.5)) AS FLOAT) AS w
  FROM qterms q JOIN tstats ts ON ts.term = q.term
),
clause_scores AS (
  SELECT tf.did,
         w.w - w.w / (CAST(1 AS FLOAT)
                      + CAST(tf.tf AS FLOAT)
                        * (CAST(1 AS FLOAT)
                           / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                      + ({B} * CAST(d.dlen AS FLOAT))
                                        / (SELECT avgdl FROM fstats))))) AS s
  FROM tf
  JOIN weights w ON w.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
summed AS (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM clause_scores GROUP BY did
),
rescored AS (
  SELECT s.did,
         CAST({rescore_expr or
               "CAST(s.score AS DOUBLE) * ln(1 + CAST(dd.dl AS DOUBLE))"}
              AS FLOAT) AS score
  FROM summed s JOIN dls dd ON dd.did = s.did
)
"""
    conds = []
    for t in must:
        conds.append(
            f"EXISTS (SELECT 1 FROM tf m WHERE m.did = rescored.did AND m.term = '{t}')"
        )
    for t in must_not:
        conds.append(
            f"NOT EXISTS (SELECT 1 FROM tf x WHERE x.did = rescored.did AND x.term = '{t}')"
        )
    where = (" WHERE " + " AND ".join(conds)) if conds else ""
    return f"""
WITH {BASE_CTES},{body}
SELECT did AS doc_id, CAST(score AS DOUBLE) AS score
FROM rescored{where}
ORDER BY score DESC, did ASC
LIMIT {k}
"""


def expression_score_sql(query, k: int) -> str:
    """Compiled-expression gate (``lucene/expressions`` JavascriptCompiler
    analogue): rescore = ``dl > 40 ? _score * 1.5 : _score + sqrt(dl) *
    0.25`` — ternary/comparison/arithmetic/function nodes, all DOUBLE math,
    one final f32 cast, mirroring searcher.expression_score with the same
    source string."""
    return function_score_sql(query, k, rescore_expr=(
        "CASE WHEN CAST(dd.dl AS DOUBLE) > CAST(40 AS DOUBLE) "
        "THEN CAST(s.score AS DOUBLE) * CAST(1.5 AS DOUBLE) "
        "ELSE CAST(s.score AS DOUBLE) "
        "+ sqrt(CAST(dd.dl AS DOUBLE)) * CAST(0.25 AS DOUBLE) END"
    ))


def lm_jelinek_mercer_topk_sql(query, k: int, lam: float = 0.1) -> str:
    """LMJelinekMercerSimilarity top-k: clause score =
    f32(boost · ln(1 + ((1−λ)·tf/dlen) / (λ·P))), double math,
    P = (ttf+1)/(sum_ttf+1); per-doc clause sum in DOUBLE → f32."""
    clauses, scoring, must, must_not = _boolean_filtered(query)
    if not scoring:
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS score WHERE FALSE"
    lam32 = float(np.float32(lam))
    qvals = ",".join(
        f"({i}, '{t}', CAST({b!r} AS DOUBLE))" for i, (t, b) in enumerate(scoring)
    )
    body = f"""
tstats2 AS (
  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS ttf
  FROM tf GROUP BY term
),
qterms(cid, term, boost) AS (VALUES {qvals}),
probs AS (
  SELECT q.cid, q.term, q.boost,
         (ts.ttf + 1.0) / ((SELECT sum_ttf FROM fstats) + 1.0) AS p
  FROM qterms q JOIN tstats2 ts ON ts.term = q.term
),
clause_scores AS (
  SELECT tf.did,
         CAST(pr.boost * ln(1 + ((1.0 - {lam32!r}) * CAST(CAST(tf.tf AS FLOAT) AS DOUBLE)
                                 / CAST(d.dlen AS DOUBLE))
                                / ({lam32!r} * pr.p)) AS FLOAT) AS s
  FROM tf
  JOIN probs pr ON pr.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
summed AS (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM clause_scores GROUP BY did
)
"""
    return f"WITH {BASE_CTES},{body}{_topk_tail(must, must_not, k)}"


def highlight_sql(terms, window: int = 4, limit: int = 100) -> str:
    """Snippet extraction mirror of ``search.highlight.highlight_df``:
    tokens of the lowercased text, first query-term position, ±window token
    slice, matched terms wrapped in <b>…</b>."""
    inlist = ", ".join(f"'{t}'" for t in terms)
    positions = ", ".join(f"list_position(toks, '{t}')" for t in terms)
    return f"""
WITH d0 AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS toks
  FROM documents
),
sel AS (
  SELECT doc_id, toks,
         list_min(list_filter([{positions}],
                              x -> x IS NOT NULL AND x > 0)) AS fpos
  FROM d0
),
snip AS (
  SELECT doc_id,
         list_transform(
           list_slice(toks, greatest(fpos - {window}, 1),
                      greatest(fpos - {window}, 1) + {2 * window}),
           x -> CASE WHEN x IN ({inlist})
                     THEN '<b>' || x || '</b>' ELSE x END) AS marked
  FROM sel WHERE fpos IS NOT NULL
)
SELECT doc_id, array_to_string(marked, ' ') AS snippet
FROM snip
ORDER BY doc_id
LIMIT {limit}
"""


def passage_highlight_sql(terms, passage_len: int = 30, limit: int = 100,
                          k1: float = 1.2, b: float = 0.75,
                          pivot: float = 87.0) -> str:
    """Best-passage mirror of ``highlight.passage_highlight_df``
    (PassageScorer.java:78-136 formulas over fixed token windows): per
    unique matching term, tf(freqInPassage, plen) × weight(dl, ttf); score
    = norm(start) × Σ in DOUBLE, one f32 cast; top-1 passage per doc by
    (score DESC, start ASC)."""
    inlist = ", ".join(f"'{t}'" for t in terms)
    p = float(passage_len)
    return f"""
WITH arrs AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS arr
  FROM documents
),
toksp AS (
  SELECT doc_id, unnest(arr) AS term,
         generate_subscripts(arr, 1) - 1 AS pos,
         len(arr) AS dl
  FROM arrs
),
m AS (SELECT * FROM toksp WHERE term IN ({inlist})),
ttf AS (
  SELECT doc_id, term, count(*)::BIGINT AS ttf, any_value(dl) AS dl
  FROM m GROUP BY 1, 2
),
freqs AS (
  SELECT doc_id, pos // {passage_len} AS pid, term, count(*)::BIGINT AS freq
  FROM m GROUP BY 1, 2, 3
),
scored AS (
  SELECT f.doc_id, f.pid,
         CAST(SUM(
           (CAST(f.freq AS DOUBLE)
            / (CAST(f.freq AS DOUBLE)
               + {k1} * ((1 - {b})
                         + {b} * least({p}, CAST(t.dl AS DOUBLE)
                                            - f.pid * {p}) / {pivot})))
           * ({k1 + 1.0} * ln(1 + (1 + CAST(t.dl AS DOUBLE) / {pivot} + 0.5)
                                  / (CAST(t.ttf AS DOUBLE) + 0.5)))
         ) * (1 + 1 / ln({pivot} + f.pid * {p})) AS FLOAT) AS score
  FROM freqs f JOIN ttf t ON t.doc_id = f.doc_id AND t.term = f.term
  GROUP BY 1, 2
),
best AS (
  SELECT doc_id, pid, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, pid ASC) AS rn
  FROM scored
)
SELECT b.doc_id,
       (b.pid * {passage_len})::BIGINT AS passage_start,
       CAST(b.score AS DOUBLE) AS score,
       array_to_string(
         list_transform(
           list_slice(a.arr, b.pid * {passage_len} + 1,
                      b.pid * {passage_len} + {passage_len}),
           x -> CASE WHEN x IN ({inlist})
                     THEN '<b>' || x || '</b>' ELSE x END),
         ' ') AS snippet
FROM best b JOIN arrs a ON a.doc_id = b.doc_id
WHERE b.rn = 1
ORDER BY b.doc_id
LIMIT {limit}
"""


# --------------------------------------------------------------------------
# Round-3 similarity sweep: generic scaffold + 12 model oracles. Each mirrors
# its engine scorer's DOUBLE math with a single FLOAT cast per clause score
# (SimilarityBase.java:223-225 contract); per-doc clause sum in DOUBLE → f32.
# --------------------------------------------------------------------------


def _subst_stats(expr: str) -> str:
    return (expr
            .replace("TFD", "CAST(CAST(tf.tf AS FLOAT) AS DOUBLE)")
            .replace("DLD", "CAST(d.dlen AS DOUBLE)")
            .replace("AVGDL", "(SELECT avgdl FROM avg_d)")
            .replace("NN", "(SELECT nn FROM avg_d)")
            .replace("STTF", "(SELECT sum_ttf FROM fstats)"))


def _sim_topk_sql(query, k: int, parts_cols: str, score_expr: str) -> str:
    """Shared CTE scaffold for single-term-clause similarity models:
    ``parts_cols`` computes per-term constants (may use ts.df / ts.ttf /
    NN / AVGDL / STTF); ``score_expr`` the per-posting DOUBLE score (may use
    TFD / DLD / p.<col> / the same stats macros)."""
    clauses, scoring, must, must_not = _boolean_filtered(query)
    if not scoring:
        return ("SELECT CAST(NULL AS BIGINT) AS doc_id, "
                "CAST(NULL AS DOUBLE) AS score WHERE FALSE")
    qvals = ",".join(
        f"({i}, '{t}', CAST({b!r} AS DOUBLE))"
        for i, (t, b) in enumerate(scoring)
    )
    body = f"""
tstats2 AS (
  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS ttf
  FROM tf GROUP BY term
),
avg_d AS (
  SELECT CAST(sum_ttf AS DOUBLE) / n AS avgdl, CAST(n AS DOUBLE) AS nn
  FROM fstats
),
qterms(cid, term, boost) AS (VALUES {qvals}),
parts AS (
  SELECT q.cid, q.term, q.boost, {_subst_stats(parts_cols)}
  FROM qterms q JOIN tstats2 ts ON ts.term = q.term
),
clause_scores AS (
  SELECT tf.did, CAST({_subst_stats(score_expr)} AS FLOAT) AS s
  FROM tf
  JOIN parts p ON p.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
summed AS (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM clause_scores GROUP BY did
)
"""
    return f"WITH {BASE_CTES},{body}{_topk_tail(must, must_not, k)}"


def indri_dirichlet_topk_sql(query, k: int, mu: float = 2000.0) -> str:
    """IndriDirichlet: ln((tf + μ·P)/(dl + μ)), P = ttf/sumTTF; the boost is
    deliberately absent (IndriDirichletSimilarity.java:62-66 ignores it)."""
    import numpy as _np

    muf = float(_np.float32(mu))
    return _sim_topk_sql(
        query, k,
        parts_cols="CAST(ts.ttf AS DOUBLE) / STTF AS p",
        score_expr=f"ln((TFD + {muf!r} * p.p) / (DLD + {muf!r}))",
    )


def dfr_inl2_topk_sql(query, k: int) -> str:
    """DFR I(n)L2: boost · log2((N+1)/(df+0.5)) · (1 − 1/(1+tfn)),
    tfn = tf·log2(1 + avgdl/dl)."""
    return _sim_topk_sql(
        query, k,
        parts_cols="ln((NN + 1.0) / (ts.df + 0.5)) / ln(2) AS a",
        score_expr=("p.boost * p.a * (1 - 1 / (1 + TFD"
                    " * (ln(1 + AVGDL / DLD) / ln(2))))"),
    )


def dfr_ineb2_topk_sql(query, k: int) -> str:
    """DFR I(ne)B2: ne = N·(1−((N−1)/N)^ttf); A = log2((N+1)/(ne+0.5));
    ae = (ttf+2)/(df+1); boost · A · ae · (1 − 1/(1+tfn))."""
    return _sim_topk_sql(
        query, k,
        parts_cols=(
            "ln((NN + 1.0) / (NN * (1 - pow((NN - 1.0) / NN, "
            "CAST(ts.ttf AS DOUBLE))) + 0.5)) / ln(2) AS a, "
            "(ts.ttf + 2.0) / (ts.df + 1.0) AS ae"),
        score_expr=("p.boost * p.a * p.ae * (1 - 1 / (1 + TFD"
                    " * (ln(1 + AVGDL / DLD) / ln(2))))"),
    )


def ib_spl_topk_sql(query, k: int) -> str:
    """IB SPL·TTF·H2: λ = f32((ttf+1)/(N+1)) (nextUp'ed at exactly 1 —
    LambdaTTF.java:35-38; nextUp(1f) = 1+2^-23); q = 1−1/(tfn+1);
    boost · (−ln((λ^q − λ)/(1 − λ)))."""
    return _sim_topk_sql(
        query, k,
        parts_cols=(
            "CASE WHEN CAST((ts.ttf + 1.0) / (NN + 1.0) AS FLOAT)"
            " = CAST(1.0 AS FLOAT)"
            " THEN CAST(CAST(1.0000001192092896 AS FLOAT) AS DOUBLE)"
            " ELSE CAST(CAST((ts.ttf + 1.0) / (NN + 1.0) AS FLOAT) AS DOUBLE)"
            " END AS lam"),
        score_expr=(
            "p.boost * (-ln((pow(p.lam, 1 - 1 / (TFD"
            " * (ln(1 + AVGDL / DLD) / ln(2)) + 1)) - p.lam) / (1 - p.lam)))"),
    )


def dfi_measure_topk_sql(query, k: int, measure: str) -> str:
    """DFI saturated ((tf−e)/e) / standardized ((tf−e)/√e): same expected
    value e = (ttf+1)·dl/(T+1) and log2(measure+1) envelope as chi²;
    tf ≤ e → 0."""
    e = "(p.f1 * DLD / (STTF + 1.0))"
    den = f"sqrt{e}" if measure == "std" else e
    return _sim_topk_sql(
        query, k,
        parts_cols="ts.ttf + 1.0 AS f1",
        score_expr=(
            f"CASE WHEN TFD <= {e} THEN CAST(0.0 AS DOUBLE) "
            f"ELSE p.boost * (ln((TFD - {e}) / {den} + 1) / ln(2)) END"),
    )


def axiomatic_variant_topk_sql(query, k: int, variant: str,
                               s: float = 0.25, kpar: float = 0.35,
                               query_len: int = 1) -> str:
    """Axiomatic F1/F3 × EXP/LOG + F2LOG (F2EXP has its own oracle above):
    score = max(0, boost · (tf · ln · tfln · idf − gamma)) with the component
    table from Axiomatic*.java; gamma's coefficient is precomputed in Python
    double to mirror the engine's op order exactly."""
    import numpy as _np

    sf = float(_np.float32(s))
    kf = float(_np.float32(kpar))
    fam, kind = variant[:2], variant[2:]
    idf = (f"pow((NN + 1.0) / ts.df, {kf!r})" if kind == "exp"
           else "ln((NN + 1.0) / ts.df)")
    comp = "p.idf"
    if fam in ("f1", "f3"):
        comp = f"(1 + ln(1 + ln(TFD + 1.0))) * {comp}"
    if fam == "f1":
        comp = f"{comp} * ((AVGDL + {sf!r}) / (AVGDL + DLD * {sf!r}))"
    if fam == "f2":
        comp = f"(TFD / (TFD + {sf!r} + {sf!r} * DLD / AVGDL)) * {comp}"
    gamma = ""
    if fam == "f3":
        # engine precomputes gamma_coeff = f32(s)·queryLen/avgdl in double;
        # avgdl is per-index so fold it symbolically, same op order
        gamma = (f" - (DLD - {float(query_len)!r})"
                 f" * ({sf!r} * {float(query_len)!r} / AVGDL)")
    return _sim_topk_sql(
        query, k,
        parts_cols=f"{idf} AS idf",
        score_expr=f"GREATEST(p.boost * ({comp}{gamma}), 0.0)",
    )


def multi_bm25_classic_topk_sql(query, k: int) -> str:
    """MultiSimilarity(BM25, Classic) (MultiSimilarity.java:64-70): per-clause
    score is the float32 sum of the two sub-scores, each computed with its
    own proven float32 op sequence (bm25_topk_sql / classic_topk_sql)."""
    clauses, scoring, must, must_not = _boolean_filtered(query)
    if not scoring:
        return ("SELECT CAST(NULL AS BIGINT) AS doc_id, "
                "CAST(NULL AS DOUBLE) AS score WHERE FALSE")
    qvals = ",".join(
        f"({i}, '{t}', CAST({b!r} AS FLOAT))"
        for i, (t, b) in enumerate(scoring)
    )
    body = f"""
qterms(cid, term, boost) AS (VALUES {qvals}),
weights AS (
  SELECT q.cid, q.term,
         q.boost * CAST(ln(1 + ((SELECT n FROM fstats) - ts.df + 0.5)
                              / (ts.df + 0.5)) AS FLOAT) AS wb,
         CAST(q.boost * CAST(ln(((SELECT n FROM fstats) + 1) / (ts.df + 1.0))
                             + 1.0 AS FLOAT) AS FLOAT) AS wc
  FROM qterms q JOIN tstats ts ON ts.term = q.term
),
clause_scores AS (
  SELECT tf.did,
         CAST(
           (w.wb - w.wb / (CAST(1 AS FLOAT)
                      + CAST(tf.tf AS FLOAT)
                        * (CAST(1 AS FLOAT)
                           / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                      + ({B} * CAST(d.dlen AS FLOAT))
                                        / (SELECT avgdl FROM fstats))))))
           + CAST(CAST(CAST(sqrt(CAST(tf.tf AS DOUBLE)) AS FLOAT) * w.wc
                       AS FLOAT)
                  * CAST(1.0 / sqrt(CAST(d.dlen AS DOUBLE)) AS FLOAT)
                  AS FLOAT)
         AS FLOAT) AS s
  FROM tf
  JOIN weights w ON w.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
summed AS (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM clause_scores GROUP BY did
)
"""
    return f"WITH {BASE_CTES},{body}{_topk_tail(must, must_not, k)}"


def mlt_topk_sql(src_did: int, k: int, min_tf: int = 2, min_df: int = 5,
                 max_terms: int = 25) -> str:
    """MoreLikeThis oracle — term selection AND scoring fully inside SQL
    (``queries/mlt/MoreLikeThis.java:625-683``): the source doc's tf comes
    from the corpus recount, candidate terms filter on tf ≥ min_tf and
    df ≥ min_df, the float32 selection score is ``tf × (float)(ln((N+1)/
    (df+1)) + 1.0)`` (ClassicSimilarity idf), the best ``max_terms`` terms
    (score DESC, term ASC — the engine's pinned tie-break) form an
    unboosted SHOULD set, and the hit list is standard float32 BM25
    top-k over that set."""
    return f"""
WITH {BASE_CTES},
src AS (SELECT term, tf FROM tf WHERE did = {src_did}),
mcand AS (
  SELECT s.term,
         CAST(s.tf AS FLOAT)
         * CAST(ln(((SELECT n FROM fstats) + 1) / (ts.df + 1)::DOUBLE)
                + 1.0 AS FLOAT) AS mscore
  FROM src s JOIN tstats ts ON ts.term = s.term
  WHERE s.tf >= {min_tf} AND ts.df >= {min_df}
),
qsel AS (SELECT term FROM mcand ORDER BY mscore DESC, term ASC LIMIT {max_terms}),
weights AS (
  SELECT q.term,
         CAST(ln(1 + ((SELECT n FROM fstats) - ts.df + 0.5)
                    / (ts.df + 0.5)) AS FLOAT) AS w
  FROM qsel q JOIN tstats ts ON ts.term = q.term
),
clause_scores AS (
  SELECT tf.did,
         w.w - w.w / (CAST(1 AS FLOAT)
                      + CAST(tf.tf AS FLOAT)
                        * (CAST(1 AS FLOAT)
                           / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                      + ({B} * CAST(d.dlen AS FLOAT))
                                        / (SELECT avgdl FROM fstats))))) AS s
  FROM tf
  JOIN weights w ON w.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
summed AS (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM clause_scores GROUP BY did
)
SELECT did AS doc_id, CAST(score AS DOUBLE) AS score
FROM summed
ORDER BY score DESC, did ASC
LIMIT {k}
"""


def sloppy_multiphrase_count_sql(slots, slop: int) -> str:
    """Sloppy MultiPhrase hit count: slot i matches ANY of its terms
    (union postings, ``MultiPhraseQuery.java:303``), and a doc hits when
    some per-slot pick has adjusted-window width ≤ slop. For disjoint slot
    term sets the slot position lists are repeat-free, so the greedy
    matcher finds a match iff one exists (same pytest-verified property as
    the repeat-free sloppy phrase) — brute-force existence is an exact
    count oracle."""
    n = len(slots)
    joins = "".join(
        f"\n  JOIN toksp t{i} ON t{i}.did = t0.did" for i in range(1, n)
    )
    conds = []
    for i, slot in enumerate(slots):
        inlist = ", ".join(f"'{t}'" for t in slot)
        conds.append(f"t{i}.term IN ({inlist})")
    adj = ", ".join(f"t{i}.pos - {i}" for i in range(n))
    conds.append(f"greatest({adj}) - least({adj}) <= {slop}")
    return f"""
WITH {BASE_CTES},{_TOKSP_CTE}
SELECT count(*)::BIGINT AS hits FROM (
  SELECT t0.did FROM toksp t0{joins}
  WHERE {" AND ".join(conds)}
  GROUP BY t0.did
)
"""


def span_near_topk_sql(terms, slop: int, k: int, in_order: bool = True,
                       boost: float = 1.0, max_end: int | None = None,
                       exclude: str | None = None, pre: int = 0,
                       post: int = 0, contain: str | None = None) -> str:
    """Span-near oracle (``spans/SpanNearQuery.java:41`` match semantics,
    constant-score v1): k smallest matching docIDs. Ordered: a strictly
    increasing position per term with intervening width ≤ slop; unordered:
    all-distinct positions with window max−min−(n−1) ≤ slop. ``max_end``
    adds the SpanFirstQuery end bound (span end ≤ max_end); ``exclude``
    adds the SpanNotQuery rejection (no exclude-term position within
    [start − pre, end + post]). ``contain`` adds the SpanContaining /
    SpanWithin requirement (``spans/SpanContainingQuery.java:36``,
    single-term little: some contain-term position inside [start, end]).
    A tuple element of ``terms`` is a SpanOr clause
    (``spans/SpanOrQuery.java:38``) — that sub-span matches any of its
    alternatives' positions (term IN (…)). A ``{"like": pattern}`` element
    matches any term LIKE the pattern — the SQL-side equivalent of the
    engine expanding a prefix/wildcard slot against the term dictionary
    (ComplexPhraseQueryParser slots), dictionary-independent."""
    n = len(terms)
    joins = "".join(
        f"\n  JOIN toksp t{i} ON t{i}.did = t0.did" for i in range(1, n)
    )

    def slot_cond(i, t):
        if isinstance(t, dict):
            return f"t{i}.term LIKE '{t['like']}' ESCAPE '\\'"
        if isinstance(t, tuple):
            return f"t{i}.term IN ({', '.join(repr(a) for a in t)})"
        return f"t{i}.term = '{t}'"

    conds = [slot_cond(i, t) for i, t in enumerate(terms)]
    if in_order:
        conds += [f"t{i}.pos > t{i - 1}.pos" for i in range(1, n)]
        conds.append(f"t{n - 1}.pos - t0.pos - {n - 1} <= {slop}")
        lo_pos, hi_pos = "t0.pos", f"t{n - 1}.pos"
    else:
        for i in range(n):
            for j in range(i + 1, n):
                conds.append(f"t{i}.pos <> t{j}.pos")
        allp = ", ".join(f"t{i}.pos" for i in range(n))
        conds.append(f"greatest({allp}) - least({allp}) - {n - 1} <= {slop}")
        lo_pos, hi_pos = f"least({allp})", f"greatest({allp})"
    if max_end is not None:
        # toksp positions are 1-based, so span end() (0-based last pos + 1)
        # equals the 1-based position itself
        conds.append(f"{hi_pos} <= {max_end}")
    if exclude is not None:
        conds.append(
            f"NOT EXISTS (SELECT 1 FROM toksp x WHERE x.did = t0.did"
            f" AND x.term = '{exclude}'"
            f" AND x.pos BETWEEN {lo_pos} - {pre} AND {hi_pos} + {post})"
        )
    if contain is not None:
        if exclude is not None:
            # mirrors the kernel's boundary: the engine refuses the
            # combination, so an oracle for it would gate nothing
            raise NotImplementedError(
                "exclude and contain cannot be combined in one span query")
        conds.append(
            f"EXISTS (SELECT 1 FROM toksp x WHERE x.did = t0.did"
            f" AND x.term = '{contain}'"
            f" AND x.pos BETWEEN {lo_pos} AND {hi_pos})"
        )
    return f"""
WITH {BASE_CTES},{_TOKSP_CTE}
SELECT did AS doc_id, CAST({boost!r} AS DOUBLE) AS score FROM (
  SELECT t0.did FROM toksp t0{joins}
  WHERE {" AND ".join(conds)}
  GROUP BY t0.did
)
ORDER BY did ASC
LIMIT {k}
"""


def term_automaton_topk_sql(paths, k: int, boost: float = 1.0) -> str:
    """TermAutomatonQuery oracle (``sandbox/.../TermAutomatonQuery.java``
    constant-score v1 contract): k smallest docIDs where SOME accepting
    path matches. An acyclic automaton's accepting paths enumerate finitely;
    ``paths`` lists them as sequences of (position_offset, slot) term
    anchors — ANY arcs contribute only the offset gap (the scorer advances
    any-arcs unconditionally, ``TermAutomatonScorer.java:276-300``). Each
    path becomes one positions self-join; the automaton is their UNION."""
    parts = []
    for path in paths:
        joins = "".join(
            f"\n    JOIN toksp t{i} ON t{i}.did = t0.did"
            for i in range(1, len(path)))
        conds = []
        for i, (off, slot) in enumerate(path):
            if isinstance(slot, tuple):
                conds.append(
                    f"t{i}.term IN ({', '.join(repr(a) for a in slot)})")
            else:
                conds.append(f"t{i}.term = '{slot}'")
            if i:
                conds.append(f"t{i}.pos = t0.pos + {int(off - path[0][0])}")
        parts.append(
            f"  SELECT t0.did FROM toksp t0{joins}\n"
            f"  WHERE {' AND '.join(conds)}")
    union = "\n  UNION\n".join(parts)
    return f"""
WITH {BASE_CTES},{_TOKSP_CTE}
SELECT did AS doc_id, CAST({boost!r} AS DOUBLE) AS score FROM (
{union}
)
ORDER BY doc_id ASC
LIMIT {k}
"""


def interval_topk_sql(slots, k: int, in_order: bool = True,
                      max_gaps: int | None = None, pivot: float = 1.0,
                      boost: float = 1.0,
                      not_containing: str | None = None) -> str:
    """IntervalQuery oracle (``queries/intervals``): top-k docs by the
    saturation score over the source's MINIMAL intervals.

    Semantics recomputed independently in SQL:

    * ordered (2 slots): candidate = each slot-0 position ``s`` chained to
      the first slot-1 position ``> s`` (``OrderedIntervalsSource.java:153``
      greedy re-advance); minimal = MAX(s) per (doc, end) — the iterator's
      in-call minimizing loop.
    * unordered (n slots): candidate end = any slot position ``e``, start =
      LEAST over slots of the latest occurrence ≤ e
      (``UnorderedIntervalsSource.java:147-173`` queue window); minimal =
      starts strictly grow scanning ends ascending.
    * ``Intervals.maxgaps`` filters AFTER minimization
      (``FilteredIntervalsSource.java``): (e − s + 1) − n ≤ max_gaps.
    * freq = the Java-float sequential fold of 1 / max(len − minExtent + 1,
      1) in enumeration (start) order (``IntervalScorer.java:69-75`` — each
      += rounds through float32; ``list_reduce`` with a REAL cast per step
      reproduces it bit-for-bit).
    * score = f32(boost · (1 − pivot/(pivot + freq)))
      (``IntervalScoreFunction.java:56-72`` saturation; DuckDB REAL
      arithmetic rounds per-op like Java float).

    A tuple slot is ``Intervals.or`` of terms (position union). Ordered
    supports exactly 2 slots in SQL (the engine kernel takes any arity —
    pytest covers 3+); unordered supports any arity.
    """
    n = len(slots)

    def in_list(slot):
        names = slot if isinstance(slot, tuple) else (slot,)
        return ", ".join(repr(t) for t in names)

    slot_ctes = ",\n".join(
        f"p{i} AS (SELECT did, pos FROM toksp WHERE term IN ({in_list(s)}))"
        for i, s in enumerate(slots))
    if in_order:
        if n != 2:
            raise NotImplementedError(
                "ordered interval oracle supports exactly 2 slots")
        cand = f"""
cand AS (
  SELECT p0.did, p0.pos AS s, MIN(p1.pos) AS e
  FROM p0 JOIN p1 ON p1.did = p0.did AND p1.pos > p0.pos
  GROUP BY p0.did, p0.pos
),
minimal AS (
  SELECT did, MAX(s) AS s, e FROM cand GROUP BY did, e
)"""
    else:
        lasts = ",\n         ".join(
            f"(SELECT MAX(q.pos) FROM p{i} q"
            f" WHERE q.did = a.did AND q.pos <= a.pos) AS l{i}"
            for i in range(n))
        least = ", ".join(f"l{i}" for i in range(n))
        notnull = " AND ".join(f"l{i} IS NOT NULL" for i in range(n))
        cand = f"""
allpos AS (
  SELECT DISTINCT did, pos FROM toksp
  WHERE term IN ({", ".join(in_list(s) for s in slots)})
),
cand AS (
  SELECT a.did, a.pos AS e,
         {lasts}
  FROM allpos a
),
valid AS (
  SELECT did, least({least}) AS s, e FROM cand WHERE {notnull}
),
minimal AS (
  SELECT did, s, e FROM (
    SELECT did, s, e, lag(s) OVER (PARTITION BY did ORDER BY e) AS prev_s
    FROM valid
  ) WHERE prev_s IS NULL OR s > prev_s
)"""
    conds = []
    if max_gaps is not None:
        conds.append(f"(e - s + 1) - {n} <= {int(max_gaps)}")
    if not_containing is not None:
        # Intervals.notContaining (NotContainingIntervalsSource): drop
        # minimal intervals holding a reference-term position — the
        # reference side of the relation is a width-1 minimal set, so a
        # plain position-EXISTS is exact
        conds.append(
            f"NOT EXISTS (SELECT 1 FROM toksp x WHERE x.did = minimal.did"
            f" AND x.term = '{not_containing}'"
            f" AND x.pos BETWEEN minimal.s AND minimal.e)")
    gap_filter = f"WHERE {' AND '.join(conds)}" if conds else ""
    return f"""
WITH {BASE_CTES},{_TOKSP_CTE},
{slot_ctes},{cand},
filtered AS (
  SELECT did, s, e FROM minimal {gap_filter}
),
freqs AS (
  SELECT did,
         list_reduce(
           list_prepend(CAST(0 AS REAL),
             list(CAST(1.0 AS DOUBLE)
                  / greatest((e - s + 1) - {n} + 1, 1) ORDER BY s)),
           (acc, x) -> CAST(acc + x AS REAL)) AS freq
  FROM filtered GROUP BY did
)
SELECT did AS doc_id,
       -- every op pinned to REAL: list_reduce's return type unifies to
       -- DOUBLE even though each fold step's VALUE is f32-exact, so the
       -- saturation chain must re-cast per op to mirror Java float
       CAST(CAST(CAST({boost!r} AS REAL)
            * CAST(CAST(1.0 AS REAL)
               - CAST(CAST({pivot!r} AS REAL)
                 / CAST(CAST({pivot!r} AS REAL) + CAST(freq AS REAL)
                   AS REAL) AS REAL) AS REAL) AS REAL) AS DOUBLE) AS score
FROM freqs
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def interval_atleast_topk_sql(n: int, slots, k: int,
                              max_gaps: int | None = None,
                              pivot: float = 1.0,
                              boost: float = 1.0) -> str:
    """``Intervals.atLeast(n, …)`` oracle
    (``MinimumShouldMatchIntervalsSource.java``): the window ending at a
    position starts at the n-th LARGEST per-sub latest-occurrence ≤ end —
    computed independently here as ORDER BY … DESC NULLS LAST OFFSET n−1
    over a VALUES list of the per-sub correlated MAXes (fewer than n
    present → NULL → invalid); minimality, gaps = width − n, the f32 freq
    fold, and saturation share the unordered oracle's scaffold."""
    m = len(slots)

    def in_list(slot):
        names = slot if isinstance(slot, tuple) else (slot,)
        return ", ".join(repr(t) for t in names)

    slot_ctes = ",\n".join(
        f"p{i} AS (SELECT did, pos FROM toksp WHERE term IN ({in_list(s)}))"
        for i, s in enumerate(slots))
    lasts = ",\n         ".join(
        f"(SELECT MAX(q.pos) FROM p{i} q"
        f" WHERE q.did = a.did AND q.pos <= a.pos) AS l{i}"
        for i in range(m))
    vals = ", ".join(f"(l{i})" for i in range(m))
    gap_filter = (f"WHERE (e - s + 1) - {n} <= {int(max_gaps)}"
                  if max_gaps is not None else "")
    return f"""
WITH {BASE_CTES},{_TOKSP_CTE},
{slot_ctes},
allpos AS (
  SELECT DISTINCT did, pos FROM toksp
  WHERE term IN ({", ".join(in_list(s) for s in slots)})
),
cand AS (
  SELECT a.did, a.pos AS e,
         {lasts}
  FROM allpos a
),
nth AS (
  SELECT did, e,
         (SELECT l FROM (VALUES {vals}) t(l)
          ORDER BY l DESC NULLS LAST OFFSET {n - 1} LIMIT 1) AS s
  FROM cand
),
minimal AS (
  SELECT did, s, e FROM (
    SELECT did, s, e, lag(s) OVER (PARTITION BY did ORDER BY e) AS prev_s
    FROM nth WHERE s IS NOT NULL
  ) WHERE prev_s IS NULL OR s > prev_s
),
filtered AS (
  SELECT did, s, e FROM minimal {gap_filter}
),
freqs AS (
  SELECT did,
         list_reduce(
           list_prepend(CAST(0 AS REAL),
             list(CAST(1.0 AS DOUBLE)
                  / greatest((e - s + 1) - {n} + 1, 1) ORDER BY s)),
           (acc, x) -> CAST(acc + x AS REAL)) AS freq
  FROM filtered GROUP BY did
)
SELECT did AS doc_id,
       CAST(CAST(CAST({boost!r} AS REAL)
            * CAST(CAST(1.0 AS REAL)
               - CAST(CAST({pivot!r} AS REAL)
                 / CAST(CAST({pivot!r} AS REAL) + CAST(freq AS REAL)
                   AS REAL) AS REAL) AS REAL) AS REAL) AS DOUBLE) AS score
FROM freqs
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def surround_topk_sql(span_terms, dist: int, term: str, k: int) -> str:
    """Surround-parser oracle for ``(a dW b) AND c``
    (``queryparser/surround/parser/QueryParser.jj`` grammar;
    ``DistanceQuery.getSpanNearQuery`` slop = distance − 1): docs matching
    the ORDERED span AND the term, score = f32(1.0 (constant span clause)
    + the term's float32 BM25 clause score summed in double), top-k
    (score DESC, docID ASC)."""
    n = len(span_terms)
    joins = "".join(
        f"\n  JOIN toksp t{i} ON t{i}.did = t0.did" for i in range(1, n))
    conds = [f"t{i}.term = '{t}'" for i, t in enumerate(span_terms)]
    conds += [f"t{i}.pos > t{i - 1}.pos" for i in range(1, n)]
    conds.append(f"t{n - 1}.pos - t0.pos - {n - 1} <= {int(dist) - 1}")
    return f"""
WITH {BASE_CTES},{_TOKSP_CTE},
spandocs AS (
  SELECT t0.did FROM toksp t0{joins}
  WHERE {" AND ".join(conds)}
  GROUP BY t0.did
),
qweights AS (
  SELECT ts.term,
         CAST(ln(1 + ((SELECT n FROM fstats) - ts.df + 0.5)
                     / (ts.df + 0.5)) AS FLOAT) AS w
  FROM tstats ts WHERE ts.term = '{term}'
),
cs AS (
  SELECT tf.did,
         w.w - w.w / (CAST(1 AS FLOAT)
                      + CAST(tf.tf AS FLOAT)
                        * (CAST(1 AS FLOAT)
                           / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                      + ({B} * CAST(d.dlen AS FLOAT))
                                        / (SELECT avgdl FROM fstats))))) AS s
  FROM tf JOIN qweights w ON w.term = tf.term
  JOIN dlen d ON d.did = tf.did
)
SELECT c.did AS doc_id,
       CAST(CAST(CAST(1 AS DOUBLE) + SUM(CAST(c.s AS DOUBLE)) AS FLOAT)
            AS DOUBLE) AS score
FROM cs c JOIN spandocs sp ON sp.did = c.did
GROUP BY c.did
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def span_near_count_sql(terms, slop: int, in_order: bool = True,
                        max_end: int | None = None,
                        exclude: str | None = None, pre: int = 0,
                        post: int = 0, contain: str | None = None) -> str:
    """Hit-count variant of :func:`span_near_topk_sql` (also serves the
    SpanFirst / SpanNot / SpanContaining count gates via the pass-through
    params)."""
    inner = span_near_topk_sql(terms, slop, 10, in_order, max_end=max_end,
                               exclude=exclude, pre=pre, post=post,
                               contain=contain)
    head, _, _tail = inner.rpartition("ORDER BY did ASC")
    head = head.replace(
        "SELECT did AS doc_id, CAST(1.0 AS DOUBLE) AS score FROM (",
        "SELECT count(*)::BIGINT AS hits FROM (", 1)
    return head


def rescore_topk_sql(first_query, second_query, k: int, top_n: int,
                     weight: float) -> str:
    """QueryRescorer oracle (``core/search/QueryRescorer.java:38-104``):
    first-pass BM25 top-N, second-pass BM25 scores left-joined onto those N
    docs, combined = f32(first + weight·second) when the second query
    matches (double product narrowed to float, the ``combine`` contract),
    else the first-pass score unchanged; re-sorted (score DESC, docID ASC),
    top-k."""
    first = bm25_topk_sql(first_query, top_n)
    second = bm25_topk_sql(second_query, 10**9)
    return f"""
WITH firstp AS (SELECT * FROM ({first})),
     secondp AS (SELECT * FROM ({second})),
     combined AS (
       SELECT f.doc_id AS doc_id,
              CAST(CASE WHEN s.doc_id IS NULL THEN f.score
                   ELSE CAST(f.score
                             + CAST({float(weight)!r} AS DOUBLE) * s.score
                             AS FLOAT)
                   END AS DOUBLE) AS score
       FROM firstp f LEFT JOIN secondp s ON s.doc_id = f.doc_id
     )
SELECT doc_id, score FROM combined
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def phrase_prefix_topk_sql(fixed_terms, prefix: str, max_expansions: int,
                           k: int, boost: float = 1.0) -> str:
    """Phrase-prefix oracle (``MultiPhraseQuery.java`` javadoc prefix
    use-case): the last slot = the first ``max_expansions`` dictionary
    terms with ``prefix`` in term order (binary collation == the engine's
    unsigned-UTF-8 enumeration for this ASCII corpus), derived
    INDEPENDENTLY from the token CTEs; freq/idf follow the MultiPhrase
    contract via the shared body (idf per term f32-narrowed then
    double-summed — exact for ≤2^29 f32 addends).

    Requires ≥1 fixed term: the engine normalizes a 1-slot
    MultiPhraseQuery to a SHOULD boolean (the MultiPhraseQuery.rewrite
    single-position contract), which this phrase-shaped SQL does not
    model."""
    if not fixed_terms:
        raise ValueError(
            "phrase_prefix_topk_sql needs >=1 fixed term — a single-slot "
            "MultiPhraseQuery rewrites to a SHOULD boolean in the engine "
            "(MultiPhraseQuery.rewrite); gate that shape with bm25_topk_sql"
        )
    # the engine (_expand_prefix_sorted) matches the prefix literally —
    # escape SQL-LIKE metacharacters so '_'/'%' in a prefix stay literal
    esc = (prefix.replace("\\", "\\\\").replace("%", "\\%")
           .replace("_", "\\_").replace("'", "''"))
    n_slots = len(fixed_terms) + 1
    joins = []
    conds = [f"t0.term = '{fixed_terms[0]}'"]
    for i in range(1, n_slots):
        joins.append(
            f"\n  JOIN toksp t{i} ON t{i}.did = t0.did "
            f"AND t{i}.pos = t0.pos + {i}"
        )
        if i < len(fixed_terms):
            conds.append(f"t{i}.term = '{fixed_terms[i]}'")
        else:
            conds.append(f"t{i}.term IN (SELECT term FROM exp)")
    f32_idf = ("CAST(ln(1 + ((SELECT n FROM fstats) - {df} + 0.5)"
               " / ({df} + 0.5)) AS FLOAT)")
    fixed_idf = " + ".join(
        "CAST(" + f32_idf.format(
            df=f"(SELECT df FROM tstats WHERE term = '{t}')") + " AS DOUBLE)"
        for t in fixed_terms
    )
    exp_idf = ("(SELECT coalesce(sum(CAST("
               + f32_idf.format(df="ts.df")
               + " AS DOUBLE)), 0) FROM tstats ts"
               " JOIN exp e ON ts.term = e.term)")
    exp_cte = f""",
exp AS (
  SELECT term FROM tstats WHERE term LIKE '{esc}%' ESCAPE '\\'
  ORDER BY term LIMIT {int(max_expansions)}
)"""
    return _multiphrase_body_sql(joins, conds,
                                 f"{fixed_idf} + {exp_idf}", exp_cte,
                                 k, boost)


def boost_by_query_topk_sql(query, boost_query, boost: float,
                            k: int) -> str:
    """``FunctionScoreQuery.boostByQuery`` oracle
    (``queries/function/FunctionScoreQuery.java:83-101``): main-query BM25
    scores multiplied by ``boost`` on docs in the boost query's match set
    (double product, f32-narrowed), unchanged elsewhere."""
    main = bm25_topk_sql(query, 10**9)
    bq = bm25_topk_sql(boost_query, 10**9)
    return f"""
WITH mainp AS (SELECT * FROM ({main})),
     bq AS (SELECT doc_id FROM ({bq})),
     combined AS (
       SELECT m.doc_id AS doc_id,
              CAST(CASE WHEN b.doc_id IS NULL THEN m.score
                   ELSE CAST(m.score * CAST({float(boost)!r} AS DOUBLE)
                             AS FLOAT)
                   END AS DOUBLE) AS score
       FROM mainp m LEFT JOIN bq b ON b.doc_id = m.doc_id
     )
SELECT doc_id, score FROM combined
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def feature_saturation_topk_sql(query, weight: float, pivot: float,
                                k: int) -> str:
    """FeatureField SaturationFunction oracle
    (``core/document/FeatureField.java``): feature S = raw token count dl;
    feature score = f32(weight × S/(S + pivot)) (exact IEEE ops only — no
    libm); combined = f32(main + feature), the BooleanScorer
    double-sum-then-narrow contract on a MUST(text) SHOULD(feature)
    boolean."""
    main = bm25_topk_sql(query, 10**9)
    return f"""
WITH mainp AS (SELECT * FROM ({main})),
     {BASE_CTES},
     combined AS (
       SELECT m.doc_id AS doc_id,
              CAST(CAST(m.score
                        + CAST(CAST(CAST({float(weight)!r} AS DOUBLE)
                                    * (CAST(d.dl AS DOUBLE)
                                       / (CAST(d.dl AS DOUBLE)
                                          + CAST({float(pivot)!r} AS DOUBLE)))
                               AS FLOAT) AS DOUBLE)
                   AS FLOAT) AS DOUBLE) AS score
       FROM mainp m JOIN dls d ON d.did = m.doc_id
     )
SELECT doc_id, score FROM combined
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def feature_fn_topk_sql(query, fn: str, weight: float, k: int,
                        pivot: float = 1.0, exp_a: float = 1.0,
                        scaling: float = 1.0) -> str:
    """FeatureField LogFunction / SigmoidFunction oracle
    (``core/document/FeatureField.java`` newLogQuery / newSigmoidQuery):
    feature S = raw token count dl; feature score in DOUBLE mirroring the
    engine's expression order — log: ``w × ln(scaling + S)``; sigmoid:
    ``(w × S^a) / (S^a + pivot^a)`` — narrowed to FLOAT, combined
    = f32(main + feature) like the saturation gate. The lone libm call
    (ln / pow) runs on small-integer inputs on BOTH sides of this
    container's libm and the f32 narrowing absorbs any last-ulp double
    divergence."""
    main = bm25_topk_sql(query, 10**9)
    sd = "CAST(d.dl AS DOUBLE)"
    if fn == "log":
        feat = (f"CAST({float(weight)!r} AS DOUBLE)"
                f" * ln(CAST({float(scaling)!r} AS DOUBLE) + {sd})")
    elif fn == "sigmoid":
        sa = f"pow({sd}, CAST({float(exp_a)!r} AS DOUBLE))"
        pa = (f"pow(CAST({float(pivot)!r} AS DOUBLE), "
              f"CAST({float(exp_a)!r} AS DOUBLE))")
        feat = f"CAST({float(weight)!r} AS DOUBLE) * {sa} / ({sa} + {pa})"
    else:
        raise ValueError(fn)
    return f"""
WITH mainp AS (SELECT * FROM ({main})),
     {BASE_CTES},
     combined AS (
       SELECT m.doc_id AS doc_id,
              CAST(CAST(m.score
                        + CAST(CAST({feat} AS FLOAT) AS DOUBLE)
                   AS FLOAT) AS DOUBLE) AS score
       FROM mainp m JOIN dls d ON d.did = m.doc_id
     )
SELECT doc_id, score FROM combined
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def sort_by_expression_sql(query, expr_sql: str, k: int,
                           ascending: bool = True) -> str:
    """Expression-sort oracle (``lucene/expressions``
    ``Expression.getSortField``): the query's match set ordered by a
    DOUBLE sort key computed from the raw token count ``dl`` —
    ``expr_sql`` references column ``dl`` (exact IEEE ops only; no libm).
    Ties → docID asc."""
    inner = bm25_topk_sql(query, 10**9)
    direction = "ASC" if ascending else "DESC"
    return f"""
WITH matched AS (SELECT doc_id FROM ({inner})),
     {BASE_CTES}
SELECT m.doc_id AS doc_id,
       CAST({expr_sql} AS DOUBLE) AS sortkey
FROM matched m JOIN dls d ON d.did = m.doc_id
ORDER BY sortkey {direction}, m.doc_id ASC
LIMIT {k}
"""


def group_topn_sql(query, group_col: str = "source", n: int = 1) -> str:
    """Top-n docs per group by BM25 score (GroupingSearch / TopGroups
    ``maxDocsPerGroup`` analogy)."""
    inner = bm25_topk_sql(query, 10**9)
    return f"""
WITH ranked AS (
  SELECT g.{group_col} AS grp, s.doc_id, s.score,
         row_number() OVER (PARTITION BY g.{group_col}
                            ORDER BY s.score DESC, s.doc_id ASC) AS rn
  FROM ({inner}) s
  JOIN (SELECT row_number() OVER (ORDER BY printf('c%010d', doc_id)) - 1 AS did,
               {group_col} FROM documents) g
    ON g.did = s.doc_id
)
SELECT grp, doc_id, score, rn FROM ranked WHERE rn <= {int(n)}
ORDER BY grp, rn
"""


def facet_ranges_sql(query, bounds) -> str:
    """Numeric-range facet oracle (LongRangeFacetCounts.java:41): per-range
    counts of the query's match set over dl (raw token count), inclusive
    bounds, 0 for empty ranges."""
    inner = bm25_topk_sql(query, 10**9)
    vals = ",".join(f"('{lb}', {lo}, {hi})" for lb, lo, hi in bounds)
    return f"""
WITH matched AS (SELECT doc_id FROM ({inner})),
dmap AS (
  SELECT row_number() OVER (ORDER BY printf('c%010d', doc_id)) - 1 AS did,
         len(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+')) AS dl
  FROM documents
),
ranges(rng, lo, hi) AS (VALUES {vals})
SELECT r.rng AS range, count(m.doc_id)::BIGINT AS n
FROM ranges r
LEFT JOIN (SELECT m.doc_id, d.dl FROM matched m JOIN dmap d ON d.did = m.doc_id) m
  ON m.dl BETWEEN r.lo AND r.hi
GROUP BY r.rng ORDER BY r.rng
"""


def facet_double_ranges_sql(query, expr_sql: str, bounds) -> str:
    """Double-range facet oracle (``DoubleRangeFacetCounts.java:45``,
    ``DoubleRange.java:28-69``): per-range counts of a DOUBLE expression
    over the match set, per-edge inclusivity, 0 for empty ranges.
    ``expr_sql`` computes the value from ``dl`` (raw token count) — use
    exact binary arithmetic (e.g. dl / 4.0) so engine and oracle agree
    bit-for-bit at range edges."""
    inner = bm25_topk_sql(query, 10**9)
    vals = ",".join(
        f"('{lb}', CAST({lo!r} AS DOUBLE), {str(bool(li)).upper()}, "
        f"CAST({hi!r} AS DOUBLE), {str(bool(hc)).upper()})"
        for lb, lo, li, hi, hc in bounds)
    return f"""
WITH matched AS (SELECT doc_id FROM ({inner})),
dmap AS (
  SELECT row_number() OVER (ORDER BY printf('c%010d', doc_id)) - 1 AS did,
         len(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+')) AS dl
  FROM documents
),
vals0 AS (
  SELECT m.doc_id, CAST({expr_sql} AS DOUBLE) AS v
  FROM matched m JOIN dmap d ON d.did = m.doc_id
),
ranges(rng, lo, lo_inc, hi, hi_inc) AS (VALUES {vals})
SELECT r.rng AS range, count(m.doc_id)::BIGINT AS n
FROM ranges r
LEFT JOIN vals0 m
  ON (CASE WHEN r.lo_inc THEN m.v >= r.lo ELSE m.v > r.lo END)
 AND (CASE WHEN r.hi_inc THEN m.v <= r.hi ELSE m.v < r.hi END)
GROUP BY r.rng ORDER BY r.rng
"""


def drill_sideways_sql(query, selections) -> str:
    """DrillSideways oracle (facet/DrillSideways.java:63): per-dim value
    counts of the base query's matches that satisfy every OTHER dim's
    selection; ``selections`` = {dim_column: selected_value} over the
    documents columns (lang/source)."""
    inner = bm25_topk_sql(query, 10**9)
    names = list(selections)
    sat = " + ".join(
        f"(CASE WHEN g.{c} = '{v}' THEN 1 ELSE 0 END)"
        for c, v in selections.items())
    branches = []
    for n in names:
        sat_n = f"(CASE WHEN j.{n} = '{selections[n]}' THEN 1 ELSE 0 END)"
        branches.append(f"""
SELECT '{n}' AS dim, j.{n} AS value, count(*)::BIGINT AS n
FROM j WHERE j.nsat - {sat_n} = {len(names) - 1} AND j.{n} IS NOT NULL
GROUP BY j.{n}""")
    body = "\nUNION ALL\n".join(branches)
    cols = ", ".join(names)
    return f"""
WITH matched AS (SELECT doc_id FROM ({inner})),
gmap AS (
  SELECT row_number() OVER (ORDER BY printf('c%010d', doc_id)) - 1 AS did,
         {cols}
  FROM documents
),
j AS (
  SELECT m.doc_id, {cols}, {sat} AS nsat
  FROM matched m JOIN gmap g ON g.did = m.doc_id
)
{body}
ORDER BY dim, value
"""


def facet_paths_sql(query) -> str:
    """Taxonomy-facet oracle: per-path-prefix counts of the query's match
    set over the synthesized lang/source taxonomy (matching a doc under
    a/b increments both a and a/b — the ordinal rollup)."""
    inner = bm25_topk_sql(query, 10**9)
    return f"""
WITH matched AS (SELECT doc_id FROM ({inner})),
pmap AS (
  SELECT row_number() OVER (ORDER BY printf('c%010d', doc_id)) - 1 AS did,
         lang || '/' || source AS path
  FROM documents
),
prefixes AS (
  SELECT p.path AS full_path, u.i,
         array_to_string(list_slice(string_split(p.path, '/'), 1, u.i),
                         '/') AS path
  FROM (SELECT m.doc_id, g.path
        FROM matched m JOIN pmap g ON g.did = m.doc_id) p,
       unnest(range(1, len(string_split(p.path, '/')) + 1)) AS u(i)
)
SELECT path, len(string_split(path, '/'))::INT AS depth,
       count(*)::BIGINT AS n
FROM prefixes
GROUP BY path
ORDER BY depth, n DESC, path
"""


def events_windowed_sql(hours: int = 1) -> str:
    """Tumbling-window event aggregation oracle: 1-hour windows via
    date_trunc, counts + integer-cent sums (engine-neutral), window start
    as epoch seconds."""
    return f"""
SELECT epoch(date_trunc('hour', ts))::BIGINT AS window_start,
       event_type,
       count(*)::BIGINT AS n,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def events_sessions_sql(gap_minutes: int = 30) -> str:
    """Session-window oracle (session_window semantics: a gap >= the
    threshold starts a new session; session_start = first event ts)."""
    return f"""
WITH ordered AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL {gap_minutes} MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
sess AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered
)
SELECT user_id,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
       count(*)::BIGINT AS n,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents
FROM sess
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


def term_vectors_sql(n_docs: int = 25) -> str:
    """Term-vector recount from the raw text: per (doc, term) freq + the
    0-based token positions, mirroring the engine's StandardAnalyzer
    contract on this corpus alphabet."""
    return f"""
WITH docs0 AS (
  SELECT row_number() OVER (ORDER BY printf('c%010d', doc_id)) - 1 AS did,
         lower(coalesce(text, '')) AS t
  FROM documents
),
ptoks AS (
  SELECT did, unnest(regexp_extract_all(t, '[a-z0-9]+')) AS term,
         generate_subscripts(regexp_extract_all(t, '[a-z0-9]+'), 1) - 1 AS pos
  FROM docs0 WHERE did < {n_docs}
)
SELECT did AS doc_id, term, count(*)::INT AS freq,
       string_agg(pos::VARCHAR, ' ' ORDER BY pos) AS positions
FROM ptoks GROUP BY 1, 2
ORDER BY doc_id, term
"""


def suggest_infix_sql(substr: str, k: int) -> str:
    """Infix suggester oracle: terms containing the substring, ranked
    (df DESC, term ASC)."""
    return f"""
WITH {BASE_CTES}
SELECT term, df FROM tstats
WHERE term LIKE '%{substr}%'
ORDER BY df DESC, term ASC
LIMIT {k}
"""


def combined_field_sql(terms, k: int) -> str:
    """CombinedFieldQuery oracle over fields {text: 1, role: 1} on the gate
    corpus (role = 'user' on every doc): pseudo df = MAX over (term, field)
    pairs, combined collection stats (docCount = n, sumTTF = text sumTTF +
    n), per-doc freq = text tf sum + 1 for the role match, float32-staged
    BM25 on the text dlen (w=1 norm combination is the identity)."""
    qvals = ",".join(f"('{t}')" for t in terms)
    role_hit = 1 if "user" in terms else 0
    return f"""
WITH {BASE_CTES},
qt(term) AS (VALUES {qvals}),
ftext AS (
  SELECT t.did, sum(t.tf)::BIGINT AS ft
  FROM tf t JOIN qt USING (term) GROUP BY t.did
),
pstats AS (
  SELECT greatest(
           coalesce((SELECT max(ts.df) FROM tstats ts JOIN qt USING (term)), 0),
           CASE WHEN {role_hit} = 1 THEN (SELECT n FROM fstats) ELSE 0 END
         ) AS pdf,
         (SELECT n FROM fstats) AS n,
         CAST(((SELECT sum_ttf FROM fstats) + {role_hit} * (SELECT n FROM fstats))
              / (SELECT n FROM fstats)::DOUBLE AS FLOAT) AS avgdl
),
scored AS (
  SELECT d.did,
         (SELECT CAST(ln(1 + (n - pdf + 0.5) / (pdf + 0.5)) AS FLOAT) FROM pstats)
         - (SELECT CAST(ln(1 + (n - pdf + 0.5) / (pdf + 0.5)) AS FLOAT) FROM pstats)
           / (CAST(1 AS FLOAT)
              + CAST(coalesce(f.ft, 0) + {role_hit} AS FLOAT)
                * (CAST(1 AS FLOAT)
                   / ({K1} * ((CAST(1 AS FLOAT) - {B})
                              + ({B} * CAST(d.dlen AS FLOAT))
                                / (SELECT avgdl FROM pstats))))) AS score
  FROM dlen d LEFT JOIN ftext f USING (did)
  WHERE coalesce(f.ft, 0) + {role_hit} > 0
)
SELECT did AS doc_id, CAST(score AS DOUBLE) AS score
FROM scored
ORDER BY score DESC, did ASC
LIMIT {k}
"""


# ------------------------------------------------------------------ geo --
# Synthetic geo doc values for the driver gates: lat/lon derived from the
# global docID with integer arithmetic (exact in both engines), then
# quantized through the GeoEncodingUtils int32 encode/decode roundtrip
# exactly like LatLonPoint storage (core/geo/GeoEncodingUtils.java). The
# same expression strings drive the Spark gate (F.expr) and this oracle.
GEO_LAT_RAW = "(((did * 7919) % 1800000) / 10000e0 - 90e0)"
GEO_LON_RAW = "(((did * 104729) % 3600000) / 10000e0 - 180e0)"


def geo_cte() -> str:
    from lucene_spark.search.geo import LAT_SCALE, LON_SCALE, quantize_sql

    lat = quantize_sql(GEO_LAT_RAW, LAT_SCALE)
    lon = quantize_sql(GEO_LON_RAW, LON_SCALE)
    return f"geo AS (SELECT did, {lat} AS lat, {lon} AS lon FROM docs0)"


def geo_distance_count_sql(center_lat: float, center_lon: float,
                           radius_m: float) -> str:
    """LatLonPoint.newDistanceQuery hit count: docs within radius_m of the
    center under the exact haversine the engine evaluates (identical SQL
    expression text → identical operation order)."""
    from lucene_spark.search.geo import dlit, haversine_sql

    dist = haversine_sql("lat", "lon", center_lat, center_lon)
    return f"""
WITH {BASE_CTES},
{geo_cte()}
SELECT count(*)::BIGINT AS hits FROM geo WHERE {dist} <= {dlit(radius_m)}
"""


def geo_sort_topk_sql(term: str, k: int, center_lat: float,
                      center_lon: float) -> str:
    """LatLonDocValuesField.newDistanceSort over a term query's match set:
    top-k by (floor-meters ASC, docID ASC). Distances are quantized to
    whole meters in BOTH engines so cross-libm trig noise in the last ulps
    (~1e-8 relative) cannot flip the ranking."""
    from lucene_spark.search.geo import haversine_sql

    dist = haversine_sql("lat", "lon", center_lat, center_lon)
    return f"""
WITH {BASE_CTES},
{geo_cte()}
SELECT did AS doc_id, CAST(floor({dist}) AS BIGINT) AS dist_m
FROM geo g
WHERE EXISTS (SELECT 1 FROM tf m WHERE m.did = g.did AND m.term = '{term}')
ORDER BY dist_m ASC, doc_id ASC LIMIT {int(k)}
"""


def dv_update_sort_sql(terms, k: int, updates) -> str:
    """Numeric doc-values update + sort oracle: ``updates`` is an ordered
    [(term, value)] list — LATER updates override earlier ones per doc
    (DocValuesFieldUpdates newest-generation-wins), docs matching none
    default to 0. Match set = docs containing ANY of ``terms``; ranked
    (value DESC, docID ASC), top-k. Integer-exact cross-engine."""
    cases = " ".join(
        f"WHEN EXISTS (SELECT 1 FROM tf u WHERE u.did = d.did"
        f" AND u.term = '{t}') THEN {int(v)}"
        for t, v in reversed(list(updates))
    )
    ors = " OR ".join(
        f"EXISTS (SELECT 1 FROM tf s WHERE s.did = d.did AND s.term = '{t}')"
        for t in terms
    )
    return f"""
WITH {BASE_CTES}
SELECT did AS doc_id, CAST(CASE {cases} ELSE 0 END AS BIGINT) AS value
FROM dls d
WHERE {ors}
ORDER BY value DESC, did ASC LIMIT {int(k)}
"""


def phrase_wildcard_topk_sql(slots, k: int, boost: float = 1.0) -> str:
    """PhraseWildcardQuery oracle
    (``sandbox/search/PhraseWildcardQuery.java``): each slot is a literal
    term string or ``("like", sql_like_pattern)`` — a wildcard slot's
    expansion (every dictionary term matching the pattern) is derived
    INDEPENDENTLY in SQL, then the phrase scores via the shared
    MultiPhrase skeleton (union postings per slot, idf summed over every
    slot term, MultiPhraseQuery.java:234,303)."""
    f32_idf = ("CAST(ln(1 + ((SELECT n FROM fstats) - {df} + 0.5)"
               " / ({df} + 0.5)) AS FLOAT)")
    joins, conds, idf_parts, ctes = [], [], [], []
    for i, slot in enumerate(slots):
        if i > 0:
            joins.append(
                f"\n  JOIN toksp t{i} ON t{i}.did = t0.did "
                f"AND t{i}.pos = t0.pos + {i}"
            )
        if isinstance(slot, str):
            conds.append(f"t{i}.term = '{slot}'")
            df = f"(SELECT df FROM tstats WHERE term = '{slot}')"
            idf_parts.append(f"CAST({f32_idf.format(df=df)} AS DOUBLE)")
        else:
            kind, pat = slot
            if kind != "like":
                raise ValueError(f"unsupported oracle slot kind: {kind}")
            ctes.append(
                f"exp{i} AS (SELECT term, df FROM tstats "
                f"WHERE term LIKE '{pat}')")
            conds.append(f"t{i}.term IN (SELECT term FROM exp{i})")
            idf_parts.append(
                "(SELECT coalesce(sum(CAST("
                + f32_idf.format(df="ts.df")
                + " AS DOUBLE)), 0) FROM exp" + str(i) + " ts)")
    extra = (",\n" + ",\n".join(ctes)) if ctes else ""
    return _multiphrase_body_sql(joins, conds, " + ".join(idf_parts),
                                 extra, k, boost)


def multi_range_count_sql(ranges) -> str:
    """MultiRangeQuery oracle (``sandbox/search/MultiRangeQuery.java``):
    count of docs whose dl lies in ANY of the inclusive ranges."""
    ors = " OR ".join(
        f"(d.dl BETWEEN {int(lo)} AND {int(hi)})" for lo, hi in ranges)
    return f"""
WITH {BASE_CTES}
SELECT count(*)::BIGINT AS hits FROM dls d WHERE {ors}
"""


def nb_classify_sql(inputs) -> str:
    """SimpleNaiveBayesClassifier oracle
    (``classification/.../SimpleNaiveBayesClassifier.java``): classes =
    lang values; prior = f32ln(df_c) − f32ln(N); per-occurrence word
    log-likelihood = f32(ln((hits+1) / (avgUnique·df_c + N))) with
    avgUnique = sumDocFreq(text)/docCount(text) (docs with dl > 0);
    per-(input, class) sums of f32 addends accumulate in double — exact
    and order-independent, hash-parity with the engine."""
    vals = ",".join(f"({i}, '{t}')" for i, t in enumerate(inputs))
    return f"""
WITH {BASE_CTES},
inputs(input_id, itext) AS (VALUES {vals}),
itoks AS (
  SELECT input_id,
         unnest(regexp_extract_all(lower(itext), '[a-z0-9]+')) AS word
  FROM inputs
),
classes AS (SELECT lang AS cls, count(*)::BIGINT AS dfc FROM docs0 GROUP BY 1),
cstats AS (SELECT count(*)::BIGINT AS nclass FROM docs0),
sdf AS (SELECT count(*)::BIGINT AS sum_df FROM tf),
dct AS (SELECT count(*)::BIGINT AS n FROM dls WHERE dl > 0),
hits AS (
  SELECT t.term AS word, d.lang AS cls, count(DISTINCT t.did)::BIGINT AS h
  FROM tf t JOIN docs0 d ON d.did = t.did
  WHERE t.term IN (SELECT DISTINCT word FROM itoks)
  GROUP BY 1, 2
),
wl AS (
  SELECT i.input_id, c.cls,
         CAST(ln(CAST(coalesce(h.h, 0) + 1 AS DOUBLE)
                 / ((CAST((SELECT sum_df FROM sdf) AS DOUBLE)
                     / CAST((SELECT n FROM dct) AS DOUBLE))
                    * CAST(c.dfc AS DOUBLE)
                    + CAST((SELECT nclass FROM cstats) AS DOUBLE)))
              AS FLOAT) AS lp
  FROM itoks i CROSS JOIN classes c
  LEFT JOIN hits h ON h.word = i.word AND h.cls = c.cls
),
agg AS (
  SELECT input_id, cls, sum(CAST(lp AS DOUBLE)) AS slp
  FROM wl GROUP BY 1, 2
),
prior AS (SELECT cls, CAST(ln(CAST(dfc AS DOUBLE)) AS FLOAT) AS lpc
          FROM classes)
SELECT CAST(i.input_id AS BIGINT) AS input_id, p.cls,
       CAST(CAST(p.lpc AS DOUBLE)
            - CAST(CAST(ln(CAST((SELECT nclass FROM cstats) AS DOUBLE))
                        AS FLOAT) AS DOUBLE)
            + coalesce(a.slp, 0e0) AS DOUBLE) AS score
FROM inputs i CROSS JOIN prior p
LEFT JOIN agg a ON a.input_id = i.input_id AND a.cls = p.cls
ORDER BY i.input_id, p.cls
"""


def bm25_nb_classify_sql(inputs) -> str:
    """BM25NBClassifier oracle
    (``classification/.../BM25NBClassifier.java:47``): classes = lang;
    log prior = f32ln(cconst(c)) where cconst is the float32 keyword-clause
    BM25 constant of the class term (omitNorms keyword field: df = df_c,
    N = sum_ttf = docCount, tf = dl = avgdl = 1 — the
    ``keyword_const_score`` chain); per-occurrence word log-likelihood =
    f32ln(f32(cconst(c) + max per-doc f32 BM25 text score of the word over
    class-c docs, 0 when absent)); f32 addends accumulate in double —
    exact and order-independent, hash-parity with the engine."""
    vals = ",".join(f"({i}, '{t}')" for i, t in enumerate(inputs))
    return f"""
WITH {BASE_CTES},
inputs(input_id, itext) AS (VALUES {vals}),
itoks AS (
  SELECT input_id,
         unnest(regexp_extract_all(lower(itext), '[a-z0-9]+')) AS word
  FROM inputs
),
classes AS (SELECT lang AS cls, count(*)::BIGINT AS dfc FROM docs0 GROUP BY 1),
cstats AS (SELECT count(*)::BIGINT AS nclass FROM docs0),
cconst AS (
  SELECT cls, CAST(w - w / (CAST(1 AS FLOAT)
                            + CAST(CAST(1 AS FLOAT) * inv AS FLOAT))
              AS FLOAT) AS c
  FROM (
    SELECT cls,
           CAST(CAST(1.0 AS FLOAT)
                * CAST(ln(1 + ((SELECT nclass FROM cstats) - dfc + 0.5)
                              / (dfc + 0.5)) AS FLOAT)
                AS FLOAT) AS w,
           CAST(CAST(1 AS FLOAT)
                / ({K1} * ((CAST(1 AS FLOAT) - {B})
                           + CAST({B} * CAST(1 AS FLOAT) AS FLOAT)
                             / CAST(1 AS FLOAT))) AS FLOAT) AS inv
    FROM classes
  )
),
wweights AS (
  SELECT ts.term,
         CAST(ln(1 + ((SELECT n FROM fstats) - ts.df + 0.5)
                     / (ts.df + 0.5)) AS FLOAT) AS w
  FROM tstats ts
  WHERE ts.term IN (SELECT DISTINCT word FROM itoks)
),
wscores AS (
  SELECT tf.did, tf.term,
         CAST(CAST(ww.w - ww.w / (CAST(1 AS FLOAT)
                      + CAST(tf.tf AS FLOAT)
                        * (CAST(1 AS FLOAT)
                           / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                      + ({B} * CAST(d.dlen AS FLOAT))
                                        / (SELECT avgdl FROM fstats)))))
              AS DOUBLE) AS FLOAT) AS s
  FROM tf
  JOIN wweights ww ON ww.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
maxws AS (
  SELECT ws.term AS word, d.lang AS cls, max(ws.s) AS mx
  FROM wscores ws JOIN docs0 d ON d.did = ws.did
  GROUP BY 1, 2
),
wl AS (
  SELECT i.input_id, c.cls,
         CAST(ln(CAST(CAST(CAST(c.c AS DOUBLE)
                           + coalesce(CAST(m.mx AS DOUBLE), 0e0)
                           AS FLOAT) AS DOUBLE)) AS FLOAT) AS lp
  FROM itoks i CROSS JOIN cconst c
  LEFT JOIN maxws m ON m.word = i.word AND m.cls = c.cls
),
agg AS (
  SELECT input_id, cls, sum(CAST(lp AS DOUBLE)) AS slp
  FROM wl GROUP BY 1, 2
),
prior AS (SELECT cls, CAST(ln(CAST(c AS DOUBLE)) AS FLOAT) AS lpc
          FROM cconst)
SELECT CAST(i.input_id AS BIGINT) AS input_id, p.cls,
       CAST(CAST(p.lpc AS DOUBLE) + coalesce(a.slp, 0e0) AS DOUBLE) AS score
FROM inputs i CROSS JOIN prior p
LEFT JOIN agg a ON a.input_id = i.input_id AND a.cls = p.cls
ORDER BY i.input_id, p.cls
"""


def knn_classify_sql(src_did: int, k: int) -> str:
    """KNearestNeighborClassifier oracle
    (``classification/.../KNearestNeighborClassifier.java``
    buildListFromTopDocs): top-k MLT hits (the mlt_topk_sql CTE chain,
    unboosted config) → per-class count + Σ f32(score/maxScore) →
    score = (count × (boost/count)) / k, rescaled ×k/sumdoc when
    sumdoc < k. Classes = lang."""
    mlt = mlt_topk_sql(src_did, k)
    kd = f"CAST({int(k)} AS DOUBLE)"
    return f"""
WITH hits AS (SELECT * FROM ({mlt}) mq),
dmap AS (
  SELECT row_number() OVER (ORDER BY printf('c%010d', doc_id)) - 1 AS did,
         lang FROM documents),
mx AS (SELECT max(score) AS m FROM hits),
q AS (
  SELECT h.doc_id, d.lang AS cls,
         CAST(h.score / (SELECT m FROM mx) AS FLOAT) AS qt
  FROM hits h JOIN dmap d ON d.did = h.doc_id),
votes AS (
  SELECT cls, count(*)::BIGINT AS cnt, sum(CAST(qt AS DOUBLE)) AS boost
  FROM q GROUP BY cls),
sd AS (SELECT CAST(sum(cnt) AS DOUBLE) AS sumdoc,
              sum(cnt)::BIGINT AS sumdoc_i FROM votes)
SELECT cls,
       CAST(CASE WHEN (SELECT sumdoc_i FROM sd) < {int(k)}
            THEN ((cnt * (boost / cnt)) / {kd})
                 * {kd} / (SELECT sumdoc FROM sd)
            ELSE (cnt * (boost / cnt)) / {kd} END AS DOUBLE) AS score
FROM votes ORDER BY score DESC, cls ASC
"""


def knn_fuzzy_classify_sql(text: str, k: int) -> str:
    """KNearestFuzzyClassifier oracle
    (``classification/KNearestFuzzyClassifier.java:50`` +
    ``classification/utils/NearestFuzzyQuery.java:214-262``): the whole
    chain recomputed independently — fuzzy variants (2-char exact prefix +
    suffix Damerau-Levenshtein ≤ 1, DuckDB ``damerau_levenshtein`` ==
    the engine helper by construction), FuzzyTermsEnum boost
    f32(1 − f32(ed)/f32(min lens)) (1.0 on exact), clause score
    f32(f32(boost²) · classic-idf(src df | int-div avg df)), final BM25
    with ARTIFICIAL df = 1 per variant + the class-wildcard constant 1.0
    (every gate doc carries a class), top-k (score DESC, docID ASC), then
    the buildListFromTopDocs vote. The 50/300 caps never bind on the gate
    corpus (31-term vocabulary), so the reference PQ's insertion-dependent
    tie order is moot here. The SQL slices at the FULL 2-char prefix, so
    every gate input token must be >= 2 chars (the engine handles shorter
    tokens with realPrefixLength = min(2, len); pytest-covered)."""
    toks, seen = [], set()
    for t in __import__("re").findall(r"[a-z0-9]+", text.lower()):
        if t not in seen:
            seen.add(t)
            toks.append(t)
    qvals = ",".join(f"('{t}')" for t in toks)
    kd = f"CAST({int(k)} AS DOUBLE)"
    return f"""
WITH {BASE_CTES},
qtoks(tok) AS (VALUES {qvals}),
vterms AS (SELECT DISTINCT term FROM tf),
vars AS (
  SELECT q.tok, v.term,
         damerau_levenshtein(substr(v.term, 3), substr(q.tok, 3)) AS ed
  FROM qtoks q JOIN vterms v
    ON substr(v.term, 1, 2) = substr(q.tok, 1, 2)
  WHERE damerau_levenshtein(substr(v.term, 3), substr(q.tok, 3)) <= 1
),
srcdf AS (
  SELECT v.tok,
         coalesce(max(ts0.df),
                  CAST(sum(ts.df) AS BIGINT) // count(*)) AS df
  FROM vars v
  JOIN tstats ts ON ts.term = v.term
  LEFT JOIN tstats ts0 ON ts0.term = v.tok
  GROUP BY v.tok
),
stq AS (
  SELECT b.tok, b.term,
         CAST(CAST(CAST(b.b AS FLOAT) * CAST(b.b AS FLOAT) AS FLOAT)
              * CAST(ln(CAST((SELECT n FROM fstats) + 1 AS DOUBLE)
                        / CAST(s.df + 1 AS DOUBLE)) + 1.0 AS FLOAT)
              AS FLOAT) AS boost
  FROM (
    SELECT tok, term,
           CASE WHEN term = tok THEN CAST(1 AS FLOAT)
                ELSE CAST(CAST(1 AS FLOAT)
                          - CAST(ed AS FLOAT)
                            / CAST(least(length(term), length(tok))
                                   AS FLOAT) AS FLOAT) END AS b
    FROM vars
  ) b JOIN srcdf s ON s.tok = b.tok
),
fw AS (
  SELECT term,
         CAST(CAST(boost AS FLOAT)
              * CAST(ln(1 + ((SELECT n FROM fstats) - 1 + 0.5)
                            / (1 + 0.5)) AS FLOAT) AS FLOAT) AS w
  FROM stq
),
cs AS (
  SELECT tf.did,
         fw.w - fw.w / (CAST(1 AS FLOAT)
                      + CAST(tf.tf AS FLOAT)
                        * (CAST(1 AS FLOAT)
                           / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                      + ({B} * CAST(d.dlen AS FLOAT))
                                        / (SELECT avgdl FROM fstats))))) AS s
  FROM tf
  JOIN fw ON fw.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
tot AS (
  -- the NearestFuzzyQuery is a NESTED clause of the outer boolean: its
  -- scorer returns FLOAT (f32 of its own double clause sum) before the
  -- outer double sum adds the class-wildcard constant 1.0 — per-level
  -- float32 narrowing, Lucene Scorer.score() contract
  SELECT did,
         CAST(CAST(CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS DOUBLE)
              + CAST(1 AS DOUBLE) AS FLOAT) AS score
  FROM cs GROUP BY did
),
hits AS (
  SELECT did AS doc_id, score FROM tot
  ORDER BY score DESC, did ASC LIMIT {int(k)}
),
mxh AS (SELECT max(score) AS m FROM hits),
qv AS (
  SELECT h.doc_id, d.lang AS cls,
         CAST(h.score / (SELECT m FROM mxh) AS FLOAT) AS qt
  FROM hits h JOIN docs0 d ON d.did = h.doc_id),
votes AS (
  SELECT cls, count(*)::BIGINT AS cnt, sum(CAST(qt AS DOUBLE)) AS boost
  FROM qv GROUP BY cls),
sd AS (SELECT CAST(sum(cnt) AS DOUBLE) AS sumdoc,
              sum(cnt)::BIGINT AS sumdoc_i FROM votes)
SELECT cls,
       CAST(CASE WHEN (SELECT sumdoc_i FROM sd) < {int(k)}
            THEN ((cnt * (boost / cnt)) / {kd})
                 * {kd} / (SELECT sumdoc FROM sd)
            ELSE (cnt * (boost / cnt)) / {kd} END AS DOUBLE) AS score
FROM votes ORDER BY score DESC, cls ASC
"""


def fuzzy_suggest_sql(key: str, k: int, max_edits: int = 1,
                      non_fuzzy_prefix: int = 1,
                      min_fuzzy_length: int = 3) -> str:
    """FuzzySuggester oracle (``suggest/analyzing/FuzzySuggester.java:66-91``):
    terms with SOME prefix within DL ≤ max_edits of the key (first
    non_fuzzy_prefix chars exact; plain prefix completion below
    min_fuzzy_length), ranked exact-first then (df DESC, term ASC) —
    the prefix-DL minimum is derived per term with a lateral range
    unnest over every prefix length."""
    pre, rest = key[:non_fuzzy_prefix], key[non_fuzzy_prefix:]
    edits = max_edits if len(key) >= min_fuzzy_length else 0
    if edits == 0:
        cond = f"starts_with(term, '{key}')"
        md_cte = f"cands AS (SELECT term, df FROM tstats WHERE {cond})"
    else:
        md_cte = f"""pref AS (
  SELECT t.term, t.df,
         min(damerau_levenshtein(
               substr(t.term, {non_fuzzy_prefix + 1}, CAST(u.j AS INT)),
               '{rest}')) AS md
  FROM (SELECT term, df FROM tstats
        WHERE starts_with(term, '{pre}')) t,
       unnest(range(0, length(t.term) - {non_fuzzy_prefix} + 1)) AS u(j)
  GROUP BY t.term, t.df
),
cands AS (SELECT term, df FROM pref WHERE md <= {edits})"""
    return f"""
WITH {BASE_CTES},
{md_cte}
SELECT term, df FROM cands
ORDER BY (term = '{key}') DESC, df DESC, term ASC
LIMIT {k}
"""


def freetext_suggest_sql(ctx_tokens, num: int, grams: int = 3) -> str:
    """FreeTextSuggester oracle
    (``suggest/analyzing/FreeTextSuggester.java`` stupid backoff): next-
    token suggestions after a trailing-space key whose last tokens are
    ``ctx_tokens``. Level ℓ weight = 0.4^ℓ (exact double products — the
    engine's backoff decays per level with sufficient context, seen or
    not); score = weight × cnt(context+token)/cnt(context); a token seen
    at a higher order is not re-suggested; ranked (score DESC, tok ASC).
    Assumes len(ctx_tokens) ≥ grams-1 (trailing-space lookup)."""
    ctx_tokens = list(ctx_tokens)
    assert len(ctx_tokens) >= grams - 1
    # n-gram count CTEs g1..g{grams}
    ctes = ["tdocs AS (SELECT regexp_extract_all(lower(coalesce(text, '')),"
            " '[a-z0-9]+') AS ts FROM documents)"]
    for n in range(1, grams + 1):
        ctes.append(
            f"c{n} AS (SELECT g, count(*)::BIGINT AS cnt FROM ("
            f"SELECT array_to_string(list_slice(ts, i, i + {n - 1}), ' ')"
            f" AS g FROM (SELECT ts, unnest(range(1, len(ts) - {n - 2}))"
            f" AS i FROM tdocs) WHERE len(ts) >= {n}) GROUP BY g)")
    levels = []
    backoff = 1.0
    lvl = 0
    for n in range(grams, 0, -1):
        need = n - 1
        ctx = ctx_tokens[len(ctx_tokens) - need:] if need else []
        w = format(backoff, ".17e")
        if ctx:
            cs = " ".join(ctx)
            ctx_cnt = f"(SELECT cnt FROM c{need} WHERE g = '{cs}')"
            where = f"g LIKE '{cs} %'"
        else:
            ctx_cnt = "(SELECT sum(cnt) FROM c1)"
            where = "TRUE"
        levels.append(
            f"SELECT {lvl} AS lvl, list_extract(string_split(g, ' '), {n})"
            f" AS tok, {w} * (CAST(cnt AS DOUBLE)"
            f" / CAST({ctx_cnt} AS DOUBLE)) AS score"
            f" FROM c{n} WHERE {where}"
            f" AND coalesce({ctx_cnt}, 0) > 0")
        backoff *= 0.4
        lvl += 1
    union = "\nUNION ALL\n".join(levels)
    return f"""
WITH {",".join(ctes)},
lv AS ({union}),
dedup AS (
  SELECT tok, score, row_number() OVER (PARTITION BY tok ORDER BY lvl) AS rn
  FROM lv
)
SELECT tok, score FROM dedup WHERE rn = 1
ORDER BY score DESC, tok ASC LIMIT {int(num)}
"""


def sweet_spot_topk_sql(query, k: int, ln_min: int = 6, ln_max: int = 40,
                        steepness: float = 0.5, tf_base: float = 1.5,
                        tf_min: float = 2.0) -> str:
    """SweetSpotSimilarity top-k (``misc/.../SweetSpotSimilarity.java``):
    Classic idf/weight; baselineTf = tf_base up to tf_min else
    f32(sqrt(freq + tf_base² − tf_min)); plateau lengthNorm =
    f32(1/sqrt(s·f32(|x−min|+|x−max|−(max−min)) + 1)). Float chain
    mirrors the engine's numpy ops bit-for-bit."""
    import numpy as _np

    clauses, scoring, must, must_not = _boolean_filtered(query)
    if not scoring:
        return ("SELECT CAST(NULL AS BIGINT) AS doc_id, "
                "CAST(NULL AS DOUBLE) AS score WHERE FALSE")
    b2 = float(_np.float32(_np.float32(tf_base) * _np.float32(tf_base)))
    qvals = ",".join(
        f"({i}, '{t}', CAST({b!r} AS FLOAT))"
        for i, (t, b) in enumerate(scoring))
    s_lit = format(float(steepness), ".17e")
    hl = int(ln_max) - int(ln_min)
    tf_expr = (
        f"CASE WHEN tf.tf <= {format(float(tf_min), '.17e')} "
        f"THEN CAST({format(float(tf_base), '.17e')} AS FLOAT) "
        f"ELSE CAST(sqrt(tf.tf + {format(b2, '.17e')} "
        f"- {format(float(tf_min), '.17e')}) AS FLOAT) END")
    tri = (f"CAST(abs(d.dlen - {int(ln_min)}) + abs(d.dlen - {int(ln_max)})"
           f" - {hl} AS FLOAT)")
    inner = (f"CAST(CAST(CAST({s_lit} AS FLOAT) * {tri} AS FLOAT)"
             f" + CAST(1 AS FLOAT) AS FLOAT)")
    norm_expr = f"CAST(1.0 / sqrt({inner}) AS FLOAT)"
    body = f"""
qterms(cid, term, boost) AS (VALUES {qvals}),
weights AS (
  SELECT q.cid, q.term,
         CAST(q.boost * CAST(ln(((SELECT n FROM fstats) + 1) / (ts.df + 1.0))
                             + 1.0 AS FLOAT) AS FLOAT) AS w
  FROM qterms q JOIN tstats ts ON ts.term = q.term
),
clause_scores AS (
  SELECT tf.did,
         CAST(CAST({tf_expr} * w.w AS FLOAT) * {norm_expr} AS FLOAT) AS s
  FROM tf
  JOIN weights w ON w.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
summed AS (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM clause_scores GROUP BY did
)
"""
    return f"WITH {BASE_CTES},{body}{_topk_tail(must, must_not, k)}"


def hybrid_rrf_sql(query, query_vec_id: int, k: int,
                   n_each: int = 100, k_rrf: int = 60) -> str:
    """Reciprocal-rank-fusion oracle for ``IndexSearcher.hybrid_rrf_df``:
    rank the BM25 top-n and the exact-KNN top-n independently, then
    ``rrf = Σ CAST(1 AS DOUBLE)/(k_rrf + rank)`` (each doc has ≤ 2 IEEE
    contributions → order-insensitive, hash-exact)."""
    from lucene_spark.pipeline.oracles import knn_brute_sql

    bm = bm25_topk_sql(query, n_each)
    kn = knn_brute_sql(query_vec_id, n_each)
    return f"""
WITH bm AS ({bm}),
bmr AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
  FROM bm
),
kn AS ({kn}),
knr AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY dot DESC, doc_id ASC) AS rk
  FROM kn
),
contrib AS (
  SELECT doc_id, CAST(1 AS DOUBLE) / ({k_rrf} + rk) AS c FROM bmr
  UNION ALL
  SELECT doc_id, CAST(1 AS DOUBLE) / ({k_rrf} + rk) AS c FROM knr
)
SELECT doc_id, sum(c) AS rrf
FROM contrib GROUP BY doc_id
ORDER BY rrf DESC, doc_id ASC
LIMIT {k}
"""


def memory_index_scores_sql(terms, n_docs: int = 100) -> str:
    """MemoryIndex per-doc scoring oracle (``memory/.../MemoryIndex.java``
    search :236-259): each of the first ``n_docs`` docs is its OWN
    single-document index — collection stats per doc are docCount = 1,
    sumTotalTermFreq = dl (→ avgdl = f32(dl)), df = 1 for every present
    term — and the query's SHOULD terms sum per-term BM25 scores. Float32
    op order mirrors ``similarity.norm_cache`` per step; docs matching no
    term score 0.0 (MemoryIndex.search returns 0.0f on no match)."""
    tl = ",".join(f"'{t}'" for t in dict.fromkeys(terms))
    # idf with df = 1, N = 1: f32(ln(1 + 0.5/1.5)) — one constant
    w = "CAST(ln(1 + 0.5 / 1.5) AS FLOAT)"
    # norm_cache op order, avgdl = f32(dl): LT*b → /avgdl → (1-b)+ → k1* → 1/
    inv = (f"CAST(CAST(1 AS FLOAT) / CAST({K1} * CAST("
           f"(CAST(1 AS FLOAT) - {B}) + CAST(CAST(CAST(d.dlen AS FLOAT)"
           f" * {B} AS FLOAT) / CAST(d.dl AS FLOAT) AS FLOAT)"
           f" AS FLOAT) AS FLOAT) AS FLOAT)")
    return f"""
WITH docs0 AS (
  SELECT doc_id AS did, lower(coalesce(text, '')) AS t
  FROM documents ORDER BY doc_id LIMIT {int(n_docs)}
),
toks AS (
  SELECT did, unnest(regexp_extract_all(t, '[a-z0-9]+')) AS term
  FROM docs0
),
tf AS (
  SELECT did, term, count(*)::BIGINT AS tf FROM toks
  WHERE term IN ({tl}) GROUP BY 1, 2
),
dls AS (
  SELECT did, len(regexp_extract_all(t, '[a-z0-9]+'))::BIGINT AS dl
  FROM docs0
),
normmap(lo, hi) AS (VALUES {norm_map_values()}),
dlen AS (
  SELECT d.did, d.dl, m.lo AS dlen
  FROM dls d JOIN normmap m ON d.dl BETWEEN m.lo AND m.hi
),
cs AS (
  SELECT tf.did,
         ({w}) - ({w}) / (CAST(1 AS FLOAT)
                          + CAST(CAST(tf.tf AS FLOAT) * {inv} AS FLOAT)) AS s
  FROM tf JOIN dlen d ON d.did = tf.did
)
SELECT d0.did AS doc_id,
       CAST(coalesce(sc.score, CAST(0 AS FLOAT)) AS DOUBLE) AS score
FROM docs0 d0
LEFT JOIN (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM cs GROUP BY did
) sc ON sc.did = d0.did
ORDER BY doc_id
"""


def percolate_complex_sql() -> str:
    """MemoryIndex-tier percolation oracle (Presearcher + per-doc verify,
    ``monitor/CandidateMatcher.java``): four complex registered shapes —
    a nested boolean, a sloppy 2-term phrase, a prefix multiterm
    (ANYTOKEN presearch path), and a MUST_NOT boolean — each as a plain
    match-set SELECT; the engine's candidate filter must lose nothing."""
    return f"""
WITH {BASE_CTES},{_TOKSP_CTE}
SELECT 'q_nested' AS query_id, did AS doc_id FROM (
  SELECT a.did
  FROM tf a JOIN tf b ON b.did = a.did
  WHERE (a.term = 'table' AND b.term = 'value')
     OR (a.term = 'query' AND b.term = 'customer')
  GROUP BY a.did
)
UNION ALL
SELECT 'q_sloppy', did FROM (
  SELECT a.did
  FROM toksp a JOIN toksp b ON b.did = a.did
  WHERE a.term = 'table' AND b.term = 'value'
    AND abs(b.pos - a.pos - 1) <= 2
  GROUP BY a.did
)
UNION ALL
SELECT 'q_prefix', did FROM (
  SELECT DISTINCT did FROM tf WHERE term LIKE 'merg%'
)
UNION ALL
SELECT 'q_not', did FROM (
  SELECT DISTINCT did FROM tf WHERE term = 'query'
    AND did NOT IN (SELECT did FROM tf WHERE term = 'table')
)
"""


def fuzzy_like_this_topk_sql(src_terms, k: int, max_edits: int = 2,
                             prefix_len: int = 0, max_num_terms: int = 50,
                             max_variants: int = 50) -> str:
    """FuzzyLikeThisQuery oracle (``sandbox/.../FuzzyLikeThisQuery.java:
    192-330``): the SQL independently (1) expands each source term's
    OSA-DL window with the prefix filter, (2) boosts ed==0→1f else
    1f−ed/min(len), (3) takes the per-source top ``max_variants`` by
    (boost DESC, term ASC), (4) scores each kept variant
    f32(f32(boost²)·ClassicSimilarity.idf(df_src, N)) with df_src = the
    SOURCE term's df or the INTEGER average of all enumerated variants'
    dfs when absent (:237-241), (5) keeps the global top
    ``max_num_terms`` by (score DESC, term ASC), and (6) sums per-doc
    BM25 clause scores where every clause uses ARTIFICIAL df = 1
    (``newTermQuery`` :262-274) and boost = the variant score."""
    svals = ",".join(f"('{t}')" for t in src_terms)
    return f"""
WITH {BASE_CTES},
src(sterm) AS (VALUES {svals}),
vars AS (
  SELECT s.sterm, t.term, t.df,
         damerau_levenshtein(t.term, s.sterm) AS ed
  FROM src s JOIN tstats t
    ON damerau_levenshtein(t.term, s.sterm) <= {int(max_edits)}
   AND substr(t.term, 1, {int(prefix_len)})
       = substr(s.sterm, 1, {int(prefix_len)})
),
boosted AS (
  SELECT sterm, term, df, ed,
         CASE WHEN ed = 0 THEN CAST(1 AS FLOAT)
              ELSE CAST(1 AS FLOAT)
                   - CAST(ed AS FLOAT)
                     / CAST(least(length(term), length(sterm)) AS FLOAT)
         END AS boost
  FROM vars
),
srcdf AS (
  SELECT b.sterm,
         CASE WHEN max(CASE WHEN b.term = b.sterm THEN b.df END) IS NOT NULL
              THEN max(CASE WHEN b.term = b.sterm THEN b.df END)
              ELSE CAST(floor(sum(b.df) / count(*)) AS BIGINT)
         END AS df_src
  FROM boosted b GROUP BY b.sterm
),
topv AS (
  SELECT * FROM (
    SELECT b.*, row_number() OVER (PARTITION BY sterm
                                   ORDER BY boost DESC, term ASC) AS rn
    FROM boosted b
  ) WHERE rn <= {int(max_variants)}
),
scoredv AS (
  SELECT v.sterm, v.term,
         CAST(CAST(v.boost * v.boost AS FLOAT)
              * CAST(ln(((SELECT n FROM fstats) + 1)
                        / CAST(s.df_src + 1 AS DOUBLE)) + 1.0 AS FLOAT)
              AS FLOAT) AS score
  FROM topv v JOIN srcdf s ON s.sterm = v.sterm
),
kept AS (
  SELECT term, score FROM scoredv
  ORDER BY score DESC, term ASC LIMIT {int(max_num_terms)}
),
weights AS (
  SELECT term,
         CAST(score * CAST(ln(1 + ((SELECT n FROM fstats) - 1 + 0.5)
                                 / (1 + 0.5)) AS FLOAT) AS FLOAT) AS w
  FROM kept
),
clause_scores AS (
  SELECT tf.did,
         w.w - w.w / (CAST(1 AS FLOAT)
                      + CAST(tf.tf AS FLOAT)
                        * (CAST(1 AS FLOAT)
                           / ({K1} * ((CAST(1 AS FLOAT) - {B})
                                      + ({B} * CAST(d.dlen AS FLOAT))
                                        / (SELECT avgdl FROM fstats))))) AS s
  FROM tf
  JOIN weights w ON w.term = tf.term
  JOIN dlen d ON d.did = tf.did
),
summed AS (
  SELECT did, CAST(SUM(CAST(s AS DOUBLE)) AS FLOAT) AS score
  FROM clause_scores GROUP BY did
)
SELECT did AS doc_id, CAST(score AS DOUBLE) AS score
FROM summed ORDER BY score DESC, did ASC LIMIT {k}
"""
