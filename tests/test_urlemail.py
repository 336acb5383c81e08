"""UAX29URLEmailTokenizer (lite): URLs/emails as single tokens, engine
regex ≡ DuckDB RE2 on the shared pattern."""

import duckdb
import pandas as pd

from lucene_spark.analysis import URL_EMAIL_PATTERN, URLEmailAnalyzer, get_analyzer

TEXTS = [
    "Contact support@example.com or visit https://docs.example.com/api?q=1",
    "ftp://files.example.org:2121/pub/data.tar.gz and HTTP://WWW.Site.COM/p#f",
    "plain words only",
    "(bob.smith+tag@sub.domain.co.uk), trailing.",
    "not-an-email @ host, scheme less www.example.com stays words",
    "",
]


def test_single_token_urls_and_emails():
    a = URLEmailAnalyzer()
    toks = a.tokenize_text(TEXTS[0])
    assert "support@example.com" in toks
    assert "https://docs.example.com/api?q=1" in toks
    toks2 = a.tokenize_text(TEXTS[1])
    assert "ftp://files.example.org:2121/pub/data.tar.gz" in toks2
    assert "http://www.site.com/p#f" in toks2
    # scheme-less hosts fall back to words (documented lite scope)
    assert "www" in a.tokenize_text(TEXTS[4])


def test_duckdb_pattern_parity():
    a = URLEmailAnalyzer()
    got = [r[0] for r in duckdb.sql(
        "SELECT regexp_extract_all(lower(t), ?) FROM (SELECT unnest(?) AS t)",
        params=[URL_EMAIL_PATTERN, TEXTS]).fetchall()]
    assert got == [a.tokenize_text(t) for t in TEXTS]


def test_ids_path_and_registry():
    a = get_analyzer("url_email")
    assert isinstance(a, URLEmailAnalyzer)
    texts = pd.Series(TEXTS + [None])
    uniq, codes, per_row = a.tokenize_ids(texts)
    flat = [uniq[c] for c in codes]
    rows, i = [], 0
    for n in per_row:
        rows.append(flat[i:i + n])
        i += n
    assert rows == [a.tokenize_text(t or "") for t in texts]


def test_url_dedup_canonicalization(spark):
    from lucene_spark.pipeline.dedup import url_dedup
    docs = spark.createDataFrame(
        [(1, "see https://ex.com/a#frag here"),
         (2, "see https://ex.com/a/ there"),
         (3, "see https://ex.com/a/ twice https://ex.com/a/ and"),
         (4, "other https://ex.com/b?x=1"),
         (5, "no urls at all")],
        "doc_id long, text string")
    rows = {r["url"]: (r["n_docs"], r["canonical_doc"])
            for r in url_dedup(docs).collect()}
    assert rows == {"https://ex.com/a": (3, 1), "https://ex.com/b?x=1": (1, 4)}
