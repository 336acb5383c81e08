"""Compiled score expressions (search/expressions.py): grammar/semantics
parity with the reference's JavascriptCompiler (doubles everywhere,
1.0/0.0 booleans, (long)-cast bitwise ops, DEFAULT_FUNCTIONS table), plus
the searcher.expression_score end-to-end surface."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_spark.search.expressions import (
    ExpressionError,
    compile_expression,
)

X, Y = 7.25, -3.5


def _py_eval(expr_fn):
    return expr_fn(X, Y)


def _long(v: float) -> int:
    return int(v)  # Java (long) double cast truncates toward zero


def _sh_unsigned(a: int, s: int) -> int:
    r = (a & (2**64 - 1)) >> (s & 63)
    return r - 2**64 if r >= 2**63 else r


CASES = [
    # (source, python equivalent with matching semantics)
    ("2 + 3 * 4", lambda x, y: 14.0),
    ("(2 + 3) * 4", lambda x, y: 20.0),
    ("x - y / 2", lambda x, y: x - y / 2),
    ("-x + +y", lambda x, y: -x + y),
    ("x % 2", lambda x, y: math.fmod(x, 2)),
    ("x > 7 ? 1.5 : 2.5", lambda x, y: 1.5 if x > 7 else 2.5),
    ("x <= y ? x : y", lambda x, y: x if x <= y else y),
    ("x > 0 && y > 0", lambda x, y: float(x > 0 and y > 0)),
    ("x > 0 || y > 0", lambda x, y: float(x > 0 or y > 0)),
    ("!(x == y)", lambda x, y: float(not (x == y))),
    ("x != y", lambda x, y: float(x != y)),
    ("sqrt(x * x)", lambda x, y: math.sqrt(x * x)),
    ("ln(x) + log10(x)", lambda x, y: math.log(x) + math.log10(x)),
    ("logn(2, x)", lambda x, y: math.log(x) / math.log(2)),
    ("pow(x, 2) + exp(1)", lambda x, y: x**2 + math.e),
    ("min(x, y) + max(x, y)", lambda x, y: x + y),
    ("abs(y) + ceil(y) + floor(x)",
     lambda x, y: abs(y) + math.ceil(y) + math.floor(x)),
    ("atan2(y, x) + tanh(1)", lambda x, y: math.atan2(y, x) + math.tanh(1)),
    ("0x1F + 10", lambda x, y: 41.0),
    # bitwise / shifts on (long)-cast doubles
    ("12 & 10", lambda x, y: 8.0),
    ("12 | 3", lambda x, y: 15.0),
    ("12 ^ 10", lambda x, y: 6.0),
    ("~5", lambda x, y: -6.0),
    ("3 << 4", lambda x, y: 48.0),
    ("x << 2", lambda x, y: float(_long(x) << 2)),
    ("-16 >> 2", lambda x, y: -4.0),
    ("-16 >>> 60", lambda x, y: float(_sh_unsigned(-16, 60))),
    # nested ternary is right-associative
    ("x > 100 ? 1 : x > 5 ? 2 : 3", lambda x, y: 2.0 if x > 5 else 3.0),
]


def test_expression_semantics(spark):
    df = spark.createDataFrame([(X, Y)], "x double, y double")
    cols = [
        compile_expression(src).to_column(
            {"x": F.col("x"), "y": F.col("y")}
        ).alias(f"e{i}")
        for i, (src, _) in enumerate(CASES)
    ]
    row = df.select(*cols).collect()[0]
    for i, (src, fn) in enumerate(CASES):
        exp = _py_eval(fn)
        assert math.isclose(row[f"e{i}"], exp, rel_tol=1e-12, abs_tol=1e-12), (
            src, row[f"e{i}"], exp)


INF = float("inf")
NAN = float("nan")

JAVA_EDGE_CASES = [
    # Java IEEE semantics the shims must reproduce under Spark ANSI mode
    ("1 / 0", INF),
    ("-1 / 0", -INF),
    ("0 / 0", NAN),
    ("x / (x - x)", INF),          # 7.25 / 0.0
    ("5 % 0", NAN),
    ("ln(0)", -INF),
    ("ln(-1)", NAN),
    ("log10(0)", -INF),
    ("logn(1, 2)", INF),           # ln(2)/ln(1) = ln2/0
    ("min(sqrt(-1), 5)", NAN),     # Math.min propagates NaN
    ("max(sqrt(-1), 5)", NAN),     # Math.max propagates NaN
    ("sqrt(-4) > 0 ? 10 : 20", 20.0),   # Java: NaN > 0 is false
    ("sqrt(-4) == sqrt(-4)", 0.0),      # Java: NaN == NaN is false
    ("sqrt(-4) != 1", 1.0),             # Java: NaN != x is true
    ("sqrt(-4) <= 1", 0.0),
]


def test_java_edge_semantics(spark):
    """ANSI-mode Spark throws on /0, NULLs ln(0), drops NaN in least() and
    compares NaN as largest — the compiled expressions must reproduce
    java.lang.Math instead."""
    df = spark.createDataFrame([(X, Y)], "x double, y double")
    cols = [
        compile_expression(src).to_column(
            {"x": F.col("x"), "y": F.col("y")}
        ).alias(f"e{i}")
        for i, (src, _) in enumerate(JAVA_EDGE_CASES)
    ]
    row = df.select(*cols).collect()[0]
    for i, (src, exp) in enumerate(JAVA_EDGE_CASES):
        got = row[f"e{i}"]
        if math.isnan(exp):
            assert math.isnan(got), (src, got)
        else:
            assert got == exp, (src, got, exp)


def test_haversin(spark):
    # Paris → London great-circle ≈ 344 km (mean-radius formula)
    df = spark.createDataFrame([(1.0,)], "one double")
    c = compile_expression(
        "haversin(48.8566, 2.3522, 51.5074, -0.1278)"
    ).to_column({})
    km = df.select(c.alias("km")).collect()[0]["km"]
    assert 330 < km < 350
    m = df.select(compile_expression(
        "haversinMeters(48.8566, 2.3522, 51.5074, -0.1278)"
    ).to_column({}).alias("m")).collect()[0]["m"]
    assert math.isclose(m, km * 1000, rel_tol=1e-9)


def test_parse_and_binding_errors():
    for bad in ["x +", "1 2", "foo(1)", "min(1)", "(1", "1 @ 2", "a ? 1"]:
        with pytest.raises(ExpressionError):
            compile_expression(bad).to_column({})
    with pytest.raises(ExpressionError):
        compile_expression("missing + 1").to_column({})
    assert compile_expression("a.b + 1").variables() == {"a.b"}


def test_expression_score_matches_function_score(spark, tmp_path):
    """expression_score('_score * ln(1 + dl)') must equal
    function_score(value_col=ln(1+dl)) hit-for-hit (same double math,
    same final f32 cast)."""
    from lucene_spark.corpus import VOCAB, synthetic_transcripts
    from lucene_spark.indexing.builder import IndexBuilder
    from lucene_spark.search.searcher import IndexSearcher

    idx = str(tmp_path / "idx")
    IndexBuilder(spark, idx, num_segments=3).build(
        synthetic_transcripts(spark, 40))
    s = IndexSearcher(spark, idx)
    q = f"{VOCAB[0]} {VOCAB[2]}"
    a = s.expression_score(q, "_score * ln(1 + dl)", k=25)
    b = s.function_score(
        q, F.log(F.lit(1.0) + F.col("dl").cast("double")), k=25)
    assert [(h.doc_id, h.score) for h in a] == [
        (h.doc_id, h.score) for h in b]

    # the gate's ternary expression: engine vs brute recompute over score_df
    expr = "dl > 40 ? _score * 1.5 : _score + sqrt(dl) * 0.25"
    hits = s.expression_score(q, expr, k=25)
    import numpy as np

    base = {r["doc_id"]: r["score"]
            for r in s.score_df(q).collect()}
    dls = {r["doc_id"]: r["dl"]
           for r in s.reader.docs().select("doc_id", "dl").collect()}
    brute = sorted(
        ((did,
          float(np.float32(sc * 1.5 if dls[did] > 40
                           else sc + math.sqrt(dls[did]) * 0.25)))
         for did, sc in base.items()),
        key=lambda t: (-t[1], t[0]),
    )[:25]
    assert [(h.doc_id, h.score) for h in hits] == brute

    with pytest.raises(ExpressionError):
        s.expression_score(q, "no_such_column + 1", k=5)


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    from lucene_spark.search.searcher import IndexSearcher

    return IndexSearcher(spark, index_dir)


def test_sort_by_expression_matches_brute(searcher):
    """Expression sort ≡ brute: match set ordered by the double expression
    over dl (exact IEEE ops), ties docID asc, both directions."""
    import numpy as np

    from lucene_spark.corpus import VOCAB

    q = searcher.parse(f"{VOCAB[0]} {VOCAB[3]}")
    dls = {int(r["doc_id"]): int(r["dl"])
           for r in searcher.reader.docs().select("doc_id", "dl").collect()}
    match = sorted(h.doc_id for h in searcher.search(q, k=10**6))
    expr = "dl * 3 - (dl * dl) / 64"

    def key(d):
        dl = float(dls[d])
        return dl * 3 - (dl * dl) / 64

    for asc in (True, False):
        got = searcher.search_sorted_by_expression(q, expr, k=12,
                                                   ascending=asc)
        exp = sorted(((d, key(d)) for d in match),
                     key=lambda t: (t[1] if asc else -t[1], t[0]))[:12]
        assert got == exp, asc


def test_sort_by_expression_binds_score(searcher):
    """`_score` binds in sort expressions too — sorting DESC by _score
    reproduces the BM25 top-k doc order (unique scores assumed ties
    handled by docID)."""
    from lucene_spark.corpus import VOCAB

    q = searcher.parse(f"{VOCAB[0]} {VOCAB[3]}")
    got = searcher.search_sorted_by_expression(q, "_score", k=10,
                                               ascending=False)
    want = searcher.search(q, k=10)
    assert [d for d, _ in got] == [h.doc_id for h in want]


def test_sort_by_expression_unbound_raises(searcher):
    from lucene_spark.search.expressions import ExpressionError

    with pytest.raises(ExpressionError, match="unbound"):
        searcher.sort_by_expression_df("x", "nosuchcol + 1")
