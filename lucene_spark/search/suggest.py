"""Suggest-lite + Monitor-lite — the ``lucene/suggest`` and
``lucene/monitor`` modules re-expressed on existing substrates.

- :func:`suggest_terms` — prefix completion over the term dictionary
  ranked by document frequency (the weight), the
  ``suggest/.../TermFreqIterator``-style suggester
  (``lucene/suggest/src/java/org/apache/lucene/search/suggest/Lookup.java``:
  lookups return (key, weight) pairs ranked by weight). Spark-first: one
  pushdown scan of the sorted term-dict parquet (StringStartsWith hits
  row-group min/max), TakeOrdered reduce — or zero jobs when the driver
  dictionary is resident.

- :func:`percolate_df` — the Monitor / percolator inverse search
  (``lucene/monitor/src/java/org/apache/lucene/monitor/Monitor.java``:
  match(doc) returns which REGISTERED QUERIES match a document).
  Spark-first inversion: each stored query's distributed match set is
  labeled and unioned — (query_id, doc_id) rows for every registered query
  that matches each doc, reusing ``IndexSearcher.match_df`` (and its LRU
  cache) for every query shape the engine supports. Scale note: this is
  O(registered queries) plans per run, right for O(10^2-10^3) alert
  queries; the reference Monitor's Presearcher (indexing the queries
  themselves to prefilter candidates) would be the next step for 10^5+
  registered queries and is documented out of scope.
"""

from __future__ import annotations


def suggest_terms(reader, prefix: str, k: int = 10, field: str = "text"):
    """Top-k completions of ``prefix`` ranked by (df DESC, term ASC).

    Returns [(term, df), ...]. Driver-resident dictionaries answer with no
    Spark job; larger dictionaries run a StringStartsWith-pushdown scan
    with a TakeOrdered reduce.
    """
    cache = reader._term_cache()
    if cache is not None:
        cands = [(t, v["df"]) for (f, t), v in cache.items()
                 if f == field and t.startswith(prefix)]
        cands.sort(key=lambda x: (-x[1], x[0]))
        return cands[:k]
    from pyspark.sql import functions as F

    rows = (
        reader._term_stats_df
        .filter((F.col("field") == field)
                & F.col("term").startswith(prefix))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
        .collect()
    )
    return [(r["term"], int(r["df"])) for r in rows]


def percolate_df(searcher, queries: dict):
    """(query_id, doc_id) DataFrame: every registered query × the docs it
    matches. ``queries``: {query_id: AST node or classic-syntax string}.
    Each match set stays distributed; the union is one plan."""
    from functools import reduce

    from pyspark.sql import functions as F

    parts = []
    for qid, q in sorted(queries.items()):
        if isinstance(q, str):
            q = searcher.parse(q)
        parts.append(
            searcher.match_df(q).select(
                F.lit(qid).alias("query_id"), "doc_id")
        )
    if not parts:
        return searcher.spark.createDataFrame(
            [], "query_id string, doc_id long")
    return reduce(lambda a, b: a.unionByName(b), parts)


def spell_suggest(reader, term: str, k: int = 5, field: str = "text",
                  max_edits: int = 2, min_df: int = 1,
                  distance: str = "dl"):
    """DirectSpellChecker analogue (``suggest/spell/DirectSpellChecker.java:44``
    suggestSimilar): top-k dictionary terms within Damerau-Levenshtein
    distance <= ``max_edits`` of ``term``; the input term itself is
    excluded.

    ``distance`` plugs the RANKING metric like ``setDistance`` (the
    candidate set always comes from the DL dictionary expansion — the
    reference's FuzzyTermsEnum candidate source): "dl" ranks (distance
    ASC, df DESC, term ASC) and returns [(term, df, dist)];
    "jaro_winkler" / "ngram" (``JaroWinklerDistance.java`` /
    ``NGramDistance.java`` — see :data:`STRING_DISTANCES`) rank
    (similarity DESC, df DESC, term ASC) and return [(term, df, sim)].

    Driver-resident dictionaries answer with no Spark job; larger
    dictionaries run a length-window + levenshtein pushdown scan (Spark's
    builtin is plain Levenshtein, a LOWER bound on DL only up to a factor -
    the scan over-collects with a 2x edit budget, then the exact DL filter
    runs on the bounded candidate list driver-side)."""
    from lucene_spark.search.multiterm import damerau_levenshtein

    n = len(term)
    sim_fn = STRING_DISTANCES.get(distance) if distance != "dl" else None
    if distance != "dl" and sim_fn is None:
        raise ValueError(f"unknown distance: {distance!r}")

    def rank(cands):
        out = [(t, df, damerau_levenshtein(t, term)) for t, df in cands]
        out = [c for c in out if c[2] <= max_edits and c[0] != term
               and c[1] >= min_df]
        if sim_fn is not None:
            out = [(t, df, sim_fn(term, t)) for t, df, _ in out]
            out.sort(key=lambda x: (-x[2], -x[1], x[0]))
        else:
            out.sort(key=lambda x: (x[2], -x[1], x[0]))
        return out[:k]

    cache = reader._term_cache()
    if cache is not None:
        return rank((t, v["df"]) for (f, t), v in cache.items()
                    if f == field and abs(len(t) - n) <= max_edits)

    from pyspark.sql import functions as F

    rows = (
        reader._term_stats_df
        .filter((F.col("field") == field)
                & (F.length("term") >= n - max_edits)
                & (F.length("term") <= n + max_edits)
                & (F.levenshtein(F.col("term"), F.lit(term)) <= 2 * max_edits))
        .select("term", "df")
        .collect()
    )
    return rank((r["term"], int(r["df"])) for r in rows)


def suggest_infix(reader, substr: str, k: int = 10, field: str = "text"):
    """AnalyzingInfixSuggester-lite
    (``suggest/analyzing/AnalyzingInfixSuggester.java:71`` — "like a normal
    suggester except it matches terms anywhere in the surface form, not just
    the prefix"): top-k dictionary terms CONTAINING ``substr``, ranked by
    (df DESC, term ASC). Returns [(term, df), ...].

    Driver-resident dictionaries answer with no Spark job; larger
    dictionaries run a contains-pushdown scan (StringContains reaches the
    parquet reader) with a TakeOrdered reduce. The reference accelerates
    this with edge n-grams of every token; at this layout the dictionary
    scan is one column of one sorted table — the n-gram sidecar is the
    documented next step past ~10^9 terms.
    """
    cache = reader._term_cache()
    if cache is not None:
        cands = [(t, v["df"]) for (f, t), v in cache.items()
                 if f == field and substr in t]
        cands.sort(key=lambda x: (-x[1], x[0]))
        return cands[:k]
    from pyspark.sql import functions as F

    rows = (
        reader._term_stats_df
        .filter((F.col("field") == field)
                & F.col("term").contains(substr))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
        .collect()
    )
    return [(r["term"], int(r["df"])) for r in rows]


class FreeTextSuggester:
    """N-gram language-model suggester with stupid backoff —
    ``suggest/analyzing/FreeTextSuggester.java`` (ALPHA = 0.4, the "Large
    language models in machine translation" model it cites).

    ``build``: token n-gram count tables (1..grams) from a corpus
    DataFrame — per-order ONE explode + two-stage groupBy (map-side
    combine; hot n-grams reduce before the shuffle), the ShingleFilter +
    aggregation the reference runs through a temp index + FST.

    ``lookup(key)``: the last (grams-1) analyzed tokens form the context;
    a trailing-space key predicts the NEXT token, otherwise the last
    fragment is prefix-completed. Levels run highest-order first:
    score = 0.4^level_drop × count(context+token) / count(context)
    (count(∅) = totTokens); a token seen at a higher order is not
    re-suggested (the ``seen`` set); ranked (score DESC, token ASC).
    Scores stay exact doubles (integer ratios × a power-of-0.4 literal —
    deterministic cross-engine; the reference's Long.MAX_VALUE
    presentation scaling is dropped, documented).

    Levels with insufficient context are skipped WITHOUT consuming a
    backoff step, and an unseen context still decays the backoff — both
    exactly as the reference loop does (lookup():524-676).
    """

    ALPHA = 0.4

    def __init__(self, spark, docs_df, analyzer, grams: int = 3,
                 text_col: str = "text"):
        from pyspark.sql import functions as F

        if grams < 1:
            raise ValueError("grams must be >= 1")
        self.spark = spark
        self.grams = int(grams)
        self.analyzer = analyzer
        toks = docs_df.select(
            F.regexp_extract_all(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                F.lit("[a-z0-9]+"), F.lit(0)).alias("ts"))
        self.tables = {}
        for n in range(1, self.grams + 1):
            grams_col = F.when(
                F.size("ts") < n, F.array().cast("array<string>")
            ).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("ts"), i, n)),
                )
            )
            self.tables[n] = (
                toks.select(F.explode(grams_col).alias("g"))
                .groupBy("g").agg(F.count(F.lit(1)).alias("cnt"))
                .cache()
            )
        self.tot_tokens = int(
            self.tables[1].agg(F.sum("cnt")).head()[0] or 0)

    def lookup(self, key: str, num: int = 10) -> list[tuple[str, float]]:
        """Ranked [(next_or_completed_token, score)]."""
        from pyspark.sql import functions as F

        toks = self.analyzer.tokenize_text(key)
        if not toks:
            raise ValueError("no tokens produced by the analyzer")
        ended = key != key.rstrip()
        frag = None if ended else toks[-1]
        ctx_all = toks if ended else toks[:-1]
        levels = []  # (weight, context tuple)
        backoff = 1.0
        for n in range(self.grams, 0, -1):
            need = n - 1
            if len(ctx_all) < need:
                continue  # insufficient context: no backoff step (ref :545)
            ctx = tuple(ctx_all[len(ctx_all) - need:])
            ctx_cnt = self._count(ctx)
            if ctx_cnt > 0:
                levels.append((backoff, ctx, ctx_cnt, n))
            backoff *= self.ALPHA  # unseen context still decays (ref :566)
        out: dict[str, float] = {}
        for weight, ctx, ctx_cnt, n in levels:
            df = self.tables[n]
            prefix = (" ".join(ctx) + " ") if ctx else ""
            cand = df.filter(F.col("g").startswith(prefix + (frag or "")))
            # per-level top cut (the FST top-paths search): within a level
            # score ∝ cnt, at most |seen| candidates are masked, so the top
            # (num + |seen|) by (cnt DESC, tok ASC) provably contains every
            # candidate that can reach the final top-num
            tok = F.substring_index(F.col("g"), " ", -1)
            rows = (cand.select(tok.alias("tok"), "cnt")
                    .orderBy(F.desc("cnt"), F.asc("tok"))
                    .limit(int(num) + len(out)).collect())
            for r in rows:
                t = r["tok"]
                if t in out:
                    continue  # seen at a higher order (ref seen-set)
                out[t] = weight * (int(r["cnt"]) / float(ctx_cnt))
        ranked = sorted(out.items(), key=lambda t: (-t[1], t[0]))
        return ranked[:int(num)]

    def _count(self, ctx: tuple) -> int:
        from pyspark.sql import functions as F

        if not ctx:
            return self.tot_tokens
        n = len(ctx)
        row = self.tables[n].filter(
            F.col("g") == " ".join(ctx)).select("cnt").head()
        return int(row["cnt"]) if row else 0


def fuzzy_suggest(reader, key: str, k: int = 10, field: str = "text",
                  max_edits: int = 1, non_fuzzy_prefix: int = 1,
                  min_fuzzy_length: int = 3, exact_first: bool = True):
    """FuzzySuggester-lite
    (``suggest/analyzing/FuzzySuggester.java:66-91``): completions whose
    term has SOME prefix within Damerau-Levenshtein distance ≤
    ``max_edits`` of the lookup key — the first ``non_fuzzy_prefix`` chars
    must match exactly and keys shorter than ``min_fuzzy_length`` get no
    edits at all (plain prefix completion), the reference's three knobs at
    their defaults (1 edit / 1-char fixed prefix / min length 3).
    Ranked (df DESC, term ASC) like this module's other suggesters (df is
    the weight analogue); ``exact_first`` ranks an exact term match first
    (``AnalyzingSuggester.exactFirst``, default true). Returns
    [(term, df)].

    The prefix-DL test uses the same ``damerau_levenshtein`` as the rest
    of the engine (== DuckDB's, so oracles mirror it exactly); the
    reference's automaton uses OSA distance over analyzed BYTES —
    identical on ASCII keys, documented divergence beyond.

    Driver-resident dictionaries answer with no Spark job; larger
    dictionaries run a StringStartsWith(non-fuzzy prefix) pushdown scan
    before the exact driver-side filter."""
    from lucene_spark.search.multiterm import damerau_levenshtein

    edits = max_edits if len(key) >= min_fuzzy_length else 0
    pre, rest = key[:non_fuzzy_prefix], key[non_fuzzy_prefix:]

    def matches(t: str) -> bool:
        if not t.startswith(pre):
            return False
        s = t[len(pre):]
        if edits == 0:
            return s.startswith(rest)
        return any(damerau_levenshtein(s[:j], rest) <= edits
                   for j in range(len(s) + 1))

    cache = reader._term_cache()
    if cache is not None:
        cands = [(t, v["df"]) for (f, t), v in cache.items()
                 if f == field and matches(t)]
    else:
        from pyspark.sql import functions as F

        rows = (
            reader._term_stats_df
            .filter((F.col("field") == field)
                    & F.col("term").startswith(pre))
            .select("term", "df").collect()
        )
        cands = [(r["term"], int(r["df"])) for r in rows
                 if matches(r["term"])]
    cands.sort(key=lambda x: (not (exact_first and x[0] == key),
                              -x[1], x[0]))
    return cands[:k]


def word_break_suggest(reader, term: str, k: int = 5, field: str = "text",
                       max_changes: int = 2, min_break_length: int = 1,
                       min_suggestion_freq: int = 1,
                       max_evaluations: int = 1000):
    """``WordBreakSpellChecker.suggestWordBreaks`` (``lucene/suggest/src/java/
    org/apache/lucene/search/spell/WordBreakSpellChecker.java:238-300``,
    SUGGEST_WHEN_NOT_IN_INDEX + NUM_CHANGES_THEN_MAX_FREQUENCY): split a
    not-in-index term into dictionary words — split points scan left to
    right, the left word must meet the frequency floor both to suggest and
    to recurse into the right remainder (numberBreaks ≤ ``max_changes``),
    with the reference's shared ``maxEvaluations`` budget. Ranked (fewer
    words first, then max word docFreq DESC). Documented divergence:
    equal-rank ties order by the joined suggestion ASC — the reference PQ's
    tie order is insertion-dependent. Returns
    [(suggestion, num_words, freq_max)].

    One batched ``term_stats`` lookup covers every contiguous substring of
    the input (≤ n(n+1)/2 probes against the driver-resident dictionary /
    one pushdown scan), then the recursion is pure in-memory — no per-split
    Spark work.
    """
    stats = reader.term_stats([term], field=field)
    if stats.get(term, {}).get("df", 0) > 0:
        return []  # SUGGEST_WHEN_NOT_IN_INDEX
    n = len(term)
    subs = {term[i:j] for i in range(n) for j in range(i + 1, n + 1)}
    dfs = reader.term_stats(sorted(subs), field=field)
    df = lambda w: dfs.get(w, {}).get("df", 0)  # noqa: E731

    out = []
    state = {"evals": 0}
    minlen = max(min_break_length, 1)

    def recurse(rest: str, number_breaks: int, prefix: tuple):
        m = len(rest)
        if m < minlen * 2:
            return
        for i in range(minlen, m - minlen + 1):
            if state["evals"] >= max_evaluations:
                break
            state["evals"] += 1
            left, right = rest[:i], rest[i:]
            if df(left) >= min_suggestion_freq:
                if df(right) >= min_suggestion_freq:
                    words = prefix + (left, right)
                    out.append((" ".join(words), len(words),
                                max(df(w) for w in words)))
                if number_breaks + 1 <= max_changes:
                    recurse(right, number_breaks + 1, prefix + (left,))

    recurse(term, 1, ())
    out.sort(key=lambda s: (s[1], -s[2], s[0]))
    return out[:k]


def word_combine_suggest(reader, terms, k: int = 5, field: str = "text",
                         max_changes: int = 2,
                         max_combine_length: int = 20,
                         min_suggestion_freq: int = 1):
    """``WordBreakSpellChecker.suggestWordCombinations`` (same file,
    :139-236, SUGGEST_WHEN_NOT_IN_INDEX): concatenate runs of 2..
    ``max_changes``+1 consecutive query terms; suggest when at least one
    term of the run is absent from the index (min original freq == 0), the
    combined text is a dictionary word (freq ≥ the floor), and the combined
    length stays ≤ ``max_combine_length``. Ranked (fewer combined terms,
    then combined docFreq DESC); ties → (start index ASC). Returns
    [(start, end, combined, freq)] with an inclusive index range.
    """
    terms = list(terms)
    cands = set(terms)
    for i in range(len(terms) - 1):
        comb = terms[i]
        for j in range(i + 1, min(len(terms), i + max_changes + 1)):
            comb += terms[j]
            if len(comb) > max_combine_length:
                break
            cands.add(comb)
    dfs = reader.term_stats(sorted(cands), field=field)
    df = lambda w: dfs.get(w, {}).get("df", 0)  # noqa: E731

    out = []
    for i in range(len(terms) - 1):
        if len(terms[i]) > max_combine_length:
            continue
        comb = terms[i]
        min_freq = df(terms[i])
        for j in range(i + 1, min(len(terms), i + max_changes + 1)):
            comb += terms[j]
            if len(comb) > max_combine_length:
                break
            min_freq = min(min_freq, df(terms[j]))
            cf = df(comb)
            if min_freq == 0 and cf >= min_suggestion_freq:
                out.append((i, j, comb, cf))
    out.sort(key=lambda s: (s[1] - s[0], -s[3], s[0]))
    return out[:k]


# ------------------------------------------------- StringDistance plug-ins --
# DirectSpellChecker's pluggable distances (suggest/spell/StringDistance.java
# family): candidates still come from the DL<=max_edits dictionary expansion
# (the reference's FuzzyTermsEnum candidate source), the plugged distance
# only RANKS them. Similarities are float32 per the reference's float math.

def jaro_winkler(s1: str, s2: str, threshold: float = 0.7) -> float:
    """``suggest/spell/JaroWinklerDistance.java:37-105`` ported exactly:
    match-window Jaro with transposition halving, Winkler bonus only past
    the 0.7 threshold, prefix UNCAPPED but scaled by min(0.1, 1/maxlen)
    (the reference deliberately differs from textbook Winkler's prefix-4
    cap — DuckDB's builtin caps at 4, which is why this is pytest-gated
    against the reference goldens rather than SQL-oracled)."""
    import numpy as np

    f = np.float32
    mx, mn = (s1, s2) if len(s1) > len(s2) else (s2, s1)
    rng = max(len(mx) // 2 - 1, 0)
    flags = [False] * len(mx)
    midx = [-1] * len(mn)
    m = 0
    for i, c in enumerate(mn):
        for xi in range(max(i - rng, 0), min(i + rng + 1, len(mx))):
            if not flags[xi] and c == mx[xi]:
                midx[i] = xi
                flags[xi] = True
                m += 1
                break
    if m == 0:
        return 0.0
    ms1 = [mn[i] for i in range(len(mn)) if midx[i] != -1]
    ms2 = [mx[i] for i in range(len(mx)) if flags[i]]
    t = sum(1 for a, b in zip(ms1, ms2) if a != b) // 2
    p = 0
    for i in range(len(mn)):
        if s1[i] == s2[i]:
            p += 1
        else:
            break
    mf = f(m)
    j = f((f(mf / f(len(s1))) + f(mf / f(len(s2)))
           + f(f(mf - t) / mf)) / f(3))
    if j < f(threshold):
        return float(j)
    return float(f(j + f(min(f(0.1), f(1.0) / f(len(mx))))
                   * f(p) * f(f(1) - j)))


def ngram_similarity(source: str, target: str, n: int = 2) -> float:
    """``suggest/spell/NGramDistance.java:49-133`` ported exactly: the
    position-based n-gram DP with a null-char prefix of size n-1 and
    prefix-match discounting; returns 1 − cost/max(len)."""
    sl, tl = len(source), len(target)
    if sl == 0 or tl == 0:
        return 1.0 if sl == tl else 0.0
    if sl < n or tl < n:
        cost = sum(1 for i in range(min(sl, tl))
                   if source[i] == target[i])
        return float(cost) / max(sl, tl)
    sa = "\0" * (n - 1) + source
    p = [float(i) for i in range(sl + 1)]
    d = [0.0] * (sl + 1)
    for j in range(1, tl + 1):
        t_j = ("\0" * (n - j) + target[:j]) if j < n \
            else target[j - n:j]
        d[0] = float(j)
        for i in range(1, sl + 1):
            cost, tn = 0, n
            for ni in range(n):
                if sa[i - 1 + ni] != t_j[ni]:
                    cost += 1
                elif sa[i - 1 + ni] == "\0":
                    tn -= 1
            ec = cost / tn
            d[i] = min(d[i - 1] + 1, p[i] + 1, p[i - 1] + ec)
        p, d = d, p
    return 1.0 - (p[sl] / max(tl, sl))


STRING_DISTANCES = {
    "jaro_winkler": jaro_winkler,
    "ngram": ngram_similarity,
}


def levenshtein_similarity(target: str, other: str) -> float:
    """``suggest/spell/LevenshteinDistance.java``: plain Levenshtein scaled
    as 1 − dist/max(len)."""
    n, m = len(target), len(other)
    if n == 0 or m == 0:
        return 1.0 if n == m else 0.0
    p = list(range(n + 1))
    for j in range(1, m + 1):
        d = [j] + [0] * n
        for i in range(1, n + 1):
            cost = 0 if target[i - 1] == other[j - 1] else 1
            d[i] = min(d[i - 1] + 1, p[i] + 1, p[i - 1] + cost)
        p = d
    return 1.0 - (float(p[n]) / max(n, m))


def lucene_levenshtein_similarity(target: str, other: str) -> float:
    """``suggest/spell/LuceneLevenshteinDistance.java:45-104``: the
    transposition-aware (OSA) edit distance DirectSpellChecker uses
    internally, scaled 1 − dist/MIN(len) — note min, unlike the plain
    variant's max (the reference's deliberate asymmetry; can go negative
    for very different strings, matching the Java)."""
    n, m = len(target), len(other)
    if n == 0 or m == 0:
        return 0.0 if n == m else float(max(n, m))
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for j in range(1, m + 1):
        for i in range(1, n + 1):
            cost = 0 if target[i - 1] == other[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + cost)
            if (i > 1 and j > 1 and target[i - 1] == other[j - 2]
                    and target[i - 2] == other[j - 1]):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + cost)
    return 1.0 - (float(d[n][m]) / min(n, m))


STRING_DISTANCES["levenshtein"] = levenshtein_similarity
STRING_DISTANCES["lucene_levenshtein"] = lucene_levenshtein_similarity
