"""Index-backed text classification — the ``lucene/classification`` module.

``SimpleNaiveBayesClassifier``
(``classification/src/java/org/apache/lucene/classification/
SimpleNaiveBayesClassifier.java``): a naive Bayes classifier whose training
data IS the index — classes are the terms of a keyword (class) field,
priors and word likelihoods come from index statistics:

- classes + df(c):            the class field's term dictionary
- docsWithClass N:            getDocCount(class field) = Σdf (single-valued)
- log prior(c):               ln(df(c)) − ln(N)                        (:279)
- hits(w, c):                 count of ``+text:w +class:c``            (:263)
- den(c) = avgUniqueTerms × df(c) + N, where avgUniqueTerms =
  sumDocFreq(text) / docCount(text)  (docs with ≥1 term ⇔ dl > 0)      (:241)
- log likelihood:             Σ_w ln((hits(w,c) + 1) / den(c))  — add-1
  smoothing, repeated input words count each occurrence               (:209)

Cross-engine exactness contract (same trick as the BM25 / unigram-LM
oracles): every ``ln`` narrows to float32 — absorbing last-ulp libm
differences — and the per-input sums accumulate those float32 values in
double, which is EXACT (≪ 53 significant bits) and order-independent, so
the DuckDB oracle hash-matches bit-for-bit.

Scale shape: ONE distributed job computes the (word, class, hits) table —
the union of per-word match sets joined to the union of per-class match
sets, two-stage counted; its size is |query words| × |classes| (tiny), so
the driver-side score assembly handles a handful of scalars, exactly like
Lucene's own per-call loop. Nothing corpus-sized is collected.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from lucene_spark.search import ast


def _f32_ln(x: float) -> float:
    return float(np.float32(math.log(x)))


def _union_by_name(parts):
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u


def _classes_of(searcher, classes, class_field: str,
                doc_ids: list[int]) -> dict[int, str]:
    """doc_id → class for a bounded doc set: ONE union of per-class
    keyword match sets filtered to the ids (shared by the k-NN
    classifiers)."""
    ids = [int(d) for d in doc_ids]
    parts = [
        searcher.match_df(ast.TermQuery(c, class_field))
        .filter(F.col("doc_id").isin(ids))
        .select("doc_id", F.lit(c).alias("cls"))
        for c in classes
    ]
    return {int(r["doc_id"]): r["cls"]
            for r in _union_by_name(parts).collect()}


class SimpleNaiveBayesClassifier:
    def __init__(self, searcher, class_field: str = "role",
                 text_field: str = "text"):
        self.searcher = searcher
        self.class_field = class_field
        self.text_field = text_field
        r = searcher.reader
        stats = r._term_stats_df.filter(F.col("field") == class_field)
        self.classes = {
            row["term"]: int(row["df"])
            for row in stats.select("term", "df").collect()
        }
        if not self.classes:
            raise ValueError(f"no terms in class field {class_field!r}")
        fs = r.field_stats[class_field]
        self.n_class = int(fs["doc_count"])  # docsWithClass (Σdf, 1-valued)
        tfs = r.field_stats[text_field]
        # Lucene getDocCount(text) counts docs with ≥1 term (dl > 0)
        self.doc_count_text = int(
            r.docs().filter(F.col("dl") > 0).count())
        self.avg_unique = tfs["sum_df"] / float(self.doc_count_text)

    def _hits(self, words: list[str]):
        """(word, class, hits) via one distributed plan: union of per-word
        text match sets ⋈ union of per-class keyword match sets."""
        s = self.searcher
        uniq = sorted(set(words))
        wparts = [
            s.match_df(ast.TermQuery(w, self.text_field))
            .select("doc_id", F.lit(w).alias("word"))
            for w in uniq
        ]
        cparts = [
            s.match_df(ast.TermQuery(c, self.class_field))
            .select("doc_id", F.lit(c).alias("cls"))
            for c in sorted(self.classes)
        ]

        rows = (
            _union_by_name(wparts).join(_union_by_name(cparts), "doc_id")
            .groupBy("word", "cls")
            .agg(F.count(F.lit(1)).alias("hits"))
            .collect()
        )
        return {(r["word"], r["cls"]): int(r["hits"]) for r in rows}

    def classify_all(self, texts: list[str]) -> list[list[tuple[str, float]]]:
        """Per input: every class with its raw log score, ranked
        (score DESC, class ASC) — ``getClasses`` minus the monotone 0-1
        normalization (argmax identical; documented cut)."""
        tok = [self.searcher.analyzer.tokenize_text(t) for t in texts]
        all_words = [w for ws in tok for w in ws]
        hits = self._hits(all_words) if all_words else {}
        out = []
        for ws in tok:
            scored = []
            for c, dfc in sorted(self.classes.items()):
                den = self.avg_unique * float(dfc) + float(self.n_class)
                sc = _f32_ln(float(dfc)) - _f32_ln(float(self.n_class))
                for w in ws:
                    num = float(hits.get((w, c), 0) + 1)
                    sc += float(np.float32(math.log(num / den)))
                scored.append((c, sc))
            scored.sort(key=lambda t: (-t[1], t[0]))
            out.append(scored)
        return out

    def assign_class(self, text: str) -> tuple[str, float]:
        """``assignClass``: the max-scoring class."""
        return self.classify_all([text])[0][0]

    def classify_df(self, texts: list[str]):
        """(input_id, cls, score) DataFrame over every (input, class) pair
        — the gate-able surface."""
        rows = [
            (i, c, s)
            for i, scored in enumerate(self.classify_all(texts))
            for c, s in scored
        ]
        return self.searcher.spark.createDataFrame(
            rows, "input_id long, cls string, score double")


class KNearestNeighborClassifier:
    """``classification/.../KNearestNeighborClassifier.java``: classify by
    voting over the k docs most similar to the input (a MoreLikeThis query
    over the text field → top-k BM25 → class votes):

    - per class: count + boost = Σ hit score / maxScore (top-1 score)
    - score(c) = (count × (boost/count)) / k, rescaled ×k/sumdoc when
      fewer than k hits carried a class (``buildListFromTopDocs``)

    Cross-engine exactness: each score/maxScore quotient narrows to
    float32 before the per-class double sum (exact, order-independent) —
    same contract as the rest of the oracle suite. Lucene turns MLT term
    boosting ON for knnSearch; this classifier exposes ``mlt_opts`` and
    the driver gate runs the unboosted config its SQL oracle models
    (boosted selection is engine-supported via ``mlt_query(boost=True)``).
    """

    def __init__(self, searcher, class_field: str = "role", k: int = 10,
                 mlt_opts: dict | None = None):
        self.searcher = searcher
        self.class_field = class_field
        self.k = int(k)
        self.mlt_opts = dict(mlt_opts or {})
        stats = searcher.reader._term_stats_df.filter(
            F.col("field") == class_field)
        self.classes = sorted(
            r["term"] for r in stats.select("term").collect())
        if not self.classes:
            raise ValueError(f"no terms in class field {class_field!r}")

    def _classes_of(self, doc_ids: list[int]) -> dict[int, str]:
        return _classes_of(self.searcher, self.classes, self.class_field,
                           doc_ids)

    def classify_all(self, texts: list[str]) -> list[list[tuple[str, float]]]:
        out = []
        for text in texts:
            hits = self.searcher.more_like_this(text, k=self.k,
                                                **self.mlt_opts)
            cls_of = (self._classes_of([h.doc_id for h in hits])
                      if hits else {})
            out.append(_build_list_from_top_docs(hits, cls_of, self.k))
        return out

    def assign_class(self, text: str):
        scored = self.classify_all([text])[0]
        return scored[0] if scored else None

    def classify_df(self, texts: list[str]):
        rows = [
            (i, c, s)
            for i, scored in enumerate(self.classify_all(texts))
            for c, s in scored
        ]
        return self.searcher.spark.createDataFrame(
            rows, "input_id long, cls string, score double")

class BM25NBClassifier:
    """``classification/.../BM25NBClassifier.java:47`` — naive Bayes
    approximated by pure BM25 query scores:

    - classes = the class (keyword) field's term dictionary (:126-139)
    - log prior(c)       = ln(top-1 score of ``+class:c``)        (:222-231)
    - log likelihood(c)  = Σ_w ln(top-1 score of ``+class:c text:w``),
      repeated input words counting each occurrence              (:198-220);
      a (class, word) pair with no hits contributes ln(1) = 0 — but with
      the class term always matching, top-1 is never empty here

    The reference runs one IndexSearcher.search per (class, word). Both
    top-1 scores have closed forms that ONE distributed job computes:
    the class field is keyword-indexed (omitNorms, tf = 1), so the class
    clause adds the same float32 constant cconst(c)
    (:func:`lucene_spark.search.searcher.keyword_const_score`) to every doc
    of class c; hence

    - top-1(``+class:c``)           = cconst(c)
    - top-1(``+class:c text:w``)    = f32(cconst(c) + max_ws(c, w)) where
      max_ws = the max per-doc float32 BM25 text score of w over docs of
      class c (0 when no class doc contains w — the SHOULD clause). The
      f32 narrowing of the per-doc double clause sum is monotone, so
      max-then-narrow equals the reference's per-doc narrow-then-max.

    max_ws for all (class, word) pairs is one plan: union of per-word
    score sets ⋈ union of per-class match sets → groupBy max — tiny
    output, nothing corpus-sized collected (same shape as SimpleNB).

    Cross-engine exactness contract (same as SimpleNB): each ln narrows
    to float32, per-input sums accumulate in double (exact,
    order-independent). The reference's softmax normalization
    (``normClassificationResults`` :147-174) is strictly monotone per
    input — exposed via ``normalize=True`` (ranking identical,
    pytest-pinned); the gate scores are the raw log posteriors.
    """

    def __init__(self, searcher, class_field: str = "role",
                 text_field: str = "text"):
        from lucene_spark.search.searcher import keyword_const_score

        self.searcher = searcher
        self.class_field = class_field
        self.text_field = text_field
        r = searcher.reader
        stats = r._term_stats_df.filter(F.col("field") == class_field)
        rows = stats.select("term", "df", "ttf").collect()
        if not rows:
            raise ValueError(f"no terms in class field {class_field!r}")
        fs = r.field_stats[class_field]
        self.cconst = {
            row["term"]: float(keyword_const_score(
                searcher.similarity, 1.0, fs,
                {"df": int(row["df"]), "ttf": int(row["ttf"])}))
            for row in rows
        }

    def _max_word_scores(self, words: list[str]):
        """(word, class) → max per-doc float32 text score, one plan."""
        s = self.searcher
        uniq = sorted(set(words))
        if not uniq:
            return {}
        wparts = [
            s.score_df(ast.TermQuery(w, self.text_field))
            .select("doc_id", "score", F.lit(w).alias("word"))
            for w in uniq
        ]
        cparts = [
            s.match_df(ast.TermQuery(c, self.class_field))
            .select("doc_id", F.lit(c).alias("cls"))
            for c in sorted(self.cconst)
        ]
        rows = (
            _union_by_name(wparts).join(_union_by_name(cparts), "doc_id")
            .groupBy("word", "cls")
            .agg(F.max("score").alias("mx"))
            .collect()
        )
        return {(r["word"], r["cls"]): float(r["mx"]) for r in rows}

    def classify_all(self, texts: list[str],
                     normalize: bool = False) -> list[list[tuple[str, float]]]:
        tok = [self.searcher.analyzer.tokenize_text(t) for t in texts]
        mx = self._max_word_scores([w for ws in tok for w in ws])
        out = []
        for ws in tok:
            scored = []
            for c, cc in sorted(self.cconst.items()):
                sc = _f32_ln(cc)  # log prior
                for w in ws:
                    p = float(np.float32(cc + mx.get((w, c), 0.0)))
                    sc += _f32_ln(p)
                scored.append((c, sc))
            scored.sort(key=lambda t: (-t[1], t[0]))
            if normalize:
                # normClassificationResults: softmax via the log-sum-exp
                # trick (:147-174) — strictly monotone, ranking unchanged
                smax = scored[0][1]
                loga = smax + math.log(
                    sum(math.exp(s - smax) for _, s in scored))
                scored = [(c, math.exp(s - loga)) for c, s in scored]
            out.append(scored)
        return out

    def assign_class(self, text: str) -> tuple[str, float]:
        return self.classify_all([text])[0][0]

    def classify_df(self, texts: list[str]):
        """(input_id, cls, score) over every (input, class) pair."""
        rows = [
            (i, c, s)
            for i, scored in enumerate(self.classify_all(texts))
            for c, s in scored
        ]
        return self.searcher.spark.createDataFrame(
            rows, "input_id long, cls string, score double")

# -- KNearestFuzzyClassifier ------------------------------------------------

#: NearestFuzzyQuery fixed parameters
#: (``classification/utils/NearestFuzzyQuery.java:53-56``)
NF_MAX_VARIANTS_PER_TERM = 50
NF_MAX_EDITS = 1           # MIN_SIMILARITY = 1f (cast to int maxEdits)
NF_PREFIX_LENGTH = 2
NF_MAX_NUM_TERMS = 300


def fuzzy_variants(reader, token: str, field: str = "text",
                   prefix_len: int = NF_PREFIX_LENGTH,
                   max_edits: int = NF_MAX_EDITS) -> list[tuple]:
    """Dictionary variants of ``token``: share its ``prefix_len``-char
    prefix with Damerau-Levenshtein distance ≤ ``max_edits`` on the SUFFIX
    — ``FuzzyTermsEnum``'s automata are (exact prefix) + Levenshtein on the
    remainder with transpositions on (``core/search/FuzzyTermsEnum.java``;
    ``NearestFuzzyQuery.java:134`` passes transpositions=true). Tokens
    shorter than ``prefix_len`` use the whole token as the fixed prefix
    (``FuzzyAutomatonBuilder``: realPrefixLength = min(prefixLength,
    termLength)) — candidates are then sliced at the SAME real prefix
    length, so e.g. token 'a' measures 'an' at suffix distance 1, not 0.
    Returns [(term, df, suffix_ed)] — includes the token itself (ed 0)
    when indexed.

    Driver-resident dictionaries answer with no Spark job; otherwise ONE
    prefix-pushdown scan (StartsWith reaches the parquet term dictionary)
    bounds the candidate list before the exact driver-side DL filter —
    same hybrid as spell_suggest."""
    from lucene_spark.search.multiterm import damerau_levenshtein

    prefix_len = min(prefix_len, len(token))
    pre, suf = token[:prefix_len], token[prefix_len:]
    n = len(token)
    cache = reader._term_cache()
    if cache is not None:
        cands = [(t, v["df"]) for (f, t), v in cache.items()
                 if f == field and t.startswith(pre)
                 and abs(len(t) - n) <= max_edits]
    else:
        rows = (
            reader._term_stats_df
            .filter((F.col("field") == field)
                    & F.col("term").startswith(pre)
                    & (F.length("term") >= n - max_edits)
                    & (F.length("term") <= n + max_edits))
            .select("term", "df").collect()
        )
        cands = [(r["term"], int(r["df"])) for r in rows]
    out = []
    for t, df in cands:
        ed = damerau_levenshtein(t[prefix_len:], suf)
        if ed <= max_edits:
            out.append((t, int(df), ed))
    return out


def nearest_fuzzy_query(searcher, text: str, field: str = "text"):
    """``NearestFuzzyQuery`` rewrite
    (``classification/utils/NearestFuzzyQuery.java:214-262``): per distinct
    analyzed token, enumerate fuzzy variants; variant boost = 1.0 on exact
    match else f32(1 − f32(ed)/f32(min(|variant|, |token|)))
    (``FuzzyTermsEnum.java:249-255``); keep the top
    ``NF_MAX_VARIANTS_PER_TERM`` per token, re-score each as
    f32(f32(boost·boost) · idf) with the CLASSIC idf
    f32(ln((N+1)/(df+1)) + 1) over the SOURCE token's df — or, when the
    token is corpus-absent, the integer-division average of the variants'
    dfs (:171-176) — and keep the global top ``NF_MAX_NUM_TERMS``. Each
    surviving variant becomes a SHOULD ``TermQuery(df1=True)`` (scored
    with artificial df = ttf = 1, :199-212).

    Both caps rank (score DESC, term ASC); the reference's PriorityQueue
    tie order is insertion-dependent, so the deterministic tie-break is a
    documented divergence that only matters when a cap binds. N =
    ``reader.doc_count`` (the reference uses live numDocs — identical
    without deletes; documented)."""
    r = searcher.reader
    n_docs = int(r.doc_count)
    seen: set[str] = set()
    scored: list[tuple[str, float]] = []  # (variant term, clause boost)
    for tok in searcher.analyzer.tokenize_text(text):
        if tok in seen:
            continue
        seen.add(tok)
        variants = fuzzy_variants(r, tok, field)
        if not variants:
            continue
        # FuzzyTermsEnum boost, before idf re-scoring
        boosted = [
            (t, 1.0 if t == tok else float(
                np.float32(1.0) - np.float32(ed) / np.float32(min(len(t),
                                                                  len(tok)))))
            for t, _df, ed in variants
        ]
        boosted.sort(key=lambda x: (-x[1], x[0]))
        top = boosted[:NF_MAX_VARIANTS_PER_TERM]
        src_df = next((df for t, df, _ in variants if t == tok), 0)
        if src_df == 0:
            # integer-division average df of ALL enumerated variants (:173)
            src_df = sum(df for _, df, _ in variants) // len(variants)
        idf = float(np.float32(
            math.log((n_docs + 1) / float(src_df + 1)) + 1.0))
        for t, b in top:
            sc = float(np.float32(
                np.float32(np.float32(b) * np.float32(b)) * np.float32(idf)))
            scored.append((t, sc))
    scored.sort(key=lambda x: (-x[1], x[0]))
    scored = scored[:NF_MAX_NUM_TERMS]
    if not scored:
        return None
    return ast.BooleanQuery(tuple(
        (ast.SHOULD, ast.TermQuery(t, field, boost=sc, df1=True))
        for t, sc in scored
    ))


def _build_list_from_top_docs(hits, cls_of, k: int):
    """``buildListFromTopDocs`` vote (shared by the KNN classifiers):
    per class count + Σ f32(score/maxScore); score = (count·(boost/count))/k
    with the <k rescale."""
    if not hits:
        return []
    max_score = float(hits[0].score)
    counts: dict[str, int] = {}
    boosts: dict[str, float] = {}
    for h in hits:
        c = cls_of.get(int(h.doc_id))
        if c is None:
            continue
        counts[c] = counts.get(c, 0) + 1
        boosts[c] = boosts.get(c, 0.0) + float(
            np.float32(float(h.score) / max_score))
    sumdoc = sum(counts.values())
    scored = []
    for c in sorted(counts):
        sc = (counts[c] * (boosts[c] / counts[c])) / float(k)
        if sumdoc < k:
            sc = sc * float(k) / float(sumdoc)
        scored.append((c, sc))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored


class KNearestFuzzyClassifier:
    """``classification/KNearestFuzzyClassifier.java:50`` — k-NN
    classification over a :func:`nearest_fuzzy_query`:

    - knnSearch (:137-148): ``MUST(NearestFuzzyQuery) MUST(class:*)`` —
      the class wildcard takes the CONSTANT_SCORE rewrite and adds 1.0 to
      every hit (all docs carry the class on the gate index); top-k by
      (score DESC, docID ASC)
    - vote: the same ``buildListFromTopDocs`` as
      :class:`KNearestNeighborClassifier` (:155-195)

    One engine search per input (the reference's exact shape); the fuzzy
    rewrite costs one driver-dict pass (or one prefix-pushdown scan) per
    distinct token. Cross-engine exactness: per-hit score/maxScore
    quotients narrow to float32 before the per-class double sum."""

    def __init__(self, searcher, class_field: str = "role", k: int = 10,
                 text_field: str = "text"):
        self.searcher = searcher
        self.class_field = class_field
        self.text_field = text_field
        self.k = int(k)
        stats = searcher.reader._term_stats_df.filter(
            F.col("field") == class_field)
        self.classes = sorted(
            r["term"] for r in stats.select("term").collect())
        if not self.classes:
            raise ValueError(f"no terms in class field {class_field!r}")

    def _classes_of(self, doc_ids: list[int]) -> dict[int, str]:
        return _classes_of(self.searcher, self.classes, self.class_field,
                           doc_ids)

    def knn_search(self, text: str):
        fq = nearest_fuzzy_query(self.searcher, text, self.text_field)
        if fq is None:
            return []
        bq = ast.BooleanQuery(
            ((ast.MUST, fq),
             (ast.MUST, ast.MultiTermQuery("wildcard", "*",
                                           field=self.class_field))))
        return self.searcher.search(bq, k=self.k)

    def classify_all(self, texts: list[str]) -> list[list[tuple[str, float]]]:
        out = []
        for text in texts:
            hits = self.knn_search(text)
            cls_of = (self._classes_of([h.doc_id for h in hits])
                      if hits else {})
            out.append(_build_list_from_top_docs(hits, cls_of, self.k))
        return out

    def assign_class(self, text: str):
        scored = self.classify_all([text])[0]
        return scored[0] if scored else None

    def classify_df(self, texts: list[str]):
        rows = [
            (i, c, s)
            for i, scored in enumerate(self.classify_all(texts))
            for c, s in scored
        ]
        return self.searcher.spark.createDataFrame(
            rows, "input_id long, cls string, score double")

class BooleanPerceptronClassifier:
    """``classification/BooleanPerceptronClassifier.java:59`` — a boolean
    perceptron whose weights come from index statistics:

    - initial weight(term) = totalTermFreq(term)    (:120-126)
    - bias = sumTotalTermFreq / docCount (avg field length) unless given
      (:100-115)
    - assignClass: output = Σ over analyzed tokens (repeats counted) of
      the FST's LONG weight; class = output ≥ bias; score =
      1 − exp(−|bias − output| / bias)               (:221-238)
    - training (:130-165): ONE pass over the class-bearing docs in docID
      order; for each, classify the stored text with the CURRENT FST —
      on a miss, modifier = signum(correct − assigned) and every term of
      the doc gets weight = max(0, fst(term) + modifier·tf(term, doc))
      (the STALE fst value, :188-200); the FST snapshot refreshes only
      when batchCount % batchSize == 0 at miss time — both quirks
      reproduced. Classes parse like ``Boolean.valueOf``: the string
      "true" (case-insensitive) is True, anything else False.

    All arithmetic is integer (FST outputs are longs, :207 longValue
    truncation) — bit-exact trivially. Online perceptron training is
    inherently sequential (the reference is a single docID-order loop);
    the engine fetches the training rows with ONE distributed ordered
    scan and loops on the driver — an iterative algorithm under the
    driver contract (rows-only gate, brute-simulation pytest)."""

    def __init__(self, searcher, class_field: str = "role",
                 text_field: str = "text", batch_size: int = 1,
                 bias: float | None = None):
        self.searcher = searcher
        self.text_field = text_field
        r = searcher.reader
        stats = r._term_stats_df.filter(F.col("field") == text_field)
        weights = {row["term"]: float(row["ttf"])
                   for row in stats.select("term", "ttf").collect()}
        fs = r.field_stats[text_field]
        # bias == null || bias == 0d → auto-assign avg field length
        # (BooleanPerceptronClassifier.java:100-115) — 0 is "unset"
        self.bias = (float(bias) if bias else
                     float(fs["sum_ttf"]) / float(fs["doc_count"]))
        self.fst = {t: int(w) for t, w in weights.items()}
        an = searcher.analyzer

        # Training data from the INDEX, like the reference (stored class +
        # per-doc term vectors, :130-165): class-bearing docs via the
        # wildcard(class:*) MUST filter, per-doc (term, tf) via the
        # postings transpose (term_vectors — the reference requires stored
        # term vectors), both in TWO distributed plans collected once;
        # the docID-order training loop itself is inherently sequential.
        cls_rows = []
        for c in sorted(
            row["term"] for row in
            r._term_stats_df.filter(F.col("field") == class_field)
            .select("term").collect()
        ):
            cls_rows.append(
                searcher.match_df(ast.TermQuery(c, class_field))
                .select("doc_id", F.lit(c).alias("cls")))
        cls_of = {int(x["doc_id"]): x["cls"]
                  for x in _union_by_name(cls_rows).collect()}
        doc_ids = sorted(cls_of)
        tv: dict[int, list[tuple[str, int]]] = {}
        for x in searcher.term_vectors(doc_ids, field=text_field).collect():
            tv.setdefault(int(x["doc_id"]), []).append(
                (x["term"], int(x["freq"])))
        batch_count = 0
        for did in doc_ids:
            tfs = tv.get(did, [])
            # assignClass over the stored text ≡ Σ tf · fst(term) — the
            # analyzed token multiset IS the term vector
            output = sum(tf * self.fst[t] for t, tf in tfs
                         if t in self.fst)
            assigned = output >= self.bias
            correct = cls_of[did].lower() == "true"
            modifier = (correct > assigned) - (correct < assigned)
            if modifier:
                for t, tf in tfs:
                    prev = self.fst.get(t)
                    weights[t] = (0.0 if prev is None
                                  else float(max(0, prev + modifier * tf)))
                if batch_count % batch_size == 0:
                    self.fst = {t: int(w) for t, w in weights.items()}
            batch_count += 1
        # NOTE deliberately NO final snapshot: the reference never flushes
        # updates made after the last batch-boundary rebuild (:130-165 —
        # the tail of the weights map dies with weights.clear()); with the
        # default batch_size=1 every miss flushes, so nothing is lost

    def assign_class(self, text: str) -> tuple[bool, float]:
        output = 0
        for t in self.searcher.analyzer.tokenize_text(text):
            d = self.fst.get(t)
            if d is not None:
                output += d
        score = 1.0 - math.exp(-abs(self.bias - float(output)) / self.bias)
        return output >= self.bias, score

    def classify_df(self, texts: list[str]):
        rows = [(i,) + self.assign_class(t) for i, t in enumerate(texts)]
        return self.searcher.spark.createDataFrame(
            rows, "input_id long, assigned boolean, score double")

class CachingNaiveBayesClassifier(SimpleNaiveBayesClassifier):
    """``classification/CachingNaiveBayesClassifier.java:37`` — SimpleNB
    with the per-(word, class) hit counts cached across calls (the
    reference pre-populates word/class count maps via ``reInitCache``;
    here the cache fills lazily per distinct word — same counts, same
    scores, fewer Spark jobs on repeated classification)."""

    def __init__(self, searcher, class_field: str = "role",
                 text_field: str = "text"):
        super().__init__(searcher, class_field, text_field)
        self._hit_cache: dict[tuple[str, str], int] = {}
        self._cached_words: set[str] = set()

    def _hits(self, words: list[str]):
        missing = sorted(set(words) - self._cached_words)
        if missing:
            fresh = super()._hits(missing)
            # absent (word, class) pairs are real zeros — cache the words
            self._hit_cache.update(fresh)
            self._cached_words.update(missing)
        ws = set(words)
        return {(w, c): n for (w, c), n in self._hit_cache.items()
                if w in ws}
