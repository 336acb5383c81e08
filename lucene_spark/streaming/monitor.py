"""Streaming monitor / percolator — the reference's monitor module
(``lucene/monitor/src/java/org/apache/lucene/monitor/Monitor.java:60``
``match(Document...)``: registered queries run against each document as it
arrives, the inverse of a search index).

Spark-first shape: NO ephemeral per-doc index. Each micro-batch is analyzed
once into (doc_id, term, pos) rows with the SAME analyzer the index uses,
then matched against the registered queries as one unioned DataFrame plan —
term queries and conjunctions are a broadcast join + distinct-count, exact
phrases are position self-joins (the percolate oracle's shape). Attached to
a stream via ``foreachBatch``; each epoch's matches land in an
``epoch=N`` partition written atomically, so Structured Streaming replays
after failure overwrite rather than duplicate (exactly-once like
``IncrementalIndexer``).

The registered-query surface comes in two tiers, mirroring the reference's
architecture exactly (``monitor/Presearcher.java`` candidate filtering +
``monitor/CandidateMatcher.java`` verification against a per-document
``MemoryIndex``):

- **JVM tier** (TermQuery, all-MUST conjunctions, exact PhraseQuery): fully
  verified by broadcast joins / position self-joins — no Python at all.
- **MemoryIndex tier** (ANY other query shape — nested booleans, sloppy
  phrases, multiterm expansions, spans, synonyms…): a Presearcher-style
  broadcast term join keeps only docs sharing a term with the query (or
  every doc for term-free "ANYTOKEN" queries — MatchAllDocsQuery /
  multiterm / keyword-only shapes, ``TermFilteredPresearcher``'s ANYTOKEN
  fallback), then each surviving (query, doc) pair verifies EXECUTOR-side:
  one Arrow batch per partition, one driver-local ``MemoryIndex`` per
  candidate doc, all of that doc's candidate queries checked against it —
  the reference's exact per-document match loop, distributed.
"""

from __future__ import annotations

import os
import shutil

from lucene_spark.analysis import get_analyzer
from lucene_spark.search import ast


def _presearch_terms(q):
    """Presearcher term extraction (``monitor/TermFilteredPresearcher``):
    a set S of text-field terms such that EVERY document the query can
    match contains at least one term of S, or ``None`` when no such set is
    extractable (the ANYTOKEN fallback — every doc is a candidate).

    Soundness rules: a required (MUST/FILTER) clause's set covers the whole
    query (the doc must match it); with no extractable required clause,
    a boolean with required clauses yields ANYTOKEN, and a pure-SHOULD
    boolean needs >= 1 SHOULD hit, so the UNION of the SHOULD sets works —
    unless any SHOULD is itself ANYTOKEN."""
    if isinstance(q, ast.TermQuery):
        return {q.term} if q.field == "text" else None
    if isinstance(q, (ast.PhraseQuery, ast.SynonymQuery)):
        return set(q.terms) if q.field == "text" and q.terms else None
    if isinstance(q, ast.MultiPhraseQuery):
        if q.field != "text":
            return None
        # every slot is required — any one slot's term union covers
        return set(q.slots[0]) if q.slots else None
    if isinstance(q, ast.SPAN_QUERY_TYPES):
        if getattr(q, "field", "text") != "text" or not q.terms:
            return None
        slot0 = q.terms[0]
        return set(slot0) if isinstance(slot0, (tuple, list)) else {slot0}
    if isinstance(q, ast.ConstantScoreQuery):
        return _presearch_terms(q.query)
    if isinstance(q, ast.BooleanQuery):
        should_sets, have_req = [], False
        for occ, sub in q.clauses:
            if occ in (ast.MUST, ast.FILTER):
                have_req = True
                s = _presearch_terms(sub)
                if s:
                    return s  # one required clause covers the query
            elif occ == ast.SHOULD:
                should_sets.append(_presearch_terms(sub))
        if have_req:
            return None  # required clauses exist but none is extractable
        if should_sets and all(s for s in should_sets):
            return set().union(*should_sets)
        return None
    return None  # MultiTerm / MatchAll / Knn / Interval / unknown


class StreamingMonitor:
    def __init__(self, spark, analyzer: str = "standard"):
        self.spark = spark
        self._analyzer_name = analyzer
        self.analyzer = get_analyzer(analyzer)
        # query_id -> ("term", (t,)) | ("and", terms) | ("phrase", terms)
        #           | ("mem", query_ast, presearch_terms_or_None)
        #           | ("none",)  — a never-matching registration
        self._specs: dict[str, tuple] = {}

    # -- registration --------------------------------------------------------
    def register(self, query_id: str, query) -> None:
        """Register a query (AST or classic syntax). Term / all-MUST /
        exact-phrase shapes verify purely JVM-side; everything else takes
        the Presearcher + per-doc MemoryIndex tier (validated at
        registration against a probe MemoryIndex, mirroring MonitorQuery
        parse-time validation)."""
        if isinstance(query, str):
            query = ast.parse(query, self.analyzer)
        query = ast.normalize(query)
        if isinstance(query, ast.MatchNoDocsQuery):
            self._specs[query_id] = ("none",)
            return
        if isinstance(query, ast.TermQuery) and query.field == "text":
            self._specs[query_id] = ("term", (query.term,))
        elif (isinstance(query, ast.PhraseQuery) and query.slop == 0
              and query.field == "text"):
            self._specs[query_id] = ("phrase", tuple(query.terms))
        elif isinstance(query, ast.BooleanQuery) \
                and query.min_should_match == 0 and all(
            occ == ast.MUST and isinstance(sub, ast.TermQuery)
            and sub.field == "text"
            for occ, sub in query.clauses
        ):
            # msm > 0 with zero SHOULD clauses matches nothing under the
            # engine/MemoryIndex semantics — such queries must take the
            # mem tier, not the conjunction fast path
            self._specs[query_id] = (
                "and", tuple(sub.term for _, sub in query.clauses))
        else:
            from lucene_spark.memory import MemoryIndex

            # probe-validate: surfaces NotImplementedError shapes now
            MemoryIndex(self._analyzer_name).add_field(
                "text", "probe text").matches(query)
            self._specs[query_id] = (
                "mem", query, _presearch_terms(query))

    # -- per-batch matching ---------------------------------------------------
    def _tokens_df(self, docs_df, id_col: str, text_col: str):
        an = self.analyzer

        def tok(batches):
            import pandas as pd

            for pdf in batches:
                ids, terms, poss = [], [], []
                for did, text in zip(pdf[id_col], pdf[text_col]):
                    toks = an.tokenize_text(text or "")
                    ids.extend([did] * len(toks))
                    terms.extend(toks)
                    poss.extend(range(len(toks)))
                yield pd.DataFrame(
                    {"doc_id": pd.Series(ids, dtype="int64"),
                     "term": pd.Series(terms, dtype="object"),
                     "pos": pd.Series(poss, dtype="int64")})

        return docs_df.mapInPandas(tok, "doc_id long, term string, pos long")

    def match_batch(self, docs_df, id_col: str = "doc_id",
                    text_col: str = "text"):
        """(query_id, doc_id) matches of every registered query against the
        batch — one unioned plan, the registered-term table broadcast."""
        from functools import reduce

        from pyspark.sql import functions as F

        spark = self.spark
        if not self._specs:
            return spark.createDataFrame([], "query_id string, doc_id long")
        toks = self._tokens_df(docs_df, id_col, text_col)

        # flat term/AND specs resolve in ONE join + distinct-count
        # need counts DISTINCT terms (a duplicated MUST term like
        # "+foo +foo" still needs only one distinct match)
        flat_rows = [
            (qid, t, len(set(spec[1])))
            for qid, spec in sorted(self._specs.items())
            if spec[0] in ("term", "and") for t in set(spec[1])
        ]
        parts = []
        if flat_rows:
            spec = spark.createDataFrame(
                flat_rows, "query_id string, term string, need int")
            parts.append(
                toks.join(F.broadcast(spec), "term")
                .groupBy("query_id", "doc_id")
                .agg(F.count_distinct("term").alias("got"),
                     F.first("need").alias("need"))
                .filter(F.col("got") == F.col("need"))
                .select("query_id", "doc_id"))

        for qid, spec in sorted(self._specs.items()):
            if spec[0] != "phrase":
                continue
            terms = spec[1]
            t0 = toks.filter(F.col("term") == terms[0]) \
                .select("doc_id", F.col("pos").alias("p0"))
            m = t0
            for i, t in enumerate(terms[1:], start=1):
                ti = toks.filter(F.col("term") == t).select(
                    F.col("doc_id").alias("did"), F.col("pos").alias(f"p{i}"))
                m = m.join(ti, (m["doc_id"] == ti["did"])
                           & (ti[f"p{i}"] == m["p0"] + i)).drop("did")
            parts.append(m.select(F.lit(qid).alias("query_id"), "doc_id")
                         .distinct())

        mem_part = self._match_mem(docs_df, toks, id_col, text_col)
        if mem_part is not None:
            parts.append(mem_part)
        if not parts:
            return spark.createDataFrame([], "query_id string, doc_id long")
        return reduce(lambda a, b: a.unionByName(b), parts) \
            .orderBy("query_id", "doc_id")

    def _match_mem(self, docs_df, toks, id_col: str, text_col: str):
        """MemoryIndex tier: Presearcher candidate join → executor-side
        per-doc verification. Returns a (query_id, doc_id) DataFrame or
        None when no mem-tier query is registered.

        Scale shape: the (query_id, term) spec table broadcasts (registered
        queries are query-side metadata); candidates are bounded by term
        selectivity; ANYTOKEN queries candidate every doc of the BATCH
        (micro-batches are bounded — the reference pays the same cost);
        verification builds ONE MemoryIndex per candidate doc per Arrow
        partition and checks all of that doc's candidate queries against
        it — O(doc len + per-doc candidates), no shuffle after the join."""
        from pyspark.sql import functions as F

        mem = {qid: (s[1], s[2]) for qid, s in self._specs.items()
               if s[0] == "mem"}
        if not mem:
            return None
        spark = self.spark
        term_rows = [(qid, t) for qid, (_, ts) in sorted(mem.items())
                     if ts for t in sorted(ts)]
        any_qids = sorted(qid for qid, (_, ts) in mem.items() if not ts)
        cand_parts = []
        if term_rows:
            spec = spark.createDataFrame(term_rows,
                                         "query_id string, term string")
            cand_parts.append(
                toks.join(F.broadcast(spec), "term")
                .select("query_id", "doc_id").distinct())
        if any_qids:
            ids = docs_df.select(F.col(id_col).alias("doc_id")).distinct()
            qdf = spark.createDataFrame([(q,) for q in any_qids],
                                        "query_id string")
            cand_parts.append(ids.crossJoin(F.broadcast(qdf))
                              .select("query_id", "doc_id"))
        from functools import reduce

        cand = reduce(lambda a, b: a.unionByName(b), cand_parts)
        withtext = cand.join(
            docs_df.select(F.col(id_col).alias("doc_id"),
                           F.col(text_col).alias("_mtext")),
            "doc_id")
        queries = {qid: q for qid, (q, _) in mem.items()}
        an_name = self._analyzer_name

        def verify(batches):
            import pandas as pd

            from lucene_spark.memory import MemoryIndex

            for pdf in batches:
                out_q, out_d = [], []
                for did, grp in pdf.groupby("doc_id", sort=False):
                    mi = MemoryIndex(an_name).add_field(
                        "text", grp["_mtext"].iloc[0] or "")
                    for qid in grp["query_id"]:
                        if mi.matches(queries[qid]):
                            out_q.append(qid)
                            out_d.append(int(did))
                yield pd.DataFrame({
                    "query_id": pd.Series(out_q, dtype="object"),
                    "doc_id": pd.Series(out_d, dtype="int64")})

        return withtext.mapInPandas(verify, "query_id string, doc_id long")

    # -- streaming attachment -------------------------------------------------
    def open_stream(self, stream_df, out_dir: str, checkpoint_dir: str,
                    id_col: str = "doc_id", text_col: str = "text",
                    available_now: bool = True,
                    processing_time: str | None = None):
        """Attach to a streaming DataFrame: every micro-batch's matches are
        written to ``out_dir/epoch=N`` (atomic per-epoch overwrite → replays
        after failure are idempotent). The staging directory lives BESIDE
        ``out_dir`` (same filesystem, so os.replace stays atomic) — a crash
        mid-write can never leave a half-written ``epoch=N.tmp`` partition
        where ``matches()`` would discover it. Default trigger drains the
        currently-available data and stops (availableNow); pass
        ``processing_time='5 seconds'`` (or ``available_now=False`` for
        continuous micro-batches) to keep monitoring a live stream.
        Returns the StreamingQuery."""
        def sink(batch_df, epoch_id: int):
            out = self.match_batch(batch_df, id_col, text_col)
            tgt = os.path.join(out_dir, f"epoch={int(epoch_id)}")
            tmp = out_dir.rstrip("/") + f".tmp-epoch-{int(epoch_id)}"
            shutil.rmtree(tmp, ignore_errors=True)
            out.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(tgt, ignore_errors=True)
            os.makedirs(out_dir, exist_ok=True)
            os.replace(tmp, tgt)

        w = (
            stream_df.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
        )
        if processing_time is not None:
            w = w.trigger(processingTime=processing_time)
        elif available_now:
            w = w.trigger(availableNow=True)
        return w.start()

    def matches(self, out_dir: str):
        """Read back all epochs' matches as one DataFrame."""
        return self.spark.read.parquet(out_dir)
