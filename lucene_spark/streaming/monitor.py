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

The registered-query surface mirrors the batch percolator gate: TermQuery,
AND-conjunctions of terms, exact PhraseQuery (the monitor's Presearcher
term-filtering optimization is subsumed by the broadcast term join — only
docs sharing a term with some registered query survive the first join).
"""

from __future__ import annotations

import os
import shutil

from lucene_spark.analysis import get_analyzer
from lucene_spark.search import ast


class StreamingMonitor:
    def __init__(self, spark, analyzer: str = "standard"):
        self.spark = spark
        self.analyzer = get_analyzer(analyzer)
        # query_id -> ("term", (t,)) | ("and", terms) | ("phrase", terms)
        self._specs: dict[str, tuple] = {}

    # -- registration --------------------------------------------------------
    def register(self, query_id: str, query) -> None:
        """Register a query (AST or classic syntax). Raises on shapes the
        monitor does not support (mirrors MonitorQuery validation)."""
        if isinstance(query, str):
            query = ast.parse(query, self.analyzer)
        query = ast.normalize(query)
        if isinstance(query, ast.TermQuery):
            self._specs[query_id] = ("term", (query.term,))
        elif isinstance(query, ast.PhraseQuery) and query.slop == 0:
            self._specs[query_id] = ("phrase", tuple(query.terms))
        elif isinstance(query, ast.BooleanQuery) and all(
            occ == ast.MUST and isinstance(sub, ast.TermQuery)
            for occ, sub in query.clauses
        ):
            self._specs[query_id] = (
                "and", tuple(sub.term for _, sub in query.clauses))
        else:
            raise NotImplementedError(
                "StreamingMonitor registers term / all-MUST conjunction / "
                "exact phrase queries")

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
            (qid, t, len(set(terms)))
            for qid, (kind, terms) in sorted(self._specs.items())
            if kind in ("term", "and") for t in set(terms)
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

        for qid, (kind, terms) in sorted(self._specs.items()):
            if kind != "phrase":
                continue
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

        return reduce(lambda a, b: a.unionByName(b), parts) \
            .orderBy("query_id", "doc_id")

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
