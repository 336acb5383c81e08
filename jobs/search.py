"""spark-submit entry point: run top-k queries against a built index.

    spark-submit --py-files dist/lucene_spark.zip jobs/search.py \
        --index <index dir> --query 'hello "exact phrase" +must -not pre*' \
        [--k 10] [--mode wand|exhaustive] [--explain]

Prints one JSON line per query: {"query": ..., "hits": [[doc_id, score], ...],
"sec": ...}.
"""

from __future__ import annotations

import argparse
import os
import sys

# local runs (python jobs/x.py) resolve the package from the repo root;
# spark-submit --py-files ships dist/lucene_spark.zip instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", action="append", required=True,
                    help="classic-syntax query (repeatable)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--explain", action="store_true",
                    help="attach the per-clause score explanation per hit")
    ap.add_argument("--mode", default="wand", choices=["wand", "exhaustive"])
    ap.add_argument("--similarity", default="bm25",
                    choices=["bm25", "classic", "boolean", "lm_dirichlet",
                             "lm_jelinek_mercer", "indri_dirichlet",
                             "dfr_gb2", "dfr_inl2", "dfr_ineb2",
                             "ib_ll", "ib_spl",
                             "dfi_chi2", "dfi_sat", "dfi_std",
                             "axiomatic_f1exp", "axiomatic_f1log",
                             "axiomatic_f2exp", "axiomatic_f2log",
                             "axiomatic_f3exp", "axiomatic_f3log",
                             "multi_bm25_classic"])
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from lucene_spark.search.searcher import IndexSearcher
    from lucene_spark.similarity import get_similarity

    spark = SparkSession.builder.appName("lucene_spark_search").getOrCreate()
    s = IndexSearcher(spark, args.index,
                      similarity=get_similarity(args.similarity))
    for q in args.query:
        t0 = time.time()
        hits = s.search(q, k=args.k, mode=args.mode)
        out = {
            "query": q,
            "hits": [[h.doc_id, h.score] for h in hits],
            "sec": round(time.time() - t0, 3),
        }
        if args.explain:
            out["explanations"] = [s.explain(q, h.doc_id) for h in hits]
        print(json.dumps(out))


if __name__ == "__main__":
    main()
