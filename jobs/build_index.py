"""spark-submit entry point: build (or resume) a transcript index.

    spark-submit --py-files dist/lucene_spark.zip jobs/build_index.py \
        --input <parquet path or iceberg table> --index <output dir> \
        [--segments N] [--analyzer standard|simple|english|whitespace|letter|stop|keyword|standard_folding] [--resume] [--no-positions]

The session comes from spark-submit (master/executors configured there); on a
cluster set the worker env the sandbox tuning uses locally:
    --conf spark.executorEnv.NUMPY_MADVISE_HUGEPAGE=0
    --conf spark.executorEnv.MALLOC_MMAP_THRESHOLD_=1073741824
    --conf spark.executorEnv.MALLOC_TRIM_THRESHOLD_=1073741824
    --conf spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL=system
Prints one JSON line of build metrics (doc_count, segments built/reused,
wall seconds).
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
    ap.add_argument("--input", required=True,
                    help="parquet path or catalog table of transcripts")
    ap.add_argument("--index", required=True, help="index output directory")
    ap.add_argument("--segments", type=int, default=None,
                    help="segment count (default: ~31k rows per segment)")
    ap.add_argument("--analyzer", default="standard",
                    choices=["standard", "simple", "english", "whitespace",
                             "letter", "stop", "keyword",
                             "standard_folding"])
    ap.add_argument("--resume", action="store_true",
                    help="resume from checkpoint (re-invert changed segments only)")
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--keyword-fields", default="",
                    help="comma-separated atomic keyword fields (e.g. role)")
    ap.add_argument("--format", default="auto",
                    choices=["auto", "parquet", "iceberg", "table"],
                    help="input format: Iceberg catalog table in "
                         "production, parquet path here (auto sniffs)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from lucene_spark.indexing.builder import IndexBuilder
    from lucene_spark.tables import read_transcript_table

    spark = SparkSession.builder.appName("lucene_spark_build").getOrCreate()
    df = read_transcript_table(spark, args.input, fmt=args.format)
    nseg = args.segments or max(
        spark.sparkContext.defaultParallelism * 2, df.count() // 31_250
    )
    t0 = time.time()
    res = IndexBuilder(
        spark, args.index, analyzer=args.analyzer, num_segments=nseg,
        positions=not args.no_positions,
        keyword_fields=tuple(f for f in args.keyword_fields.split(",") if f),
    ).build(df, resume=args.resume)
    res["wall_sec"] = round(time.time() - t0, 2)
    res["segments"] = nseg
    print(json.dumps(res))


if __name__ == "__main__":
    main()
