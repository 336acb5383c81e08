"""spark-submit entry point: index maintenance (deletes + compaction).

    spark-submit --py-files dist/lucene_spark.zip jobs/maintain.py \
        --index <index dir> \
        [--delete-term spark [--delete-field text]] \
        [--compact --target-rows 1000000]

Prints one JSON line per action, e.g.
``{"action": "delete_by_term", "term": ..., "deleted": N}`` and
``{"action": "compact", "merged_runs": N, "doc_count": N, "num_segments": N}``.
"""

from __future__ import annotations

import argparse
import os
import sys

# local runs (python jobs/x.py) resolve the package from the repo root;
# spark-submit --py-files ships dist/lucene_spark.zip instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--delete-term", action="append", default=[],
                    help="delete all docs containing this term (repeatable)")
    ap.add_argument("--delete-field", default="text")
    ap.add_argument("--compact", action="store_true")
    ap.add_argument("--target-rows", type=int, default=1_000_000,
                    help="max live rows per merged segment")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from lucene_spark.indexing.maintenance import IndexMaintenance

    spark = SparkSession.builder.appName("lucene_spark_maintain").getOrCreate()
    m = IndexMaintenance(spark, args.index)
    for t in args.delete_term:
        n = m.delete_by_term(t, field=args.delete_field)
        print(json.dumps({"action": "delete_by_term", "term": t,
                          "field": args.delete_field, "deleted": n}))
    if args.compact:
        res = m.compact(target_rows=args.target_rows)
        print(json.dumps({"action": "compact", **res}))


if __name__ == "__main__":
    main()
