"""Point-in-time index reader — stats lookup + postings access.

Equivalent of ``DirectoryReader`` + ``IndexSearcher``'s stats resolution
(``core/search/IndexSearcher.java:943-958``): collection statistics are
whole-index (summed over all segments), so scores are independent of
segmentation. Term lookups and postings scans push ``term`` predicates into
the parquet scan — the postings files are written sorted by (term, block_id),
so row-group min/max stats play the role of the block-tree term index
(``Lucene90BlockTreeTermsWriter``'s ``.tip``).
"""

from __future__ import annotations

import json

from lucene_spark.similarity import BM25Similarity


class IndexReader:
    def __init__(self, spark, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        with open(f"{index_dir}/manifest.json") as f:
            self.manifest = json.load(f)
        fs = spark.read.parquet(f"{index_dir}/field_stats").collect()[0]
        self.doc_count = int(fs["doc_count"])
        self.sum_ttf = int(fs["sum_ttf"])
        self.field = fs["field"]

    def term_stats(self, terms: list[str]) -> dict[str, dict]:
        """df/ttf/max_tf per term (pushdown scan over the sorted stats table)."""
        if not terms:
            return {}
        from pyspark.sql import functions as F

        rows = (
            self.spark.read.parquet(f"{self.index_dir}/term_stats")
            .filter(F.col("term").isin(list(set(terms))))
            .collect()
        )
        return {
            r["term"]: {"df": int(r["df"]), "ttf": int(r["ttf"]),
                        "max_tf": int(r["max_tf"])}
            for r in rows
        }

    def postings(self, terms: list[str]):
        """DataFrame of posting-block rows for the given terms (+ ``seg``)."""
        from pyspark.sql import functions as F

        return (
            self.spark.read.parquet(f"{self.index_dir}/postings")
            .filter(F.col("term").isin(list(set(terms))))
        )

    def docs(self):
        return self.spark.read.parquet(f"{self.index_dir}/docs")

    def similarity_scorer(self, similarity: BM25Similarity, boost: float, dfs):
        return similarity.scorer(boost, self.doc_count, self.sum_ttf, dfs)
