"""lucene_spark — a PySpark-native inverted-index builder + BM25 top-k query engine.

Brand-new engine (NOT a Lucene port) with the query semantics of the reference
``shubhamod/lucene`` (Apache Lucene 10.0.0-SNAPSHOT):

- input: a table of multi-turn conversation transcripts
  ``(conv_id string, turn_idx int, role string, text string, tool string, ts timestamp)``
  — one Lucene "document" == one turn, docID == row_number over (conv_id, turn_idx) - 1;
- index build: Arrow-vectorized tokenize → salted two-stage tf aggregation →
  range-partitioned 128-doc posting blocks with delta-gap varint packing and
  block-max (freq, norm) impact metadata, plus docs/term_stats/field_stats tables;
- query: classic-syntax subset parser → AST normalizer → either an exhaustive
  DataFrame plan (the correctness oracle) or a numpy block-max-WAND kernel
  (the pruned fast path), both rank-identical to Lucene's
  ``IndexSearcher.search(query, k)`` with BM25 (k1=1.2, b=0.75).

Float32 arithmetic mirrors ``BM25Similarity`` exactly (see ``similarity.py``) so
scores are bit-identical to Java floats, not merely close.
"""

from lucene_spark.smallfloat import int_to_byte4, byte4_to_int, LENGTH_TABLE
from lucene_spark.similarity import BM25Similarity

__all__ = ["int_to_byte4", "byte4_to_int", "LENGTH_TABLE", "BM25Similarity"]

__version__ = "0.1.0"
