"""Numeric doc-values updates — ``IndexWriter.updateNumericDocValue``.

Reference semantics (``core/index/IndexWriter.java`` updateNumericDocValue
(Term, String field, long value) + ``DocValuesFieldUpdates`` / the ``.dvu``
doc-values-update generation files): an update assigns ``value`` to every
doc matching the term, WITHOUT reindexing; updates are written as sparse
per-generation files; readers overlay the generation chain (newest
generation wins per doc); segment merges fold the chain into the merged
segment's doc values.

Parquet re-expression:

- each update writes ONE sparse generation dir
  ``dv/<field>.g<N>/`` with (doc_id BIGINT **global**, value BIGINT) —
  inert until the manifest's ``dv_updates[field]`` gen list is atomically
  replaced (the same single-commit-point protocol as deletes/stats).
- readers merge the chain with one two-stage groupBy
  (``max_by(value, gen)``) — generation count stays tiny (one per update
  call; compaction folds to one), so the merge is a union of small sparse
  tables, never a corpus-wide pass.
- ``IndexMaintenance.compact`` remaps the chain onto the renumbered
  docIDs (join through the (conv_id, turn_idx) doc identity — the docID
  invariant makes old→new id recovery exact) and folds it to a single
  generation, exactly like Lucene merges fold ``.dvu`` chains.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def dv_updates_of(manifest: dict) -> dict:
    """field → ordered list of generation dir names (oldest first)."""
    return dict(manifest.get("dv_updates", {}))


def next_gen_dir(index_dir: str, manifest: dict, field: str) -> str:
    """Next doc-values generation dir for ``field`` — 1 + the max over the
    manifest's chain AND every ``dv/<field>.gN`` dir on disk: a rolled-back
    commit's generations may still be pinned by other snapshots, so their
    names are never reused (same rule as ``commits.next_generation``)."""
    import glob
    import os

    gens = dv_updates_of(manifest).get(field, [])
    nums = [int(g.rsplit(".g", 1)[1]) for g in gens]
    for p in glob.glob(f"{index_dir}/dv/{field}.g*"):
        tail = os.path.basename(p).rsplit(".g", 1)[1]
        try:
            nums.append(int(tail))
        except ValueError:
            pass
    return f"dv/{field}.g{(max(nums) + 1) if nums else 0}"


def merged_doc_values(spark, index_dir: str, manifest: dict, field: str):
    """Sparse merged view (doc_id, value): union the field's generation
    chain, newest generation wins per doc (DocValuesFieldUpdates overlay
    order). Returns None when the field has no updates."""
    gens = dv_updates_of(manifest).get(field)
    if not gens:
        return None
    parts = [
        spark.read.parquet(f"{index_dir}/{g}")
        .select("doc_id", "value", F.lit(i).alias("gen"))
        for i, g in enumerate(gens)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy("doc_id")
        .agg(F.max_by("value", "gen").alias("value"))
    )
