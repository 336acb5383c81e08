"""IndexWriter — the reference's writer API surface as one facade.

``core/index/IndexWriter.java`` is the reference's single mutation entry
point: addDocument(s), updateDocument, deleteDocuments(Term/Query),
forceMerge, commit. This engine implements each operation in a dedicated
module (builder / streaming.incremental / indexing.maintenance); this class
binds them under the familiar names so a reference user can port call sites
one-to-one. Every operation here COMMITS before returning (one atomic
manifest replace per call — the autoCommit analogue); there is no pending
in-memory buffer to lose.
"""

from __future__ import annotations


class IndexWriter:
    def __init__(self, spark, index_dir: str, analyzer: str = "standard",
                 rows_per_segment: int = 31_250,
                 auto_compact_segments: int = 0):
        from lucene_spark.indexing.maintenance import IndexMaintenance
        from lucene_spark.streaming.incremental import IncrementalIndexer

        self.spark = spark
        self.index_dir = index_dir
        self._inc = IncrementalIndexer(
            spark, index_dir, analyzer=analyzer,
            rows_per_segment=rows_per_segment,
            auto_compact_segments=auto_compact_segments)
        self._mnt = IndexMaintenance(spark, index_dir)

    # -- writes -------------------------------------------------------------
    def add_documents(self, df, epoch_id: int | None = None) -> dict:
        """``addDocuments``: append a batch of transcript rows as new
        segments (exactly-once per epoch_id) and commit."""
        return self._inc.append(df, epoch_id=epoch_id)

    def update_document(self, delete_term: str, df,
                        delete_field: str = "text",
                        epoch_id: int | None = None) -> dict:
        """``updateDocument(Term, doc)``: delete-then-add under ONE
        commit."""
        return self._inc.update(df, delete_term, delete_field=delete_field,
                                epoch_id=epoch_id)

    # -- deletes ------------------------------------------------------------
    def delete_documents(self, term: str | None = None,
                         field: str = "text", query=None) -> int:
        """``deleteDocuments(Term)`` / ``deleteDocuments(Query)``: mark
        matches deleted, commit, return the newly-deleted count."""
        if (term is None) == (query is None):
            raise ValueError("pass exactly one of term= or query=")
        if term is not None:
            return self._mnt.delete_by_term(term, field=field)
        return self._mnt.delete_by_query(query)

    def update_numeric_doc_value(self, term: str, field: str, value: int,
                                 term_field: str = "text") -> int:
        """``updateNumericDocValue(Term term, String field, long value)``
        (``core/index/IndexWriter.java``): assign ``value`` to the numeric
        doc-values ``field`` of every doc matching ``term`` without
        reindexing; one sparse update generation + atomic commit. Returns
        docs updated."""
        return self._mnt.update_numeric_doc_value(
            field, value, term=term, term_field=term_field)

    def add_indexes(self, src_dir: str) -> dict:
        """``addIndexes(Directory...)``: copy another index's segments into
        this one (renumbered segments, shifted docBases, merged stats, one
        commit). The source must be delete-free and share this index's
        configuration."""
        return self._inc.add_indexes(src_dir)

    # -- merges -------------------------------------------------------------
    def force_merge(self, target_rows: int = 1_000_000) -> dict:
        """``forceMerge``-ish: run the tiered compaction pass (purges
        deleted docs, renumbers docIDs densely, recomputes stats)."""
        return self._mnt.compact(target_rows=target_rows)

    # -- commit points --------------------------------------------------------
    def snapshot(self, tag: str) -> dict:
        """``SnapshotDeletionPolicy.snapshot()``: pin the current commit
        under ``tag``. Everything it references survives GC/compaction
        until ``release_snapshot``; open a point-in-time view with
        ``IndexSearcher(spark, dir, commit=tag)``."""
        from lucene_spark.indexing import commits

        return commits.snapshot(self.index_dir, tag)

    def release_snapshot(self, tag: str) -> None:
        """``SnapshotDeletionPolicy.release()``."""
        from lucene_spark.indexing import commits

        commits.release(self.index_dir, tag)

    def snapshots(self) -> dict:
        """tag → pinned manifest (``getSnapshots()``)."""
        from lucene_spark.indexing import commits

        return commits.list_snapshots(self.index_dir)

    def rollback(self, tag: str) -> dict:
        """``IndexWriter.rollback``-to-commit: atomically restore the
        pinned commit as the live manifest, abandoning every mutation
        committed after it (their segment/stats dirs become inert orphans —
        the reader's manifest-membership filter ignores them and later
        maintenance GC removes them)."""
        from lucene_spark.indexing import commits

        m = commits.load(self.index_dir, tag)
        self._inc._builder._save_manifest(m)
        return m

    # -- introspection ------------------------------------------------------
    @property
    def manifest(self) -> dict:
        return self._mnt._manifest()

    def num_docs(self) -> int:
        # doc_count is published by every commit (build/append/compact) —
        # no reader construction needed for a manifest accessor
        m = self.manifest
        return int(m["doc_count"]) - int(m.get("deleted_count", 0))

    def has_deletions(self) -> bool:
        return bool(self.manifest.get("has_deletes", False))
